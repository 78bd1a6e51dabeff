package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** Incremental OPTIMIZE ([[TxLog.compactSmall]]) + TRUNCATE TABLE.
  *
  * compactSmall is the maintenance loop a continuously-ingesting table
  * runs: fold the small-commit dribble (and materialize deletion
  * vectors) WITHOUT touching the big clustered generations — a
  * row-level rewrite of O(small bytes), never a whole-table
  * checkpoint. */
class TxIncrCompactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txincr_").resolve("t").toString

  private def rows(ids: Range, g: String) =
    ids.map(i => (i.toLong, g, s"v-$i")).toDF("id", "grp", "v")

  /** (n_files, n_removes) of the newest history row. */
  private def lastCommit(t: String): (Long, Long) = {
    val r = TxLog.history(spark, t).orderBy(desc("version")).first()
    (r.getAs[Long]("n_files"), r.getAs[Long]("n_removes"))
  }

  test("compactSmall packs only the small files; the big generation survives") {
    val t = freshTable()
    // one BIG generation (all ids, 1 file) + six dribble commits
    TxLog.commit(rows(0 until 10000, "big").coalesce(1), t, "w", 0L)
    (0 until 6).foreach(i =>
      TxLog.commit(rows(10000 + i * 10 until 10000 + i * 10 + 10, "small")
        .coalesce(1), t, "w", i + 1L))
    val before = TxLog.snapshot(spark, t).get.orderBy("id").collect()
    // target well below the big file's size, above the dribble's
    val bigBytes = {
      val p = new org.apache.hadoop.fs.Path(t)
      val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // the big file is the largest on disk
      val it = f.listFiles(new org.apache.hadoop.fs.Path(p, "data"), true)
      var m = 0L
      while (it.hasNext) { val st = it.next(); if (st.getLen > m) m = st.getLen }
      m
    }
    val v = TxLog.compactSmall(spark, t, targetBytes = bigBytes / 2)
    assert(v == 7L)
    val (nf, nr) = lastCommit(t)
    assert(nr == 6L, s"expected the 6 dribble files removed, got $nr")
    assert(nf == 1L, s"expected 1 packed file, got $nf")
    val after = TxLog.snapshot(spark, t).get.orderBy("id").collect()
    assert(after.toSeq == before.toSeq)
    // idempotent: nothing left worth packing (one packed file, no DVs)
    assert(TxLog.compactSmall(spark, t, targetBytes = bigBytes / 2) == -1L)
  }

  test("compactSmall on a partitioned table packs WITHIN partition tuples") {
    val t = freshTable()
    TxLog.createTable(spark, t, rows(0 until 0, "x").schema, Seq("grp"))
    // 3 commits x 2 groups = 6 small files
    (0 until 3).foreach(i =>
      rows(i * 100 until i * 100 + 100, "a").union(
        rows(1000 + i * 100 until 1000 + i * 100 + 100, "b"))
        .write.format("txlog").mode("append").save(t))
    val before = TxLog.snapshot(spark, t).get.orderBy("id").collect()
    val v = TxLog.compactSmall(spark, t)
    assert(v > 0L)
    val (nf, nr) = lastCommit(t)
    assert(nr == 6L && nf == 2L, s"expected 6 -> 2 (one per group), got $nr -> $nf")
    assert(TxLog.snapshot(spark, t).get.orderBy("id").collect().toSeq == before.toSeq)
    // pv metadata survived the pack: partition pruning still works
    val (kept, total) = TxLog.pruneCount(spark, t, col("grp") === "a")
    assert(total == 2 && kept == 1, s"kept $kept of $total")
  }

  test("compactSmall materializes deletion vectors and drops the sidecars") {
    val t = freshTable()
    TxLog.commit(rows(0 until 1000, "g").coalesce(2), t, "w", 0L)
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, t, col("id") % 10 === 0, "del", 0L)
    assert(TxLog.snapshot(spark, t).get.count() == 900L)
    val v = TxLog.compactSmall(spark, t)
    assert(v > 0L)
    // both DV'd files rewrote; the deleted rows are physically gone and
    // the manifest count path no longer subtracts anything
    assert(TxLog.snapshot(spark, t).get.count() == 900L)
    val h = TxLog.history(spark, t).orderBy(desc("version")).first()
    assert(h.getAs[Long]("n_dvs") == 0L)
    assert(spark.read.format("txlog").load(t)
      .agg(count(lit(1))).first().getLong(0) == 900L)
    // time travel to the DV'd version still applies the vectors
    assert(spark.read.format("txlog").option("versionAsOf", 2).load(t).count() == 900L)
    assert(spark.read.format("txlog").option("versionAsOf", 1).load(t).count() == 1000L)
  }

  test("TRUNCATE TABLE: empty checkpoint, contract survives, history intact") {
    val t = freshTable()
    TxLog.createTable(spark, t, rows(0 until 0, "x").schema, Seq("grp"),
      Map("graft.keep" -> "1"))
    rows(0 until 100, "a").write.format("txlog").mode("append").save(t)
    val name = s"trunc_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $name USING txlog OPTIONS (path '$t')")
    try {
      spark.sql(s"TRUNCATE TABLE $name")
      assert(spark.table(name).count() == 0L)
      // schema + layout + props survive; the table is immediately writable
      assert(spark.table(name).columns.toSeq == Seq("id", "grp", "v"))
      assert(TxLog.partitionColumns(spark, t) == Seq("grp"))
      assert(TxLog.properties(spark, t) == Map("graft.keep" -> "1"))
      rows(200 until 210, "b").write.format("txlog").mode("append").save(t)
      assert(spark.table(name).count() == 10L)
      // pre-truncation history is addressable
      assert(spark.read.format("txlog").option("versionAsOf", 1).load(t).count() == 100L)
    } finally spark.sql(s"DROP TABLE $name")
  }

  test("maxBatchBytes: one bounded DIRTIEST-FIRST bite per call, rows and " +
      "row ids invariant, convergence over calls (r17 incremental " +
      "materialization)") {
    val t = freshTable()
    // four one-file generations; two get heavy deletion vectors
    (0 until 4).foreach(i =>
      TxLog.commit(rows(i * 1000 until (i + 1) * 1000, s"g$i").coalesce(1),
        t, "w", i.toLong))
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    // g0: 80% dead; g1: 10% dead; g2/g3 clean
    TxLog.delete(spark, t, col("id") < 800L, "d", 0L)
    TxLog.delete(spark, t, col("id") >= 1000L && col("id") < 1100L, "d", 1L)
    val want = TxLog.snapshot(spark, t).get.orderBy("id")
      .select("id", "grp", "v").collect().toSeq
    val ids = TxLog.snapshotLineage(spark, t).get
      .select("_row_id", "id").as[(Long, Long)].collect().toMap
    // a tiny batch cap: exactly ONE file (the dirtiest — g0's) rewrites
    val v1 = TxLog.compactSmall(spark, t, targetBytes = 1L,
      maxBatchBytes = 1L)
    assert(v1 > 0)
    val h1 = TxLog.history(spark, t).orderBy(desc("version")).first()
    assert(h1.getAs[Long]("n_removes") == 1L,
      "the cap must bound the batch to the single dirtiest file")
    assert(TxLog.snapshot(spark, t).get.orderBy("id")
      .select("id", "grp", "v").collect().toSeq == want, "row-invariant")
    // the next call takes the next dirty file; a third finds nothing
    val v2 = TxLog.compactSmall(spark, t, targetBytes = 1L, maxBatchBytes = 1L)
    assert(v2 > v1)
    assert(TxLog.compactSmall(spark, t, targetBytes = 1L, maxBatchBytes = 1L)
      == -1L, "converged: no dirty files remain")
    assert(TxLog.snapshot(spark, t).get.orderBy("id")
      .select("id", "grp", "v").collect().toSeq == want)
    // row identity pinned through the incremental materialization
    val idsAfter = TxLog.snapshotLineage(spark, t).get
      .select("_row_id", "id").as[(Long, Long)].collect().toMap
    assert(idsAfter == ids, "bounded batches must carry every row id")
    // and the maintain loop drives the same bite size
    TxLog.commit(rows(9000 until 9010, "s1").coalesce(1), t, "w", 10L)
    TxLog.commit(rows(9010 until 9020, "s2").coalesce(1), t, "w", 11L)
    TxLog.commit(rows(9020 until 9030, "s3").coalesce(1), t, "w", 12L)
    // a 1-byte budget can make no progress on CLEAN files — maintain
    // reports honestly (r18: the old behavior burned an identity
    // rewrite of one small file per cycle, forever)
    val rep0 = TxLog.maintain(spark, t, targetBytes = 1L << 20,
      smallFilesTrigger = 2, compactBatchBytes = 1L)
    assert(!rep0.compacted, rep0.toString)
    // a workable budget passes through and the bite really merges
    val rep = TxLog.maintain(spark, t, targetBytes = 1L << 20,
      smallFilesTrigger = 2, compactBatchBytes = 1L << 30)
    assert(rep.compacted, rep.toString)
  }

  test("no livelock: a batch that degenerates to a single CLEAN file refuses " +
      "(-1) instead of rewriting one file into an identical file forever") {
    val t = freshTable()
    // one tuple group, two clean small files — mergeable, but never
    // both within a 1-byte batch budget
    TxLog.commit(rows(0 until 100, "a").coalesce(1), t, "w", 0L)
    TxLog.commit(rows(100 until 200, "b").coalesce(1), t, "w", 1L)
    val head = TxLog.history(spark, t).orderBy(desc("version"))
      .first().getAs[Long]("version")
    // the clean over-budget escape hatch must NOT fire: zero progress
    assert(TxLog.compactSmall(spark, t, targetBytes = 1L << 20,
      maxBatchBytes = 1L) == -1L,
      "a degenerate single-clean-file batch must refuse, not commit")
    assert(TxLog.history(spark, t).orderBy(desc("version"))
      .first().getAs[Long]("version") == head, "no version burned")
    // with a workable budget the same files merge in one call
    val v = TxLog.compactSmall(spark, t, targetBytes = 1L << 20,
      maxBatchBytes = 1L << 30)
    assert(v > 0L)
    assert(TxLog.snapshot(spark, t).get.count() == 200L)
    assert(TxLog.compactSmall(spark, t, targetBytes = 1L << 20,
      maxBatchBytes = 1L << 30) == -1L, "converged after the merge")
  }
}
