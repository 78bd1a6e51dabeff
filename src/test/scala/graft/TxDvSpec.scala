package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{TxDv, TxLog}

/** DELETION VECTORS (merge-on-read DML, the `graft.dml.mode` table
  * property — [[TxDv]]).
  *
  * The contract: with `mergeOnRead`, DELETE/UPDATE/MERGE produce results
  * ROW-IDENTICAL to the copy-on-write twin while rewriting ZERO touched
  * data files (sidecars only); every reader — native snapshot/scanWhere,
  * the V2 source, SQL, time travel, streams, the change feed — applies
  * the vectors; `compact` purges them back to clean files; vacuum
  * collects orphaned and superseded sidecars. */
class TxDvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txdv_").resolve("t").toString

  private def batch(ids: Range, grp: String,
                    scoreOf: Int => java.lang.Double = i => i / 10.0): DataFrame =
    ids.map(i => (i.toLong, grp, scoreOf(i), s"name-$i"))
      .toDF("id", "grp", "score", "name")

  /** Three single-file commits with disjoint id ranges, mergeOnRead. */
  private def mor3(): String = {
    val t = freshTable()
    TxLog.commit(batch(0 until 100, "alpha").coalesce(1), t, "w", 0L)
    TxLog.commit(batch(100 until 200, "beta").coalesce(1), t, "w", 1L)
    TxLog.commit(batch(200 until 300, "gamma").coalesce(1), t, "w", 2L)
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    t
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def dataFiles(t: String): Set[String] = {
    val root = new org.apache.hadoop.fs.Path(t)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dd = new org.apache.hadoop.fs.Path(root, "data")
    if (!f.exists(dd)) Set.empty
    else {
      val it = f.listFiles(dd, true)
      val out = Set.newBuilder[String]
      while (it.hasNext) {
        val st = it.next()
        if (st.getPath.getName.endsWith(".parquet"))
          out += s"${st.getPath.getParent.getName}/${st.getPath.getName}"
      }
      out.result()
    }
  }

  // ------------------------------------------------------------------
  // the vector itself
  // ------------------------------------------------------------------

  test("GDV1 wire format: roundtrip, dedup+sort, union, membership, malformed loud") {
    val a = TxDv.fromPositions(Array(7L, 3L, 7L, 0L, 1000000L))
    assert(a.cardinality == 4L)
    assert(a.positions.toSeq == Seq(0L, 3L, 7L, 1000000L))
    val rt = TxDv.deserialize(TxDv.serialize(a))
    assert(rt.positions.toSeq == a.positions.toSeq)
    assert(rt.contains(7L) && rt.contains(0L) && !rt.contains(4L) && !rt.contains(999999L))
    val b = TxDv.fromPositions(Array(3L, 8L))
    val u = a.union(b)
    assert(u.positions.toSeq == Seq(0L, 3L, 7L, 8L, 1000000L))
    assert(TxDv.deserialize(TxDv.serialize(TxDv.empty)).cardinality == 0L)
    intercept[IllegalArgumentException] { TxDv.deserialize("junk-bytes!!".getBytes) }
  }

  // ------------------------------------------------------------------
  // DELETE
  // ------------------------------------------------------------------

  test("MoR DELETE: row-identical to the COW twin, ZERO data files rewritten") {
    val t = mor3()
    val cow = freshTable()
    TxLog.commit(batch(0 until 100, "alpha").coalesce(1), cow, "w", 0L)
    TxLog.commit(batch(100 until 200, "beta").coalesce(1), cow, "w", 1L)
    TxLog.commit(batch(200 until 300, "gamma").coalesce(1), cow, "w", 2L)
    val before = dataFiles(t)
    val pred = $"id" % 7 === 0 && $"grp" =!= "gamma"
    val r = TxLog.delete(spark, t, pred, "d", 0L)
    TxLog.delete(spark, cow, pred, "d", 0L)
    assert(r.addedFiles == 0, "merge-on-read delete must stage no data files")
    assert(dataFiles(t) == before, "merge-on-read delete must not rewrite data files")
    assert(rows(TxLog.snapshot(spark, t).get) == rows(TxLog.snapshot(spark, cow).get))
    // V2 source read and SQL agree
    assert(rows(spark.read.format("txlog").load(t)) == rows(TxLog.snapshot(spark, cow).get))
    // scanWhere (pruned path) row-identity on a predicate over the DV'd file
    assert(rows(TxLog.scanWhere(spark, t, $"id" < 50L).get) ==
      rows(TxLog.snapshot(spark, cow).get.where($"id" < 50L)))
    // gamma's file untouched: no DV, still prunable and fully live
    assert(TxLog.snapshot(spark, t).get.where($"grp" === "gamma").count() == 100)
  }

  test("MoR DELETE twice on one file: vectors are cumulative (union), not replaced") {
    val t = mor3()
    TxLog.delete(spark, t, $"id" === 5L, "d", 0L)
    TxLog.delete(spark, t, $"id" === 6L, "d", 1L)
    val got = TxLog.snapshot(spark, t).get
    assert(got.where($"id".isin(5L, 6L)).count() == 0L)
    assert(got.count() == 298L)
    // the second statement's sidecar carries BOTH positions
    val hist = TxLog.history(spark, t)
    val last = hist.orderBy($"version".desc).first()
    assert(last.getAs[Long]("n_dvs") == 1L)
    assert(last.getAs[Long]("dv_rows") == 2L, "cumulative DV must hold both deletes")
  }

  test("MoR DELETE of every row in a file removes the file outright (no empty-file DV)") {
    val t = mor3()
    val r = TxLog.delete(spark, t, $"grp" === "beta", "d", 0L)
    assert(r.removedFiles == 1)
    val ms = TxLog.snapshot(spark, t).get
    assert(ms.count() == 200L)
    assert(ms.where($"grp" === "beta").count() == 0L)
    val last = TxLog.history(spark, t).orderBy($"version".desc).first()
    assert(last.getAs[Long]("n_dvs") == 0L, "a fully-dead file must be a remove, not a DV")
    assert(last.getAs[Long]("n_removes") == 1L)
  }

  test("MoR DELETE matching nothing (or only already-deleted rows) commits nothing") {
    val t = mor3()
    val head = TxLog.headVersion(spark, t)
    val r = TxLog.delete(spark, t, $"id" === 99999L, "d", 0L)
    assert(r.version == head && r.removedFiles == 0)
    TxLog.delete(spark, t, $"id" === 5L, "d", 1L)
    val h2 = TxLog.headVersion(spark, t)
    val r2 = TxLog.delete(spark, t, $"id" === 5L, "d", 2L) // already deleted
    assert(r2.version == h2 && r2.removedFiles == 0,
      "re-deleting already-DV'd rows must be a no-op commit")
  }

  test("pushed filters keep row-group skipping on DV'd files without losing rows") {
    // many row groups in one file so parquet can skip; DV a few rows;
    // a range predicate over the file must return exactly live ∩ range
    val t = freshTable()
    spark.conf.set("spark.hadoop.parquet.block.size", "4096")
    try TxLog.commit((0 until 50000).map(i => (i.toLong, s"v-$i")).toDF("id", "v")
      .coalesce(1), t, "w", 0L)
    finally spark.conf.unset("spark.hadoop.parquet.block.size")
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, t, $"id".isin(49001L, 49500L, 100L), "d", 0L)
    val got = spark.read.format("txlog").load(t).where($"id" >= 49000L)
    assert(got.count() == 998L)
    assert(got.where($"id".isin(49001L, 49500L)).count() == 0L)
    assert(got.agg(sum($"id")).first().getLong(0) ==
      (49000L until 50000L).filterNot(Set(49001L, 49500L)).sum)
  }

  // ------------------------------------------------------------------
  // UPDATE / MERGE
  // ------------------------------------------------------------------

  test("MoR UPDATE: DV + appended post-image, row-identical to the COW twin") {
    val t = mor3()
    val cow = freshTable()
    TxLog.commit(batch(0 until 100, "alpha").coalesce(1), cow, "w", 0L)
    TxLog.commit(batch(100 until 200, "beta").coalesce(1), cow, "w", 1L)
    TxLog.commit(batch(200 until 300, "gamma").coalesce(1), cow, "w", 2L)
    val before = dataFiles(t)
    val pred = $"id" >= 150L && $"id" < 160L
    val set = Map("score" -> lit(99.5), "name" -> concat(lit("u-"), $"id"))
    val r = TxLog.update(spark, t, pred, set, "u", 0L)
    TxLog.update(spark, cow, pred, set, "u", 0L)
    assert(r.addedFiles >= 1, "the post-image rows land as new files")
    assert(before.subsetOf(dataFiles(t)), "touched files stay on disk untouched")
    assert(rows(TxLog.snapshot(spark, t).get) == rows(TxLog.snapshot(spark, cow).get))
    assert(TxLog.snapshot(spark, t).get.where($"name".startsWith("u-")).count() == 10L)
  }

  test("MoR MERGE: matched keys replaced via DV, inserts appended, COW-identical") {
    val t = mor3()
    val cow = freshTable()
    TxLog.commit(batch(0 until 100, "alpha").coalesce(1), cow, "w", 0L)
    TxLog.commit(batch(100 until 200, "beta").coalesce(1), cow, "w", 1L)
    TxLog.commit(batch(200 until 300, "gamma").coalesce(1), cow, "w", 2L)
    // source in a scrambled column order: replacements + brand-new keys
    val src = Seq((77.0, 105L, "m-105", "beta"), (88.0, 500L, "m-500", "delta"))
      .toDF("score", "id", "name", "grp")
    val before = dataFiles(t)
    TxLog.merge(src, t, Seq("id"), "m", 0L)
    TxLog.merge(src, cow, Seq("id"), "m", 0L)
    assert(before.subsetOf(dataFiles(t)))
    assert(rows(TxLog.snapshot(spark, t).get) == rows(TxLog.snapshot(spark, cow).get))
    val got = TxLog.snapshot(spark, t).get
    assert(got.where($"id" === 105L).first().getAs[String]("name") == "m-105")
    assert(got.where($"id" === 500L).count() == 1L)
    assert(got.count() == 301L)
  }

  // ------------------------------------------------------------------
  // metadata aggregates, stats, pruning
  // ------------------------------------------------------------------

  test("count(*) stays a metadata-only aggregate under DVs and is EXACT; extrema fall back") {
    val t = mor3()
    TxLog.delete(spark, t, $"id" >= 290L, "d", 0L) // deletes the max rows
    val v = s"dvagg_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $v USING txlog LOCATION '$t'")
    try {
      val cnt = spark.sql(s"SELECT count(*) AS c FROM $v")
      assert(cnt.queryExecution.executedPlan.toString.contains("LocalTableScan") ||
        cnt.queryExecution.optimizedPlan.toString.contains("MetaAgg") ||
        !cnt.queryExecution.executedPlan.toString.contains("Parquet"),
        s"count(*) should not scan data files:\n${cnt.queryExecution.executedPlan}")
      assert(cnt.first().getLong(0) == 290L)
      // max(id) must NOT come from footer bounds (the max rows are deleted)
      assert(spark.sql(s"SELECT max(id) FROM $v").first().getLong(0) == 289L)
      assert(spark.sql(s"SELECT min(id), count(id) FROM $v").first().getLong(0) == 0L)
    } finally spark.sql(s"DROP TABLE $v")
  }

  test("zone-map pruning stays sound over DV'd files (conservative keep, correct rows)") {
    val t = mor3()
    TxLog.delete(spark, t, $"id" === 150L, "d", 0L)
    // the beta file survives with a DV; a point lookup still prunes 1-of-3
    assert(TxLog.pruneCount(spark, t, $"id" === 150L) == ((1, 3)))
    assert(TxLog.scanWhere(spark, t, $"id" === 150L).get.count() == 0L)
    assert(TxLog.scanWhere(spark, t, $"id" === 151L).get.count() == 1L)
  }

  // ------------------------------------------------------------------
  // time travel / restore / compaction / vacuum
  // ------------------------------------------------------------------

  test("time travel brackets a DV commit; RESTORE to before it resurrects the rows") {
    val t = mor3()
    val v0 = TxLog.headVersion(spark, t)
    TxLog.delete(spark, t, $"id" < 10L, "d", 0L)
    assert(TxLog.snapshotAt(spark, t, v0).get.count() == 300L)
    assert(TxLog.snapshot(spark, t).get.count() == 290L)
    val rv = TxLog.restore(spark, t, v0)
    assert(rv > v0)
    assert(TxLog.snapshot(spark, t).get.count() == 300L,
      "restore to the pre-DV version must resurrect the DV'd rows")
    // and time travel to the DV'd version still applies its vector
    assert(TxLog.snapshotAt(spark, t, v0 + 1).get.count() == 290L)
  }

  test("compact PURGES deletion vectors: clean checkpoint, identical rows, no dv entries") {
    val t = mor3()
    TxLog.delete(spark, t, $"id" % 3 === 0, "d", 0L)
    val want = rows(TxLog.snapshot(spark, t).get)
    val cv = TxLog.compact(spark, t, targetBytes = 1L << 30)
    assert(cv > 0)
    assert(rows(TxLog.snapshot(spark, t).get) == want)
    val last = TxLog.history(spark, t).orderBy($"version".desc).first()
    assert(last.getAs[String]("operation") == "COMPACT")
    assert(last.getAs[Long]("n_dvs") == 0L, "compaction output must carry no DVs")
    // post-compact: V2 count(*) meta-agg exact again, data re-readable
    assert(spark.read.format("txlog").load(t).count() == want.size.toLong)
  }

  test("clusterBy PURGES deletion vectors too (re-layout through the DV-applied read)") {
    val t = mor3()
    TxLog.delete(spark, t, $"id" % 7 === 1, "d", 0L)
    val want = rows(TxLog.snapshot(spark, t).get)
    val cv = TxLog.clusterBy(spark, t, Seq("id"), targetFiles = 2)
    assert(cv > 0)
    assert(rows(TxLog.snapshot(spark, t).get) == want)
    val last = TxLog.history(spark, t).orderBy($"version".desc).first()
    assert(last.getAs[Long]("n_dvs") == 0L, "re-layout output must carry no DVs")
    assert(spark.read.format("txlog").load(t).count() == want.size.toLong)
  }

  test("vacuum collects orphaned and superseded sidecars, keeps referenced ones") {
    val t = mor3()
    TxLog.delete(spark, t, $"id" === 5L, "d", 0L)  // sidecar A (superseded next)
    TxLog.delete(spark, t, $"id" === 6L, "d", 1L)  // sidecar B (cumulative, live)
    val root = new org.apache.hadoop.fs.Path(t)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvDir = new org.apache.hadoop.fs.Path(root, "dv")
    assert(f.listStatus(dvDir).length == 2)
    // an orphan from a "crashed" writer
    val orphan = TxDv.fromPositions(Array(1L, 2L))
    val orphanRel = {
      val p = new org.apache.hadoop.fs.Path(dvDir, "orphan.dv")
      val o = f.create(p, false); o.write(TxDv.serialize(orphan)); o.close(); "dv/orphan.dv"
    }
    // both manifests still reference their sidecars -> only the orphan goes
    assert(TxLog.vacuum(spark, t, minAgeMs = 0L) >= 1)
    assert(!f.exists(new org.apache.hadoop.fs.Path(root, orphanRel)))
    assert(f.listStatus(dvDir).length == 2, "referenced sidecars must survive")
    assert(TxLog.snapshot(spark, t).get.count() == 298L)
    // compact + vacuum truncates the log -> ALL sidecars become orphans
    TxLog.compact(spark, t, targetBytes = 1L << 30)
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    assert(!f.exists(dvDir) || f.listStatus(dvDir).isEmpty,
      "post-truncation sidecars of dead generations must be collected")
    assert(TxLog.snapshot(spark, t).get.count() == 298L)
  }

  // ------------------------------------------------------------------
  // streams + change feed
  // ------------------------------------------------------------------

  test("plain stream: initial snapshot applies DVs; a tail DV commit fails loudly") {
    val t = mor3()
    TxLog.delete(spark, t, $"id" < 50L, "d", 0L)
    val name = s"dvstream_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog").load(t)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("txdv_ck_").toString)
      .start()
    q.processAllAvailable()
    assert(spark.table(name).count() == 250L,
      "snapshot batch must serve the DV-applied live rows")
    assert(spark.table(name).where($"id" < 50L).count() == 0L)
    // a DV commit in the tail is a rewrite -> loud
    TxLog.delete(spark, t, $"id" === 60L, "d", 1L)
    intercept[Exception] { q.processAllAvailable(); q.awaitTermination() }
    assert(!q.isActive)
  }

  test("change feed: MoR DELETE and UPDATE capture retract/add deltas like COW") {
    val t = mor3()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    val v1 = TxLog.delete(spark, t, $"id" === 7L, "d", 0L).version
    val v2 = TxLog.update(spark, t, $"id" === 8L, Map("score" -> lit(1.25)), "u", 0L).version
    def changes(v: Long) = spark.read.format("txlog")
      .option("readChangeFeed", "true")
      .option("startingVersion", v.toString).option("endingVersion", v.toString)
      .load(t)
    val d = changes(v1)
    assert(d.count() == 1L)
    assert(d.first().getAs[String]("_change_type") == "delete")
    assert(d.first().getAs[Long]("id") == 7L)
    val u = changes(v2).orderBy($"_change_type")
    val us = u.collect()
    assert(us.length == 2)
    assert(us.map(_.getAs[String]("_change_type")).toSeq == Seq("delete", "insert"))
    assert(us.forall(_.getAs[Long]("id") == 8L))
    assert(us.find(_.getAs[String]("_change_type") == "insert").get
      .getAs[Double]("score") == 1.25)
    // deleting an already-deleted row again: no commit, so no feed entry
    val h = TxLog.headVersion(spark, t)
    TxLog.delete(spark, t, $"id" === 7L, "d", 1L)
    assert(TxLog.headVersion(spark, t) == h)
  }

  test("change-feed STREAM snapshot applies DVs (no resurrected inserts)") {
    val t = mor3()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    TxLog.delete(spark, t, $"id" < 100L, "d", 0L) // empties alpha entirely
    TxLog.delete(spark, t, $"id" === 150L, "d", 1L) // DVs beta
    val name = s"dvcdc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog").option("readChangeFeed", "true").load(t)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("txdv_cdc_").toString)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table(name)
      assert(got.where($"_change_type" === "insert").count() == 199L)
      assert(got.where($"id" === 150L).count() == 0L)
    } finally q.stop()
  }

  // ------------------------------------------------------------------
  // isolation, exactly-once, COW-over-DV
  // ------------------------------------------------------------------

  test("serializable: a concurrent commit between snapshot and publish conflicts loudly") {
    val t = mor3()
    intercept[java.util.ConcurrentModificationException] {
      TxLog.delete(spark, t, $"id" === 5L, "d", 0L,
        beforeCommit = () =>
          TxLog.commit(batch(300 until 310, "zeta").coalesce(1), t, "late", 0L))
    }
    assert(TxLog.snapshot(spark, t).get.where($"id" === 5L).count() == 1L,
      "the conflicted DV delete must not be visible")
    // the staged sidecar is an orphan -> vacuum collects it
    assert(TxLog.vacuum(spark, t, minAgeMs = 0L) >= 1)
  }

  test("exactly-once: a replayed (writerId, batchId) MoR delete is a no-op") {
    val t = mor3()
    val r1 = TxLog.delete(spark, t, $"id" === 5L, "replay", 7L)
    assert(r1.version > 0)
    val r2 = TxLog.delete(spark, t, $"id" === 6L, "replay", 7L) // same token
    assert(r2.version == -1L, "token replay must commit nothing")
    assert(TxLog.snapshot(spark, t).get.where($"id" === 6L).count() == 1L)
  }

  test("COW DML over a DV'd file rewrites it, drops its DV, and captures only live rows") {
    val t = mor3()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    TxLog.delete(spark, t, $"id" === 5L, "d", 0L) // MoR: alpha gets a DV
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeCow))
    val v = TxLog.delete(spark, t, $"id" < 10L, "d2", 0L).version // COW rewrite of alpha
    val got = TxLog.snapshot(spark, t).get
    assert(got.count() == 290L)
    assert(got.where($"id" < 10L).count() == 0L)
    // the capture must NOT re-report id=5 (it was already deleted)
    val ch = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", v.toString).option("endingVersion", v.toString)
      .load(t)
    assert(ch.where($"_change_type" === "delete").count() == 9L)
    assert(ch.where($"id" === 5L).count() == 0L)
    // and the rewritten file has no DV
    val last = TxLog.history(spark, t).orderBy($"version".desc).first()
    assert(last.getAs[Long]("n_dvs") == 0L)
  }

  test("partitioned table: MoR update stays within the touched partition, layout preserved") {
    val t = freshTable()
    val df = (0 until 300).map(i =>
      (i.toLong, if (i < 150) "p1" else "p2", i / 10.0)).toDF("id", "part", "score")
    TxLog.commitPartitioned(df, t, Seq("part"), "w", 0L)
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    val before = dataFiles(t)
    TxLog.update(spark, t, $"id" === 7L, Map("score" -> lit(77.0)), "u", 0L)
    assert(before.subsetOf(dataFiles(t)))
    val got = TxLog.snapshot(spark, t).get
    assert(got.count() == 300L)
    assert(got.where($"id" === 7L).first().getAs[Double]("score") == 77.0)
    // partition pruning still exact on both values
    assert(got.where($"part" === "p1").count() == 150L)
    assert(rows(TxLog.scanWhere(spark, t, $"part" === "p2").get) ==
      rows(got.where($"part" === "p2")))
  }

  test("schema evolution: a DV'd file predating a column still reads (nulls + vector)") {
    val t = freshTable()
    TxLog.commit((0 until 50).map(i => (i.toLong, s"n$i")).toDF("id", "name")
      .coalesce(1), t, "w", 0L)
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, t, $"id" === 3L, "d", 0L)
    // evolve: a later append adds a column
    TxLog.commit((50 until 60).map(i => (i.toLong, s"n$i", Option(i * 1.5)))
      .toDF("id", "name", "score").coalesce(1), t, "w2", 0L)
    val got = TxLog.snapshot(spark, t).get
    assert(got.columns.toSeq == Seq("id", "name", "score"))
    assert(got.count() == 59L)
    assert(got.where($"id" === 3L).count() == 0L)
    assert(got.where($"id" === 5L).first().isNullAt(2))
    assert(rows(spark.read.format("txlog").load(t)) == rows(got))
  }

  test("a DV'd file no longer forces the scan row-based: columnar plan pin, exact rows") {
    val t = mor3()
    TxLog.delete(spark, t, $"id" >= 110L && $"id" < 120L, "d", 0L)
    val got = spark.read.format("txlog").load(t)
    // the executed plan keeps the vectorized path (ColumnarToRow above
    // the batch scan) even though one of the three files carries a DV —
    // before the SelectedColumnVector remap, ANY live DV dropped the
    // whole scan (all three files) to row-based parquet decoding
    val plan = got.queryExecution.executedPlan
    assert(plan.collect {
      case c: org.apache.spark.sql.execution.ColumnarToRowExec => c
    }.nonEmpty, s"DV'd scan must stay columnar:\n$plan")
    val expect = batch(0 until 100, "alpha")
      .unionByName(batch(100 until 200, "beta").where(!($"id" >= 110L && $"id" < 120L)))
      .unionByName(batch(200 until 300, "gamma"))
    assert(rows(got) == rows(expect))
  }

  test("columnar DV filtering exact across batch shapes and nested/null types") {
    // one file, several vectorized batches (4k rows each): batch 0
    // untouched (unwrapped pass-through), a fully-dead range (whole
    // batches skipped), scattered deletes elsewhere (selection remap) —
    // over nullable strings/doubles, arrays and structs (the
    // getChild-wrapping path)
    val t = freshTable()
    val n = 20000
    val df = spark.range(n).select(
      col("id"),
      when(col("id") % 7 === 0, lit(null))
        .otherwise(concat(lit("s"), col("id"))).as("s"),
      when(col("id") % 11 === 0, lit(null)).otherwise(col("id") / 3.0).as("d"),
      array(col("id"), col("id") * 2).as("arr"),
      struct((col("id") % 5).as("a"),
        concat(lit("x"), col("id") % 3).as("b")).as("st"))
    TxLog.commit(df.coalesce(1), t, "w", 0L)
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    val scattered = col("id") % 97 === 5 && col("id") >= 4096
    val deadRange = col("id") >= 8192 && col("id") < 12288
    TxLog.delete(spark, t, scattered, "d", 0L)
    TxLog.delete(spark, t, deadRange, "d", 1L)
    val got = spark.read.format("txlog").load(t)
    val expect = df.where(!scattered && !deadRange)
    assert(got.count() == expect.count())
    assert(got.exceptAll(expect).isEmpty && expect.exceptAll(got).isEmpty)
  }
}
