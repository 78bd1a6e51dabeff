package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** SQL-planned MERGE-ON-READ DML — the delta-based row-level operation
  * (`SupportsDelta`, [[graft.storage.TxLogDeltaRowLevelOperation]]).
  *
  * The r12 group-based V2 DML always rewrote the touched files; with
  * `graft.dml.mode=mergeOnRead` the SAME SQL statements now publish
  * deletion vectors + post-image appends addressed by the (`_file`,
  * `_pos`) row identity — O(affected rows), zero data-file rewrites,
  * through Spark's own DELETE/UPDATE/MERGE planning (closing the r13
  * review finding that SQL silently ignored the property). Every case
  * here pins BOTH row-identity to a copy-on-write twin AND the
  * zero-rewrite file accounting. */
class TxDeltaDmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txddml_").resolve("t").toString

  private def batch(ids: Range, grp: String): DataFrame =
    ids.map(i => (i.toLong, grp, i / 10.0, s"name-$i")).toDF("id", "grp", "score", "name")

  /** Three single-file commits with disjoint id ranges. */
  private def gen3(t: String): Unit = {
    TxLog.commit(batch(0 until 100, "alpha").coalesce(1), t, "w", 0L)
    TxLog.commit(batch(100 until 200, "beta").coalesce(1), t, "w", 1L)
    TxLog.commit(batch(200 until 300, "gamma").coalesce(1), t, "w", 2L)
  }

  private def mor3(): String = {
    val t = freshTable()
    gen3(t)
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    t
  }

  private def cow3(): String = { val t = freshTable(); gen3(t); t }

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
        if (st.getPath.getName.endsWith(".parquet")) out += st.getPath.toString
      }
      out.result()
    }
  }

  /** (n_files, n_removes) of the newest history row. */
  private def lastCommit(t: String): (Long, Long) = {
    val r = TxLog.history(spark, t).orderBy(desc("version")).first()
    (r.getAs[Long]("n_files"), r.getAs[Long]("n_removes"))
  }

  private def withSql(t: String)(body: String => Unit): Unit = {
    val name = s"tdd_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $name USING txlog OPTIONS (path '$t')")
    try body(name) finally spark.sql(s"DROP TABLE $name")
  }

  test("the _pos metadata column: absolute per-file row indexes, prunable, beside _file") {
    val t = freshTable()
    gen3(t)
    val got = spark.read.format("txlog").load(t)
      .select($"id", $"_file", $"_pos")
      .where($"grp" === "beta")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.length == 100)
    assert(got.map(_._2).distinct.length == 1, "beta is one file")
    // single-file commits preserve write order: id 100+k sits at index k
    got.foreach { case (id, _, pos) => assert(pos == id - 100L, s"id $id at pos $pos") }
    // _pos survives pushed filters (row-group skipping keeps absolutes)
    val one = spark.read.format("txlog").load(t)
      .select($"_pos").where($"id" === 205L).first().getLong(0)
    assert(one == 5L)
  }

  test("SQL DELETE under mergeOnRead: DV commit, pruned scan, no-op on no match, COW-identical") {
    val t = mor3(); val c = cow3()
    val before = dataFiles(t)
    withSql(t) { name =>
      spark.sql(s"DELETE FROM $name WHERE id % 7 = 0 AND grp != 'gamma'")
      TxLog.delete(spark, c, $"id" % 7 === 0 && $"grp" =!= "gamma", "d", 0L)
      assert(dataFiles(t) == before, "MoR SQL DELETE must not touch data files")
      val (nf, nr) = lastCommit(t)
      assert(nf == 0L && nr == 0L, s"expected a pure-DV commit, got files=$nf removes=$nr")
      assert(rows(spark.table(name)) == rows(TxLog.snapshot(spark, c).get))
      // gamma's file has no vector and stays fully live
      assert(spark.table(name).where($"grp" === "gamma").count() == 100L)
      // a DELETE matching nothing commits nothing
      val head = TxLog.headVersion(spark, t)
      spark.sql(s"DELETE FROM $name WHERE id = 99999")
      assert(TxLog.headVersion(spark, t) == head, "no-match DELETE must be a no-op")
      // the delta scan statically prunes: a point delete reads 1 of 3 files
      spark.sql(s"DELETE FROM $name WHERE id = 205")
      val (kept, total) = graft.storage.TxLogV2.lastPrune.get()
      assert(total == 3 && kept == 1, s"expected a 1-of-3 pruned op scan, got $kept of $total")
      assert(spark.table(name).where($"id" === 205).isEmpty)
    }
  }

  test("SQL UPDATE under mergeOnRead: DV + appended post-image, COW-identical") {
    val t = mor3(); val c = cow3()
    val before = dataFiles(t)
    withSql(t) { name =>
      spark.sql(s"UPDATE $name SET score = score + 100.0, name = concat(name, '!') " +
        "WHERE id % 11 = 0")
      TxLog.update(spark, c, $"id" % 11 === 0,
        Map("score" -> ($"score" + 100.0), "name" -> concat($"name", lit("!"))), "u", 0L)
      assert(before.subsetOf(dataFiles(t)), "pre-update files must survive untouched")
      val (nf, nr) = lastCommit(t)
      assert(nr == 0L, "MoR SQL UPDATE must remove no files")
      assert(nf >= 1L, "the post-image rows must be staged as new files")
      assert(rows(spark.table(name)) == rows(TxLog.snapshot(spark, c).get))
    }
  }

  test("SQL MERGE under mergeOnRead: multi-action (update/delete/insert), COW-identical") {
    val t = mor3(); val c = cow3()
    val before = dataFiles(t)
    val src = Seq((50L, "upd", 999.0, "updated-50"), (150L, "del", 0.0, "x"),
      (400L, "new", 4.0, "name-400"))
      .toDF("id", "grp", "score", "name")
    src.createOrReplaceTempView("tdd_src")
    try {
      withSql(t) { name =>
        spark.sql(
          s"""MERGE INTO $name tgt USING tdd_src s ON tgt.id = s.id
             |WHEN MATCHED AND s.grp = 'del' THEN DELETE
             |WHEN MATCHED THEN UPDATE SET score = s.score, name = s.name
             |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
        assert(before.subsetOf(dataFiles(t)), "pre-merge files must survive untouched")
        val (_, nr) = lastCommit(t)
        assert(nr == 0L, "MoR SQL MERGE must remove no files")
        val got = spark.table(name)
        assert(got.where($"id" === 150L).isEmpty, "matched-delete action")
        assert(got.where($"id" === 50L).select("name").first().getString(0) == "updated-50")
        assert(got.where($"id" === 400L).count() == 1L, "not-matched insert")
        assert(got.count() == 300L)
        // COW twin via the library (equi-merge upsert has no delete
        // action, so replay the three actions as update+delete+append;
        // the SQL UPDATE sets only score/name, so grp keeps "alpha")
        TxLog.merge(Seq((50L, "alpha", 999.0, "updated-50")).toDF("id", "grp", "score", "name"),
          c, Seq("id"), "m", 0L)
        TxLog.delete(spark, c, $"id" === 150L, "d2", 0L)
        TxLog.commit(Seq((400L, "new", 4.0, "name-400")).toDF("id", "grp", "score", "name"),
          c, "a2", 0L)
        assert(rows(got) == rows(TxLog.snapshot(spark, c).get))
      }
    } finally spark.catalog.dropTempView("tdd_src")
  }

  test("cumulative vectors through SQL: a second DELETE unions into one sidecar per file") {
    val t = mor3()
    withSql(t) { name =>
      spark.sql(s"DELETE FROM $name WHERE id = 5")
      spark.sql(s"DELETE FROM $name WHERE id = 6")
      assert(spark.table(name).count() == 298L)
      assert(spark.table(name).where($"id".isin(5L, 6L)).isEmpty)
      // full-file coverage through SQL removes the file outright
      spark.sql(s"DELETE FROM $name WHERE grp = 'beta'")
      val (nf, nr) = lastCommit(t)
      assert(nf == 0L && nr == 1L,
        s"a fully-deleted file must be REMOVED, not fully-DV'd (files=$nf removes=$nr)")
      assert(spark.table(name).count() == 198L)
    }
  }

  test("change feed captures SQL MoR DML: delete and update deltas, exact rows") {
    val t = mor3()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    val v0 = TxLog.headVersion(spark, t)
    withSql(t) { name =>
      spark.sql(s"DELETE FROM $name WHERE id = 42")
      spark.sql(s"UPDATE $name SET score = -1.0 WHERE id = 101")
    }
    val feed = spark.read.format("txlog")
      .option("readChangeFeed", "true")
      .option("startingVersion", (v0 + 1L).toString)
      .load(t)
    val got = feed.select($"id", $"_change_type", $"_commit_version", $"score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == Set(
      (42L, "delete", v0 + 1L, 4.2),
      (101L, "delete", v0 + 2L, 10.1),
      (101L, "insert", v0 + 2L, -1.0)), s"feed rows: $got")
  }

  test("partitioned mergeOnRead table: SQL DML stays within the layout") {
    val t = freshTable()
    val df = (0 until 300).map(i => (i.toLong, s"g${i % 3}", s"v-$i")).toDF("id", "grp", "v")
    TxLog.commitPartitioned(df, t, Seq("grp"), "w", 0L)
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    val before = dataFiles(t)
    withSql(t) { name =>
      spark.sql(s"DELETE FROM $name WHERE id % 10 = 3")
      assert(dataFiles(t) == before)
      assert(spark.table(name).count() == 270L)
      spark.sql(s"UPDATE $name SET v = 'upd' WHERE id % 10 = 4")
      // the post-image lands hive-staged under its partition dirs
      val newFiles = dataFiles(t) -- before
      assert(newFiles.nonEmpty && newFiles.forall(_.contains("__p_grp=")),
        s"post-image files must be partition-staged: $newFiles")
      // the delta write requires clustering+sort on the partition
      // columns (TxLogPartitionedWrite), so the rolling writer emits at
      // most one file per touched tuple — interleaved input without the
      // required distribution would roll a new file on every
      // consecutive grp change (here: 30 rows alternating g0/g1/g2)
      assert(newFiles.size <= 3,
        s"post-image must cluster to ≤1 file per touched partition tuple: $newFiles")
      assert(spark.table(name).where($"v" === "upd").count() == 30L)
      assert(rows(spark.table(name).where($"grp" === "g1")) ==
        rows(spark.read.format("txlog").load(t).where($"grp" === "g1")))
    }
  }

  test("reserved column names are refused at every schema door") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    for (bad <- Seq("_file", "_pos", "_change_type", "_commit_version")) {
      val sch = StructType(Seq(
        StructField("id", LongType), StructField(bad, StringType)))
      val e = intercept[IllegalArgumentException](
        TxLog.createTable(spark, freshTable(), sch))
      assert(e.getMessage.contains(bad) && e.getMessage.contains("reserved"))
    }
    // case-INSENSITIVE: Spark resolves names case-insensitively, so a
    // case variant would shadow the metadata column just the same
    val eCase = intercept[IllegalArgumentException](
      TxLog.createTable(spark, freshTable(), org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_File",
          org.apache.spark.sql.types.StringType)))))
    assert(eCase.getMessage.contains("reserved"))
    // the data-commit door (schema arrives with the DataFrame) —
    // fail-fast: the refused append must stage NO data files
    val t = freshTable()
    val e2 = intercept[IllegalArgumentException](
      TxLog.commit(Seq((1L, "x")).toDF("id", "_pos"), t, "w", 0L))
    assert(e2.getMessage.contains("_pos"))
    assert(dataFiles(t).isEmpty, "refused commit must not stage data files")
    // the evolution door (ADD COLUMNS)
    val t2 = freshTable()
    TxLog.commit(Seq((1L, "x")).toDF("id", "name"), t2, "w", 0L)
    val e3 = intercept[IllegalArgumentException](
      TxLog.evolveSchema(spark, t2, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_file",
          org.apache.spark.sql.types.StringType)))))
    assert(e3.getMessage.contains("_file"))
    // a user column that is NOT reserved still works beside metadata
    val t3 = freshTable()
    TxLog.commit(Seq((1L, "x")).toDF("id", "file"), t3, "w", 0L)
    assert(spark.read.format("txlog").load(t3)
      .select("id", "file", "_file").count() == 1L)
  }
}
