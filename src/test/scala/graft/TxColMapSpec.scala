package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** COLUMN MAPPING (r14): RENAME/DROP COLUMN as metadata-only
  * transactions. The recorded schema speaks LOGICAL names; every file,
  * zone map, bloom filter and partition spec speaks the column's
  * immutable PHYSICAL name — so a rename on a 100 TB table is one
  * manifest put, old files keep reading correctly by physical name,
  * and time travel serves the names in force at each version. */
class TxColMapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txcolmap_").resolve("t").toString

  private def df3(n: Int) =
    (0 until n).map(i => (i.toLong, s"g${i % 3}", i * 10.0)).toDF("id", "grp", "score")

  private def dataFileCount(t: String): Int = {
    val root = java.nio.file.Paths.get(t, "data")
    if (!java.nio.file.Files.exists(root)) 0
    else {
      var n = 0
      java.nio.file.Files.walk(root).forEach(p =>
        if (p.toString.endsWith(".parquet")) n += 1)
      n
    }
  }

  test("rename is metadata-only; reads, filters and pruning follow the new name") {
    val t = freshTable()
    TxLog.createTable(spark, t, df3(0).schema)
    df3(300).write.format("txlog").mode("append").save(t)
    val filesBefore = dataFileCount(t)
    val v = TxLog.renameColumn(spark, t, "grp", "bucket_name")
    assert(v == 2L)
    assert(dataFileCount(t) == filesBefore, "rename must move zero data bytes")
    val df = spark.read.format("txlog").load(t)
    assert(df.columns.toSeq == Seq("id", "bucket_name", "score"))
    // history names the transaction
    assert(TxLog.history(spark, t).orderBy(col("version").desc)
      .first().getAs[String]("operation") == "ALTER COLUMN MAPPING")
    // values intact, filter on the NEW name works end to end
    assert(df.where(col("bucket_name") === "g1").count() == 100L)
    // zone maps keyed by the PHYSICAL name still prune on the new name
    val (kept, total) = TxLog.pruneCount(spark, t, col("id") < 0L)
    assert(total > 0 && kept == 0, s"kept $kept of $total")
    // old name is gone, loudly
    intercept[Exception](df.where(col("grp") === "g1").count())
  }

  test("writes after a rename keep the physical layout; new readers see both eras") {
    val t = freshTable()
    TxLog.createTable(spark, t, df3(0).schema)
    df3(100).write.format("txlog").mode("append").save(t)
    TxLog.renameColumn(spark, t, "grp", "g2")
    // V2 append under the NEW logical name lands in the same physical column
    (100 until 200).map(i => (i.toLong, s"g${i % 3}", i * 10.0))
      .toDF("id", "g2", "score")
      .write.format("txlog").mode("append").save(t)
    val df = spark.read.format("txlog").load(t)
    assert(df.count() == 200L)
    assert(df.where(col("g2") === "g0").count() ===
      (0 until 200).count(_ % 3 == 0).toLong)
    // library commit path too
    TxLog.commit((200 until 210).map(i => (i.toLong, "gX", 1.0))
      .toDF("id", "g2", "score"), t, "w2", 0L)
    assert(spark.read.format("txlog").load(t).where(col("g2") === "gX").count() == 10L)
  }

  test("time travel serves the schema AND names as of each version") {
    val t = freshTable()
    TxLog.createTable(spark, t, df3(0).schema)
    df3(50).write.format("txlog").mode("append").save(t) // v1
    TxLog.renameColumn(spark, t, "score", "quality")     // v2
    df3(50).select(col("id") + 50, col("grp"), col("score").as("quality"))
      .toDF("id", "grp", "quality")
      .write.format("txlog").mode("append").save(t)      // v3
    val now = spark.read.format("txlog").load(t)
    assert(now.columns.toSeq == Seq("id", "grp", "quality"))
    assert(now.count() == 100L)
    val past = spark.read.format("txlog").option("versionAsOf", "1").load(t)
    assert(past.columns.toSeq == Seq("id", "grp", "score"))
    assert(past.agg(sum("score")).first().getDouble(0) ==
      (0 until 50).map(_ * 10.0).sum)
  }

  test("drop is metadata-only; re-adding the name mints a fresh physical") {
    val t = freshTable()
    TxLog.createTable(spark, t, df3(0).schema)
    df3(100).write.format("txlog").mode("append").save(t)
    val filesBefore = dataFileCount(t)
    TxLog.dropColumn(spark, t, "score")
    assert(dataFileCount(t) == filesBefore)
    val df = spark.read.format("txlog").load(t)
    assert(df.columns.toSeq == Seq("id", "grp"))
    // re-add the same logical name: a mapped table requires DECLARED
    // evolution, and the re-added column must NOT resurrect old values
    val withScore = StructType(df.schema.fields :+
      StructField("score", DoubleType, nullable = true))
    TxLog.evolveSchema(spark, t, withScore)
    val df2 = spark.read.format("txlog").load(t)
    assert(df2.columns.toSeq == Seq("id", "grp", "score"))
    assert(df2.where(col("score").isNotNull).count() == 0L,
      "dropped values must not resurrect through a re-added column")
    // and new writes land in the minted physical, readable again
    Seq((1000L, "z", 42.0)).toDF("id", "grp", "score")
      .write.format("txlog").mode("append").save(t)
    assert(spark.read.format("txlog").load(t)
      .where(col("score") === 42.0).count() == 1L)
  }

  test("data writes evolve mapped tables: free names mint in the append's own txn") {
    // r15: the append mints `l -> l` inside its own transaction when
    // the staged files' column name is free among live+retired
    // physicals — the r14 blanket refusal survives only as the clash
    // case below
    val t = freshTable()
    TxLog.createTable(spark, t, df3(0).schema)
    df3(10).write.format("txlog").mode("append").save(t)
    TxLog.renameColumn(spark, t, "grp", "g")
    (0 until 5).map(i => (100L + i, "x", 1.0, Option(i)))
      .toDF("id", "g", "score", "extra")
      .write.format("txlog").mode("append").save(t)
    val df = spark.read.format("txlog").load(t)
    assert(df.columns.toSeq == Seq("id", "g", "score", "extra"))
    assert(df.where(col("extra").isNotNull).count() == 5L)
    assert(df.where(col("extra") === 3).select("id").as[Long].head() == 103L)
    // pre-evolution files backfill null
    assert(df.where(col("id") < 100L && col("extra").isNull).count() == 10L)
    // the minted mapping is a real one: the new column renames cleanly
    TxLog.renameColumn(spark, t, "extra", "bonus")
    assert(spark.read.format("txlog").load(t)
      .where(col("bonus") === 3).count() == 1L)
  }

  test("data-write evolution clashes stay loud: retired and live physical names") {
    val t = freshTable()
    TxLog.createTable(spark, t, df3(0).schema)
    df3(10).write.format("txlog").mode("append").save(t)
    TxLog.dropColumn(spark, t, "score") // retires physical "score"
    // a data write re-adding "score" would resurrect dropped values
    val e1 = intercept[Exception] {
      (0 until 5).map(i => (100L + i, "x", Option(9.9))).toDF("id", "grp", "score")
        .write.format("txlog").mode("append").save(t)
    }
    assert(e1.getMessage != null && e1.getMessage.contains("collide"),
      s"got: ${e1.getMessage}")
    // a new column named an OLD logical (whose physical is live) clashes
    TxLog.renameColumn(spark, t, "grp", "g")
    val e2 = intercept[Exception] {
      (0 until 5).map(i => (100L + i, "x", "old-name"))
        .toDF("id", "g", "grp")
        .write.format("txlog").mode("append").save(t)
    }
    assert(e2.getMessage != null && e2.getMessage.contains("collide"),
      s"got: ${e2.getMessage}")
    // declared evolution still mints a FRESH physical for the same name
    val withScore = StructType(StructType(spark.read.format("txlog").load(t)
      .schema.fields) :+ StructField("score", DoubleType, nullable = true))
    TxLog.evolveSchema(spark, t, withScore)
    Seq((200L, "y", 5.5)).toDF("id", "g", "score")
      .write.format("txlog").mode("append").save(t)
    val df = spark.read.format("txlog").load(t)
    assert(df.where(col("score") === 5.5).count() == 1L)
    assert(df.where(col("score").isNotNull).count() == 1L,
      "dropped values must not resurrect")
  }

  test("evolve-append vs concurrent colmap commit: benign races fold, hostile ones are loud") {
    // benign: a concurrent DECLARED evolution of the same column lands
    // between staging and publish — the retry re-derives, the declared
    // mapping matches the staged name, the append folds in cleanly
    val t = freshTable()
    TxLog.createTable(spark, t, df3(0).schema)
    df3(10).write.format("txlog").mode("append").save(t)
    TxLog.renameColumn(spark, t, "grp", "g")
    val declared = StructType(df3(0).schema.fields.map(f =>
      if (f.name == "grp") f.copy(name = "g") else f) :+
      StructField("extra", IntegerType, nullable = true))
    TxLog.publishRaceForTests = () => { TxLog.evolveSchema(spark, t, declared); () }
    try {
      TxLog.commit((0 until 3).map(i => (300L + i, "z", 1.0, Option(i)))
        .toDF("id", "g", "score", "extra"), t, "w-race", 7L)
    } finally TxLog.publishRaceForTests = null
    val df = spark.read.format("txlog").load(t)
    assert(df.where(col("extra").isNotNull).count() == 3L)
    // hostile: a concurrent DROP of a column the staged files still
    // carry — the re-derived merge re-adds it, its physical is retired,
    // the clash is loud (never a silent resurrect)
    val t2 = freshTable()
    TxLog.createTable(spark, t2, df3(0).schema)
    df3(10).write.format("txlog").mode("append").save(t2)
    TxLog.renameColumn(spark, t2, "grp", "g") // make the table mapped
    TxLog.publishRaceForTests = () => { TxLog.dropColumn(spark, t2, "score"); () }
    try {
      val e = intercept[Exception] {
        TxLog.commit((0 until 3).map(i => (300L + i, "z", Option(1.0)))
          .toDF("id", "g", "score"), t2, "w-race2", 8L)
      }
      assert(e.getMessage != null && e.getMessage.contains("collide"),
        s"got: ${e.getMessage}")
    } finally TxLog.publishRaceForTests = null
    // the drop won; the table is consistent without score
    assert(spark.read.format("txlog").load(t2).columns.toSeq == Seq("id", "g"))
  }

  test("drift guard: a concurrent evolution minting the SAME name elsewhere conflicts") {
    // the sharpest race: physical "extra" is RETIRED; a writer stages an
    // append carrying new column "extra" (on-disk name "extra"); between
    // staging and publish a DECLARED evolution mints extra -> extra_1.
    // The retry then sees "extra" as known (newCols empty — the clash
    // check never runs), but the staged files' on-disk name is the
    // retired physical: committing would bind files whose column reads
    // NULL forever. The drift guard must conflict loudly.
    val t = freshTable()
    val base = (0 until 10).map(i => (i.toLong, s"g$i", Option(i)))
      .toDF("id", "grp", "extra")
    TxLog.createTable(spark, t, base.schema)
    base.write.format("txlog").mode("append").save(t)
    TxLog.dropColumn(spark, t, "extra") // retires physical "extra"
    val declared = StructType(spark.read.format("txlog").load(t).schema.fields :+
      StructField("extra", IntegerType, nullable = true))
    TxLog.publishRaceForTests = () => { TxLog.evolveSchema(spark, t, declared); () }
    try {
      val e = intercept[java.util.ConcurrentModificationException] {
        TxLog.commit((100 until 103).map(i => (i.toLong, "z", Option(i)))
          .toDF("id", "grp", "extra"), t, "w-drift", 9L)
      }
      assert(e.getMessage.contains("extra"), e.getMessage)
    } finally TxLog.publishRaceForTests = null
    // the declared evolution won; its fresh physical holds no old values
    val df = spark.read.format("txlog").load(t)
    assert(df.columns.toSeq == Seq("id", "grp", "extra"))
    assert(df.where(col("extra").isNotNull).count() == 0L)
    // and a clean retry of the writer lands in the minted physical
    TxLog.commit((100 until 103).map(i => (i.toLong, "z", Option(i)))
      .toDF("id", "grp", "extra"), t, "w-drift", 10L)
    assert(spark.read.format("txlog").load(t)
      .where(col("extra").isNotNull).count() == 3L)
  }

  test("rename/drop guards: last column, partition source, reserved, collision") {
    val t = freshTable()
    val df = (0 until 20).map(i => (i.toLong, s"r${i % 2}")).toDF("id", "region")
    TxLog.createTable(spark, t, df.schema, Seq("region"))
    TxLog.commitPartitioned(df, t, Seq("region"), "w", 0L)
    // dropping the partition source is refused
    val e1 = intercept[IllegalArgumentException](TxLog.dropColumn(spark, t, "region"))
    assert(e1.getMessage.contains("partition source"))
    // rename to an existing name (case-insensitively) is refused
    val e2 = intercept[IllegalArgumentException](
      TxLog.renameColumn(spark, t, "id", "REGION"))
    assert(e2.getMessage.contains("already exists"))
    // rename to a reserved engine name is refused
    intercept[IllegalArgumentException](TxLog.renameColumn(spark, t, "id", "_file"))
    // drop down to zero columns is refused
    TxLog.dropColumn(spark, t, "id")
    val e3 = intercept[IllegalArgumentException](TxLog.dropColumn(spark, t, "region"))
    assert(e3.getMessage.contains("last column"))
  }

  test("rename of a partition SOURCE keeps layout, pruning and writes working") {
    val t = freshTable()
    val df = (0 until 40).map(i =>
      (java.sql.Date.valueOf(s"2024-03-${i % 4 + 1}"), i.toLong)).toDF("d", "k")
    TxLog.createTable(spark, t, df.schema, Seq("days(d)"))
    TxLog.commitPartitioned(df, t, Seq("days(d)"), "w", 0L)
    TxLog.renameColumn(spark, t, "d", "event_date")
    val back = spark.read.format("txlog").load(t)
    assert(back.columns.toSeq == Seq("event_date", "k"))
    // pruning on the NEW logical name maps to the physical spec
    val (kept, total) = TxLog.pruneCount(spark, t,
      col("event_date") === java.sql.Date.valueOf("2024-03-02"))
    assert(total == 4 && kept == 1, s"kept $kept of $total")
    // V2 append under the new name stays in the layout
    Seq((java.sql.Date.valueOf("2024-03-02"), 99L)).toDF("event_date", "k")
      .write.format("txlog").mode("append").save(t)
    assert(spark.read.format("txlog").load(t)
      .where(col("event_date") === java.sql.Date.valueOf("2024-03-02"))
      .count() == 11L)
    // DESCRIBE-facing partitioning reports the LOGICAL source
    val view = s"txcolmap_p_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $view USING txlog OPTIONS (path '$t')")
    try {
      val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $view")
        .collect().map(_.toString).mkString("\n")
      assert(desc.contains("event_date"), desc)
    } finally spark.sql(s"DROP TABLE $view")
  }

  test("DML (COW + MoR) and change feed survive a rename") {
    val t = freshTable()
    TxLog.createTable(spark, t, df3(0).schema,
      props = Map(TxLog.ChangeFeedProp -> "true"))
    df3(100).write.format("txlog").mode("append").save(t)
    TxLog.renameColumn(spark, t, "score", "quality")
    // COW update ON the renamed column
    TxLog.update(spark, t, col("id") === 7L,
      Map("quality" -> lit(777.0)), "u1", 0L)
    assert(spark.read.format("txlog").load(t)
      .where(col("id") === 7L).select("quality").as[Double].head() == 777.0)
    // MoR delete after the rename (ids 90..99 -> quality 900..990)
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, t, col("quality") >= 900.0, "d1", 0L)
    val live = spark.read.format("txlog").load(t)
    assert(live.count() == 90L)
    assert(live.where(col("quality") >= 900.0).count() == 0L)
    // the change feed reads the WHOLE history under the current names
    val feed = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", "0").load(t)
    assert(feed.columns.contains("quality") && !feed.columns.contains("score"))
    val deletes = feed.where(col("_change_type") === "delete")
    assert(deletes.count() == 11L) // 1 update retract + 10 MoR deletes
    assert(deletes.where(col("quality") >= 900.0).count() == 10L)
  }

  test("Spark-planned MoR DML after a rename captures real change images") {
    // regression: the V2 delta path's capture (stageDeltaChanges) read
    // the touched files and staged inserts under the LOGICAL schema;
    // after a rename the files only know the physical name, so every
    // renamed column's pre/post-image silently became NULL.
    val t = freshTable()
    TxLog.createTable(spark, t, df3(0).schema,
      props = Map(TxLog.ChangeFeedProp -> "true",
                  TxLog.DmlModeProp -> TxLog.DmlModeMor))
    df3(100).write.format("txlog").mode("append").save(t)   // v1
    TxLog.renameColumn(spark, t, "score", "quality")        // v2
    val name = s"txcolmap_cdf_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $name USING txlog OPTIONS (path '$t')")
    try {
      spark.sql(s"DELETE FROM $name WHERE quality >= 900.0")          // v3
      spark.sql(s"UPDATE $name SET quality = 777.0 WHERE id = 7")     // v4
      assert(spark.table(name).count() == 90L)
      val feed = spark.read.format("txlog").option("readChangeFeed", "true")
        .option("startingVersion", "3").load(t)
      // the renamed column's images must carry the real values
      assert(feed.where(col("quality").isNull).count() == 0L,
        "renamed column's change images must never be null")
      val del = feed.where(col("_commit_version") === 3L &&
        col("_change_type") === "delete")
      assert(del.count() == 10L)
      assert(del.agg(sum("quality")).first().getDouble(0) ==
        (90 until 100).map(_ * 10.0).sum)
      val upd = feed.where(col("_commit_version") === 4L)
      assert(upd.where(col("_change_type") === "delete")
        .select("quality").as[Double].head() == 70.0)
      assert(upd.where(col("_change_type") === "insert")
        .select("quality").as[Double].head() == 777.0)
    } finally spark.sql(s"DROP TABLE $name")
  }

  test("SQL ALTER TABLE RENAME/DROP COLUMN through the catalog") {
    val wh = Files.createTempDirectory("txcolmap_wh_").toString
    spark.conf.set("spark.sql.catalog.cmcat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cmcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS cmcat.ns")
    spark.sql("CREATE TABLE cmcat.ns.t (id BIGINT, grp STRING, v DOUBLE) USING txlog")
    spark.sql("INSERT INTO cmcat.ns.t SELECT id, concat('g', id % 3), id * 1.5 FROM range(90)")
    spark.sql("ALTER TABLE cmcat.ns.t RENAME COLUMN grp TO cohort")
    assert(spark.table("cmcat.ns.t").columns.toSeq == Seq("id", "cohort", "v"))
    assert(spark.sql("SELECT count(*) FROM cmcat.ns.t WHERE cohort = 'g1'")
      .first().getLong(0) == 30L)
    spark.sql("ALTER TABLE cmcat.ns.t DROP COLUMN v")
    assert(spark.table("cmcat.ns.t").columns.toSeq == Seq("id", "cohort"))
    // DML through SQL on the renamed column
    spark.sql("DELETE FROM cmcat.ns.t WHERE cohort = 'g2'")
    assert(spark.table("cmcat.ns.t").count() == 60L)
    spark.sql("UPDATE cmcat.ns.t SET cohort = 'gx' WHERE id < 10 AND cohort = 'g0'")
    assert(spark.sql("SELECT count(*) FROM cmcat.ns.t WHERE cohort = 'gx'")
      .first().getLong(0) == 4L)
    spark.sql("DROP TABLE cmcat.ns.t")
  }

  test("restore across a rename restores the old names and values") {
    val t = freshTable()
    TxLog.createTable(spark, t, df3(0).schema)
    df3(30).write.format("txlog").mode("append").save(t) // v1
    TxLog.renameColumn(spark, t, "grp", "g")             // v2
    TxLog.delete(spark, t, col("id") < 10L, "d", 0L)     // v3
    TxLog.restore(spark, t, 1L)
    val df = spark.read.format("txlog").load(t)
    assert(df.columns.toSeq == Seq("id", "grp", "score"))
    assert(df.count() == 30L)
    // and the table keeps working after the restore
    assert(df.where(col("grp") === "g1").count() == 10L)
  }

  test("a rename landing mid-DML or mid-compaction is a loud conflict, never a merge") {
    val t = freshTable()
    TxLog.createTable(spark, t, df3(0).schema,
      props = Map(TxLog.IsolationProp -> TxLog.IsolationWriteSerializable))
    df3(60).write.format("txlog").mode("append").save(t)
    // writeSerializable rebase: a concurrent RENAME cannot fold into the
    // rewrite's pre-rename schema (a rename reads as drop+add)
    val e1 = intercept[java.util.ConcurrentModificationException] {
      TxLog.delete(spark, t, col("id") < 5L, "d", 0L,
        beforeCommit = () => { TxLog.renameColumn(spark, t, "grp", "g"); () })
    }
    assert(e1.getMessage.contains("column mapping"), e1.getMessage)
    // the rename WON; the table is consistent under the new name
    assert(spark.read.format("txlog").load(t).columns.toSeq ==
      Seq("id", "g", "score"))
    assert(spark.read.format("txlog").load(t).count() == 60L)
    // checkpoint rebase (compaction) refuses the same interleaving
    val e2 = intercept[java.util.ConcurrentModificationException] {
      TxLog.compact(spark, t,
        beforeCommit = () => { TxLog.renameColumn(spark, t, "g", "g2"); () })
    }
    assert(e2.getMessage.contains("non-append"), e2.getMessage)
    assert(spark.read.format("txlog").load(t).columns.toSeq ==
      Seq("id", "g2", "score"))
  }

  test("overwrite resets the mapping with the new contract") {
    val t = freshTable()
    TxLog.createTable(spark, t, df3(0).schema)
    df3(20).write.format("txlog").mode("append").save(t)
    TxLog.renameColumn(spark, t, "grp", "g")
    val fresh = Seq((1L, "n1")).toDF("key", "name")
    TxLog.overwrite(fresh, t)
    val df = spark.read.format("txlog").load(t)
    assert(df.columns.toSeq == Seq("key", "name"))
    assert(df.count() == 1L)
    // post-overwrite renames work on the new world
    TxLog.renameColumn(spark, t, "name", "label")
    assert(spark.read.format("txlog").load(t)
      .where(col("label") === "n1").count() == 1L)
  }
}
