package graft

import java.nio.file.{Files, Path => JPath, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** CREATE TABLE + partitioned writes through the V2 door.
  *
  * r13: `TxLog.createTable` publishes an empty v0 manifest carrying
  * schema/partitioning/properties, and the V2 executor writers stage
  * hive-style `__p_<col>=<v>` layouts themselves (rolling writer under
  * the write plan's clustered-and-sorted distribution), so
  * `format("txlog")` appends and Spark-planned SQL DML keep a
  * partitioned table's one-tuple-per-file layout without the driver in
  * the data path. */
class TxPartV2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txpart_").resolve("t").toString

  private def rows(ids: Range, region: Int => String) =
    ids.map(i => (i.toLong, region(i), s"payload-$i")).toDF("id", "region", "v")

  /** All staged parquet rel paths (data/<uuid>/...) on disk. */
  private def dataFiles(t: String): Seq[String] = {
    val root = Paths.get(t, "data")
    if (!Files.exists(root)) return Seq.empty
    val out = Seq.newBuilder[String]
    Files.walk(root).iterator().asScala.foreach { p =>
      if (p.toString.endsWith(".parquet")) out += root.relativize(p).toString
    }
    out.result().sorted
  }

  test("createTable records schema, layout and props; empty reads know their columns") {
    val t = freshTable()
    val v = TxLog.createTable(spark, t,
      rows(0 until 0, _ => "x").schema, Seq("region"),
      Map("graft.custom" -> "yes"))
    assert(v == 0L)
    assert(TxLog.partitionColumns(spark, t) == Seq("region"))
    assert(TxLog.properties(spark, t) == Map("graft.custom" -> "yes"))
    // the EMPTY table already reads with the declared schema
    val df = spark.read.format("txlog").load(t)
    assert(df.columns.toSeq == Seq("id", "region", "v"))
    assert(df.count() == 0L)
    // history shows the create
    val h = TxLog.history(spark, t).select("operation").as[String].collect().toSeq
    assert(h == Seq("CREATE TABLE"))
    // double create is loud
    val e = intercept[IllegalStateException](
      TxLog.createTable(spark, t, df.schema, Seq("region")))
    assert(e.getMessage.contains("already exists"))
  }

  test("createTable rejects unpartitionable types and unknown columns") {
    val t = freshTable()
    val sch = Seq((1L, 0.5, "x")).toDF("id", "score", "v").schema
    val e1 = intercept[IllegalArgumentException](
      TxLog.createTable(spark, t, sch, Seq("score")))
    assert(e1.getMessage.contains("no unambiguous hive path form"))
    val e2 = intercept[IllegalArgumentException](
      TxLog.createTable(spark, t, sch, Seq("nope")))
    assert(e2.getMessage.contains("not in the schema"))
  }

  test("V2 append to a partitioned table stages the hive layout and prunes") {
    val t = freshTable()
    TxLog.createTable(spark, t, rows(0 until 0, _ => "x").schema, Seq("region"))
    // two appends, three regions each — layout comes from the EXECUTOR
    // writers (no commitPartitioned in sight)
    rows(0 until 300, i => s"r${i % 3}").write.format("txlog").mode("append").save(t)
    rows(300 until 600, i => s"r${i % 3}").write.format("txlog").mode("append").save(t)
    val staged = dataFiles(t)
    // one file per (commit, region): clustered+sorted rolling writer
    assert(staged.size == 6, s"staged: $staged")
    assert(staged.forall(_.contains("__p_region=r")), s"staged: $staged")
    // partition pruning from manifest pv strings, BEFORE zone maps
    val (kept, total) = TxLog.pruneCount(spark, t, col("region") === "r1")
    assert(total == 6 && kept == 2, s"kept $kept of $total")
    // partition column survives IN the data (self-describing files)
    val back = spark.read.format("txlog").load(t)
    assert(back.where(col("region") === "r1").count() == 200L)
    assert(back.count() == 600L)
    // and the unpruned/pruned results agree row-for-row
    val a = back.where(col("region") === "r1").select("id").as[Long].collect().sorted
    assert(a.toSeq == (0 until 600).filter(_ % 3 == 1).map(_.toLong))
  }

  test("null and escape-needing partition values round-trip") {
    val t = freshTable()
    val df = Seq((1L, "a b/c=d", "x"), (2L, null.asInstanceOf[String], "y"),
      (3L, "", "z")).toDF("id", "region", "v")
    TxLog.createTable(spark, t, df.schema, Seq("region"))
    df.write.format("txlog").mode("append").save(t)
    val staged = dataFiles(t)
    assert(staged.exists(_.contains("__HIVE_DEFAULT_PARTITION__")), s"staged: $staged")
    val back = spark.read.format("txlog").load(t).select("id", "region")
      .as[(Long, String)].collect().toMap
    assert(back(1L) == "a b/c=d")
    assert(back(2L) == null)
    assert(back(3L) == "")
    // equality pruning on the escaped value keeps correctness: the
    // rendering is conservative (no prune), the result exact
    assert(spark.read.format("txlog").load(t)
      .where(col("region") === "a b/c=d").count() == 1L)
  }

  test("SQL DML on a V2-partitioned table restages within the layout") {
    val t = freshTable()
    TxLog.createTable(spark, t, rows(0 until 0, _ => "x").schema, Seq("region"))
    rows(0 until 300, i => s"r${i % 3}").write.format("txlog").mode("append").save(t)
    val view = s"txpart_dml_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $view USING txlog OPTIONS (path '$t')")
    try spark.sql(s"DELETE FROM $view WHERE id % 10 = 3")
    finally spark.sql(s"DROP TABLE $view")
    // the rewrite's files keep the hive layout + pv metadata
    val live = dataFiles(t)
    assert(live.forall(_.contains("__p_region=")), s"live: $live")
    val (kept, total) = TxLog.pruneCount(spark, t, col("region") === "r0")
    assert(kept < total, s"kept $kept of $total — partition pruning lost after DML")
    assert(spark.read.format("txlog").load(t).count() == 270L)
  }

  test("commitStaged rejects a layout mismatch loudly") {
    val t = freshTable()
    TxLog.createTable(spark, t, rows(0 until 0, _ => "x").schema, Seq("region"))
    val e = intercept[IllegalArgumentException] {
      TxLog.commitStaged(spark, t, Seq.empty, Seq.empty, "w", 0L,
        incoming = rows(0 until 0, _ => "x").schema, stagedPcols = Seq.empty)
    }
    assert(e.getMessage.contains("layout changed"))
  }

  test("first append must honor a declared layout (sticky from v0)") {
    val t = freshTable()
    TxLog.createTable(spark, t, rows(0 until 0, _ => "x").schema, Seq("region"))
    // commitPartitioned with the WRONG columns is loud
    val e = intercept[IllegalArgumentException] {
      TxLog.commitPartitioned(rows(0 until 10, _ => "a"), t, Seq("v"), "w", 0L)
    }
    assert(e.getMessage.contains("must match"))
    // with the declared columns it lands and the layouts interleave
    TxLog.commitPartitioned(rows(0 until 10, i => s"r${i % 2}"), t, Seq("region"), "w", 1L)
    rows(10 until 20, i => s"r${i % 2}").write.format("txlog").mode("append").save(t)
    assert(spark.read.format("txlog").load(t).count() == 20L)
    val (kept, total) = TxLog.pruneCount(spark, t, col("region") === "r0")
    assert(total == 4 && kept == 2, s"kept $kept of $total")
  }

  test("evolveSchema and removeProperties are versioned metadata commits") {
    val t = freshTable()
    val sch = rows(0 until 0, _ => "x").schema
    TxLog.createTable(spark, t, sch, Seq.empty, Map("a" -> "1", "b" -> "2"))
    rows(0 until 10, _ => "r").write.format("txlog").mode("append").save(t)
    // ADD COLUMNS: new nullable column appends; old files backfill null
    val evolved = org.apache.spark.sql.types.StructType(
      sch.fields :+ org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.IntegerType, nullable = true))
    TxLog.evolveSchema(spark, t, evolved)
    val df = spark.read.format("txlog").load(t)
    assert(df.columns.toSeq == Seq("id", "region", "v", "extra"))
    assert(df.where(col("extra").isNull).count() == 10L)
    // UNSET property: gone now, still in force for a pinned read
    val vBefore = spark.read.format("txlog").load(t) // head before removal
    TxLog.removeProperties(spark, t, Seq("a"))
    assert(TxLog.properties(spark, t) == Map("b" -> "2"))
    assert(TxLog.propertiesAt(spark, t, 1L) == Map("a" -> "1", "b" -> "2"))
  }
}
