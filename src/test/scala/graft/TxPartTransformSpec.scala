package graft

import java.nio.file.{Files, Paths}
import java.sql.Date

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{TxLog, TxPart}

/** Partition TRANSFORMS (`days`/`months`/`years`/`hours`/`bucket`) end
  * to end: declaration, driver + executor staging, the three-way value
  * parity (staging SQL == executor render == prune bound), and
  * transform-aware pruning — the r14 layout story: `PARTITIONED BY
  * (days(ts), bucket(n, k))` prunes a time-range + key-probe scan from
  * the manifest alone. */
class TxPartTransformSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txtrans_").resolve("t").toString

  private def dataFiles(t: String): Seq[String] = {
    val root = Paths.get(t, "data")
    if (!Files.exists(root)) return Seq.empty
    val out = Seq.newBuilder[String]
    Files.walk(root).iterator().asScala.foreach { p =>
      if (p.toString.endsWith(".parquet")) out += root.relativize(p).toString
    }
    out.result().sorted
  }

  private def bucketOf(v: Long, n: Int): Int =
    Seq(v).toDF("k").select(pmod(hash(col("k")), lit(n))).first().getInt(0)

  test("declaration: canonicalization, type and collision guards") {
    val sch = StructType(Seq(
      StructField("d", DateType), StructField("ts", TimestampType),
      StructField("k", LongType), StructField("v", StringType)))
    // canonical spec strings (spaces tolerated on input)
    assert(TxPart.validate(Seq("days( d )", "bucket( 8 , k )", "v"), sch) ==
      Seq("days(d)", "bucket(8,k)", "v"))
    // hours() needs a timestamp
    val e1 = intercept[IllegalArgumentException](
      TxPart.validate(Seq("hours(d)"), sch))
    assert(e1.getMessage.contains("timestamp"))
    // bucket() needs string/integral
    val e2 = intercept[IllegalArgumentException](
      TxPart.validate(Seq("bucket(4,ts)"), sch))
    assert(e2.getMessage.contains("string or integral"))
    // unknown source is loud
    val e3 = intercept[IllegalArgumentException](
      TxPart.validate(Seq("days(nope)"), sch))
    assert(e3.getMessage.contains("not in the schema"))
    // identity on timestamp stays refused (no unambiguous path form)
    val e4 = intercept[IllegalArgumentException](TxPart.validate(Seq("ts"), sch))
    assert(e4.getMessage.contains("no unambiguous hive path form"))
    // garbage spec is loud
    val e5 = intercept[IllegalArgumentException](TxPart.validate(Seq("foo(d)"), sch))
    assert(e5.getMessage.contains("unparseable partition spec"))
  }

  test("three-way value parity: staging SQL == executor render == prune bound") {
    val micros = Seq(
      0L, 1L, -1L,                            // epoch boundary
      86399999999L, 86400000000L,             // day boundary
      -86400000000L, -86400000001L,           // pre-epoch day boundary
      1709294400000000L,                      // 2024-03-01 12:00 UTC
      -599616000000000L                       // 1951-01-01 UTC
    )
    val df = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"),
      col("us"))
    for (unit <- Seq("days", "months", "years", "hours")) {
      val f = TxPart.Temporal(unit, "ts")
      val sql = df.select(expr(f.columnSql(TimestampType)).cast("long"))
        .collect().map(_.getLong(0))
      val rendered = micros.map(us => f.render(us, TimestampType).toLong)
      assert(sql.toSeq == rendered,
        s"$unit: staging SQL $sql != executor render $rendered")
      val bounds = micros.map(us => f.boundOf("i", us, TimestampType).get)
      assert(bounds == rendered, s"$unit: prune bound != render")
    }
    // date sources (epoch days incl. pre-1970)
    val days = Seq(0, 1, -1, 31, -31, 19783, -6940)
    val ddf = days.toDF("ed").select(date_add(to_date(lit("1970-01-01")),
      col("ed")).as("d"))
    for (unit <- Seq("days", "months", "years")) {
      val f = TxPart.Temporal(unit, "d")
      val sql = ddf.select(expr(f.columnSql(DateType)).cast("long"))
        .collect().map(_.getLong(0))
      val rendered = days.map(ed => f.render(ed, DateType).toLong)
      assert(sql.toSeq == rendered, s"$unit(date): SQL $sql != render $rendered")
      assert(days.map(ed => f.boundOf("i", ed.toLong, DateType).get) == rendered)
    }
    // bucket parity across widths and strings
    val b = TxPart.Bucket(8, "k")
    for (v <- Seq(0L, 5L, -5L, 123456789L)) {
      val viaSpark = bucketOf(v, 8)
      assert(b.render(v, LongType).toInt == viaSpark, s"bucket($v)")
      assert(b.boundOf("i", v, LongType).get == viaSpark.toLong)
    }
    val bs = TxPart.Bucket(8, "s")
    for (v <- Seq("", "a", "hello", "héllo ✓")) {
      val viaSpark = Seq(v).toDF("s")
        .select(pmod(hash(col("s")), lit(8))).first().getInt(0)
      assert(bs.render(
        org.apache.spark.unsafe.types.UTF8String.fromString(v),
        StringType).toInt == viaSpark, s"bucket('$v')")
      assert(bs.boundOf("s", v, StringType).get == viaSpark.toLong)
    }
  }

  test("driver path: commitPartitioned stages transforms and prunes") {
    val t = freshTable()
    // k cycles 0..99 WITHIN each day, so every (day, bucket) file's key
    // range covers any probe key — zone maps cannot out-prune the
    // buckets and the observed skipping is the partition values'
    val df = (0 until 400).map { i =>
      (Date.valueOf(s"2024-03-${i % 4 + 1}"), (i / 4).toLong, s"v$i")
    }.toDF("d", "k", "v")
    TxLog.createTable(spark, t, df.schema, Seq("days(d)", "bucket(8,k)"))
    assert(TxLog.partitionColumns(spark, t) == Seq("days(d)", "bucket(8,k)"))
    TxLog.commitPartitioned(df, t, Seq("days(d)", "bucket(8,k)"), "w", 0L)
    val staged = dataFiles(t)
    // one file per (day, bucket) tuple: 4 days x 8 buckets
    assert(staged.size == 32, s"staged ${staged.size}: $staged")
    assert(staged.forall(p => p.contains("__p_d_days=") &&
      p.contains("__p_k_bucket8=")), s"staged: $staged")

    // day equality: exactly the 8 files of that day survive
    val day2 = Date.valueOf("2024-03-02")
    val (k1, n1) = TxLog.pruneCount(spark, t, col("d") === day2)
    assert(n1 == 32 && k1 == 8, s"day eq kept $k1 of $n1")
    // day range: two days
    val (k2, _) = TxLog.pruneCount(spark, t,
      col("d") >= Date.valueOf("2024-03-03"))
    assert(k2 == 16, s"day range kept $k2")

    // bucket probe: zone maps CANNOT prune this (every bucket file
    // spans the key range), so the 4 survivors are the bucket's
    val probe = 5L
    val pb = bucketOf(probe, 8)
    val (k3, _) = TxLog.pruneCount(spark, t, col("k") === probe)
    assert(k3 == 4, s"bucket probe kept $k3 (bucket $pb)")
    // compound: one file
    val (k4, _) = TxLog.pruneCount(spark, t,
      col("d") === day2 && col("k") === probe)
    assert(k4 == 1, s"compound kept $k4")

    // results exact under pruning: k=5 on day 2 is row i = 5*4 + 1
    val got = spark.read.format("txlog").load(t)
      .where(col("d") === day2 && col("k") === probe)
      .select("v").as[String].collect().toSeq
    assert(got == Seq("v21"))
    assert(spark.read.format("txlog").load(t).count() == 400L)
  }

  test("V2/SQL path: PARTITIONED BY (days(ts), bucket(n,id)) through the catalog") {
    val wh = Files.createTempDirectory("txtrans_wh_").toString
    spark.conf.set("spark.sql.catalog.trcat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.trcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS trcat.ns")
    spark.sql("""CREATE TABLE trcat.ns.ev (ts TIMESTAMP, id BIGINT, v STRING)
                 USING txlog PARTITIONED BY (days(ts), bucket(4, id))""")
    val dir = s"$wh/ns/ev"
    assert(TxLog.partitionColumns(spark, dir) == Seq("days(ts)", "bucket(4,id)"))
    // executor writers render the transform path segments
    spark.sql("""INSERT INTO trcat.ns.ev
                 SELECT timestamp'2024-03-01 00:00:00+00:00'
                        + make_interval(0, 0, 0, 0, 0, 0, id * 17280),
                        id, concat('v', id)
                 FROM range(300)""") // 300 * 17280s spans 60 days
    val staged = dataFiles(dir)
    assert(staged.nonEmpty &&
      staged.forall(p => p.contains("__p_ts_days=") &&
        p.contains("__p_id_bucket4=")), s"staged: $staged")
    // the first UTC day is 2024-03-01 = epoch day 19783; five rows/day
    assert(staged.exists(_.contains("__p_ts_days=19783")), s"staged: $staged")

    // time-range pruning: only files of the last 10 days survive
    val (kept, total) = TxLog.pruneCount(spark, dir,
      col("ts") >= to_timestamp(lit("2024-04-20 00:00:00"), "yyyy-MM-dd HH:mm:ss"))
    assert(kept < total, s"kept $kept of $total")
    val lastDays = staged.filter { p =>
      val d = p.split('/').find(_.startsWith("__p_ts_days=")).get
        .stripPrefix("__p_ts_days=").toLong
      d >= 19833 // 2024-04-20 may fall in-day depending on session tz; superset
    }
    assert(kept <= staged.count { p =>
      p.split('/').find(_.startsWith("__p_ts_days=")).get
        .stripPrefix("__p_ts_days=").toLong >= 19830
    }, s"kept $kept vs day files ${lastDays.size}")

    // key probe prunes to one bucket's files
    val pb = bucketOf(7L, 4)
    val bucketFiles = staged.count(_.contains(s"__p_id_bucket4=$pb"))
    val (kk, _) = TxLog.pruneCount(spark, dir, col("id") === 7L)
    assert(kk <= bucketFiles, s"kept $kk of $total, bucket files $bucketFiles")
    assert(spark.table("trcat.ns.ev").where(col("id") === 7L).count() == 1L)

    // DESCRIBE round-trips the transforms
    val desc = spark.sql("DESCRIBE TABLE EXTENDED trcat.ns.ev")
      .collect().map(_.toString).mkString("\n")
    assert(desc.contains("days(ts)") && desc.contains("bucket(4, id)"), desc)

    // SQL DML restages within the transform layout
    spark.sql("DELETE FROM trcat.ns.ev WHERE id % 10 = 3")
    assert(spark.table("trcat.ns.ev").count() == 270L)
    assert(dataFiles(dir).forall(p => p.contains("__p_ts_days=") &&
      p.contains("__p_id_bucket4=")))
    spark.sql("DROP TABLE trcat.ns.ev")
  }

  test("null sources land in the default partition and prune on IS (NOT) NULL") {
    val t = freshTable()
    val df = Seq(
      (Date.valueOf("2024-03-01"), 1L, "a"),
      (null.asInstanceOf[Date], 2L, "b"),
      (Date.valueOf("2024-03-05"), 3L, "c")).toDF("d", "k", "v")
    TxLog.createTable(spark, t, df.schema, Seq("months(d)"))
    TxLog.commitPartitioned(df, t, Seq("months(d)"), "w", 0L)
    val staged = dataFiles(t)
    assert(staged.exists(_.contains("__HIVE_DEFAULT_PARTITION__")), s"$staged")
    // both march rows share month ordinal (2024-1970)*12 + 2 = 650
    assert(staged.exists(_.contains("__p_d_months=650")), s"$staged")
    val (k1, n1) = TxLog.pruneCount(spark, t, col("d").isNull)
    assert(n1 == 2 && k1 == 1, s"isNull kept $k1 of $n1")
    val (k2, _) = TxLog.pruneCount(spark, t, col("d").isNotNull)
    assert(k2 == 1, s"isNotNull kept $k2")
    // any comparison excludes the null file
    val (k3, _) = TxLog.pruneCount(spark, t, col("d") >= Date.valueOf("2024-01-01"))
    assert(k3 == 1, s"range kept $k3")
    // results stay exact
    assert(spark.read.format("txlog").load(t).where(col("d").isNull)
      .select("v").as[String].collect().toSeq == Seq("b"))
  }

  test("months/years range pruning keeps the boundary partition") {
    val t = freshTable()
    // one file per month, rows spanning each month so zone maps cannot
    // out-prune the partition values
    val df = Seq(
      (Date.valueOf("2024-01-01"), "jan1"), (Date.valueOf("2024-01-28"), "jan2"),
      (Date.valueOf("2024-02-01"), "feb1"), (Date.valueOf("2024-02-28"), "feb2"),
      (Date.valueOf("2024-03-01"), "mar1"), (Date.valueOf("2024-03-28"), "mar2"))
      .toDF("d", "v")
    TxLog.createTable(spark, t, df.schema, Seq("months(d)"))
    TxLog.commitPartitioned(df, t, Seq("months(d)"), "w", 0L)
    assert(dataFiles(t).size == 3)
    // mid-Feb lower bound: Feb (boundary) + Mar survive
    val (k1, n1) = TxLog.pruneCount(spark, t, col("d") >= Date.valueOf("2024-02-15"))
    assert(n1 == 3 && k1 == 2, s"kept $k1 of $n1")
    // strict < Feb 1: months() weakens '<' to its inclusive form
    // (keeps the boundary month), and the zone maps then prove the
    // boundary file empty of matches (its min IS Feb 1) — only Jan
    // survives the combined prune, and that is the tightest sound cut
    val (k2, _) = TxLog.pruneCount(spark, t, col("d") < Date.valueOf("2024-02-01"))
    assert(k2 == 1, s"kept $k2")
    // strict < mid-Feb: the boundary month holds real matches and the
    // inclusive weakening keeps it
    val (k2b, _) = TxLog.pruneCount(spark, t, col("d") < Date.valueOf("2024-02-20"))
    assert(k2b == 2, s"kept $k2b")
    // equality: one month
    val (k3, _) = TxLog.pruneCount(spark, t, col("d") === Date.valueOf("2024-03-28"))
    assert(k3 == 1, s"kept $k3")
    val got = spark.read.format("txlog").load(t)
      .where(col("d") >= Date.valueOf("2024-02-15")).select("v")
      .as[String].collect().sorted.toSeq
    assert(got == Seq("feb2", "mar1", "mar2"))
  }

  test("compaction keeps correctness when pv metadata is gone") {
    val t = freshTable()
    val df = (0 until 100).map(i =>
      (Date.valueOf(s"2024-03-${i % 3 + 1}"), i.toLong)).toDF("d", "k")
    TxLog.createTable(spark, t, df.schema, Seq("days(d)"))
    TxLog.commitPartitioned(df, t, Seq("days(d)"), "w", 0L)
    TxLog.compact(spark, t)
    // compacted blob has no pv: partition pruning degrades to keep,
    // zone maps still apply, results stay exact
    val day = Date.valueOf("2024-03-02")
    assert(spark.read.format("txlog").load(t).where(col("d") === day)
      .count() == 33L)
  }

  test("DML rewrites preserve the transform layout (library MoR + COW)") {
    val t = freshTable()
    val df = (0 until 200).map(i =>
      (Date.valueOf(s"2024-03-${i % 2 + 1}"), i.toLong, s"v$i")).toDF("d", "k", "v")
    TxLog.createTable(spark, t, df.schema, Seq("days(d)", "bucket(4,k)"))
    TxLog.commitPartitioned(df, t, Seq("days(d)", "bucket(4,k)"), "w", 0L)
    // COW update rewrites touched files back into the hive layout
    TxLog.update(spark, t, col("k") === 7L, Map("v" -> lit("updated")), "u", 0L)
    assert(dataFiles(t).forall(p => p.contains("__p_d_days=") &&
      p.contains("__p_k_bucket4=")), s"${dataFiles(t)}")
    val got = spark.read.format("txlog").load(t).where(col("k") === 7L)
      .select("v").as[String].collect().toSeq
    assert(got == Seq("updated"))
    // layout intact: bucket probe still prunes
    val (kept, total) = TxLog.pruneCount(spark, t, col("k") === 7L)
    assert(kept < total, s"kept $kept of $total")
  }
}
