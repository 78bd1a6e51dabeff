package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.TxLog

/** Micro-benchmarks for the r15 storage claims (dev tool, DvBench
  * pattern — one warm JVM, min-of-reps, prints one JSON line):
  *
  *  1. SPJ SKEW: a co-bucketed join whose hot bucket holds ~90% of the
  *     fact rows, measured three ways — full shuffle (bucketing off),
  *     bucket-grouped SPJ (one partition per bucket: the hot bucket
  *     serializes), and partially-clustered SPJ (the hot bucket fans
  *     across its files). The r15 point: partially-clustered ≤ grouped
  *     on skew, both beat the shuffle on exchange bytes.
  *
  *  2. NDV OPT-IN COST: the same append committed to a plain table vs
  *     one with `graft.stats.ndv.cols` declared — the delta is the
  *     per-commit price of the KMV sketch scan (one column-pruned pass
  *     of the commit's own files).
  *
  * Usage: runMain graft.tools.SpjBench [rowsPerInsert=250000] [reps=3]
  */
object SpjBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(250000)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wh = Files.createTempDirectory("spjbench_wh_").toString
    spark.conf.set("spark.sql.catalog.sbcat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.sbcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS sbcat.ns")

    // ---- 1. skewed co-bucketed join -------------------------------
    spark.sql("""CREATE TABLE sbcat.ns.fact (k BIGINT, v DOUBLE)
                 USING txlog PARTITIONED BY (bucket(8, k))""")
    spark.sql("""CREATE TABLE sbcat.ns.dim (k BIGINT, w STRING)
                 USING txlog PARTITIONED BY (bucket(8, k))""")
    // 8 inserts: ~90% of fact rows carry k=0 → the 0-bucket holds 8
    // fat files; dim is uniform over 10k keys
    (0 until 8).foreach { b =>
      spark.sql(s"""INSERT INTO sbcat.ns.fact
                    SELECT CASE WHEN id % 10 = 0 THEN id % 10000 ELSE 0 END,
                           rand(42) FROM range($n)""")
    }
    spark.sql("INSERT INTO sbcat.ns.dim SELECT id, concat('w', id) FROM range(10000)")

    def timed(f: => Long): (Double, Long) = {
      var best = Double.MaxValue; var rows = 0L
      (0 until reps).foreach { _ =>
        val t0 = System.nanoTime()
        rows = f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      (best, rows)
    }
    def joinCount(): Long =
      spark.table("sbcat.ns.fact").join(spark.table("sbcat.ns.dim"), "k")
        .groupBy().agg(count(lit(1))).first().getLong(0)
    def withConfs(kvs: (String, String)*)(body: => (Double, Long)): (Double, Long) = {
      val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
      try { kvs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
      finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
    val base = Seq(
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val (tShuffle, r1) = withConfs(base :+
      ("spark.sql.sources.v2.bucketing.enabled" -> "false"): _*)(timed(joinCount()))
    val (tGrouped, r2) = withConfs(base :+
      ("spark.sql.sources.v2.bucketing.enabled" -> "true"): _*)(timed(joinCount()))
    val (tPartial, r3) = withConfs(base ++ Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled" -> "true"): _*)(
      timed(joinCount()))
    require(r1 == r2 && r2 == r3, s"row mismatch: $r1 / $r2 / $r3")

    // ---- 2. NDV sketch commit overhead ----------------------------
    val plain = Files.createTempDirectory("spjbench_").resolve("p").toString
    val sketched = Files.createTempDirectory("spjbench_").resolve("s").toString
    val df = spark.range(n).select(col("id"),
      concat(lit("g"), (col("id") % 1000).cast("string")).as("grp"),
      (col("id") % 97).cast("double").as("x"))
    TxLog.createTable(spark, plain, df.schema)
    TxLog.createTable(spark, sketched, df.schema,
      props = Map(TxLog.NdvColsProp -> "id, grp"))
    def commitOnce(t: String, b: Long): Double = {
      val t0 = System.nanoTime()
      TxLog.commit(df, t, "bench", b)
      (System.nanoTime() - t0) / 1e9
    }
    val tPlain = (0 until reps).map(i => commitOnce(plain, i.toLong)).min
    val tSketch = (0 until reps).map(i => commitOnce(sketched, i.toLong)).min

    println(s"""{"metric":"spj_bench","rows_per_insert":$n,"join_rows":$r1,""" +
      s""""join_shuffle_s":${f"$tShuffle%.3f"},"join_grouped_s":${f"$tGrouped%.3f"},""" +
      s""""join_partial_s":${f"$tPartial%.3f"},""" +
      s""""commit_plain_s":${f"$tPlain%.3f"},"commit_ndv_s":${f"$tSketch%.3f"}}""")
    spark.stop()
  }
}
