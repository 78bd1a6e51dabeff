package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.TxLog

/** Micro-benchmarks for the r15 ANALYZE + initial-defaults claims
  * (dev tool, DvBench pattern — one warm JVM, min-of-reps, one JSON
  * line):
  *
  *  1. ANALYZE COST: a table of `files` commits × `rows` rows WITHOUT
  *     the NDV opt-in, then `TxLog.analyze` on two columns (a long key
  *     and a string key) — the claim is ONE column-pruned scan of the
  *     uncovered files plus footer metadata, not a table rewrite. A
  *     second analyze must be ~free (fully covered → no scan, no
  *     commit).
  *
  *  2. DEFAULT-FILL READ: after ADD COLUMN ... DEFAULT, an aggregate
  *     over the defaulted column reads every pre-add file through the
  *     EXISTS_DEFAULT constant-vector fill; after OPTIMIZE (compact)
  *     the same values are materialized in the files. The claim is the
  *     filled read costs ~the materialized read (zero per-row fill
  *     cost), and both return identical results.
  *
  * Usage: runMain graft.tools.AnalyzeBench [files=64] [rowsPerFile=250000] [reps=3]
  */
object AnalyzeBench {
  def main(args: Array[String]): Unit = {
    val files = args.headOption.map(_.toInt).getOrElse(64)
    val rows = args.lift(1).map(_.toInt).getOrElse(250000)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t = Files.createTempDirectory("analyzebench_").resolve("t").toString
    (0 until files).foreach { i =>
      spark.range(i.toLong * rows, (i + 1).toLong * rows)
        .select(col("id"), md5(col("id").cast("string")).as("skey"),
          (col("id") % 97).cast("double").as("score"))
        .coalesce(1).write.format("txlog").mode("append").save(t)
    }

    def secs(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def minOf(body: => Unit): Double =
      (0 until reps).map(_ => secs(body)).min

    // 1. the backfill: one column-pruned scan of ALL files (worst case)
    val analyzeSec = secs(TxLog.analyze(spark, t, Seq("id", "skey")))
    val reanalyzeSec = secs {
      val r = TxLog.analyze(spark, t, Seq("id", "skey"))
      require(r.version == -1L && r.filesUpdated == 0, r.toString)
    }
    // full-table read for scale: what a rewrite-based backfill would pay
    val fullScanSec = minOf {
      spark.read.format("txlog").load(t)
        .agg(count(col("id")), count(col("skey")), sum(col("score"))).collect()
    }

    // 2. default-fill vs materialized read
    TxLog.addColumnWithDefault(spark, t, "flag",
      org.apache.spark.sql.types.IntegerType, "7")
    def aggFlag(): Array[org.apache.spark.sql.Row] =
      spark.read.format("txlog").load(t)
        .groupBy(col("flag")).agg(count(lit(1)), sum(col("id"))).collect()
    val filled = aggFlag()
    val filledSec = minOf { aggFlag(); () }
    TxLog.compact(spark, t) // materializes the default into every file
    val materialized = aggFlag()
    require(filled.map(_.toString).sorted.sameElements(
      materialized.map(_.toString).sorted),
      "default-filled read != materialized read")
    val matSec = minOf { aggFlag(); () }

    println(s"""{"metric":"analyze_bench","files":$files,"rows_per_file":$rows,""" +
      s""""reps":$reps,"analyze_sec":${f"$analyzeSec%.3f"},""" +
      s""""reanalyze_sec":${f"$reanalyzeSec%.3f"},""" +
      s""""full_scan_sec":${f"$fullScanSec%.3f"},""" +
      s""""default_fill_read_sec":${f"$filledSec%.3f"},""" +
      s""""materialized_read_sec":${f"$matSec%.3f"}}""")
    spark.stop()
  }
}
