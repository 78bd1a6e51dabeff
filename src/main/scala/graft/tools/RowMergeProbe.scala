package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.storage.TxLog

/** Scale probe for the r20 bounded three-way ROW merge: a WIDE
  * same-file overlap — the branch COW-rewrites ALL files of a
  * many-file fork (a 1% broad delete) while main MoR-deletes a
  * DISJOINT 1% across the SAME files — then one `mergeBranch` must
  * resolve every file at row granularity. This is the case the
  * per-file-job shape would have made quadratic-feeling (O(overlap)
  * sequential Spark rounds); the batched resolver runs ONE id job,
  * ONE fork-vs-net diff, ONE disjointness count and ONE staging job
  * regardless of file count. Asserts: final row count exact, lineage
  * ids unique, the merge version's feed = the branch's net delta only
  * (main's deletes were already emitted at their own version).
  *
  * Usage: runMain graft.tools.RowMergeProbe [nRows] [nFiles] */
object RowMergeProbe {
  def main(args: Array[String]): Unit = {
    val nRows = args.lift(0).map(_.toLong).getOrElse(15000000L)
    val nFiles = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graft-rowmerge-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val t = Files.createTempDirectory("rowmerge_probe_").resolve("t").toString
    spark.range(nRows).select(col("id"), (col("id") % 97).as("v"))
      .repartition(nFiles).write.format("txlog").mode("append").save(t)
    TxLog.setProperties(spark, t, Map(
      TxLog.IsolationProp -> TxLog.IsolationWriteSerializable,
      TxLog.ChangeFeedProp -> "true"))
    val t0 = System.nanoTime()
    TxLog.createBranch(spark, t, "wide")
    TxLog.onBranch("wide") {
      // COW: rewrites EVERY file (1% of rows spread uniformly)
      TxLog.delete(spark, t, col("id") % 100 === 0L, "br-d", 0L)
      ()
    }
    val tBranch = (System.nanoTime() - t0) / 1e9
    // main: MoR delete of a DISJOINT 1% — DVs on the SAME fork files
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    val t1 = System.nanoTime()
    TxLog.delete(spark, t, col("id") % 100 === 1L, "mn-d", 0L)
    val tMainDv = (System.nanoTime() - t1) / 1e9
    val t2 = System.nanoTime()
    val v = TxLog.mergeBranch(spark, t, "wide")
    val tMerge = (System.nanoTime() - t2) / 1e9
    require(v > 0L)

    val expect = nRows - 2 * (nRows / 100)
    val got = spark.read.format("txlog").load(t).count()
    require(got == expect, s"row count after wide row-merge: $got, want $expect")
    val lin = TxLog.snapshotLineage(spark, t).get.select("_row_id")
    val (n, d) = (lin.count(), lin.distinct().count())
    require(n == expect && d == expect, s"lineage ids: $n rows, $d distinct")
    val delta = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", v.toString).load(t)
      .groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(delta == Map("delete" -> (nRows / 100)),
      s"merge delta must be the branch's net only: $delta")
    println(s"""{"metric":"rowmerge_probe","rows":$nRows,"files":$nFiles,""" +
      s""""overlap_files":$nFiles,"branch_rewrite_sec":${f"$tBranch%.2f"},""" +
      s""""main_mor_delete_sec":${f"$tMainDv%.2f"},""" +
      s""""merge_resolve_sec":${f"$tMerge%.2f"},""" +
      s""""rows_after":$got,"ids_distinct":$d,"pass":true}""")
    spark.stop()
  }
}
