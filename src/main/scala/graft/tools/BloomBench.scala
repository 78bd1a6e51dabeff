package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: what does `bloomCols` buy a point lookup, and what does
  * it cost a write? Builds two identical TxLog tables whose files
  * INTERLEAVE the key space (`id % nCommits` per commit, so every
  * file's zone map spans the whole domain and min/max skipping is
  * provably useless), one with blooms on `id`, and times the same
  * point lookups on both — plus the append cost with and without
  * bloom writing, and the prune's file counts. Usage:
  *   runMain graft.tools.BloomBench [nCommits] [rowsPerCommit] */
object BloomBench {
  def main(args: Array[String]): Unit = {
    val nCommits = args.lift(0).map(_.toInt).getOrElse(64)
    val rows = args.lift(1).map(_.toInt).getOrElse(100000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.storage.{TxBloom, TxLog}
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def build(bloom: Boolean): (String, Double) = {
      val t = Files.createTempDirectory(s"bloombench_$bloom").resolve("t").toString
      if (bloom) TxLog.setProperties(spark, t, Map(
        TxBloom.BloomColsProp -> "id", TxBloom.BloomNdvProp -> rows.toString))
      val total = nCommits.toLong * rows
      val (_, w) = timed((0 until nCommits).foreach { b =>
        // residue class b of the whole domain: every file spans it
        spark.range(total).toDF("id")
          .where(pmod(col("id"), lit(nCommits)) === b.toLong)
          .withColumn("grp", pmod(col("id"), lit(7)))
          .coalesce(1).write.format("txlog").mode("append").save(t)
      })
      (t, w)
    }
    for (bloom <- Seq(false, true)) {
      val (t, wSec) = build(bloom)
      val df = spark.read.format("txlog").load(t)
      // warm the session planner once, then time 5 distinct point probes
      df.where(col("id") === 1L).count()
      TxBloom.lastPrune.set((0, 0))
      val probes = (1 to 5).map(i => (i.toLong * rows) + i)
      val (hits, sec) = timed(
        probes.map(p => df.where(col("id") === p).count()).sum)
      val (kept, cand) = TxBloom.lastPrune.get()
      val bytes = {
        def walk(d: java.io.File): Long =
          Option(d.listFiles).toSeq.flatten
            .map(f => if (f.isDirectory) walk(f) else f.length).sum
        walk(new java.io.File(t, "data"))
      }
      println(f"[bloombench] bloom=$bloom%-5s $nCommits files x $rows rows: " +
        f"append total $wSec%.2f s, data ${bytes / 1e6}%.1f MB, " +
        f"5 point lookups $sec%.3f s ($hits rows), " +
        f"last prune kept $kept of $cand files")
    }
    spark.stop()
  }
}
