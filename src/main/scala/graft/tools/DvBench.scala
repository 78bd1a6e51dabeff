package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool: merge-on-read (deletion-vector) DML measured against the
  * copy-on-write twin it trades against — statement cost for a point
  * DELETE (1 touched file) and a broad DELETE (every file touched),
  * the read-path overhead the sidecars cost afterwards, the
  * SQL-planned delta door's prune-on-write, and the compactSmall purge
  * that pays the debt back. Usage:
  *   runMain graft.tools.DvBench [nCommits] [rowsPerCommit]
  * Defaults 64 × 1,000,000 — the M36 table shape. */
object DvBench {
  def main(args: Array[String]): Unit = {
    val nCommits = args.lift(0).map(_.toInt).getOrElse(64)
    val rows = args.lift(1).map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.storage.{TxLog, TxLogV2}

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // min-of-2 for READ measurements (statement costs stay single-shot:
    // a DML can only run once)
    def timed2[A](f: => A): (A, Double) = {
      val (r, t1) = timed(f); val (_, t2) = timed(f); (r, math.min(t1, t2))
    }
    def build(): String = {
      val t = Files.createTempDirectory("dvbench_").resolve("t").toString
      (0 until nCommits).foreach { b =>
        TxLog.commit(
          spark.range(b.toLong * rows, (b + 1).toLong * rows).toDF("id").coalesce(1),
          t, "bench", b.toLong)
      }
      t
    }
    val mor = build()
    val cow = build()
    TxLog.setProperties(spark, mor, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    println(s"[dvbench] two tables built: $nCommits files x $rows rows")

    // --- warm the DML machinery on both tables (plan/codegen compile
    // dominates a small statement's first run) with a no-match delete
    TxLog.delete(spark, mor, col("id") === -1L, "warm", 0L)
    TxLog.delete(spark, cow, col("id") === -1L, "warm", 0L)

    // --- point DELETE: 1,000 contiguous ids inside one commit's range
    val lo = (nCommits / 2).toLong * rows + 17L
    val pointPred = col("id") >= lo && col("id") < lo + 1000L
    val (_, morPt) = timed(TxLog.delete(spark, mor, pointPred, "d1", 0L))
    val (_, cowPt) = timed(TxLog.delete(spark, cow, pointPred, "d1", 0L))
    println(f"[dvbench] point DELETE (1k rows, 1 file): MoR $morPt%.3f s vs COW $cowPt%.3f s")

    // --- the mixed-scan read: ONE DV'd file among 63 clean ones — the
    // columnar SelectedColumnVector path keeps the clean files
    // vectorized (pre-r13 any live DV dropped the WHOLE scan row-based)
    {
      val (s1, a1) = timed2(spark.read.format("txlog").load(mor)
        .where(col("id") % 7L === 3L).agg(org.apache.spark.sql.functions
          .sum("id")).first().getLong(0))
      println(f"[dvbench] mixed read (1 DV'd file of $nCommits): filtered agg=$s1 in $a1%.3f s")
    }

    // --- broad DELETE: id % 1000 == 1 — every file holds matches
    val broadPred = col("id") % 1000L === 1L
    val (_, morBr) = timed(TxLog.delete(spark, mor, broadPred, "d2", 0L))
    val (_, cowBr) = timed(TxLog.delete(spark, cow, broadPred, "d2", 0L))
    println(f"[dvbench] broad DELETE (${nCommits * rows / 1000} rows, all files): " +
      f"MoR $morBr%.3f s vs COW $cowBr%.3f s")

    // --- read paths after the DML: full count + filtered agg
    def readCosts(t: String, tag: String): Unit = {
      val (n, cT) = timed2(spark.read.format("txlog").load(t).count())
      val (s, aT) = timed2(spark.read.format("txlog").load(t)
        .where(col("id") % 7L === 3L).agg(org.apache.spark.sql.functions
          .sum("id")).first().getLong(0))
      println(f"[dvbench] $tag read: count()=$n in $cT%.3f s (manifest-adjusted), " +
        f"filtered agg=$s in $aT%.3f s")
    }
    readCosts(mor, "MoR (2 DVs live)")
    readCosts(cow, "COW (clean files)")

    // --- SQL delta door: a point DELETE through Spark's own planning;
    // the delta op scan zone-prunes like a plain read, so lastPrune
    // shows how many files the statement actually opened
    {
      val name = s"dvb_${java.util.UUID.randomUUID().toString.take(8)}"
      spark.sql(s"CREATE TABLE $name USING txlog OPTIONS (path '$mor')")
      val lo2 = (nCommits / 4).toLong * rows + 23L
      val (_, sqlT) = timed(
        spark.sql(s"DELETE FROM $name WHERE id >= $lo2 AND id < ${lo2 + 1000}"))
      val (kept, total) = TxLogV2.lastPrune.get()
      println(f"[dvbench] SQL delta point DELETE: $sqlT%.3f s, op scan opened " +
        f"$kept of $total files (prune-on-write)")
      spark.sql(s"DROP TABLE $name")
    }

    // --- pay the debt back: compactSmall materializes the DVs
    val (v, purgeT) = timed(TxLog.compactSmall(spark, mor, targetBytes = 512L << 20))
    val (n2, rT) = timed2(spark.read.format("txlog").load(mor).count())
    println(f"[dvbench] compactSmall purge -> v$v in $purgeT%.3f s; " +
      f"post-purge count()=$n2 in $rT%.3f s")
    spark.stop()
  }
}
