package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

/** Dev tool: TxLog protocol overhead measured against the direct
  * parquet append it replaces — per-commit latency (data write +
  * manifest publish + token check as the log grows), snapshot-read
  * cost vs a plain directory read of the same data, and the effect of
  * checkpoint compaction on both. Usage:
  *   runMain graft.tools.TxLogBench [nCommits] [rowsPerCommit] */
object TxLogBench {
  def main(args: Array[String]): Unit = {
    val nCommits = args.lift(0).map(_.toInt).getOrElse(64)
    val rows = args.lift(1).map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.storage.TxLog
    def batch(b: Int) =
      spark.range(b.toLong * rows, (b + 1).toLong * rows).toDF("id")
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // --- TxLog commits
    val t = Files.createTempDirectory("txbench_").resolve("t").toString
    val commitTimes = (0 until nCommits).map { b =>
      timed(TxLog.commit(batch(b), t, "bench", b.toLong))._2
    }
    println(f"[txbench] $nCommits commits of $rows rows: " +
      f"first=${commitTimes.head}%.3f s, " +
      f"median=${commitTimes.sorted.apply(nCommits / 2)}%.3f s, " +
      f"last=${commitTimes.last}%.3f s (log length ${nCommits})")

    // --- plain parquet appends (the unsafe baseline)
    val plain = Files.createTempDirectory("txbench_plain_").resolve("p").toString
    val plainTimes = (0 until nCommits).map { b =>
      timed(batch(b).write.mode("append").parquet(plain))._2
    }
    println(f"[txbench] $nCommits direct appends:            " +
      f"first=${plainTimes.head}%.3f s, " +
      f"median=${plainTimes.sorted.apply(nCommits / 2)}%.3f s, " +
      f"last=${plainTimes.last}%.3f s")

    // --- reads
    val (c1, snapT) = timed(TxLog.snapshot(spark, t).get.count())
    val (c2, plainT) = timed(spark.read.parquet(plain).count())
    println(f"[txbench] snapshot read: $c1 rows in $snapT%.3f s; " +
      f"plain read: $c2 rows in $plainT%.3f s")

    // --- data skipping: each commit's id range is disjoint, so a point
    // predicate is provably in exactly one file — scanWhere should read
    // 1 of nCommits files vs the full-scan filter touching all of them
    {
      import org.apache.spark.sql.functions.col
      val needle = (nCommits / 2).toLong * rows + 7L
      val pred = col("id") === needle
      val (kept, total) = TxLog.pruneCount(spark, t, pred)
      val (cs, skipT) = timed(TxLog.scanWhere(spark, t, pred).get.count())
      val (cf, fullT) = timed(TxLog.snapshot(spark, t).get.filter(pred).count())
      println(f"[txbench] point-predicate skip: kept $kept of $total files; " +
        f"scanWhere $cs rows in $skipT%.3f s vs full filter $cf rows in $fullT%.3f s")
    }

    // --- row-level merge: upsert a batch spanning 2 commits' id ranges;
    // COW + zone maps should rewrite ~2·(files per commit) files, vs the
    // naive no-DML alternative of rewriting the whole table
    {
      import org.apache.spark.sql.functions.col
      val lo = (nCommits / 4).toLong * rows
      val src = spark.range(lo, lo + 2L * rows).toDF("id") // exactly commits nC/4 and nC/4+1
      val (r, mergeT) = timed(TxLog.merge(src, t, Seq("id"), "bench-merge", 0L))
      val naive = Files.createTempDirectory("txbench_naive_").resolve("n").toString
      val (_, naiveT) = timed {
        TxLog.snapshot(spark, t).get.join(src.select("id"), Seq("id"), "left_anti")
          .unionByName(src).write.parquet(naive)
      }
      val total = TxLog.pruneCount(spark, t, col("id") >= 0L)._2
      println(f"[txbench] merge ${2 * rows} rows: rewrote ${r.removedFiles} of $total files " +
        f"(+${r.addedFiles} new) in $mergeT%.3f s vs naive full rewrite $naiveT%.3f s")
    }

    // --- compaction effect
    val (v, compT) = timed(TxLog.compact(spark, t, targetBytes = 256L << 20))
    val (c3, snapT2) = timed(TxLog.snapshot(spark, t).get.count())
    val (extra, extraT) = timed(TxLog.commit(batch(nCommits), t, "bench", nCommits.toLong))
    println(f"[txbench] compact→v$v in $compT%.3f s; " +
      f"post-compact snapshot $c3 rows in $snapT2%.3f s; " +
      f"post-compact commit in $extraT%.3f s")
    val vac = TxLog.vacuum(spark, t, minAgeMs = 0L)
    val (_, postVacT) = timed(TxLog.commit(batch(nCommits + 1), t, "bench", nCommits + 1L))
    println(f"[txbench] vacuum collected $vac files (incl. log truncation); " +
      f"post-truncation commit in $postVacT%.3f s")
    spark.stop()
  }
}
