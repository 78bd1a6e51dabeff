package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: what does change-data-feed capture COST a DML statement?
  * Builds two identical TxLog tables (range-disjoint commits so zone
  * maps discriminate), one with `changeFeed=true`, and times the same
  * narrow (one-file) and broad (every-file) DELETEs on both — the
  * capture's overhead is the extra read of the touched files plus two
  * exceptAll shuffles, so it should track the TOUCHED data, not the
  * table. Also times reading the resulting feed window back. Usage:
  *   runMain graft.tools.CdfBench [nCommits] [rowsPerCommit] */
object CdfBench {
  def main(args: Array[String]): Unit = {
    val nCommits = args.lift(0).map(_.toInt).getOrElse(64)
    val rows = args.lift(1).map(_.toInt).getOrElse(20000)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.storage.TxLog
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    def build(cdf: Boolean): String = {
      val t = Files.createTempDirectory(s"cdfbench_$cdf").resolve("t").toString
      if (cdf) TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
      (0 until nCommits).foreach { b =>
        spark.range(b.toLong * rows, (b + 1).toLong * rows)
          .toDF("id").withColumn("grp", pmod(col("id"), lit(7)))
          .coalesce(1).write.format("txlog").mode("append").save(t)
      }
      t
    }
    for (cdf <- Seq(false, true)) {
      val t = build(cdf)
      // narrow: one id -> zone maps route to ONE file
      val (_, narrow) = timed(
        TxLog.delete(spark, t, col("id") === (rows / 2).toLong, "bench-n", 0L))
      // broad: one residue class of every commit -> every file touched
      val (_, broad) = timed(
        TxLog.delete(spark, t, col("grp") === 3L, "bench-b", 0L))
      val feed =
        if (!cdf) "" else {
          val (n, readT) = timed(
            spark.read.format("txlog").option("readChangeFeed", "true")
              .option("startingVersion", (nCommits + 1).toString).load(t).count())
          f", feed read-back: $n rows in $readT%.3f s"
        }
      println(f"[cdfbench] changeFeed=$cdf%-5s $nCommits files x $rows rows: " +
        f"narrow DELETE $narrow%.3f s, broad DELETE $broad%.3f s$feed")
    }
    spark.stop()
  }
}
