package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a single SparkEntry query N times without paying for
  * the full bench sweep — `runMain graft.tools.TimeOne <name> [sfDir]
  * [reps]`. Same session shape as Bench (local[32], 32 shuffle
  * partitions, warm-up action first). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    // comma-separated list supported so a batch of queries can be timed
    // in ONE JVM (sbt startup dominates one-at-a-time runs)
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(sys.error("usage: TimeOne <query>[,<query>...] [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val fns = names.map(n => n -> graft.SparkEntry.queries.getOrElse(n,
      sys.error(s"unknown query $n; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    // interleaved passes like Bench, so one throttle window can't cover
    // all of a query's samples
    for (i <- 1 to reps) {
      fns.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        println(f"[timeone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    spark.stop()
  }
}
