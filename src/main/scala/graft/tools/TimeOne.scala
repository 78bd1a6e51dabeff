package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time a single SparkEntry query N times without paying for
  * the full bench sweep — `runMain graft.tools.TimeOne <name> [sfDir]
  * [reps]`. Same session shape as Bench (local[32], 32 shuffle
  * partitions, warm-up action first). */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: TimeOne <query> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val fn = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"[timeone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
