package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev profiler for q05 (not part of the driver contract): times the
  * query at bench parallelism and prints the formatted plan. */
object ProfileQ5 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      graft.queries.Declared.q05(spark, sfDir).count()
      println(f"[q5] run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    println(graft.queries.Declared.q05(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
