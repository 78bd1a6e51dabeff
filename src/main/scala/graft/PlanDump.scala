package graft
import org.apache.spark.sql.SparkSession
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.001"
    for ((n, q) <- Seq("q78b" -> graft.queries.Declared7.q78b)) {
      val df = q(spark, sf)
      df.collect()
      val s = df.queryExecution.executedPlan.toString
      val cut = s.indexOf("== Initial Plan ==")
      println(s"===== $n =====")
      println(if (cut >= 0) s.substring(0, cut) else s)
    }
    spark.stop()
  }
}
