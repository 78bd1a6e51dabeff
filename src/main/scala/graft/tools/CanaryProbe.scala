package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: size the bench's compute-dense scaling canary — time the
  * xor-fold hash reduction at a given core count and row count so the
  * 8-vs-32-core ratio can be verified ≫1 before it ships in Bench. */
object CanaryProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32")
    val n = args.lift(1).map(_.toLong).getOrElse(1000000000L)
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      spark.range(n).selectExpr("bit_xor(xxhash64(id))").collect()
      println(f"[canary] cores=$cores n=$n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
