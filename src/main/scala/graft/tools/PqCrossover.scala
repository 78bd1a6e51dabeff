package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: the PQ cost-model reading at a given SF — separates the
  * ONE-TIME index build (codebook train + encode + persist, the cost
  * 100 TB amortizes across every query) from the per-query serving
  * cost (ADC probe + exact re-rank against the persisted index), and
  * puts brute force next to both. The in-query `sim_topk_pq`/`_ivfpq`
  * entries deliberately retrain per run (that is what makes them
  * oracle-checkable end-to-end); this tool measures the production
  * split those queries stand in for.
  *
  * Usage: runMain graft.tools.PqCrossover [sfDir] [reps] */
object PqCrossover {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("testdata_sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[A](what: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pqx] $what: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val n = graft.Tables(spark, sfDir, "embeddings").count()
    println(s"[pqx] corpus n=$n  sfDir=$sfDir")
    time("index build (train + encode + persist, one-time)") {
      graft.sim.Similarity.writeIvfPqIndex(spark, sfDir, "pqx_idx")
    }
    for (i <- 1 to reps) time(s"probe persisted index run$i (ADC + re-rank)") {
      graft.sim.Similarity.probeIvfPqIndex(spark, "pqx_idx").count()
    }
    for (i <- 1 to reps) time(s"brute force run$i") {
      graft.sim.Similarity.bruteForceTopK(spark, sfDir).count()
    }
    // equality: persisted probe == in-query IVF-PQ (same codebooks)
    val a = graft.sim.Similarity.probeIvfPqIndex(spark, "pqx_idx").collect().toSeq
    val b = graft.sim.Similarity.ivfPqTopK(spark, sfDir).collect().toSeq
    println(s"[pqx] probe == in-query ivfpq: ${a == b}")
    Seq("pqx_idx", "pqx_idx_pqcb", "pqx_idx_coarse")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    spark.stop()
  }
}
