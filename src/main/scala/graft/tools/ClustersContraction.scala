package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: measure dedup_clusters' DISTRIBUTED contraction loop
  * against the driver union-find fast path on the SAME materialized
  * pair graph — the evidence behind the 100 TB claim that the loop is
  * a correct (if slower at driver-sized remainders, by design) stand-in
  * for the fast path once the condensed graph exceeds driver memory.
  *
  * Usage: runMain graft.tools.ClustersContraction [sfDir=testdata_sf1]
  *          [lowCap=100000]
  *
  * Times clustersOverPairs twice — default cap (fast path: whole graph
  * under the cap → one collect + union-find) vs `lowCap` (forces
  * min-label/pointer-jumping contraction rounds until the remainder
  * condenses under the cap) — and asserts the outputs are
  * row-identical. One JSON line out. */
object ClustersContraction {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata_sf1")
    val lowCap = args.lift(1).map(_.toLong).getOrElse(100000L)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-clusters-contraction")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // materialize the pair graph once so both runs time ONLY the
    // clustering, not the upstream jaccard plan
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(spark, sfDir)
      .select($"doc_a", $"doc_b").localCheckpoint()
    val nEdges = pairs.count()

    def timed(cap: Long): (Double, Array[String]) = {
      val t0 = System.nanoTime()
      val rows = graft.dedup.Dedup.clustersOverPairs(pairs, cap)
        .collect().map(_.toString).sorted
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val (tFast, fast) = timed(graft.dedup.Dedup.DriverEdgeCap)
    val (tLoop, loop) = timed(lowCap)
    require(fast.sameElements(loop),
      s"contraction loop diverged from union-find: ${fast.length} vs ${loop.length} rows")
    println(s"""{"metric":"clusters_contraction","sf_dir":"$sfDir",""" +
      s""""n_edges":$nEdges,"n_rows":${fast.length},"low_cap":$lowCap,""" +
      s""""fastpath_sec":${math.round(tFast * 100) / 100.0},""" +
      s""""contraction_sec":${math.round(tLoop * 100) / 100.0},"identical":true}""")
    spark.stop()
  }
}
