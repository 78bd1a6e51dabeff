package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: prove a block-routed dedup operator's SCALE route emits
  * exactly the pairwise route's rows ON REAL sf1 DATA — where the
  * oversized-block routing actually engages (sf1 blocks ~3,250 docs vs
  * the 1,024 bound) and the DuckDB oracles are too heavy to run
  * per-round (TESTDATA.md: edit 1,224 s, jaccard 817 s). The pairwise
  * side is quadratic — affordable once as evidence, not per-round.
  *
  *  - `edit`: fixed-L PassJoin + r8 variable-length short-prefix
  *    layouts + micro band, vs all-pairs banded Levenshtein;
  *  - `jaccard`: AllPairs/PPJoin prefix filtering, vs the all-pairs
  *    within-block join.
  *
  * Usage: runMain graft.tools.EditRouteCheck [op=edit|jaccard|all]
  *          [sfDir=testdata_sf1] */
object EditRouteCheck {
  def main(args: Array[String]): Unit = {
    val op = args.headOption.getOrElse("all")
    val sfDir = args.lift(1).getOrElse("testdata_sf1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-route-check")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir, "documents")

    def check(name: String,
              run: Int => org.apache.spark.sql.DataFrame): Unit = {
      def timed(cap: Int): (Double, Array[String]) = {
        val t0 = System.nanoTime()
        val rows = run(cap).collect().map(_.toString).sorted
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (tSeg, seg) = timed(graft.dedup.Dedup.MaxBlockRows) // production routing
      val (tPw, pw) = timed(Int.MaxValue) // all-pairs ground truth
      require(seg.sameElements(pw),
        s"$name scale route diverged from pairwise at $sfDir: " +
          s"${seg.length} vs ${pw.length} rows")
      println(s"""{"metric":"${name}_route_check","sf_dir":"$sfDir",""" +
        s""""n_rows":${seg.length},"routed_sec":${math.round(tSeg * 100) / 100.0},""" +
        s""""pairwise_sec":${math.round(tPw * 100) / 100.0},"identical":true}""")
    }

    if (op == "edit" || op == "all")
      check("edit", cap => graft.dedup.Dedup.editDistanceOver(docs, maxBlockRows = cap))
    if (op == "jaccard" || op == "all")
      check("jaccard", cap => graft.dedup.Dedup.ngramJaccardPairsOver(docs, maxBlockRows = cap))
    spark.stop()
  }
}
