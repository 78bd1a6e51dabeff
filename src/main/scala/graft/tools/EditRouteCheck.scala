package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: prove the edit-distance SEGMENT route (fixed-L PassJoin +
  * the r8 variable-length short-prefix layouts + micro band) emits
  * exactly the pairwise route's rows ON REAL sf1 DATA — where the
  * oversized-block routing actually engages (sf1 blocks ~3,250 docs vs
  * the 1,024 bound) and the DuckDB oracle is too heavy to run
  * per-round (TESTDATA.md: 1,224 s). The pairwise side is quadratic
  * (~35 s at sf1) — affordable once as evidence, not per-round.
  *
  * Usage: runMain graft.tools.EditRouteCheck [sfDir=testdata_sf1] */
object EditRouteCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata_sf1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[32]"))
      .appName("graft-edit-route-check")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables(spark, sfDir, "documents")
    def run(cap: Int): (Double, Array[String]) = {
      val t0 = System.nanoTime()
      val rows = graft.dedup.Dedup.editDistanceOver(docs, maxBlockRows = cap)
        .collect().map(_.toString).sorted
      ((System.nanoTime() - t0) / 1e9, rows)
    }
    val (tSeg, seg) = run(graft.dedup.Dedup.MaxBlockRows) // production routing
    val (tPw, pw) = run(Int.MaxValue) // all-pairs ground truth
    require(seg.sameElements(pw),
      s"segment route diverged from pairwise at $sfDir: ${seg.length} vs ${pw.length} rows")
    println(s"""{"metric":"edit_route_check","sf_dir":"$sfDir",""" +
      s""""n_rows":${seg.length},"segment_sec":${math.round(tSeg * 100) / 100.0},""" +
      s""""pairwise_sec":${math.round(tPw * 100) / 100.0},"identical":true}""")
    spark.stop()
  }
}
