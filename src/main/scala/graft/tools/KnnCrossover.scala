package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Dev tool (r11, verdict item): measure the q78 brute kNN pass against
  * the q78b certificate path SIDE BY SIDE at growing slice sizes, to
  * find (or honestly refute) the crossover the sf0.1/sf1 label slice is
  * too small to show. `runMain graft.tools.KnnCrossover [sfDir] [reps]`.
  *
  * Slices: the KnnLabel slice (what the queries run), half the table,
  * and the FULL embeddings table — the last two cross label-cluster
  * boundaries, which is exactly the regime IVF exists for (the
  * generator draws each label as centroid+noise, so the full table has
  * real cluster structure; within ONE label the certificate honestly
  * degenerates to a scan, documented at knnGraphIvf). Cell count scales
  * ~√n alongside the default pinned 8, probe breadth stays 2. Both
  * paths end in the same mutualKnnGraph tail; timings are min-of-reps
  * count() runs in one warm JVM (TimeOne protocol). */
object KnnCrossover {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("testdata_sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    // the UNDER-CELLED ivf run (pinned default 8 cells) is the disk
    // hazard at large n, not brute: its candidate volume is
    // ~n²/cells·nprobe rows that cross the candidate equi-join CARRYING
    // 64-double vectors (~550 B/row) — at n=19,920 that is ~1e8 rows
    // ≈ 55 GB of exchange, which exhausted this host's spill (measured
    // r11). Brute, by contrast, never shuffles vectors (broadcast NLJ)
    // and its top-k window is WindowGroupLimit-capped map-side. So the
    // tool skips only the default-cells ivf above this n; the √n-celled
    // run keeps candidates at ~n·√n·nprobe and always runs.
    val maxDefaultCellsN = args.lift(2).map(_.toLong).getOrElse(12000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val emb = graft.Tables(spark, sfDir, "embeddings")
    // KNN_SLICES=full (comma list) restricts the sweep; KNN_PLAN=1
    // additionally prints the brute plan's window/exchange lines first
    // (the n=10k→20k cliff diagnosis rode on this)
    val pick = sys.env.get("KNN_SLICES").map(_.split(",").toSet)
    val slices = Seq(
      ("label0", emb.filter(col("label") === graft.queries.Declared7.KnnLabel)),
      ("half", emb.filter(col("label") < 5)),
      ("full", emb))
      .filter { case (n, _) => pick.forall(_(n)) }
    if (sys.env.get("KNN_PLAN").contains("1")) slices.foreach { case (name, sl) =>
      val plan = graft.queries.Declared7.knnGraphBrute(sl)
        .queryExecution.executedPlan.toString
      println(s"--- brute plan [$name] ---")
      println(plan.split("\n").filter(l => l.contains("Window") ||
        l.contains("Exchange") || l.contains("NestedLoop") ||
        l.contains("Sort") || l.contains("Limit")).mkString("\n"))
    }
    def time(fn: => Long): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
      }.min
    slices.foreach { case (name, slice) =>
      val n = slice.count()
      val cellsScaled = math.max(8, math.sqrt(n.toDouble).toInt)
      // KNN_SKIP_BRUTE=1: at n≈20k brute's WindowGroupLimit-Partial
      // map-side SORT of the 4e8-row NLJ output (×2 — the mutual-edge
      // intersect evaluates knn twice) spills >70 GB and dies with
      // ENOSPC on this host (measured r11, twice). That disk cliff IS
      // the crossover evidence; the skip exists so the certificate side
      // can still be measured on the same slice.
      val brute =
        if (sys.env.get("KNN_SKIP_BRUTE").contains("1")) -1.0
        else time(graft.queries.Declared7.knnGraphBrute(slice).count())
      val ivf8 =
        if (n <= maxDefaultCellsN)
          time(graft.queries.Declared7.knnGraphIvf(slice).count())
        else -1.0 // see maxDefaultCellsN note: ~55 GB exchange at 20k
      val ivfS = time(graft.queries.Declared7
        .knnGraphIvf(slice, cells = cellsScaled).count())
      // row-identity stays part of the measurement: a fast-but-wrong
      // candidate path must not be reported as a crossover
      val same =
        if (brute < 0) "brute_skipped"
        else graft.queries.Declared7.knnGraphBrute(slice)
          .exceptAll(graft.queries.Declared7
            .knnGraphIvf(slice, cells = cellsScaled)).isEmpty.toString
      println(f"""{"slice":"$name","n":$n,"brute_s":$brute%.2f,""" +
        f""""ivf_cells8_s":$ivf8%.2f,"ivf_cells${cellsScaled}_s":$ivfS%.2f,""" +
        s""""identical":"$same"}""")
    }
    spark.stop()
  }
}
