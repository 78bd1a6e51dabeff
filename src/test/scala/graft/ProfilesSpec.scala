package graft

import org.scalatest.funsuite.AnyFunSuite

class ProfilesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("HLL approx distincts land within 5% of exact") {
    val exact = queries.Profiles.profileStats(spark, sf).collect()(0)
    val approx = queries.Profiles.profileHll(spark, sf).collect()(0)
    assert(approx.getAs[Long]("n_rows") == exact.getAs[Long]("n_rows"))
    val exactCusts = exact.getAs[Long]("n_custs").toDouble
    val approxCusts = approx.getAs[Long]("approx_custs").toDouble
    assert(math.abs(approxCusts - exactCusts) / exactCusts < 0.05,
      s"approx $approxCusts vs exact $exactCusts")
    // tiny-cardinality columns are exact under HLL++
    assert(approx.getAs[Long]("approx_priorities") == exact.getAs[Long]("n_priorities"))
  }

  test("portable KMV: estimates track exact cardinality; small columns exact; plan is a partial top-k") {
    import spark.implicits._
    val out = queries.Profiles.profileKmvPortable(spark, sf).collect()
      .map(r => r.getAs[String]("col_name") ->
        ((r.getAs[Int]("k_used"), r.getAs[Double]("est_distinct")))).toMap
    val exactCusts = Tables(spark, sf, "orders")
      .select($"o_custkey").distinct().count().toDouble
    val exactOrders = Tables(spark, sf, "orders")
      .select($"o_orderkey").distinct().count().toDouble
    // sf0.001 has ~150 custkeys < k: the sketch holds the whole hash
    // set and must report EXACTLY (the injective-hash guarantee)
    val (custK, custEst) = out("o_custkey")
    if (custK < queries.Profiles.KmvK) assert(custEst == exactCusts,
      s"under-k column not exact: $custEst vs $exactCusts")
    // orderkeys exceed k: the (k-1)p/h(k) estimator applies — KMV with
    // k=256 has rse 1/sqrt(k-2) ~ 6.3%; assert a loose 3-sigma band
    val (_, orderEst) = out("o_orderkey")
    assert(math.abs(orderEst - exactOrders) / exactOrders < 0.20,
      s"KMV estimate $orderEst vs exact $exactOrders")
    // scale shape: ONE scan of the table (every column's hashes fan out
    // from it), and the per-column k-minima rank filter runs as
    // WindowGroupLimit partial heaps, not a global sort
    val q = queries.Profiles.profileKmvPortable(spark, sf)
    q.collect()
    val planAll = q.queryExecution.executedPlan.toString
    // AQE repeats the tree under "== Initial Plan ==" — count the
    // final plan only
    val cut = planAll.indexOf("== Initial Plan ==")
    val plan = if (cut >= 0) planAll.substring(0, cut) else planAll
    assert(plan.contains("WindowGroupLimit"),
      s"k-minima not a partial group top-k:\n${plan.take(1500)}")
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected one table scan, found $scans:\n${plan.take(1500)}")
  }

  test("approx percentiles land within 5% of the exact quantile") {
    import spark.implicits._
    val approx = queries.Profiles.profileHll(spark, sf).collect()(0)
    val prices = Tables(spark, sf, "orders")
      .select($"o_totalprice").as[Double].collect().sorted
    def exactQ(p: Double): Double = prices(((prices.length - 1) * p).toInt)
    val med = approx.getAs[Double]("approx_median_price")
    val p99 = approx.getAs[Double]("approx_p99_price")
    assert(math.abs(med - exactQ(0.5)) / exactQ(0.5) < 0.05, s"median $med")
    assert(math.abs(p99 - exactQ(0.99)) / exactQ(0.99) < 0.05, s"p99 $p99")
  }
}
