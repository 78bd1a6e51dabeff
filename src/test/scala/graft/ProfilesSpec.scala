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
