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
}
