package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property proof of the cone bound q78b's exactness certificate rests
  * on (Declared7.q78b phase 2): for unit-sphere directions a, c, x with
  * cos(x,c) ≥ cr (x inside cell c's angular radius r = arccos cr),
  *
  *   cos(a,x) ≤ cos(θ_ac − r) = cos_ac·cr + sin_ac·sr   (θ_ac ≥ r)
  *   cos(a,x) ≤ 1                                        (θ_ac < r)
  *
  * — the spherical triangle inequality angle(a,x) ≥ angle(a,c) −
  * angle(x,c). The Spark query evaluates exactly this formula with
  * Q78Eps slack; here it is checked directly on generated geometry,
  * including the radius-slack case (any cr' ≤ cos(x,c) must still give
  * a valid — larger — bound, which is what a multi-member cell's
  * min-cosine radius is). The end-to-end row-identity specs show the
  * IMPLEMENTATION agrees with brute force; this spec shows the MATH
  * can't be violated by any geometry, not just the corpus at hand. */
object ConeBoundProps extends Properties("ConeBound") {

  private val Dim = 8

  private val vec: Gen[Array[Double]] = Gen
    .listOfN(Dim, Gen.chooseNum(-1.0, 1.0))
    .map(_.toArray)
    .suchThat(v => math.sqrt(v.map(x => x * x).sum) > 1e-3)

  private def cos(u: Array[Double], v: Array[Double]): Double = {
    val d = u.zip(v).map { case (a, b) => a * b }.sum
    val nu = math.sqrt(u.map(x => x * x).sum)
    val nv = math.sqrt(v.map(x => x * x).sum)
    d / (nu * nv)
  }

  /** The exact expression the query computes (Declared7.q78b p2). */
  private def bound(cosAc: Double, cr: Double): Double =
    if (cosAc >= cr) 1.0
    else cosAc * cr +
      math.sqrt(math.max(0.0, 1.0 - cosAc * cosAc)) *
        math.sqrt(math.max(0.0, 1.0 - cr * cr))

  private val Eps = 1e-9 // Q78Eps: FP slack the query also applies

  property("cos(a,x) <= bound(cos(a,c), cos(x,c)) + eps") =
    forAll(vec, vec, vec) { (a, c, x) =>
      cos(a, x) <= bound(cos(a, c), cos(x, c)) + Eps
    }

  property("radius slack only loosens the bound (cr' <= cos(x,c) stays valid)") =
    forAll(vec, vec, vec, Gen.chooseNum(0.0, 2.0)) { (a, c, x, slack) =>
      val cr = math.max(-1.0, cos(x, c) - slack)
      cos(a, x) <= bound(cos(a, c), cr) + Eps
    }

  property("bound is monotone in cr (tighter radius never widens the cone)") =
    forAll(vec, vec, Gen.chooseNum(-1.0, 1.0), Gen.chooseNum(0.0, 1.0)) {
      (a, c, cr, d) =>
        val crLoose = math.max(-1.0, cr - d)
        bound(cos(a, c), cr) <= bound(cos(a, c), crLoose) + Eps
    }
}
