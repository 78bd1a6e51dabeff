package graft

import java.time.LocalDate

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.storage.TxPart

/** Property-based invariants of the partition-transform value paths
  * ([[TxPart]]). The grid test in TxPartTransformSpec pins the
  * three-way (staging SQL / executor render / prune bound) parity on
  * boundary values through Spark; here the DRIVER-SIDE pair — the
  * executor row renderer and the prune-time bound — is fuzzed over the
  * whole domain, plus the monotonicity and reference-definition
  * properties the pruning soundness argument rests on. */
object TxPartProps extends Properties("TxPart") {

  import org.apache.spark.sql.types._

  // micros across ±~30k years, biased toward the modern era and the
  // epoch boundaries where floorDiv sign handling bites
  private val micros: Gen[Long] = Gen.frequency(
    4 -> Gen.chooseNum(-2208988800000000L, 4102444800000000L), // 1900..2100
    2 -> Gen.chooseNum(-86400000001L, 86400000001L),           // epoch ±1 day
    1 -> Gen.chooseNum(-999999999999999999L, 999999999999999999L))
  private val epochDay: Gen[Int] = Gen.frequency(
    4 -> Gen.chooseNum(-25567, 47482), // 1900..2100
    1 -> Gen.chooseNum(-3000000, 3000000))

  private def renderL(f: TxPart.Field, raw: Any, dt: DataType): Long =
    f.render(raw, dt).toLong

  property("render == boundOf on the same value (timestamps)") =
    forAll(micros, Gen.oneOf("days", "months", "years", "hours")) { (us, unit) =>
      val f = TxPart.Temporal(unit, "ts")
      f.boundOf("i", us, TimestampType).contains(renderL(f, us, TimestampType))
    }

  property("render == boundOf on the same value (dates)") =
    forAll(epochDay, Gen.oneOf("days", "months", "years")) { (d, unit) =>
      val f = TxPart.Temporal(unit, "d")
      f.boundOf("i", d.toLong, DateType).contains(renderL(f, d, DateType))
    }

  property("temporal transforms are monotone non-decreasing in the source") =
    forAll(micros, micros, Gen.oneOf("days", "months", "years", "hours")) {
      (a, b, unit) =>
        val f = TxPart.Temporal(unit, "ts")
        val (lo, hi) = if (a <= b) (a, b) else (b, a)
        renderL(f, lo, TimestampType) <= renderL(f, hi, TimestampType)
    }

  property("days/months/years agree with java.time on the UTC calendar") =
    forAll(epochDay) { d =>
      val ld = LocalDate.ofEpochDay(d.toLong)
      renderL(TxPart.Temporal("days", "d"), d, DateType) == d.toLong &&
      renderL(TxPart.Temporal("months", "d"), d, DateType) ==
        (ld.getYear - 1970).toLong * 12 + ld.getMonthValue - 1 &&
      renderL(TxPart.Temporal("years", "d"), d, DateType) ==
        (ld.getYear - 1970).toLong
    }

  property("timestamp temporal values equal their UTC day's") =
    forAll(micros, Gen.oneOf("days", "months", "years")) { (us, unit) =>
      val f = TxPart.Temporal(unit, "ts")
      val day = Math.floorDiv(us, 86400000000L)
      val viaTs = renderL(f, us, TimestampType)
      // guard the (astronomical) tail where epoch days overflow Int
      day < Int.MinValue.toLong || day > Int.MaxValue.toLong ||
        viaTs == renderL(TxPart.Temporal(unit, "d"), day.toInt, DateType)
    }

  property("bucket is stable, in range, and width-sensitive") =
    forAll(Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(2, 1024)) { (v, n) =>
      val f = TxPart.Bucket(n, "k")
      val b = renderL(f, v, LongType)
      b >= 0 && b < n && f.boundOf("i", v, LongType).contains(b) &&
        // int-width values must hash as ints, not longs, when the
        // source column IS int — the width-sensitivity the function's
        // canonical name encodes
        (v < Int.MinValue || v > Int.MaxValue ||
          f.boundOf("i", v, IntegerType) ==
            Some(renderL(TxPart.Bucket(n, "k"), v.toInt, IntegerType)))
    }

  property("spec strings round-trip through parse") =
    forAll(Gen.oneOf("days", "months", "years", "hours"),
      Gen.identifier.suchThat(_.nonEmpty), Gen.chooseNum(2, 4096)) {
      (unit, col, n) =>
        TxPart.parse(TxPart.Temporal(unit, col).spec) == TxPart.Temporal(unit, col) &&
        TxPart.parse(TxPart.Bucket(n, col).spec) == TxPart.Bucket(n, col) &&
        TxPart.parse(col) == TxPart.Identity(col)
    }
}
