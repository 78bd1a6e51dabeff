package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def ts(s: Long) = new Timestamp(s * 1000)

  test("asOf picks latest right at-or-before, null when none precedes") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(100), "l-a"), // after r@50, r@100 → matches r@100 (tie = match)
      (1L, ts(75), "l-b"),  // between 50 and 100 → r@50
      (1L, ts(10), "l-c"),  // before all → null
      (2L, ts(500), "l-d")  // key with no right rows → null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(50), 5.0),
      (1L, ts(100), 10.0)
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
      .select($"tag", $"asof_v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out("l-a") == 10.0)
    assert(out("l-b") == 5.0)
    assert(out("l-c") == null)
    assert(out("l-d") == null)
  }

  test("a right row with a NULL value still supersedes older right rows") {
    import spark.implicits._
    val left = Seq((1L, ts(200), "probe")).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(50), Option(5.0)),
      (1L, ts(100), Option.empty[Double]) // latest right row: value null
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("v")).collect()(0)
    // carrying per-COLUMN with ignoreNulls would resurrect the stale 5.0
    assert(out.isNullAt(out.fieldIndex("asof_v")),
      s"expected null from the superseding right row, got $out")
  }

  test("left rows and columns all survive; count unchanged") {
    import spark.implicits._
    val left = Seq((1L, ts(1), "x", 42), (1L, ts(2), "y", 43)).toDF("k", "t", "s", "n")
    val right = Seq((1L, ts(1), 9.9)).toDF("k", "t", "v")
    val out = AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
    assert(out.count() == 2)
    assert(out.columns.toSet == Set("k", "t", "s", "n", "asof_v"))
  }

  test("asOfForward picks earliest right at-or-after, null when none follows") {
    import spark.implicits._
    val left = Seq(
      (1L, ts(100), "l-a"), // r@100 exists → tie matches the same instant
      (1L, ts(75), "l-b"),  // between 50 and 100 → next is r@100
      (1L, ts(150), "l-c"), // after all right rows → null
      (2L, ts(500), "l-d")  // key with no right rows → null
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts(50), 5.0),
      (1L, ts(100), 10.0)
    ).toDF("k", "t", "v")
    val out = AsOfJoin.asOfForward(left, right, "k", "t", Seq("v"))
      .select($"tag", $"asof_v").collect()
      .map(r => r.getString(0) -> (if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out("l-a") == 10.0)
    assert(out("l-b") == 10.0)
    assert(out("l-c") == null)
    assert(out("l-d") == null)
  }
}
