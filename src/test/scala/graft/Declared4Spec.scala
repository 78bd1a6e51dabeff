package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Declared4

/** Invariant tests for the round-4 declared queries (the DuckDB hash
  * check is the equivalence gate; these assert the semantic properties
  * that make each query RIGHT, on sf0.001). */
class Declared4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q41: every event lands in exactly one session of its user") {
    import spark.implicits._
    val out = Declared4.q41(spark, sf).cache()
    val nEvents = Tables(spark, sf, "events").count()
    assert(out.count() == nEvents) // one row per event — no drop, no fanout
    assert(out.select($"event_id").distinct().count() == nEvents)
    // session population consistency: the n_events carried on each row
    // equals the number of rows attributed to that session
    val bad = out.groupBy($"user_id", $"session_idx", $"n_events")
      .agg(count(lit(1)).as("got"))
      .filter($"got" =!= $"n_events")
    assert(bad.count() == 0)
    out.unpersist()
  }

  test("q42: exactly one latest row per live (user, event_type); ts is the max") {
    import spark.implicits._
    val out = Declared4.q42(spark, sf).cache()
    assert(out.groupBy($"user_id", $"event_type").count()
      .filter($"count" =!= 1).count() == 0)
    val truth = Tables(spark, sf, "events")
      .groupBy($"user_id", $"event_type").agg(max($"ts").as("max_ts"))
    val joined = out.join(truth, Seq("user_id", "event_type"))
    assert(joined.filter($"last_ts" =!= $"max_ts").count() == 0)
    assert(out.count() == truth.count())
    out.unpersist()
  }

  test("q43: argmax/argmin carry the balances their ordinals rank") {
    import spark.implicits._
    val out = Declared4.q43(spark, sf).cache()
    assert(out.count() == 25) // all nations populated at every SF
    assert(out.filter($"max_cents" < $"min_cents").count() == 0)
    // the named richest customer really holds the nation max balance
    val cust = Tables(spark, sf, "customer")
      .join(Tables(spark, sf, "nation"), $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_name", floor($"c_acctbal" * 100).cast("long").as("cents"))
    val chk = out.join(cust,
      out("n_name") === cust("n_name") && $"richest" === $"c_name")
    assert(chk.filter($"cents" =!= $"max_cents").count() == 0)
    out.unpersist()
  }

  test("q44: spine is gap-free, zero-filled, and totals are preserved") {
    import spark.implicits._
    val out = Declared4.q44(spark, sf).cache()
    val bounds = out.agg(min($"day").as("d0"), max($"day").as("d1"),
      count(lit(1)).as("n")).collect()(0)
    assert(bounds.getLong(2) ==
      java.time.temporal.ChronoUnit.DAYS.between(
        bounds.getDate(0).toLocalDate, bounds.getDate(1).toLocalDate) + 1)
    assert(out.filter($"n_orders" === 0 && $"cents" =!= 0).count() == 0)
    val total = out.agg(sum($"n_orders")).collect()(0).getLong(0)
    assert(total == Tables(spark, sf, "orders").count())
    out.unpersist()
  }

  test("q45: bit-aggregate identities hold") {
    import spark.implicits._
    val out = Declared4.q45(spark, sf).cache()
    // AND result is a submask of OR result, always
    assert(out.filter(($"key_and".bitwiseAND($"key_or")) =!= $"key_and").count() == 0)
    assert(out.agg(sum($"n")).collect()(0).getLong(0) ==
      Tables(spark, sf, "orders").count())
    out.unpersist()
  }

  test("q46: shares are in (0,1] and sum to 1 per customer and overall") {
    import spark.implicits._
    val out = Declared4.q46(spark, sf).cache()
    assert(out.filter($"share_of_customer" <= 0 || $"share_of_customer" > 1.0000001)
      .count() == 0)
    val perCust = out.groupBy($"o_custkey").agg(sum($"share_of_customer").as("s"))
      .filter(abs($"s" - 1.0) > 1e-9)
    assert(perCust.count() == 0)
    val tot = out.agg(sum($"share_of_total")).collect()(0).getDouble(0)
    assert(math.abs(tot - 1.0) < 1e-9, s"total share $tot")
    out.unpersist()
  }

  test("dedup_edit_distance: pairs ordered, thresholded, and truly close in prefix") {
    import spark.implicits._
    val out = graft.dedup.Dedup.editDistance(spark, sf).cache()
    assert(out.filter($"doc_a" >= $"doc_b").count() == 0)
    assert(out.filter($"prefix_lev" > 8 || $"prefix_lev" < 0).count() == 0)
    out.unpersist()
  }

  test("text_boilerplate: every reported shingle recurs across >=2 docs") {
    import spark.implicits._
    val out = graft.text.TextAnalysis.boilerplate(spark, sf).cache()
    assert(out.filter($"n_docs" < 2).count() == 0)
    assert(out.count() > 0) // planted near-dups guarantee shared shingles
    // spot check: a reported shingle really appears in >= 2 distinct docs
    val one = out.orderBy($"shingle").limit(1).collect()(0)
    val docs = Tables(spark, sf, "documents")
      .filter($"text".contains(one.getString(0))).count()
    assert(docs >= 2, s"shingle '${one.getString(0)}' found in $docs docs")
    out.unpersist()
  }
}
