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

  test("q47: trailing-hour counts match a direct self-join recompute") {
    import spark.implicits._
    val out = Declared4.q47(spark, sf).cache()
    val e = Tables(spark, sf, "events").select($"event_id", $"user_id", $"ts")
    val truth = e.as("a").join(e.select($"user_id", $"ts".as("ts2")).as("b"),
        $"a.user_id" === $"b.user_id" &&
          $"ts2" <= $"ts" && $"ts2" >= $"ts" - expr("INTERVAL 1 HOUR"))
      .groupBy($"event_id").agg(count(lit(1)).as("n_truth"))
    val joined = out.join(truth, "event_id")
    assert(joined.count() == e.count())
    assert(joined.filter($"n_last_hour" =!= $"n_truth").count() == 0)
    out.unpersist()
  }

  test("q48: FILTER partitions are disjoint and exhaustive") {
    import spark.implicits._
    val out = Declared4.q48(spark, sf).cache()
    assert(out.filter($"n_discounted" > $"n").count() == 0)
    // bulk + small cents partition the flag's full cents exactly
    val truth = Tables(spark, sf, "lineitem")
      .groupBy($"l_returnflag")
      .agg(sum(floor($"l_extendedprice" * 100).cast("long")).as("cents_all"))
    val joined = out.join(truth, "l_returnflag")
    assert(joined
      .filter(coalesce($"cents_bulk", lit(0L)) + coalesce($"cents_small", lit(0L))
        =!= $"cents_all").count() == 0)
    out.unpersist()
  }

  test("q49: at most 2 rows per nation; top row carries the nation max balance") {
    import spark.implicits._
    val out = Declared4.q49(spark, sf).cache()
    assert(out.groupBy($"n_name").count().filter($"count" > 2).count() == 0)
    val tops = out.groupBy($"n_name").agg(max($"bal_cents").as("top_cents"))
    val truth = Declared4.q43(spark, sf).select($"n_name", $"max_cents")
    assert(tops.join(truth, "n_name").filter($"top_cents" =!= $"max_cents").count() == 0)
    out.unpersist()
  }

  test("q50: set identities hold per document") {
    import spark.implicits._
    val out = Declared4.q50(spark, sf).cache()
    assert(out.count() == Tables(spark, sf, "documents").count())
    // |A∪B| = |A| + |B| - |A∩B| ⇔ n_vocab = n_only_short + |B| where
    // B ⊇ A∩B; check via string fields: every 'both' token appears in vocab
    val bad = out.filter($"n_vocab" < $"n_only_short").count()
    assert(bad == 0)
    assert(out.filter($"both" =!= "" && !$"vocab".contains($"both".substr(lit(1), lit(3))))
      .count() == 0)
    out.unpersist()
  }

  test("q51: weights are exactly doubled repeat counts") {
    import spark.implicits._
    val out = Declared4.q51(spark, sf)
    val truth = Tables(spark, sf, "documents")
      .select($"doc_id", explode(split($"text", " ")).as("token"))
      .filter($"token" =!= "")
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("n"))
      .filter($"n" > 1)
    val joined = out.join(truth, Seq("doc_id", "token"))
    assert(joined.count() == out.count() && out.count() == truth.count())
    assert(joined.filter($"weight" =!= $"n" * 2).count() == 0)
  }

  test("graft_validate is callable from SQL with a literal schema") {
    import spark.implicits._
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_validate", GraftExtensions.validateBuilder, "built-in")
    val schema = graft.etl.EtlFixtures.userSchemaJson.replace("'", "''")
    Seq(
      """{"metadata":{"type":"user","event_at":"t","event_id":"x"},
        |"payload":{"id":1,"name":"A","address":"a","job":"j","score":0.5}}""".stripMargin,
      """{"payload":{"id":1,"name":"A","address":"a","job":"j","score":0.5}}""")
      .toDF("value").createOrReplaceTempView("raw_val")
    val got = spark.sql(
      s"SELECT graft_validate(value, '$schema').errClass AS c FROM raw_val")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("ok", "required"))
  }

  test("dedup_edit_distance: pairs ordered, thresholded, and truly close in prefix") {
    import spark.implicits._
    val out = graft.dedup.Dedup.editDistance(spark, sf).cache()
    assert(out.filter($"doc_a" >= $"doc_b").count() == 0)
    assert(out.filter($"prefix_lev" > 8 || $"prefix_lev" < 0).count() == 0)
    out.unpersist()
  }

  test("dedup_canonical over a PERSISTED assignment is row-identical to inline") {
    import spark.implicits._
    // the 100 TB shape: cluster once, persist the assignment, reuse it
    val persisted = java.nio.file.Files.createTempDirectory("canon_cl_")
      .resolve("p.parquet").toString
    graft.dedup.Dedup.clusters(spark, sf).write.parquet(persisted)
    val inline = graft.dedup.Dedup.canonical(spark, sf).collect().toSeq
    val reused = graft.dedup.Dedup
      .canonicalOver(spark, sf, spark.read.parquet(persisted))
      .collect().toSeq
    assert(inline == reused, "canonicalOver diverged from the inline recompute")
    assert(inline.nonEmpty)
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
