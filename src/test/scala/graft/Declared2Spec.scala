package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Declared2

/** Invariant tests for the round-2 declared queries (Q22-Q30 +
  * sim_centroids_exact). The DuckDB oracle is the value-level gate;
  * these assert the semantic shape so failures localize. */
class Declared2Spec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q22 pivot: per-priority row, pivot columns sum to the plain-agg total") {
    import spark.implicits._
    val piv = Declared2.q22(spark, sf).cache()
    assert(piv.columns.toSeq ==
      Seq("o_orderpriority", "total_f", "total_o", "total_p"))
    // pivot cells (cents-floored per status) must re-sum to the per-
    // priority cents-floored total — same dsum on disjoint partitions.
    // coalesce each cell: a priority missing one status yields a NULL
    // cell, which would null the whole row's contribution to the checksum
    val z = (c: org.apache.spark.sql.Column) =>
      org.apache.spark.sql.functions.coalesce(c, org.apache.spark.sql.functions.lit(0.0))
    val totals = piv.select(
      org.apache.spark.sql.functions.sum(
        z($"total_f") + z($"total_o") + z($"total_p"))).first().getDouble(0)
    val direct = Tables(spark, sf, "orders")
      .select((org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.floor($"o_totalprice" * 100)
          .cast("long")) / 100.0)).first().getDouble(0)
    assert(math.abs(totals - direct) < 1e-6, s"$totals vs $direct")
    piv.unpersist()
  }

  test("q23 percentiles are ordered p25 <= p50 <= p75 <= p99") {
    import spark.implicits._
    val bad = Declared2.q23(spark, sf)
      .filter($"p25" > $"p50" || $"p50" > $"p75" || $"p75" > $"p99")
    assert(bad.count() == 0)
  }

  test("q24 sampling is deterministic and strata-bounded") {
    val a = Declared2.q24(spark, sf).collect().toSeq
    val b = Declared2.q24(spark, sf).collect().toSeq
    assert(a == b, "hash sample must be run-to-run identical")
    // ~10-20% sample of each stratum: bounded well under the full count
    val full = Tables(spark, sf, "orders").count()
    val sampled = a.map(_.getAs[Long]("n_sampled")).sum
    assert(sampled > 0 && sampled < full / 2, s"$sampled of $full")
  }

  test("q25 sessions: indexes contiguous from 1, durations non-negative") {
    import spark.implicits._
    val s = Declared2.q25(spark, sf).cache()
    assert(s.filter($"duration_us" < 0).count() == 0)
    assert(s.filter($"session_idx" < 1).count() == 0)
    // per user, max(session_idx) == count(sessions) — contiguity
    val perUser = s.groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.max($"session_idx").as("mx"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
    assert(perUser.filter($"mx" =!= $"n").count() == 0)
    s.unpersist()
  }

  test("q26 histogram buckets partition the table") {
    import spark.implicits._
    val h = Declared2.q26(spark, sf)
    val total = h.agg(org.apache.spark.sql.functions.sum($"n")).first().getLong(0)
    assert(total == Tables(spark, sf, "orders").count())
  }

  test("q27 devoweled output contains no vowels") {
    import spark.implicits._
    val bad = Declared2.q27(spark, sf).filter($"devoweled".rlike("[aeiou]"))
    assert(bad.count() == 0)
  }

  test("q15c grouping sets: no (status,priority) detail rows, one grand total") {
    import spark.implicits._
    val df = Declared2.q15c(spark, sf).cache()
    assert(df.filter($"g_status" === 0 && $"g_prio" === 0).count() == 0)
    assert(df.filter($"g_status" === 1 && $"g_prio" === 1).count() == 1)
    df.unpersist()
  }

  test("q28 array fold matches a driver-side recomputation") {
    import spark.implicits._
    val row = Declared2.q28(spark, sf).limit(1).collect().head
    val vecId = row.getAs[Long]("vec_id")
    val emb = Tables(spark, sf, "embeddings")
      .filter($"vec_id" === vecId)
      .select($"embedding").as[Seq[Float]].head()
    val expected = emb.map(x => math.floor(x.toDouble * 1e6).toLong).sum
    assert(row.getAs[Long]("sum_scaled") == expected)
    assert(row.getAs[Int]("n_pos") == emb.count(_ > 0))
  }

  test("q30 distribution windows: quartile in 1..4, pct_rank in [0,1]") {
    import spark.implicits._
    val df = Declared2.q30(spark, sf).cache()
    assert(df.filter($"quartile" < 1 || $"quartile" > 4).count() == 0)
    assert(df.filter($"pct_rank" < 0 || $"pct_rank" > 1).count() == 0)
    assert(df.filter($"cume" <= 0 || $"cume" > 1).count() == 0)
    df.unpersist()
  }

  test("q29 full outer keeps both unmatched sides") {
    import spark.implicits._
    val df = Declared2.q29(spark, sf).cache()
    assert(df.filter($"c_name".isNull).count() > 0, "no order-only rows survived")
    assert(df.filter($"n_big" === 0).count() > 0, "no customer-only rows survived")
    df.unpersist()
  }

  test("q14b multiset algebra: |A ∩all B| + |A \\all B| = |A|") {
    import spark.implicits._
    val df = Declared2.q14b(spark, sf).cache()
    val inter = df.filter($"op" === "1_intersect_all").count()
    val excpt = df.filter($"op" === "2_except_all").count()
    val a = Tables(spark, sf, "orders").filter($"o_totalprice" > 150000).count()
    assert(inter + excpt == a)
    df.unpersist()
  }

  test("q31 decorrelates: every kept order beats 1.5x its customer's mean") {
    import spark.implicits._
    val kept = Declared2.q31(spark, sf)
    // spot-check one customer driver-side
    val row = kept.limit(1).collect().headOption
    row.foreach { r =>
      val ck = r.getAs[Long]("o_custkey")
      val prices = Tables(spark, sf, "orders").filter($"o_custkey" === ck)
        .select($"o_totalprice").as[Double].collect()
      val avgExact = prices.map(p => math.floor(p * 100).toLong).sum.toDouble /
        prices.length / 100.0
      assert(r.getAs[Double]("o_totalprice") > 1.5 * avgExact)
    }
    // decorrelation: plan must not contain a per-row subquery node
    val plan = kept.queryExecution.optimizedPlan.toString
    assert(!plan.contains("scalar-subquery"), s"undecorrelated:\n$plan")
  }

  test("q22b unpivot row count equals pivot non-null cells") {
    import spark.implicits._
    val piv = Declared2.q22(spark, sf)
    val cells = piv.select(
      (org.apache.spark.sql.functions.when($"total_f".isNotNull, 1).otherwise(0) +
        org.apache.spark.sql.functions.when($"total_o".isNotNull, 1).otherwise(0) +
        org.apache.spark.sql.functions.when($"total_p".isNotNull, 1).otherwise(0)).as("c"))
      .agg(org.apache.spark.sql.functions.sum($"c")).first().getLong(0)
    assert(Declared2.q22b(spark, sf).count() == cells)
  }

  test("q32 status history length equals the group count") {
    import spark.implicits._
    val bad = Declared2.q32(spark, sf)
      .filter(org.apache.spark.sql.functions.length($"status_history") =!= $"n")
    assert(bad.count() == 0)
  }

  test("pipeline_curate output is quality-gated, deduped, and sampled") {
    import spark.implicits._
    val out = Declared2.curate(spark, sf).cache()
    val gated = graft.text.TextAnalysis.quality(spark, sf)
      .filter($"passes_quality").count()
    assert(out.count() > 0 && out.count() < gated,
      s"${out.count()} vs $gated gated — sample must strictly shrink")
    assert(out.filter($"n_tokens" < 20 || $"n_tokens" > 1000).count() == 0)
    out.unpersist()
  }

  test("mm_resize fits the 224 box, aspect preserved within rounding") {
    import spark.implicits._
    val r = graft.multimodal.Multimodal.resizeQuery(spark, sf).cache()
    assert(r.filter($"out_w" < 1 || $"out_h" < 1 ||
      $"out_w" > 224 || $"out_h" > 224).count() == 0)
    // the longer side lands on 224 (or 223 when scale rounding undershoots)
    val maxSide = org.apache.spark.sql.functions.greatest($"out_w", $"out_h")
    assert(r.filter(maxSide < 223).count() == 0)
    r.unpersist()
  }

  test("sim_centroids_exact: one row per (label, dim), dims dense 1..64") {
    import spark.implicits._
    val c = Declared2.simCentroidsExact(spark, sf).cache()
    val labels = c.select($"label").distinct().count()
    assert(c.count() == labels * 64, s"${c.count()} vs $labels labels")
    assert(c.filter($"dim" < 1 || $"dim" > 64).count() == 0)
    c.unpersist()
  }
}
