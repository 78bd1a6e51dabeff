package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Declared7

/** Round-6 continuation invariants. Each query is DuckDB-hash-checked
  * via Verify; these pin the properties the oracle can't see —
  * conservation laws (transition counts, signed drift cancelling),
  * independent reformulations (mutual edges via join vs intersect,
  * recall via except), and bound/sanity algebra on the winsorized
  * aggregates. */
class Declared7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def norm(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    df.select(cols.toIndexedSeq: _*).collect().map(_.mkString("|")).toSeq.sorted
  }

  test("q21c: custom merge as-of join is row-identical to the composed formulation") {
    assert(norm(Declared7.q21c(spark, sf)) ==
      norm(graft.queries.Declared.q21(spark, sf)))
  }

  test("q21c: merge as-of handles no-match, tie, and null-key rows like the composition") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    // crafted edges: key with only-later right rows (all null), exact-tie
    // timestamps (match), multiple right rows (latest wins), a key absent
    // from the right entirely, and a null left key (never matches)
    val left = Seq(
      (1L, ts(10), 100L), (1L, ts(20), 101L), (1L, ts(5), 102L),
      (2L, ts(10), 200L),
      (3L, ts(10), 300L),
      (4L, ts(50), 400L)).toDF("user_id", "ts", "event_id")
      .unionByName(Seq((Option.empty[Long], ts(10), 500L))
        .toDF("user_id", "ts", "event_id"))
    val right = Seq(
      (1L, ts(10), 1.0), (1L, ts(15), 2.0),
      (2L, ts(30), 9.0), // only later than every left row of key 2
      (4L, ts(50), 7.0)).toDF("user_id", "ts", "v")
    val viaCustom = graft.plans.AsOfMergeJoin
      .asOf(left, right, "user_id", "ts", Seq("v"))
    val viaComposed = graft.operators.AsOfJoin
      .asOf(left.filter($"user_id".isNotNull), right, "user_id", "ts", Seq("v"))
    // the composition has no null-key contract; compare on non-null keys
    assert(norm(viaCustom.filter($"user_id".isNotNull)) == norm(viaComposed))
    // and the null-key left row survives with a null value
    val nullRow = viaCustom.filter($"user_id".isNull).collect()
    assert(nullRow.length == 1 && nullRow(0).isNullAt(nullRow(0).fieldIndex("asof_v")))
  }

  test("q74: posting lists are the first min(df, cap) doc ids, df exact") {
    import spark.implicits._
    val out = Declared7.q74(spark, sf).cache()
    // every postings string has min(df, PostCap) entries
    val bad = out.filter(
      size(split($"postings", ",")) =!= least($"df", lit(Declared7.PostCap)))
    assert(bad.count() == 0)
    // df recomputed independently from raw tokens (no kernel, no map)
    val brute = Tables(spark, sf, "documents")
      .select($"doc_id", explode(graft.text.TextAnalysis.tokens($"text")).as("term"))
      .distinct()
      .groupBy($"term").agg(count(lit(1)).as("brute_df"))
    assert(out.join(brute, "term").filter($"df" =!= $"brute_df").count() == 0)
    assert(out.count() == brute.count())
    out.unpersist()
  }

  test("q75: transition counts conserve (sum = events - users) and ranks are dense") {
    import spark.implicits._
    val full = {
      // unranked transition counts, reformulated independently
      val ev = Tables(spark, sf, "events")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id")
      ev.select($"user_id", $"ts", $"event_id", $"event_type")
        .withColumn("nxt", lead($"event_type", 1).over(w))
        .filter($"nxt".isNotNull)
    }
    val nEvents = Tables(spark, sf, "events").count()
    val nUsers = Tables(spark, sf, "events").select($"user_id").distinct().count()
    assert(full.count() == nEvents - nUsers)
    val out = Declared7.q75(spark, sf).cache()
    // ranks dense from 1 within each from_state
    val rk = out.groupBy($"from_state")
      .agg(min($"rnk").as("mn"), max($"rnk").as("mx"), count(lit(1)).as("n"))
    assert(rk.filter($"mn" =!= 1 || $"mx" =!= $"n").count() == 0)
    // each reported count matches the full matrix
    val m = full.groupBy($"event_type".as("from_state"), $"nxt".as("to_state"))
      .agg(count(lit(1)).as("full_cnt"))
    assert(out.join(m, Seq("from_state", "to_state"))
      .filter($"cnt" =!= $"full_cnt").count() == 0)
    out.unpersist()
  }

  test("q76: flagged spikes match a driver-side sliding-window recompute") {
    import spark.implicits._
    val got = Declared7.q76(spark, sf)
      .select($"event_id").as[Long].collect().toSet
    val rows = Tables(spark, sf, "events")
      .select($"user_id", $"ts", $"event_id",
        floor($"value" * 100).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    val expected = rows.groupBy(_._1).values.flatMap { evs =>
      // getTime already carries the ms part of getNanos — order by
      // (ms, sub-ms nanos, event_id) for a correct timestamp total order
      val sorted = evs.sortBy(e => (e._2.getTime, e._2.getNanos % 1000000, e._3))
      sorted.indices.collect {
        case i if i >= Declared7.AnomWin &&
          sorted(i)._4 * Declared7.AnomWin >
            Declared7.AnomK * sorted.slice(i - Declared7.AnomWin, i).map(_._4).sum =>
          sorted(i)._3
      }
    }.toSet
    assert(got == expected)
  }

  test("q77: greedy merge semantics and monotone merge counts") {
    import spark.implicits._
    import graft.queries.Declared7.bpeApplyMerge
    // greedy left-to-right non-overlap: 'l l' in a run of 3 merges the
    // FIRST pair only; a run of 4 merges twice
    assert(bpeApplyMerge(Seq("l", "l", "l"), "l", "l") == Seq("ll", "l"))
    assert(bpeApplyMerge(Seq("l", "l", "l", "l"), "l", "l") == Seq("ll", "ll"))
    assert(bpeApplyMerge(Seq("a", "l", "l", "b"), "l", "l") == Seq("a", "ll", "b"))
    // symbol mass conserved: concatenation always rebuilds the word
    val words = Seq("mississippi", "banana", "aaaa", "x")
    for (w <- words; (l, r) <- Seq(("s", "s"), ("a", "n"), ("a", "a"))) {
      assert(bpeApplyMerge(w.split("").toSeq, l, r).mkString == w)
    }
    // trained merges: BPE's max-pair count is non-increasing across
    // iterations (new pairs inherit at most the merged pair's count)
    val out = Declared7.q77(spark, sf).orderBy($"iter").collect()
    assert(out.length == Declared7.BpeIters)
    val totals = out.map(_.getAs[Long]("total"))
    assert(totals.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    assert(out.forall(r => r.getAs[String]("lhs").nonEmpty &&
      r.getAs[String]("rhs").nonEmpty))
  }

  test("q89: encode applies trained merges, falls back to chars for OOV, conserves counts") {
    import spark.implicits._
    // corpus where training is hand-computable: 'abab' dominates, so
    // merges go (a,b)->ab, (ab,a)->aba... on the capped vocab; with
    // vocabCap=2 only the two most frequent words train — the third
    // word is OOV and must take the char fallback
    val docs = Seq(
      (1L, "abab abab cd abab"),
      (2L, "cd cd zz abab"),
      (3L, "zz"))
      .toDF("doc_id", "text")
    val out = Declared7.q89Over(docs, vocabCap = 2).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // vocab by (cnt desc, word): abab×5, cd×4 → zz (×2) is OOV.
    // training on {abab:5, cd:4}: merges (a,b)N=10? pairs: ab(5·2? no—
    // within-word adjacent: abab→(a,b)(b,a)(a,b): (a,b)=2·5=10,(b,a)=5;
    // cd→(c,d)=4. merge1=(a,b)→ab: abab→[ab,ab], cd→[c,d].
    // merge2: (ab,ab)=5 vs (c,d)=4 → abab→[abab]. merge3: (c,d)→cd.
    // merge4: no pairs left anywhere → training stops at 3 merges.
    // final: abab→1 token, cd→1 token, zz→OOV→2 char tokens.
    assert(out(1L) == ((4L, 4L, 0L)), s"doc1: ${out(1L)}") // 3×abab + cd = 4 tokens
    assert(out(2L) == ((4L, 5L, 1L)), s"doc2: ${out(2L)}") // cd,cd,abab=3 + zz=2
    assert(out(3L) == ((1L, 2L, 1L)), s"doc3: ${out(3L)}") // zz → z z
    // full corpus: every word is in the capped vocab → zero OOV, and
    // token count is bounded by character count (merges only shrink)
    val full = Declared7.q89(spark, sf).cache()
    assert(full.filter($"n_oov" =!= 0).count() == 0)
    assert(full.filter($"n_tokens" < $"n_words").count() == 0)
    val fps = full.select($"doc_fp").collect().map(_.getLong(0))
    assert(fps.forall(h => h >= 0 && h < 1000000007L))
    full.unpersist()
  }

  test("q77: training stops cleanly when the corpus runs out of adjacent pairs") {
    import spark.implicits._
    // single-char words: zero adjacent symbol pairs from iteration 1
    val degenerate = Seq("a b c", "a a b").toDF("text")
    assert(Declared7.q77Over(degenerate).count() == 0)
    // one mergeable pair, then exhaustion: 'ab' has exactly one merge
    val one = Seq("ab ab", "ab").toDF("text")
    val merges = Declared7.q77Over(one).collect()
    assert(merges.length == 1 &&
      merges(0).getAs[String]("lhs") == "a" && merges(0).getAs[String]("rhs") == "b")
    // empty corpus: no vocabulary, no merges, no crash
    assert(Declared7.q77Over(Seq.empty[String].toDF("text")).count() == 0)
  }

  test("q21c custom as-of: empty right side and empty left side degrade to nulls/empty") {
    import spark.implicits._
    def ts(sec: Int) = new java.sql.Timestamp(sec * 1000L)
    val left = Seq((1L, ts(10), 100L)).toDF("user_id", "ts", "event_id")
    val emptyR = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "ts", "v")
    val outER = graft.plans.AsOfMergeJoin
      .asOf(left, emptyR, "user_id", "ts", Seq("v")).collect()
    assert(outER.length == 1 && outER(0).isNullAt(outER(0).fieldIndex("asof_v")))
    val emptyL = Seq.empty[(Long, java.sql.Timestamp, Long)]
      .toDF("user_id", "ts", "event_id")
    val right = Seq((1L, ts(5), 2.0)).toDF("user_id", "ts", "v")
    assert(graft.plans.AsOfMergeJoin
      .asOf(emptyL, right, "user_id", "ts", Seq("v")).count() == 0)
    // cross-side type mismatch is rejected loudly, not mis-compared
    val badRight = Seq((1L, 5L, 2.0)).toDF("user_id", "ts", "v") // ts LongType
    intercept[IllegalArgumentException] {
      graft.plans.AsOfMergeJoin.asOf(left, badRight, "user_id", "ts", Seq("v"))
    }
  }

  test("q78: degree/triangle algebra holds and mutual edges match a join reformulation") {
    import spark.implicits._
    val out = Declared7.q78(spark, sf).cache()
    val sums = out.agg(sum($"deg"), sum($"tri_cnt")).head()
    // handshake: Σdeg even; each triangle counted at 3 corners
    assert(sums.getLong(0) % 2 == 0)
    assert(sums.getLong(1) % 3 == 0)
    // no node exceeds KnnK mutual neighbors
    assert(out.filter($"deg" > Declared7.KnnK).count() == 0)
    assert(out.count() ==
      Tables(spark, sf, "embeddings").filter($"label" === Declared7.KnnLabel).count())
    out.unpersist()
  }

  test("q78b: IVF-certificate graph is row-identical to the brute-force q78") {
    // the exactness certificate (cone bound vs provisional τ) makes
    // row-identity a THEOREM, not a tuning outcome — this spec is the
    // drift guard on that proof's implementation (Q78Eps absorbing FP
    // rounding, τ = −2 fallback for under-filled phase-1 lists)
    val brute = Declared7.q78(spark, sf).collect().toSeq
    val ivf = Declared7.q78b(spark, sf).collect().toSeq
    assert(brute.nonEmpty)
    assert(ivf == brute, "IVF-certificate kNN graph differs from brute force")
  }

  test("q79: drift numerators cancel when signed; slice counts conserve") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
    val out = Declared7.q79(spark, sf).cache()
    assert(out.agg(sum($"cnt_eval")).head().getLong(0) ==
      docs.filter($"source" === "src0").count())
    assert(out.agg(sum($"cnt_rest")).head().getLong(0) ==
      docs.filter($"source" =!= "src0").count())
    // Σ_b (cntA·totB − cntB·totA) = totA·totB − totB·totA = 0 exactly
    val tot = out.agg(sum($"cnt_eval").as("ta"), sum($"cnt_rest").as("tb"))
    val signed = out.crossJoin(broadcast(tot))
      .agg(sum($"cnt_eval" * $"tb" - $"cnt_rest" * $"ta")).head().getLong(0)
    assert(signed == 0L)
    out.unpersist()
  }

  test("q80: hits equals K minus the except-reformulated misses, bounded by K") {
    import spark.implicits._
    val out = Declared7.q80(spark, sf).cache()
    assert(out.filter($"hits" > $"k" || $"hits" < 0).count() == 0)
    val brute = graft.sim.Similarity.bruteForceTopK(spark, sf)
      .select($"query_id", $"vec_id")
    val lsh = graft.sim.Similarity.lshTopK(spark, sf)
      .select($"query_id", $"vec_id")
    val misses = brute.except(lsh).groupBy($"query_id")
      .agg(count(lit(1)).as("missed"))
    val joined = out.join(misses, Seq("query_id"), "left")
      .select($"hits", $"k", coalesce($"missed", lit(0L)).as("missed"))
    assert(joined.filter($"hits" + $"missed" =!= $"k").count() == 0)
    out.unpersist()
  }

  test("q82: every purchase is attributed exactly once (counts and cents conserve)") {
    import spark.implicits._
    val out = Declared7.q82(spark, sf).cache()
    val purchases = Tables(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .select(floor($"value" * 100).cast("long").as("cents"))
    assert(out.agg(sum($"n_purchases")).head().getLong(0) == purchases.count())
    assert(out.agg(sum($"attributed_cents")).head().getLong(0) ==
      purchases.agg(sum($"cents")).head().getLong(0))
    // '(none)' only for users whose first event(s) are purchases —
    // reformulated: a purchase is unattributed iff no earlier
    // non-purchase event exists for that user
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val unattributed = Tables(spark, sf, "events")
      .withColumn("n_prior_touch",
        count(when($"event_type" =!= "purchase", 1)).over(w))
      .filter($"event_type" === "purchase" && $"n_prior_touch" === 0)
    assert(out.filter($"attributed_type" === "(none)")
      .agg(coalesce(sum($"n_purchases"), lit(0L))).head().getLong(0) ==
      unattributed.count())
    out.unpersist()
  }

  test("q87: report rows match independent per-constraint recomputes") {
    import spark.implicits._
    val out = Declared7.q87(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == 7)
    val orders = Tables(spark, sf, "orders").cache()
    val n = orders.count()
    assert(out(("orders.o_totalprice", s"upper_bound_${Declared7.QualityPriceCap}")) ==
      ((orders.filter($"o_totalprice" > Declared7.QualityPriceCap).count(), n)))
    assert(out(("orders.o_orderkey", "unique")) ==
      ((n - orders.select($"o_orderkey").distinct().count(), n)))
    // referential: anti-join reformulation
    val orphans = Tables(spark, sf, "lineitem")
      .join(orders, $"l_orderkey" === $"o_orderkey", "left_anti").count()
    assert(out(("lineitem.l_orderkey", "fk_o_orderkey")) ==
      ((orphans, Tables(spark, sf, "lineitem").count())))
    orders.unpersist()
  }

  test("q88: empty embedding slice degrades to an empty frame, not a crash") {
    import spark.implicits._
    // a testdata dir whose embeddings table has NO KnnLabel rows: the
    // query-vector pull must take the headOption path (q77 precedent)
    val dir = java.nio.file.Files.createTempDirectory("q88empty").toString
    Seq((1L, Seq(1.0f, 0.0f), Declared7.KnnLabel + 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Declared7.q88(spark, dir)
    assert(out.columns.toSeq == Seq("rank", "vec_id", "score"))
    assert(out.count() == 0)
  }

  test("q88: MMR picks match a driver-side exact greedy recompute") {
    import spark.implicits._
    val out = Declared7.q88(spark, sf).orderBy($"rank").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.length == Declared7.MmrK)
    assert(out.map(_._2).distinct.length == out.length)
    // exact greedy MMR re-run in plain Scala over the collected slice
    // (no ordering shortcut asserted — with NEGATIVE cosines a later
    // pick's score can legitimately exceed an earlier one's)
    val rows = Tables(spark, sf, "embeddings")
      .filter($"label" === Declared7.KnnLabel)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def norm(a: Array[Double]) = math.sqrt(dot(a, a))
    val (qid, qv) = rows.head
    val qn = norm(qv)
    val cands = rows.filter(_._1 != qid)
      .map { case (id, v) => (id, v, norm(v), 0.0) }
      .map { case (id, v, n, _) => (id, v, n, dot(v, qv) / (n * qn)) }
    var pool = cands
    var selected = Vector.empty[(Array[Double], Double)]
    val expected = (1 to Declared7.MmrK).map { i =>
      val scored = pool.map { case (id, v, n, rel) =>
        val score = if (selected.isEmpty) rel
          else rel - 0.5 * selected.map { case (sv, sn) => dot(v, sv) / (n * sn) }.max
        (id, v, n, rel, score)
      }
      val best = scored.minBy { case (id, _, _, _, sc) => (-sc, id) }
      pool = pool.filter(_._1 != best._1)
      selected :+= ((best._2, best._3))
      (i, best._1, best._5)
    }
    assert(out.toSeq == expected,
      s"engine ${out.toSeq} vs driver recompute $expected")
  }

  test("q86: basket-local pair counts equal the self-join reformulation") {
    import spark.implicits._
    val li = Tables(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct()
    val a = li.select($"l_orderkey", $"l_partkey".as("part_a"))
    val b = li.select($"l_orderkey", $"l_partkey".as("part_b"))
    val viaJoin = a.join(b, "l_orderkey").filter($"part_a" < $"part_b")
      .groupBy($"part_a", $"part_b").agg(count(lit(1)).as("support"))
      .filter($"support" >= Declared7.PairMinSup)
      .collect().map(_.toSeq).toSet
    val out = Declared7.q86(spark, sf).collect().map(_.toSeq).toSet
    assert(out == viaJoin)
    assert(out.nonEmpty)
  }

  test("q84: retention triangle algebra — offset-0 equals cohort size, actives never exceed it") {
    import spark.implicits._
    val out = Declared7.q84(spark, sf).cache()
    // every user is active on their own first day
    assert(out.filter($"day_offset" === 0)
      .filter($"n_active" =!= $"cohort_n").count() == 0)
    assert(out.filter($"n_active" > $"cohort_n").count() == 0)
    assert(out.filter($"day_offset" < 0).count() == 0)
    // cohort sizes partition the user base exactly
    val users = Tables(spark, sf, "events").select($"user_id").distinct().count()
    assert(out.select($"cohort_day", $"cohort_n").distinct()
      .agg(sum($"cohort_n")).head().getLong(0) == users)
    out.unpersist()
  }

  test("q85: OLS rationals match a driver-side exact recompute") {
    import spark.implicits._
    val out = Declared7.q85(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    val rows = Tables(spark, sf, "events")
      .select($"event_type",
        datediff(to_date($"ts"), to_date(lit(Declared7.CohortEpoch))).cast("long"),
        floor($"value" * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (et, evs) =>
      val n = evs.length.toLong
      val sx = evs.map(_._2).sum; val sy = evs.map(_._3).sum
      val sxy = evs.map(e => e._2 * e._3).sum
      val sxx = evs.map(e => e._2 * e._2).sum
      assert(out(et) == ((n, n * sxy - sx * sy, n * sxx - sx * sx, sy * sxx - sx * sxy)),
        s"$et: ${out(et)}")
    }
  }

  test("q81: winsorized aggregates obey the clamp bounds") {
    import spark.implicits._
    val out = Declared7.q81(spark, sf).cache()
    assert(out.filter($"lo" > $"hi").count() == 0)
    // n·lo ≤ wsum ≤ n·hi, clamped strictly fewer than all rows
    assert(out.filter(
      $"wsum" < $"n_events" * $"lo" || $"wsum" > $"n_events" * $"hi").count() == 0)
    assert(out.filter($"n_clamped" >= $"n_events").count() == 0)
    // conservation: group sizes match the raw table
    val raw = Tables(spark, sf, "events")
      .groupBy($"event_type").agg(count(lit(1)).as("raw_n"))
    assert(out.join(raw, "event_type")
      .filter($"n_events" =!= $"raw_n").count() == 0)
    out.unpersist()
  }
}
