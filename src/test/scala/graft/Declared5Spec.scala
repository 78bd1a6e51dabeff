package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Declared5

/** Invariant tests for the round-5 declared queries (the DuckDB hash
  * check is the equivalence gate; these assert the semantic properties
  * that make each query RIGHT, on sf0.001). */
class Declared5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q52: SCD2 intervals chain per user and exactly one row is current") {
    import spark.implicits._
    val out = Declared5.q52(spark, sf).cache()
    // exactly one open (is_current) version per user
    assert(out.filter($"is_current").groupBy($"user_id").count()
      .filter($"count" =!= 1).count() == 0)
    // intervals chain: valid_to of run k == valid_from of run k+1
    val nxt = out.select($"user_id", ($"run_idx" - 1).as("run_idx"),
      $"valid_from".as("next_from"))
    val chained = out.join(nxt, Seq("user_id", "run_idx"))
    assert(chained.filter($"valid_to" =!= $"next_from").count() == 0)
    // adjacent runs always change the tracked attribute
    val nxtType = out.select($"user_id", ($"run_idx" - 1).as("run_idx"),
      $"event_type".as("next_type"))
    assert(out.join(nxtType, Seq("user_id", "run_idx"))
      .filter($"event_type" === $"next_type").count() == 0)
    // version rows account for every event exactly once
    val nEvents = Tables(spark, sf, "events").count()
    assert(out.agg(sum($"n_events")).as[Long].head == nEvents)
    out.unpersist()
  }

  test("q53: median and mode match brute-force local computation") {
    import spark.implicits._
    val out = Declared5.q53(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3), r.getLong(4))).toMap
    val rows = Tables(spark, sf, "events")
      .select($"event_type", $"user_id", $"value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    rows.groupBy(_._1).foreach { case (et, grp) =>
      val vals = grp.map(_._3).sorted
      val n = vals.length
      val expectMedian =
        if (n % 2 == 1) vals(n / 2) else (vals(n / 2 - 1) + vals(n / 2)) / 2
      val counts = grp.groupBy(_._2).view.mapValues(_.size).toMap
      val best = counts.toSeq.map { case (u, c) => (c, -u) }.max
      val (medGot, modeUser, modeCount) = out(et)
      assert(medGot == expectMedian, s"median mismatch for $et")
      assert(modeUser == -best._2 && modeCount == best._1.toLong,
        s"mode mismatch for $et")
    }
  }

  test("q54: top-5 per doc, scores non-increasing, tf consistent with text") {
    import spark.implicits._
    val out = Declared5.q54(spark, sf).cache()
    assert(out.groupBy($"doc_id").count().filter($"count" > 5).count() == 0)
    // rank order really is score order (desc) within each doc
    val nxt = out.select($"doc_id", ($"rk" - 1).as("rk"), $"tfidf_ratio".as("next_score"))
    assert(out.join(nxt, Seq("doc_id", "rk"))
      .filter($"next_score" > $"tfidf_ratio").count() == 0)
    // df really counts docs containing the term (spot-check the top term)
    val top = out.filter($"rk" === 1).limit(1).collect()(0)
    val term = top.getString(1)
    val expectedDf = Tables(spark, sf, "documents")
      .filter(array_contains(split($"text", " "), term)).count()
    assert(top.getLong(3) == expectedDf)
    out.unpersist()
  }

  test("q55: only query terms appear; bm25 positive and saturating in tf") {
    import spark.implicits._
    val out = Declared5.q55(spark, sf).cache()
    assert(out.filter(!$"term".isin(Declared5.Bm25Terms: _*)).count() == 0)
    assert(out.filter($"bm25" <= 0).count() == 0)
    // saturation bound: per-term score < idf * (k1 + 1)
    val n = Tables(spark, sf, "documents").count()
    val bound = out.filter($"bm25" >=
      ((lit(n.toDouble) - $"df" + 0.5) / ($"df" + 0.5)) * (Declared5.Bm25K1 + 1.0))
    assert(bound.count() == 0)
    out.unpersist()
  }

  test("q56: overlap counts are bounded by the eval doc's n-gram set") {
    import spark.implicits._
    val out = Declared5.q56(spark, sf).cache()
    assert(out.filter($"n_overlap" > $"n_eval_ngrams").count() == 0)
    assert(out.filter($"overlap_frac" <= 0 || $"overlap_frac" > 1).count() == 0)
    // eval docs all come from src0, train docs never do
    val srcOf = Tables(spark, sf, "documents").select($"doc_id", $"source")
    assert(out.join(srcOf, out("eval_doc") === srcOf("doc_id"))
      .filter($"source" =!= "src0").count() == 0)
    assert(out.join(srcOf, out("train_doc") === srcOf("doc_id"))
      .filter($"source" === "src0").count() == 0)
    out.unpersist()
  }

  test("q57: two-phase prefix sum equals the naive single-window cumsum") {
    import spark.implicits._
    val out = Declared5.q57(spark, sf).select($"doc_id", $"n_tokens", $"start_off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var acc = 0L
    out.foreach { case (id, n, off) =>
      assert(off == acc, s"doc $id: start_off $off != cumsum $acc")
      acc += n
    }
  }

  test("q59: ewma equals a local left fold over the time-ordered series") {
    import spark.implicits._
    val out = Declared5.q59(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    val rows = Tables(spark, sf, "events")
      .select($"user_id", $"ts", $"event_id", $"value").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (u, grp) =>
      val ordered = grp.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).map(_._4)
      val expect = ordered.tail.foldLeft(ordered.head)((acc, x) =>
        Declared5.EwmaAlpha * x + (1.0 - Declared5.EwmaAlpha) * acc)
      val (n, got) = out(u)
      assert(n == grp.length)
      assert(got == expect, s"user $u: ewma $got != $expect")
    }
  }

  test("q60: rank family is consistent within each priority partition") {
    import spark.implicits._
    val out = Declared5.q60(spark, sf).cache()
    // percent_rank and cume_dist live in [0,1]; tiles in 1..4
    assert(out.filter($"pct_rank" < 0 || $"pct_rank" > 1).count() == 0)
    assert(out.filter($"cume" <= 0 || $"cume" > 1).count() == 0)
    assert(out.filter($"tile" < 1 || $"tile" > 4).count() == 0)
    // the composite key is collision-free, so dense_rank is dense 1..n
    val perPart = out.groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n"), max($"drank").as("maxd"),
        countDistinct($"drank").as("nd"))
    assert(perPart.filter($"n" =!= $"maxd" || $"n" =!= $"nd").count() == 0)
    // tiles split as evenly as possible: sizes differ by at most 1
    val tiles = out.groupBy($"o_orderpriority", $"tile").count()
      .groupBy($"o_orderpriority")
      .agg((max($"count") - min($"count")).as("spread"))
    assert(tiles.filter($"spread" > 1).count() == 0)
    out.unpersist()
  }

  test("q60b: the scale-path rank family is row-identical to the window formulation") {
    import spark.implicits._
    def norm(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      val cols = df.columns.sorted.map(c => col(c).cast("string"))
      df.select(cols.toIndexedSeq: _*).collect().map(_.mkString("|")).toSeq.sorted
    }
    assert(norm(Declared5.q60b(spark, sf)) == norm(Declared5.q60(spark, sf)))
  }

  test("q61: funnel stages are strictly ordered and counts non-increasing") {
    import spark.implicits._
    val out = Declared5.q61(spark, sf).cache()
    assert(out.filter($"click_ts".isNotNull && $"click_ts" <= $"view_ts").count() == 0)
    assert(out.filter($"purchase_ts".isNotNull && $"purchase_ts" <= $"click_ts").count() == 0)
    // a reached stage implies all earlier stages
    assert(out.filter($"purchase_ts".isNotNull && $"click_ts".isNull).count() == 0)
    assert(out.filter($"reached_stage" =!=
      (lit(1) + when($"click_ts".isNotNull, 1).otherwise(0) +
        when($"purchase_ts".isNotNull, 1).otherwise(0))).count() == 0)
    // funnel counts shrink monotonically
    val n1 = out.count()
    val n2 = out.filter($"reached_stage" >= 2).count()
    val n3 = out.filter($"reached_stage" === 3).count()
    assert(n1 >= n2 && n2 >= n3 && n1 > 0)
    out.unpersist()
  }

  test("q62: oov ratio is a valid fraction and the vocab really is top-100") {
    import spark.implicits._
    val out = Declared5.q62(spark, sf).cache()
    assert(out.filter($"n_oov" > $"n_tokens").count() == 0)
    assert(out.filter($"oov_ratio" < 0 || $"oov_ratio" > 1).count() == 0)
    // every tokenized doc is scored exactly once
    val nDocs = Tables(spark, sf, "documents")
      .filter(size(split(trim($"text"), " +")) > 0 && trim($"text") =!= "").count()
    assert(out.count() == nDocs)
    // corpus-level sanity: the top-100 vocabulary covers the bulk of
    // occurrences on this zipfy synthetic corpus
    val agg = out.agg(sum($"n_oov"), sum($"n_tokens")).head()
    assert(agg.getLong(0) * 2 < agg.getLong(1), s"top-100 vocab covers < half: $agg")
    out.unpersist()
  }

  test("q63: fixed-point k-means step matches a local brute-force Lloyd step") {
    import spark.implicits._
    val out = Declared5.q63(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val vecs = Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).map(x =>
        math.floor(x * Declared5.KmeansScale + 0.5).toLong).toArray))
      .sortBy(_._1)
    def dist(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(cents: Map[Int, Array[Long]]): Map[Long, Int] =
      vecs.map { case (id, v) =>
        id -> cents.toSeq.map { case (c, cv) => (dist(v, cv), c) }.min._2
      }.toMap
    val seeds = vecs.take(Declared5.KmeansK)
      .map { case (id, v) => id.toInt -> v }.toMap
    val a1 = assign(seeds)
    val byC = vecs.groupBy { case (id, _) => a1(id) }
    val c1 = byC.map { case (c, members) =>
      val n = members.length
      c -> Array.tabulate(64)(i =>
        math.floor(members.map(_._2(i)).sum.toDouble / n).toLong)
    }
    val a2 = assign(c1)
    c1.foreach { case (c, cv) =>
      val expect = (byC(c).length.toLong,
        vecs.count { case (id, _) => a2(id) == c }.toLong,
        cv.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum)
      assert(out(c) == expect, s"cluster $c: ${out(c)} != $expect")
    }
    assert(out.values.map(_._1).sum == vecs.length) // every vector assigned
  }

  test("q64: every event joins exactly one version; is_current iff the last run") {
    import spark.implicits._
    val out = Declared5.q64(spark, sf).cache()
    val nEvents = Tables(spark, sf, "events").count()
    assert(out.count() == nEvents) // exactly one version per event
    assert(out.select($"event_id").distinct().count() == nEvents)
    // the current-version rows are exactly those joined to each user's max run
    val maxRun = out.groupBy($"user_id").agg(max($"run_idx").as("mr"))
    assert(out.join(maxRun, "user_id")
      .filter($"is_current" =!= ($"run_idx" === $"mr")).count() == 0)
    out.unpersist()
  }

  test("q58: quantization error bounded by scale/2 and checksum reconstructs") {
    import spark.implicits._
    val out = Declared5.q58(spark, sf).cache()
    // round-to-nearest error bound |q*scale - x| <= scale/2 (+fp slack)
    assert(out.filter($"max_abs_err" > $"scale" / 2 * 1.0000001).count() == 0)
    // one output row per nonzero vector
    val nonzero = Tables(spark, sf, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .filter(array_max(transform($"v", x => abs(x))) > 0).count()
    assert(out.count() == nonzero)
    out.unpersist()
  }
}
