package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.sim.Similarity
import graft.text.TextAnalysis

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("quality: counts are internally consistent") {
    import spark.implicits._
    val q = TextAnalysis.quality(spark, sf)
    assert(q.filter($"type_token_ratio" > 1.0 || $"type_token_ratio" <= 0.0).count() == 0)
    assert(q.filter($"stopword_ratio" < 0.0 || $"stopword_ratio" > 1.0).count() == 0)
    assert(q.filter($"n_tokens" > $"n_chars_actual").count() == 0)
  }

  test("fingerprint: deterministic, in modular range, prefix-sensitive") {
    import spark.implicits._
    val a = TextAnalysis.fingerprint(spark, sf).collect()
    val b = TextAnalysis.fingerprint(spark, sf).collect()
    assert(a.sameElements(b))
    assert(a.forall(r => r.getLong(1) >= 0 && r.getLong(1) < 1000000007L))
    // docs ≤64 chars have fp == fp_prefix; longer docs (almost) all differ
    val eq = TextAnalysis.fingerprint(spark, sf)
      .join(Tables(spark, sf, "documents"), "doc_id")
      .filter(length($"text") > 64 && $"fp" === $"fp_prefix").count()
    assert(eq < 5)
  }

  test("langid: deterministic values in the closed label set") {
    import spark.implicits._
    val l = TextAnalysis.langId(spark, sf)
    val langs = l.select($"predicted_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("en", "es", "de", "fr", "zh", "und")))
  }
}

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  /** Corpus with planted duplicates: 40 base docs of ~240 tokens over a
    * 500-word vocabulary (docs carry ~190 DISTINCT tokens — simhash vote
    * mass per token stays small, like real text, so a one-token edit
    * flips only a couple of bits and lands within SimhashRadius=3), plus
    * a near-dup of doc 0 (one token changed ⇒ ±1 distinct-set element)
    * and an exact dup of doc 1. */
  def planted = {
    import spark.implicits._
    val words = (0 until 500).map(i => f"w$i%03d")
    def doc(seed: Int) = {
      val r = new scala.util.Random(seed)
      Seq.fill(240)(words(r.nextInt(words.size))).mkString(" ")
    }
    val base = (0 until 40).map(i => (i.toLong, doc(i)))
    val near = (100L, doc(0).replaceFirst("^\\w+", "CHANGED"))
    val exact = (101L, doc(1))
    (base :+ near :+ exact).toDF("doc_id", "text")
  }

  test("minhash LSH finds planted near-dup and exact dup, not random pairs") {
    import spark.implicits._
    val pairs = Dedup.minhashLshOver(planted).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 100L)), s"missing planted near-dup; got $pairs")
    assert(pairs.contains((1L, 101L)), s"missing planted exact dup; got $pairs")
    // random 80-token docs over the 200-word vocab rarely share 3-token
    // shingles; planted pairs must be found and noise stays bounded
    assert(pairs.size < 20, s"too many noise pairs: ${pairs.size}")
  }

  test("simhash: exact dup has hamming 0; planted near-dup is close") {
    import spark.implicits._
    val pairs = Dedup.simhashOver(planted).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs.get((1L, 101L)).contains(0), s"exact dup not at hamming 0: $pairs")
    assert(pairs.contains((0L, 100L)), "planted near-dup beyond simhash radius")
  }

  test("simhash piece blocking is pigeonhole-exact within the radius") {
    // replicate the production piece extraction (SimhashPieces = radius+1
    // pieces, currently 4×16-bit, top piece takes the remainder) and check
    // that ANY pattern of up to SimhashRadius flips leaves at least one
    // piece identical — i.e. the pair lands in a shared bucket. Guards
    // width/mask bugs: pigeonhole exactness requires pieces > radius, so
    // e.g. 4 pieces with radius 4+ would fail for flips spread across all
    // four chunks.
    val piecesOf: Long => Seq[Long] = { sh =>
      val n = Dedup.SimhashPieces
      val width = 64 / n
      (0 until n).map { j =>
        val hi = if (j == n - 1) 64 - j * width else width
        (sh >>> (j * width)) & ((1L << hi) - 1)
      }
    }
    val rnd = new scala.util.Random(7)
    (1 to 1000).foreach { _ =>
      val a = rnd.nextLong()
      val flips = 1 + rnd.nextInt(Dedup.SimhashRadius)
      val bits = rnd.shuffle((0 until 64).toList).take(flips)
      val b = bits.foldLeft(a)((acc, i) => acc ^ (1L << i))
      assert(piecesOf(a).zip(piecesOf(b)).exists { case (x, y) => x == y },
        s"no shared piece for flips at $bits")
    }
  }

  test("simhash blocking is EXACT at sf0.001: query pairs == brute-force pairs") {
    import spark.implicits._
    // the pigeonhole property test proves the blocking scheme in the
    // abstract; this proves the assembled operator end-to-end — the
    // blocked query must return EXACTLY the pairs within Hamming radius,
    // no false drops from bucket mis-assembly, no radius leaks
    val queryPairs = Dedup.simhash(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // mirror the operator's own pre-filter (it drops zero-token docs
    // BEFORE hashing) so both sides compute pairs over the same doc set
    val sigs = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0),
        graft.functions.Signatures.distinctTokens(r.getString(1)).toSeq))
      .filter(_._2.nonEmpty)
      .map { case (id, toks) =>
        (id, graft.functions.Signatures.simhash64(toks)) }
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= Dedup.SimhashRadius
    } yield ((ia, ib), h)).toMap
    assert(queryPairs == brute,
      s"query=${queryPairs.keySet} brute=${brute.keySet}")
  }

  test("edit distance: PassJoin segment route returns EXACTLY the pairwise rows") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents")
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toString).toSeq.sorted
    // force EVERY block through the segment scheme and compare to the
    // all-pairs formulation — 100% recall is the PassJoin pigeonhole
    // claim, and precision is trivially shared (same verification)
    val seg = norm(Dedup.editDistanceOver(docs, maxBlockRows = 1))
    val pairwise = norm(Dedup.editDistanceOver(docs, maxBlockRows = Int.MaxValue))
    assert(seg.nonEmpty, "no pairs at sf0.001 — the comparison is vacuous")
    assert(seg == pairwise,
      s"segment route diverged: seg=${seg.size} pairwise=${pairwise.size}")
  }

  test("edit distance: variable-length PassJoin covers short and micro prefixes exactly") {
    import spark.implicits._
    // crafted corpus in ONE (lang, len_bucket) block, lengths straddling
    // every layout boundary: full (80), short (9..79) — including
    // full×short pairs within k — and micro (<9), where pairs exist
    // purely by length (lev ≤ max(len) ≤ k). The old short×block
    // fallback got these by brute force; the per-length segment layouts
    // must reproduce the identical row set.
    val base = "abcdefghijklmnopqrstuvwxyz0123456789" * 3
    val docs = Seq(
      (1L, "en", base.take(80)),                     // full
      (2L, "en", base.take(80).patch(40, "XY", 2)),  // full, lev 2 of 1
      (3L, "en", base.take(76)),                     // short; lev 4 of 1 (cross full×short)
      (4L, "en", base.take(76).patch(10, "Q", 1)),   // short, lev 1 of 3
      (5L, "en", base.take(40)),                     // short, isolated
      (6L, "en", base.take(12)),                     // short, low end
      (7L, "en", base.take(12).patch(3, "ZZ", 2)),   // short, near 6
      (8L, "en", base.take(6)),                      // micro; lev 6 of 6 (cross short×micro)
      (9L, "en", base.take(5)),                      // micro, near 8
      (10L, "en", "zzzzzz"))                         // micro, alien content — still ≤ k of 8/9 by length
      .toDF("doc_id", "lang", "text")
    val norm = (df: org.apache.spark.sql.DataFrame) =>
      df.collect().map(_.toString).toSeq.sorted
    val seg = norm(Dedup.editDistanceOver(docs, maxBlockRows = 1))
    val pairwise = norm(Dedup.editDistanceOver(docs, maxBlockRows = Int.MaxValue))
    assert(seg == pairwise,
      s"variable-length route diverged:\nseg=$seg\npairwise=$pairwise")
    val pairs = Dedup.editDistanceOver(docs, maxBlockRows = 1)
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the boundary-crossing pairs the fallback used to brute-force
    assert(Set((1L, 2L), (1L, 3L), (3L, 4L), (6L, 7L), (8L, 9L)).subsetOf(pairs),
      s"missing expected pairs: $pairs")
  }

  test("portable simhash blocking is EXACT at sf0.001: query pairs == brute-force pairs") {
    import spark.implicits._
    // same end-to-end exactness proof as the 64-bit sibling, over the
    // 60-bit portable signature the DuckDB oracle re-derives
    val queryPairs = Dedup.simhashPortable(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val sigs = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0),
        graft.functions.Signatures.distinctTokens(r.getString(1)).toSeq))
      .filter(_._2.nonEmpty)
      .map { case (id, toks) =>
        (id, graft.functions.Signatures.portableSimhash60(toks)) }
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= Dedup.SimhashRadius
    } yield ((ia, ib), h)).toMap
    assert(queryPairs == brute,
      s"query=${queryPairs.keySet} brute=${brute.keySet}")
  }

  test("minhash candidates have perfect precision vs brute-force jaccard") {
    import spark.implicits._
    // LSH recall is probabilistic (banding), but precision after the
    // exact-verify stage must be perfect: every returned pair really has
    // shingle-set Jaccard >= 0.3
    val pairs = Dedup.minhashLsh(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    // same raw (non-distinct) token stream the operator shingles over
    val sets = Tables(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0),
        graft.functions.Signatures.sortedShingleHashSet(
          r.getString(1).split(" ").toSeq.filter(_.nonEmpty), 3)))
      .toMap
    pairs.foreach { case ((a, b), j) =>
      val expected = graft.functions.Signatures.jaccardSorted(sets(a), sets(b))
      assert(j == expected && j >= 0.3, s"pair ($a,$b): query $j vs brute $expected")
    }
  }

  test("incremental dedup equals the all-pairs portable result restricted to cross-source pairs") {
    import spark.implicits._
    // reformulation: (new=src0) × corpus candidates must find exactly
    // the all-pairs result's pairs that straddle the src0 boundary —
    // the band index is the same, only the candidate restriction moves
    val src = Tables(spark, sf, "documents").select($"doc_id", $"source")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val allPairs = Dedup.minhashPortable(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter { case (a, b, _, _) =>
        (src(a) == "src0") != (src(b) == "src0") }
      .map { case (a, b, i, u) =>
        if (src(a) == "src0") (a, b, i, u) else (b, a, i, u) }
      .toSet
    val inc = Dedup.minhashIncremental(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(inc == allPairs, s"incremental $inc vs restricted all-pairs $allPairs")
  }

  test("portable minhash finds planted dups; pairs match a driver recompute") {
    import spark.implicits._
    val pairs = Dedup.minhashPortableOver(planted).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(4))).toMap
    assert(pairs.contains((0L, 100L)), s"missing planted near-dup; got ${pairs.keySet}")
    assert(pairs.get((1L, 101L)).contains(1.0), s"exact dup not at jaccard 1: $pairs")
    // precision: every returned pair really has portable-hashed-shingle
    // jaccard >= 0.5 per a driver-side recompute
    val sets = planted.collect()
      .map(r => (r.getLong(0),
        graft.functions.Signatures.portableShingleHashSet(
          r.getString(1).split(" ").toSeq.filter(_.nonEmpty), 3)))
      .toMap
    pairs.foreach { case ((a, b), j) =>
      val ia = graft.functions.Signatures.intersectSorted(sets(a), sets(b)).toDouble
      val expected = ia / (sets(a).length + sets(b).length - ia)
      assert(j == expected && j >= 0.5, s"pair ($a,$b): query $j vs brute $expected")
    }
  }

  test("exact dedup groups identical texts at any scale") {
    import spark.implicits._
    val d = Dedup.exact(spark, sf)
    // synthetic corpus has no exact dups: every group is a singleton
    assert(d.filter($"n_copies" =!= 1).count() == 0)
    assert(d.count() == Tables(spark, sf, "documents").count())
  }

  test("embedding cosine pairs are symmetric-free and above threshold") {
    import spark.implicits._
    val p = Dedup.embeddingCosine(spark, sf)
    assert(p.filter($"vec_a" >= $"vec_b").count() == 0)
    assert(p.filter($"cos_sim" < 0.35 || $"cos_sim" > 1.0000001).count() == 0)
  }

  test("bucketed embedding cosine is row-identical to its brute-force twin") {
    // exact recall of the IVF-cell candidate generation: the equi-join
    // path must emit exactly the all-pairs result, bit-for-bit (same
    // normalization + DotProduct expressions on both sides)
    val fast = Dedup.embeddingCosine(spark, sf).collect()
    val brute = Dedup.embeddingCosineBrute(spark, sf).collect()
    assert(fast.length == brute.length,
      s"row count ${fast.length} != brute ${brute.length}")
    fast.zip(brute).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("jaccard prefix-filter route is row-identical to the pairwise route") {
    // cap 0 forces EVERY block down the oversized (prefix-filter) path;
    // MaxValue forces the pairwise path. The AllPairs/PPJoin prefix
    // filter is exact for J >= 0.5, so both must emit the same rows
    // bit-for-bit (identical verification expressions) on a real corpus.
    val docs = Tables(spark, "/root/testdata/sf0.01", "documents")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.orderBy(col("doc_a"), col("doc_b")).collect().toSeq
    val pairwise = norm(Dedup.ngramJaccardPairsOver(docs, maxBlockRows = Int.MaxValue))
    val prefix = norm(Dedup.ngramJaccardPairsOver(docs, maxBlockRows = 0))
    assert(pairwise.nonEmpty, "corpus produced no near-dup pairs")
    assert(prefix == pairwise,
      s"prefix route diverged: ${prefix.size} vs ${pairwise.size} rows")
  }

  test("jaccard hot block: 10k docs in ONE block complete without a quadratic join") {
    import spark.implicits._
    // 10k same-lang docs engineered into a single (lang, len_bucket)
    // block: disjoint token sets (zero shared prefix hashes) except one
    // planted near-dup pair. The pairwise route would score 50M pairs;
    // the prefix route's inverted index touches only hash-sharing pairs,
    // so this must finish promptly AND still find the planted pair.
    val docs = spark.range(0, 10000).select(
      $"id".as("doc_id"), lit("en").as("lang"),
      // doc i: 12 tokens "tAAAAivBB" unique to i → text length is fixed
      // (119 chars) → everyone lands in len_bucket 1
      concat_ws(" ", (0 until 12).map(j =>
        format_string("t%05dv%02d", $"id", lit(j))): _*).as("text"))
      .withColumn("text",
        when($"doc_id" === 9999L,
          // near-dup of doc 9998: same tokens, one changed
          concat(format_string("t%05dv%02d", lit(9998), lit(99)), lit(" "),
            concat_ws(" ", (1 until 12).map(j =>
              format_string("t%05dv%02d", lit(9998), lit(j))): _*)))
          .otherwise($"text"))
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    val pairs = Dedup.ngramJaccardPairsOver(docs)   // default cap: 4096 < 10000
      .select($"doc_a", $"doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(System.nanoTime() < deadline,
      "hot block took >120s — prefix route not engaged?")
    assert(pairs == Set((9998L, 9999L)), s"expected only the planted pair, got $pairs")
  }
}

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("brute-force top-k: k rows per query, descending, no self-match") {
    import spark.implicits._
    val t = Similarity.bruteForceTopK(spark, sf).cache()
    val perQ = t.groupBy($"query_id").count().collect()
    assert(perQ.length == Similarity.NumQueries)
    assert(perQ.forall(_.getLong(1) == Similarity.K))
    assert(t.filter($"query_id" === $"vec_id").count() == 0)
    val ranks = t.filter($"query_id" === 0).orderBy($"rank").collect()
    val sims = ranks.map(_.getAs[Double]("cos_sim"))
    assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    t.unpersist()
  }

  test("IVF top-k: subset-search properties hold exactly") {
    import spark.implicits._
    // recall on THIS corpus is corpus-dependent (the synthetic embeddings
    // are only weakly label-clustered — measured: true NNs often live
    // outside the 2 probed cells), so correctness is asserted
    // structurally; the DuckDB oracle hash-check is the value-level gate
    val ivf = Similarity.ivfTopK(spark, sf).cache()
    val perQ = ivf.groupBy($"query_id").count().collect()
    assert(perQ.length == Similarity.NumQueries)
    assert(perQ.forall(_.getLong(1) <= Similarity.K))
    assert(ivf.filter($"query_id" === $"vec_id").count() == 0)
    // a subset search can never beat the global best: every IVF cos is
    // bounded by the brute-force rank-1 cos of the same query
    val bruteBest = Similarity.bruteForceTopK(spark, sf)
      .filter($"rank" === 1).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("cos_sim")).toMap
    ivf.collect().foreach { r =>
      assert(r.getAs[Double]("cos_sim") <= bruteBest(r.getLong(0)) + 1e-12)
    }
    // ranks contiguous from 1, cos non-increasing within each query
    val byQ = ivf.collect().groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length))
      val sims = sorted.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // deterministic across runs
    assert(ivf.collect().toSeq == Similarity.ivfTopK(spark, sf).collect().toSeq)
    ivf.unpersist()
  }

  test("trained-codebook IVF: codebook shape + subset-search properties") {
    import spark.implicits._
    // the one-Lloyd-step codebook: <= KCells cells, every centroid a
    // 64-dim integer vector, deterministic across runs (fixed-point
    // arithmetic — this is what makes the DuckDB oracle reconstruction
    // possible)
    val cb = Similarity.trainedCodebook(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(cb.nonEmpty && cb.size <= Similarity.KCells)
    assert(cb.values.forall(_.length == 64))
    val cb2 = Similarity.trainedCodebook(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(cb == cb2, "codebook not deterministic across runs")
    // subset-search properties of the trained top-k (mirrors the
    // per-label IVF test; value-level gate is the DuckDB hash check)
    val ivf = Similarity.ivfTrainedTopK(spark, sf).cache()
    val perQ = ivf.groupBy($"query_id").count().collect()
    assert(perQ.length == Similarity.NumQueries)
    assert(perQ.forall(_.getLong(1) <= Similarity.K))
    assert(ivf.filter($"query_id" === $"vec_id").count() == 0)
    val bruteBest = Similarity.bruteForceTopK(spark, sf)
      .filter($"rank" === 1).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("cos_sim")).toMap
    ivf.collect().foreach { r =>
      assert(r.getAs[Double]("cos_sim") <= bruteBest(r.getLong(0)) + 1e-12)
    }
    ivf.unpersist()
  }

  test("label centroids: one row per label, sane cosine and norms") {
    import spark.implicits._
    val c = Similarity.labelCentroids(spark, sf).cache()
    assert(c.count() == 10) // labels 0..9
    assert(c.filter($"mean_cos_to_centroid" <= 0.0 || $"mean_cos_to_centroid" > 1.0).count() == 0)
    assert(c.filter($"centroid_norm" <= 0.0).count() == 0)
    // members correlate with their own centroid far above random (~0)
    assert(c.agg(min($"mean_cos_to_centroid")).collect()(0).getDouble(0) > 0.1)
    c.unpersist()
  }

  test("VectorAvg aggregator: exact mean on a known set") {
    import spark.implicits._
    val ds = Seq((1, Seq(1.0, 2.0)), (1, Seq(3.0, 4.0)), (2, Seq(10.0, 20.0))).toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.VectorAvg.toColumn.name("c")).collect().toMap
    assert(out(1) == Seq(2.0, 3.0))
    assert(out(2) == Seq(10.0, 20.0))
  }

  test("VectorAvg: empty vectors neither reset the accumulator nor count") {
    import spark.implicits._
    val ds = Seq((1, Seq(2.0)), (1, Seq.empty[Double]), (1, Seq(4.0))).toDS()
    val out = ds.groupByKey(_._1).mapValues(_._2)
      .agg(graft.functions.VectorAvg.toColumn.name("c")).collect().toMap
    assert(out(1) == Seq(3.0)) // mean of (2,4); the empty row is skipped
  }

  test("PQ: codebook/code shapes, exact-integer determinism, subset bound, recall floor") {
    import spark.implicits._
    import graft.sim.{KmeansQuantizer, PqQuantizer}
    val sub = PqQuantizer.subvectors(
      KmeansQuantizer.quantized(graft.Tables(spark, sf, "embeddings")))
    val cb = PqQuantizer.codebooks(sub)
    val cbRows = cb.collect()
    // ≤ M·KS sub-centroids, each SubDim wide
    assert(cbRows.nonEmpty && cbRows.length <= PqQuantizer.M * PqQuantizer.KS)
    assert(cbRows.forall(_.getSeq[Long](2).length == PqQuantizer.SubDim))
    // every subspace trained
    assert(cbRows.map(_.getInt(0)).distinct.sorted.toSeq == (0 until PqQuantizer.M))
    val codes = PqQuantizer.encoded(sub, cb).collect()
    assert(codes.length == 500) // one code row per vector
    assert(codes.forall(_.getSeq[Int](1).length == PqQuantizer.M))
    assert(codes.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < PqQuantizer.KS)))
    val pq = Similarity.pqTopK(spark, sf).cache()
    val perQ = pq.groupBy($"query_id").count().collect()
    assert(perQ.length == Similarity.NumQueries)
    assert(perQ.forall(_.getLong(1) == Similarity.K))
    assert(pq.filter($"query_id" === $"vec_id").count() == 0)
    assert(pq.filter($"adist" < 0).count() == 0)
    val brute = Similarity.bruteForceTopK(spark, sf).cache()
    // an ADC-candidate re-rank can never beat the global best
    val bruteBest = brute.filter($"rank" === 1).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("cos_sim")).toMap
    pq.collect().foreach { r =>
      assert(r.getAs[Double]("cos_sim") <= bruteBest(r.getLong(0)) + 1e-12)
    }
    // recall vs brute top-K (measured 0.84 macro at sf0.001; floor is
    // deliberately loose — the value-level gate is the DuckDB hash)
    def sets(df: org.apache.spark.sql.DataFrame) = df.collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val bs = sets(brute); val ps = sets(pq)
    val recall = bs.keys.toSeq
      .map(q => (bs(q) & ps.getOrElse(q, Set.empty)).size.toDouble / bs(q).size)
      .sum / bs.size
    assert(recall >= 0.6, s"PQ recall collapsed: $recall")
    // fixed-point arithmetic end-to-end → identical across runs
    assert(pq.collect().toSeq == Similarity.pqTopK(spark, sf).collect().toSeq)
    pq.unpersist(); brute.unpersist()
  }

  test("IVF-PQ: cell-restricted ADC keeps structure and the subset bound") {
    import spark.implicits._
    val ivfpq = Similarity.ivfPqTopK(spark, sf).cache()
    val perQ = ivfpq.groupBy($"query_id").count().collect()
    assert(perQ.length == Similarity.NumQueries)
    assert(perQ.forall(_.getLong(1) <= Similarity.K))
    assert(ivfpq.filter($"query_id" === $"vec_id").count() == 0)
    val bruteBest = Similarity.bruteForceTopK(spark, sf)
      .filter($"rank" === 1).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("cos_sim")).toMap
    ivfpq.collect().foreach { r =>
      assert(r.getAs[Double]("cos_sim") <= bruteBest(r.getLong(0)) + 1e-12)
    }
    // ranks contiguous, cos non-increasing
    ivfpq.collect().groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length))
      val sims = sorted.map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    ivfpq.unpersist()
  }

  test("residual IVF-PQ: structure, subset bound, determinism") {
    import spark.implicits._
    val res = Similarity.ivfPqResTopK(spark, sf).cache()
    val perQ = res.groupBy($"query_id").count().collect()
    assert(perQ.length == Similarity.NumQueries)
    assert(perQ.forall(_.getLong(1) <= Similarity.K))
    assert(res.filter($"query_id" === $"vec_id").count() == 0)
    assert(res.filter($"adist" < 0).count() == 0)
    val bruteBest = Similarity.bruteForceTopK(spark, sf)
      .filter($"rank" === 1).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("cos_sim")).toMap
    res.collect().foreach { r =>
      assert(r.getAs[Double]("cos_sim") <= bruteBest(r.getLong(0)) + 1e-12)
    }
    // residual arithmetic is exact i64 end-to-end → runs are identical
    assert(res.collect().toSeq == Similarity.ivfPqResTopK(spark, sf).collect().toSeq)
    res.unpersist()
  }

  test("LSH top-k is a subset-quality approximation of brute force") {
    import spark.implicits._
    val brute = Similarity.bruteForceTopK(spark, sf)
      .filter($"rank" === 1).select($"query_id", $"cos_sim".as("best")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = Similarity.lshTopK(spark, sf)
      .filter($"rank" === 1).select($"query_id", $"cos_sim").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // approximate: each LSH best can't beat the true best
    lsh.foreach { case (q, c) => assert(c <= brute(q) + 1e-9) }
    assert(lsh.nonEmpty)
  }
}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("decode plumbing: schema, determinism, modality routing") {
    import spark.implicits._
    val feats = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(spark, sf)).cache()
    assert(feats.count() == 500)
    // only video gets multi-frame treatment
    assert(feats.filter($"modality" =!= "video" && $"n_frames" =!= 1).count() == 0)
    assert(feats.filter($"width" < 16 || $"width" >= 80).count() == 0)
    // deterministic fake decode: same input → same checksum
    val a = feats.select($"media_id", $"checksum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = Multimodal.decodeFeatures(Multimodal.mediaFromDocuments(spark, sf))
      .select($"media_id", $"checksum").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a == b)
    assert(feats.select($"feature").head().getSeq[Double](0).size
      == Multimodal.FakeCodec.FeatureDim)
    feats.unpersist()
  }

  test("ImageIoCodec: PNG encode→decode round trip reproduces the raster exactly") {
    import Multimodal.ImageIoCodec
    for (id <- Seq(0L, 1L, 7L, 63L, 255L, 256L, 1234L)) {
      val bytes = ImageIoCodec.renderPng(id)
      // a REAL PNG came out: 8-byte signature, not fake content
      assert(bytes.take(8).map(_ & 0xff).toSeq ==
        Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a), s"not a PNG for id=$id")
      val st = ImageIoCodec.decodeStats(id, bytes)
      // independent recompute of the closed-form stats (the same
      // arithmetic the DuckDB oracle runs)
      val (w, h) = (ImageIoCodec.imgW(id), ImageIoCodec.imgH(id))
      var (sr, sg, sb, mom) = (0L, 0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val r = ImageIoCodec.pxR(id, x, y); val g = ImageIoCodec.pxG(id, x, y)
        val b = ImageIoCodec.pxB(id, x, y)
        sr += r; sg += g; sb += b; mom += (x * 17L + y * 29L) * (r + g + b)
      }
      assert(st == ImageIoCodec.ImageStats(id, w, h, w.toLong * h, sr, sg, sb, mom),
        s"round-trip mismatch for id=$id")
    }
  }

  test("WavPcmCodec: JDK-encoded WAV parses back to the exact samples") {
    import Multimodal.WavPcmCodec
    for (id <- Seq(1L, 4L, 7L, 250L, 251L, 1000L, 99997L)) {
      val bytes = WavPcmCodec.renderWav(id)
      // a REAL RIFF/WAVE stream came out of the JDK encoder
      assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
        new String(bytes, 8, 4, "US-ASCII") == "WAVE", s"not a WAV for id=$id")
      val clip = WavPcmCodec.decode(bytes)
      assert(clip.sampleRate == WavPcmCodec.SampleRate && clip.channels == 1)
      val n = WavPcmCodec.nSamples(id)
      assert(clip.samples.length == n, s"sample count mismatch for id=$id")
      var i = 0
      while (i < n) {
        assert(clip.samples(i) == WavPcmCodec.sample(id, i),
          s"sample $i mismatch for id=$id")
        i += 1
      }
      // stats agree with an independent closed-form recompute (the same
      // arithmetic the DuckDB oracle runs)
      val st = WavPcmCodec.stats(id, clip)
      val ref = (0 until n).map(i => WavPcmCodec.sample(id, i).toInt)
      assert(st.sum_s == ref.map(_.toLong).sum && st.sum_abs == ref.map(s => math.abs(s).toLong).sum
        && st.max_s == ref.max && st.min_s == ref.min
        && st.n_neg == ref.count(_ < 0).toLong
        && st.idx_moment == ref.zipWithIndex.map { case (s, i) => i.toLong * s }.sum)
    }
  }

  test("WavPcmCodec: parser skips unknown chunks and honors RIFF word alignment") {
    import Multimodal.WavPcmCodec
    val base = WavPcmCodec.renderWav(7L)
    // splice an odd-sized LIST chunk (body 3 bytes + 1 pad) between the
    // RIFF header and the first real chunk — a correct parser skips it;
    // one that ignores the alignment rule desyncs and fails
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 9, 9, 9, 0)
    val spliced = new java.io.ByteArrayOutputStream
    spliced.write(base, 0, 12)
    spliced.write(extra)
    spliced.write(base, 12, base.length - 12)
    val clip = WavPcmCodec.decode(spliced.toByteArray)
    assert(clip.samples.sameElements(WavPcmCodec.decode(base).samples))
  }

  test("WavPcmCodec: non-WAV and non-PCM input fails loudly, not silently") {
    import Multimodal.WavPcmCodec
    intercept[IllegalArgumentException] { WavPcmCodec.decode(Array[Byte](1, 2, 3, 4)) }
    // flip wFormatTag to 3 (IEEE float) in a real stream → loud failure
    val b = WavPcmCodec.renderWav(1L)
    val fmtAt = { // locate the fmt chunk body
      var off = 12
      while (new String(b, off, 4, "US-ASCII") != "fmt ") off += 8 +
        ((b(off + 4) & 0xff) | ((b(off + 5) & 0xff) << 8)) // sizes here are small
      off + 8
    }
    val mutated = b.clone(); mutated(fmtAt) = 3
    val ex = intercept[IllegalArgumentException] { WavPcmCodec.decode(mutated) }
    assert(ex.getMessage.contains("PCM"))
    // corrupt chunk size 0xFFFFFFFF (negative as Int): must fail loudly,
    // not stall the chunk walk in place forever
    val corrupt = WavPcmCodec.renderWav(1L).clone()
    val szAt = 16 // first chunk's size field: RIFF preamble(12) + tag(4)
    for (j <- 0 until 4) corrupt(szAt + j) = 0xff.toByte
    val ex2 = intercept[IllegalArgumentException] { WavPcmCodec.decode(corrupt) }
    assert(ex2.getMessage.contains("corrupt chunk size"))
  }

  test("GifAnimCodec: JDK-encoded animated GIF decodes to the exact frames") {
    import Multimodal.GifAnimCodec
    for (id <- Seq(2L, 5L, 8L, 254L, 255L, 256L, 1001L)) {
      val bytes = GifAnimCodec.renderGif(id)
      // a REAL GIF came out: 6-byte signature
      assert(new String(bytes, 0, 6, "US-ASCII").startsWith("GIF8"),
        s"not a GIF for id=$id")
      val frames = GifAnimCodec.decodeFrames(id, bytes)
      val (w, h, n) = (GifAnimCodec.vidW(id), GifAnimCodec.vidH(id), GifAnimCodec.vidFrames(id))
      assert(frames.length == n, s"frame count mismatch for id=$id: ${frames.length} vs $n")
      frames.zipWithIndex.foreach { case (st, f) =>
        var (sv, mom) = (0L, 0L)
        for (y <- 0 until h; x <- 0 until w) {
          val v = GifAnimCodec.px(id, f, x, y)
          sv += v; mom += (x * 17L + y * 29L) * v
        }
        assert(st == GifAnimCodec.FrameStats(id, f, w, h, sv, mom),
          s"frame $f mismatch for id=$id: $st")
      }
    }
  }

  test("GifAnimCodec: non-GIF input fails loudly, not silently") {
    val png = Multimodal.ImageIoCodec.renderPng(7L)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.GifAnimCodec.decodeFrames(7L, png)
    }
    assert(ex.getMessage.contains("expected gif"))
    intercept[IllegalArgumentException] {
      Multimodal.GifAnimCodec.decodeFrames(7L, Array[Byte](1, 2, 3))
    }
  }

  test("ImageIoCodec: undecodable bytes fail loudly, not silently") {
    val ex = intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decodeStats(42L, Array[Byte](1, 2, 3, 4))
    }
    assert(ex.getMessage.contains("42"))
  }

  test("dedup stats: modality counts partition the catalog; dup mass matches a text recount") {
    import spark.implicits._
    val out = Multimodal.dedupStatsQuery(spark, sf).cache()
    val total = Tables(spark, sf, "documents").count()
    assert(out.agg(sum($"n_media")).head().getLong(0) == total)
    assert(out.filter($"dup_copies" < 0 || $"n_distinct" > $"n_media").count() == 0)
    // checksum-level dup mass equals text-level dup mass (the fake
    // codec's checksum is injective on this corpus — no collisions)
    val textDups = Tables(spark, sf, "documents")
      .groupBy(($"doc_id" % 3).as("m"), $"text").agg(count(lit(1)).as("c"))
      .groupBy($"m").agg(sum($"c" - 1).as("dups"))
      .agg(sum($"dups")).head().getLong(0)
    assert(out.agg(sum($"dup_copies")).head().getLong(0) == textDups)
    out.unpersist()
  }

  test("frame sampling stub strides correctly") {
    val f = Multimodal.MediaFeatures(1, "video", 100, 7, 16, 16, 7, Array(0.0))
    assert(Multimodal.FakeCodec.sampleFrames(f, 2) == Seq(0, 2, 4, 6))
  }

  test("dHash blocking == brute force (exact recall within the radius)") {
    import spark.implicits._
    // independent brute pass: hash every image (same decode path),
    // all-pairs Hamming, threshold — the blocking must reproduce it
    // EXACTLY (pigeonhole argument: radius 3 < 4 pieces)
    val ids = Tables(spark, sf, "documents")
      .filter($"doc_id" % 3 === 0).select($"doc_id").as[Long].collect().sorted
    val hs = ids.map { id =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(Multimodal.ImageIoCodec.renderPng(id)))
      id -> Multimodal.DHash.dhash56(img)
    }.toMap
    val brute = (for {
      i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
      a = ids(i); b = ids(j)
      hd = java.lang.Long.bitCount(hs(a) ^ hs(b))
      if hd <= Multimodal.DHash.Radius
    } yield (a, b, hd)).toSet
    val blocked = Multimodal.phashPairsQuery(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(brute.nonEmpty, "vacuous: no near-dup pairs in fixture")
    assert(blocked == brute,
      s"blocking diverged: ${(blocked diff brute).size} extra, ${(brute diff blocked).size} missing")
  }

  test("dHash is invariant to what it should be, sensitive to what it shouldn't") {
    // same closed-form image id → same hash (determinism through the
    // PNG encode→decode round trip); a one-pixel-region brightness
    // bump that flips one block comparison moves Hamming by a bounded
    // amount (perceptual locality), while id+1 (different gradient
    // wrap points) usually moves more
    val img7a = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.ImageIoCodec.renderPng(7L)))
    val img7b = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.ImageIoCodec.renderPng(7L)))
    assert(Multimodal.DHash.dhash56(img7a) == Multimodal.DHash.dhash56(img7b))
    // perceptual locality: darkening ONE 2x2 corner flips at most the
    // comparisons adjacent to the corner blocks (<= 4 bits of 56)
    val w = img7a.getWidth; val h = img7a.getHeight
    val dark = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      dark.setRGB(x, y, if (x < 2 && y < 2) 0 else img7a.getRGB(x, y))
    val hd = java.lang.Long.bitCount(
      Multimodal.DHash.dhash56(img7a) ^ Multimodal.DHash.dhash56(dark))
    assert(hd <= 4, s"corner edit moved $hd bits — dHash is not local")
  }

  test("audio chunking: full coverage, bounded chunks, only audio records") {
    import spark.implicits._
    val chunks = Multimodal.audioChunkQuery(spark, sf).cache()
    // every chunk is full-size except possibly the last per media
    assert(chunks.filter($"chunk_bytes" < 1 ||
      $"chunk_bytes" > Multimodal.AudioChunkBytes).count() == 0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"media_id")
    assert(chunks.select($"media_id", $"chunk_idx", $"chunk_bytes",
        max($"chunk_idx").over(w).as("last"))
      .filter($"chunk_idx" < $"last" &&
        $"chunk_bytes" =!= Multimodal.AudioChunkBytes).count() == 0)
    // chunk bytes reassemble to the full content length, per media
    val sums = chunks.groupBy($"media_id").agg(sum($"chunk_bytes").as("total"))
    val truth = Multimodal.mediaFromDocuments(spark, sf)
      .filter(_.modality == "audio").toDF()
      .select($"media_id", $"n_bytes")
    assert(sums.join(truth, "media_id").filter($"total" =!= $"n_bytes").count() == 0)
    assert(sums.count() == truth.count())
    chunks.unpersist()
  }
}
