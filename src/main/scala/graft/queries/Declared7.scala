package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-6 continuation of the declared capability inventory (SURVEY
  * §2.4): inverted-index construction, Markov transition mining,
  * fixed-point rolling anomaly detection, a mutual-kNN graph with
  * triangle counting over the embedding table, distribution-drift
  * scoring, ANN recall evaluation, and exact winsorized statistics.
  * Same authoring contract as [[Declared]]..[[Declared6]]: total ORDER
  * BY over a unique key set, exact integer arithmetic wherever a float
  * would make the result engine- or order-dependent, oracle SQL in
  * [[Oracle7]] interpolating the SAME Scala constants.
  */
object Declared7 {

  private type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- Q74
  /** Posting-list cap: only the first PostCap doc ids (ascending) are
    * materialized per term — the df stays exact over ALL docs. */
  val PostCap = 8

  /** Inverted-index construction: term → (exact document frequency,
    * capped posting list). The per-doc distinct-term set comes from the
    * codegen'd TermCounts kernel's keys (one map-side pass, no raw-token
    * explode), so the exchange carries (term, doc_id) pairs already
    * deduplicated within each document. df is a partial+final count;
    * the posting list is bounded BEFORE aggregation by a row_number
    * window that Spark executes as WindowGroupLimit (a size-PostCap
    * heap per term, never a full per-term sort buffer) — the reason a
    * stopword's posting row stays O(PostCap) at 100 TB instead of
    * becoming a multi-GB array. Both aggregates shuffle on `term`, so
    * the planner reuses one exchange. Postings serialize as a
    * comma-joined string (sorted ascending) — exact, and array-free for
    * the driver compare. */
  val q74: Q = (s, dir) => {
    import s.implicits._
    val pairs = Tables(s, dir, "documents")
      .select($"doc_id",
        explode(map_keys(graft.functions.TokenFunctions.term_counts($"text")))
          .as("term"))
    val df = pairs.groupBy($"term").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy($"term").orderBy($"doc_id")
    val post = pairs
      .withColumn("rn", row_number().over(w)).filter($"rn" <= PostCap)
      .groupBy($"term")
      .agg(array_join(
        transform(array_sort(collect_list($"doc_id")), _.cast("string")),
        ",").as("postings"))
    df.join(post, "term")
      .select($"term", $"df", $"postings")
      .orderBy($"term")
  }

  // ---------------------------------------------------------------- Q75
  /** Top next-states reported per from-state. */
  val TopNext = 3

  /** First-order Markov transition mining over each user's event
    * stream: the (from, to) adjacent-pair counts, then the TopNext most
    * frequent next-states per from-state. ONE shuffle moves event rows
    * (hash on user_id for the lead() window); everything after operates
    * on the |event_types|² transition matrix — dimension-sized, so the
    * rank window and final sort are free. Sequence order is the total
    * (ts, event_id) key, exact across engines. */
  val q75: Q = (s, dir) => {
    import s.implicits._
    val wSeq = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val trans = Tables(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"event_type".as("from_state"))
      .withColumn("to_state", lead($"from_state", 1).over(wSeq))
      .filter($"to_state".isNotNull)
      .groupBy($"from_state", $"to_state").agg(count(lit(1)).as("cnt"))
    val wRank = Window.partitionBy($"from_state")
      .orderBy($"cnt".desc, $"to_state")
    trans.withColumn("rnk", row_number().over(wRank))
      .filter($"rnk" <= TopNext)
      .select($"from_state", $"to_state", $"cnt", $"rnk")
      .orderBy($"from_state", $"rnk")
  }

  // ---------------------------------------------------------------- Q76
  /** Trailing-window length and the spike multiple: an event is
    * anomalous when value > AnomK × its user's trailing-AnomWin mean. */
  val AnomWin = 7
  val AnomK = 4

  /** Rolling anomaly detection in exact integer arithmetic: flag events
    * whose value exceeds AnomK× the trailing mean of the user's previous
    * AnomWin events. The comparison `cents·AnomWin > AnomK·Σcents`
    * clears the division, so no float ever enters the predicate —
    * bit-exact across engines and immune to sliding-sum rounding drift
    * (a float rolling sum computed incrementally subtracts old values
    * and accumulates error; integers don't). One hash exchange on
    * user_id; the ROWS frame is a streaming O(1)-per-row window. Events
    * without a full trailing window never fire (count = AnomWin guard)
    * — the cold-start rows are reported by no engine. */
  val q76: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(-AnomWin, -1)
    Tables(s, dir, "events")
      .select($"event_id", $"user_id", $"ts",
        floor($"value" * 100).cast("long").as("cents"))
      .withColumn("trail_sum", sum($"cents").over(w))
      .withColumn("trail_n", count(lit(1)).over(w))
      .filter($"trail_n" === AnomWin &&
        $"cents" * AnomWin > lit(AnomK) * $"trail_sum")
      .select($"event_id", $"user_id", $"cents", $"trail_sum")
      .orderBy($"event_id")
  }

  // ---------------------------------------------------------------- Q78
  /** Neighbors per node for the kNN pass, and the label slice the graph
    * is built over (mirrors the corpus-curation pattern: graph analysis
    * within one partition of a sharded embedding space). */
  val KnnK = 5
  val KnnLabel = 0

  /** Mutual-kNN graph + triangle counting over the embedding table:
    * each label-KnnLabel vector's KnnK nearest neighbors by cosine
    * (ties broken by vec_id), an undirected edge where the relation is
    * MUTUAL, then per-node degree and triangle membership — the
    * local-clustering signal used to find hub/outlier documents in an
    * embedded corpus. The kNN pass here is exact brute force within the
    * label slice (the slice is dimension-sized by construction); at
    * 100 TB the identical downstream graph runs off the LSH/IVF
    * candidate path ([[graft.sim.Similarity.lshTopK]]) — only the
    * candidate generator changes. Triangle counting enumerates each
    * triangle once via the a<b<c orientation (two equi-joins on the
    * dedup'd edge list — no wedge ever materializes twice), then
    * explodes the 3 corners for per-node counts. All-integer output. */
  val q78: Q = (s, dir) =>
    knnGraphBrute(Tables(s, dir, "embeddings").filter(col("label") === KnnLabel))

  /** q78's brute body over an ARBITRARY embeddings slice — the seam the
    * KnnCrossover tool uses to measure brute-vs-certificate at growing
    * slice sizes (the query itself always passes the KnnLabel slice). */
  private[graft] def knnGraphBrute(emb: DataFrame): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    import graft.functions.VectorFunctions.dot_product
    val e = emb
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot_product($"v", $"v")))
    val other = e.select($"vec_id".as("b_id"), $"v".as("bv"), $"norm".as("bnorm"))
    val wk = Window.partitionBy($"vec_id").orderBy($"cos_sim".desc, $"b_id")
    val knn = e.crossJoin(broadcast(other))
      .filter($"vec_id" =!= $"b_id")
      .select($"vec_id", $"b_id",
        (dot_product($"v", $"bv") / ($"norm" * $"bnorm")).as("cos_sim"))
      .withColumn("rn", row_number().over(wk)).filter($"rn" <= KnnK)
      .select($"vec_id".as("a"), $"b_id".as("b"))
    mutualKnnGraph(s, e.select($"vec_id"), knn)
  }

  /** Cell count / first-phase probe breadth for [[q78b]]. */
  val Q78Cells = 8
  val Q78NProbe = 2

  /** Certificate slack absorbing double rounding in the cone bound —
    * a cell is only skipped when its bound clears the threshold by
    * more than this, so FP noise can never exclude a true neighbor. */
  val Q78Eps = 1e-9

  /** [[q78]]'s mutual-kNN graph with the all-pairs nested loop replaced
    * by IVF candidate generation WITH AN EXACTNESS CERTIFICATE — the
    * 100 TB candidate path the r8/r9 verdicts asked for, wired so the
    * output is row-identical to [[q78]] BY CONSTRUCTION (not by tuned
    * probe breadth — on this corpus's unclustered synthetic vectors no
    * fixed nprobe short of all-cells covers every true neighbor; the
    * certificate prunes what it can PROVE and scans the rest):
    *
    *  1. cells: one-Lloyd-step fixed-point codebook over the label
    *     slice ([[graft.sim.KmeansQuantizer]], seeds = the Q78Cells
    *     lowest vec_ids); ONE n×k angular scoring pass then serves
    *     home assignment (nearest cell by cosine), probe selection
    *     and the bound's cos_ac.
    *  2. phase 1: each vector probes its Q78NProbe angularly nearest
    *     cells (equi-join on cell), exact double cosine over those
    *     candidates → provisional τ_a = KnnK-th best similarity.
    *  3. certificate: for an unprobed cell c with angular radius r_c
    *     (min member-to-centroid cosine cr_c), every member x obeys
    *     cos(a,x) ≤ cos(θ_ac − r_c) = cos_ac·cr_c + sin_ac·sr_c. Cells
    *     whose bound < τ_a − [[Q78Eps]] are SKIPPED — provably no
    *     top-KnnK neighbor inside; the rest are scanned (equi-join),
    *     phase-2 candidates re-ranked with phase 1 for the final exact
    *     top-KnnK. A vector with < KnnK phase-1 candidates gets τ_a =
    *     −2 (scan everything — certificate never lies, never assumes).
    *
    * Every candidate step is an equi-join on cell (no crossJoin except
    * the k-sized broadcast centroid scoring, the standard IVF
    * assignment shape); final cosines use the SAME expression as q78 →
    * identical doubles → identical rows, hash-checked under q78's
    * brute-force oracle. On clustered real-world corpora the bound
    * prunes most cells; on this synthetic corpus it mostly degenerates
    * to a scan — the honest behavior of an exact method on data with
    * no cluster structure. Downstream graph shared via
    * [[mutualKnnGraph]]. */
  val q78b: Q = (s, dir) =>
    knnGraphIvfAuto(Tables(s, dir, "embeddings").filter(col("label") === KnnLabel))

  /** [[knnGraphIvf]] with the M32 tuning finding baked in: cells ≈ √n
    * (floored at [[Q78Cells]]), from one cheap count() of the slice —
    * the knob setting that keeps BOTH the n×k scoring pass and the
    * per-cell candidate joins ~n^1.5 total work as the slice grows
    * (the fixed default 8 dies at n=20k via candidate-join explosion;
    * √n=141 finishes in 2.48 s — BASELINE M32). Output is UNCHANGED by
    * the knob — the certificate scans whatever it cannot prove
    * prunable — so the oracle hash is cell-count-independent and the
    * shipped q78b is now scale-safe by default rather than by
    * operator tuning. */
  private[graft] def knnGraphIvfAuto(emb: DataFrame,
                                     nprobe: Int = Q78NProbe): DataFrame = {
    val n = emb.count()
    val cells = math.max(Q78Cells, math.ceil(math.sqrt(n.toDouble)).toInt)
    knnGraphIvf(emb, cells, nprobe)
  }

  /** q78b's certificate body over an ARBITRARY embeddings slice with
    * tunable cell count / probe breadth — the KnnCrossover seam (the
    * query itself always passes the KnnLabel slice with the pinned
    * [[Q78Cells]]/[[Q78NProbe]]; exactness is INDEPENDENT of both knobs
    * — the certificate scans whatever it cannot prove prunable). */
  private[graft] def knnGraphIvf(emb: DataFrame,
                                 cells: Int = Q78Cells,
                                 nprobe: Int = Q78NProbe): DataFrame = {
    val s = emb.sparkSession
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    import graft.functions.VectorFunctions.dot_product
    import graft.sim.KmeansQuantizer
    val e = emb.select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot_product($"v", $"v")))
    val q = KmeansQuantizer.quantized(emb)
    // seeds: the Q78Cells smallest vec_ids in the slice (a k-sized,
    // deterministic driver pull — k·d ints, broadcast-scale by
    // construction; the slice's ids are arbitrary so a `vec_id < k`
    // filter can't seed here)
    val seedRows = q.orderBy($"vec_id").limit(cells)
      .select($"qv").collect().map(_.getSeq[Long](0))
    val seeds = s.createDataFrame(
      seedRows.zipWithIndex.toIndexedSeq.map { case (cv, i) => (i, cv) })
      .toDF("cid", "cv")
    val cb = KmeansQuantizer.cellVectors(
      KmeansQuantizer.lloydCells(KmeansQuantizer.assign(q, seeds)))
    // centroids back in double space, unit-normalized for angle math
    val cellsD = cb.select($"cid".as("cell"),
        transform($"cv", x => x.cast("double") / lit(KmeansQuantizer.Scale.toDouble)).as("cvd"))
      .withColumn("cnorm", sqrt(dot_product($"cvd", $"cvd")))
    // ONE n×k angular scoring pass serves home assignment (prn=1),
    // probe selection (prn ≤ Q78NProbe) AND the bound's cos_ac — the
    // certificate is valid for ANY membership partition, so home
    // doesn't need the trainer's int-L2 argmin (which would cost a
    // second n×k pass + window exchange); the int arithmetic stays
    // where determinism buys something: the codebook itself. Cached:
    // consumed by home, probes, and phase 2. `ac` and `p1` are NOT
    // unpersisted: the query returns a lazy plan that still references
    // both caches — unpersisting here (before the caller acts on the
    // plan) would evict the blocks the plan exists to reuse. The blocks
    // are MEMORY_AND_DISK and slice-sized (|KnnLabel slice| × k scores /
    // candidate pairs), so across a 137-query run they age out via LRU;
    // a long-lived service embedding this query should wrap it in
    // materialize-then-unpersist at the call site.
    val ac = e.crossJoin(broadcast(cellsD))
      .select($"vec_id".as("a_id"), $"cell",
        (dot_product($"v", $"cvd") / ($"norm" * $"cnorm")).as("cos_ac"))
      .withColumn("prn", row_number().over(
        Window.partitionBy($"a_id").orderBy($"cos_ac".desc, $"cell")))
      .cache()
    val home = ac.filter($"prn" === 1).select($"a_id".as("vec_id"), $"cell")
    // angular radius per cell: cr = min member cosine to own centroid
    // (cos_vc IS the home row's cos_ac — no rescoring)
    val cellStats = ac.filter($"prn" === 1)
      .groupBy($"cell").agg(min($"cos_ac").as("cr"))
      .withColumn("sr", sqrt(greatest(lit(0.0), lit(1.0) - $"cr" * $"cr")))
    val members = e.join(home, "vec_id")
    val eA = e.select($"vec_id".as("a_id"), $"v".as("av"), $"norm".as("anorm"))
    val eB = members.select($"vec_id".as("b_id"), $"v".as("bv"),
      $"norm".as("bnorm"), $"cell")
    def scored(cand: DataFrame): DataFrame = cand
      .join(eA, "a_id")
      .join(eB, Seq("b_id", "cell"))
      .filter($"a_id" =!= $"b_id")
      .select($"a_id", $"b_id",
        (dot_product($"av", $"bv") / ($"anorm" * $"bnorm")).as("cos_sim"))
    // phase 1: nearest-cell candidates → provisional τ_a
    val p1 = scored(
      ac.filter($"prn" <= nprobe).select($"a_id", $"cell")
        .join(eB.select($"b_id", $"cell"), "cell")
        .select($"a_id", $"b_id", $"cell")).cache()
    val wk = Window.partitionBy($"a_id").orderBy($"cos_sim".desc, $"b_id")
    val tau = p1.withColumn("rn", row_number().over(wk))
      .groupBy($"a_id")
      .agg(max(when($"rn" === KnnK, $"cos_sim")).as("tau"))
      .select($"a_id", coalesce($"tau", lit(-2.0)).as("tau"))
    // phase 2: unprobed cells that survive the cone bound. The tau join
    // is LEFT + coalesce(-2): a vector whose probe cells held no other
    // vector has NO phase-1 rows and so no tau row — an inner join
    // would silently drop its phase-2 scan and lose its true edges
    // (singleton-cell shape; doesn't occur in this corpus, must not
    // depend on that)
    val p2 = scored(
      ac.filter($"prn" > nprobe)
        .join(tau, Seq("a_id"), "left")
        .join(broadcast(cellStats), "cell")
        .filter(
          when($"cos_ac" >= $"cr", lit(1.0))
            .otherwise($"cos_ac" * $"cr" +
              sqrt(greatest(lit(0.0), lit(1.0) - $"cos_ac" * $"cos_ac")) * $"sr")
            >= coalesce($"tau", lit(-2.0)) - Q78Eps)
        .select($"a_id", $"cell")
        .join(eB.select($"b_id", $"cell"), "cell")
        .select($"a_id", $"b_id", $"cell"))
    val knn = p1.union(p2)
      .withColumn("rn", row_number().over(wk)).filter($"rn" <= KnnK)
      .select($"a_id".as("a"), $"b_id".as("b"))
    mutualKnnGraph(s, e.select($"vec_id"), knn)
  }

  /** Shared graph tail for q78/q78b: directed kNN edges (a, b) →
    * mutual-edge filter → per-node degree + triangle counts over every
    * node of `nodes` (vec_id). Triangle counting enumerates each
    * triangle once via the a<b<c orientation (two equi-joins on the
    * dedup'd edge list — no wedge ever materializes twice), then
    * explodes the 3 corners for per-node counts. All-integer output. */
  private def mutualKnnGraph(s: SparkSession, nodes: DataFrame,
                             knn: DataFrame): DataFrame = {
    import s.implicits._
    val rev = knn.select($"b".as("a"), $"a".as("b"))
    val mutual = knn.intersect(rev).filter($"a" < $"b")
    val deg = mutual.select($"a".as("nid"))
      .union(mutual.select($"b".as("nid")))
      .groupBy($"nid").agg(count(lit(1)).as("deg"))
    val e1 = mutual
    val e2 = mutual.select($"a".as("b"), $"b".as("c"))
    val e3 = mutual.select($"a".as("ta"), $"b".as("c"))
    val tris = e1.join(e2, "b")
      .join(e3, e1("a") === e3("ta") && e2("c") === e3("c"))
      .select($"a", $"b", e2("c").as("c"))
    val triPerNode = tris
      .select(explode(array($"a", $"b", $"c")).as("nid"))
      .groupBy($"nid").agg(count(lit(1)).as("tri_cnt"))
    nodes
      .join(deg, nodes("vec_id") === deg("nid"), "left")
      .drop("nid")
      .join(triPerNode, nodes("vec_id") === triPerNode("nid"), "left")
      .select($"vec_id",
        coalesce($"deg", lit(0L)).as("deg"),
        coalesce($"tri_cnt", lit(0L)).as("tri_cnt"))
      .orderBy($"vec_id")
  }

  // ---------------------------------------------------------------- Q79
  /** Distribution-drift scoring between the eval slice (source = src0,
    * the same slice q56's contamination check quarantines) and the rest
    * of the corpus: per-language counts on both sides plus the exact
    * cross-product L1 drift numerator |cntA·totB − cntB·totA| — the
    * integer-exact core of a PSI/chi-square drift monitor (the
    * normalized statistic is drift_num / (totA·totB); the division is
    * left to the consumer so the stored value stays exact). ONE scan,
    * ONE dimension-keyed exchange: both slices aggregate in the same
    * conditional-count pass, totals ride a broadcast 1-row join. At
    * petabyte counts the product needs DECIMAL(38) headroom — noted
    * here because cnt·tot overflows int64 once both sides exceed ~3×10⁹
    * rows. */
  val q79: Q = (s, dir) => {
    import s.implicits._
    val g = Tables(s, dir, "documents")
      .groupBy($"lang")
      .agg(count(when($"source" === "src0", 1)).as("cnt_eval"),
        count(when($"source" =!= "src0", 1)).as("cnt_rest"))
    val tot = g.agg(sum($"cnt_eval").as("tot_eval"),
      sum($"cnt_rest").as("tot_rest"))
    g.crossJoin(broadcast(tot))
      .select($"lang", $"cnt_eval", $"cnt_rest",
        abs($"cnt_eval" * $"tot_rest" - $"cnt_rest" * $"tot_eval")
          .as("drift_num"))
      .orderBy($"lang")
  }

  // ---------------------------------------------------------------- Q80
  /** ANN recall evaluation: recall@K of the LSH multi-probe path
    * against the exact brute-force ranking, per query — the quality
    * gate every approximate index needs before it replaces the exact
    * scan in production. Composes the two existing formulations
    * ([[graft.sim.Similarity.bruteForceTopK]] / lshTopK) and counts the
    * per-query intersection; hits/K is the recall (kept as exact
    * integers). Queries the LSH path misses entirely still report
    * (hits = 0) via the left join from the brute-force side. */
  val q80: Q = (s, dir) => {
    import s.implicits._
    val brute = graft.sim.Similarity.bruteForceTopK(s, dir)
      .select($"query_id", $"vec_id")
    val lsh = graft.sim.Similarity.lshTopK(s, dir)
      .select($"query_id", $"vec_id")
    val hits = brute.join(lsh, Seq("query_id", "vec_id"))
      .groupBy($"query_id").agg(count(lit(1)).as("hits"))
    brute.select($"query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select($"query_id",
        coalesce($"hits", lit(0L)).as("hits"),
        lit(graft.sim.Similarity.K.toLong).as("k"))
      .orderBy($"query_id")
  }

  // ---------------------------------------------------------------- Q81
  /** Winsorization bounds as order-statistic ranks: lo = the value at
    * rank ⌈n·WinsLoPct/100⌉, hi = at rank ⌈n·WinsHiPct/100⌉ — defined
    * by integer rank arithmetic (no interpolating percentile), so both
    * engines pick the IDENTICAL element. */
  val WinsLoPct = 5
  val WinsHiPct = 95

  /** Winsorized robust statistics per event_type: clamp each value to
    * the exact [p05, p95] order statistics of its group, then aggregate
    * the clamped cents — the outlier-robust mean/sum used to stop a
    * corrupt feed from dragging per-segment metrics. Money in integer
    * cents throughout. The rank window needs a per-group total order —
    * at this shape event_type is a 5-value partition key, so the 100 TB
    * formulation is q60b's range-partitioned rank (chunk offsets
    * composed over a range-partitioned total sort) feeding the same
    * rank→bound→clamp algebra; the bounds join is always a broadcast
    * (|event_types| rows). */
  val q81: Q = (s, dir) => {
    import s.implicits._
    val c = Tables(s, dir, "events")
      .select($"event_type", $"event_id",
        floor($"value" * 100).cast("long").as("cents"))
    val wRank = Window.partitionBy($"event_type").orderBy($"cents", $"event_id")
    val wAll = Window.partitionBy($"event_type")
    val ranked = c.withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wAll))
    // Column./ is float division in Spark — exact integer ceil via `div`
    val boundsExact = ranked.groupBy($"event_type").agg(
      max(when($"rn" === expr(s"(n * $WinsLoPct + 99) div 100"), $"cents")).as("lo"),
      max(when($"rn" === expr(s"(n * $WinsHiPct + 99) div 100"), $"cents")).as("hi"))
    c.join(broadcast(boundsExact), "event_type")
      .groupBy($"event_type").agg(
        count(lit(1)).as("n_events"),
        sum(least(greatest($"cents", $"lo"), $"hi")).as("wsum"),
        sum(when($"cents" < $"lo" || $"cents" > $"hi", 1L).otherwise(0L))
          .as("n_clamped"),
        max($"lo").as("lo"),
        max($"hi").as("hi"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- Q77
  /** Merge iterations, and the vocabulary cap the histogram is trained
    * over (top-BpeVocabCap words by (count desc, word) — a no-op at
    * test scale, but the bound that keeps the training set
    * dimension-sized at 100 TB, per the q62 top-k-vocab pattern). */
  val BpeIters = 4
  val BpeVocabCap = 10000

  /** Greedy left-to-right single-pair merge: adjacent (l, r) become one
    * symbol, non-overlapping, earliest-first — the classic BPE apply
    * step (Sennrich et al. 2016). Mirrored in the oracle by run-parity
    * position algebra over matched pair positions. */
  private[graft] def bpeApplyMerge(
      syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** BPE tokenizer training (the first BpeIters pair merges): the
    * corpus collapses to a word histogram in ONE shuffle (per-doc
    * TermCounts kernel → map-side combine → top-BpeVocabCap words);
    * every training iteration then runs on the vocabulary-sized
    * histogram — weighted adjacent-pair counts, argmax with the
    * (count desc, lhs, rhs) tie-break, greedy merge applied to the
    * symbol sequences. The driver pulls exactly ONE row per iteration
    * (the winning pair — q63's dimension-sized control-flow pattern);
    * the corpus is never touched again after the histogram. This is
    * the fastBPE/histogram shape, not the naive corpus-rescan: at
    * 100 TB the pair-count pass costs O(vocab · avg word length) per
    * iteration, independent of corpus size. Bit-exact across engines
    * (integer counts, lexicographic ties); oracle unrolls the
    * iterations mechanically from the same constants. */
  val q77: Q = (s, dir) => q77Over(Tables(s, dir, "documents"))

  /** The ONE corpus pass: term counting → capped word-frequency
    * histogram with each word split to symbols. Everything after this
    * runs on the (cached) vocabulary — PlanAuditSpec pins that the
    * iteration plans below read InMemoryTableScan and never rescan the
    * corpus. */
  private[graft] def bpeVocab0(documents: DataFrame,
      vocabCap: Int = BpeVocabCap): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    documents
      .select(explode(graft.functions.TokenFunctions.term_counts($"text"))
        .as(Seq("word", "c")))
      .groupBy($"word").agg(sum($"c").as("cnt"))
      .orderBy($"cnt".desc, $"word").limit(vocabCap)
      .select($"word", $"cnt",
        filter(split($"word", ""), x => length(x) > 0).as("syms"))
  }

  /** Spark string ordering is UTF-8 BYTE order (UTF8String binary
    * compare) — NOT Java's UTF-16 code-unit order (they disagree when a
    * corpus mixes non-BMP codepoints with U+E000..U+FFFF). The driver-
    * side argmax tie-break below must match the engine's order exactly,
    * or a tied merge round could pick a different pair than the r19
    * distributed `orderBy($"l", $"r")` did. */
  private[graft] def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** Testable seam (the minhashPortableOver pattern): BPE training over
    * any frame with a `text` column. */
  /** Shared BPE training loop (q77 training output / q89 encode): runs
    * the greedy merge rounds and returns the merge list plus the final
    * per-word symbol table.
    *
    * r20 shape: the ONLY corpus-sized work is [[bpeVocab0]]'s histogram
    * pass; everything after operates on the vocab-capped (≤
    * [[BpeVocabCap]] rows, corpus-INDEPENDENT) histogram — the same
    * bound under which q89 already collected the final table to the
    * driver. So the table is collected once and the greedy rounds run
    * locally: the r19 loop paid ~3 Spark jobs per round (pair-count
    * agg + argmax collect + re-cache materialization) to do arithmetic
    * on ≤10k small rows (opt guide §1.2/§5 — dimension-bounded driver
    * work; the 374-Exchange q73 lesson). Semantics are identical:
    * weighted adjacent-pair counts (exact i64), argmax by (total DESC,
    * l, r) with the engine's UTF-8 string order ([[utf8Lt]]), merges
    * applied by the same [[bpeApplyMerge]]. */
  private def bpeTrainLoop(documents: DataFrame,
      vocabCap: Int = BpeVocabCap)
      : (Seq[(Int, String, String, Long)], Seq[(String, Seq[String])]) = {
    var vocab: Array[(String, Long, IndexedSeq[String])] =
      bpeVocab0(documents, vocabCap).select("word", "cnt", "syms").collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getSeq[String](2).toIndexedSeq))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var it = 1
    var exhausted = false
    while (it <= BpeIters && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (_, cnt, syms) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + cnt)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (bl, br, bt) = counts.iterator.foldLeft(("", "", Long.MinValue)) {
          case (acc @ (al, ar, at), ((l, r), t)) =>
            if (t > at || (t == at && (utf8Lt(l, al) ||
              (l == al && utf8Lt(r, ar))))) (l, r, t) else acc
        }
        vocab = vocab.map { case (w, cnt, syms) =>
          (w, cnt, bpeApplyMerge(syms, bl, br).toIndexedSeq)
        }
        merges += ((it, bl, br, bt))
        it += 1
      }
    }
    (merges.toSeq, vocab.map(v => (v._1, v._3: Seq[String])).toSeq)
  }

  def q77Over(documents: DataFrame): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val (merges, _) = bpeTrainLoop(documents)
    s.createDataFrame(merges).toDF("iter", "lhs", "rhs", "total")
      .orderBy($"iter")
  }

  /** Q89: BPE ENCODE — apply the q77-trained tokenizer to the corpus,
    * the tokenize step a real pipeline runs between training (q77) and
    * context-window packing (q57). The trained symbol table is
    * vocabulary-capped (≤ BpeVocabCap rows — a dimension-sized driver
    * pull by design, same as the training loop's per-round argmax), so
    * the apply is a BROADCAST left join from the exploded word stream:
    * vocabulary hits take their learned symbol sequence, OOV words fall
    * back to character splitting (exactly how the vocab cap defines
    * coverage). Per doc: word/token/OOV counts plus an ORDER-SENSITIVE
    * token-stream fingerprint — the word-level polynomial hash of the
    * space-joined symbols, folded across the document in word order —
    * so a wrong merge, wrong fallback, or wrong word order cannot
    * hash-match. The fold is bounded per document (collect_list within
    * one doc's words); the corpus-scale work is one explode + one
    * broadcast join + one doc-keyed aggregate.
    *
    * Text semantics are Unicode-general and TESTED, not assumed (the
    * r10 ASCII precondition is retired): words split on the portable
    * [ \t\n\r]+ class ([[graft.functions.Signatures.TokenSepRegex]]),
    * the character fold is codepoint-wise in both engines (split('')
    * yields codepoints, ascii() returns the full codepoint — non-BMP
    * included, so surrogate halves never fold), and `length` counts
    * codepoints. The whole train+encode chain is hash-checked over the
    * multi-script [[graft.text.UnicodeFixture]] as text_unicode_bpe. */
  def q89Over(documents: DataFrame,
      vocabCap: Int = BpeVocabCap): DataFrame = {
    val s = documents.sparkSession
    import s.implicits._
    val (_, vtable) = bpeTrainLoop(documents, vocabCap)
    val vdf = broadcast(s.createDataFrame(vtable.map { case (w, sy) =>
      (w, sy.mkString(" "), sy.length) }).toDF("word", "tok_str", "n_tok"))
    // portable polynomial hash over the character stream (the
    // text_fingerprint recurrence; spaces fold in as ascii 32)
    def poly(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      aggregate(
        transform(filter(split(c, ""), ch => ch =!= ""),
          ch => ascii(ch).cast("bigint")),
        lit(0L), (a, b) => (a * 31 + b) % 1000000007L)
    val words = documents
      .select($"doc_id",
        posexplode(filter(split($"text", graft.functions.Signatures.TokenSepRegex), x => x =!= ""))
          .as(Seq("pos", "word")))
    words.join(vdf, Seq("word"), "left")
      .select($"doc_id", $"pos",
        $"tok_str".isNull.cast("int").as("oov"),
        coalesce($"n_tok", length($"word")).cast("int").as("n_tok"),
        coalesce($"tok_str",
          concat_ws(" ", filter(split($"word", ""), ch => ch =!= "")))
          .as("tok_str"))
      .withColumn("word_fp", poly($"tok_str"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"),
        sum($"n_tok").cast("bigint").as("n_tokens"),
        sum($"oov").cast("bigint").as("n_oov"),
        sort_array(collect_list(struct($"pos", $"word_fp"))).as("wl"))
      .withColumn("doc_fp",
        expr("aggregate(wl, CAST(0 AS BIGINT), " +
          "(h, x) -> (h * 1000003 + x.word_fp) % 1000000007)"))
      .select($"doc_id", $"n_words", $"n_tokens", $"n_oov", $"doc_fp")
      .orderBy($"doc_id")
  }

  val q89: Q = (s, dir) => q89Over(Tables(s, dir, "documents"))

  // ---------------------------------------------------------------- Q82
  /** Last-touch attribution: every purchase event credits the user's
    * most recent PRECEDING non-purchase event type (the classic
    * marketing-attribution fold). The carry is `last(..., ignoreNulls)`
    * over an unbounded-preceding ROWS frame — the same running-state
    * window as q39's LOCF, O(1) per row, ONE user_id exchange, no
    * self-join (a join formulation would re-shuffle the stream per
    * purchase). Purchases with no prior touch report as '(none)'.
    * Money in exact cents; the (ts, event_id) total order makes the
    * carried value engine-exact. */
  val q82: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables(s, dir, "events")
      .select($"event_id", $"user_id", $"event_type", $"ts",
        floor($"value" * 100).cast("long").as("cents"))
      .withColumn("attr_type",
        last(when($"event_type" =!= "purchase", $"event_type"), ignoreNulls = true)
          .over(w))
      .filter($"event_type" === "purchase")
      .groupBy(coalesce($"attr_type", lit("(none)")).as("attributed_type"))
      .agg(count(lit(1)).as("n_purchases"),
        sum($"cents").as("attributed_cents"))
      .orderBy($"attributed_type")
  }

  // ---------------------------------------------------------------- Q84
  /** Epoch for day indexing — the corpus's first event date, shared by
    * q84/q85 and their oracles. */
  val CohortEpoch = "2024-01-01"

  /** Cohort retention analysis: users cohorted by first-active day,
    * then per (cohort_day, day_offset) active-user counts with the
    * cohort size attached — the classic retention triangle. Row-scale
    * plan: the per-user first-day aggregate exchanges on user_id; the
    * per-(user, day) dedup exchanges on its own (user_id, day) compound
    * key and re-exchanges on user_id for the join — both map-side
    * partial-aggregate first, so what crosses the network is the
    * deduplicated (user, day) set, not raw events. The final aggregate
    * and the cohort-size join are (cohort × offset)-dimension-sized,
    * with the cohort sizes broadcast. (user_id, day) is distinct by
    * construction before the final count, so n_active is a plain count
    * — no count-distinct expand. */
  val q84: Q = (s, dir) => {
    import s.implicits._
    val d = Tables(s, dir, "events")
      .select($"user_id",
        datediff(to_date($"ts"), to_date(lit(CohortEpoch))).cast("long").as("day"))
    val c = d.groupBy($"user_id").agg(min($"day").as("cohort_day"))
    val ret = d.distinct().join(c, "user_id")
      .groupBy($"cohort_day", ($"day" - $"cohort_day").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
    val cs = c.groupBy($"cohort_day").agg(count(lit(1)).as("cohort_n"))
    ret.join(broadcast(cs), "cohort_day")
      .select($"cohort_day", $"day_offset", $"n_active", $"cohort_n")
      .orderBy($"cohort_day", $"day_offset")
  }

  // ---------------------------------------------------------------- Q85
  /** Group-wise least squares: per event_type, the OLS slope/intercept
    * of value (exact cents) against the day index, reported as EXACT
    * integer rationals — slope = slope_num/slope_den, intercept =
    * intercept_num/slope_den — so no float division ever happens
    * in-engine and the result hash-checks bit-exactly. One partial+final
    * aggregate pass computes (n, Σx, Σy, Σxy, Σx²); the closed forms
    * are dimension-sized arithmetic on top. int64 headroom: |n·Σxy| ~
    * 5×10¹⁷ at sf0.1; beyond ~10× that, the sums need DECIMAL(38) (the
    * q79 note applies). */
  val q85: Q = (s, dir) => {
    import s.implicits._
    val p = Tables(s, dir, "events")
      .select($"event_type",
        datediff(to_date($"ts"), to_date(lit(CohortEpoch))).cast("long").as("x"),
        floor($"value" * 100).cast("long").as("y"))
    p.groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"), sum($"y").as("sy"),
        sum($"x" * $"y").as("sxy"), sum($"x" * $"x").as("sxx"))
      .select($"event_type", $"n",
        ($"n" * $"sxy" - $"sx" * $"sy").as("slope_num"),
        ($"n" * $"sxx" - $"sx" * $"sx").as("slope_den"),
        ($"sy" * $"sxx" - $"sx" * $"sxy").as("intercept_num"))
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- Q86
  /** Minimum pair support reported by the market-basket pass. */
  val PairMinSup = 2

  /** Market-basket frequent pairs: part pairs co-occurring in ≥
    * PairMinSup orders — the support-counting core of Apriori/FP-growth.
    * ONE exchange moves the (orderkey, partkey) projection; each
    * order's distinct part set collects map-side (per-group state is
    * bounded by basket size, NOT corpus size). Pair fan-out is SPLIT
    * per first element and SALTED across the cluster (r20 verdict #4 /
    * opt guide §2.5): each basket emits one (part_a, tail-after-a) row
    * — |basket| rows, not C(|basket|, 2) — and the part_a-keyed
    * exchange spreads a pathological basket's pair generation over the
    * whole cluster instead of materializing its full C(n, 2) set in
    * the single task that aggregated it. The explode after the
    * exchange is per-row bounded by basket size; the (a, b) support
    * count reuses the part_a partitioning (hash(part_a) clusters
    * (a, b) too — no further exchange). The pair set is identical to
    * the r20 closure-UDF generator (sorted distinct ids, i<j pairs),
    * now as codegen sort_array/slice/explode (guide §4). No self-join:
    * the join formulation re-shuffles the projection twice. Oracle is
    * the independent self-join text. */
  val q86: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "lineitem")
      .groupBy($"l_orderkey")
      .agg(sort_array(collect_set($"l_partkey")).as("parts"))
      .select($"parts", posexplode($"parts").as(Seq("i", "part_a")))
      .select($"part_a", slice($"parts", $"i" + 2, size($"parts")).as("tail"))
      .filter(size($"tail") > 0)
      .repartition($"part_a")
      .select($"part_a", explode($"tail").as("part_b"))
      .groupBy($"part_a", $"part_b")
      .agg(count(lit(1)).as("support"))
      .filter($"support" >= PairMinSup)
      .orderBy($"part_a", $"part_b")
  }

  // ---------------------------------------------------------------- Q87
  /** Upper bound for the price-outlier constraint. */
  val QualityPriceCap = 450000

  /** Data-quality constraint report (the Deequ-style validation pass a
    * curation pipeline runs before accepting a snapshot): one row per
    * (target, check) with exact violation and checked counts.
    * Column-local constraints — completeness, uniqueness, range,
    * domain — compute in ONE conditional-aggregate pass over the table
    * (partial+final, no per-constraint rescan) and unpivot to report
    * rows via stack(); referential-integrity checks are key-keyed
    * left joins counting unmatched rows in the same single pass as
    * their row count. Every number is an exact integer; zero-violation
    * rows are part of the contract (the report proves the check RAN). */
  val q87: Q = (s, dir) => {
    import s.implicits._
    val prof = Tables(s, dir, "orders").agg(
      count(lit(1)).as("checked"),
      sum(when($"o_custkey".isNull, 1L).otherwise(0L)).as("null_custkey"),
      (count(lit(1)) - countDistinct($"o_orderkey")).as("dup_orderkey"),
      sum(when($"o_totalprice" < 0, 1L).otherwise(0L)).as("neg_price"),
      sum(when($"o_totalprice" > QualityPriceCap, 1L).otherwise(0L)).as("outlier_price"),
      sum(when(!$"o_orderstatus".isin("F", "O", "P"), 1L).otherwise(0L)).as("bad_status"))
      .selectExpr(s"""stack(5,
        'orders.o_custkey', 'not_null', null_custkey, checked,
        'orders.o_orderkey', 'unique', dup_orderkey, checked,
        'orders.o_totalprice', 'non_negative', neg_price, checked,
        'orders.o_totalprice', 'upper_bound_$QualityPriceCap', outlier_price, checked,
        'orders.o_orderstatus', 'domain_FOP', bad_status, checked
        ) AS (target, check_name, violations, checked)""")
    def fk(fact: DataFrame, factKey: String, dim: DataFrame, dimKey: String,
           target: String): DataFrame = {
      import org.apache.spark.sql.functions.{col => c}
      fact.select(c(factKey))
        .join(dim.select(c(dimKey)).distinct(), c(factKey) === c(dimKey), "left")
        .agg(count(lit(1)).as("checked"),
          sum(when(c(dimKey).isNull, 1L).otherwise(0L)).as("violations"))
        .select(lit(target).as("target"), lit(s"fk_$dimKey").as("check_name"),
          $"violations", $"checked")
    }
    val li = fk(Tables(s, dir, "lineitem"), "l_orderkey",
      Tables(s, dir, "orders"), "o_orderkey", "lineitem.l_orderkey")
    val cu = fk(Tables(s, dir, "orders"), "o_custkey",
      Tables(s, dir, "customer"), "c_custkey", "orders.o_custkey")
    prof.union(li).union(cu).orderBy($"target", $"check_name")
  }

  // --------------------------------------------------------------- Q21c
  /** The q21 as-of join routed through the CUSTOM whole-operator plan
    * ([[graft.plans.AsOfMergeJoinExec]] — LogicalPlan + SparkStrategy +
    * physical co-partitioned merge, SURVEY §4.3 preference (c)) instead
    * of the union+window composition. Same rows by contract — it shares
    * q21's oracle text verbatim, so the equality is DRIVER-hash-checked
    * at scale, and Declared7Spec additionally asserts row identity
    * against the composed formulation plus the executed plan shape
    * (AsOfMergeJoin node, one exchange per side, local sorts only). */
  val q21c: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"value").as("purchase_value"))
    graft.plans.AsOfMergeJoin.asOf(clicks, purchases, "user_id", "ts",
      Seq("purchase_value"))
      .select($"event_id", $"user_id", $"ts".as("click_ts"),
        $"asof_purchase_value")
      .orderBy($"event_id")
  }

  // ---------------------------------------------------------------- Q88
  /** Picks returned by the MMR pass (λ is written as the literal 0.5 in
    * both engines' arithmetic). */
  val MmrK = 5

  /** Maximal-Marginal-Relevance diverse top-k (Carbonell & Goldstein
    * 1998) over the label-KnnLabel embedding slice: greedily pick the
    * candidate maximizing `rel − 0.5·max_sim_to_selected` — the diverse
    * subset selection a training-data pipeline runs so near-identical
    * documents don't all make the sample. The query vector is the
    * slice's min-vec_id row. Greedy selection is inherently sequential
    * in k: each round is ONE distributed pass (relevance cached from a
    * single pass; the penalty term is a `greatest` over ≤ k dot products
    * against BROADCAST selected vectors — never a shuffle) and the
    * driver pulls exactly one argmax row (q63/q77's dimension-sized
    * control flow). Bit-exact across engines: every cosine is the same
    * left-to-right double accumulation the sim oracles rely on, and
    * max/greatest over the same value set is order-independent. */
  val q88: Q = (s, dir) => {
    import s.implicits._
    graft.functions.VectorFunctions.register(s)
    import graft.functions.VectorFunctions.dot_product
    val e = Tables(s, dir, "embeddings")
      .filter($"label" === KnnLabel)
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("norm", sqrt(dot_product($"v", $"v")))
    // degrade gracefully on an empty slice (q77's exhaustion precedent):
    // no query vector → no picks, not an ArrayIndexOutOfBounds
    val qRowOpt = e.orderBy($"vec_id").limit(1).collect().headOption
    qRowOpt match {
      case None =>
        s.createDataFrame(Seq.empty[(Int, Long, Double)])
          .toDF("rank", "vec_id", "score")
      case Some(qRow) =>
    val (qid, qv, qn) =
      (qRow.getLong(0), qRow.getSeq[Double](1), qRow.getDouble(2))
    val c = e.filter($"vec_id" =!= qid)
      .withColumn("rel",
        dot_product($"v", typedlit(qv)) / ($"norm" * lit(qn)))
      .cache()
    var selected = Vector.empty[(Long, Seq[Double], Double)]
    val picks = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double)]
    var i = 1
    var done = false
    while (i <= MmrK && !done) {
      val scored =
        if (selected.isEmpty) c.withColumn("score", $"rel")
        else {
          val pens = selected.map { case (_, sv, sn) =>
            dot_product($"v", typedlit(sv)) / ($"norm" * lit(sn)) }
          c.filter(!$"vec_id".isin(selected.map(_._1): _*))
            .withColumn("score", $"rel" - lit(0.5) * pens.reduce(greatest(_, _)))
        }
      scored.orderBy($"score".desc, $"vec_id").limit(1)
        .select($"vec_id", $"v", $"norm", $"score").collect().headOption match {
        case None => done = true // slice exhausted before k picks
        case Some(best) =>
          picks += ((i, best.getLong(0), best.getDouble(3)))
          selected :+= ((best.getLong(0), best.getSeq[Double](1), best.getDouble(2)))
          i += 1
      }
    }
    c.unpersist()
    s.createDataFrame(picks.toSeq).toDF("rank", "vec_id", "score")
      .orderBy($"rank")
    }
  }

  val queries: Map[String, Q] = Map(
    "q74_inverted_index" -> q74,
    "q88_mmr_select" -> q88,
    "q21c_asof_custom" -> q21c,
    "q87_quality_report" -> q87,
    "q86_frequent_pairs" -> q86,
    "q84_cohort_retention" -> q84,
    "q85_groupwise_ols" -> q85,
    "q82_attribution" -> q82,
    "q77_bpe_merges" -> q77,
    "q89_bpe_encode" -> q89,
    "q75_markov_transitions" -> q75,
    "q76_rolling_anomaly" -> q76,
    "q78_knn_graph" -> q78,
    "q78b_knn_graph_ivf" -> q78b,
    "q79_dist_drift" -> q79,
    "q80_ann_recall" -> q80,
    "q81_winsorized" -> q81)
}
