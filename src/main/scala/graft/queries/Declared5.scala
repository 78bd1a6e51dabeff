package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.text.TextAnalysis.tokens

/** Round-5 additions to the declared capability inventory (SURVEY §2.4):
  * SCD2 dimension build, exact mode/median, and four LLM-training-data
  * operators — TF-IDF term ranking, BM25 relevance scoring, train/eval
  * n-gram contamination detection, and context-window token packing —
  * plus int8 embedding quantization. Same authoring contract as
  * [[Declared]]..[[Declared4]]: total ORDER BY over a unique key set,
  * exact integer accumulation wherever a float would make the result
  * order-dependent, single IEEE float ops written in the identical
  * sequence as the [[Oracle5]] SQL.
  */
object Declared5 {

  private type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- Q52
  /** SCD2 (slowly-changing-dimension type 2) build from an event log:
    * per user, consecutive runs of the same event_type collapse to one
    * versioned row with [valid_from, valid_to) and an is_current flag —
    * the standard "history table from CDC feed" shape. Run detection is
    * a lag-compare + running sum (one shuffle on user_id, all windows
    * share the partitioning); the run aggregate and the valid_to lead
    * reuse the same partitioning, so the whole build is ONE exchange of
    * the log. */
  val q52: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val flagged = Tables(s, dir, "events")
      .select($"user_id", $"event_type", $"ts", $"event_id",
        when(lag($"event_type", 1).over(w).isNull ||
          lag($"event_type", 1).over(w) =!= $"event_type", 1).otherwise(0)
          .as("chg"))
      .select($"user_id", $"event_type", $"ts",
        sum($"chg").over(run).cast("int").as("run_idx"))
    val runs = flagged.groupBy($"user_id", $"run_idx")
      .agg(first($"event_type").as("event_type"),
        min($"ts").as("valid_from"), count(lit(1)).as("n_events"))
    val wr = Window.partitionBy($"user_id").orderBy($"run_idx")
    runs.select($"user_id", $"run_idx", $"event_type", $"valid_from",
        lead($"valid_from", 1).over(wr).as("valid_to"), $"n_events")
      .withColumn("is_current", $"valid_to".isNull)
      .orderBy($"user_id", $"run_idx")
  }

  // ---------------------------------------------------------------- Q53
  /** Exact per-group MODE and MEDIAN, derived from first principles so
    * both engines compute the identical value (built-in mode() is
    * tie-nondeterministic in Spark, and built-in medians interpolate
    * with engine-specific expression order): mode = smallest id among
    * the most frequent (count + rank-1 filter, WindowGroupLimit-
    * optimized), median = mean of the one or two
    * middle values by row_number (the two-operand addition is exactly
    * commutative in IEEE, so partition order cannot perturb it). Shapes:
    * mode is two partial-agg shuffles (value counts → per-group argmax);
    * median is one shuffle + WindowGroupLimit-free rank (bounded by the
    * middle-position filter). */
  val q53: Q = (s, dir) => {
    import s.implicits._
    val ev = Tables(s, dir, "events")
    // mode of user_id per event_type: count, then a rank-1 filter over
    // (cnt desc, user asc) — deterministic for ANY id range (no
    // composite-ordinal arithmetic to collide or overflow), and the
    // rank-filter plans as WindowGroupLimit (bounded per-partition top-1)
    val counts = ev.groupBy($"event_type", $"user_id").agg(count(lit(1)).as("cnt"))
    val wm = Window.partitionBy($"event_type").orderBy($"cnt".desc, $"user_id")
    val mode = counts
      .withColumn("rn", row_number().over(wm)).filter($"rn" === 1)
      .select($"event_type", $"user_id".as("mode_user"), $"cnt".as("mode_count"))
    // exact median of value per event_type: middle rows by row_number
    val wv = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    val ranked = ev.select($"event_type", $"value", row_number().over(wv).as("rn"),
      count(lit(1)).over(Window.partitionBy($"event_type")).as("n"))
    val med = ranked
      .filter($"rn" === floor(($"n" + 1) / 2) || $"rn" === floor(($"n" + 2) / 2))
      .groupBy($"event_type")
      .agg((sum($"value") / count(lit(1))).as("median_value"),
        first($"n").as("n_rows"))
    mode.join(med, "event_type")
      .select($"event_type", $"n_rows", $"median_value", $"mode_user", $"mode_count")
      .orderBy($"event_type")
  }

  // ---------------------------------------------------------------- Q54
  /** TF-IDF top-5 terms per document. tf = in-doc term count, df = doc
    * frequency from one extra aggregate over the SAME doc-term rows
    * (no second corpus scan), idf as the exact ratio (N+1)/(df+1) — the
    * log-free variant keeps the score a single IEEE division of exact
    * integers, bit-identical across engines (ln() is not
    * correctly-rounded in either). Top-5 is a rank-filter window the
    * optimizer executes as WindowGroupLimit (per-partition bounded heap,
    * asserted in PlanAuditSpec). The df side joins on term — AQE
    * broadcasts it at test scale; at 100 TB vocabulary it degrades to a
    * hash-partitioned join on the term key. */
  /** Per-doc term counts in one pass: the document is the natural
    * aggregation unit, so (doc, term, tf) rows are produced MAP-SIDE
    * (count within the doc, then explode the counted map) — no shuffle
    * of the raw exploded token stream at all. The groupBy(doc_id, term)
    * formulation this replaces shuffled |corpus tokens| rows first.
    * Since round 6 the kernel is the codegen'd
    * [[graft.functions.TermCounts]] expression (O4 precedent); this
    * ScalaUDF twin stays for TokenKernelsParitySpec. */
  private[graft] val termCountsUdf = udf((text: String) => {
    val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    graft.functions.Signatures.splitTokens(text)
      .foreach(t => m.update(t, m.getOrElse(t, 0L) + 1L))
    m.toMap
  })

  val q54: Q = (s, dir) => {
    import s.implicits._
    // ONE tokenizer pass (r20 verdict #7): the (doc, term, tf) frame is
    // consumed by two subtrees (df derivation + scoring side), which
    // re-evaluated the term_counts scan twice per run. It is narrow
    // (no text payload), so localCheckpoint materializes it once inside
    // the timed evaluation — guide §5 intra-query reuse, the
    // dedup_clusters precedent. Values, joins and the top-5 window are
    // unchanged.
    val docTerm = Tables(s, dir, "documents")
      .select($"doc_id",
        explode(graft.functions.TokenFunctions.term_counts($"text"))
          .as(Seq("term", "tf")))
      .localCheckpoint()
    val df = docTerm.groupBy($"term").agg(count(lit(1)).as("df"))
    val n = Tables(s, dir, "documents").agg(count(lit(1)).as("n_docs"))
    val scored = docTerm.join(df, "term").crossJoin(broadcast(n))
      .select($"doc_id", $"term", $"tf", $"df",
        (($"tf" * ($"n_docs" + 1)).cast("double") /
          ($"df" + 1).cast("double")).as("tfidf_ratio"))
    val wk = Window.partitionBy($"doc_id").orderBy($"tfidf_ratio".desc, $"term")
    scored.select($"doc_id", $"term", $"tf", $"df", $"tfidf_ratio",
        row_number().over(wk).as("rk"))
      .filter($"rk" <= 5)
      .orderBy($"doc_id", $"rk")
  }

  /** BM25 parameters (standard defaults). */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  /** Fixed query-term set for the BM25 demo (frequent corpus tokens). */
  val Bm25Terms = Seq("hash", "join", "scan")

  // ---------------------------------------------------------------- Q55
  /** BM25 relevance of every document against a fixed query-term set,
    * one output row per (doc, matched term) — per-term rows rather than
    * a summed score so no cross-term float accumulation exists to be
    * partition-order-dependent. idf is the log-free exact ratio
    * (N−df+0.5)/(df+0.5) (same reasoning as q54); the saturation term
    * tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) is written as the identical
    * IEEE op sequence in both engines. avgdl is an exact integer sum
    * over N divided once. Shape: the per-doc term filter prunes the
    * exploded stream before any shuffle; df and avgdl are tiny
    * broadcast sides. */
  val q55: Q = (s, dir) => {
    import s.implicits._
    // ONE tokenizer pass (r20 verdict #7): the r20 DAG evaluated
    // tokens(text) in FOUR subtrees (dl, docTerm, stats-via-dl,
    // df-via-docTerm). Now the per-doc length and the per-query-term
    // tfs compute in a single projection (the repeated tokens(text)
    // subexpression is shared by whole-stage-codegen subexpression
    // elimination), and the NARROW (doc_id, dl, tf…) frame — 1+1+|terms|
    // longs per doc, never the tokens — is localCheckpointed once per
    // evaluation; stats, df and the detail rows all derive from it
    // (guide §8 "decide with small rows", §5 intra-query reuse).
    // tf = occurrences of the term (size of the equality-filtered token
    // array ≡ the r20 explode+count), df = docs with tf ≥ 1, and the
    // BM25 arithmetic below is the identical IEEE op sequence over the
    // identical integers, so rows and hashes are unchanged.
    val docs = Tables(s, dir, "documents")
    val toksCol = tokens($"text")
    val perDoc = docs.select(
      ($"doc_id" +: size(toksCol).cast("bigint").as("dl") +:
        Bm25Terms.map(t =>
          size(filter(toksCol, x => x === lit(t))).cast("bigint").as(s"tf_$t"))): _*)
      .localCheckpoint()
    val statCols = count(lit(1)).as("n_docs") +: sum($"dl").as("sum_dl") +:
      Bm25Terms.map(t => sum(when(col(s"tf_$t") > 0, 1L)).as(s"df_$t"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val detail = perDoc.select($"doc_id", $"dl",
        explode(map(Bm25Terms.flatMap(t => Seq(lit(t), col(s"tf_$t"))): _*))
          .as(Seq("term", "tf")))
      .filter($"tf" > 0)
    val dfCol = Bm25Terms.tail.foldLeft(
      when($"term" === Bm25Terms.head, col(s"df_${Bm25Terms.head}"))) {
      (acc, t) => acc.when($"term" === t, col(s"df_$t"))
    }
    val avgdl = $"sum_dl".cast("double") / $"n_docs".cast("double")
    val idf = (($"n_docs" - $"df").cast("double") + lit(0.5)) /
      ($"df".cast("double") + lit(0.5))
    val denom = $"tf".cast("double") +
      lit(Bm25K1) * (lit(1.0 - Bm25B) + lit(Bm25B) * ($"dl".cast("double") / avgdl))
    detail.crossJoin(broadcast(stats))
      .withColumn("df", dfCol)
      .select($"doc_id", $"term", $"tf", $"df", $"dl",
        (idf * ($"tf".cast("double") * lit(Bm25K1 + 1.0)) / denom).as("bm25"))
      .orderBy($"doc_id", $"term")
  }

  /** Contamination n-gram order (4 fits this corpus's short synthetic
    * docs; published decontamination pipelines use 8-13 over real text —
    * the plan shape is independent of n). */
  val ContamN = 4

  // ---------------------------------------------------------------- Q56
  /** Train/eval contamination detection: which training documents share
    * word n-grams with a benchmark (eval) set — the standard
    * decontamination pass before an LLM training run. Eval here = the
    * `src0` source slice. Each side explodes to DISTINCT per-doc
    * n-grams; the join key is the n-gram itself (portable for the
    * oracle; at 100 TB hash it to 64-bit and pre-filter the train side
    * with a bloom filter of eval n-grams). The EVAL side is
    * benchmark-sized by definition — broadcast — so the train corpus
    * streams through a map-side join with no train-side shuffle before
    * the per-pair count. */
  /** Tight-loop n-gram kernel (graft.functions.Signatures.distinctNgrams)
    * — the SQL-lambda formulation (transform(sequence…) with ContamN
    * element_at calls per window) runs interpreted per element and made
    * this the slowest query in the suite (13 s at sf0.1; sub-second with
    * the one-pass kernel producing identical strings). Since round 6 the
    * kernel rides the codegen'd [[graft.functions.DistinctNgrams]]
    * expression; this ScalaUDF twin stays for TokenKernelsParitySpec. */
  private[graft] val ngramsUdf = udf((text: String) =>
    graft.functions.Signatures.distinctNgrams(text, ContamN))

  /** Eval-doc count above which q56 stops broadcasting the eval n-gram
    * set. A benchmark eval slice is tens of thousands of docs; past this
    * the broadcast would brush the 8 GB hard limit / driver OOM with no
    * graceful fallback, so the join degrades to shuffled-hash instead. */
  val ContamBroadcastDocCap = 100000L

  val q56: Q = (s, dir) => {
    import s.implicits._
    def grams(src: DataFrame): DataFrame =
      src.select($"doc_id",
        explode(graft.functions.TokenFunctions.distinct_ngrams($"text", ContamN))
          .as("ng"))
    val docs = Tables(s, dir, "documents")
    val evalDocs = docs.filter($"source" === "src0")
    // broadcast GATE, not assumption: one cheap bounded count (LIMIT
    // cap+1 — never a full scan of a huge slice) decides whether the
    // eval side is benchmark-sized. Small → broadcast, train corpus
    // streams map-side with zero pre-agg shuffle. Too big → shuffled
    // hash join, which still beats SMJ here (no sort of the exploded
    // train stream); the documented 100 TB upgrade (hash64 n-grams +
    // bloom prefilter) applies on top of either shape.
    val evalIsSmall =
      evalDocs.limit((ContamBroadcastDocCap + 1).toInt).count() <= ContamBroadcastDocCap
    def evalSide(df: DataFrame): DataFrame =
      if (evalIsSmall) broadcast(df) else df.hint("shuffle_hash")
    val eval = grams(evalDocs)
      .select($"doc_id".as("eval_doc"), $"ng")
    val evalSizes = eval.groupBy($"eval_doc").agg(count(lit(1)).as("n_eval_ngrams"))
    val train = grams(docs.filter($"source" =!= "src0"))
      .select($"doc_id".as("train_doc"), $"ng")
    train.join(evalSide(eval), "ng")
      .groupBy($"train_doc", $"eval_doc").agg(count(lit(1)).as("n_overlap"))
      .join(evalSide(evalSizes), "eval_doc")
      .select($"train_doc", $"eval_doc", $"n_overlap", $"n_eval_ngrams",
        ($"n_overlap".cast("double") / $"n_eval_ngrams".cast("double"))
          .as("overlap_frac"))
      .orderBy($"train_doc", $"eval_doc")
  }

  /** Context-window token budget for q57 packing. */
  val PackBudget = 2048L
  /** Docs per cumsum chunk (two-phase prefix sum fan-in). */
  val PackChunk = 64L

  // ---------------------------------------------------------------- Q57
  /** Context-window packing: lay the corpus out as one doc_id-ordered
    * token stream and assign every document its starting window of size
    * [[PackBudget]] — how pretraining data is packed into fixed-length
    * sequences. The global running offset is a TWO-PHASE prefix sum
    * (the scale shape — a naive `sum over (order by doc_id)` window is
    * a single-partition sort of the entire corpus): per-chunk exclusive
    * cumsums partition by floor(doc_id/chunk) and shuffle normally;
    * only the per-chunk TOTALS (corpus/chunk rows) pass through a
    * single-partition prefix, then broadcast back. All arithmetic is
    * integer-exact. */
  val q57: Q = (s, dir) => {
    import s.implicits._
    // ONE tokenizer pass: the narrow (doc_id, n_tokens, chunk) frame —
    // 3 longs per doc, never the text — is localCheckpointed once per
    // evaluation and feeds the in-chunk window, the chunk totals AND
    // the superchunk collect below (the r20 form re-ran the tokenizer
    // scan for the chunk-totals subtree; guide §8 "decide with small
    // rows", §5 intra-query reuse).
    val d = Tables(s, dir, "documents")
      .select($"doc_id", size(tokens($"text")).cast("bigint").as("n_tokens"),
        floor($"doc_id" / PackChunk).as("chunk"))
      .localCheckpoint()
    val wIn = Window.partitionBy($"chunk").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inChunk = d.select($"doc_id", $"n_tokens", $"chunk",
      coalesce(sum($"n_tokens").over(wIn), lit(0L)).as("in_chunk_off"))
    // chunk-offset fan-in, SECOND chunking level (r20 verdict #6): the
    // r20 form ran one partition-less window over ALL corpus/PackChunk
    // chunk totals — still a single task holding millions of rows at
    // 100 TB. Now chunk totals prefix-sum WITHIN superchunks of
    // PackChunk chunks (a partitioned window), and only the
    // corpus/PackChunk² superchunk totals — driver-trivial by
    // construction at these chunk sizes; production retunes PackChunk —
    // take an exact driver-side exclusive scan. No partition-less
    // WindowExec remains anywhere in the plan. All arithmetic stays
    // integer-exact: chunk_off(c) = Σ earlier-superchunk totals +
    // Σ earlier in-sc chunk totals ≡ the r20 single-window prefix,
    // term for term.
    val cs = d.groupBy($"chunk").agg(sum($"n_tokens").as("chunk_total"))
      .withColumn("sc", floor($"chunk" / PackChunk))
    val wSc = Window.partitionBy($"sc").orderBy($"chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val inSc = cs.select($"chunk", $"sc",
      coalesce(sum($"chunk_total").over(wSc), lit(0L)).as("in_sc_off"))
    val scTotals = cs.groupBy($"sc").agg(sum($"chunk_total").as("t"))
      .orderBy($"sc").collect().map(r => (r.getLong(0), r.getLong(1)))
    val scOffRows = {
      var acc = 0L
      scTotals.map { case (sc, t) => val row = (sc, acc); acc += t; row }.toSeq
    }
    val scOff = scOffRows.toDF("sc", "sc_off")
    val chunkOff = inSc.join(broadcast(scOff), "sc")
      .select($"chunk", ($"sc_off" + $"in_sc_off").as("chunk_off"))
    inChunk.join(broadcast(chunkOff), "chunk")
      .select($"doc_id", $"n_tokens",
        ($"chunk_off" + $"in_chunk_off").as("start_off"))
      .select($"doc_id", $"n_tokens", $"start_off",
        floor($"start_off" / PackBudget).cast("bigint").as("pack_id"),
        ($"n_tokens" > 0 &&
          floor(($"start_off" + $"n_tokens" - 1) / PackBudget).cast("bigint") >
            floor($"start_off" / PackBudget).cast("bigint")).as("spans_boundary"))
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- Q58
  /** Int8 embedding quantization with error accounting: per vector,
    * scale = max|x|/127, q_i = floor(x_i/scale + 0.5) (explicit
    * floor(+0.5) instead of round() — engines disagree on half-rounding
    * modes, floor is exact everywhere), and two summaries — an exact
    * integer checksum Σ q_i·i (order-independent) and max
    * reconstruction error (max is order-independent too, so float
    * partition order cannot perturb either). Shape: posexplode +
    * one partial-agg shuffle on vec_id; at 100 TB this is the
    * embarrassingly-parallel compression pass before ANN index build. */
  val q58: Q = (s, dir) => {
    import s.implicits._
    val v = Tables(s, dir, "embeddings")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .select($"vec_id", $"v",
        array_max(transform($"v", x => abs(x))).as("max_abs"))
      .filter($"max_abs" > 0)
      .select($"vec_id", ($"max_abs" / 127.0).as("scale"),
        posexplode($"v").as(Seq("pos", "x")))
    v.select($"vec_id", $"scale", $"pos", $"x",
        floor($"x" / $"scale" + 0.5).cast("bigint").as("q"))
      .groupBy($"vec_id")
      .agg(first($"scale").as("scale"), count(lit(1)).as("n_dims"),
        sum($"q" * ($"pos" + 1)).as("checksum"),
        max(abs($"q".cast("double") * $"scale" - $"x")).as("max_abs_err"))
      .orderBy($"vec_id")
  }

  // ---------------------------------------------------------------- Q59
  /** Per-user EWMA (exponentially-weighted moving average) of event
    * values in time order — the standard smoothing pass over per-entity
    * time series. EWMA is inherently sequential IN TIME per key (each
    * state depends on the previous), so the scale-safe shape is a
    * secondary sort: ONE shuffle on user_id, sort each partition by
    * (user_id, ts, event_id), then a single streaming pass that folds
    * each key's history row by row — O(1) state per key (count, last
    * ts, accumulator), never an array. A hot entity with 10⁸ events
    * streams through one task at constant memory instead of
    * materializing a multi-GB `collect_list` row. The fold starts from
    * the first observation (list_reduce parity with the oracle) and
    * every coefficient is the same IEEE arithmetic, applied in the same
    * (ts, event_id) order, as the DuckDB `list_reduce` text. */
  val EwmaAlpha = 0.3

  /** Typed rows for the [[q59]] streaming fold (name-resolved encoders). */
  private[queries] final case class EwmaIn(
      user_id: Long, ts: java.sql.Timestamp, event_id: Long, value: Double)
  private[queries] final case class EwmaOut(
      user_id: Long, n_events: Long, last_ts: java.sql.Timestamp,
      ewma_value: Double)

  val q59: Q = (s, dir) => {
    import s.implicits._
    val alpha = EwmaAlpha
    Tables(s, dir, "events")
      .select($"user_id", $"ts", $"event_id", $"value")
      .repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts", $"event_id")
      .as[EwmaIn]
      .mapPartitions { rows =>
        // rows arrive clustered by user_id and time-ordered within each
        // key; one buffered pass emits a row per key with O(1) state
        val it = rows.buffered
        new Iterator[EwmaOut] {
          def hasNext: Boolean = it.hasNext
          def next(): EwmaOut = {
            val first = it.next()
            val uid = first.user_id
            var n = 1L
            var lastTs = first.ts
            var acc = first.value
            while (it.hasNext && it.head.user_id == uid) {
              val e = it.next()
              n += 1
              lastTs = e.ts
              acc = alpha * e.value + (1.0 - alpha) * acc
            }
            EwmaOut(uid, n, lastTs, acc)
          }
        }
      }
      .toDF()
      .orderBy($"user_id")
  }

  // ---------------------------------------------------------------- Q60
  /** Rank-family window functions over a deterministic composite key:
    * percent_rank, cume_dist, ntile(4) and dense_rank of every order
    * within its priority class by (exact cents, orderkey). The ordering
    * key is collision-free, so the rank quantities are pure integer
    * ratios — engine-identical. One shuffle on o_orderpriority shared
    * by all four window functions (same window spec). */
  val q60: Q = (s, dir) => {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy($"cents", $"o_orderkey")
    Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_orderpriority",
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .select($"o_orderkey", $"o_orderpriority", $"cents",
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        ntile(4).over(w).as("tile"),
        dense_rank().over(w).as("drank"))
      .orderBy($"o_orderkey")
  }

  // --------------------------------------------------------------- Q60b
  /** The rank family AGAIN, but computed the way it must be at 100 TB.
    * q60's `Window.partitionBy(o_orderpriority)` is semantically clean
    * but physically each priority (5 values!) becomes ONE task sorting
    * |orders|/5 rows — fine at sf0.1, a wall at scale. This variant
    * produces the IDENTICAL rows (same DuckDB oracle text) from a
    * range-partitioned total order plus offset composition:
    *
    *  1. range-repartition + sort by (priority, cents, orderkey) — a
    *     distributed total order, parallelism = chunk count, no
    *     per-group task;
    *  2. monotonically_increasing_id over the sorted chunks encodes
    *     (chunk, row-in-chunk) — no shuffle;
    *  3. ONE tiny aggregate (chunks × priorities rows) yields each
    *     contiguous (chunk, priority) run's min id and count; a
    *     single-partition prefix over that aggregate (q57's two-phase
    *     pattern) turns counts into global per-priority offsets;
    *  4. rank = offset + (id − min_id) + 1, then percent_rank /
    *     cume_dist / ntile / dense_rank are exact integer formulas of
    *     (rank, n) — ntile's uneven-bucket rule included.
    */
  /** q60b's pre-checkpoint subtree: ranged total order + chunk-encoded
    * row ids. Exposed so PlanAuditSpec can pin the range exchange on the
    * subtree that actually computes it (the checkpoint hides it from the
    * downstream executed plan). */
  private[graft] def q60bBase(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables(s, dir, "orders")
      .select($"o_orderkey", $"o_orderpriority",
        floor($"o_totalprice" * 100).cast("long").as("cents"))
      .repartitionByRange(s.sparkContext.defaultParallelism,
        $"o_orderpriority", $"cents", $"o_orderkey")
      .sortWithinPartitions($"o_orderpriority", $"cents", $"o_orderkey")
      .withColumn("mid", monotonically_increasing_id())
  }

  val q60b: Q = (s, dir) => {
    import s.implicits._
    // DETERMINISM PIN: `base` feeds two subtrees (`runs`, `ranked`) and
    // `mid` is nondeterministic — without materialization the two
    // evaluations could disagree if the upstream became nondeterministic
    // (AQE coalesce before the repartition, a nondeterministic source)
    // and ranks would silently corrupt. The eager localCheckpoint
    // computes the ranged-sorted projection ONCE, truncates the lineage
    // (a lost block fails the job loudly instead of recomputing
    // differently — the property cache() cannot give), and both subtrees
    // read the stored blocks. At scale this is also the cheaper plan:
    // one range-exchange + sort instead of two, and the stored data is
    // just the 4-column projection.
    val base = q60bBase(s, dir).localCheckpoint()
    // 3. per-(chunk, priority) run stats; chunk id lives in the mid's
    // upper bits, so grouping on it needs no extra column
    val runs = base.groupBy(shiftrightunsigned($"mid", 33).as("chunk"), $"o_orderpriority")
      .agg(min($"mid").as("min_mid"), count(lit(1)).as("run_n"))
    val wOff = Window.partitionBy($"o_orderpriority").orderBy($"chunk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = runs.select($"chunk", $"o_orderpriority".as("op"), $"min_mid",
      coalesce(sum($"run_n").over(wOff), lit(0L)).as("off"),
      sum($"run_n").over(Window.partitionBy($"o_orderpriority")).as("n"))
    val ranked = base
      .join(broadcast(offsets), shiftrightunsigned($"mid", 33) === $"chunk" &&
        $"o_orderpriority" === $"op")
      .select($"o_orderkey", $"o_orderpriority", $"cents", $"n",
        ($"off" + ($"mid" - $"min_mid") + 1L).as("rk"))
    // 4. exact integer formulas (ties impossible: composite key unique)
    val ntileCol = {
      val qs = floor($"n" / 4).cast("long")
      val r = $"n" % 4
      when($"rk" <= (qs + 1) * r, floor(($"rk" - 1) / (qs + 1)) + 1)
        .otherwise(r + floor(($"rk" - (qs + 1) * r - 1) / qs) + 1)
    }
    ranked.select($"o_orderkey", $"o_orderpriority", $"cents",
        when($"n" === 1, lit(0.0)).otherwise(
          ($"rk" - 1).cast("double") / ($"n" - 1).cast("double")).as("pct_rank"),
        ($"rk".cast("double") / $"n".cast("double")).as("cume"),
        ntileCol.cast("int").as("tile"),
        $"rk".cast("int").as("drank"))
      .orderBy($"o_orderkey")
  }

  // ---------------------------------------------------------------- Q61
  /** Ordered conversion funnel (view → click → purchase): per user, the
    * FIRST time each stage is reached STRICTLY AFTER the previous stage
    * — the product-analytics / match_recognize shape. Executed as the
    * one-shuffle streaming pattern (same secondary sort as q59): ONE
    * repartition on user_id, local sort by (user_id, ts), then a
    * per-user state machine over the time-ordered stream — O(1) state
    * (three timestamps), each user's events scanned once. The chained
    * conditional-min formulation would scan events three times and
    * re-shuffle per stage; here a hot user streams through at constant
    * memory and the event log crosses the wire exactly once. Tie
    * safety: stage conditions are STRICT ts comparisons against the
    * previous stage's value, so rows at equal ts qualify (or not)
    * identically whatever their order within the sort. Users who never
    * reach stage 1 are excluded (funnel root); reached_stage counts how
    * deep they got. */
  private[queries] final case class FunnelIn(
      user_id: Long, event_type: String, ts: java.sql.Timestamp)
  private[queries] final case class FunnelOut(
      user_id: Long, view_ts: java.sql.Timestamp,
      click_ts: java.sql.Timestamp, purchase_ts: java.sql.Timestamp)

  val q61: Q = (s, dir) => {
    import s.implicits._
    Tables(s, dir, "events")
      .select($"user_id", $"event_type", $"ts")
      .repartition($"user_id")
      .sortWithinPartitions($"user_id", $"ts")
      .as[FunnelIn]
      .mapPartitions { rows =>
        val it = rows.buffered
        new Iterator[Option[FunnelOut]] {
          def hasNext: Boolean = it.hasNext
          def next(): Option[FunnelOut] = {
            val uid = it.head.user_id
            var v: java.sql.Timestamp = null
            var c: java.sql.Timestamp = null
            var p: java.sql.Timestamp = null
            while (it.hasNext && it.head.user_id == uid) {
              val e = it.next()
              e.event_type match {
                case "view" =>
                  if (v == null) v = e.ts
                case "click" =>
                  if (c == null && v != null && e.ts.compareTo(v) > 0) c = e.ts
                case "purchase" =>
                  if (p == null && c != null && e.ts.compareTo(c) > 0) p = e.ts
                case _ => ()
              }
            }
            if (v != null) Some(FunnelOut(uid, v, c, p)) else None
          }
        }.flatten
      }
      .toDF()
      .select($"user_id", $"view_ts", $"click_ts", $"purchase_ts",
        (lit(1) + when($"click_ts".isNotNull, 1).otherwise(0) +
          when($"purchase_ts".isNotNull, 1).otherwise(0)).as("reached_stage"))
      .orderBy($"user_id")
  }

  /** Reference-vocabulary size for q62. */
  val OovVocabSize = 100

  // ---------------------------------------------------------------- Q62
  /** Vocabulary coverage / OOV-rate scoring: build the corpus's top-100
    * token vocabulary (frequency, ties broken lexically — fully
    * deterministic), then score every document by the fraction of its
    * token OCCURRENCES outside that vocabulary — the standard
    * "does this doc look like the training distribution" filter (high
    * OOV ⟹ boilerplate/other-language/garbage). Shapes: vocabulary is
    * two partial-agg shuffles ending in a 100-row table that BROADCASTS
    * back onto the exploded token stream; the ratio is one IEEE
    * division of exact counts. */
  val q62: Q = (s, dir) => {
    import s.implicits._
    // Tokenizer upgrade (r20 verdict #7): per-doc (term, tf) rows from
    // the codegen TermCounts kernel instead of the interpreted
    // filter(split(...)) HOF — and the kernel ALSO collapses the
    // exploded occurrence stream to one row per (doc, term) map-side,
    // so both consumers (vocabulary + scoring) read a smaller frame.
    // The two-subtree shape is kept deliberately: a localCheckpoint of
    // the frame was measured SLOWER at sf0.1 (the materialization job
    // costs more than the second kernel pass saves) — at 100 TB the
    // same checkpoint trade flips, which OPTIMIZATION_r21.md records.
    // Occurrence counts become Σ tf: identical integers, so
    // vocabulary, per-doc counts and hashes are unchanged.
    val docTerm = Tables(s, dir, "documents")
      .select($"doc_id",
        explode(graft.functions.TokenFunctions.term_counts($"text"))
          .as(Seq("term", "tf")))
    // top-k via orderBy+limit — plans as TakeOrderedAndProject
    // (parallel per-partition top-100 + driver merge), NOT a
    // single-partition global window over the whole vocabulary
    val vocab = docTerm.groupBy($"term").agg(sum($"tf").as("cnt"))
      .orderBy($"cnt".desc, $"term").limit(OovVocabSize)
      .select($"term", lit(1).as("in_vocab"))
    docTerm.join(broadcast(vocab), Seq("term"), "left")
      .groupBy($"doc_id")
      .agg(sum($"tf").as("n_tokens"),
        coalesce(sum(when($"in_vocab".isNull, $"tf")), lit(0L)).as("n_oov"))
      .select($"doc_id", $"n_tokens", $"n_oov",
        ($"n_oov".cast("double") / $"n_tokens".cast("double")).as("oov_ratio"))
      .orderBy($"doc_id")
  }

  // ---------------------------------------------------------------- Q64
  /** Point-in-time (temporal) join — what an SCD2 table exists FOR:
    * every event joins the dimension version valid at its timestamp
    * (valid_from ≤ ts < valid_to, open version unbounded). Executed as
    * q41's keyed-interval shape: EQUI-join on user_id with the interval
    * predicate as a post-join filter — the version side is
    * |users|·|versions-per-user|, dimension-sized, so the equi key
    * bounds the pair explosion and the event stream shuffles once.
    * Boundary semantics are half-open: an event stamped exactly at a
    * version change belongs to the NEW version (even the equal-ts
    * events the run derivation ordered into the old run by event_id —
    * the temporal join is by TIME, and both engines agree). */
  val q64: Q = (s, dir) => {
    import s.implicits._
    val versions = q52(s, dir)
      .select($"user_id".as("v_user"), $"run_idx", $"event_type".as("version_type"),
        $"valid_from", $"valid_to", $"is_current")
    val ev = Tables(s, dir, "events").select($"event_id", $"user_id", $"ts")
    ev.join(versions, ev("user_id") === $"v_user" &&
        $"ts" >= $"valid_from" && ($"valid_to".isNull || $"ts" < $"valid_to"))
      .select($"event_id", $"user_id", $"ts", $"run_idx",
        $"version_type", $"is_current")
      .orderBy($"event_id")
  }

  /** Fixed-point scale for q63 — see [[graft.sim.KmeansQuantizer.Scale]]
    * (2^20; the bounds argument lives there). Kept as a val here because
    * the Oracle5 SQL text interpolates it. */
  val KmeansScale: Long = graft.sim.KmeansQuantizer.Scale
  val KmeansK = 4

  // ---------------------------------------------------------------- Q63
  /** Distributed Lloyd k-means step in FIXED-POINT arithmetic — the
    * iterative-ML shape (assign → update → re-assign) made bit-exact
    * across engines: coordinates quantize to integers (floor(x·2²⁰+½)),
    * so squared distances, argmin assignment (ties → lower centroid
    * id), and the centroid update (floor of an exact-integer mean) never
    * touch accumulation-order-dependent floats. Seeds = vectors 0..k−1.
    * Shapes: assignment is a broadcast of k centroids against the
    * vector stream (k·d multiply-adds per row, no shuffle); the update
    * is one partial-agg shuffle of (cluster, dim) cells — k·d rows —
    * exactly how MLlib distributes Lloyd; re-assignment broadcasts the
    * k·d updated cells back. Output per surviving cluster: population
    * before/after the update and an exact centroid checksum. The Lloyd
    * machinery itself lives in [[graft.sim.KmeansQuantizer]], shared
    * with the IVF codebook trainer (sim_topk_ivf_trained). */
  val q63: Q = (s, dir) => {
    import s.implicits._
    import graft.sim.KmeansQuantizer
    val q = KmeansQuantizer.quantized(Tables(s, dir, "embeddings"))
    val seeds = q.filter($"vec_id" < KmeansK)
      .select($"vec_id".cast("int").as("cid"), $"qv".as("cv"))
    val a1 = KmeansQuantizer.assign(q, seeds)
    // update: exact integer mean per (cluster, dim), floored
    val cells = KmeansQuantizer.lloydCells(a1)
    val c1 = KmeansQuantizer.cellVectors(cells)
    val a2 = KmeansQuantizer.assign(q, c1)
    val nBefore = a1.groupBy($"cid").agg(count(lit(1)).as("n_before"))
    val nAfter = a2.groupBy($"cid").agg(count(lit(1)).as("n_after"))
    val checksum = cells.groupBy($"cid")
      .agg(sum($"cval" * ($"pos" + 1)).as("centroid_checksum"))
    nBefore.join(broadcast(checksum), "cid")
      .join(broadcast(nAfter), Seq("cid"), "left")
      .select($"cid".as("cluster_id"), $"n_before",
        coalesce($"n_after", lit(0L)).as("n_after"), $"centroid_checksum")
      .orderBy($"cluster_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_scd2" -> q52,
    "q53_mode_median" -> q53,
    "q54_tfidf" -> q54,
    "q55_bm25" -> q55,
    "q56_contamination" -> q56,
    "q57_pack" -> q57,
    "q58_quantize_int8" -> q58,
    "q59_ewma" -> q59,
    "q60_ranks" -> q60,
    "q60b_ranks_scaled" -> q60b,
    "q61_funnel" -> q61,
    "q62_oov" -> q62,
    "q63_kmeans" -> q63,
    "q64_temporal_join" -> q64)
}
