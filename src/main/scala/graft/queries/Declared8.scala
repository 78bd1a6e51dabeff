package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-13 declared queries: data SELECTION for training pipelines.
  *
  * q90_dsir_select — DSIR, Data Selection via Importance Resampling
  * (Xie et al. 2023, arXiv:2302.03169): score every candidate document
  * by how much more likely its hashed-unigram features are under a
  * TARGET corpus distribution than under the candidate pool's own —
  * the classifier-free way to pick "looks like my curated set" data
  * out of a raw crawl. Here the target is the English slice of
  * `documents` and the pool is everything else; the engine emits the
  * top-100 pool docs by importance weight.
  *
  * Exactness across engines: features are polyHash(token) % B (the
  * portable hash family — DuckDB reproduces the buckets bit-for-bit),
  * and the per-bucket log-likelihood ratio is QUANTIZED ONCE to
  * integer micro-log units (round(1e6·(ln p − ln q))) before any
  * per-doc summation, so document scores are exact i64 sums —
  * order-free, no float-accumulation drift between engines (the
  * exact-i64 trick the PQ ADC oracles use). The only cross-engine
  * float op is the single ln per bucket, identical arithmetic on both
  * sides.
  *
  * Scale shape: wordcount-style partial-aggregated explodes for the
  * bucket totals (B = 1024 rows out), the ratio table broadcast to a
  * hash join against the pool's per-doc bucket counts, and a
  * TakeOrdered top-k. No shuffle carries more than (docs ×
  * distinct-buckets-per-doc) rows; nothing is quadratic. The lazy plan
  * re-derives the feature counts for the tc/sc/pool subtrees (3 corpus
  * tokenization passes in one job plus 1 for the totals action) — at
  * 100 TB one would checkpoint the counts table once (the persisted
  * band-index pattern) and reuse it; here the honest per-pass cost is
  * sub-second and a cached plan would leak across Verify/Bench reps. */
object Declared8 {

  private type Q = (SparkSession, String) => DataFrame

  /** Feature space size. 1024 keeps the ratio table broadcast-trivial
    * while leaving unigram collisions rare enough to discriminate —
    * DSIR's own experiments use hashed features for exactly this
    * reason. Interpolated into the oracle SQL below so the two sides
    * cannot drift. */
  val DsirBuckets = 1024

  /** Micro-log quantization scale for the per-bucket LLR. */
  val DsirScale = 1000000L

  /** Laplace smoothing: +1 per bucket, +B on the totals. */
  private val dsirBucketsUdf = udf((toks: Seq[String]) =>
    graft.functions.Signatures.dsirBucketCounts(toks, DsirBuckets))

  val dsirSelect: Q = (s, dir) => {
    val docs = Tables(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        filter(split(col("text"), " "), t => t =!= "").as("toks"))
    // (doc_id, lang, bucket, cnt) — counts WITH multiplicity, packed by
    // the tight-loop kernel, decoded by codegen'd bit ops
    val bc = docs
      .select(col("doc_id"), col("lang"),
        explode(dsirBucketsUdf(col("toks"))).as("packed"))
      .select(col("doc_id"), col("lang"),
        shiftright(col("packed"), 32).cast("int").as("bucket"),
        (col("packed").bitwiseAND(lit(0xffffffffL))).cast("long").as("cnt"))
    val isTarget = col("lang") === "en"
    val tc = bc.where(isTarget).groupBy("bucket")
      .agg(sum("cnt").as("tc"))
    val sc = bc.where(!isTarget).groupBy("bucket")
      .agg(sum("cnt").as("sc"))
    // corpus totals — ONE bounded driver action for both scalars
    // (null-safe: an empty slice contributes 0, the smoothing floor
    // keeps every log argument positive)
    val totals = bc.groupBy(coalesce(isTarget, lit(false)).as("t"))
      .agg(sum("cnt").as("n")).collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    val tt = totals.getOrElse(true, 0L)
    val st = totals.getOrElse(false, 0L)
    // every pool bucket exists in sc by construction; buckets unseen in
    // the target get the +1 smoothing floor
    val lr = sc.join(tc, Seq("bucket"), "left")
      .select(col("bucket"),
        round((log((coalesce(col("tc"), lit(0L)) + lit(1.0)) /
                   lit(tt.toDouble + DsirBuckets)) -
               log((col("sc") + lit(1.0)) /
                   lit(st.toDouble + DsirBuckets))) * lit(DsirScale), 0)
          .cast("long").as("w"))
    bc.where(!isTarget)
      .join(broadcast(lr), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_tokens"),
        sum(col("cnt") * col("w")).as("dsir_score"))
      .orderBy(desc("dsir_score"), asc("doc_id"))
      .limit(100)
  }

  val queries: Map[String, Q] = Map(
    "q90_dsir_select" -> dsirSelect)

  /** DuckDB replay: identical tokenization (single-space split, empties
    * dropped), identical polyHash fold, identical smoothing arithmetic
    * and quantization — constants interpolated from the Scala ones. */
  val sql: Map[String, String] = Map(
    "q90_dsir_select" ->
      s"""WITH t AS (
            SELECT doc_id, lang,
                   list_filter(string_split(text, ' '), x -> x <> '') AS toks
            FROM documents),
          e AS (
            SELECT doc_id, lang,
                   unnest(list_transform(toks, tk -> list_reduce(
                     list_prepend(CAST(0 AS BIGINT),
                       list_transform(list_filter(string_split(tk, ''), c -> c <> ''),
                         c -> CAST(ascii(c) AS BIGINT))),
                     (a, b) -> (a * 31 + b) % 1000000007) % $DsirBuckets)) AS bucket
            FROM t),
          tc AS (SELECT bucket, count(*) AS tc FROM e WHERE lang = 'en' GROUP BY 1),
          sc AS (SELECT bucket, count(*) AS sc FROM e WHERE lang <> 'en' GROUP BY 1),
          tot AS (SELECT (SELECT CAST(sum(tc) AS DOUBLE) FROM tc) AS tt,
                         (SELECT CAST(sum(sc) AS DOUBLE) FROM sc) AS st),
          lr AS (
            SELECT s.bucket,
                   CAST(round((ln((COALESCE(t.tc, 0) + 1.0) / (tot.tt + $DsirBuckets.0))
                             - ln((s.sc + 1.0) / (tot.st + $DsirBuckets.0)))
                         * $DsirScale) AS BIGINT) AS w
            FROM sc s LEFT JOIN tc t USING (bucket), tot)
          SELECT e.doc_id,
                 count(*) AS n_tokens,
                 CAST(sum(lr.w) AS BIGINT) AS dsir_score
          FROM e JOIN lr USING (bucket)
          WHERE e.lang <> 'en'
          GROUP BY e.doc_id
          ORDER BY dsir_score DESC, doc_id
          LIMIT 100""")
}
