package graft.queries

import graft.sim.{KmeansQuantizer, PqQuantizer, Similarity}

/** DuckDB oracle SQL for the product-quantization ANN paths
  * (sim_topk_pq / sim_topk_ivfpq / sim_topk_ivfpq_res). The whole
  * pipeline is fixed-point integer arithmetic until the final double
  * cosine — quantize at scale 2^20, per-subspace one-Lloyd-step
  * codebooks seeded from the first KS vectors' (sub)vectors, argmin
  * encodes with ties to the lower code id, exact-i64 ADC table sums —
  * so codebooks, codes, every ADC distance, the top-R candidate cut,
  * AND the re-ranked cosine all hash-check bit-for-bit (cosines via
  * the list_inner_product == sequential-loop DotProduct equivalence
  * established in [[Oracle2]]). The residual variant trains and
  * encodes `qv − centroid(home cell)` — i64 differences of i64
  * quantities, still exact.
  *
  * Dialect notes: DuckDB list slices are 1-based inclusive
  * (`qv[a:b]`); BIGINT sums widen to HUGEINT → cast back; row_number
  * is BIGINT → cast the rank to INT to match Spark's IntegerType.
  * The ADC lookups join on cid (no positional indexing), so the
  * Spark side's dense-packed tables ([[PqQuantizer.queryTables]])
  * and these oracles agree even if a Lloyd step empties a cluster. */
object Oracle9 {

  private val M = PqQuantizer.M
  private val SubDim = PqQuantizer.SubDim
  private val KS = PqQuantizer.KS
  private val NQ = Similarity.NumQueries
  private val R = Similarity.PqRerank
  private val K = Similarity.K

  /** The quantized corpus — twin of [[KmeansQuantizer.quantized]]. */
  private val quantCte =
    s"""q AS (
      |  SELECT vec_id,
      |    [CAST(floor(CAST(x AS DOUBLE) * ${KmeansQuantizer.Scale} + 0.5) AS BIGINT)
      |     for x in embedding] AS qv
      |  FROM embeddings)""".stripMargin

  /** One per-subspace Lloyd step + encode + query tables over an
    * input CTE shaped (vec_id, qv) — instantiated for the RAW corpus
    * (prefix "", source q) and the RESIDUAL corpus (prefix "r",
    * source resid). Yields <p>sub, <p>cb, <p>codes. */
  private def subspaceCtes(p: String, src: String): String =
    s"""${p}sub AS (
      |  SELECT vec_id, ss.sub,
      |    qv[(ss.sub * $SubDim + 1):(ss.sub * $SubDim + $SubDim)] AS sqv
      |  FROM $src, (SELECT unnest(range(0, $M)) AS sub) ss),
      |${p}seeds AS (
      |  SELECT sub, CAST(vec_id AS INT) AS cid, sqv AS cv FROM ${p}sub
      |  WHERE vec_id < $KS),
      |${p}d1 AS (
      |  SELECT t.vec_id, t.sub, t.sqv, s.cid,
      |    CAST(list_sum([ (t.sqv[i] - s.cv[i]) * (t.sqv[i] - s.cv[i])
      |                    for i in range(1, len(t.sqv) + 1) ]) AS BIGINT) AS dist
      |  FROM ${p}sub t JOIN ${p}seeds s USING (sub)),
      |${p}a1 AS (
      |  SELECT sub, cid, sqv FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
      |      ORDER BY dist, cid) AS rn
      |    FROM ${p}d1) WHERE rn = 1),
      |${p}cells AS (
      |  SELECT sub, cid, pos,
      |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS cval
      |  FROM (SELECT sub, cid, unnest(range(0, len(sqv))) AS pos,
      |          unnest(sqv) AS x FROM ${p}a1)
      |  GROUP BY sub, cid, pos),
      |${p}cb AS (SELECT sub, cid, list(cval ORDER BY pos) AS cv
      |           FROM ${p}cells GROUP BY sub, cid),
      |${p}enc AS (
      |  SELECT t.vec_id, t.sub, c.cid,
      |    CAST(list_sum([ (t.sqv[i] - c.cv[i]) * (t.sqv[i] - c.cv[i])
      |                    for i in range(1, len(t.sqv) + 1) ]) AS BIGINT) AS dist
      |  FROM ${p}sub t JOIN ${p}cb c USING (sub)),
      |${p}codes AS (
      |  SELECT vec_id, sub, cid FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
      |      ORDER BY dist, cid) AS rn
      |    FROM ${p}enc) WHERE rn = 1)""".stripMargin

  /** The trained coarse quantizer + routing — verbatim twin of the
    * sim_topk_ivf_trained oracle's CTEs: one-Lloyd-step KCells
    * codebook, exact-i64 L2 home assignment and NProbe query probes. */
  private val coarseCtes =
    s"""cseeds AS (
      |  SELECT CAST(vec_id AS INT) AS cid, qv AS cv FROM q
      |  WHERE vec_id < ${Similarity.KCells}),
      |cd1 AS (
      |  SELECT q.vec_id, q.qv, s.cid,
      |    CAST(list_sum([ (q.qv[i] - s.cv[i]) * (q.qv[i] - s.cv[i])
      |                    for i in range(1, len(q.qv) + 1) ]) AS BIGINT) AS dist
      |  FROM q CROSS JOIN cseeds s),
      |ca1 AS (
      |  SELECT vec_id, qv, cid FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |    FROM cd1) WHERE rn = 1),
      |ccells AS (
      |  SELECT cid, pos,
      |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS cval
      |  FROM (SELECT cid, unnest(range(0, len(qv))) AS pos, unnest(qv) AS x FROM ca1)
      |  GROUP BY cid, pos),
      |cc1 AS (SELECT cid, list(cval ORDER BY pos) AS cv FROM ccells GROUP BY cid),
      |cd2 AS (
      |  SELECT q.vec_id, c.cid,
      |    CAST(list_sum([ (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])
      |                    for i in range(1, len(q.qv) + 1) ]) AS BIGINT) AS dist
      |  FROM q CROSS JOIN cc1 c),
      |cranked AS (
      |  SELECT vec_id, cid,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |  FROM cd2),
      |home AS (SELECT vec_id, cid AS cell FROM cranked WHERE rn = 1),
      |qprobe AS (SELECT vec_id AS query_id, cid AS cell FROM cranked
      |           WHERE rn <= ${Similarity.NProbe} AND vec_id < $NQ)""".stripMargin

  /** Query distance tables for the raw-PQ paths: the querying
    * vectors' own subvectors against the raw codebook. */
  private val dtCte =
    s"""dt AS (
      |  SELECT p.vec_id AS query_id, p.sub, p.cid, p.dist AS d
      |  FROM enc p WHERE p.vec_id < $NQ)""".stripMargin

  /** ADC distance per (query, vector) = Σ_sub dt[query, sub,
    * codes[vector, sub]], the exact-i64 twin of
    * [[graft.sim.PqQuantizer.adcDist]]. */
  private val adcCte =
    """adc AS (
      |  SELECT d.query_id, c.vec_id, CAST(sum(d.d) AS BIGINT) AS adist
      |  FROM codes c JOIN dt d ON c.sub = d.sub AND c.cid = d.cid
      |  WHERE c.vec_id <> d.query_id
      |  GROUP BY d.query_id, c.vec_id)""".stripMargin

  /** Top-R ADC candidates → exact double-cosine re-rank → top-K, the
    * shared tail of the PQ oracles; `cand` must provide (query_id,
    * vec_id, adist). */
  private def rerankTail(candCte: String): String =
    s"""$candCte,
      |qv AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm
      |       FROM e WHERE vec_id < $NQ)
      |SELECT query_id, vec_id, rank, cos_sim, adist FROM (
      |  SELECT c.query_id, c.vec_id, c.adist,
      |    list_inner_product(qv.qv, e.v) / (qv.qnorm * e.norm) AS cos_sim,
      |    CAST(row_number() OVER (PARTITION BY c.query_id
      |      ORDER BY list_inner_product(qv.qv, e.v) / (qv.qnorm * e.norm) DESC,
      |               c.vec_id) AS INT) AS rank
      |  FROM cand c
      |    JOIN qv USING (query_id)
      |    JOIN e ON e.vec_id = c.vec_id)
      |WHERE rank <= $K
      |ORDER BY query_id, rank""".stripMargin

  private val topRCand =
    s"""cand AS (
      |  SELECT query_id, vec_id, adist FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY adist, vec_id) AS rn
      |    FROM adc) WHERE rn <= $R)""".stripMargin

  val sql: Map[String, String] = Map(
    // full-corpus ADC: every vector scored from its codes, top-R cut,
    // exact re-rank
    "sim_topk_pq" ->
      s"""WITH ${Oracle2.vecCte},
        |$quantCte,
        |${subspaceCtes("", "q")},
        |$dtCte,
        |$adcCte,
        |${rerankTail(topRCand)}""".stripMargin,

    // IVF-PQ: the trained coarse quantizer restricts ADC to vectors
    // homed in the query's NProbe cells (codes still encode the RAW
    // vectors — the IVF-Flat-with-PQ-scoring composition)
    "sim_topk_ivfpq" ->
      s"""WITH ${Oracle2.vecCte},
        |$quantCte,
        |${subspaceCtes("", "q")},
        |$coarseCtes,
        |$dtCte,
        |$adcCte,
        |${rerankTail(
          s"""cand AS (
            |  SELECT query_id, vec_id, adist FROM (
            |    SELECT a.*, row_number() OVER (PARTITION BY a.query_id
            |      ORDER BY a.adist, a.vec_id) AS rn
            |    FROM adc a
            |      JOIN home h ON h.vec_id = a.vec_id
            |      JOIN qprobe p ON p.query_id = a.query_id AND p.cell = h.cell)
            |  WHERE rn <= $R)""".stripMargin)}""".stripMargin,

    // RESIDUAL IVF-PQ (the published IVFADC): codebooks trained on
    // and codes encoding qv − centroid(home cell); ADC tables are
    // per-(query, probed cell) residuals against that cell's centroid
    "sim_topk_ivfpq_res" ->
      s"""WITH ${Oracle2.vecCte},
        |$quantCte,
        |$coarseCtes,
        |resid AS (
        |  SELECT q.vec_id,
        |    [ q.qv[i] - c.cv[i] for i in range(1, len(q.qv) + 1) ] AS qv
        |  FROM q JOIN home h ON h.vec_id = q.vec_id
        |         JOIN cc1 c ON c.cid = h.cell),
        |${subspaceCtes("r", "resid")},
        |qres AS (
        |  SELECT p.query_id, p.cell,
        |    [ q.qv[i] - c.cv[i] for i in range(1, len(q.qv) + 1) ] AS rv
        |  FROM qprobe p JOIN q ON q.vec_id = p.query_id
        |       JOIN cc1 c ON c.cid = p.cell),
        |qrsub AS (
        |  SELECT query_id, cell, ss.sub,
        |    rv[(ss.sub * $SubDim + 1):(ss.sub * $SubDim + $SubDim)] AS sqv
        |  FROM qres, (SELECT unnest(range(0, $M)) AS sub) ss),
        |rdt AS (
        |  SELECT t.query_id, t.cell, t.sub, c.cid,
        |    CAST(list_sum([ (t.sqv[i] - c.cv[i]) * (t.sqv[i] - c.cv[i])
        |                    for i in range(1, len(t.sqv) + 1) ]) AS BIGINT) AS d
        |  FROM qrsub t JOIN rcb c USING (sub)),
        |radc AS (
        |  SELECT d.query_id, k.vec_id, CAST(sum(d.d) AS BIGINT) AS adist
        |  FROM rcodes k
        |    JOIN home h ON h.vec_id = k.vec_id
        |    JOIN rdt d ON d.cell = h.cell AND d.sub = k.sub AND d.cid = k.cid
        |  WHERE k.vec_id <> d.query_id
        |  GROUP BY d.query_id, k.vec_id),
        |${rerankTail(
          s"""cand AS (
            |  SELECT query_id, vec_id, adist FROM (
            |    SELECT *, row_number() OVER (PARTITION BY query_id
            |      ORDER BY adist, vec_id) AS rn
            |    FROM radc) WHERE rn <= $R)""".stripMargin)}""".stripMargin)
}
