package graft.queries

import graft.sim.{KmeansQuantizer, PqQuantizer, Similarity}

/** DuckDB oracle SQL for the product-quantization ANN paths
  * (sim_topk_pq / sim_topk_ivfpq). The whole pipeline is fixed-point
  * integer arithmetic until the final double cosine — quantize at
  * scale 2^20, per-subspace one-Lloyd-step codebooks seeded from the
  * first KS vectors' subvectors, argmin encodes with ties to the lower
  * code id, exact-i64 ADC table sums — so codebooks, codes, every ADC
  * distance, the top-R candidate cut, AND the re-ranked cosine all
  * hash-check bit-for-bit (cosines via the list_inner_product ==
  * sequential-loop DotProduct equivalence established in [[Oracle2]]).
  *
  * Dialect notes: DuckDB list slices are 1-based inclusive
  * (`qv[a:b]`); BIGINT sums widen to HUGEINT → cast back; row_number
  * is BIGINT → cast the rank to INT to match Spark's IntegerType. */
object Oracle9 {

  private val M = PqQuantizer.M
  private val SubDim = PqQuantizer.SubDim
  private val KS = PqQuantizer.KS
  private val NQ = Similarity.NumQueries
  private val R = Similarity.PqRerank
  private val K = Similarity.K

  /** Quantize → subspace split → per-subspace codebooks → codes → the
    * queries' ADC distance tables. Shared verbatim by both PQ oracles;
    * twin of [[graft.sim.PqQuantizer]]. */
  private val pqCtes =
    s"""q AS (
      |  SELECT vec_id,
      |    [CAST(floor(CAST(x AS DOUBLE) * ${KmeansQuantizer.Scale} + 0.5) AS BIGINT)
      |     for x in embedding] AS qv
      |  FROM embeddings),
      |sub AS (
      |  SELECT vec_id, ss.sub,
      |    qv[(ss.sub * $SubDim + 1):(ss.sub * $SubDim + $SubDim)] AS sqv
      |  FROM q, (SELECT unnest(range(0, $M)) AS sub) ss),
      |pseeds AS (
      |  SELECT sub, CAST(vec_id AS INT) AS cid, sqv AS cv FROM sub
      |  WHERE vec_id < $KS),
      |pd1 AS (
      |  SELECT t.vec_id, t.sub, t.sqv, s.cid,
      |    CAST(list_sum([ (t.sqv[i] - s.cv[i]) * (t.sqv[i] - s.cv[i])
      |                    for i in range(1, len(t.sqv) + 1) ]) AS BIGINT) AS dist
      |  FROM sub t JOIN pseeds s USING (sub)),
      |pa1 AS (
      |  SELECT sub, cid, sqv FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
      |      ORDER BY dist, cid) AS rn
      |    FROM pd1) WHERE rn = 1),
      |pcells AS (
      |  SELECT sub, cid, pos,
      |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS cval
      |  FROM (SELECT sub, cid, unnest(range(0, len(sqv))) AS pos,
      |          unnest(sqv) AS x FROM pa1)
      |  GROUP BY sub, cid, pos),
      |pcb AS (SELECT sub, cid, list(cval ORDER BY pos) AS cv
      |        FROM pcells GROUP BY sub, cid),
      |penc AS (
      |  SELECT t.vec_id, t.sub, c.cid,
      |    CAST(list_sum([ (t.sqv[i] - c.cv[i]) * (t.sqv[i] - c.cv[i])
      |                    for i in range(1, len(t.sqv) + 1) ]) AS BIGINT) AS dist
      |  FROM sub t JOIN pcb c USING (sub)),
      |codes AS (
      |  SELECT vec_id, sub, cid FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id, sub
      |      ORDER BY dist, cid) AS rn
      |    FROM penc) WHERE rn = 1),
      |dt AS (
      |  SELECT p.vec_id AS query_id, p.sub, p.cid, p.dist AS d
      |  FROM penc p WHERE p.vec_id < $NQ)""".stripMargin

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
    * shared tail of both PQ oracles; `cand` must provide (query_id,
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

  val sql: Map[String, String] = Map(
    // full-corpus ADC: every vector scored from its codes, top-R cut,
    // exact re-rank
    "sim_topk_pq" ->
      s"""WITH ${Oracle2.vecCte},
        |$pqCtes,
        |$adcCte,
        |${rerankTail(
          s"""cand AS (
            |  SELECT query_id, vec_id, adist FROM (
            |    SELECT *, row_number() OVER (PARTITION BY query_id
            |      ORDER BY adist, vec_id) AS rn
            |    FROM adc) WHERE rn <= $R)""".stripMargin)}""".stripMargin,

    // IVF-PQ: the trained coarse quantizer (KCells one-Lloyd-step
    // codebook, exact i64 routing — verbatim from the
    // sim_topk_ivf_trained oracle) restricts ADC to vectors homed in
    // the query's NProbe cells
    "sim_topk_ivfpq" ->
      s"""WITH ${Oracle2.vecCte},
        |$pqCtes,
        |cseeds AS (
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
        |           WHERE rn <= ${Similarity.NProbe} AND vec_id < $NQ),
        |$adcCte,
        |${rerankTail(
          s"""cand AS (
            |  SELECT query_id, vec_id, adist FROM (
            |    SELECT a.*, row_number() OVER (PARTITION BY a.query_id
            |      ORDER BY a.adist, a.vec_id) AS rn
            |    FROM adc a
            |      JOIN home h ON h.vec_id = a.vec_id
            |      JOIN qprobe p ON p.query_id = a.query_id AND p.cell = h.cell)
            |  WHERE rn <= $R)""".stripMargin)}""".stripMargin)
}
