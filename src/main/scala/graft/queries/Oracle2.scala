package graft.queries

/** DuckDB oracle SQL for [[Declared2]] plus the round-2 upgrades of
  * previously rows-only checks to full hash checks:
  *
  *  - `sim_topk_bruteforce`, `sim_topk_lsh`, `dedup_embedding_cosine`:
  *    verified empirically that DuckDB 1.0's `list_inner_product` over
  *    DOUBLE[] is bit-identical to our codegen'd sequential-loop
  *    DotProduct (both are left-to-right double accumulation), so every
  *    cosine in these queries is the same IEEE value in both engines —
  *    no float-order caveat remains. The LSH oracle embeds the seeded
  *    hyperplane constants (Similarity.planes) as SQL array literals;
  *    Double.toString round-trips exactly through DuckDB's parser.
  *  - `mm_decode_features`: the corpus is ASCII (verified per-lang), so
  *    the FakeCodec byte-hash equals a char-hash via ascii() and the
  *    whole decode stub is SQL-expressible.
  *
  * Same dialect notes as [[Oracle]] (BIGINT vs INT casts, HUGEINT sums,
  * TIMESTAMP_NS truncation).
  */
object Oracle2 {

  private[queries] def sqlArray(xs: Array[Double]): String =
    xs.map(_.toString).mkString("[", ", ", "]")

  /** `vec_id, v (DOUBLE[]), norm` CTE shared by the vector oracles —
    * mirrors Similarity.vcol / Dedup.embeddingCosine's normalization. */
  private[queries] val vecCte =
    """e AS (
      |  SELECT vec_id, label, embedding::DOUBLE[] AS v,
      |    sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
      |  FROM embeddings)""".stripMargin

  /** SQL twin of [[Declared2.hashSample]] — one definition, substituted
    * into every sampling oracle. The inner `(x % m + m) % m` mirrors
    * Spark's pmod (always non-negative); DuckDB's bare `%` keeps the
    * dividend's sign, which would pick a different sample for any
    * negative key. No-op for the positive TPC-H keys, but keeps the two
    * definitions identical on ALL int64 inputs. */
  private def hashSampleSql(key: String): String =
    s"(((($key % 2147483647) + 2147483647) % 2147483647) * 2654435761) % 4294967296"

  /** SQL twin of FakeCodec.decode's modality/checksum/geometry derivation
    * (ASCII corpus ⟹ byte-hash == ascii(char)-hash) — shared by the
    * mm_decode_features and mm_resize oracles so the stub has ONE SQL
    * mirror. */
  private[queries] val mmDecodeCte =
    """m AS (
      |  SELECT doc_id AS media_id,
      |    (['image', 'audio', 'video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |    list_reduce(list_prepend(CAST(0 AS BIGINT),
      |      list_transform(list_filter(string_split(text, ''), c -> c <> ''),
      |        c -> CAST(ascii(c) AS BIGINT))),
      |      (a, b) -> (a * 31 + b) % 1000000007) AS checksum
      |  FROM documents),
      |d AS (
      |  SELECT media_id, modality, n_bytes, checksum,
      |    CAST(16 + (checksum % 64) AS INT) AS width,
      |    CAST(16 + ((checksum // 64) % 64) AS INT) AS height
      |  FROM m)""".stripMargin

  /** SQL twin of Similarity.exactCentroidRows — the deterministic
    * scaled-int centroid components, shared by the sim_centroids_exact
    * and sim_topk_ivf oracles. Yields cd(label, dim, c) with dim
    * 1-based. */
  /** Fixed-point TRAINED coarse assignment, shared verbatim by the
    * `sim_topk_ivf_trained` and `dedup_semantic` oracles: quantize to
    * scaled i64, seed-assign (vec_id < k), one exact-integer Lloyd
    * update, then rank every (vector, centroid) by exact i64 L2 with
    * ties to the lower cid — `ranked.rn = 1` is the home cell. One
    * definition, so the two hash checks pin the SAME trainer. */
  private val trainedRankCte =
    s"""q AS (
      |  SELECT vec_id,
      |    [CAST(floor(CAST(x AS DOUBLE) * ${graft.sim.KmeansQuantizer.Scale} + 0.5) AS BIGINT)
      |     for x in embedding] AS qv
      |  FROM embeddings),
      |seeds AS (
      |  SELECT CAST(vec_id AS INT) AS cid, qv AS cv FROM q
      |  WHERE vec_id < ${graft.sim.Similarity.KCells}),
      |d1 AS (
      |  SELECT q.vec_id, q.qv, s.cid,
      |    CAST(list_sum([ (q.qv[i] - s.cv[i]) * (q.qv[i] - s.cv[i])
      |                    for i in range(1, len(q.qv) + 1) ]) AS BIGINT) AS dist
      |  FROM q CROSS JOIN seeds s),
      |a1 AS (
      |  SELECT vec_id, qv, cid FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |    FROM d1) WHERE rn = 1),
      |cells AS (
      |  SELECT cid, pos,
      |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS cval
      |  FROM (SELECT cid, unnest(range(0, len(qv))) AS pos, unnest(qv) AS x FROM a1)
      |  GROUP BY cid, pos),
      |c1 AS (SELECT cid, list(cval ORDER BY pos) AS cv FROM cells GROUP BY cid),
      |d2 AS (
      |  SELECT q.vec_id, c.cid,
      |    CAST(list_sum([ (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])
      |                    for i in range(1, len(q.qv) + 1) ]) AS BIGINT) AS dist
      |  FROM q CROSS JOIN c1 c),
      |ranked AS (
      |  SELECT vec_id, cid,
      |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      |  FROM d2)""".stripMargin

  private val centroidCte =
    """ex AS (
      |  SELECT label, CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
      |    unnest(embedding)::DOUBLE AS x
      |  FROM embeddings),
      |cd AS (
      |  SELECT label, dim,
      |    CAST(SUM(CAST(floor(x * 1000000.0) AS BIGINT)) AS DOUBLE) / count(*) / 1000000.0 AS c
      |  FROM ex GROUP BY label, dim)""".stripMargin

  private[queries] def lshBucketExpr: String =
    graft.sim.Similarity.planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_inner_product(${sqlArray(p)}, v) > 0 THEN ${1 << i} ELSE 0 END)"
    }.mkString(" + ")

  private[queries] val lshProbes: String =
    (0 +: (0 until graft.sim.Similarity.NumPlanes).map(1 << _)).mkString("[", ", ", "]")

  val oracleSql: Map[String, String] = Map(
    // same oracle as q19 — the variant path must agree with the string
    // path. TRY_CAST, not CAST: on a malformed/non-numeric $.k Spark's
    // try_parse_json/variant_get yields NULL, and a strict DuckDB CAST
    // would abort the whole oracle query instead of matching.
    "q19b_variant" ->
      """SELECT CASE WHEN k % 2 = 0 THEN 'even' ELSE 'odd' END AS parity,
        |  count(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM (SELECT TRY_CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |GROUP BY 1 ORDER BY parity""".stripMargin,

    "q22_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) / 100.0 AS total_f,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) / 100.0 AS total_o,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) / 100.0 AS total_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q23_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS p25,
        |  quantile_cont(l_quantity, 0.5)  AS p50,
        |  quantile_cont(l_quantity, 0.75) AS p75,
        |  quantile_cont(l_quantity, 0.99) AS p99,
        |  count(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q24_stratified_sample" ->
      s"""SELECT o_orderpriority, count(*) AS n_sampled,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sampled_total
        |FROM orders
        |WHERE ${hashSampleSql("o_orderkey")} <
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 858993459 ELSE 429496729 END
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q25_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      - lag(epoch_us(CAST(ts AS TIMESTAMP))) OVER w AS gap_us
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |), s AS (
        |  SELECT user_id, event_id, ts,
        |    CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END)
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS session_idx
        |  FROM g)
        |SELECT user_id, session_idx, count(*) AS n_events,
        |  min(ts) AS session_start, max(ts) AS session_end,
        |  epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
        |FROM s GROUP BY user_id, session_idx ORDER BY user_id, session_idx""".stripMargin,

    "q26_histogram" ->
      """SELECT CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT) AS bucket_lo,
        |  count(*) AS n,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        |FROM orders GROUP BY 1 ORDER BY bucket_lo""".stripMargin,

    "q27_regex" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^(\w+)', 1) AS first_word,
        |  regexp_extract(p_type, '(\w+)$', 1) AS last_type_word,
        |  regexp_replace(p_name, '[aeiou]', '', 'g') AS devoweled,
        |  regexp_matches(p_name, 's$') AS plural_ish
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q15c_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total,
        |  count(*) AS n,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        |FROM orders GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY g_status, g_prio,
        |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q28_array_hof" ->
      """SELECT vec_id,
        |  CAST(list_sum(list_transform(embedding::DOUBLE[],
        |    x -> CAST(floor(x * 1000000) AS BIGINT))) AS BIGINT) AS sum_scaled,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |  list_max(embedding::DOUBLE[]) AS max_val,
        |  list_min(embedding::DOUBLE[]) AS min_val
        |FROM embeddings WHERE len(embedding) > 0 ORDER BY vec_id""".stripMargin,

    // the zip-with-reverse pairing re-expressed relationally: element at
    // dim pairs with element at (n - dim + 1)
    "q28b_zipwith" ->
      """WITH z AS (
        |  SELECT vec_id, len(embedding) AS n,
        |    CAST(generate_subscripts(embedding, 1) AS INT) AS dim,
        |    unnest(embedding)::DOUBLE AS x
        |  FROM embeddings WHERE len(embedding) > 0)
        |SELECT a.vec_id,
        |  CAST(SUM(CAST(floor(a.x * 1000) AS BIGINT) * CAST(floor(b.x * 1000) AS BIGINT)) AS BIGINT) AS rev_dot_scaled
        |FROM z a JOIN z b ON a.vec_id = b.vec_id AND b.dim = a.n - a.dim + 1
        |GROUP BY a.vec_id ORDER BY a.vec_id""".stripMargin,

    "q30_window_dist" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  first_value(o_orderkey) OVER wf AS cheapest_key,
        |  last_value(o_orderkey) OVER wf AS priciest_key
        |FROM orders WHERE o_custkey <= 100
        |WINDOW
        |  w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey),
        |  wf AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_orderpriority, o_orderkey""".stripMargin,

    // unnest + generate_subscripts zip positionally (Postgres-style SRF
    // pairing) — the lateral-range form is unsupported in DuckDB 1.0
    "sim_centroids_exact" ->
      s"""WITH $centroidCte
        |SELECT label, dim, c
        |FROM cd ORDER BY label, dim""".stripMargin,

    "q29_full_outer" ->
      """WITH a AS (
        |  SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 8000),
        |b AS (
        |  SELECT o_custkey, count(*) AS n_big,
        |    CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS big_total
        |  FROM orders WHERE o_totalprice > 400000 GROUP BY o_custkey)
        |SELECT COALESCE(a.c_custkey, b.o_custkey) AS custkey, a.c_name,
        |  COALESCE(b.n_big, 0) AS n_big,
        |  COALESCE(b.big_total, 0.0) AS big_total
        |FROM a FULL OUTER JOIN b ON a.c_custkey = b.o_custkey
        |ORDER BY custkey""".stripMargin,

    "q14b_multiset_ops" ->
      """WITH a AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 150000),
        |     b AS (SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
        |SELECT '1_intersect_all' AS op, c_custkey
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        |UNION ALL
        |SELECT '2_except_all', c_custkey
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        |ORDER BY op, c_custkey""".stripMargin,

    "q31_corr_subquery" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE o_totalprice > 1.5 * (
        |  SELECT CAST(SUM(CAST(floor(o2.o_totalprice * 100) AS BIGINT)) AS DOUBLE)
        |         / count(*) / 100.0
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q22b_unpivot" ->
      """WITH p AS (
        |  SELECT o_orderpriority,
        |    CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) / 100.0 AS total_f,
        |    CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'O') AS DOUBLE) / 100.0 AS total_o,
        |    CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) FILTER (WHERE o_orderstatus = 'P') AS DOUBLE) / 100.0 AS total_p
        |  FROM orders GROUP BY o_orderpriority)
        |SELECT o_orderpriority, status_col, total FROM (
        |  SELECT o_orderpriority, 'total_f' AS status_col, total_f AS total FROM p
        |  UNION ALL SELECT o_orderpriority, 'total_o', total_o FROM p
        |  UNION ALL SELECT o_orderpriority, 'total_p', total_p FROM p)
        |WHERE total IS NOT NULL
        |ORDER BY o_orderpriority, status_col""".stripMargin,

    "q33_date_arith" ->
      """SELECT o_orderkey,
        |  CAST(o_orderdate AS DATE) AS d,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 45 DAY AS DATE) AS plus_45d,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom,
        |  CAST(quarter(o_orderdate) AS INT) AS q,
        |  CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
        |  CAST(isodow(o_orderdate) AS INT) AS iso_dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // the map is reconstructed relationally: 2 entries per order
    "q34_map_fns" ->
      """WITH o AS (SELECT o_orderkey, o_orderstatus, o_orderpriority
        |           FROM orders WHERE o_custkey <= 100)
        |SELECT o_orderkey, 2 AS n_entries, o_orderstatus AS status_lookup,
        |       'status' AS key, o_orderstatus AS value FROM o
        |UNION ALL
        |SELECT o_orderkey, 2, o_orderstatus, 'prio', o_orderpriority FROM o
        |ORDER BY o_orderkey, key""".stripMargin,

    "q32_string_agg" ->
      """SELECT o_custkey, count(*) AS n,
        |  string_agg(o_orderstatus, '' ORDER BY o_orderdate, o_orderkey) AS status_history
        |FROM orders WHERE o_custkey <= 200
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "pipeline_curate" ->
      s"""WITH t AS (
        |  SELECT doc_id, lang,
        |    list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens
        |  FROM t
        |  WHERE len(toks) >= 20 AND len(toks) <= 1000
        |    AND len(list_distinct(toks)) >= 10),
        |keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text))
        |SELECT q.doc_id, q.lang, q.n_tokens
        |FROM q JOIN keep ON q.doc_id = keep.doc_id
        |WHERE ${hashSampleSql("q.doc_id")} < 2147483648
        |ORDER BY q.doc_id""".stripMargin,

    "mm_resize" ->
      s"""WITH $mmDecodeCte
        |SELECT media_id, modality, width, height,
        |  CAST(greatest(1, floor(width  * (224.0 / greatest(width, height)))) AS INT) AS out_w,
        |  CAST(greatest(1, floor(height * (224.0 / greatest(width, height)))) AS INT) AS out_h
        |FROM d ORDER BY media_id""".stripMargin,

    // every-2nd-frame sampling of the video subset; frame count is the
    // same FakeCodec stub arithmetic the decode oracle mirrors
    "mm_frame_sample" ->
      s"""WITH $mmDecodeCte
        |SELECT media_id, CAST(1 + (n_bytes % 8) AS INT) AS n_frames,
        |  CAST(unnest(range(0, CAST(1 + (n_bytes % 8) AS INT), 2)) AS INT) AS frame_idx
        |FROM d WHERE modality = 'video'
        |ORDER BY media_id, frame_idx""".stripMargin,

    // ---- upgrades of previously rows-only checks ----
    "sim_topk_bruteforce" ->
      s"""WITH $vecCte,
        |q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm
        |      FROM e WHERE vec_id < ${graft.sim.Similarity.NumQueries})
        |SELECT query_id, vec_id, rank, cos_sim FROM (
        |  SELECT q.query_id, e.vec_id,
        |    list_inner_product(q.qv, e.v) / (q.qnorm * e.norm) AS cos_sim,
        |    CAST(row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_inner_product(q.qv, e.v) / (q.qnorm * e.norm) DESC,
        |               e.vec_id) AS INT) AS rank
        |  FROM e, q WHERE e.vec_id <> q.query_id)
        |WHERE rank <= ${graft.sim.Similarity.K}
        |ORDER BY query_id, rank""".stripMargin,

    "sim_topk_lsh" ->
      s"""WITH $vecCte,
        |b AS (SELECT vec_id, v, norm, $lshBucketExpr AS bucket FROM e),
        |q AS (SELECT vec_id AS query_id, qv, qnorm, xor(b.bucket, t.m) AS bucket
        |      FROM (SELECT vec_id, v AS qv, norm AS qnorm, bucket FROM b
        |            WHERE vec_id < ${graft.sim.Similarity.NumQueries}) b,
        |        unnest($lshProbes) AS t(m))
        |SELECT query_id, vec_id, rank, cos_sim FROM (
        |  SELECT q.query_id, b.vec_id,
        |    list_inner_product(q.qv, b.v) / (q.qnorm * b.norm) AS cos_sim,
        |    CAST(row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_inner_product(q.qv, b.v) / (q.qnorm * b.norm) DESC,
        |               b.vec_id) AS INT) AS rank
        |  FROM b JOIN q USING (bucket) WHERE b.vec_id <> q.query_id)
        |WHERE rank <= ${graft.sim.Similarity.K}
        |ORDER BY query_id, rank""".stripMargin,

    // IVF: the deterministic coarse quantizer (exact scaled-int label
    // centroids) is rebuilt IN SQL, so the whole index + probe + rank
    // path is hash-checked end-to-end
    "sim_topk_ivf" ->
      s"""WITH $vecCte,
        |$centroidCte,
        |cents AS (
        |  SELECT label AS cell, list(c ORDER BY dim) AS cv FROM cd GROUP BY label),
        |cn AS (
        |  SELECT cell, cv, sqrt(list_inner_product(cv, cv)) AS cnorm FROM cents),
        |asg AS (
        |  SELECT e.vec_id, cn.cell,
        |    row_number() OVER (PARTITION BY e.vec_id
        |      ORDER BY list_inner_product(e.v, cn.cv) / (e.norm * cn.cnorm) DESC,
        |               cn.cell) AS rn
        |  FROM e, cn),
        |home AS (SELECT vec_id, cell FROM asg WHERE rn = 1),
        |qprobe AS (SELECT vec_id AS query_id, cell FROM asg
        |           WHERE rn <= ${graft.sim.Similarity.NProbe}
        |             AND vec_id < ${graft.sim.Similarity.NumQueries}),
        |qv AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm
        |       FROM e WHERE vec_id < ${graft.sim.Similarity.NumQueries})
        |SELECT query_id, vec_id, rank, cos_sim FROM (
        |  SELECT q.query_id, h.vec_id,
        |    list_inner_product(qv.qv, e.v) / (qv.qnorm * e.norm) AS cos_sim,
        |    CAST(row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_inner_product(qv.qv, e.v) / (qv.qnorm * e.norm) DESC,
        |               h.vec_id) AS INT) AS rank
        |  FROM qprobe q
        |    JOIN home h USING (cell)
        |    JOIN qv USING (query_id)
        |    JOIN e ON e.vec_id = h.vec_id
        |  WHERE h.vec_id <> q.query_id)
        |WHERE rank <= ${graft.sim.Similarity.K}
        |ORDER BY query_id, rank""".stripMargin,

    // Trained-codebook IVF: the one-Lloyd-step fixed-point codebook
    // (KmeansQuantizer, k = KCells, seeds = vec_id < k) is rebuilt IN
    // SQL — quantize, seed-assign, exact-integer centroid update — then
    // cell routing by exact i64 L2 and candidate ranking by exact
    // double cosine, so the ENTIRE train → assign → probe → rank path
    // is hash-checked end-to-end.
    "sim_topk_ivf_trained" ->
      s"""WITH $vecCte,
        |$trainedRankCte,
        |home AS (SELECT vec_id, cid AS cell FROM ranked WHERE rn = 1),
        |qprobe AS (SELECT vec_id AS query_id, cid AS cell FROM ranked
        |           WHERE rn <= ${graft.sim.Similarity.NProbe}
        |             AND vec_id < ${graft.sim.Similarity.NumQueries}),
        |qv AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm
        |       FROM e WHERE vec_id < ${graft.sim.Similarity.NumQueries})
        |SELECT query_id, vec_id, rank, cos_sim FROM (
        |  SELECT p.query_id, h.vec_id,
        |    list_inner_product(qv.qv, e.v) / (qv.qnorm * e.norm) AS cos_sim,
        |    CAST(row_number() OVER (PARTITION BY p.query_id
        |      ORDER BY list_inner_product(qv.qv, e.v) / (qv.qnorm * e.norm) DESC,
        |               h.vec_id) AS INT) AS rank
        |  FROM qprobe p
        |    JOIN home h USING (cell)
        |    JOIN qv USING (query_id)
        |    JOIN e ON e.vec_id = h.vec_id
        |  WHERE h.vec_id <> p.query_id)
        |WHERE rank <= ${graft.sim.Similarity.K}
        |ORDER BY query_id, rank""".stripMargin,

    // SemDeDup: trained-cell assignment (the shared trainedRankCte), then
    // within-cell-only pair decisions — a vector drops when a lower-id
    // cellmate sits at cos >= tau. Unit vectors exclude zero norms
    // exactly like the Spark side's unitVectors.
    "dedup_semantic" ->
      s"""WITH $vecCte,
        |$trainedRankCte,
        |u AS (SELECT vec_id, list_transform(v, x -> x / norm) AS u
        |      FROM e WHERE norm > 0),
        |j AS (SELECT r.vec_id, r.cid AS cell, u.u
        |      FROM ranked r JOIN u USING (vec_id) WHERE r.rn = 1),
        |drops AS (
        |  SELECT b.cell, b.vec_id FROM j a JOIN j b
        |    ON a.cell = b.cell AND a.vec_id < b.vec_id
        |  WHERE list_inner_product(a.u, b.u) >= ${graft.dedup.Dedup.SemDedupTau}
        |  GROUP BY b.cell, b.vec_id),
        |da AS (SELECT cell, count(*) AS n_dropped,
        |         CAST(sum(vec_id) AS BIGINT) AS drop_id_sum
        |       FROM drops GROUP BY cell)
        |SELECT j.cell, count(*) AS n_vecs,
        |  coalesce(any_value(da.n_dropped), 0) AS n_dropped,
        |  CAST(coalesce(any_value(da.drop_id_sum), 0) AS BIGINT) AS drop_id_sum
        |FROM j LEFT JOIN da ON j.cell = da.cell
        |GROUP BY j.cell
        |ORDER BY j.cell""".stripMargin,

    "dedup_embedding_cosine" ->
      s"""WITH $vecCte,
        |u AS (SELECT vec_id, list_transform(v, x -> x / norm) AS u FROM e)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |  list_inner_product(a.u, b.u) AS cos_sim
        |FROM u a, u b
        |WHERE a.vec_id < b.vec_id AND list_inner_product(a.u, b.u) >= 0.35
        |ORDER BY vec_a, vec_b""".stripMargin,

    // capped pair list: same pairs, ranked per vec_a by (cos_sim DESC,
    // vec_b) and cut at PairListK — cos_sim is bit-identical across
    // engines, so the rank (and the kept rows) hash-check
    "dedup_embedding_topk" ->
      s"""WITH $vecCte,
        |u AS (SELECT vec_id, list_transform(v, x -> x / norm) AS u FROM e),
        |p AS (
        |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |    list_inner_product(a.u, b.u) AS cos_sim
        |  FROM u a, u b
        |  WHERE a.vec_id < b.vec_id AND list_inner_product(a.u, b.u) >= 0.35)
        |SELECT vec_a, vec_b, cos_sim, rk FROM (
        |  SELECT vec_a, vec_b, cos_sim,
        |    CAST(row_number() OVER (PARTITION BY vec_a
        |      ORDER BY cos_sim DESC, vec_b) AS INT) AS rk
        |  FROM p)
        |WHERE rk <= ${graft.dedup.Dedup.PairListK}
        |ORDER BY vec_a, rk""".stripMargin,

    // REAL-decode check: the Spark side PNG-encodes a procedural raster
    // and decodes it back through javax.imageio; this oracle computes
    // the same pixel statistics from the closed-form (id, x, y)
    // arithmetic WITHOUT any codec. The hashes agree only if the
    // engine's decode round trip reproduces every pixel exactly. The
    // geometry/channel formulas are the literal mirrors of
    // Multimodal.ImageIoCodec.imgW/imgH/pxR/pxG/pxB.
    "mm_decode_features" ->
      """WITH d AS (
        |  SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
        |    CAST(8 + doc_id % 7 AS INT) AS h
        |  FROM documents),
        |px AS (
        |  SELECT doc_id, w, h, CAST(x.i AS BIGINT) AS x, CAST(y.i AS BIGINT) AS y,
        |    ((doc_id % 256) * 7 + x.i * 3 + y.i * 5) % 256 AS r,
        |    ((doc_id % 256) * 11 + x.i * 5 + y.i * 7) % 256 AS g,
        |    ((doc_id % 256) * 13 + x.i * 7 + y.i * 11) % 256 AS b
        |  FROM d, range(16) x(i), range(14) y(i)
        |  WHERE x.i < w AND y.i < h)
        |SELECT doc_id AS media_id, w AS width, h AS height,
        |  CAST(count(*) AS BIGINT) AS n_px,
        |  CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(sum((x * 17 + y * 29) * (r + g + b)) AS BIGINT) AS xy_moment
        |FROM px GROUP BY doc_id, w, h ORDER BY media_id""".stripMargin)
}
