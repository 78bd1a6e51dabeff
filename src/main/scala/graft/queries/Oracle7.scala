package graft.queries

/** DuckDB oracle SQL for [[Declared7]]. Same dialect contract as
  * [[Oracle]]..[[Oracle6]] — Scala constants interpolated so tuning
  * cannot desynchronize the engines, BIGINT casts around DuckDB's
  * HUGEINT widening, `//` (DuckDB) paired with `div` (Spark) for exact
  * floor division, money in integer cents, `CAST(ts AS TIMESTAMP)` for
  * the NANOS→µs events timestamps. The q80 recall oracle composes
  * [[Oracle2]]'s shared vector CTE and LSH bucket expression so the
  * brute/LSH formulations stay defined in exactly one place. */
object Oracle7 {
  import Declared7.{PostCap, TopNext, AnomWin, AnomK, KnnK, KnnLabel,
    WinsLoPct, WinsHiPct, BpeIters, BpeVocabCap}

  /** Unrolled BPE training: one CTE block per merge iteration. The
    * greedy non-overlapping apply step is expressed as run-parity
    * position algebra: within each maximal run of consecutive matched
    * positions, keep every second position starting at the run head
    * (exactly the left-to-right scan's choices), then drop each kept
    * position's right neighbor when rebuilding the symbol list. */
  /** The WITH-body of the training chain, shared by the q77 (merges
    * out) and q89 (encode) oracles. Key CTEs are `AS MATERIALIZED`:
    * DuckDB inlines CTEs by default, and each round references the
    * previous round's `st` several times — inlined, the re-evaluation
    * compounds per round (measured 74 s → 0.2 s at sf0.01 for the
    * encode query, identical rows). */
  private def bpeCtes(src: String = "documents"): String = {
    val iters = (1 to BpeIters).map { i =>
      s"""p$i AS MATERIALIZED (
         |  SELECT s.word, s.cnt, t.i AS pos, s.syms[t.i] AS l, s.syms[t.i+1] AS r
         |  FROM st${i - 1} s, unnest(range(1, len(s.syms))) AS t(i)),
         |g$i AS (SELECT l, r, CAST(sum(cnt) AS BIGINT) AS total FROM p$i GROUP BY l, r),
         |m$i AS MATERIALIZED (SELECT l, r, total FROM g$i ORDER BY total DESC, l, r LIMIT 1),
         |mt$i AS (SELECT p.word, p.pos FROM p$i p, m$i m WHERE p.l = m.l AND p.r = m.r),
         |rk$i AS (SELECT word, pos,
         |    pos - row_number() OVER (PARTITION BY word ORDER BY pos) AS run
         |  FROM mt$i),
         |keep$i AS MATERIALIZED (SELECT word, pos FROM (
         |    SELECT word, pos, pos - min(pos) OVER (PARTITION BY word, run) AS off
         |    FROM rk$i)
         |  WHERE off % 2 = 0),
         |u$i AS (SELECT s.word, s.cnt, t.i AS pos, s.syms[t.i] AS sym
         |  FROM st${i - 1} s, unnest(range(1, len(s.syms) + 1)) AS t(i)),
         |st$i AS MATERIALIZED (
         |  SELECT u.word, max(u.cnt) AS cnt,
         |    list(CASE WHEN k.pos IS NOT NULL THEN (SELECT l || r FROM m$i)
         |              ELSE u.sym END ORDER BY u.pos) AS syms
         |  FROM u$i u LEFT JOIN keep$i k ON u.word = k.word AND u.pos = k.pos
         |  WHERE NOT EXISTS (SELECT 1 FROM keep$i kk
         |                    WHERE kk.word = u.word AND kk.pos + 1 = u.pos)
         |  GROUP BY u.word)""".stripMargin
    }.mkString(",\n")
    s"""w AS (
       |  SELECT term AS word, CAST(count(*) AS BIGINT) AS cnt FROM (
       |    SELECT unnest(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')) AS term
       |    FROM $src)
       |  GROUP BY term ORDER BY cnt DESC, word LIMIT $BpeVocabCap),
       |st0 AS MATERIALIZED (SELECT word, cnt, string_split(word, '') AS syms FROM w),
       |$iters""".stripMargin
  }

  private val bpeSql: String = {
    val out = (1 to BpeIters)
      .map(i => s"SELECT CAST($i AS INT) AS iter, l AS lhs, r AS rhs, total FROM m$i")
      .mkString("\nUNION ALL\n")
    s"""WITH ${bpeCtes()}
       |SELECT * FROM (
       |$out
       |) ORDER BY iter""".stripMargin
  }

  /** Encode twin: continue from the final symbol table st{BpeIters} —
    * the per-word trained tokenization — and apply it to the document
    * word stream with character fallback for OOV words, mirroring the
    * Spark side's broadcast-join apply word for word. */
  private[queries] def bpeEncodeSqlFor(src: String): String =
    s"""WITH ${bpeCtes(src)},
       |docs AS (SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS words
       |  FROM $src),
       |dw AS (SELECT d.doc_id, CAST(t.i AS INT) AS pos, d.words[t.i] AS word
       |  FROM docs d, LATERAL (SELECT unnest(range(1, len(d.words) + 1)) AS i) t),
       |vt AS (SELECT word, list_aggregate(syms, 'string_agg', ' ') AS tok_str,
       |    len(syms) AS n_tok FROM st$BpeIters),
       |e AS (SELECT dw.doc_id, dw.pos,
       |    COALESCE(vt.tok_str, list_aggregate(
       |      list_filter(string_split(dw.word, ''), c -> c <> ''), 'string_agg', ' ')) AS tok_str,
       |    CAST(COALESCE(vt.n_tok, length(dw.word)) AS INT) AS n_tok,
       |    CASE WHEN vt.word IS NULL THEN 1 ELSE 0 END AS oov
       |  FROM dw LEFT JOIN vt USING (word)),
       |f AS (SELECT doc_id, pos, n_tok, oov,
       |    list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_filter(string_split(tok_str, ''), c -> c <> ''),
       |        c -> CAST(ascii(c) AS BIGINT))),
       |      (a, b) -> (a * 31 + b) % 1000000007) AS word_fp
       |  FROM e)
       |SELECT doc_id,
       |  CAST(count(*) AS BIGINT) AS n_words,
       |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
       |  CAST(sum(oov) AS BIGINT) AS n_oov,
       |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list(word_fp ORDER BY pos)),
       |    (h, x) -> (h * 1000003 + x) % 1000000007) AS BIGINT) AS doc_fp
       |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Unrolled greedy MMR: one (penalty, argmax, selected-union) CTE
    * block per pick after the first. Every cosine is the same
    * left-to-right double accumulation as the Spark side (the Oracle2
    * bit-exactness argument), and SQL `max` over the selected join
    * equals Spark's `greatest` over the same ≤ k values. */
  private val mmrSql: String = {
    val iters = (2 to Declared7.MmrK).map { i =>
      s"""pen$i AS (SELECT c.vec_id,
         |    max(list_inner_product(c.v, s.v) / (c.norm * s.norm)) AS pen
         |  FROM c JOIN selv${i - 1} s ON true
         |  WHERE c.vec_id NOT IN (SELECT vec_id FROM selv${i - 1})
         |  GROUP BY c.vec_id),
         |p$i AS (SELECT c.vec_id, c.rel - 0.5 * pen.pen AS score
         |  FROM c JOIN pen$i pen USING (vec_id)
         |  ORDER BY score DESC, c.vec_id LIMIT 1),
         |selv$i AS (SELECT vec_id, v, norm FROM selv${i - 1}
         |  UNION ALL SELECT c.vec_id, c.v, c.norm FROM c JOIN p$i USING (vec_id))""".stripMargin
    }.mkString(",\n")
    val out = (2 to Declared7.MmrK)
      .map(i => s"UNION ALL SELECT CAST($i AS INT), vec_id, score FROM p$i")
      .mkString("\n")
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
       |    sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
       |  FROM embeddings WHERE label = ${Declared7.KnnLabel}),
       |q AS (SELECT vec_id AS qid, v AS qv, norm AS qn FROM e ORDER BY vec_id LIMIT 1),
       |c AS (SELECT e.vec_id, e.v, e.norm,
       |    list_inner_product(e.v, q.qv) / (e.norm * q.qn) AS rel
       |  FROM e, q WHERE e.vec_id <> q.qid),
       |p1 AS (SELECT vec_id, rel AS score FROM c ORDER BY score DESC, vec_id LIMIT 1),
       |selv1 AS (SELECT c.vec_id, c.v, c.norm FROM c JOIN p1 USING (vec_id)),
       |$iters
       |SELECT * FROM (
       |SELECT CAST(1 AS INT) AS rank, vec_id, score FROM p1
       |$out
       |) ORDER BY rank""".stripMargin
  }

  private val baseSql: Map[String, String] = Map(
    "q88_mmr_select" -> mmrSql,

    // per-modality exact-dup summary over Oracle2's shared FakeCodec
    // checksum mirror (ASCII corpus ⟹ byte-hash == ascii(char)-hash)
    "mm_dedup_stats" ->
      s"""WITH ${Oracle2.mmDecodeCte}
        |SELECT modality, CAST(count(*) AS BIGINT) AS n_media,
        |  CAST(count(DISTINCT checksum) AS BIGINT) AS n_distinct,
        |  CAST(count(*) - count(DISTINCT checksum) AS BIGINT) AS dup_copies
        |FROM m GROUP BY modality ORDER BY modality""".stripMargin,
    // the custom merge-join as-of is row-identical to q21 by contract —
    // sharing the oracle text makes that equality driver-hash-checked
    "q21c_asof_custom" -> Oracle.oracleSql("q21_asof_join"),

    "q77_bpe_merges" -> bpeSql,
    "q89_bpe_encode" -> bpeEncodeSqlFor("documents"),

    // cross-set variant of Oracle3's dedup_minhash_portable text: the
    // identical portable LSH index (same generated band expressions),
    // candidates restricted to (new batch = src0) × (rest of corpus)
    "dedup_incremental" ->
      s"""WITH t AS (
        |  SELECT doc_id, source,
        |    list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source,
        |    list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS shs
        |  FROM t WHERE len(toks) >= 3),
        |h AS (
        |  SELECT doc_id, source,
        |    list_transform(shs, sh -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(list_filter(string_split(sh, ''), c -> c <> ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007)) AS h0
        |  FROM s),
        |b AS (SELECT doc_id, source, ${Oracle3.portableBandCols} FROM h),
        |bl AS (
        |  SELECT doc_id, source, 0 AS band, bh0 AS bh FROM b
        |  UNION ALL SELECT doc_id, source, 1, bh1 FROM b
        |  UNION ALL SELECT doc_id, source, 2, bh2 FROM b
        |  UNION ALL SELECT doc_id, source, 3, bh3 FROM b),
        |cand AS (
        |  SELECT DISTINCT n.doc_id AS doc_new, c.doc_id AS doc_old
        |  FROM bl n JOIN bl c ON n.band = c.band AND n.bh = c.bh
        |  WHERE n.source = 'src0' AND c.source <> 'src0'),
        |hs AS (SELECT doc_id, list_distinct(h0) AS hset FROM h)
        |SELECT doc_new, doc_old,
        |  CAST(len(list_intersect(x.hset, y.hset)) AS BIGINT) AS n_inter,
        |  CAST(len(x.hset) + len(y.hset) - len(list_intersect(x.hset, y.hset)) AS BIGINT) AS n_union,
        |  CAST(len(list_intersect(x.hset, y.hset)) AS DOUBLE) /
        |    CAST(len(x.hset) + len(y.hset) - len(list_intersect(x.hset, y.hset)) AS DOUBLE) AS jaccard
        |FROM cand
        |  JOIN hs x ON x.doc_id = cand.doc_new
        |  JOIN hs y ON y.doc_id = cand.doc_old
        |WHERE CAST(len(list_intersect(x.hset, y.hset)) AS DOUBLE) /
        |    CAST(len(x.hset) + len(y.hset) - len(list_intersect(x.hset, y.hset)) AS DOUBLE) >= 0.5
        |ORDER BY doc_new, doc_old""".stripMargin,

    // independent formulation: the self-join text (the Spark side uses
    // a basket-local pair generator — same pairs by construction)
    "q87_quality_report" ->
      s"""WITH prof AS (SELECT CAST(count(*) AS BIGINT) AS checked,
        |    CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS null_custkey,
        |    CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_orderkey,
        |    CAST(count(*) FILTER (o_totalprice < 0) AS BIGINT) AS neg_price,
        |    CAST(count(*) FILTER (o_totalprice > ${Declared7.QualityPriceCap}) AS BIGINT) AS outlier_price,
        |    CAST(count(*) FILTER (o_orderstatus NOT IN ('F', 'O', 'P')) AS BIGINT) AS bad_status
        |  FROM orders),
        |fk1 AS (SELECT CAST(count(*) AS BIGINT) AS checked,
        |    CAST(count(*) FILTER (o.o_orderkey IS NULL) AS BIGINT) AS violations
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey),
        |fk2 AS (SELECT CAST(count(*) AS BIGINT) AS checked,
        |    CAST(count(*) FILTER (c.c_custkey IS NULL) AS BIGINT) AS violations
        |  FROM orders x LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
        |    ON x.o_custkey = c.c_custkey)
        |SELECT * FROM (
        |  SELECT 'orders.o_custkey' AS target, 'not_null' AS check_name,
        |    null_custkey AS violations, checked FROM prof
        |  UNION ALL SELECT 'orders.o_orderkey', 'unique', dup_orderkey, checked FROM prof
        |  UNION ALL SELECT 'orders.o_totalprice', 'non_negative', neg_price, checked FROM prof
        |  UNION ALL SELECT 'orders.o_totalprice', 'upper_bound_${Declared7.QualityPriceCap}', outlier_price, checked FROM prof
        |  UNION ALL SELECT 'orders.o_orderstatus', 'domain_FOP', bad_status, checked FROM prof
        |  UNION ALL SELECT 'lineitem.l_orderkey', 'fk_o_orderkey', violations, checked FROM fk1
        |  UNION ALL SELECT 'orders.o_custkey', 'fk_c_custkey', violations, checked FROM fk2)
        |ORDER BY target, check_name""".stripMargin,

    "q86_frequent_pairs" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
        |  FROM li a JOIN li b
        |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        |SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS support
        |FROM pairs GROUP BY part_a, part_b
        |HAVING count(*) >= ${Declared7.PairMinSup}
        |ORDER BY part_a, part_b""".stripMargin,

    "q84_cohort_retention" ->
      s"""WITH d AS (SELECT user_id,
        |    date_diff('day', DATE '${Declared7.CohortEpoch}',
        |              CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS day
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id),
        |ad AS (SELECT DISTINCT user_id, day FROM d),
        |ret AS (SELECT c.cohort_day, ad.day - c.cohort_day AS day_offset,
        |    CAST(count(*) AS BIGINT) AS n_active
        |  FROM ad JOIN c USING (user_id) GROUP BY 1, 2),
        |cs AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_n
        |  FROM c GROUP BY cohort_day)
        |SELECT ret.cohort_day, ret.day_offset, ret.n_active, cs.cohort_n
        |FROM ret JOIN cs USING (cohort_day)
        |ORDER BY cohort_day, day_offset""".stripMargin,

    "q85_groupwise_ols" ->
      s"""WITH p AS (SELECT event_type,
        |    CAST(date_diff('day', DATE '${Declared7.CohortEpoch}',
        |                   CAST(CAST(ts AS TIMESTAMP) AS DATE)) AS BIGINT) AS x,
        |    CAST(floor(value * 100) AS BIGINT) AS y
        |  FROM events),
        |a AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM p GROUP BY event_type)
        |SELECT event_type, n,
        |  n * sxy - sx * sy AS slope_num,
        |  n * sxx - sx * sx AS slope_den,
        |  sy * sxx - sx * sxy AS intercept_num
        |FROM a ORDER BY event_type""".stripMargin,

    "q82_attribution" ->
      """WITH o AS (
        |  SELECT event_id, user_id, event_type,
        |    CAST(floor(value * 100) AS BIGINT) AS cents,
        |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |        IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS attr_type
        |  FROM events)
        |SELECT coalesce(attr_type, '(none)') AS attributed_type,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(cents) AS BIGINT) AS attributed_cents
        |FROM o WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY attributed_type""".stripMargin,
    "q74_inverted_index" ->
      s"""WITH pairs AS (
        |  SELECT doc_id,
        |    unnest(list_distinct(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> ''))) AS term
        |  FROM documents),
        |d AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM pairs GROUP BY term),
        |topp AS (SELECT term, doc_id FROM (
        |  SELECT term, doc_id,
        |    row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
        |  FROM pairs) WHERE rn <= $PostCap),
        |post AS (SELECT term,
        |    string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        |  FROM topp GROUP BY term)
        |SELECT d.term, d.df, post.postings
        |FROM d JOIN post USING (term) ORDER BY d.term""".stripMargin,

    "q75_markov_transitions" ->
      s"""WITH t AS (
        |  SELECT event_type AS from_state,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(ts AS TIMESTAMP), event_id) AS to_state
        |  FROM events),
        |c AS (SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS cnt
        |  FROM t WHERE to_state IS NOT NULL GROUP BY from_state, to_state)
        |SELECT from_state, to_state, cnt, rnk FROM (
        |  SELECT from_state, to_state, cnt,
        |    CAST(row_number() OVER (PARTITION BY from_state
        |      ORDER BY cnt DESC, to_state) AS INT) AS rnk
        |  FROM c) WHERE rnk <= $TopNext
        |ORDER BY from_state, rnk""".stripMargin,

    "q76_rolling_anomaly" ->
      s"""WITH c AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |w AS (SELECT event_id, user_id, cents,
        |    sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN $AnomWin PRECEDING AND 1 PRECEDING) AS s,
        |    count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN $AnomWin PRECEDING AND 1 PRECEDING) AS n
        |  FROM c)
        |SELECT event_id, user_id, cents, CAST(s AS BIGINT) AS trail_sum
        |FROM w WHERE n = $AnomWin AND cents * $AnomWin > $AnomK * s
        |ORDER BY event_id""".stripMargin,

    "q78_knn_graph" ->
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
        |    sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
        |  FROM embeddings WHERE label = $KnnLabel),
        |knn AS (SELECT a, b FROM (
        |  SELECT e1.vec_id AS a, e2.vec_id AS b,
        |    row_number() OVER (PARTITION BY e1.vec_id
        |      ORDER BY list_inner_product(e1.v, e2.v) / (e1.norm * e2.norm) DESC,
        |               e2.vec_id) AS rn
        |  FROM e e1, e e2 WHERE e1.vec_id <> e2.vec_id) WHERE rn <= $KnnK),
        |mutual AS (SELECT k1.a, k1.b FROM knn k1
        |  JOIN knn k2 ON k1.a = k2.b AND k1.b = k2.a WHERE k1.a < k1.b),
        |deg AS (SELECT nid, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT a AS nid FROM mutual UNION ALL SELECT b FROM mutual)
        |  GROUP BY nid),
        |tri AS (SELECT e1.a, e1.b, e2.b AS c
        |  FROM mutual e1 JOIN mutual e2 ON e1.b = e2.a
        |  JOIN mutual e3 ON e3.a = e1.a AND e3.b = e2.b),
        |tpn AS (SELECT nid, CAST(count(*) AS BIGINT) AS tri_cnt FROM (
        |    SELECT a AS nid FROM tri UNION ALL SELECT b FROM tri
        |    UNION ALL SELECT c FROM tri)
        |  GROUP BY nid)
        |SELECT e.vec_id, CAST(coalesce(deg.deg, 0) AS BIGINT) AS deg,
        |  CAST(coalesce(tpn.tri_cnt, 0) AS BIGINT) AS tri_cnt
        |FROM e LEFT JOIN deg ON e.vec_id = deg.nid
        |  LEFT JOIN tpn ON e.vec_id = tpn.nid
        |ORDER BY e.vec_id""".stripMargin,

    "q79_dist_drift" ->
      """WITH g AS (SELECT lang,
        |    CAST(count(*) FILTER (source = 'src0') AS BIGINT) AS cnt_eval,
        |    CAST(count(*) FILTER (source <> 'src0') AS BIGINT) AS cnt_rest
        |  FROM documents GROUP BY lang),
        |t AS (SELECT CAST(sum(cnt_eval) AS BIGINT) AS tot_eval,
        |    CAST(sum(cnt_rest) AS BIGINT) AS tot_rest FROM g)
        |SELECT lang, cnt_eval, cnt_rest,
        |  CAST(abs(cnt_eval * tot_rest - cnt_rest * tot_eval) AS BIGINT) AS drift_num
        |FROM g, t ORDER BY lang""".stripMargin,

    "q80_ann_recall" ->
      s"""WITH ${Oracle2.vecCte},
        |brute AS (SELECT query_id, vec_id FROM (
        |  SELECT q.query_id, e2.vec_id,
        |    row_number() OVER (PARTITION BY q.query_id
        |      ORDER BY list_inner_product(q.qv, e2.v) / (q.qnorm * e2.norm) DESC,
        |               e2.vec_id) AS rank
        |  FROM e e2, (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM e
        |              WHERE vec_id < ${graft.sim.Similarity.NumQueries}) q
        |  WHERE e2.vec_id <> q.query_id) WHERE rank <= ${graft.sim.Similarity.K}),
        |bk AS (SELECT vec_id, v, norm, ${Oracle2.lshBucketExpr} AS bucket FROM e),
        |lq AS (SELECT vec_id AS query_id, qv, qnorm, xor(qb.bucket, t.m) AS bucket
        |  FROM (SELECT vec_id, v AS qv, norm AS qnorm, bucket FROM bk
        |        WHERE vec_id < ${graft.sim.Similarity.NumQueries}) qb,
        |    unnest(${Oracle2.lshProbes}) AS t(m)),
        |lsh AS (SELECT query_id, vec_id FROM (
        |  SELECT lq.query_id, bk.vec_id,
        |    row_number() OVER (PARTITION BY lq.query_id
        |      ORDER BY list_inner_product(lq.qv, bk.v) / (lq.qnorm * bk.norm) DESC,
        |               bk.vec_id) AS rank
        |  FROM bk JOIN lq USING (bucket) WHERE bk.vec_id <> lq.query_id)
        |  WHERE rank <= ${graft.sim.Similarity.K}),
        |h AS (SELECT query_id, CAST(count(*) AS BIGINT) AS hits
        |  FROM brute JOIN lsh USING (query_id, vec_id) GROUP BY query_id)
        |SELECT q.query_id, CAST(coalesce(h.hits, 0) AS BIGINT) AS hits,
        |  CAST(${graft.sim.Similarity.K} AS BIGINT) AS k
        |FROM (SELECT DISTINCT query_id FROM brute) q LEFT JOIN h USING (query_id)
        |ORDER BY query_id""".stripMargin,

    "q81_winsorized" ->
      s"""WITH c AS (SELECT event_type, event_id,
        |    CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |r AS (SELECT event_type, cents,
        |    row_number() OVER (PARTITION BY event_type ORDER BY cents, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM c),
        |b AS (SELECT event_type,
        |    max(CASE WHEN rn = (n * $WinsLoPct + 99) // 100 THEN cents END) AS lo,
        |    max(CASE WHEN rn = (n * $WinsHiPct + 99) // 100 THEN cents END) AS hi
        |  FROM r GROUP BY event_type)
        |SELECT c.event_type, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(least(greatest(c.cents, b.lo), b.hi)) AS BIGINT) AS wsum,
        |  CAST(sum(CASE WHEN c.cents < b.lo OR c.cents > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
        |  CAST(max(b.lo) AS BIGINT) AS lo, CAST(max(b.hi) AS BIGINT) AS hi
        |FROM c JOIN b USING (event_type)
        |GROUP BY c.event_type ORDER BY c.event_type""".stripMargin)

  // q78b builds the SAME graph from IVF candidates (row-identical by
  // probe-breadth construction, spec'd in Declared7Spec) — it shares
  // q78's brute-force oracle verbatim, which is exactly the claim: the
  // approximate candidate generator loses nothing at these SFs.
  val oracleSql: Map[String, String] =
    baseSql + ("q78b_knn_graph_ivf" -> baseSql("q78_knn_graph"))
}
