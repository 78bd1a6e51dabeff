package graft.queries

/** DuckDB oracle SQL for [[Declared5]]. Same dialect notes as
  * [[Oracle]]..[[Oracle4]]; new here:
  *
  *  - float CONSTANTS that Spark computes at compile time (k1+1,
  *    1−b) are written as the same arithmetic in SQL — a decimal
  *    literal like `2.2` parses to a DIFFERENT double than computing
  *    `1.2 + 1.0` in IEEE;
  *  - window SUMs over BIGINT widen to HUGEINT in DuckDB → CAST back;
  *  - parallel `unnest()` calls in one SELECT zip (used to pair each
  *    embedding element with its position);
  *  - DuckDB `/` on integers is float division (same as Spark), so
  *    middle-rank positions use floor() identically on both sides.
  */
object Oracle5 {
  import Declared5.{Bm25K1, Bm25B, Bm25Terms, ContamN, PackBudget, OovVocabSize, EwmaAlpha, KmeansScale, KmeansK}

  private val bm25TermList = Bm25Terms.map(t => s"'$t'").mkString(", ")

  val oracleSql: Map[String, String] = Map(
    "q52_scd2" ->
      """WITH f AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |), r AS (
        |  SELECT user_id, event_type, ts,
        |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS run_idx
        |  FROM f
        |), runs AS (
        |  SELECT user_id, run_idx, min(event_type) AS event_type,
        |    min(ts) AS valid_from, count(*) AS n_events
        |  FROM r GROUP BY user_id, run_idx)
        |SELECT user_id, run_idx, event_type, valid_from,
        |  lead(valid_from) OVER w2 AS valid_to, n_events,
        |  (lead(valid_from) OVER w2 IS NULL) AS is_current
        |FROM runs
        |WINDOW w2 AS (PARTITION BY user_id ORDER BY run_idx)
        |ORDER BY user_id, run_idx""".stripMargin,

    "q53_mode_median" ->
      """WITH c AS (
        |  SELECT event_type, user_id, count(*) AS cnt FROM events GROUP BY 1, 2
        |), m AS (
        |  SELECT event_type, user_id AS mode_user, cnt AS mode_count FROM (
        |    SELECT event_type, user_id, cnt,
        |      row_number() OVER (PARTITION BY event_type
        |        ORDER BY cnt DESC, user_id) AS rn
        |    FROM c) WHERE rn = 1
        |), rk AS (
        |  SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    count(*) OVER (PARTITION BY event_type) AS n
        |  FROM events
        |), med AS (
        |  SELECT event_type, sum(value) / count(*) AS median_value, min(n) AS n_rows
        |  FROM rk WHERE rn = floor((n + 1) / 2) OR rn = floor((n + 2) / 2)
        |  GROUP BY 1)
        |SELECT m.event_type, med.n_rows, med.median_value, m.mode_user, m.mode_count
        |FROM m JOIN med USING (event_type) ORDER BY event_type""".stripMargin,

    "q54_tfidf" ->
      """WITH dt AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')) AS term
        |  FROM documents
        |), tfq AS (
        |  SELECT doc_id, term, count(*) AS tf FROM dt GROUP BY 1, 2
        |), dfq AS (
        |  SELECT term, count(*) AS df FROM tfq GROUP BY 1
        |), nq AS (SELECT count(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |    CAST(tf * (n_docs + 1) AS DOUBLE) / CAST(df + 1 AS DOUBLE) AS tfidf_ratio
        |  FROM tfq JOIN dfq USING (term) CROSS JOIN nq)
        |SELECT doc_id, term, tf, df, tfidf_ratio, CAST(rk AS INT) AS rk FROM (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf_ratio DESC, term) AS rk
        |  FROM scored) WHERE rk <= 5
        |ORDER BY doc_id, rk""".stripMargin,

    "q55_bm25" ->
      s"""WITH toks AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS t
        |  FROM documents
        |), dlq AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
        |stats AS (
        |  SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl FROM dlq
        |), dt AS (
        |  SELECT doc_id, unnest(t) AS term FROM toks
        |), tfq AS (
        |  SELECT doc_id, term, count(*) AS tf FROM dt
        |  WHERE term IN ($bm25TermList) GROUP BY 1, 2
        |), dfq AS (SELECT term, count(*) AS df FROM tfq GROUP BY 1)
        |SELECT t.doc_id, t.term, t.tf, d.df, l.dl,
        |  ((CAST(s.n_docs - d.df AS DOUBLE) + 0.5) / (CAST(d.df AS DOUBLE) + 0.5))
        |    * (CAST(t.tf AS DOUBLE) * ($Bm25K1 + 1.0))
        |    / (CAST(t.tf AS DOUBLE) + $Bm25K1 * ((1.0 - $Bm25B) + $Bm25B *
        |        (CAST(l.dl AS DOUBLE) / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n_docs AS DOUBLE)))))
        |    AS bm25
        |FROM tfq t JOIN dfq d USING (term) JOIN dlq l USING (doc_id) CROSS JOIN stats s
        |ORDER BY doc_id, term""".stripMargin,

    "q56_contamination" ->
      s"""WITH g AS (
        |  SELECT doc_id, source,
        |    list_distinct([array_to_string(t[i:i+${ContamN - 1}], ' ')
        |                   for i in range(1, len(t) - ${ContamN - 1} + 1)]) AS ngrams
        |  FROM (SELECT doc_id, source,
        |          list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS t
        |        FROM documents)
        |  WHERE len(t) >= $ContamN
        |), e AS (
        |  SELECT doc_id AS eval_doc, unnest(ngrams) AS ng FROM g WHERE source = 'src0'
        |), es AS (
        |  SELECT eval_doc, count(*) AS n_eval_ngrams FROM e GROUP BY 1
        |), tr AS (
        |  SELECT doc_id AS train_doc, unnest(ngrams) AS ng FROM g WHERE source <> 'src0'
        |), p AS (
        |  SELECT train_doc, eval_doc, count(*) AS n_overlap
        |  FROM tr JOIN e USING (ng) GROUP BY 1, 2)
        |SELECT train_doc, eval_doc, n_overlap, n_eval_ngrams,
        |  CAST(n_overlap AS DOUBLE) / CAST(n_eval_ngrams AS DOUBLE) AS overlap_frac
        |FROM p JOIN es USING (eval_doc)
        |ORDER BY train_doc, eval_doc""".stripMargin,

    "q57_pack" ->
      s"""WITH d AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')) AS BIGINT)
        |      AS n_tokens
        |  FROM documents
        |), o AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |      AS start_off
        |  FROM d)
        |SELECT doc_id, n_tokens, start_off,
        |  CAST(floor(start_off / $PackBudget) AS BIGINT) AS pack_id,
        |  (n_tokens > 0 AND CAST(floor((start_off + n_tokens - 1) / $PackBudget) AS BIGINT)
        |     > CAST(floor(start_off / $PackBudget) AS BIGINT)) AS spans_boundary
        |FROM o ORDER BY doc_id""".stripMargin,

    "q58_quantize_int8" ->
      """WITH v AS (
        |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings
        |), m AS (
        |  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS max_abs FROM v
        |), s AS (
        |  SELECT vec_id, max_abs / 127.0 AS scale, v FROM m WHERE max_abs > 0
        |), e AS (
        |  SELECT vec_id, scale,
        |    unnest(range(0, len(v))) AS pos, unnest(v) AS x
        |  FROM s
        |), q AS (
        |  SELECT vec_id, scale, pos, x,
        |    CAST(floor(x / scale + 0.5) AS BIGINT) AS q
        |  FROM e)
        |SELECT vec_id, min(scale) AS scale, count(*) AS n_dims,
        |  CAST(sum(q * (pos + 1)) AS BIGINT) AS checksum,
        |  max(abs(CAST(q AS DOUBLE) * scale - x)) AS max_abs_err
        |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // list_reduce folds acc-first starting from the first element —
    // the same contract as Spark's aggregate() seeded with element 1
    // over the remainder; list(... ORDER BY) fixes the fold order
    "q59_ewma" ->
      s"""SELECT user_id, count(*) AS n_events,
        |  max(CAST(ts AS TIMESTAMP)) AS last_ts,
        |  list_reduce(list(value ORDER BY CAST(ts AS TIMESTAMP), event_id),
        |    (acc, x) -> $EwmaAlpha * x + (1.0 - $EwmaAlpha) * acc) AS ewma_value
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q60_ranks" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  CAST(ntile(4) OVER w AS INT) AS tile,
        |  CAST(dense_rank() OVER w AS INT) AS drank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT), o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    // identical text to q60_ranks: the scale variant must produce the
    // same rows from a completely different physical plan
    "q60b_ranks_scaled" ->
      """SELECT o_orderkey, o_orderpriority,
        |  CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume,
        |  CAST(ntile(4) OVER w AS INT) AS tile,
        |  CAST(dense_rank() OVER w AS INT) AS drank
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT), o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q61_funnel" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events
        |), s1 AS (
        |  SELECT user_id, min(ts) AS view_ts FROM ev
        |  WHERE event_type = 'view' GROUP BY user_id
        |), s2 AS (
        |  SELECT ev.user_id, min(ev.ts) AS click_ts
        |  FROM ev JOIN s1 USING (user_id)
        |  WHERE ev.event_type = 'click' AND ev.ts > s1.view_ts
        |  GROUP BY ev.user_id
        |), s3 AS (
        |  SELECT ev.user_id, min(ev.ts) AS purchase_ts
        |  FROM ev JOIN s2 USING (user_id)
        |  WHERE ev.event_type = 'purchase' AND ev.ts > s2.click_ts
        |  GROUP BY ev.user_id)
        |SELECT s1.user_id, s1.view_ts, s2.click_ts, s3.purchase_ts,
        |  CAST(1 + (CASE WHEN s2.click_ts IS NOT NULL THEN 1 ELSE 0 END)
        |         + (CASE WHEN s3.purchase_ts IS NOT NULL THEN 1 ELSE 0 END) AS INT)
        |    AS reached_stage
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
        |ORDER BY s1.user_id""".stripMargin,

    // temporal join reuses q52's version derivation verbatim as CTEs
    "q64_temporal_join" ->
      """WITH f AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)
        |), r AS (
        |  SELECT user_id, event_type, ts,
        |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INT) AS run_idx
        |  FROM f
        |), runs AS (
        |  SELECT user_id, run_idx, min(event_type) AS event_type,
        |    min(ts) AS valid_from
        |  FROM r GROUP BY user_id, run_idx
        |), v AS (
        |  SELECT user_id AS v_user, run_idx, event_type AS version_type, valid_from,
        |    lead(valid_from) OVER w2 AS valid_to,
        |    (lead(valid_from) OVER w2 IS NULL) AS is_current
        |  FROM runs
        |  WINDOW w2 AS (PARTITION BY user_id ORDER BY run_idx))
        |SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
        |  v.run_idx, v.version_type, v.is_current
        |FROM events e JOIN v ON e.user_id = v.v_user
        |  AND CAST(e.ts AS TIMESTAMP) >= v.valid_from
        |  AND (v.valid_to IS NULL OR CAST(e.ts AS TIMESTAMP) < v.valid_to)
        |ORDER BY e.event_id""".stripMargin,

    // fixed-point Lloyd step: every quantity is exact integer arithmetic
    // (quantized coords, squared distances, floored means), so the two
    // engines cannot diverge; dist uses a 1-based list comprehension
    // over the fixed 64-dim width
    "q63_kmeans" ->
      s"""WITH q AS (
        |  SELECT vec_id,
        |    [CAST(floor(CAST(x AS DOUBLE) * $KmeansScale + 0.5) AS BIGINT)
        |     for x in embedding] AS qv
        |  FROM embeddings
        |), seeds AS (
        |  SELECT CAST(vec_id AS INT) AS cid, qv AS cv FROM q WHERE vec_id < $KmeansK
        |), d1 AS (
        |  SELECT q.vec_id, q.qv, s.cid,
        |    CAST(list_sum([ (q.qv[i] - s.cv[i]) * (q.qv[i] - s.cv[i])
        |                    for i in range(1, len(q.qv) + 1) ]) AS BIGINT) AS dist
        |  FROM q CROSS JOIN seeds s
        |), a1 AS (
        |  SELECT vec_id, qv, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d1) WHERE rn = 1
        |), cells AS (
        |  SELECT cid, pos,
        |    CAST(floor(CAST(sum(x) AS DOUBLE) / count(*)) AS BIGINT) AS cval
        |  FROM (SELECT cid, unnest(range(0, len(qv))) AS pos, unnest(qv) AS x FROM a1)
        |  GROUP BY cid, pos
        |), c1 AS (
        |  SELECT cid, list(cval ORDER BY pos) AS cv FROM cells GROUP BY cid
        |), d2 AS (
        |  SELECT q.vec_id, c.cid,
        |    CAST(list_sum([ (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i])
        |                    for i in range(1, len(q.qv) + 1) ]) AS BIGINT) AS dist
        |  FROM q CROSS JOIN c1 c
        |), a2 AS (
        |  SELECT vec_id, cid FROM (
        |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
        |    FROM d2) WHERE rn = 1
        |), nb AS (SELECT cid, count(*) AS n_before FROM a1 GROUP BY cid),
        |na AS (SELECT cid, count(*) AS n_after FROM a2 GROUP BY cid),
        |ck AS (
        |  SELECT cid, CAST(sum(cval * (pos + 1)) AS BIGINT) AS centroid_checksum
        |  FROM cells GROUP BY cid)
        |SELECT nb.cid AS cluster_id, nb.n_before,
        |  coalesce(na.n_after, 0) AS n_after, ck.centroid_checksum
        |FROM nb JOIN ck USING (cid) LEFT JOIN na USING (cid)
        |ORDER BY cluster_id""".stripMargin,

    "q62_oov" ->
      s"""WITH dt AS (
        |  SELECT doc_id,
        |    unnest(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')) AS term
        |  FROM documents
        |), vc AS (
        |  SELECT term, count(*) AS cnt FROM dt GROUP BY 1
        |), vocab AS (
        |  SELECT term FROM (
        |    SELECT term, row_number() OVER (ORDER BY cnt DESC, term) AS rk FROM vc)
        |  WHERE rk <= $OovVocabSize)
        |SELECT dt.doc_id, count(*) AS n_tokens,
        |  count(*) FILTER (WHERE v.term IS NULL) AS n_oov,
        |  CAST(count(*) FILTER (WHERE v.term IS NULL) AS DOUBLE)
        |    / CAST(count(*) AS DOUBLE) AS oov_ratio
        |FROM dt LEFT JOIN vocab v ON dt.term = v.term
        |GROUP BY dt.doc_id ORDER BY dt.doc_id""".stripMargin)
}
