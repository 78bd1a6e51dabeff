package graft.queries

/** DuckDB oracle SQL for [[Declared4]] and the round-4 LLM-pipeline
  * operators (prefix-edit-distance dedup, cross-doc boilerplate
  * shingles). Same dialect notes as [[Oracle]]..[[Oracle3]]; new here:
  *
  *  - DuckDB `generate_series(DATE, DATE, INTERVAL)` yields timestamps —
  *    cast back to DATE to match Spark's `sequence(date, date)`;
  *  - `arg_max`/`arg_min` take a single ordering value, so the
  *    deterministic composite ordinal (cents·10^7 + custkey) is built
  *    identically on both sides;
  *  - DuckDB's Levenshtein is the same unit-cost Wagner-Fischer
  *    distance as Spark's over this ASCII corpus.
  */
object Oracle4 {

  /** Session CTE — identical to the q25 oracle's derivation. */
  private val sessionCte =
    """g AS (
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
      |  FROM g)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q21b_asof_forward" ->
      """WITH c AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.ts AS click_ts,
        |  p.purchase_value AS asof_purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts <= p.ts
        |ORDER BY c.event_id""".stripMargin,

    // list_intersect is documented distinct; each side is per-doc
    // distinct by construction (length bands of a distinct vocab, which
    // OVERLAP on 4-5-char tokens), so union = distinct concat and
    // except = filtered side a; empty-list array_to_string is NULL in
    // DuckDB vs '' in Spark → coalesce
    "q50_array_setops" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    list_filter(list_distinct(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')),
        |      t -> length(t) <= 5) AS short_toks,
        |    list_filter(list_distinct(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')),
        |      t -> length(t) >= 4) AS long_toks
        |  FROM documents)
        |SELECT doc_id,
        |  coalesce(array_to_string(list_sort(list_distinct(short_toks || long_toks)), ' '), '') AS vocab,
        |  CAST(len(list_distinct(short_toks || long_toks)) AS INT) AS n_vocab,
        |  coalesce(array_to_string(list_sort(list_intersect(short_toks, long_toks)), ' '), '') AS both,
        |  coalesce(array_to_string(list_sort(list_filter(short_toks, t -> NOT list_contains(long_toks, t))), ' '), '') AS only_short,
        |  CAST(len(list_filter(short_toks, t -> NOT list_contains(long_toks, t))) AS INT) AS n_only_short
        |FROM d ORDER BY doc_id""".stripMargin,

    "q51_map_hof" ->
      """SELECT doc_id, tok AS token, CAST(count(*) * 2 AS BIGINT) AS weight
        |FROM (
        |  SELECT doc_id, unnest(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')) AS tok
        |  FROM documents)
        |GROUP BY doc_id, tok HAVING count(*) > 1
        |ORDER BY doc_id, token""".stripMargin,

    "q41_interval_join" ->
      s"""WITH $sessionCte,
        |sess AS (
        |  SELECT user_id AS s_user, session_idx, min(ts) AS s_start, max(ts) AS s_end,
        |    count(*) AS n_events
        |  FROM s GROUP BY user_id, session_idx)
        |SELECT e.event_id, e.user_id, sess.session_idx, sess.n_events
        |FROM (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events) e
        |JOIN sess ON e.user_id = sess.s_user
        |  AND e.ts >= sess.s_start AND e.ts <= sess.s_end
        |ORDER BY e.event_id""".stripMargin,

    "q42_latest_per_key" ->
      """SELECT user_id, event_type, event_id AS last_event_id,
        |  CAST(ts AS TIMESTAMP) AS last_ts, value AS last_value
        |FROM (
        |  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |    ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1
        |ORDER BY user_id, event_type""".stripMargin,

    "q43_argmax" ->
      """WITH c AS (
        |  SELECT c_custkey, c_name, c_nationkey,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) * 10000000 + c_custkey AS ord,
        |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer)
        |SELECT n_name,
        |  arg_max(c_name, ord) AS richest, max(bal_cents) AS max_cents,
        |  arg_min(c_name, ord) AS poorest, min(bal_cents) AS min_cents,
        |  count(*) AS n_customers
        |FROM c JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q44_date_spine" ->
      """WITH b AS (
        |  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
        |         CAST(max(o_orderdate) AS DATE) AS d1 FROM orders),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM b),
        |daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
        |    CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY 1)
        |SELECT spine.day, coalesce(daily.n_orders, 0) AS n_orders,
        |  CAST(coalesce(daily.cents, 0) AS BIGINT) AS cents
        |FROM spine LEFT JOIN daily ON spine.day = daily.day
        |ORDER BY spine.day""".stripMargin,

    "q45_bitops" ->
      """SELECT o_orderpriority,
        |  bit_and(o_orderkey) AS key_and,
        |  bit_or(o_orderkey) AS key_or,
        |  bit_xor(o_orderkey) AS key_xor,
        |  CAST(SUM(o_orderkey >> 3) AS BIGINT) AS sum_shr3,
        |  count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q46_share_of_total" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey,
        |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_orderkey, o_custkey, cents,
        |  CAST(cents AS DOUBLE) /
        |    CAST(SUM(cents) OVER (PARTITION BY o_custkey) AS DOUBLE) AS share_of_customer,
        |  CAST(cents AS DOUBLE) /
        |    CAST((SELECT SUM(cents) FROM o) AS DOUBLE) AS share_of_total
        |FROM o ORDER BY o_orderkey""".stripMargin,

    "q47_time_range_frame" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
        |  COUNT(*) OVER w AS n_last_hour,
        |  CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) OVER w AS BIGINT) AS v_last_hour
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)
        |             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "q48_filter_clause" ->
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
        |    FILTER (WHERE l_quantity >= 25) AS BIGINT) AS cents_bulk,
        |  CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT))
        |    FILTER (WHERE l_quantity < 25) AS BIGINT) AS cents_small,
        |  count(DISTINCT l_suppkey) FILTER (WHERE l_returnflag = 'R') AS n_supp_returned
        |FROM lineitem
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q49_lateral_topk" ->
      """SELECT n_name, c_custkey, c_name, bal_cents
        |FROM nation,
        |LATERAL (
        |  SELECT c_custkey, c_name,
        |    CAST(FLOOR(c_acctbal * 100) AS BIGINT) AS bal_cents
        |  FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY bal_cents DESC, c_custkey
        |  LIMIT 2) AS topc
        |ORDER BY n_name, bal_cents DESC, c_custkey""".stripMargin,

    "dedup_edit_distance" ->
      """WITH d AS (
        |  SELECT doc_id, lang, CAST(floor(length(text) / 100.0) AS INT) AS len_bucket,
        |    substring(text, 1, 80) AS pfx
        |  FROM documents)
        |SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(levenshtein(a.pfx, b.pfx) AS INT) AS prefix_lev
        |FROM d a JOIN d b ON a.lang = b.lang AND a.len_bucket = b.len_bucket
        |  AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.pfx, b.pfx) <= 8
        |ORDER BY doc_a, doc_b""".stripMargin,

    // audio = doc_id % 3 == 1 (mediaFromDocuments' round-robin); ASCII
    // corpus ⟹ byte-hash == ascii(char)-hash (mm_decode precedent)
    "mm_audio_chunks" ->
      """WITH a AS (
        |  SELECT doc_id AS media_id, text,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |c AS (
        |  SELECT media_id, text, n,
        |    CAST(unnest(range(0, CAST(ceil(n / 64.0) AS INT))) AS INT) AS chunk_idx
        |  FROM a)
        |SELECT media_id, chunk_idx,
        |  CAST(least(64, n - chunk_idx * 64) AS INT) AS chunk_bytes,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(
        |      list_filter(string_split(substring(text, chunk_idx * 64 + 1, 64), ''), ch -> ch <> ''),
        |      ch -> CAST(ascii(ch) AS BIGINT))),
        |    (x, y) -> (x * 31 + y) % 1000000007) AS chunk_checksum
        |FROM c ORDER BY media_id, chunk_idx""".stripMargin,

    // Closed-form twin of WavPcmCodec's synthesized waveform (same
    // literal arithmetic): the Spark side WAV-encodes via the JDK and
    // re-derives these sums from the hand-rolled RIFF parse, so a
    // hash match proves the decode, not just the formula.
    "mm_audio_features" ->
      """WITH a AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 1),
        |s AS (
        |  SELECT a.doc_id, CAST(t.i AS BIGINT) AS i,
        |    ((a.doc_id % 251) * 7919 + CAST(t.i AS BIGINT) * 104729) % 65536 - 32768 AS s
        |  FROM a, LATERAL (SELECT unnest(range(0, CAST(256 + a.doc_id % 241 AS INT))) AS i) t)
        |SELECT doc_id AS media_id,
        |  CAST(count(*) AS BIGINT) AS n_samples,
        |  CAST(sum(s) AS BIGINT) AS sum_s,
        |  CAST(sum(abs(s)) AS BIGINT) AS sum_abs,
        |  CAST(max(s) AS INT) AS max_s,
        |  CAST(min(s) AS INT) AS min_s,
        |  CAST(sum(CASE WHEN s < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
        |  CAST(sum(i * s) AS BIGINT) AS idx_moment
        |FROM s GROUP BY doc_id ORDER BY media_id""".stripMargin,

    // Closed-form twin of GifAnimCodec's animation (same literal
    // arithmetic): the Spark side GIF-encodes via the JDK sequence
    // writer and re-derives these sums from a real frame-by-frame
    // ImageReader walk, so a hash match proves the multi-frame decode.
    "mm_video_frames" ->
      """WITH v AS (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
        |g AS (SELECT doc_id, CAST(8 + doc_id % 9 AS INT) AS w,
        |        CAST(8 + doc_id % 7 AS INT) AS h, CAST(2 + doc_id % 5 AS INT) AS n FROM v),
        |f AS (SELECT doc_id, w, h, CAST(t.f AS INT) AS f
        |      FROM g, LATERAL (SELECT unnest(range(0, n)) AS f) t),
        |c AS (SELECT doc_id, w, h, f, tx.x AS x, ty.y AS y,
        |        ((doc_id % 256) * 3 + f * 7 + tx.x * 5 + ty.y * 11) % 256 AS val
        |      FROM f, LATERAL (SELECT unnest(range(0, w)) AS x) tx,
        |           LATERAL (SELECT unnest(range(0, h)) AS y) ty)
        |SELECT doc_id AS media_id, f AS frame_idx, w AS width, h AS height,
        |  CAST(sum(val) AS BIGINT) AS sum_v,
        |  CAST(sum((x * 17 + y * 29) * val) AS BIGINT) AS xy_moment
        |FROM c GROUP BY doc_id, f, w, h ORDER BY media_id, frame_idx""".stripMargin,

    "text_boilerplate" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 3),
        |    i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' ||
        |         toks[i + 3] || ' ' || toks[i + 4])) AS shs
        |  FROM t WHERE len(toks) >= 5),
        |e AS (SELECT doc_id, unnest(shs) AS shingle FROM s)
        |SELECT shingle, count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM e GROUP BY shingle HAVING count(*) >= 2
        |ORDER BY shingle""".stripMargin)
}
