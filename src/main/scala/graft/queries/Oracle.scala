package graft.queries

/** DuckDB oracle SQL for [[Declared]] — same result set, same column
  * names, same total order, same decimal-accumulation determinism
  * contract. Authored for DuckDB's dialect (the Spark side is DataFrame
  * code, so the two texts need only agree on RESULTS, not syntax).
  *
  * Cross-engine type notes baked in here:
  *  - DuckDB length()/row_number()/year() return BIGINT where Spark
  *    returns INT → CAST ... AS INT on the oracle side;
  *  - DuckDB SUM(INTEGER) returns HUGEINT → CAST AS BIGINT;
  *  - decimal sums are CAST back to DOUBLE on both sides;
  *  - events.ts is parquet timestamp[ns]: DuckDB keeps TIMESTAMP_NS,
  *    Spark truncates to micros → oracle casts to TIMESTAMP (µs).
  */
object Oracle {

  val oracleSql: Map[String, String] = Map(
    "q01_scan_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.03 AND 0.07
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q02_string_fns" ->
      """SELECT c_custkey,
        |  upper(c_name) AS name_upper,
        |  lower(c_name) AS name_lower,
        |  substring(c_name, 1, 8) AS name_sub,
        |  c_name || '#' || c_mktsegment AS name_cat,
        |  trim(c_name) AS name_trim,
        |  replace(c_name, '0', '_') AS name_repl,
        |  CAST(length(c_name) AS INT) AS name_len,
        |  lpad(c_name, 25, '*') AS name_lpad
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q03_date_fns" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(day(o_orderdate) AS INT) AS d,
        |  date_trunc('month', o_orderdate) AS month_start,
        |  CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS days_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q04_inner_join" ->
      """SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "q05_multiway_join_agg" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        |FROM customer
        |  JOIN orders   ON c_custkey = o_custkey
        |  JOIN lineitem ON o_orderkey = l_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  JOIN nation   ON s_nationkey = n_nationkey
        |  JOIN region   ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q06_filtered_agg" ->
      """SELECT
        |  CAST(SUM(CAST(floor(l_extendedprice * l_discount * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |  count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
        |  AND l_discount BETWEEN 0.04 AND 0.08 AND l_quantity < 24""".stripMargin,

    "q07_distinct_agg" ->
      """SELECT o_orderpriority,
        |  count(DISTINCT o_custkey) AS n_custs,
        |  count(*) AS n_orders
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q08_left_join_null" ->
      """SELECT c_custkey, c_name,
        |  count(o_orderkey) AS order_cnt,
        |  COALESCE(CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q09_semi_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q10_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,

    "q11_rank_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(row_number() OVER w AS INT) AS rn,
        |    CAST(rank()       OVER w AS INT) AS rnk,
        |    CAST(dense_rank() OVER w AS INT) AS drnk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q12_analytic_window" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  lag(o_totalprice)  OVER w AS prev_price,
        |  lead(o_totalprice) OVER w AS next_price,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0 AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,

    "q13_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin,

    "q14_set_ops" ->
      """WITH a AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000),
        |     b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |SELECT '1_union_all' AS op, c_custkey FROM (SELECT * FROM a UNION ALL SELECT * FROM b)
        |UNION ALL SELECT '2_union', c_custkey FROM (SELECT * FROM a UNION SELECT * FROM b)
        |UNION ALL SELECT '3_intersect', c_custkey FROM (SELECT * FROM a INTERSECT SELECT * FROM b)
        |UNION ALL SELECT '4_except', c_custkey FROM (SELECT * FROM a EXCEPT SELECT * FROM b)
        |ORDER BY op, c_custkey""".stripMargin,

    "q15_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total,
        |  count(*) AS n,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_prio,
        |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q15b_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total,
        |  count(*) AS n,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY g_status, g_prio,
        |  o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,

    "q16_conditional" ->
      """SELECT p_partkey,
        |  CASE WHEN p_size > 25 THEN 'big' WHEN p_size > 10 THEN 'medium'
        |       ELSE 'small' END AS size_class,
        |  COALESCE(NULLIF(p_brand, 'Brand#13'), '(none)') AS brand_or_none,
        |  CAST(LEAST(p_size, CAST(length(p_name) AS INT)) AS INTEGER) AS least_v,
        |  GREATEST(p_retailprice, 1000.0) AS greatest_v
        |FROM part ORDER BY p_partkey""".stripMargin,

    "q17_tumbling_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start, event_type,
        |  count(*) AS n,
        |  CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "q18_range_join" ->
      """SELECT n_nationkey, n_name, r_regionkey, r_name
        |FROM nation JOIN region ON n_regionkey <= r_regionkey
        |ORDER BY n_nationkey, r_regionkey""".stripMargin,

    "q19_json_cast" ->
      """SELECT CASE WHEN k % 2 = 0 THEN 'even' ELSE 'odd' END AS parity,
        |  count(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k
        |FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
        |GROUP BY 1 ORDER BY parity""".stripMargin,

    "q20_token_topk" ->
      """WITH toks AS (
        |  SELECT lang, t.token FROM documents,
        |    unnest(string_split_regex(text, '[ \t\n\r]+')) AS t(token)
        |  WHERE t.token <> ''
        |), counts AS (
        |  SELECT lang, token, count(*) AS cnt FROM toks GROUP BY lang, token
        |), ranked AS (
        |  SELECT lang, token, cnt,
        |    CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS INT) AS rn
        |  FROM counts)
        |SELECT lang, token, cnt, rn FROM ranked WHERE rn <= 5 ORDER BY lang, rn""".stripMargin,

    "q20b_embedding_dims" ->
      """SELECT label, CAST(len(embedding) AS INT) AS dim, count(*) AS n
        |FROM embeddings GROUP BY 1, 2 ORDER BY label, dim""".stripMargin,

    // both sides truncated to µs (CAST ... AS TIMESTAMP) so the >= match
    // agrees with Spark's µs-precision events.ts
    "q21_asof_join" ->
      """WITH c AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, max(value) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT c.event_id, c.user_id, c.ts AS click_ts,
        |  p.purchase_value AS asof_purchase_value
        |FROM c ASOF LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts
        |ORDER BY c.event_id""".stripMargin,

    // ---- ETL transform semantics over testdata (SURVEY §2.1 O11-O13) ----
    "etl_job_rewrite" ->
      """WITH j AS (
        |  SELECT p_partkey, p_name,
        |    CASE WHEN p_size % 5 = 0 THEN p_type
        |         ELSE p_type || ', ' || p_brand END AS job_raw
        |  FROM part
        |), f AS (
        |  SELECT p_partkey, p_name, job_raw,
        |    CASE WHEN len(string_split(job_raw, ',')) = 2 THEN
        |      -- python capitalize(lstrip(spec) || ' ' || general)
        |      upper(substr(ltrim(string_split(job_raw, ',')[2]) || ' ' || string_split(job_raw, ',')[1], 1, 1)) ||
        |      lower(substr(ltrim(string_split(job_raw, ',')[2]) || ' ' || string_split(job_raw, ',')[1], 2))
        |    ELSE job_raw END AS job_fixed
        |  FROM j)
        |SELECT p_partkey, job_raw, job_fixed,
        |  upper(substr(p_name, 1, 1)) || lower(substr(p_name, 2)) AS name_cap
        |FROM f ORDER BY p_partkey""".stripMargin,

    "etl_name_parts" ->
      """WITH n AS (
        |  SELECT p_partkey, p_name,
        |    (['Dr. ', 'Mr. ', '', 'Xx '])[(p_size % 4) + 1] || p_name ||
        |    ([' PhD', '', ' Jr.'])[(p_size % 3) + 1] AS name_raw
        |  FROM part
        |), t AS (
        |  SELECT p_partkey, p_name, name_raw,
        |    string_split(name_raw, ' ') AS tok, len(string_split(name_raw, ' ')) AS nt
        |  FROM n)
        |SELECT p_partkey, name_raw,
        |  CASE WHEN nt = 4 THEN tok[1]
        |       WHEN nt = 3 AND list_contains(['Dr.','Mr.','Mrs.','Ms.'], tok[1]) THEN tok[1]
        |       ELSE '' END AS prefix,
        |  CASE WHEN nt = 4 THEN tok[2] || ' ' || tok[3]
        |       WHEN nt = 3 AND list_contains(['Dr.','Mr.','Mrs.','Ms.'], tok[1]) THEN tok[2] || ' ' || tok[3]
        |       WHEN nt = 3 THEN tok[1] || ' ' || tok[2]
        |       ELSE name_raw END AS name_out,
        |  CASE WHEN nt = 4 THEN tok[4]
        |       WHEN nt = 3 AND NOT list_contains(['Dr.','Mr.','Mrs.','Ms.'], tok[1]) THEN tok[3]
        |       ELSE '' END AS suffix,
        |  replace(p_name || chr(10) || 'line2', chr(10), ' ') AS addr_clean
        |FROM t ORDER BY p_partkey""".stripMargin,

    // ---- text analysis (graft.text.TextAnalysis) ----
    "text_quality" ->
      """WITH t AS (
        |  SELECT doc_id, lang, text,
        |    list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CAST(length(text) AS BIGINT) AS n_chars_actual,
        |  CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS avg_token_len,
        |  CAST(len(list_filter(toks, x -> list_contains(['the','a','of','to','and','in','is','on'], x))) AS DOUBLE) / len(toks) AS stopword_ratio,
        |  CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS type_token_ratio,
        |  len(toks) >= 20 AND len(toks) <= 1000 AND len(list_distinct(toks)) >= 10 AS passes_quality
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_tokencount" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
        |    CAST(len(regexp_extract_all(text, '\p{L}+|\p{N}+')) AS BIGINT) AS bpe_ish_tokens
        |  FROM documents)
        |SELECT doc_id, ws_tokens, bpe_ish_tokens,
        |  CAST(bpe_ish_tokens AS DOUBLE) / ws_tokens AS pieces_per_word
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_fingerprint" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(list_filter(string_split(text, ''), c -> c <> ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007) AS fp,
        |    list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(list_filter(string_split(substr(text, 1, 64), ''), c -> c <> ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007) AS fp_prefix
        |  FROM documents)
        |SELECT doc_id, fp, fp_prefix, CAST(fp % 1024 AS INT) AS fp_bucket
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id, lang, text,
        |    list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS toks
        |  FROM documents
        |), s AS (
        |  SELECT doc_id, lang, text,
        |    len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in'], x))) AS s_en,
        |    len(list_filter(toks, x -> list_contains(['el','la','de','y','que','los'], x))) AS s_es,
        |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht'], x))) AS s_de,
        |    len(list_filter(toks, x -> list_contains(['le','la','et','les','des','une'], x))) AS s_fr
        |  FROM t)
        |SELECT doc_id, lang AS labeled_lang,
        |  CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |       WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
        |       WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
        |       WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
        |       WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
        |       ELSE 'fr' END AS predicted_lang,
        |  CAST(s_en + s_es + s_de + s_fr AS BIGINT) AS stopword_hits
        |FROM s ORDER BY doc_id""".stripMargin,

    // ---- dedup (SQL-expressible subset) ----
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
        |  count(*) AS n_copies
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,

    "dedup_jaccard" ->
      """WITH d AS (
        |  SELECT doc_id, lang, CAST(floor(length(text) / 100.0) AS INT) AS len_bucket,
        |    list_distinct(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')) AS toks
        |  FROM documents)
        |SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
        |  CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_inter,
        |  CAST(len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks)) AS BIGINT) AS n_union,
        |  CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) AS jaccard
        |FROM d a JOIN d b ON a.lang = b.lang AND a.len_bucket = b.len_bucket
        |  AND a.doc_id < b.doc_id
        |WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
        |    (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin)
}
