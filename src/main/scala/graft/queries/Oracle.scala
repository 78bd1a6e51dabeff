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
        |    unnest(string_split(text, ' ')) AS t(token)
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
        |FROM embeddings GROUP BY 1, 2 ORDER BY label, dim""".stripMargin)
}
