package graft.queries

/** DuckDB oracle SQL for [[Declared6]]. Same dialect contract as
  * [[Oracle]]..[[Oracle5]] — Scala constants interpolated so tuning
  * cannot desynchronize the engines, BIGINT casts around DuckDB's
  * HUGEINT sum widening, `//` (DuckDB) paired with `div` (Spark) for
  * exact floor division, money in integer cents. q56b reuses q56's
  * oracle text verbatim: the bloom prefilter is exact-by-construction
  * (false positives die in the exact join), so the two queries share
  * one answer. The PageRank oracle unrolls [[Declared6.PrIters]]
  * iterations mechanically from the same constants. */
object Oracle6 {
  import Declared6.{HhPhi, MergeInsertMod, MergeInsertBase, MixBudget, PrScale, PrIters,
    SpanN, HsK, HsMul, HsMod, PiDim, PiScale, PiVecScale, PiMatCap, PiIters}

  private val prBase = 15L * PrScale / 100

  /** Unrolled fixed-point PageRank: c_i/r_i CTE pair per iteration. */
  private val pagerankSql: String = {
    val iters = (1 to PrIters).map { i =>
      s"""c$i AS (SELECT e.dst AS nid, CAST(sum(r.pr // d.deg) AS BIGINT) AS s
         |  FROM edges e JOIN deg d ON e.src = d.src JOIN r${i - 1} r ON e.src = r.nid
         |  GROUP BY e.dst),
         |r$i AS (SELECT n.nid,
         |  CAST($prBase + (85 * coalesce(c.s, 0)) // 100 AS BIGINT) AS pr
         |  FROM r${i - 1} n LEFT JOIN c$i c ON n.nid = c.nid)""".stripMargin
    }.mkString(",\n")
    s"""WITH li AS (
       |  SELECT DISTINCT l_suppkey * 2 AS a, l_partkey * 2 + 1 AS b FROM lineitem),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM li
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM li),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
       |r0 AS (SELECT src AS nid, CAST($PrScale AS BIGINT) AS pr FROM deg),
       |$iters
       |SELECT CASE WHEN nid % 2 = 0 THEN 'supplier' ELSE 'part' END AS node_type,
       |  nid // 2 AS node_key, pr
       |FROM r$PrIters
       |ORDER BY node_type, node_key""".stripMargin
  }

  /** Unrolled fixed-point power iteration. Integer division is `//`
    * (truncating in DuckDB, same as Spark's `div` — verified identical
    * on negatives), so the whole pipeline is bit-exact. */
  private val powerIterationSql: String = {
    val iters = (1 to PiIters).map { i =>
      s"""w$i AS (
         |  SELECT ms.i, CAST(sum(ms.ms * v.vj) AS BIGINT) AS wi
         |  FROM ms JOIN v${i - 1} v ON ms.j = v.j GROUP BY ms.i),
         |x$i AS (SELECT CAST(max(abs(wi)) AS BIGINT) AS mw FROM w$i),
         |v$i AS (SELECT i AS j, wi // greatest(1, mw // $PiVecScale) AS vj
         |        FROM w$i, x$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH q AS (
       |  SELECT vec_id, CAST(i AS INT) AS i,
       |    CAST(floor(CAST(embedding[i] AS DOUBLE) * $PiScale) AS BIGINT) AS qi
       |  FROM embeddings, unnest(range(1, ${PiDim + 1})) AS u(i)),
       |m AS (
       |  SELECT a.i AS i, b.i AS j, CAST(sum(a.qi * b.qi) AS BIGINT) AS mij
       |  FROM q a JOIN q b USING (vec_id) GROUP BY a.i, b.i),
       |mx AS (SELECT CAST(max(abs(mij)) AS BIGINT) AS maxm FROM m),
       |ms AS (SELECT i, j, mij // greatest(1, maxm // $PiMatCap) AS ms FROM m, mx),
       |v0 AS (SELECT DISTINCT i AS j, CAST($PiVecScale AS BIGINT) AS vj FROM m),
       |$iters
       |SELECT j AS dim, vj AS v FROM v$PiIters ORDER BY dim""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q73_power_iteration" -> powerIterationSql,
    "q65_heavy_hitters" ->
      s"""WITH t AS (
         |  SELECT list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS toks
         |  FROM documents),
         |b AS (
         |  SELECT toks[i] || ' ' || toks[i + 1] AS bigram
         |  FROM t, unnest(range(1, len(toks))) AS u(i)),
         |c AS (SELECT bigram, CAST(count(*) AS BIGINT) AS cnt FROM b GROUP BY bigram),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM b)
         |SELECT bigram, cnt FROM c, tot WHERE cnt * $HhPhi > n
         |ORDER BY bigram""".stripMargin,

    "q66_merge_upsert" ->
      s"""WITH base AS (
         |  SELECT c_custkey AS k, c_name AS bname,
         |    CAST(floor(c_acctbal * 100) AS BIGINT) AS bbal
         |  FROM customer),
         |latest AS (
         |  SELECT o_custkey AS k,
         |    CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
         |    CAST(floor(o_totalprice * 100) AS BIGINT) AS delta,
         |    o_orderstatus AS st
         |  FROM (SELECT *, row_number() OVER (
         |          PARTITION BY o_custkey
         |          ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
         |        FROM orders)
         |  WHERE rn = 1),
         |ins AS (
         |  SELECT o_orderkey + $MergeInsertBase AS k, 'I' AS op,
         |    CAST(floor(o_totalprice * 100) AS BIGINT) AS delta, '' AS st
         |  FROM orders WHERE o_orderkey % $MergeInsertMod = 0),
         |changes AS (SELECT * FROM latest UNION ALL SELECT * FROM ins)
         |SELECT coalesce(b.k, c.k) AS c_custkey,
         |  CASE WHEN c.op IS NULL THEN b.bname
         |       WHEN c.op = 'I' THEN 'new_customer_' || CAST(c.k - $MergeInsertBase AS VARCHAR)
         |       WHEN c.st = 'O' THEN b.bname || '+'
         |       ELSE b.bname END AS name,
         |  CASE WHEN c.op IS NULL THEN b.bbal
         |       WHEN c.op = 'I' THEN c.delta
         |       ELSE b.bbal + c.delta END AS bal_cents,
         |  CASE WHEN c.op IS NULL THEN 'keep'
         |       WHEN c.op = 'I' THEN 'insert'
         |       ELSE 'update' END AS last_op
         |FROM base b FULL OUTER JOIN changes c ON b.k = c.k
         |WHERE c.op IS NULL OR c.op <> 'D'
         |ORDER BY c_custkey""".stripMargin,

    "q67_skyline" ->
      """WITH p AS (
        |  SELECT p_partkey, CAST(floor(p_retailprice * 100) AS BIGINT) AS cents,
        |    p_size
        |  FROM part)
        |SELECT p_partkey, cents, p_size
        |FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.cents <= a.cents AND b.p_size >= a.p_size
        |    AND (b.cents < a.cents OR b.p_size > a.p_size))
        |ORDER BY p_partkey""".stripMargin,

    "q68_data_mixture" ->
      s"""WITH src AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS avail,
         |    CAST(substr(source, 4) AS BIGINT) % 5 + 1 AS w
         |  FROM documents GROUP BY source),
         |tot AS (SELECT CAST(sum(w) AS BIGINT) AS sumw FROM src),
         |q0 AS (
         |  SELECT source, w,
         |    ($MixBudget * w) // sumw AS quota0,
         |    ($MixBudget * w) % sumw AS rem
         |  FROM src, tot),
         |ex AS (SELECT $MixBudget - CAST(sum(quota0) AS BIGINT) AS extra FROM q0),
         |q AS (
         |  SELECT source,
         |    quota0 + CASE WHEN row_number() OVER (ORDER BY rem DESC, source) <= extra
         |             THEN 1 ELSE 0 END AS quota
         |  FROM q0, ex),
         |sel AS (
         |  SELECT doc_id, source,
         |    row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
         |  FROM documents)
         |SELECT sel.doc_id, sel.source
         |FROM sel JOIN q ON sel.source = q.source
         |WHERE sel.rn <= q.quota
         |ORDER BY sel.doc_id""".stripMargin,

    "q56b_contam_bloom" -> Oracle5.oracleSql("q56_contamination"),

    "q69_pagerank" -> pagerankSql,

    "q70_dup_spans" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS toks
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, CAST(i AS INT) AS pos,
         |    list_aggregate(toks[i:i + ${SpanN - 1}], 'string_agg', ' ') AS gram
         |  FROM t, unnest(range(1, len(toks) - ${SpanN - 2})) AS u(i)),
         |d AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
         |m AS (SELECT doc_id, pos, gram IN (SELECT gram FROM d) AS isdup FROM g)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(count(*) FILTER (isdup) AS BIGINT) AS n_dup_spans,
         |  min(pos) FILTER (isdup) AS first_dup_pos
         |FROM m GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    "q71_hash_sample" ->
      s"""WITH p AS (
         |  SELECT doc_id, source, (doc_id * $HsMul) % $HsMod AS priority
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source, priority, row_number() OVER (
         |    PARTITION BY source ORDER BY priority, doc_id) AS rn
         |  FROM p)
         |SELECT doc_id, source, priority FROM r WHERE rn <= $HsK
         |ORDER BY source, doc_id""".stripMargin,

    // deliberately the FULL recompute — equality with the Spark side's
    // base+delta partial-merge IS the IVM-correctness statement
    "q72_incr_agg" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        |  min(CAST(floor(value * 100) AS BIGINT)) AS min_cents,
        |  max(CAST(floor(value * 100) AS BIGINT)) AS max_cents
        |FROM events GROUP BY user_id
        |ORDER BY user_id""".stripMargin)
}
