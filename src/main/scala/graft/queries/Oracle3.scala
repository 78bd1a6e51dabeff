package graft.queries

/** DuckDB oracle SQL for [[Declared3]] and the round-3 LLM-pipeline
  * operators (PII redaction, repetition detection, duplicate-cluster
  * connected components). Same dialect notes as [[Oracle]]/[[Oracle2]];
  * new here:
  *
  *  - DuckDB regexp_replace needs the explicit 'g' flag (Spark's is
  *    global by default);
  *  - the connected-components oracle is a WITH RECURSIVE transitive
  *    closure — exponentially simpler than (and independent from) the
  *    engine's label-propagation loop, which is exactly what makes it a
  *    real check;
  *  - q38's closed-form statistics are written with the same
  *    parenthesization as the Spark side so the IEEE operation sequence
  *    is identical (operands are exact integers < 2^53 by design).
  */
object Oracle3 {

  /** Token-set CTE shared with the dedup_jaccard oracle shape. */
  private val jaccardPairsCte =
    """d AS (
      |  SELECT doc_id, lang, CAST(floor(length(text) / 100.0) AS INT) AS len_bucket,
      |    list_distinct(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')) AS toks
      |  FROM documents),
      |p AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM d a JOIN d b ON a.lang = b.lang AND a.len_bucket = b.len_bucket
      |    AND a.doc_id < b.doc_id
      |  WHERE least(len(a.toks), len(b.toks)) * 2 >= greatest(len(a.toks), len(b.toks))
      |    AND CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE) /
      |      (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))) >= 0.5)""".stripMargin

  /** Generated SQL for the portable MinHash band hashes — one expression
    * per band, built from the SAME constant arrays the Scala kernel uses
    * (graft.functions.Signatures.PortableA/B), so the two definitions
    * cannot drift. */
  private[queries] def portableBandCols: String = {
    import graft.functions.Signatures.{MixMul, PolyMod, PortableA, PortableB}
    val mins = PortableA.indices.map(i =>
      s"list_min(list_transform(h0, h -> (${PortableA(i)} * h + ${PortableB(i)}) % $PolyMod))")
    val rows = PortableA.length / 4
    (0 until 4).map { b =>
      val folded = (b * rows until (b + 1) * rows)
        .map(mins)
        .foldLeft("CAST(0 AS BIGINT)")((acc, m) => s"(($acc) * $MixMul + ($m)) % $PolyMod")
      s"($folded) AS bh$b"
    }.mkString(",\n")
  }

  /** Generated SQL for the portable 60-bit SimHash signature — one
    * CASE per bit over the doc's token-hash list, built from the SAME
    * constant arrays the Scala kernel uses
    * (graft.functions.Signatures.SimPortA/B), so the two definitions
    * cannot drift. Bit b is set iff the count of tokens whose b-th
    * universal hash is odd exceeds half the token count (vote sum > 0),
    * packed by adding 2^b — all sums < 2^63 by the 60-bit width. */
  /** 15: equal piece width of the 60-bit signature over the shared
    * SimhashPieces=4 pigeonhole blocking. */
  private def simPieceWidth: Int =
    graft.functions.Signatures.SimPortBits / graft.dedup.Dedup.SimhashPieces

  private[queries] def portableSimhashSigExpr: String = {
    import graft.functions.Signatures.{PolyMod, SimPortA, SimPortB, SimPortBits}
    (0 until SimPortBits).map { b =>
      s"(CASE WHEN len(list_filter(h0s, h -> ((${SimPortA(b)} * h + ${SimPortB(b)}) % $PolyMod) % 2 = 1)) * 2 > len(h0s) THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString("\n    + ")
  }

  val oracleSql: Map[String, String] = Map(
    // the 60-bit portable SimHash near-dup query end to end: polyHash
    // token hashes, 60 parity-vote bits, 4×15-bit pigeonhole blocking,
    // bit_count(xor) Hamming — the same integer recurrences as the
    // engine kernel, so signatures (and any hash collisions) agree
    // exactly across engines
    "dedup_simhash_portable" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |    list_distinct(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')) AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, list_transform(toks, tk -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(list_filter(string_split(tk, ''), c -> c <> ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007)) AS h0s
        |  FROM t WHERE len(toks) > 0),
        |sig AS (SELECT doc_id, $portableSimhashSigExpr AS sh FROM h),
        |bl AS (
        |  SELECT doc_id, sh, r.p AS piece,
        |    (sh >> (CAST(r.p AS INT) * ${simPieceWidth})) & ${(1L << simPieceWidth) - 1} AS pv
        |  FROM sig, range(${graft.dedup.Dedup.SimhashPieces}) r(p)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b,
        |    a.sh AS sha, c.sh AS shb
        |  FROM bl a JOIN bl c ON a.piece = c.piece AND a.pv = c.pv
        |    AND a.doc_id < c.doc_id)
        |SELECT doc_a, doc_b, CAST(bit_count(xor(sha, shb)) AS INT) AS hamming
        |FROM cand WHERE bit_count(xor(sha, shb)) <= ${graft.dedup.Dedup.SimhashRadius}
        |ORDER BY doc_a, doc_b""".stripMargin,

    // the whole LSH index — shingle hashes, permutations, banding,
    // candidate generation, verification — rebuilt in SQL from the same
    // integer recurrences; hash collisions (if any) are the same
    // collisions in both engines, so counts agree exactly
    "dedup_minhash_portable" ->
      s"""WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    list_transform(range(1, len(toks) - 1),
        |      i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS shs
        |  FROM t WHERE len(toks) >= 3),
        |h AS (
        |  SELECT doc_id,
        |    list_transform(shs, sh -> list_reduce(
        |      list_prepend(CAST(0 AS BIGINT),
        |        list_transform(list_filter(string_split(sh, ''), c -> c <> ''),
        |          c -> CAST(ascii(c) AS BIGINT))),
        |      (a, b) -> (a * 31 + b) % 1000000007)) AS h0
        |  FROM s),
        |b AS (SELECT doc_id, $portableBandCols FROM h),
        |bl AS (
        |  SELECT doc_id, 0 AS band, bh0 AS bh FROM b
        |  UNION ALL SELECT doc_id, 1, bh1 FROM b
        |  UNION ALL SELECT doc_id, 2, bh2 FROM b
        |  UNION ALL SELECT doc_id, 3, bh3 FROM b),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
        |  FROM bl a JOIN bl c ON a.band = c.band AND a.bh = c.bh
        |    AND a.doc_id < c.doc_id),
        |hs AS (SELECT doc_id, list_distinct(h0) AS hset FROM h)
        |SELECT doc_a, doc_b,
        |  CAST(len(list_intersect(x.hset, y.hset)) AS BIGINT) AS n_inter,
        |  CAST(len(x.hset) + len(y.hset) - len(list_intersect(x.hset, y.hset)) AS BIGINT) AS n_union,
        |  CAST(len(list_intersect(x.hset, y.hset)) AS DOUBLE) /
        |    CAST(len(x.hset) + len(y.hset) - len(list_intersect(x.hset, y.hset)) AS DOUBLE) AS jaccard
        |FROM cand
        |  JOIN hs x ON x.doc_id = cand.doc_a
        |  JOIN hs y ON y.doc_id = cand.doc_b
        |WHERE CAST(len(list_intersect(x.hset, y.hset)) AS DOUBLE) /
        |    CAST(len(x.hset) + len(y.hset) - len(list_intersect(x.hset, y.hset)) AS DOUBLE) >= 0.5
        |ORDER BY doc_a, doc_b""".stripMargin,

    "q35_range_frame" ->
      """SELECT o_orderkey, o_orderpriority, o_totalprice,
        |  CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT) AS near_cents,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS near_n
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice
        |             RANGE BETWEEN 10000.0 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    // generate_subscripts/unnest zip positionally (same SRF pairing as the
    // q28b/sim oracles); subscripts are 1-based like Spark's pos + 1
    "q36_posexplode" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS toks
        |  FROM documents WHERE doc_id < 100)
        |SELECT doc_id, pos, token FROM (
        |  SELECT doc_id, CAST(generate_subscripts(toks, 1) AS INT) AS pos,
        |    unnest(toks) AS token
        |  FROM t)
        |WHERE pos <= 8
        |ORDER BY doc_id, pos""".stripMargin,

    "q37_quantified_subq" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 7500)
        |  AND o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |  AND o_totalprice > (SELECT CAST(SUM(CAST(floor(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
        |                             / count(*) / 100.0
        |                      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,

    "q38_exact_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag, count(*) AS n,
        |    SUM(CAST(floor(l_quantity) AS BIGINT)) AS sq,
        |    SUM(CAST(floor(l_quantity) AS BIGINT) * CAST(floor(l_quantity) AS BIGINT)) AS sqq,
        |    SUM(CAST(floor(l_discount * 100) AS BIGINT)) AS sd,
        |    SUM(CAST(floor(l_discount * 100) AS BIGINT) * CAST(floor(l_discount * 100) AS BIGINT)) AS sdd,
        |    SUM(CAST(floor(l_quantity) AS BIGINT) * CAST(floor(l_discount * 100) AS BIGINT)) AS sqd
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |  CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mean_qty,
        |  CASE WHEN n > 1 THEN
        |    sqrt((CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        |         / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) END AS std_qty,
        |  CASE WHEN n > 1 AND (n * sqq - sq * sq) > 0 AND (n * sdd - sd * sd) > 0 THEN
        |    (CAST(n AS DOUBLE) * CAST(sqd AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sd AS DOUBLE))
        |      / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE) - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
        |         * sqrt(CAST(n AS DOUBLE) * CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)))
        |    END AS corr_qty_disc
        |FROM m ORDER BY l_returnflag""".stripMargin,

    "text_pii_redact" ->
      """WITH t AS (
        |  SELECT c_custkey,
        |    c_name || ' <' || replace(lower(c_name), '#', '.') || '@example.com' ||
        |    '> phone ' || printf('%03d-%04d', c_custkey % 1000, (c_custkey * 7919) % 10000) ||
        |    ' seg ' || c_mktsegment AS txt
        |  FROM customer)
        |SELECT c_custkey,
        |  CAST(len(regexp_extract_all(txt, '[a-z0-9.]+@[a-z]+\.[a-z]+')) AS INT) AS n_emails,
        |  CAST(len(regexp_extract_all(txt, '\d{3}-\d{4}')) AS INT) AS n_phones,
        |  regexp_replace(regexp_replace(txt, '[a-z0-9.]+@[a-z]+\.[a-z]+', '[EMAIL]', 'g'),
        |    '\d{3}-\d{4}', '[PHONE]', 'g') AS redacted
        |FROM t ORDER BY c_custkey""".stripMargin,

    "text_repetition" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS toks
        |  FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])) AS gram
        |  FROM t WHERE len(toks) >= 2),
        |c AS (SELECT doc_id, gram, count(*) AS n FROM g GROUP BY doc_id, gram)
        |SELECT doc_id,
        |  CAST(SUM(n) AS BIGINT) AS n_grams,
        |  CAST(count(*) AS BIGINT) AS n_distinct_grams,
        |  CAST(max(n) AS BIGINT) AS top_gram_freq,
        |  CAST(SUM(n) - count(*) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS dup_frac,
        |  CAST(max(n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS top_frac
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q39_locf" ->
      """SELECT event_id, user_id, v,
        |  last_value(v IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        |FROM (SELECT event_id, user_id, ts,
        |        CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
        |      FROM events)
        |ORDER BY event_id""".stripMargin,

    // unnest drops empty arrays; substituting [NULL] for the empty array
    // reproduces explode_outer's null-preserving row exactly
    "q40_explode_outer" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> length(x) > 6) AS long_toks
        |  FROM documents)
        |SELECT doc_id, CAST(len(long_toks) AS INT) AS n_long,
        |  unnest(CASE WHEN len(long_toks) = 0 THEN [CAST(NULL AS VARCHAR)]
        |         ELSE long_toks END) AS long_tok
        |FROM t
        |ORDER BY doc_id, long_tok NULLS FIRST""".stripMargin,

    // transitive closure over the (undirected) near-dup pair graph;
    // min reachable node id == min id in the component
    "dedup_clusters" ->
      s"""WITH RECURSIVE $jaccardPairsCte,
        |e AS (SELECT doc_a AS s, doc_b AS t FROM p
        |      UNION SELECT doc_b, doc_a FROM p),
        |reach(v, r) AS (
        |  SELECT s, s FROM e
        |  UNION
        |  SELECT e.t, reach.r FROM reach JOIN e ON e.s = reach.v)
        |SELECT v AS doc_id, min(r) AS cluster_id
        |FROM reach GROUP BY v ORDER BY doc_id""".stripMargin,
    // cluster consolidation: same recursive closure, then per cluster
    // the integer-exact argmax (distinct tokens desc, tokens desc,
    // doc_id asc) replayed as a window rank — token counts use the SAME
    // whitespace-class split as the Spark side's TextAnalysis.tokens
    "dedup_canonical" ->
      s"""WITH RECURSIVE $jaccardPairsCte,
        |e AS (SELECT doc_a AS s, doc_b AS t FROM p
        |      UNION SELECT doc_b, doc_a FROM p),
        |reach(v, r) AS (
        |  SELECT s, s FROM e
        |  UNION
        |  SELECT e.t, reach.r FROM reach JOIN e ON e.s = reach.v),
        |cl AS (SELECT v AS doc_id, min(r) AS cluster_id
        |       FROM reach GROUP BY v),
        |m AS (
        |  SELECT cl.cluster_id, cl.doc_id,
        |         CAST(len(list_distinct(t.tk)) AS BIGINT) AS nd,
        |         CAST(len(t.tk) AS BIGINT) AS nt
        |  FROM cl JOIN (
        |    SELECT doc_id,
        |      list_filter(string_split_regex(text, '[ \\t\\n\\r]+'), x -> x <> '') AS tk
        |    FROM documents) t USING (doc_id)),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY cluster_id ORDER BY nd DESC, nt DESC, doc_id) AS rn
        |      FROM m),
        |cnt AS (SELECT cluster_id, count(*) AS n_members FROM m GROUP BY 1)
        |SELECT r.cluster_id, CAST(cnt.n_members AS BIGINT) AS n_members,
        |       r.doc_id AS keep_id, r.nd AS keep_distinct, r.nt AS keep_tokens
        |FROM r JOIN cnt USING (cluster_id)
        |WHERE r.rn = 1
        |ORDER BY cluster_id""".stripMargin)
}
