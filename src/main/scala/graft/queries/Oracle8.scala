package graft.queries

/** DuckDB oracle SQL for [[UnicodeParity]] — the non-ASCII parity
  * queries. Same dialect contract as [[Oracle]]..[[Oracle7]], with one
  * structural difference: the source is not a parquet table but the
  * SAME literal rows as the Spark side, rendered by
  * [[graft.text.UnicodeFixture.sqlSource]] into a VALUES clause — so a
  * hash match here proves the two engines agree on tokenization,
  * codepoint arithmetic, \p-class regexes, string ordering, and the
  * BPE chain over multi-script text, with zero possibility of the two
  * sides reading different bytes. */
object Oracle8 {

  private val src = graft.text.UnicodeFixture.sqlSource

  /** Codepoint polynomial fold — the text_fingerprint recurrence. */
  private def polySql(expr: String): String =
    s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform(list_filter(string_split($expr, ''), c -> c <> ''),
       |        c -> CAST(ascii(c) AS BIGINT))),
       |      (a, b) -> (a * 31 + b) % 1000000007)""".stripMargin

  val sql: Map[String, String] = Map(
    "text_unicode_stats" ->
      s"""WITH t AS (
         |  SELECT doc_id, text,
         |    list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '') AS toks
         |  FROM $src)
         |SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
         |  CAST(len(regexp_extract_all(text, '\\p{L}+|\\p{N}+')) AS BIGINT) AS n_bpeish,
         |  list_min(toks) AS min_token,
         |  CAST(len(list_distinct([array_to_string(toks[i:i+1], ' ')
         |                          for i in range(1, len(toks))])) AS BIGINT) AS n_2grams,
         |  ${polySql("text")} AS fp,
         |  ${polySql("substr(text, 1, 8)")} AS fp_prefix
         |FROM t ORDER BY doc_id""".stripMargin,

    "text_unicode_terms" ->
      s"""WITH d AS (
         |  SELECT doc_id,
         |    unnest(list_filter(string_split_regex(text, '[ \t\n\r]+'), x -> x <> '')) AS term
         |  FROM $src)
         |SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |FROM d GROUP BY doc_id, term ORDER BY doc_id, term""".stripMargin,

    "text_unicode_bpe" -> Oracle7.bpeEncodeSqlFor(src),

    // Perceptual dHash near-dup pairs: the hash is rebuilt from the
    // closed-form procedural pixels (ImageIoCodec's geometry/channel
    // arithmetic as literals — the mm_decode_features pattern), the
    // pairing brute-forces all i<j with bit_count(xor) — so the Spark
    // side's decode, block-mean arithmetic, AND pigeonhole blocking
    // exactness are all under one hash. Block bucket (x*8)//w mirrors
    // the integer division in DHash.dhash56; the mean comparison is the
    // same cross-multiplication.
    "mm_phash_pairs" ->
      s"""WITH imgs AS (
         |  SELECT doc_id AS m, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h,
         |         doc_id % 256 AS c
         |  FROM documents WHERE doc_id % 3 = 0),
         |px AS (
         |  SELECT m, (x*8)//w AS i, (y*8)//h AS j,
         |    ((c*7 + x*3 + y*5) % 256) + ((c*11 + x*5 + y*7) % 256)
         |      + ((c*13 + x*7 + y*11) % 256) AS g
         |  FROM imgs,
         |    LATERAL (SELECT unnest(range(w)) AS x) tx,
         |    LATERAL (SELECT unnest(range(h)) AS y) ty),
         |cells AS (
         |  SELECT m, j, i, CAST(sum(g) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
         |  FROM px GROUP BY m, j, i),
         |bits AS (
         |  SELECT a.m,
         |    CAST(sum(CASE WHEN b.s * a.n > a.s * b.n
         |                  THEN (CAST(1 AS BIGINT) << CAST(a.j*7 + a.i AS INT))
         |                  ELSE 0 END) AS BIGINT) AS sh
         |  FROM cells a JOIN cells b ON a.m = b.m AND a.j = b.j AND b.i = a.i + 1
         |  GROUP BY a.m)
         |SELECT a.m AS media_a, b.m AS media_b,
         |  CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
         |FROM bits a JOIN bits b ON a.m < b.m
         |WHERE bit_count(xor(a.sh, b.sh)) <= ${graft.multimodal.Multimodal.DHash.Radius}
         |ORDER BY media_a, media_b""".stripMargin)
}
