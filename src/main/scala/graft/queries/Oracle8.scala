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

    "text_unicode_bpe" -> Oracle7.bpeEncodeSqlFor(src))
}
