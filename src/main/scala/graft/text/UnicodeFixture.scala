package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The non-ASCII parity corpus: a FIXED document set embedded as
  * literals on BOTH engine sides — `df` builds the Spark frame,
  * `sqlSource` renders the identical rows as a DuckDB VALUES source —
  * so the text_unicode_* queries hash-check full tokenizer/fold/regex
  * parity on text the parquet testdata (ASCII by construction) cannot
  * exercise. Coverage, one behavior per doc where possible:
  *
  *  - accented Latin (precomposed) and German sharp-s / umlauts;
  *  - CJK ideographs, Japanese kana+kanji, Hangul (all BMP multi-byte);
  *  - Cyrillic and Greek;
  *  - non-BMP: emoji and mathematical alphanumerics — SURROGATE PAIRS
  *    in the JVM, the case where a UTF-16-unit fold diverges from a
  *    codepoint fold;
  *  - mixed ASCII whitespace (tab, LF, CRLF, double spaces) — the
  *    separator class [ \t\n\r]+ must collapse them identically;
  *  - Unicode spaces (NBSP U+00A0, ideographic U+3000) — NOT in the
  *    separator class, must ride INSIDE tokens in both engines;
  *  - RTL Arabic script;
  *  - combining marks: 'e'+U+0301 vs precomposed 'é' — two DIFFERENT
  *    codepoint sequences that must stay different (no engine may
  *    normalize);
  *  - leading/trailing whitespace (empty-split edge).
  *
  * Strings live in ONE place (this Seq); the SQL rendering derives from
  * it, so the two sides cannot drift. */
object UnicodeFixture {

  val docs: Seq[(Long, String)] = Seq(
    1L -> "café crème brûlée à côté de la fenêtre",
    2L -> "mañana señor über straße größer grün",
    3L -> "汉字 文本 数据 处理 引擎 数据",
    4L -> "日本語の テキスト 処理 パイプライン",
    5L -> "한국어 텍스트 처리 엔진 텍스트",
    6L -> "данные текст обработка данных текст",
    7L -> "δεδομένα κείμενο ανάλυση",
    8L -> "hello 😀😀 world 🚀 𝕳𝖊𝖑𝖑𝖔 a😀b hello",
    9L -> "tabs\tand\nnewlines\r\nand  double  spaces and",
    10L -> "nbsp glued ideographic　glued tokens",
    11L -> "نص عربي للاختبار مرحبا نص",
    12L -> "étoile étoile mixed normalization étoile",
    13L -> " leading and trailing whitespace \t",
    14L -> "the quick café jumps over the lazy 汉字 dog the end")

  def df(s: SparkSession): DataFrame = {
    import s.implicits._
    docs.toDF("doc_id", "text")
  }

  /** The same rows as a DuckDB FROM-able source:
    * `(VALUES (CAST(1 AS BIGINT), '…'), …) AS __unicode(doc_id, text)`.
    * Control characters (tab/newline/CR) ride as raw bytes inside the
    * SQL string literal — legal SQL, and Verify's JSON escaper handles
    * them on the way to oracle_sql.json. Single quotes are doubled
    * (none in the fixture today, but the rendering must not depend on
    * that). */
  def sqlSource: String =
    docs.map { case (id, t) => s"(CAST($id AS BIGINT), '${t.replace("'", "''")}')" }
      .mkString("(VALUES ", ", ", ") AS __unicode(doc_id, text)")
}
