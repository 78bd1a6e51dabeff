package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for large-scale training-data pipelines:
  * quality scoring, token counting, language ID, document fingerprinting.
  * All pure per-row Column expressions (higher-order array functions — no
  * UDFs, fully codegen-compatible, embarrassingly parallel at 100 TB: the
  * only shuffle in any of these queries is the final presentation sort).
  *
  * Every query here is DuckDB-oracle-checked: ratios are single IEEE
  * divisions of exact integer counts (identical in both engines), and the
  * fingerprint uses modular integer arithmetic (no float at all).
  */
object TextAnalysis {

  /** Non-empty whitespace tokens (Python-split parity: drop ''). Splits
    * on the ASCII whitespace class [ \t\n\r]+
    * ([[graft.functions.Signatures.TokenSepRegex]] — the explicit class
    * java.util.regex and DuckDB's RE2 agree on; every oracle twin uses
    * string_split_regex with the same literal class). Unicode spaces
    * (NBSP, U+3000, …) ride inside tokens in BOTH engines — tested, not
    * assumed, on the Unicode fixture (text_unicode_* queries). On the
    * single-0x20-separated testdata this is value-identical to the
    * historical single-space split. */
  def tokens(text: Column): Column =
    filter(split(text, graft.functions.Signatures.TokenSepRegex), t => t =!= "")

  private val stopEn = Seq("the", "a", "of", "to", "and", "in", "is", "on")

  /** Quality metrics per document: length, token stats, stopword ratio,
    * type-token ratio, and a gate boolean — the usual pre-training corpus
    * filters (length/punct/stopword heuristics). */
  def quality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val nTok = size(toks).cast("bigint")
    val sumLen = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val nStop = size(filter(toks, t =>
      array_contains(typedlit(stopEn), t))).cast("bigint")
    val nDistinct = size(array_distinct(toks)).cast("bigint")
    Tables(s, dir, "documents")
      .select($"doc_id", $"lang",
        length($"text").cast("bigint").as("n_chars_actual"),
        nTok.as("n_tokens"),
        (sumLen.cast("double") / nTok).as("avg_token_len"),
        (nStop.cast("double") / nTok).as("stopword_ratio"),
        (nDistinct.cast("double") / nTok).as("type_token_ratio"),
        (nTok >= 20 && nTok <= 1000 && nDistinct >= 10).as("passes_quality"))
      .orderBy($"doc_id")
  }

  /** BPE-ish segmentation regex: Unicode letter runs / number runs.
    * `\p{L}`/`\p{N}` parse identically in java.util.regex and RE2
    * (verified on accented Latin, CJK, Hangul in the Unicode fixture);
    * on the ASCII corpus it degenerates to the historical
    * [a-z]+|[0-9]+ up to case (the synthetic docs are lowercase). */
  val BpeIshRegex = "\\p{L}+|\\p{N}+"

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs / number runs), the cheap proxy for tokenizer cost
    * estimation over a corpus. */
  def tokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ws = size(tokens($"text")).cast("bigint")
    val bpe = size(regexp_extract_all($"text", lit(BpeIshRegex), lit(0))).cast("bigint")
    Tables(s, dir, "documents")
      .select($"doc_id", ws.as("ws_tokens"), bpe.as("bpe_ish_tokens"),
        (bpe.cast("double") / ws).as("pieces_per_word"))
      .orderBy($"doc_id")
  }

  /** Polynomial rolling-hash document fingerprint over the character
    * stream: h = (h*31 + ascii(c)) mod 1e9+7 — exact integer arithmetic,
    * reproducible across engines/partitionings, usable as a cheap
    * content-identity key at any scale. Also emits the fingerprint of the
    * first 64 chars (prefix fingerprint) and a 1024-way shard bucket. */
  def fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // filter the empty string Java's split("") can append — DuckDB's
    // char split never produces it, and parity matters for the oracle
    def poly(c: Column): Column =
      aggregate(
        transform(filter(split(c, ""), ch => ch =!= ""),
          ch => ascii(ch).cast("bigint")),
        lit(0L), (a, b) => (a * 31 + b) % 1000000007L)
    Tables(s, dir, "documents")
      .select($"doc_id",
        poly($"text").as("fp"),
        poly(substring($"text", 1, 64)).as("fp_prefix"),
        (poly($"text") % 1024).cast("int").as("fp_bucket"))
      .orderBy($"doc_id")
  }

  private val langStops: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "y", "que", "los"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une"))

  /** Heuristic language ID: per-language stopword hit counts, CJK
    * character presence for zh, deterministic argmax (first in list order
    * wins ties), 'und' when nothing scores. The oracle recomputes the
    * same formula — this checks the OPERATOR, not against the synthetic
    * corpus's `lang` label (which is an independent attribute). */
  def langId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = tokens($"text")
    val scores = langStops.map { case (lang, stops) =>
      lang -> size(filter(toks, t => array_contains(typedlit(stops), t)))
    }
    val hasCjk = length(regexp_replace($"text", "[^\\x{4e00}-\\x{9fff}]", "")) > 0
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.foldRight(when(lit(true), "und")) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lang).otherwise(acc)
    }
    Tables(s, dir, "documents")
      .select($"doc_id", $"lang".as("labeled_lang"),
        when(hasCjk, "zh").otherwise(pick).as("predicted_lang"),
        scores.map(_._2).reduce(_ + _).cast("bigint").as("stopword_hits"))
      .orderBy($"doc_id")
  }

  /** PII redaction — the scrub pass every training corpus runs before
    * anything else sees the text. Regex-driven (the patterns live in the
    * RE2 ∩ java.regex intersection so the oracle agrees), global
    * replacement, with per-row match counts for audit metrics. The
    * documents corpus is synthetic word soup with no PII, so the text
    * under test is composed deterministically from customer fields —
    * the OPERATOR (compose → count → redact) is what's checked. Pure
    * per-row projection: embarrassingly parallel at any scale. */
  val EmailRe = "[a-z0-9.]+@[a-z]+\\.[a-z]+"
  val PhoneRe = "\\d{3}-\\d{4}"

  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val email = concat(regexp_replace(lower($"c_name"), "#", "."), lit("@example.com"))
    val phone = format_string("%03d-%04d",
      pmod($"c_custkey", lit(1000L)), pmod($"c_custkey" * 7919L, lit(10000L)))
    val txt = concat($"c_name", lit(" <"), email, lit("> phone "), phone,
      lit(" seg "), $"c_mktsegment")
    Tables(s, dir, "customer")
      .select($"c_custkey", txt.as("txt"))
      .select($"c_custkey",
        regexp_count($"txt", lit(EmailRe)).cast("int").as("n_emails"),
        regexp_count($"txt", lit(PhoneRe)).cast("int").as("n_phones"),
        regexp_replace(regexp_replace($"txt", EmailRe, "[EMAIL]"),
          PhoneRe, "[PHONE]").as("redacted"))
      .orderBy($"c_custkey")
  }

  /** Intra-document repetition detection (the Gopher-style "repeated
    * n-gram fraction" quality rule): per document, total vs distinct
    * word-2-gram counts and the top 2-gram's share. Shaped for scale as
    * explode → two-level aggregation: the (doc_id, gram) partial
    * aggregate combines map-side, and the second aggregate reduces each
    * document to one row — never a per-document hash map in driver
    * memory. Ratios are single IEEE divisions of exact counts. */
  def repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = Tables(s, dir, "documents")
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= 2)
      .select($"doc_id", explode(expr(
        """transform(sequence(0, size(toks) - 2),
          |  i -> concat(element_at(toks, i + 1), ' ', element_at(toks, i + 2)))"""
          .stripMargin)).as("gram"))
    grams.groupBy($"doc_id", $"gram").agg(count(lit(1)).as("n"))
      .groupBy($"doc_id")
      .agg(sum($"n").as("n_grams"),
        count(lit(1)).as("n_distinct_grams"),
        max($"n").as("top_gram_freq"))
      .select($"doc_id", $"n_grams", $"n_distinct_grams", $"top_gram_freq",
        (($"n_grams" - $"n_distinct_grams").cast("double") /
          $"n_grams".cast("double")).as("dup_frac"),
        ($"top_gram_freq".cast("double") / $"n_grams".cast("double")).as("top_frac"))
      .orderBy($"doc_id")
  }

  /** Cross-document boilerplate detection (C4-style): word 5-gram
    * shingles, per-doc-distinct, that recur in ≥ 2 documents — the unit
    * a boilerplate-removal pass deletes (headers, disclaimers,
    * navigation chrome share long shingles across many pages; genuine
    * prose almost never does). Shape at 100 TB: per-doc shingling is a
    * pure projection; the only shuffle is the shingle groupBy, whose
    * map-side partial agg collapses each partition's repeats before the
    * exchange. (The corpus has no line structure — 5-gram shingles are
    * the line-equivalent unit here.) */
  def boilerplate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables(s, dir, "documents")
      // partition for the COMPUTE: a single-file scan would run the
      // whole shingling fan-out on one task (profiled 1.0 s/1t at sf0.1)
      .repartition(s.sparkContext.defaultParallelism, $"doc_id")
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= 5)
      .select($"doc_id", explode(expr(
        """array_distinct(transform(sequence(0, size(toks) - 5),
          |  i -> concat_ws(' ', element_at(toks, i + 1), element_at(toks, i + 2),
          |    element_at(toks, i + 3), element_at(toks, i + 4), element_at(toks, i + 5))))"""
          .stripMargin)).as("shingle"))
      .groupBy($"shingle")
      .agg(count(lit(1)).as("n_docs"), min($"doc_id").as("first_doc"))
      .filter($"n_docs" >= 2)
      .orderBy($"shingle")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_quality" -> quality _,
    "text_tokencount" -> tokenCount _,
    "text_fingerprint" -> fingerprint _,
    "text_langid" -> langId _,
    "text_pii_redact" -> piiRedact _,
    "text_repetition" -> repetition _,
    "text_boilerplate" -> boilerplate _)
}
