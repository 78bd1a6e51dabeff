package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.{TextAnalysis, UnicodeFixture}

/** The non-ASCII parity surface: the tokenizer-driven operator family
  * run over [[UnicodeFixture]] (inline literals on both engine sides —
  * these queries deliberately ignore the sfDir) and hash-checked
  * against DuckDB like every other CORRECTNESS entry. This is what
  * retires the old "ASCII corpus" precondition: tokenization on the
  * [ \t\n\r]+ class, codepoint length/substring, the codepoint
  * polynomial fold (incl. non-BMP surrogate pairs), \p{L}/\p{N} regex
  * segmentation, non-ASCII string ordering, and the full BPE
  * train+encode machinery are all TESTED behavior on accented Latin,
  * CJK, Hangul, Cyrillic, Greek, Arabic, emoji, Unicode spaces, and
  * combining marks. Engine-portability probes behind each choice are
  * documented at [[graft.functions.Signatures.TokenSepRegex]] and
  * [[graft.functions.Signatures.polyHash]]. */
object UnicodeParity {

  private type Q = (SparkSession, String) => DataFrame

  /** The text_fingerprint codepoint fold (h*31 + codepoint mod 1e9+7):
    * split('') is codepoint-wise in both engines and ascii() returns
    * the full codepoint — including >0xFFFF, where a UTF-16 fold would
    * have folded surrogate halves. */
  private def poly(c: Column): Column =
    aggregate(
      transform(filter(split(c, ""), ch => ch =!= ""),
        ch => ascii(ch).cast("bigint")),
      lit(0L), (a, b) => (a * 31 + b) % 1000000007L)

  /** Per-doc Unicode stats: codepoint counts, whitespace-class tokens,
    * \p{L}+|\p{N}+ segmentation, binary-collation min token, distinct
    * 2-grams via the codegen kernel, and codepoint fingerprints of the
    * full text and its 8-codepoint prefix. Every column crosses an
    * engine seam that ASCII text cannot stress. */
  val stats: Q = (s, _) => {
    import s.implicits._
    val toks = TextAnalysis.tokens($"text")
    UnicodeFixture.df(s)
      .select($"doc_id",
        length($"text").cast("bigint").as("n_chars"),
        size(toks).cast("bigint").as("n_tokens"),
        size(array_distinct(toks)).cast("bigint").as("n_distinct"),
        size(regexp_extract_all($"text", lit(TextAnalysis.BpeIshRegex), lit(0)))
          .cast("bigint").as("n_bpeish"),
        array_min(toks).as("min_token"),
        size(graft.functions.TokenFunctions.distinct_ngrams($"text", 2))
          .cast("bigint").as("n_2grams"),
        poly($"text").as("fp"),
        poly(substring($"text", 1, 8)).as("fp_prefix"))
      .orderBy($"doc_id")
  }

  /** Exploded per-doc term counts from the codegen TermCounts kernel —
    * non-ASCII token STRINGS (NBSP-glued tokens included) round-trip
    * through the kernel, parquet, and the driver compare. */
  val terms: Q = (s, _) => {
    import s.implicits._
    UnicodeFixture.df(s)
      .select($"doc_id",
        explode(graft.functions.TokenFunctions.term_counts($"text"))
          .as(Seq("term", "tf")))
      .orderBy($"doc_id", $"term")
  }

  /** q89's full BPE train+encode over the Unicode corpus: histogram
    * vocabulary, BpeIters greedy merges (codepoint symbols), broadcast
    * apply with character fallback, order-sensitive doc fingerprint —
    * the entire tokenizer pipeline exercised on multi-script text and
    * hash-checked against the unrolled DuckDB twin
    * ([[Oracle7.bpeEncodeSqlFor]] over the same VALUES source). */
  val bpe: Q = (s, _) => Declared7.q89Over(UnicodeFixture.df(s))

  val queries: Map[String, Q] = Map(
    "text_unicode_stats" -> stats,
    "text_unicode_terms" -> terms,
    "text_unicode_bpe" -> bpe)
}
