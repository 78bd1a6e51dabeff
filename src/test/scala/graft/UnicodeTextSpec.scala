package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.UnicodeFixture

/** Engine-INDEPENDENT expectations for the Unicode text surface: the
  * driver's CORRECTNESS gate proves Spark == DuckDB on the fixture
  * (text_unicode_* hash checks); this spec proves both equal a plain
  * JVM recompute (codePoints(), split on the separator class) — so an
  * agreed-upon-but-wrong semantics cannot hide behind the parity. Also
  * pins the specific behaviors the fixture encodes: NBSP/U+3000 ride
  * inside tokens, surrogate pairs count once, combining-mark sequences
  * stay distinct from precomposed forms. */
class UnicodeTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def refTokens(s: String): List[String] =
    s.split("[ \t\n\r]", -1).toList.filterNot(_.isEmpty)

  private def refPoly(s: String): Long =
    s.codePoints().toArray.foldLeft(0L)((h, cp) => (h * 31 + cp) % 1000000007L)

  private lazy val stats =
    graft.queries.UnicodeParity.stats(spark, "unused")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(7))).toMap
  // doc_id -> (n_chars, n_tokens, n_distinct, fp)

  test("n_chars / n_tokens / n_distinct / fp equal a plain JVM recompute, all docs") {
    UnicodeFixture.docs.foreach { case (id, text) =>
      val toks = refTokens(text)
      val (nc, nt, nd, fp) = stats(id)
      assert(nc == text.codePointCount(0, text.length).toLong, s"n_chars doc $id")
      assert(nt == toks.length.toLong, s"n_tokens doc $id")
      assert(nd == toks.distinct.length.toLong, s"n_distinct doc $id")
      assert(fp == refPoly(text), s"fp doc $id")
    }
  }

  test("surrogate pairs count as ONE codepoint (emoji doc)") {
    val text = UnicodeFixture.docs.find(_._1 == 8L).get._2
    // the emoji doc is full of non-BMP chars: UTF-16 length strictly
    // exceeds the codepoint count, so a units-based length would differ
    assert(text.length > text.codePointCount(0, text.length))
    assert(stats(8L)._1 == text.codePointCount(0, text.length).toLong)
  }

  test("NBSP and ideographic space ride INSIDE tokens (doc 10)") {
    val text = UnicodeFixture.docs.find(_._1 == 10L).get._2
    assert(text.contains(' ') && text.contains('　'))
    val toks = refTokens(text)
    assert(toks.exists(_.contains(' ')), "NBSP must not separate")
    assert(toks.exists(_.contains('　')), "U+3000 must not separate")
    assert(stats(10L)._2 == toks.length.toLong)
  }

  test("combining-mark sequence stays distinct from the precomposed form (doc 12)") {
    val text = UnicodeFixture.docs.find(_._1 == 12L).get._2
    val toks = refTokens(text)
    // first token is e + U+0301, later tokens are precomposed U+00E9:
    // different codepoint sequences, so distinct count sees BOTH forms
    assert(toks.head == "étoile" && toks.contains("étoile"))
    assert(toks.head != "étoile")
    assert(stats(12L)._3 == toks.distinct.length.toLong)
  }

  test("mixed tab/LF/CRLF separators collapse like runs of spaces (doc 9)") {
    val text = UnicodeFixture.docs.find(_._1 == 9L).get._2
    assert(Seq('\t', '\n', '\r').forall(text.contains(_)))
    assert(stats(9L)._2 == refTokens(text).length.toLong)
  }
}
