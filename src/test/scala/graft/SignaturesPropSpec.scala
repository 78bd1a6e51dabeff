package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.Signatures

/** Property-based equivalence for the tight-loop tokenization kernels
  * that replaced interpreted SQL-lambda formulations (q56 n-grams, the
  * jaccard/minhash token paths). Each kernel must match a direct,
  * obviously-correct Scala reimplementation of the split semantics —
  * `text.split(' ').filterNot(_.isEmpty)` — on generated inputs
  * including empty strings, runs of spaces, and nulls. */
object SignaturesProps extends Properties("Signatures") {

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val text: Gen[String] = for {
    toks <- Gen.listOf(token)
    seps <- Gen.listOfN(toks.length + 1, Gen.chooseNum(0, 3).map(" " * _))
  } yield seps.zipAll(toks, "", "").map { case (sp, t) => sp + t }.mkString

  private def refTokens(s: String): List[String] =
    s.split(" ", -1).toList.filterNot(_.isEmpty)

  property("splitTokens == split-and-drop-empties") = forAll(text) { s =>
    Signatures.splitTokens(s).toList == refTokens(s)
  }

  property("splitTokens is null-safe and empty-safe") =
    Signatures.splitTokens(null).isEmpty &&
      Signatures.splitTokens("").isEmpty &&
      Signatures.splitTokens("   ").isEmpty

  property("distinctTokens == first-occurrence distinct of splitTokens") =
    forAll(text) { s =>
      Signatures.distinctTokens(s).toList == refTokens(s).distinct
    }

  property("distinctNgrams == sliding-window join, distinct, order-preserved") =
    forAll(text, Gen.chooseNum(2, 5)) { (s, n) =>
      val expect = refTokens(s).sliding(n).filter(_.length == n)
        .map(_.mkString(" ")).toList.distinct
      Signatures.distinctNgrams(s, n).toList == expect
    }

  property("ngram count bound: at most max(0, tokens - n + 1) distinct") =
    forAll(text, Gen.chooseNum(2, 5)) { (s, n) =>
      val k = refTokens(s).length
      Signatures.distinctNgrams(s, n).length <= math.max(0, k - n + 1)
    }
}
