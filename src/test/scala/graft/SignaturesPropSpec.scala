package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.functions.Signatures

/** Property-based equivalence for the tight-loop tokenization kernels
  * that replaced interpreted SQL-lambda formulations (q56 n-grams, the
  * jaccard/minhash token paths). Each kernel must match a direct,
  * obviously-correct Scala reimplementation of the split semantics —
  * regex-split on the [ \t\n\r]+ separator class, empties dropped — on
  * generated inputs including empty strings, runs of mixed whitespace,
  * nulls, and NON-ASCII token content (accented Latin, CJK, Hangul,
  * combining marks, and non-BMP emoji — surrogate pairs must never be
  * split and must fold as single codepoints). */
object SignaturesProps extends Properties("Signatures") {

  private val tokenChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    1 -> Gen.oneOf("éüñßàçøĳ汉字日本語한국어данныеδε"),
    1 -> Gen.oneOf('́', ' ', '　')) // combining + unicode spaces (NOT separators)
  private val token: Gen[String] = Gen.oneOf(
    Gen.nonEmptyListOf(tokenChar).map(_.mkString),
    Gen.oneOf("😀", "🚀🚀", "𝕳𝖊𝖑𝖑𝖔", "a😀b")) // non-BMP: surrogate pairs
  private val sepChar: Gen[Char] = Gen.oneOf(' ', '\t', '\n', '\r')
  private val text: Gen[String] = for {
    toks <- Gen.listOf(token)
    seps <- Gen.listOfN(toks.length + 1,
      Gen.chooseNum(0, 3).flatMap(k => Gen.listOfN(k, sepChar).map(_.mkString)))
  } yield seps.zipAll(toks, "", "").map { case (sp, t) => sp + t }.mkString

  private def refTokens(s: String): List[String] =
    s.split("[ \t\n\r]", -1).toList.filterNot(_.isEmpty)

  property("splitTokens == split-and-drop-empties") = forAll(text) { s =>
    Signatures.splitTokens(s).toList == refTokens(s)
  }

  property("splitTokens is null-safe and empty-safe") =
    Signatures.splitTokens(null).isEmpty &&
      Signatures.splitTokens("").isEmpty &&
      Signatures.splitTokens(" \t\n\r ").isEmpty

  property("polyHash folds CODE POINTS (surrogate pairs fold as one)") =
    forAll(text) { s =>
      val expect = s.codePoints().toArray.foldLeft(BigInt(0)) {
        (h, cp) => (h * Signatures.PolyMul + cp) mod BigInt(Signatures.PolyMod)
      }
      BigInt(Signatures.polyHash(s)) == expect
    }

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

  property("portableSimhash60 == per-bit vote recompute via BigInt arithmetic") =
    forAll(Gen.listOf(token)) { toks =>
      // independent reimplementation: BigInt throughout (no Long-overflow
      // assumptions shared with the kernel), explicit vote counting
      val sig = (0 until Signatures.SimPortBits).map { b =>
        val votes = toks.map { t =>
          val h0 = BigInt(Signatures.polyHash(t))
          val hb = (BigInt(Signatures.SimPortA(b)) * h0 + Signatures.SimPortB(b)) %
            Signatures.PolyMod
          if (hb % 2 == 1) 1 else -1
        }.sum
        if (votes > 0) BigInt(1) << b else BigInt(0)
      }.sum
      BigInt(Signatures.portableSimhash60(toks)) == sig
    }

  property("portableSimhash60 is order-insensitive and 60-bit bounded") =
    forAll(Gen.listOf(token)) { toks =>
      val s1 = Signatures.portableSimhash60(toks)
      Signatures.portableSimhash60(scala.util.Random.shuffle(toks)) == s1 &&
        (s1 >>> Signatures.SimPortBits) == 0L && s1 >= 0L
    }

  property("dsirBucketCounts == naive groupBy of polyHash % B, packed and sorted") =
    forAll(Gen.listOf(token), Gen.oneOf(16, 64, 1024)) { (toks, b) =>
      val naive = toks.filter(_.nonEmpty)
        .groupBy(t => (Signatures.polyHash(t) % b).toInt)
        .toSeq.sortBy(_._1)
        .map { case (bk, g) => (bk.toLong << 32) | g.size.toLong }
      Signatures.dsirBucketCounts(toks, b).toSeq == naive
    }

  property("dsirBucketCounts is order-insensitive and multiplicity-exact") =
    forAll(Gen.listOf(token)) { toks =>
      val a = Signatures.dsirBucketCounts(toks, 128)
      val shuffled = Signatures.dsirBucketCounts(scala.util.Random.shuffle(toks), 128)
      a.toSeq == shuffled.toSeq &&
        a.map(_ & 0xffffffffL).sum == toks.count(_.nonEmpty).toLong
    }
}
