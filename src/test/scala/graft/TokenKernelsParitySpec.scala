package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TokenFunctions

/** Expression↔UDF parity for the round-6 codegen token kernels (the O4
  * ValidatorParitySpec pattern): the codegen'd TermCounts /
  * DistinctNgrams expressions must produce value-identical results to
  * the ScalaUDF twins they replaced on q54/q56's hot path — on the real
  * corpus AND on the edge rows (null text, empty text, runs of spaces,
  * docs shorter than the n-gram order). */
class TokenKernelsParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def edgeDocs = {
    import spark.implicits._
    Seq(
      (1L, "a b c d"),
      (2L, ""),
      (3L, null.asInstanceOf[String]),
      (4L, "   x   y  "),
      (5L, "only two"),
      (6L, "rep rep rep rep"))
      .toDF("doc_id", "text")
  }

  test("TermCounts expression == UDF twin on corpus + edges") {
    import spark.implicits._
    val docs = Tables(spark, sf, "documents").select($"doc_id", $"text")
      .unionByName(edgeDocs)
    val viaExpr = docs.select($"doc_id", TokenFunctions.term_counts($"text").as("m"))
      .select($"doc_id", explode_outer($"m").as(Seq("term", "tf")))
      .collect().map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    val viaUdf = docs.select($"doc_id", queries.Declared5.termCountsUdf($"text").as("m"))
      .select($"doc_id", explode_outer($"m").as(Seq("term", "tf")))
      .collect().map(r => (r.getLong(0), r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2)))
      .toSet
    assert(viaExpr == viaUdf)
    assert(viaExpr.exists(_._1 == 6L), "edge rows missing from comparison")
  }

  test("DistinctNgrams expression == UDF twin on corpus + edges, order included") {
    import spark.implicits._
    val n = queries.Declared5.ContamN
    val docs = Tables(spark, sf, "documents").select($"doc_id", $"text")
      .unionByName(edgeDocs)
    val viaExpr = docs.select($"doc_id",
        TokenFunctions.distinct_ngrams($"text", n).as("g"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
    val viaUdf = docs.select($"doc_id", queries.Declared5.ngramsUdf($"text").as("g"))
      .collect().map(r => (r.getLong(0), r.getSeq[String](1).toList)).toMap
    assert(viaExpr == viaUdf)
    // short/empty/null docs all yield empty gram lists, not nulls
    assert(viaExpr(2L).isEmpty && viaExpr(3L).isEmpty && viaExpr(5L).isEmpty)
  }

  test("q54/q56 stay inside whole-stage codegen (no ScalaUDF boxes on the token path)") {
    val p54 = queries.Declared5.q54(spark, sf).queryExecution.executedPlan.toString
    val p56 = queries.Declared5.q56(spark, sf).queryExecution.executedPlan.toString
    assert(!p54.contains("ScalaUDF") && !p54.toLowerCase.contains("batchevalpython"),
      s"interpreted kernel in q54 plan:\n${p54.take(1500)}")
    assert(!p56.contains("ScalaUDF"),
      s"interpreted kernel in q56 plan:\n${p56.take(1500)}")
  }
}
