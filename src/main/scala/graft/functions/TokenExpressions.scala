package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd per-document token kernels for the LLM-text hot path —
  * the O4 precedent ([[graft.etl.ValidateJson]]) applied to q54's
  * term counting and q56's n-gram extraction. The per-row work is the
  * same tight loop either way ([[Signatures.splitTokens]] /
  * [[Signatures.distinctNgrams]]); what the Expression form removes vs
  * the ScalaUDF twins is the per-record harness: the To/FromCatalyst
  * converters, the external Row re-encode of the map/array result, and
  * the codegen boundary (a ScalaUDF is a black box that closes the
  * surrounding WholeStageCodegen span; these inline as one static
  * call). The UDF twins stay in Declared5 for TokenKernelsParitySpec. */
object TokenKernels {

  /** Per-document term→count map in one pass, insertion-ordered.
    * Null text (legal in the parquet schema) counts as no tokens —
    * the same empty map the UDF twin produces, so downstream
    * explode() drops the row identically. */
  def termCountsInternal(raw: UTF8String): MapData = {
    val toks = Signatures.splitTokens(if (raw == null) null else raw.toString)
    val m = new java.util.LinkedHashMap[String, Long]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val c = m.get(t)
      m.put(t, if (c == null) 1L else c + 1L)
      i += 1
    }
    val keys = new Array[Any](m.size)
    val vals = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = e.getValue
      j += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(vals))
  }

  /** Distinct word n-grams (first-occurrence order) as a Catalyst
    * array. Null text → empty array (UDF-twin parity). */
  def distinctNgramsInternal(raw: UTF8String, n: Int): ArrayData = {
    val grams = Signatures.distinctNgrams(if (raw == null) null else raw.toString, n)
    val out = new Array[Any](grams.length)
    var i = 0
    while (i < grams.length) { out(i) = UTF8String.fromString(grams(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** ALL word n-gram windows with their 1-based token position, as an
    * array of (pos, gram) structs — duplicates kept (positional span
    * detection needs every occurrence, unlike the distinct kernel).
    * Null/short text → empty array. */
  def posNgramsInternal(raw: UTF8String, n: Int): ArrayData = {
    val toks = Signatures.splitTokens(if (raw == null) null else raw.toString)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](i + 1, UTF8String.fromString(sb.toString)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** text → map<string, bigint> of per-document term counts. */
case class TermCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_term_counts"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_term_counts needs string input, got ${child.dataType}")

  override def eval(input: InternalRow): Any =
    TokenKernels.termCountsInternal(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val block =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.MapData ${ev.value} =
         |  graft.functions.TokenKernels.termCountsInternal(
         |    ${c.isNull} ? null : ${c.value});
       """.stripMargin
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): TermCounts =
    copy(child = newChild)
}

/** text → array<string> of distinct word n-grams of order `n`. */
case class DistinctNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram order must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_distinct_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_distinct_ngrams needs string input, got ${child.dataType}")

  override def eval(input: InternalRow): Any =
    TokenKernels.distinctNgramsInternal(
      child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val block =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  graft.functions.TokenKernels.distinctNgramsInternal(
         |    ${c.isNull} ? null : ${c.value}, $n);
       """.stripMargin
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): DistinctNgrams =
    copy(child = newChild)
}

/** text → array<struct<pos:int, gram:string>> of every word n-gram
  * window with its 1-based position (duplicates kept). */
case class PosNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram order must be >= 1, got $n")

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("pos", IntegerType, nullable = false),
      StructField("gram", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_pos_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_pos_ngrams needs string input, got ${child.dataType}")

  override def eval(input: InternalRow): Any =
    TokenKernels.posNgramsInternal(
      child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val block =
      code"""
         |${c.code}
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
         |  graft.functions.TokenKernels.posNgramsInternal(
         |    ${c.isNull} ? null : ${c.value}, $n);
       """.stripMargin
    ev.copy(code = block, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): PosNgrams =
    copy(child = newChild)
}

/** Column-level entry points, registered per-session the same way
  * [[VectorFunctions]] registers dot_product. */
object TokenFunctions {

  def term_counts(c: Column): Column = {
    SparkSession.active.sessionState.functionRegistry
      .createOrReplaceTempFunction("graft_term_counts",
        exprs => TermCounts(exprs.head), "built-in")
    call_function("graft_term_counts", c)
  }

  def distinct_ngrams(c: Column, n: Int): Column = {
    val name = s"graft_distinct_ngrams_$n"
    SparkSession.active.sessionState.functionRegistry
      .createOrReplaceTempFunction(name,
        exprs => DistinctNgrams(exprs.head, n), "built-in")
    call_function(name, c)
  }

  def pos_ngrams(c: Column, n: Int): Column = {
    val name = s"graft_pos_ngrams_$n"
    SparkSession.active.sessionState.functionRegistry
      .createOrReplaceTempFunction(name,
        exprs => PosNgrams(exprs.head, n), "built-in")
    call_function(name, c)
  }
}
