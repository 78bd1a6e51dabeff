package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product over two array<double> columns.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: Spark's
  * higher-order functions evaluate their lambda per element through the
  * interpreter — fine for occasional use, but a 64-dim dot product inside
  * a pairwise-similarity join runs millions of times. `doGenCode` emits a
  * tight primitive loop that whole-stage codegen inlines into the join
  * stage (measured ~3-8× over the higher-order form on the cosine
  * near-dup pass). Preference order per SURVEY §4.3: compose built-ins
  * where semantics allow; drop to a custom Expression only where — as
  * here — the built-in form can't reach primitive-loop speed.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) =
      t == ArrayType(DoubleType, false) || t == ArrayType(DoubleType, true)
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"dot_product needs (array<double>, array<double>), got " +
        s"(${left.dataType}, ${right.dataType})")
  }

  /** Dimension mismatch is a bug upstream (e.g. a config drift between
    * plane and embedding dims) — fail loudly rather than silently
    * truncating to the shorter vector. */
  private def dimError(a: Int, b: Int): Nothing =
    throw new IllegalArgumentException(
      s"dot_product dimension mismatch: $a vs $b")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) dimError(n, y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  throw new IllegalArgumentException(
         |    "dot_product dimension mismatch: " + $n + " vs " + $y.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $x.getDouble($i) * $y.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Register [[DotProduct]] in the session's function registry —
    * idempotent; call before using [[dot_product]]. (Registry +
    * call_function is the supported public route to a custom Expression;
    * direct Column construction is private[sql] in Spark 4.) */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")

  /** Column API for [[DotProduct]] (requires [[register]] on the session
    * first). */
  def dot_product(a: Column, b: Column): Column =
    call_function("graft_dot_product", a, b)
}
