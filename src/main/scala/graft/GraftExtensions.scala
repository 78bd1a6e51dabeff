package graft

import org.apache.spark.sql.SparkSessionExtensions

import graft.functions.DotProduct

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions so ANY session — including plain `spark.sql`
  * users and sessions created by spark-submit with
  * `--conf spark.sql.extensions=graft.GraftExtensions` — can call them
  * without touching the Scala API.
  *
  * {{{
  * val spark = SparkSession.builder()
  *   .withExtensions(new GraftExtensions)
  *   ...
  * spark.sql("SELECT graft_dot_product(a.embedding, b.embedding) ...")
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    // whole-operator plan: AsOfJoinNode → co-partitioned merge exec,
    // plus the left-side filter pushdown Catalyst can't do for an
    // unknown node
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.AsOfFilterPushdown)
    // SQL views over GraftCatalog (r16): OSS Spark parses the commands
    // but ResolveSessionCatalog refuses V2 view DDL outright — the
    // HINT-batch rewrite claims the commands BEFORE that rule runs,
    // the resolution rule substitutes view references, the strategy
    // executes the claimed commands
    e.injectHintResolutionRule(s => graft.plans.GraftViewCommandRewrite(s))
    e.injectResolutionRule(s => graft.plans.GraftViewSubstitution(s))
    e.injectPlannerStrategy(s => graft.plans.GraftViewStrategy(s))
    // SQL row-level DML on txlog tables needs no injection since r12:
    // the txlog source is DataSource V2 with SupportsRowLevelOperations,
    // so Spark's own DELETE/UPDATE/MERGE planning applies natively
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot_product"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "graft_dot_product"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          DotProduct(exprs(0), exprs(1))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_validate"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.etl.ValidateJson].getName, "graft_validate"),
        GraftExtensions.validateBuilder))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_term_counts"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.TermCounts].getName, "graft_term_counts"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.TermCounts(exprs.head)))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_distinct_ngrams"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.DistinctNgrams].getName, "graft_distinct_ngrams"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.DistinctNgrams(exprs.head,
            GraftExtensions.literalIntArg(exprs, 1, "graft_distinct_ngrams"))))
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_pos_ngrams"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[graft.functions.PosNgrams].getName, "graft_pos_ngrams"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          graft.functions.PosNgrams(exprs.head,
            GraftExtensions.literalIntArg(exprs, 1, "graft_pos_ngrams"))))
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
  import org.apache.spark.sql.types.StringType

  /** `graft_validate(raw, '<json-schema literal>')` — the SQL surface of
    * the codegen'd O4 validator: the schema argument must be a foldable
    * string literal, compiled ONCE at plan time (per-row schema
    * compilation would be absurd; a non-literal schema is a usage
    * error, rejected at analysis). Shared by the extensions injection
    * and tests. */
  val validateBuilder: Seq[Expression] => Expression = { exprs =>
    require(exprs.length == 2,
      "graft_validate(raw, schemaJsonLiteral) takes exactly 2 arguments")
    val schemaJson = exprs(1) match {
      case Literal(s: org.apache.spark.unsafe.types.UTF8String, StringType) =>
        s.toString
      case other => throw new IllegalArgumentException(
        s"graft_validate's schema argument must be a string literal, got $other")
    }
    graft.etl.ValidateJson(exprs(0),
      graft.etl.SchemaCompiler.compileJson(schemaJson))
  }

  /** Extract a foldable integer argument (the n-gram order) — a
    * non-literal n would mean per-row kernel re-specialization, a usage
    * error rejected at analysis like graft_validate's schema. */
  def literalIntArg(exprs: Seq[Expression], pos: Int, fn: String): Int = {
    require(exprs.length == pos + 1, s"$fn takes exactly ${pos + 1} arguments")
    exprs(pos) match {
      case Literal(n: Int, org.apache.spark.sql.types.IntegerType) => n
      case other => throw new IllegalArgumentException(
        s"$fn's n argument must be an integer literal, got $other")
    }
  }
}
