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
    e.injectFunction(
      (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot_product"),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          classOf[DotProduct].getName, "graft_dot_product"),
        (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
          DotProduct(exprs(0), exprs(1))))
  }
}
