package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor so graft's
  * custom logical plans ([[graft.plans.AsOfJoinNode]]) can surface as
  * ordinary DataFrames. Lives in the org.apache.spark.sql package for
  * access only — no Spark internals are modified or shadowed. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The Catalyst expression behind a user-facing Column (Spark 4 hides
    * it behind the Connect-unified ColumnNode) — used by
    * [[graft.storage.TxStats]] to extract prunable conjuncts. */
  def expressionOf(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ExpressionUtils.expression(c)
}
