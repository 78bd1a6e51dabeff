package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor so graft's
  * custom logical plans ([[graft.plans.AsOfJoinNode]]) can surface as
  * ordinary DataFrames. Lives in the org.apache.spark.sql package for
  * access only — no Spark internals are modified or shadowed. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
