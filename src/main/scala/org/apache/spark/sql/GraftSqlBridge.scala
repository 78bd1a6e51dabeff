package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor so graft's
  * custom logical plans ([[graft.plans.AsOfJoinNode]]) can surface as
  * ordinary DataFrames. Lives in the org.apache.spark.sql package for
  * access only — no Spark internals are modified or shadowed. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Re-wrap already-executed InternalRows as a batch DataFrame — the
    * streaming Sink.addBatch seam: the incoming micro-batch Dataset is
    * bound to an IncrementalExecution and cannot be re-planned by a
    * writer, so [[graft.storage.TxLogSink]] executes it once
    * (queryExecution.toRdd) and commits the rewrapped rows. */
  def internalCreateDataFrame(spark: SparkSession,
                              rows: org.apache.spark.rdd.RDD[catalyst.InternalRow],
                              schema: types.StructType,
                              isStreaming: Boolean = false): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rows, schema, isStreaming)
}
