package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout utilities for the 100 TB design target — the two
  * levers that turn repeated full-table work into pruned/local work:
  *
  *  - BUCKETING: persisting both sides of a recurring equi-join bucketed
  *    (and sorted) by the key makes the join shuffle-FREE — each task
  *    reads matching bucket files from both tables. At 100 TB the fact-
  *    fact shuffle is usually the single largest cost in a pipeline run;
  *    bucketing amortizes it into the write once.
  *
  *  - PARTITIONED LAYOUT: directory partitioning on a coarse predicate
  *    column (date, region) lets the scan prune entire directories at
  *    plan time (`PartitionFilters` in explain) — the difference between
  *    reading a day and reading a decade.
  *
  * Verified behavior (StorageLayoutSpec): bucketed self-equi-joins plan
  * with zero Exchange operators; partitioned scans show pushed partition
  * filters and touch only matching directories.
  */
object StorageLayout {

  /** Persist `df` bucketed+sorted by `key` as managed table `table`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Persist `df` directory-partitioned by `partitionCol`. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .partitionBy(partitionCol)
      .format("parquet")
      .mode(SaveMode.Overwrite)
      .save(path)

  /** True iff the executed plan of `df` contains no shuffle exchange of
    * any flavor (hash, range, or single-partition — BroadcastExchange is
    * not a shuffle and is deliberately excluded). */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString
    !Seq("Exchange hashpartitioning", "Exchange rangepartitioning",
      "Exchange SinglePartition").exists(plan.contains)
  }
}
