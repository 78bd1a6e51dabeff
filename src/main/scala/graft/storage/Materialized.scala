package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Incrementally maintained aggregate tables — a MATERIALIZED VIEW
  * engine over the txlog change feed:
  *
  * {{{
  *   val spec = Materialized.Spec(groupBy = Seq("region"), sums = Seq("amount"))
  *   Materialized.refresh(spark, source, target, spec)   // applies the delta
  *   Materialized.read(spark, target)                    // the current view
  * }}}
  *
  * Each refresh reads ONLY the source's change feed between the last
  * applied version and the current head (cost ∝ changed rows, never
  * source size), folds inserts as +1 and deletes as −1 into per-group
  * (sum, count) deltas, adds them to the affected target groups, and
  * publishes the result as ONE txlog MERGE whose idempotence token IS
  * the cursor: `batchId` = the applied source head, recovered on every
  * refresh from [[TxLog.writerHighWater]]. There is no side-channel
  * state to desync — a crash between any two steps replays into a
  * token no-op, so the view is exactly-once maintained through
  * arbitrary interleavings of source appends, COW and merge-on-read
  * DML, compaction (feed-transparent) and restore (the feed records
  * its delta).
  *
  * Maintained aggregates are the RETRACTABLE ones (SUM / COUNT — and
  * AVG = sum/count at read); MIN/MAX cannot be maintained from deltas
  * (a retraction of the current extremum needs the full group) and are
  * refused at the spec; NULL group keys are refused at fold time
  * (merge matching is null-rejecting — coalesce nulls upstream).
  * Groups whose live count reaches zero keep a
  * tombstone row (n = 0) rather than forcing a second transaction;
  * [[read]] filters them and exposes clean `<col>_sum` / `n_rows`
  * columns.
  *
  * At 100 TB: the view's refresh reads O(delta) change files + the
  * zone-pruned target groups the delta touches; the merge rewrites
  * only the target files holding those groups. A continuously-DML'd
  * fact table keeps a live rollup for the cost of its own churn. */
object Materialized {

  /** What to maintain: per `groupBy` tuple, COUNT(*) and SUM of each
    * column in `sums`. */
  final case class Spec(groupBy: Seq[String], sums: Seq[String]) {
    require(groupBy.nonEmpty, "materialized view needs at least one group column")
    require(groupBy.intersect(sums).isEmpty,
      s"columns cannot be both keys and sums: ${groupBy.intersect(sums)}")
  }

  /** Provenance properties stamped on the target at first refresh. */
  val SourceProp = "graft.mview.source"
  val SpecProp = "graft.mview.spec"

  private def writerId(spec: Spec): String =
    s"mview-${spec.groupBy.mkString(",")}|${spec.sums.mkString(",")}"

  private def sumCol(c: String): String = s"${c}_sum"

  /** Fold ONE change window into the target under `token` — the shared
    * core of [[refresh]] (window = a version range of the feed) and
    * [[continuous]] (window = a stream micro-batch). The delta is
    * PERSISTED for its three consumers (emptiness probe, null-key
    * guard, the merge) — without it the whole change-feed scan and
    * shuffle re-run per consumer.
    *
    * Null group keys are REFUSED loudly: [[TxLog.merge]]'s matching is
    * null-rejecting (SQL MERGE semantics), so a null-keyed folded row
    * would APPEND next to the surviving old row instead of replacing
    * it — every refresh would add one more partial row for the null
    * group and [[read]] would return them all. Coalesce or filter null
    * keys in the source before maintaining a view over them. */
  private def fold(s: SparkSession, source: String, target: String, spec: Spec,
                   wid: String, token: Long, window: DataFrame): Unit = {
    val w = when(col("_change_type") === "insert", lit(1L)).otherwise(lit(-1L))
    val delta = window.groupBy(spec.groupBy.map(col): _*)
      .agg(sum(w).as("n_rows"),
        spec.sums.map(c => sum(col(c) * w).as(sumCol(c))): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // create-if-absent FIRST: a metadata-only first window must not
      // forfeit the declared schema and provenance props (the token
      // commit below would otherwise define the table as a bare v0 log)
      if (TxLog.headVersion(s, target) < 0L) {
        TxLog.createTable(s, target, delta.schema,
          props = Map(SourceProp -> source,
            SpecProp -> s"${spec.groupBy.mkString(",")}|${spec.sums.mkString(",")}"))
      }
      if (delta.isEmpty) {
        // the window held only metadata/layout commits: advance the
        // cursor with a data-free token so the next fold starts past it
        TxLog.commitToken(s, target, wid, token)
        return
      }
      val nullKey = spec.groupBy.map(col(_).isNull).reduce(_ || _)
      if (!delta.filter(nullKey).isEmpty)
        throw new IllegalArgumentException(
          s"materialized view group keys ${spec.groupBy.mkString(", ")} contain NULLs — " +
            "merge matching is null-rejecting, so a null group cannot be maintained " +
            "incrementally; coalesce or filter null keys in the source")
      // fold the delta into the CURRENT values of exactly the touched
      // groups (left join: an untouched target group never reads), then
      // upsert — the merge replaces matched groups and inserts new ones
      val current = TxLog.snapshot(s, target).getOrElse(
        s.createDataFrame(java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          delta.schema))
      val joined = delta.alias("d").join(current.alias("t"), spec.groupBy, "left")
      val folded = joined.select(
        spec.groupBy.map(c => col(c)) ++
          Seq((coalesce(col("t.n_rows"), lit(0L)) + col("d.n_rows")).as("n_rows")) ++
          spec.sums.map(c => (coalesce(col(s"t.${sumCol(c)}"), lit(0L).cast(
            delta.schema(sumCol(c)).dataType)) + col(s"d.${sumCol(c)}")).as(sumCol(c))): _*)
      TxLog.merge(folded, target, spec.groupBy, wid, batchId = token)
      ()
    } finally delta.unpersist()
  }

  /** Apply every unapplied source version to the target; returns the
    * source version the view is now current through (-1 = empty
    * source). Safe to call concurrently with source writers — the
    * window is pinned to the head read at entry. */
  def refresh(s: SparkSession, source: String, target: String, spec: Spec): Long = {
    val wid = writerId(spec)
    val head = TxLog.headVersion(s, source)
    if (head < 0L) return -1L
    val applied = TxLog.writerHighWater(s, target, wid).getOrElse(-1L)
    if (applied >= head) return applied
    val feed = s.read.format("txlog")
      .option("readChangeFeed", "true")
      .option("startingVersion", (applied + 1L).toString)
      .option("endingVersion", head.toString)
      .load(source)
    fold(s, source, target, spec, wid, token = head, window = feed)
    head
  }

  /** CONTINUOUS maintenance: tail the source's change-feed STREAM and
    * fold every micro-batch into the target — the always-fresh form of
    * [[refresh]]. Exactly-once composes from two halves: the CDF
    * stream replays each epoch identically after a crash (version
    * offsets in the checkpoint), and the fold commits under the epoch
    * token, so a replayed batch is a merge no-op. The snapshot batch
    * (epoch 0) folds the pre-stream state as pure inserts; DML,
    * compaction and property commits flow through with the stream
    * source's own guarantees. The caller owns the returned query's
    * lifecycle. */
  def continuous(s: SparkSession, source: String, target: String, spec: Spec,
                 checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    // a DISTINCT token namespace from refresh(): the stream's cursor is
    // epoch-space (checkpoint-owned), refresh()'s is source-version
    // space — one target must be maintained by exactly one of the two
    // (mixing would fold overlapping windows; the namespaces make the
    // ownership explicit rather than silently colliding)
    val wid = s"${writerId(spec)}-stream"
    s.readStream.format("txlog")
      .option("readChangeFeed", "true")
      .load(source)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        fold(s, source, target, spec, wid, token = epochId, window = batch)
      }
      .start()
  }

  /** The view's current contents: one row per LIVE group (zero-count
    * tombstones filtered). */
  def read(s: SparkSession, target: String): DataFrame =
    TxLog.snapshot(s, target)
      .map(_.filter(col("n_rows") > 0L))
      .getOrElse(throw new IllegalArgumentException(
        s"materialized view $target does not exist — refresh it first"))
}
