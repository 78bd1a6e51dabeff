package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Incrementally maintained aggregate tables — a MATERIALIZED VIEW
  * engine over the txlog change feed:
  *
  * {{{
  *   val spec = Materialized.Spec(groupBy = Seq("region"),
  *     sums = Seq("amount"), mins = Seq("amount"), maxs = Seq("ts"))
  *   Materialized.refresh(spark, source, target, spec)   // applies the delta
  *   Materialized.read(spark, target)                    // the current view
  * }}}
  *
  * Each refresh reads ONLY the source's change feed between the last
  * applied version and the current head (cost ∝ changed rows, never
  * source size), folds inserts as +1 and deletes as −1 into per-group
  * (sum, count) deltas, adds them to the current values of EXACTLY the
  * touched target groups (an isin-pruned [[TxLog.scanWhere]] read —
  * untouched groups' files never open), and publishes the result as
  * ONE txlog MERGE whose idempotence token IS the cursor: `batchId` =
  * the applied source head, recovered on every refresh from
  * [[TxLog.writerHighWater]]. There is no side-channel state to
  * desync — a crash between any two steps replays into a token no-op,
  * so the view is exactly-once maintained through arbitrary
  * interleavings of source appends, COW and merge-on-read DML,
  * compaction (feed-transparent) and restore (the feed records its
  * delta).
  *
  * SUM / COUNT (and AVG = sum/count at read) fold purely from deltas.
  * MIN/MAX are maintained HYBRID (r14): inserts fold as
  * `least`/`greatest` against the current extremum — no rescan — and
  * only a delete that may have retracted the current extremum
  * (deleted value ≤ current min / ≥ current max, or a group the
  * target doesn't know yet) triggers a RESCAN of exactly those
  * groups, against the source snapshot AS OF the window's end version
  * (so a concurrent writer past the window cannot leak into this
  * fold), isin-pruned by group key. A steady append-mostly workload
  * therefore maintains MIN/MAX at pure-delta cost; the rescan bill
  * arrives only with extremum-deleting DML, and only for the groups
  * it touched. NULL group keys are refused at fold time (merge
  * matching is null-rejecting — coalesce nulls upstream). Groups
  * whose live count reaches zero keep a tombstone row (n = 0, null
  * extrema) rather than forcing a second transaction; [[read]]
  * filters them and exposes clean `<col>_sum` / `<col>_min` /
  * `<col>_max` / `n_rows` columns.
  *
  * At 100 TB: the view's refresh reads O(delta) change files + the
  * isin-and-zone-pruned target groups the delta touches; the merge
  * rewrites only the target files holding those groups. Driver memory
  * is bounded: touched-group keys are limit-PROBED before collecting,
  * and a window touching more than [[MaxPruneKeys]] groups skips the
  * literal prune (full-snapshot current read / left-semi-join rescan)
  * instead of materializing millions of keys on the driver. A
  * continuously-DML'd fact table keeps a live rollup for the cost of
  * its own churn. */
object Materialized {

  /** What to maintain: per `groupBy` tuple, COUNT(*), SUM of each
    * column in `sums`, MIN of each in `mins`, MAX of each in `maxs`. */
  final case class Spec(groupBy: Seq[String], sums: Seq[String],
                        mins: Seq[String] = Seq.empty,
                        maxs: Seq[String] = Seq.empty) {
    require(groupBy.nonEmpty, "materialized view needs at least one group column")
    require(groupBy.intersect(sums ++ mins ++ maxs).isEmpty,
      s"columns cannot be both keys and aggregates: " +
        s"${groupBy.intersect(sums ++ mins ++ maxs)}")
    private[storage] def outCols: Seq[String] =
      Seq("n_rows") ++ sums.map(sumCol) ++ mins.map(minCol) ++ maxs.map(maxCol)
    require((groupBy ++ outCols).distinct.size == (groupBy ++ outCols).size,
      s"materialized view output columns collide: ${groupBy ++ outCols}")
  }

  /** Provenance properties stamped on the target at first refresh. */
  val SourceProp = "graft.mview.source"
  val SpecProp = "graft.mview.spec"

  private def writerId(spec: Spec): String = {
    val base = s"mview-${spec.groupBy.mkString(",")}|${spec.sums.mkString(",")}"
    if (spec.mins.isEmpty && spec.maxs.isEmpty) base
    else s"$base|${spec.mins.mkString(",")}|${spec.maxs.mkString(",")}"
  }

  private def sumCol(c: String): String = s"${c}_sum"
  private def minCol(c: String): String = s"${c}_min"
  private def maxCol(c: String): String = s"${c}_max"

  /** Above this many touched groups the isin prune predicate costs
    * more than it saves — fall back to the full snapshot read (the
    * merge is still group-pruned). A `var` only as a test seam (the
    * clockForTests pattern): specs shrink it to exercise the over-cap
    * fallbacks without materializing 10k groups. */
  private[graft] var MaxPruneKeys = 10000

  /** Which read path the last [[fold]] took, for spec assertions only:
    * (`"isin" | "snapshot" | "none"`, `"isin" | "semijoin" | "none"`) =
    * (target current-values read, extremum rescan read). Written ONCE
    * per fold (a single tuple assignment at the end) so concurrent
    * folds of different views can never interleave a mixed reading. */
  @volatile private[graft] var lastFoldPaths: (String, String) = ("none", "none")

  /** Fold ONE change window into the target under `token` — the shared
    * core of [[refresh]] (window = a version range of the feed) and
    * [[continuous]] (window = a stream micro-batch). The delta is
    * PERSISTED for its several consumers (emptiness probe, null-key
    * guard, prune-key collect, the merge) — without it the whole
    * change-feed scan and shuffle re-run per consumer.
    *
    * Null group keys are REFUSED loudly: [[TxLog.merge]]'s matching is
    * null-rejecting (SQL MERGE semantics), so a null-keyed folded row
    * would APPEND next to the surviving old row instead of replacing
    * it — every refresh would add one more partial row for the null
    * group and [[read]] would return them all. Coalesce or filter null
    * keys in the source before maintaining a view over them. */
  private def fold(s: SparkSession, source: String, target: String, spec: Spec,
                   wid: String, token: Long, window: DataFrame): Unit = {
    val isIns = col("_change_type") === "insert"
    val w = when(isIns, lit(1L)).otherwise(lit(-1L))
    val keys = spec.groupBy
    val aggs: Seq[Column] =
      Seq(sum(w).as("n_rows")) ++
        spec.sums.map(c => sum(col(c) * w).as(sumCol(c))) ++
        spec.mins.flatMap(c => Seq(
          min(when(isIns, col(c))).as(s"__im_$c"),
          min(when(!isIns, col(c))).as(s"__dm_$c"))) ++
        spec.maxs.flatMap(c => Seq(
          max(when(isIns, col(c))).as(s"__ix_$c"),
          max(when(!isIns, col(c))).as(s"__dx_$c"))) ++
        Seq(max(col("_commit_version")).as("__wv"))
    val delta = window.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var currentPath = "none"; var rescanPath = "none"
    try {
      // the TARGET schema: keys + n_rows + sums + extrema (extrema
      // nullable — a tombstoned or all-null group has none)
      val targetSchema = StructType(
        keys.map(c => delta.schema(c)) ++
          Seq(delta.schema("n_rows").copy(nullable = false)) ++
          spec.sums.map(c => delta.schema(sumCol(c))) ++
          spec.mins.map(c => delta.schema(s"__im_$c").copy(name = minCol(c))) ++
          spec.maxs.map(c => delta.schema(s"__ix_$c").copy(name = maxCol(c))))
      // create-if-absent FIRST: a metadata-only first window must not
      // forfeit the declared schema and provenance props (the token
      // commit below would otherwise define the table as a bare v0 log)
      if (TxLog.headVersion(s, target) < 0L) {
        TxLog.createTable(s, target, targetSchema,
          props = Map(SourceProp -> source,
            SpecProp -> (s"${spec.groupBy.mkString(",")}|${spec.sums.mkString(",")}" +
              s"|${spec.mins.mkString(",")}|${spec.maxs.mkString(",")}")))
      }
      if (delta.isEmpty) {
        // the window held only metadata/layout commits: advance the
        // cursor with a data-free token so the next fold starts past it
        TxLog.commitToken(s, target, wid, token)
        return
      }
      val nullKey = keys.map(col(_).isNull).reduce(_ || _)
      if (!delta.filter(nullKey).isEmpty)
        throw new IllegalArgumentException(
          s"materialized view group keys ${keys.mkString(", ")} contain NULLs — " +
            "merge matching is null-rejecting, so a null group cannot be maintained " +
            "incrementally; coalesce or filter null keys in the source")
      // fold the delta into the CURRENT values of exactly the touched
      // groups: the target read is isin-PRUNED by the delta's keys (a
      // SUPERSET per-column predicate — zone maps skip every target
      // file holding only untouched groups; the join below is the
      // exact matcher), then upsert — the merge replaces matched
      // groups and inserts new ones
      val emptyTarget = s.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), targetSchema)
      // PROBE the touched-group count before materializing keys on the
      // driver: a wide window (a backfill, a broad UPDATE) can touch
      // millions of groups, and collecting them all just to discover
      // they're over the cap would OOM the driver the fallback exists
      // to protect. `delta` is one row per group, so a limit(cap+1)
      // probe is complete whenever it comes back under the cap.
      val keyProbe = delta.select(keys.map(col): _*)
        .limit(MaxPruneKeys + 1).collect()
      val current =
        if (keyProbe.isEmpty) emptyTarget
        else if (keyProbe.length > MaxPruneKeys) {
          currentPath = "snapshot"
          TxLog.snapshot(s, target).getOrElse(emptyTarget)
        } else {
          currentPath = "isin"
          val pred = keys.zipWithIndex.map { case (g, i) =>
            col(g).isin(keyProbe.map(_.get(i)).distinct.toIndexedSeq: _*)
          }.reduce(_ && _)
          TxLog.scanWhere(s, target, pred).getOrElse(emptyTarget)
        }
      val joined = delta.alias("d").join(current.alias("t"), keys, "left")
      val newN = (coalesce(col("t.n_rows"), lit(0L)) + col("d.n_rows")).as("n_rows")
      val sumsOut = spec.sums.map(c =>
        (coalesce(col(s"t.${sumCol(c)}"), lit(0L).cast(
          delta.schema(sumCol(c)).dataType)) + col(s"d.${sumCol(c)}")).as(sumCol(c)))
      // MIN/MAX hybrid: pure fold unless a delete MAY have retracted
      // the current extremum — deleted value ≤ current min (≥ max), or
      // a group whose current extremum the target doesn't know (new or
      // all-null: any non-null delete forces the rescan)
      val minsOut = spec.mins.map(c =>
        least(col(s"t.${minCol(c)}"), col(s"d.__im_$c")).as(minCol(c)))
      val maxsOut = spec.maxs.map(c =>
        greatest(col(s"t.${maxCol(c)}"), col(s"d.__ix_$c")).as(maxCol(c)))
      val retraction =
        (spec.mins.map(c => col(s"d.__dm_$c").isNotNull &&
          (col(s"t.${minCol(c)}").isNull ||
            col(s"d.__dm_$c") <= col(s"t.${minCol(c)}"))) ++
          spec.maxs.map(c => col(s"d.__dx_$c").isNotNull &&
            (col(s"t.${maxCol(c)}").isNull ||
              col(s"d.__dx_$c") >= col(s"t.${maxCol(c)}"))))
          .reduceOption(_ || _).getOrElse(lit(false))
      val folded = joined.select(
        keys.map(col) ++ Seq(newN) ++ sumsOut ++ minsOut ++ maxsOut ++ Seq(
          // a tombstoned group (count 0) nulls its extrema, no rescan
          (coalesce(retraction, lit(false)) &&
            (coalesce(col("t.n_rows"), lit(0L)) + col("d.n_rows")) =!= 0L)
            .as("__rescan"),
          col("d.__wv")): _*)
      val hasExtrema = spec.mins.nonEmpty || spec.maxs.nonEmpty
      val tombstoned =
        if (!hasExtrema) folded
        else folded.select(
          keys.map(col) ++ Seq(col("n_rows")) ++ spec.sums.map(c => col(sumCol(c))) ++
            spec.mins.map(c =>
              when(col("n_rows") === 0L, lit(null)).otherwise(col(minCol(c)))
                .as(minCol(c))) ++
            spec.maxs.map(c =>
              when(col("n_rows") === 0L, lit(null)).otherwise(col(maxCol(c)))
                .as(maxCol(c))) ++
            Seq(col("__rescan"), col("__wv")): _*)
      val outCols = (keys ++ spec.outCols).map(col)
      if (!hasExtrema) {
        TxLog.merge(tombstoned.select(outCols: _*), target, keys, wid, batchId = token)
        return
      }
      val needy = tombstoned.filter(col("__rescan"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // same probe-before-collect discipline as the current-values
        // read: a delete retracting millions of groups' extrema must
        // not materialize them all on the driver (and the isin literal
        // it would build would be degenerate at that size anyway)
        val rescanProbe = needy.select(keys.map(col): _*)
          .limit(MaxPruneKeys + 1).collect()
        val out =
          if (rescanProbe.isEmpty) tombstoned.select(outCols: _*)
          else {
            // rescan EXACTLY the retracted groups, against the source
            // AS OF the window's end version (a concurrent writer past
            // the window must not leak into this fold) — isin-pruned
            // under the cap so a clustered source opens only those
            // groups' files; over it, a left-semi join against the
            // (persisted) needy keys bounds driver memory: file-level
            // pruning is lost but the rescan stays one distributed pass
            val ver = needy.agg(max(col("__wv"))).first().getLong(0)
            val srcAt = TxLog.snapshotAt(s, source, ver).getOrElse(
              throw new IllegalStateException(
                s"source $source has no snapshot at v$ver — vacuumed below the " +
                  "view's rescan horizon?"))
            val hit =
              if (rescanProbe.length > MaxPruneKeys) {
                rescanPath = "semijoin"
                srcAt.join(needy.select(keys.map(col): _*), keys, "left_semi")
              } else {
                rescanPath = "isin"
                val pred = keys.zipWithIndex.map { case (g, i) =>
                  col(g).isin(rescanProbe.map(_.get(i)).distinct.toIndexedSeq: _*)
                }.reduce(_ && _)
                srcAt.filter(pred)
              }
            val reAggs =
              spec.mins.map(c => min(col(c)).as(s"__r_${minCol(c)}")) ++
                spec.maxs.map(c => max(col(c)).as(s"__r_${maxCol(c)}"))
            val re = hit.groupBy(keys.map(col): _*)
              .agg(reAggs.head, reAggs.tail: _*)
            val fixed = needy.alias("f").join(re.alias("r"), keys, "left")
              .select(keys.map(col) ++ Seq(col("f.n_rows")) ++
                spec.sums.map(c => col(s"f.${sumCol(c)}")) ++
                spec.mins.map(c => col(s"r.__r_${minCol(c)}").as(minCol(c))) ++
                spec.maxs.map(c => col(s"r.__r_${maxCol(c)}").as(maxCol(c))): _*)
            tombstoned.filter(!col("__rescan")).select(outCols: _*)
              .unionByName(fixed)
          }
        TxLog.merge(out, target, keys, wid, batchId = token)
        ()
      } finally needy.unpersist()
    } finally {
      lastFoldPaths = (currentPath, rescanPath)
      delta.unpersist()
    }
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
