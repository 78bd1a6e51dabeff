package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over the events stream: watermarked tumbling
  * windows (the streaming form of batch Q17) and custom keyed state via
  * mapGroupsWithState. Both operate on a streaming DataFrame with schema
  * (ts timestamp, user_id long, event_type string, value double).
  *
  * Scale notes: the windowed aggregate shuffles once on (window, type)
  * with partial aggregation map-side; state for sessionization lives in
  * the state store keyed by user — both are the standard shapes that run
  * unchanged on a cluster, with `spark.sql.shuffle.partitions` sizing the
  * state distribution. The watermark bounds state: windows older than the
  * delay are finalized and evicted.
  */
object StreamingAnalytics {

  /** Tumbling hourly counts with a 1-hour watermark for late data. */
  def hourlyWindowCounts(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
        (sum(floor($"value" * 100).cast("long")) / 100.0).as("total_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n", $"total_value")
  }

  final case class UserActivity(user_id: Long, n_events: Long,
                                last_type: String, last_ts_micros: Long)

  /** Per-user running activity via mapGroupsWithState — the custom-state
    * primitive (KeyValueGroupedDataset) for logic windows can't express.
    * `last_type` is the type of the EVENT-TIME-latest event (iterator
    * order within a micro-batch is partition/arrival order — taking the
    * iterator's last element would be nondeterministic across reruns). */
  def userActivity(events: DataFrame): Dataset[UserActivity] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select($"user_id".as[Long],
        unix_micros($"ts").as[Long], $"event_type".as[String])
      .groupByKey(_._1)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, String)],
         state: GroupState[UserActivity]) =>
          var acc = state.getOption.getOrElse(UserActivity(user, 0L, "", Long.MinValue))
          rows.foreach { case (_, ts, t) =>
            val (lt, lts) = if (ts >= acc.last_ts_micros) (t, ts)
              else (acc.last_type, acc.last_ts_micros)
            acc = UserActivity(user, acc.n_events + 1, lt, lts)
          }
          state.update(acc)
          acc
      }
  }

  final case class Scd2Closed(user_id: Long, event_type: String,
    valid_from_micros: Long, valid_to_micros: Long, n_events: Long)
  final case class Scd2Open(event_type: String, from_micros: Long, n: Long)

  /** Streaming SCD2: the streaming form of batch q52 — per-user
    * dimension versions maintained incrementally from the CDC-style
    * event stream. Each group folds its batch's rows in (ts, event_id)
    * order into the OPEN version held in keyed state; an attribute
    * change CLOSES the open version (emits it with valid_to = the new
    * version's valid_from) and opens the next. Emission is append-mode
    * and exactly once per closed version; the open version lives only
    * in state (batch q52's is_current row). Correct when per-user
    * event-time order is preserved ACROSS micro-batches (time-split
    * batches, as file sources naturally provide); intra-batch arrival
    * order is irrelevant — rows are sorted before folding. A late
    * event ACROSS micro-batches mis-versions (StreamingSpec asserts
    * the corruption explicitly) — feeds without the cross-batch
    * ordering guarantee must use [[scd2StreamReordered]], the
    * watermark + reorder-buffer variant. */
  def scd2Stream(events: DataFrame): Dataset[Scd2Closed] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select($"user_id".as[Long], unix_micros($"ts").as[Long],
        $"event_id".as[Long], $"event_type".as[String])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, String)],
         state: GroupState[Scd2Open]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var st = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Closed]
          sorted.foreach { case (_, ts, _, t) =>
            st = st match {
              case Some(cur) if cur.event_type == t => Some(cur.copy(n = cur.n + 1))
              case Some(cur) =>
                out += Scd2Closed(user, cur.event_type, cur.from_micros, ts, cur.n)
                Some(Scd2Open(t, ts, 1L))
              case None => Some(Scd2Open(t, ts, 1L))
            }
          }
          st.foreach(state.update)
          out.iterator
      }
  }

  final case class Scd2Buffer(open: Option[Scd2Open],
    pending: Seq[(Long, Long, String)]) // (ts_micros, event_id, event_type)

  /** Out-of-order-tolerant streaming SCD2: [[scd2Stream]] with a
    * watermark + per-key reorder buffer, for feeds that do NOT
    * preserve per-user event-time order across micro-batches. Incoming
    * rows are held in keyed state until the watermark passes them;
    * only the RIPE prefix (ts < watermark) folds into the open
    * version, in (ts, event_id) order. Invariant making closures
    * final: every admitted row has ts ≥ the watermark at its arrival,
    * and every folded row has ts < the watermark at its fold — so no
    * future admitted row can ever sort before an already-folded one,
    * and each closed version is emitted exactly once. Rows arriving
    * with ts already below the watermark are beyond the reorder budget
    * and are dropped — the standard watermark lateness contract
    * (asserted both ways in StreamingSpec: a cross-batch late event
    * CORRUPTS the in-order variant and is CORRECTED here). State is
    * O(events inside the delay window) per key, bounded by the
    * watermark delay — not by history. */
  def scd2StreamReordered(events: DataFrame,
                          delay: String = "10 minutes"): Dataset[Scd2Closed] = {
    val s = events.sparkSession
    import s.implicits._
    // the watermarked `ts` attribute must survive projection all the
    // way into [flatMap]GroupsWithState (selecting only a derived
    // unix_micros(ts) drops the event-time tag and the operator
    // refuses to start); micros are derived from the Timestamp inside
    // the fold with the same epoch arithmetic as unix_micros
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .withWatermark("ts", delay)
      .select($"user_id".as[Long], $"ts".as[java.sql.Timestamp],
        $"event_id".as[Long], $"event_type".as[String])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, java.sql.Timestamp, Long, String)],
         state: GroupState[Scd2Buffer]) =>
          val wm = state.getCurrentWatermarkMs() * 1000L // micros
          val st = state.getOption.getOrElse(Scd2Buffer(None, Nil))
          val admitted = rows.map(r => (micros(r._2), r._3, r._4)).filter(_._1 >= wm)
          val (ripe, hold) = (st.pending ++ admitted)
            .sortBy(r => (r._1, r._2)).partition(_._1 < wm)
          var open = st.open
          val out = scala.collection.mutable.ArrayBuffer.empty[Scd2Closed]
          ripe.foreach { case (ts, _, t) =>
            open = open match {
              case Some(cur) if cur.event_type == t => Some(cur.copy(n = cur.n + 1))
              case Some(cur) =>
                out += Scd2Closed(user, cur.event_type, cur.from_micros, ts, cur.n)
                Some(Scd2Open(t, ts, 1L))
              case None => Some(Scd2Open(t, ts, 1L))
            }
          }
          state.update(Scd2Buffer(open, hold))
          out.iterator
      }
  }

  final case class AnomalyFlag(event_id: Long, user_id: Long,
    cents: Long, trail_sum: Long)

  /** Streaming rolling anomaly detection — the streaming form of batch
    * q76: flag events whose value (integer cents) exceeds
    * [[graft.queries.Declared7.AnomK]]× the user's trailing-
    * [[graft.queries.Declared7.AnomWin]] mean, with the division
    * cleared to exact integer arithmetic (`cents·Win > K·Σcents`).
    * Keyed state is ONE bounded ring of the last AnomWin cents values
    * per user — O(Win) longs regardless of stream length, the same
    * bounded-state argument as [[frequentUsersStream]]. Same ordering
    * contract as [[scd2Stream]]: rows fold in (ts, event_id) order
    * within each batch; per-user event-time order must hold ACROSS
    * micro-batches (time-split file feeds provide this). Emission is
    * append-mode, exactly once per flagged event. */
  def rollingAnomalyStream(events: DataFrame): Dataset[AnomalyFlag] = {
    val s = events.sparkSession
    import s.implicits._
    val win = graft.queries.Declared7.AnomWin
    val k = graft.queries.Declared7.AnomK
    events
      .select($"user_id".as[Long], unix_micros($"ts").as[Long],
        $"event_id".as[Long],
        floor($"value" * 100).cast("long").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, Long)],
         state: GroupState[Vector[Long]]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var ring = state.getOption.getOrElse(Vector.empty[Long])
          val out = scala.collection.mutable.ArrayBuffer.empty[AnomalyFlag]
          sorted.foreach { case (_, _, eventId, cents) =>
            if (ring.length == win && cents * win > k * ring.sum)
              out += AnomalyFlag(eventId, user, cents, ring.sum)
            ring = (ring :+ cents).takeRight(win)
          }
          state.update(ring)
          out.iterator
      }
  }

  final case class AttributedPurchase(event_id: Long, user_id: Long,
    cents: Long, attr_type: String)

  /** Streaming last-touch attribution — the streaming form of batch
    * q82's per-purchase rows: each purchase event credits the user's
    * most recent PRECEDING non-purchase event type. Keyed state is ONE
    * string (the current last-touch type) per user — the LOCF carry
    * held as state instead of a window, O(1) regardless of history
    * length. Same ordering contract as [[scd2Stream]] /
    * [[rollingAnomalyStream]]: rows fold in (ts, event_id) order within
    * a batch, per-user event-time order must hold across micro-batches.
    * Purchases before any touch report attr_type = "(none)" — the same
    * bucket batch q82 aggregates them into. */
  def attributionStream(events: DataFrame): Dataset[AttributedPurchase] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select($"user_id".as[Long], unix_micros($"ts").as[Long],
        $"event_id".as[Long], $"event_type".as[String],
        floor($"value" * 100).cast("long").as[Long])
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, String, Long)],
         state: GroupState[String]) =>
          val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
          var lastTouch = state.getOption.orNull
          val out = scala.collection.mutable.ArrayBuffer.empty[AttributedPurchase]
          sorted.foreach { case (_, _, eventId, tpe, cents) =>
            if (tpe == "purchase")
              out += AttributedPurchase(eventId, user, cents,
                if (lastTouch == null) "(none)" else lastTouch)
            else lastTouch = tpe
          }
          if (lastTouch != null) state.update(lastTouch)
          out.iterator
      }
  }

  final case class UserMilestone(user_id: Long, milestone: Long)

  /** Per-user event-count milestones via flatMapGroupsWithState — the
    * VARIABLE-ARITY custom-state primitive: a group may emit 0..n rows
    * per micro-batch (mapGroupsWithState must emit exactly one), which
    * is the shape alert/trigger pipelines need. Emits one row per
    * multiple-of-k threshold a user's cumulative event count crosses in
    * the batch; state is the running count. Deterministic under ANY
    * intra-batch arrival order — the milestone set depends only on the
    * cumulative count, never on which event happened to cross. */
  def userMilestones(events: DataFrame, k: Long = 10L): Dataset[UserMilestone] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select($"user_id".as[Long])
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val next = prev + rows.size
          state.update(next)
          ((prev / k + 1) to (next / k)).map(m => UserMilestone(user, m * k)).iterator
      }
  }

  final case class FreqItemCand(bucket: Int, user_id: Long, bucket_seen: Long)

  /** Streaming Misra-Gries frequent items — the q65 candidate pass as
    * an unbounded-stream operator: heavy users over the event stream.
    * Items hash-partition into `buckets` key groups; each group's state
    * is ONE bounded MG(k) summary (≤ k counters regardless of stream
    * length — this is what makes per-key state safe at 100 TB, where
    * per-USER count state would hold every user ever seen). Each batch
    * emits the group's current candidate snapshot tagged with the
    * monotone bucket_seen total, so a consumer (or the parity spec)
    * takes the max-bucket_seen snapshot per bucket as current. Guarantee
    * (same argument as q65, per bucket): any user with global count >
    * total/(k+1) is in its bucket's snapshot — candidates are a
    * superset, to be exact-verified by a batch count pass. */
  def frequentUsersStream(events: DataFrame, k: Int = 64, buckets: Int = 16)
      : Dataset[FreqItemCand] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .select($"user_id".as[Long])
      .groupByKey(u => (u % buckets).toInt)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (bucket: Int, rows: Iterator[Long], state: GroupState[(Map[Long, Long], Long)]) =>
          val (saved, seen0) = state.getOption.getOrElse((Map.empty[Long, Long], 0L))
          val counts = scala.collection.mutable.HashMap[Long, Long](saved.toSeq: _*)
          var seen = seen0
          rows.foreach { u =>
            seen += 1
            counts.get(u) match {
              case Some(c) => counts(u) = c + 1
              case None if counts.size < k => counts(u) = 1L
              case None =>
                val dead = counts.iterator.collect { case (key, 1L) => key }.toArray
                counts.keysIterator.toArray.foreach(key => counts(key) -= 1)
                dead.foreach(counts.remove)
            }
          }
          state.update((counts.toMap, seen))
          counts.keysIterator.map(u => FreqItemCand(bucket, u, seen))
      }
  }

  /** Session windows via Spark's native session_window — the streaming
    * form of batch Q25 (gaps-and-islands sessionization): events of one
    * user merge while gaps stay under 30 min; the watermark closes and
    * evicts sessions once event time passes end + delay. State is keyed
    * by (user, session) in the state store — the built-in operator
    * handles merge-on-overlap, which hand-rolled state would have to
    * re-implement. (Boundary note: session_window's half-open window
    * means a gap of EXACTLY 30 min starts a new session here, while
    * Q25's `gap > 30 min` keeps it — divergence has measure zero on
    * µs timestamps.) */
  def sessionWindows(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window($"ts", "30 minutes").as("sw"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id", $"sw.start".as("session_start"),
        $"sw.end".as("session_end"), $"n_events")
  }

  /** Streaming exact dedup on event_id: state holds one entry per key and
    * the watermark bounds it — the standard exactly-once feed cleaner in
    * front of a training-data ingest. Duplicates arriving within the
    * watermark horizon (late copies, at-least-once sources) are dropped;
    * state for keys older than the horizon is evicted. */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream inner join: each click joined to the same user's
    * purchases from the preceding hour. Both sides are watermarked and
    * the join condition carries the time RANGE — that pair is what lets
    * Spark bound the join state (purchases older than click-watermark
    * minus 1 h are evicted; unwatermarked or unbounded stream-stream
    * joins grow state forever and die at scale). */
  def clickPurchaseJoin(events: DataFrame): DataFrame =
    clickPurchaseJoinImpl(events, watermarked = true)

  /** Batch-parity twin of [[clickPurchaseJoin]] (no watermarks — the
    * batch engine sees all data, so results must be a superset-equal of
    * the stream's on complete input). */
  def clickPurchaseJoinBatch(events: DataFrame): DataFrame =
    clickPurchaseJoinImpl(events, watermarked = false)

  /** One copy of the join semantics — the stream and batch twins differ
    * ONLY by the watermarks, so the parity test can't be fooled by the
    * two definitions drifting apart. */
  private def clickPurchaseJoinImpl(events: DataFrame, watermarked: Boolean): DataFrame = {
    import events.sparkSession.implicits._
    def mark(df: DataFrame, tsCol: String): DataFrame =
      if (watermarked) df.withWatermark(tsCol, "30 minutes") else df
    val clicks = mark(events.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id", $"ts".as("click_ts")),
      "click_ts")
    val purchases = mark(events.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id".as("p_user_id"),
        $"ts".as("purchase_ts"), $"value".as("purchase_value")),
      "purchase_ts")
    clicks.join(purchases,
      $"user_id" === $"p_user_id" &&
        $"purchase_ts" <= $"click_ts" &&
        $"purchase_ts" >= $"click_ts" - expr("INTERVAL 1 HOUR"))
      .select($"click_id", $"user_id", $"click_ts", $"purchase_id",
        $"purchase_ts", $"purchase_value")
  }

  /** Batch-parity check helper: the same hourly aggregate computed with
    * the batch engine (used by tests to assert stream == batch). */
  def hourlyWindowCountsBatch(events: DataFrame): DataFrame = {
    import events.sparkSession.implicits._
    events
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"),
        (sum(floor($"value" * 100).cast("long")) / 100.0).as("total_value"))
      .select($"w.start".as("window_start"), $"event_type", $"n", $"total_value")
  }
}
