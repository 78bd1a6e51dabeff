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
