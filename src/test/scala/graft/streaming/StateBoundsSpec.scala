package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Adversarial STATE-SIZE bounds for every custom-state streaming op:
  * value parity is covered by the batch-equivalence specs in
  * StreamingAnalyticsSpec; these read the ACTUAL state store back
  * (Spark's `statestore` data source over the query checkpoint) after
  * pathological key/volume distributions and assert the per-key state
  * stayed at its documented bound — the property that decides whether
  * the operator survives an unbounded stream, which output checks
  * cannot see. */
class StreamingStateBoundsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def stateOf(ckpt: String): DataFrame =
    spark.read.format("statestore").option("path", ckpt).load()

  private def ckptDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"ckpt_$tag").toString

  test("rolling anomaly: a 500-event hot user holds exactly AnomWin longs of state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, Double)]
    val src = mem.toDF.toDF("user_id", "tsu", "event_id", "value")
      .withColumn("ts", timestamp_micros($"tsu"))
    val ckpt = ckptDir("anom")
    val q = StreamingAnalytics.rollingAnomalyStream(src)
      .writeStream.format("memory").queryName("sb_anom")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      // one hot key, two batches — the ring must not grow with volume
      mem.addData((1L to 250L).map(i => (7L, i * 1000000L, i, i.toDouble)): _*)
      q.processAllAvailable()
      mem.addData((251L to 500L).map(i => (7L, i * 1000000L, i, i.toDouble)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val st = stateOf(ckpt)
      .select($"key.value".as("user"), size($"value.groupState.value").as("n"))
      .collect()
    assert(st.length == 1, s"expected 1 state row, got ${st.toSeq}")
    assert(st.head.getInt(1) == graft.queries.Declared7.AnomWin,
      s"ring grew past AnomWin: ${st.head}")
  }

  test("attribution: 2000 events of carry leave ONE event-type string of state, not history") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String, Double)]
    val src = mem.toDF.toDF("user_id", "tsu", "event_id", "event_type", "value")
      .withColumn("ts", timestamp_micros($"tsu"))
    val ckpt = ckptDir("attr")
    val q = StreamingAnalytics.attributionStream(src)
      .writeStream.format("memory").queryName("sb_attr")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      val types = Seq("click", "view", "search", "purchase")
      mem.addData((1L to 2000L).map(i =>
        (7L, i * 1000000L, i, types((i % 4).toInt), 1.0)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val st = stateOf(ckpt)
      .select($"key.value".as("user"), $"value.groupState.value".as("carry"))
      .collect()
    assert(st.length == 1, s"expected 1 state row, got ${st.toSeq}")
    // the LOCF carry is one type name — bounded by the type vocabulary,
    // independent of the 2000-event history
    assert(Set("click", "view", "search").contains(st.head.getString(1)),
      s"carry is not a single event type: ${st.head}")
  }

  test("Misra-Gries: 500 all-distinct users leave at most k counters of state") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val src = mem.toDF.toDF("user_id")
    val ckpt = ckptDir("mg")
    // every item distinct — the worst case for a frequency sketch: the
    // eviction path runs constantly and must keep the map at k
    val q = StreamingAnalytics.frequentUsersStream(src, k = 4, buckets = 1)
      .writeStream.format("memory").queryName("sb_mg")
      .option("checkpointLocation", ckpt).outputMode("update").start()
    try {
      mem.addData(1L to 250L: _*)
      q.processAllAvailable()
      mem.addData(251L to 500L: _*)
      q.processAllAvailable()
    } finally q.stop()
    val st = stateOf(ckpt)
      .select(size($"value.groupState._1").as("n_counters"),
        $"value.groupState._2".as("seen"))
      .collect()
    assert(st.length == 1, s"expected 1 bucket state row, got ${st.toSeq}")
    assert(st.head.getInt(0) <= 4,
      s"sketch exceeded k=4 counters under all-distinct input: ${st.head}")
    assert(st.head.getLong(1) == 500L, s"seen counter wrong: ${st.head}")
  }

  test("reordered SCD2: the watermark drains the reorder buffer — state holds the horizon, not the stream") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val src = mem.toDF.toDF("user_id", "tsu", "event_id", "event_type")
      .withColumn("ts", timestamp_micros($"tsu"))
      .drop("tsu")
    val ckpt = ckptDir("scd2r")
    val q = StreamingAnalytics.scd2StreamReordered(src, delay = "10 minutes")
      .writeStream.format("memory").queryName("sb_scd2r")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val minute = 60L * 1000000L
    try {
      // batch 1: 50 events inside one 5-minute burst — all of them sit
      // inside the watermark horizon, so all 50 legitimately buffer
      mem.addData((1L to 50L).map(i =>
        (7L, i * 6000000L, i, if (i % 2 == 0) "click" else "view")): _*)
      q.processAllAvailable()
      val afterBurst = stateOf(ckpt)
        .select(size($"value.groupState.pending")).collect().head.getInt(0)
      assert(afterBurst == 50, s"burst should buffer all 50: $afterBurst")
      // batches 2-3: events far past the burst. The watermark computed
      // from batch 2's max event time applies to batch 3 (watermarks
      // always trail by one batch), so batch 3 is where the 50 buffered
      // rows must RIPEN out of state — the buffer is bounded by the
      // delay horizon, not by how much has ever streamed
      mem.addData((7L, 120 * minute, 51L, "click"))
      q.processAllAvailable()
      mem.addData((7L, 121 * minute, 52L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val st = stateOf(ckpt)
      .select(size($"value.groupState.pending").as("n_pending"))
      .collect()
    assert(st.length == 1, s"expected 1 state row, got ${st.toSeq}")
    // only the two horizon events (120/121 min) may remain buffered
    assert(st.head.getInt(0) <= 2,
      s"watermark did not drain the reorder buffer: ${st.head}")
  }

  test("in-order SCD2 and milestones: state rows scale with KEYS, each O(1) wide") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // 5 users × 400 events each: state must hold 5 rows (one per key),
    // with the open-version struct — no per-event growth anywhere
    val mem = MemoryStream[(Long, Long, Long, String)]
    val src = mem.toDF.toDF("user_id", "tsu", "event_id", "event_type")
      .withColumn("ts", timestamp_micros($"tsu"))
    val ckpt = ckptDir("scd2")
    val q = StreamingAnalytics.scd2Stream(src)
      .writeStream.format("memory").queryName("sb_scd2")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    try {
      mem.addData((1L to 2000L).map(i =>
        (i % 5, i * 1000000L, i, if (i % 3 == 0) "click" else "view")): _*)
      q.processAllAvailable()
    } finally q.stop()
    val st = stateOf(ckpt).collect()
    assert(st.length == 5, s"expected one state row per key: ${st.length}")
    // schema-level O(1): the state value is a flat struct (event_type,
    // from_micros, n), no collection column to grow
    val valueType = stateOf(ckpt).schema("value").dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]("groupState").dataType
    assert(!valueType.simpleString.contains("array"),
      s"unexpected unbounded collection in state: ${valueType.simpleString}")
  }
}
