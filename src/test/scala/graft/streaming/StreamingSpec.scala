package graft.streaming

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.etl.{Config, EtlFixtures, V2}

class StreamingEtlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def readCsv(p: Path): Seq[String] =
    new String(Files.readAllBytes(p)).split("\r\n").toSeq.filter(_.nonEmpty)

  test("streaming ETL port produces the same outputs as the batch run, incrementally") {
    val base = Files.createTempDirectory("etl_stream_")
    EtlFixtures.writeCorpus(base)
    val users = Config.builtin(base.toString, V2).head
    // move two files out to add them later (incremental phase)
    val held = Seq("f05.json", "f07.json").map { f =>
      val src = base.resolve("users").resolve(f)
      val parked = base.resolve(f + ".held")
      Files.move(src, parked)
      (parked, src)
    }
    val running = StreamingEtl.start(spark, users, V2,
      base.resolve("errors.log").toString,
      base.resolve("ckpt").toString)
    try {
      running.awaitIdle()
      val afterFirst = readCsv(base.resolve("users.csv"))
      assert(afterFirst.head == "id,prefix,name,suffix,address,job,score,event_id")
      assert(afterFirst.size == 7) // header + 6 rows (9 files -2 held, -1 dropped)

      // drop the held files in: the stream must pick up ONLY the new ones
      held.foreach { case (parked, dst) => Files.move(parked, dst) }
      running.awaitIdle()
      val afterSecond = readCsv(base.resolve("users.csv"))
      assert(afterSecond.size == 9) // +2 rows, no duplicate header
      assert(afterSecond.count(_.startsWith("id,prefix")) == 1)
      assert(afterSecond.exists(_.startsWith("102,Dr.,Jane Doe,PhD,")))
      assert(afterSecond.exists(_.startsWith("104,,Ann Lee,Jr.,")))

      // error log + quarantine fired from the stream too
      assert(Files.readAllLines(base.resolve("errors.log")).asScala
        .exists(_.contains("'high' is not of type 'number'")))
      assert(Files.list(base.resolve("users_schema_mismatches")).iterator().asScala
        .map(_.getFileName.toString).toSet == Set("f09.json", "f11.json"))
      // per-file exactly-once: total files seen across batches == 9
      assert(running.metrics.map(_.files).sum == 9)
    } finally running.stop()
  }
}

class StreamingEtlRestartSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("restart from checkpoint: no reprocessing, new files exactly once") {
    val base = Files.createTempDirectory("etl_restart_")
    EtlFixtures.writeCorpus(base)
    val users = Config.builtin(base.toString, V2).head
    val held = base.resolve("users").resolve("f05.json")
    val parked = base.resolve("f05.held")
    Files.move(held, parked)
    val ckpt = base.resolve("ckpt").toString
    val errLog = base.resolve("errors.log").toString

    val run1 = StreamingEtl.start(spark, users, V2, errLog, ckpt)
    val rowsAfterRun1 = try {
      run1.awaitIdle()
      Files.readAllLines(base.resolve("users.csv")).size
    } finally run1.stop()

    // restart against the SAME checkpoint; drop the held file in
    Files.move(parked, held)
    val run2 = StreamingEtl.start(spark, users, V2, errLog, ckpt)
    try {
      run2.awaitIdle()
      val lines = Files.readAllLines(base.resolve("users.csv")).asScala
      // exactly one new row, zero reprocessed rows, still one header
      assert(lines.size == rowsAfterRun1 + 1, s"${lines.size} vs $rowsAfterRun1+1")
      assert(lines.count(_.startsWith("id,prefix")) == 1)
      // the checkpoint replays nothing: run2 only saw the ONE new file
      assert(run2.metrics.map(_.files).sum == 1,
        s"run2 reprocessed: ${run2.metrics}")
    } finally run2.stop()
  }
}

class StreamingAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Stream-read events with the writer-encoding normalization shared
    * with the batch reader (graft.Tables.eventsStream) — a hardcoded
    * schema here is exactly what broke when the testdata writer switched
    * TIMESTAMP(NANOS) → TIMESTAMP(MICROS, NTZ). */
  def eventsStream(dir: String) = graft.Tables.eventsStream(spark, dir)

  test("streaming hourly windows equal the batch aggregate") {
    import spark.implicits._
    val q = StreamingAnalytics.hourlyWindowCounts(eventsStream("/root/testdata/sf0.001"))
      .writeStream.format("memory").queryName("hourly").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val stream = spark.table("hourly")
        .orderBy($"window_start", $"event_type").collect().toSeq
      val batch = StreamingAnalytics.hourlyWindowCountsBatch(
        graft.Tables(spark, "/root/testdata/sf0.001", "events"))
        .orderBy($"window_start", $"event_type").collect().toSeq
      assert(stream.nonEmpty)
      assert(stream == batch)
    } finally q.stop()
  }

  test("streaming session windows match batch q25 sessionization") {
    import spark.implicits._
    val q = StreamingAnalytics.sessionWindows(eventsStream("/root/testdata/sf0.001"))
      .writeStream.format("memory").queryName("sessions").outputMode("complete").start()
    try {
      q.processAllAvailable()
      // compare the multiset of (user_id, n_events) sessions against the
      // batch gaps-and-islands formulation (Q25) — same 30-min gap rule
      val stream = spark.table("sessions")
        .select($"user_id", $"n_events")
        .orderBy($"user_id", $"session_start").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1)))
      val batch = graft.queries.Declared2.q25(spark, "/root/testdata/sf0.001")
        .select($"user_id", $"n_events")
        .orderBy($"user_id", $"session_idx").collect().toSeq
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(stream.nonEmpty)
      assert(stream.sorted == batch.sorted)
    } finally q.stop()
  }

  test("streaming dedup drops cross-batch duplicate event_ids") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("dedup_stream_")
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events").limit(200).cache()
    val nDistinct = ev.select($"event_id").distinct().count()
    // the same 200 events land twice, in two separate files → with
    // maxFilesPerTrigger=1 the duplicate copies arrive in a LATER batch
    // and must be dropped by watermark state, not intra-batch distinct
    ev.coalesce(1).write.parquet(tmp.resolve("w1").toString)
    ev.coalesce(1).write.parquet(tmp.resolve("w2").toString)
    val streamDir = tmp.resolve("stream")
    Files.createDirectory(streamDir)
    Seq("w1", "w2").zipWithIndex.foreach { case (w, i) =>
      val part = Files.list(tmp.resolve(w)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).next()
      Files.copy(part, streamDir.resolve(s"f$i.parquet"))
    }
    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    val q = StreamingAnalytics.dedupStream(src)
      .writeStream.format("memory").queryName("deduped").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("deduped").count() == nDistinct)
    } finally { q.stop(); ev.unpersist() }
  }

  test("stream-stream interval join matches the batch join on complete input") {
    import spark.implicits._
    val q = StreamingAnalytics.clickPurchaseJoin(eventsStream("/root/testdata/sf0.001"))
      .writeStream.format("memory").queryName("cpjoin").outputMode("append").start()
    try {
      q.processAllAvailable()
      val stream = spark.table("cpjoin")
        .orderBy($"click_id", $"purchase_id").collect().toSeq
      val batch = StreamingAnalytics.clickPurchaseJoinBatch(
        graft.Tables(spark, "/root/testdata/sf0.001", "events"))
        .orderBy($"click_id", $"purchase_id").collect().toSeq
      assert(stream.nonEmpty)
      assert(stream == batch)
    } finally q.stop()
  }

  test("mapGroupsWithState accumulates per-user counts across batches") {
    import spark.implicits._
    val q = StreamingAnalytics.userActivity(eventsStream("/root/testdata/sf0.001"))
      .writeStream.format("memory").queryName("activity").outputMode("update").start()
    try {
      q.processAllAvailable()
      val total = spark.table("activity")
        .groupBy($"user_id").agg(max($"n_events").as("n"))
        .agg(sum($"n")).collect()(0).getLong(0)
      assert(total == 1000) // every event counted exactly once
    } finally q.stop()
  }

  test("streaming SCD2 closes the same versions batch q52 builds, across batches") {
    import spark.implicits._
    // two TIME-SPLIT files so runs straddle the micro-batch boundary:
    // per-user event-time order is preserved across batches, which is
    // the operator's documented contract
    val tmp = Files.createTempDirectory("scd2_stream_")
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events").cache()
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5)").collect()(0).getDouble(0)
    val streamDir = tmp.resolve("stream")
    Files.createDirectory(streamDir)
    Seq(("early", expr(s"unix_micros(ts) < $cut"), 0),
        ("late", expr(s"unix_micros(ts) >= $cut"), 1)).foreach { case (w, p, i) =>
      ev.filter(p).coalesce(1).write.parquet(tmp.resolve(w).toString)
      val part = Files.list(tmp.resolve(w)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).next()
      Files.copy(part, streamDir.resolve(s"f$i.parquet"))
    }
    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    val q = StreamingAnalytics.scd2Stream(src)
      .writeStream.format("memory").queryName("scd2").outputMode("append").start()
    try {
      q.processAllAvailable()
      val stream = spark.table("scd2")
        .select($"user_id", $"event_type", $"valid_from_micros",
          $"valid_to_micros", $"n_events")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      // batch truth: q52's CLOSED versions (valid_to != null)
      val batch = graft.queries.Declared5.q52(spark, "/root/testdata/sf0.001")
        .filter($"valid_to".isNotNull)
        .select($"user_id", $"event_type", unix_micros($"valid_from"),
          unix_micros($"valid_to"), $"n_events")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(batch.nonEmpty)
      assert(stream == batch)
    } finally { q.stop(); ev.unpersist() }
  }

  test("streaming rolling anomaly flags exactly batch q76's events, across batches") {
    import spark.implicits._
    // same time-split two-batch feed as the SCD2 parity test: per-user
    // event-time order preserved across the micro-batch boundary (the
    // operator's documented contract)
    val tmp = Files.createTempDirectory("anom_stream_")
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events").cache()
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5)").collect()(0).getDouble(0)
    val streamDir = tmp.resolve("stream")
    Files.createDirectory(streamDir)
    Seq(("early", expr(s"unix_micros(ts) < $cut"), 0),
        ("late", expr(s"unix_micros(ts) >= $cut"), 1)).foreach { case (w, p, i) =>
      ev.filter(p).coalesce(1).write.parquet(tmp.resolve(w).toString)
      val part = Files.list(tmp.resolve(w)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).next()
      Files.copy(part, streamDir.resolve(s"f$i.parquet"))
    }
    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    val q = StreamingAnalytics.rollingAnomalyStream(src)
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    try {
      q.processAllAvailable()
      val stream = spark.table("anom")
        .select($"event_id", $"user_id", $"cents", $"trail_sum")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val batch = graft.queries.Declared7.q76(spark, "/root/testdata/sf0.001")
        .select($"event_id", $"user_id", $"cents", $"trail_sum")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(batch.nonEmpty)
      assert(stream == batch)
    } finally { q.stop(); ev.unpersist() }
  }

  test("streaming attribution aggregates to exactly batch q82's rows, across batches") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("attr_stream_")
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events").cache()
    val cut = ev.selectExpr("percentile(unix_micros(ts), 0.5)").collect()(0).getDouble(0)
    val streamDir = tmp.resolve("stream")
    Files.createDirectory(streamDir)
    Seq(("early", expr(s"unix_micros(ts) < $cut"), 0),
        ("late", expr(s"unix_micros(ts) >= $cut"), 1)).foreach { case (w, p, i) =>
      ev.filter(p).coalesce(1).write.parquet(tmp.resolve(w).toString)
      val part = Files.list(tmp.resolve(w)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).next()
      Files.copy(part, streamDir.resolve(s"f$i.parquet"))
    }
    val src = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", 1).parquet(streamDir.toString)
    val q = StreamingAnalytics.attributionStream(src)
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      q.processAllAvailable()
      // the stream emits per-purchase rows; batch q82 is the aggregate —
      // group the stream's output and compare
      val stream = spark.table("attr")
        .groupBy($"attr_type".as("attributed_type"))
        .agg(count(lit(1)).as("n_purchases"), sum($"cents").as("attributed_cents"))
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      val batch = graft.queries.Declared7.q82(spark, "/root/testdata/sf0.001")
        .collect().map(_.toSeq).toSeq.sortBy(_.toString)
      assert(batch.nonEmpty)
      assert(stream == batch)
    } finally { q.stop(); ev.unpersist() }
  }

  test("flatMapGroupsWithState emits each crossed milestone exactly once") {
    import spark.implicits._
    val q = StreamingAnalytics.userMilestones(eventsStream("/root/testdata/sf0.001"))
      .writeStream.format("memory").queryName("milestones").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("milestones")
        .select($"user_id", $"milestone").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      // batch truth: every multiple of 10 up to each user's event count
      val truth = graft.Tables(spark, "/root/testdata/sf0.001", "events")
        .groupBy($"user_id").count().collect()
        .flatMap(r => (1L to r.getLong(1) / 10)
          .map(m => (r.getLong(0), m * 10))).toSeq.sorted
      assert(truth.nonEmpty)
      assert(got == truth) // no milestone missed, none duplicated
    } finally q.stop()
  }

  private def tsAt(min: Int) = new java.sql.Timestamp(3600_000L + min * 60_000L)

  test("streaming SCD2: a cross-batch late event corrupts the in-order variant (the documented contract)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val src = mem.toDF.toDF("user_id", "ts", "event_id", "event_type")
    val q = StreamingAnalytics.scd2Stream(src)
      .writeStream.format("memory").queryName("scd2_late").outputMode("append").start()
    try {
      mem.addData((1L, tsAt(0), 1L, "a"), (1L, tsAt(20), 3L, "c"))
      q.processAllAvailable()
      mem.addData((1L, tsAt(10), 2L, "b")) // late: belongs between a and c
      q.processAllAvailable()
      mem.addData((1L, tsAt(60), 4L, "d"))
      q.processAllAvailable()
      val closed = spark.table("scd2_late").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
      // the in-order fold appended the late 10:10 event AFTER 10:20,
      // closing version c with valid_to < valid_from — the silent
      // mis-versioning this test pins as the variant's contract boundary
      assert(closed.exists { case (_, from, to) => to < from },
        s"expected an inverted interval from the late event, got ${closed.toSeq}")
    } finally q.stop()
  }

  test("streaming SCD2 reordered: watermark buffer splices the late event correctly") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val src = mem.toDF.toDF("user_id", "ts", "event_id", "event_type")
    val q = StreamingAnalytics.scd2StreamReordered(src, "10 minutes")
      .writeStream.format("memory").queryName("scd2_reord").outputMode("append").start()
    try {
      mem.addData((1L, tsAt(0), 1L, "a"), (1L, tsAt(20), 3L, "c"))
      q.processAllAvailable() // wm after batch: 10:10
      mem.addData((1L, tsAt(10), 2L, "b")) // late but within the 10-min budget
      q.processAllAvailable()
      mem.addData((1L, tsAt(60), 4L, "d")) // advances wm to 10:50
      q.processAllAvailable()
      mem.addData((1L, tsAt(90), 5L, "e")) // wm 10:50 at fold: b, c ripen
      q.processAllAvailable()
      mem.addData((1L, tsAt(120), 6L, "f")) // wm 11:20 at fold: d ripens
      q.processAllAvailable()
      val closed = spark.table("scd2_reord").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
      val m = 60_000_000L // micros per minute; epoch base 3600s
      def at(min: Int) = 3600_000_000L + min * m
      // the late b spliced between a and c: a closes AT b, b AT c, c AT d
      assert(closed == Set(
        ("a", at(0), at(10), 1L),
        ("b", at(10), at(20), 1L),
        ("c", at(20), at(60), 1L)),
        s"mis-spliced versions: $closed")
    } finally q.stop()
  }

  test("streaming Misra-Gries: bounded state across batches still catches every heavy item") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    val src = mem.toDF.toDF("user_id")
    // k=4 counters per bucket, 2 buckets — far fewer counters than the
    // 22 distinct items, so the sketch MUST evict; the heavy items have
    // to survive eviction AND state round-trips between batches
    val q = StreamingAnalytics.frequentUsersStream(src, k = 4, buckets = 2)
      .writeStream.format("memory").queryName("mgfreq").outputMode("update").start()
    try {
      val heavy = Seq.fill(60)(100L) ++ Seq.fill(40)(101L)
      val light = (1L to 20L).flatMap(u => Seq(u, u))
      // interleave and split across three batches
      val all = (heavy ++ light).zipWithIndex.sortBy(_._2 % 7).map(_._1)
      val (b1, rest) = all.splitAt(40)
      val (b2, b3) = rest.splitAt(40)
      mem.addData(b1); q.processAllAvailable()
      mem.addData(b2); q.processAllAvailable()
      mem.addData(b3); q.processAllAvailable()
      val rows = spark.table("mgfreq").collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      // current snapshot per bucket = the max-bucket_seen emission
      val lastSeen = rows.groupBy(_._1).view.mapValues(_.map(_._3).max).toMap
      val current = rows.filter { case (b, _, seen) => seen == lastSeen(b) }
      val candidates = current.map(_._2).toSet
      // total = 140; any item with count > 140/(k+1) = 28 must survive
      assert(candidates.contains(100L) && candidates.contains(101L),
        s"heavy items evicted from the sketch: $candidates")
      // bounded state: each bucket's snapshot is at most k items
      current.groupBy(_._1).foreach { case (b, items) =>
        assert(items.length <= 4, s"bucket $b exceeded k counters: ${items.toSeq}")
      }
    } finally q.stop()
  }
}
