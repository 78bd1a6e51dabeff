package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Crash-recovery adversarial specs: every stateful operator is killed
  * MID-STREAM (an injected failure while a batch is being committed to
  * the sink), restarted from its checkpoint, and must produce EXACTLY
  * the crash-free run's output — state restored from the store (not
  * recomputed: the spec asserts already-committed batches are NOT
  * reprocessed), the failed batch replayed exactly once.
  *
  * The companion StateBoundsSpec proves state stays SMALL; this spec
  * proves state stays CORRECT across failure. Together they are the
  * operational claim a 100 TB streaming deployment actually needs. */
class StateRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Three time-split parquet files (terciles of event time) in one
    * directory — with maxFilesPerTrigger=1 each file is one
    * deterministic micro-batch, and per-user event-time order holds
    * across batch boundaries (the in-order operators' contract). */
  lazy val streamFixture: (String, org.apache.spark.sql.types.StructType) = {
    val tmp = Files.createTempDirectory("recovery_stream_")
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events").cache()
    val cuts = ev.selectExpr(
      "percentile(unix_micros(ts), 0.3333)", "percentile(unix_micros(ts), 0.6667)")
      .collect()(0)
    val (c1, c2) = (cuts.getDouble(0), cuts.getDouble(1))
    val streamDir = tmp.resolve("stream")
    Files.createDirectory(streamDir)
    Seq((expr(s"unix_micros(ts) < $c1"), 0),
        (expr(s"unix_micros(ts) >= $c1 and unix_micros(ts) < $c2"), 1),
        (expr(s"unix_micros(ts) >= $c2"), 2)).foreach { case (p, i) =>
      val part = tmp.resolve(s"part$i")
      ev.filter(p).coalesce(1).write.parquet(part.toString)
      val f = Files.list(part).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).next()
      Files.copy(f, streamDir.resolve(s"f$i.parquet"))
    }
    val schema = ev.schema
    ev.unpersist()
    (streamDir.toString, schema)
  }

  private def source(): DataFrame = {
    val (dir, schema) = streamFixture
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir)
  }

  /** Drive `build` over the 3-batch source. If `crashAt >= 0`, the sink
    * throws while committing that batch on its first attempt; the query
    * is then RESTARTED from the same checkpoint and drained. Returns
    * (committed rows — duplicates preserved, batch ids seen after the
    * restart). `postWrite`: inject the crash AFTER the sink wrote the
    * batch (the at-least-once window a non-idempotent sink gets wrong);
    * `idempotent`: sink skips batch ids it has already committed. */
  private def runWithCrash(build: DataFrame => DataFrame, mode: String,
                           crashAt: Long, postWrite: Boolean = false,
                           idempotent: Boolean = false): (Seq[String], Seq[Long]) = {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val committed = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val batchesAfterRestart = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    @volatile var crashed = false
    @volatile var restarted = false
    val ckpt = Files.createTempDirectory("recovery_ckpt_").toString
    val writeBatch: (DataFrame, Long) => Unit = { (df, id) =>
      if (restarted) batchesAfterRestart.add(id)
      if (!postWrite && id == crashAt && !crashed) {
        crashed = true; sys.error("injected crash (pre-write)")
      }
      if (!(idempotent && committed.contains(id))) {
        df.collect().foreach(r => buf.add(r.toString))
        committed.add(id)
      }
      if (postWrite && id == crashAt && !crashed) {
        crashed = true; sys.error("injected crash (post-write)")
      }
    }
    def start() = build(source()).writeStream
      .option("checkpointLocation", ckpt)
      .outputMode(mode)
      .foreachBatch(writeBatch)
      .start()
    // the post-write crash window re-executes a batch whose state
    // stores already committed; Spark 4.1's coordinator-side commit
    // tracker (one-commit-per-batch validation) flags that legitimate
    // replay, so it is disabled for this adversarial shape only — the
    // pre-write tests keep it on
    if (postWrite)
      spark.conf.set("spark.sql.streaming.stateStore.commitValidation.enabled", "false")
    try {
    val q1 = start()
    if (crashAt >= 0) {
      val ex = intercept[Throwable] { q1.processAllAvailable() }
      // the injected error arrives wrapped (StreamingQueryException →
      // awaitResult → ...): walk the whole cause chain
      val mentionsInjected = Iterator.iterate(ex)(_.getCause)
        .takeWhile(_ != null).take(10)
        .exists(e => Option(e.getMessage).exists(_.contains("injected crash")))
      assert(mentionsInjected, s"query failed for the wrong reason: $ex")
      q1.stop()
      restarted = true
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
    } else {
      try q1.processAllAvailable() finally q1.stop()
    }
    } finally if (postWrite)
      spark.conf.unset("spark.sql.streaming.stateStore.commitValidation.enabled")
    (buf.asScala.toSeq.sorted, batchesAfterRestart.asScala.toSeq.sorted)
  }

  /** The per-operator parity check: crash-free multiset == crashed+
    * recovered multiset, and the restart resumed AT the failed batch
    * (committed batches never reprocessed — their state came from the
    * checkpointed store). The crash lands on the MIDDLE batch so real
    * cross-batch state exists on both sides of the failure. */
  private def assertRecovers(name: String, build: DataFrame => DataFrame,
                             mode: String): Unit = {
    val (clean, _) = runWithCrash(build, mode, crashAt = -1)
    val (recovered, replayed) = runWithCrash(build, mode, crashAt = 1)
    assert(clean.nonEmpty, s"$name: crash-free run emitted nothing — vacuous")
    assert(recovered == clean,
      s"$name: recovered output differs from crash-free:\n" +
        s"clean=${clean.size} recovered=${recovered.size}")
    assert(replayed.nonEmpty && replayed.min == 1,
      s"$name: restart did not resume at the failed batch: $replayed")
  }

  test("recovery: mapGroupsWithState user activity") {
    assertRecovers("userActivity",
      src => StreamingAnalytics.userActivity(src).toDF(), "update")
  }

  test("recovery: SCD2 version tracking") {
    assertRecovers("scd2Stream",
      src => StreamingAnalytics.scd2Stream(src).toDF(), "append")
  }

  test("recovery: rolling anomaly window state") {
    assertRecovers("rollingAnomalyStream",
      src => StreamingAnalytics.rollingAnomalyStream(src).toDF(), "append")
  }

  test("recovery: attribution carry-forward state") {
    assertRecovers("attributionStream",
      src => StreamingAnalytics.attributionStream(src).toDF(), "append")
  }

  test("recovery: flatMapGroupsWithState milestones") {
    assertRecovers("userMilestones",
      src => StreamingAnalytics.userMilestones(src).toDF(), "append")
  }

  test("recovery: watermarked dedup state") {
    assertRecovers("dedupStream",
      src => StreamingAnalytics.dedupStream(src), "append")
  }

  test("recovery: Misra-Gries sketch state") {
    assertRecovers("frequentUsersStream",
      src => StreamingAnalytics.frequentUsersStream(src).toDF(), "update")
  }

  test("recovery: built-in windowed aggregation state") {
    // complete mode: each batch emits the full snapshot; with
    // deterministic replay the per-batch snapshots (and so the
    // committed multiset) must match the crash-free run exactly
    assertRecovers("hourlyWindowCounts",
      src => StreamingAnalytics.hourlyWindowCounts(src), "complete")
  }

  test("recovery: session window state") {
    assertRecovers("sessionWindows",
      src => StreamingAnalytics.sessionWindows(src), "complete")
  }

  test("recovery: stream-stream join buffered-rows state") {
    assertRecovers("clickPurchaseJoin",
      src => StreamingAnalytics.clickPurchaseJoin(src), "append")
  }

  test("recovery: post-write crash duplicates on a naive sink; batch-id idempotence restores exactly-once") {
    val build = (src: DataFrame) => StreamingAnalytics.userActivity(src).toDF()
    val (clean, _) = runWithCrash(build, "update", crashAt = -1)
    // crash AFTER the sink wrote the batch but before the checkpoint
    // committed: replay re-delivers the batch — the documented
    // at-least-once window every streaming sink must handle
    val (naive, _) = runWithCrash(build, "update", crashAt = 1, postWrite = true)
    assert(naive.size > clean.size,
      s"expected duplicate delivery on the naive sink: ${naive.size} vs ${clean.size}")
    // the standard fix — sinks keyed by batch id skip the re-delivery
    // (what foreachBatch's (df, batchId) signature exists for)
    val (fixed, _) = runWithCrash(build, "update", crashAt = 1,
      postWrite = true, idempotent = true)
    assert(fixed == clean,
      s"idempotent sink should restore exactly-once: ${fixed.size} vs ${clean.size}")
  }
}
