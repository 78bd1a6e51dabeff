package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.storage.TxLog

/** [[TxLog.sink]] under the at-least-once replay contract: a
  * micro-batch stream is killed at each crash window (pre-commit,
  * after an orphaned data write, post-commit), restarted from its
  * checkpoint, and must end with table contents identical to the
  * crash-free run — no lost batches, no duplicated batches, no
  * partially visible batches at ANY point. */
class TxLogStreamSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Three one-file parquet micro-batches of 10 rows each. */
  lazy val streamFixture: (String, org.apache.spark.sql.types.StructType) = {
    val tmp = Files.createTempDirectory("txlog_stream_")
    val streamDir = tmp.resolve("stream")
    Files.createDirectory(streamDir)
    (0 until 3).foreach { i =>
      val part = tmp.resolve(s"part$i")
      (i * 10 until (i * 10 + 10)).map(x => (x.toLong, s"row-$x"))
        .toDF("id", "payload").coalesce(1).write.parquet(part.toString)
      val it = Files.list(part).iterator()
      var moved = false
      while (it.hasNext && !moved) {
        val p = it.next()
        if (p.toString.endsWith(".parquet")) {
          Files.copy(p, streamDir.resolve(s"f$i.parquet")); moved = true
        }
      }
    }
    (streamDir.toString, Seq((0L, "x")).toDF("id", "payload").schema)
  }

  private var runId = 0

  /** Drives the sink over the fixture; `crash(df, epochId, tablePath)`
    * fires once from inside the batch hook, then the query restarts
    * from its checkpoint. Returns the final committed table rows. */
  private def run(crash: (DataFrame, Long, String) => Unit = null): Seq[(Long, String)] = {
    runId += 1
    val (dir, schema) = streamFixture
    val table = Files.createTempDirectory(s"txlog_sink_$runId").resolve("t").toString
    val ckpt = Files.createTempDirectory(s"txlog_ckpt_$runId").toString
    @volatile var crashed = false
    val hook: (DataFrame, Long) => Unit = { (df, id) =>
      if (crash != null && !crashed) {
        try crash(df, id, table)
        catch { case e: Throwable => crashed = true; throw e }
      }
    }
    def start() = TxLog.sink(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir),
      table, "stream-writer", ckpt, hook)
    val q1 = start()
    if (crash != null) {
      val ex = intercept[Throwable] { q1.processAllAvailable() }
      val mentionsInjected = Iterator.iterate(ex)(_.getCause)
        .takeWhile(_ != null).take(10)
        .exists(e => Option(e.getMessage).exists(_.contains("injected crash")))
      assert(mentionsInjected, s"query failed for the wrong reason: $ex")
      q1.stop()
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
    } else {
      try q1.processAllAvailable() finally q1.stop()
    }
    TxLog.snapshot(spark, table).get
      .select($"id", $"payload").as[(Long, String)].collect().toSeq.sorted
  }

  lazy val baseline: Seq[(Long, String)] = run()

  test("crash-free run: every micro-batch exactly once") {
    assert(baseline.size == 30)
    assert(baseline.map(_._1) == (0L until 30L))
  }

  test("crash BEFORE the batch commit: restart replays the epoch, contents identical") {
    val out = run { (_, id, _) =>
      if (id == 1) sys.error("injected crash (pre-commit)")
    }
    assert(out == baseline, "pre-commit crash lost or duplicated a batch")
  }

  test("crash AFTER an orphaned data write (the FileOutputCommitter window): replay commits fresh, orphan invisible") {
    val out = run { (df, id, table) =>
      if (id == 1) {
        // the crashed attempt got its data files down but died before
        // the manifest publish — exactly the window a direct-parquet
        // sink cannot distinguish from success
        df.write.parquet(s"$table/data/orphan-epoch$id")
        sys.error("injected crash (post-data-write)")
      }
    }
    assert(out == baseline,
      "orphaned data files leaked into the table or the replay was lost")
  }

  test("crash AFTER the commit published: replay is a token no-op, no duplicates") {
    val out = run { (df, id, table) =>
      if (id == 1) {
        // perform the crashing attempt's commit for real, then die
        // before foreachBatch returns — the checkpoint replays epoch 1
        // into an already-committed token
        TxLog.commit(df, table, "stream-writer", id)
        sys.error("injected crash (post-commit)")
      }
    }
    assert(out == baseline, "post-commit crash duplicated the batch")
  }
}
