package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** COMMIT TIMESTAMPS + timestampAsOf time travel.
  *
  * Every manifest records the committing writer's wall clock at render
  * time ("ts", epoch millis). Timestamp-addressed reads resolve through
  * the MONOTONIZED sequence — effective ts(v) = running max up to v —
  * because manifests record each writer's OWN clock and writers live in
  * different processes (a slow clock can commit after a fast one; the
  * reader at instant T saw the versions in log order regardless).
  *
  * Tests drive `TxLog.clockForTests` (the deterministic clock seam)
  * instead of sleeping between commits. */
class TxTimestampSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txts_").resolve("t").toString

  private def batch(ids: Range, grp: String): DataFrame =
    ids.map(i => (i.toLong, grp, s"name-$i")).toDF("id", "grp", "name")

  /** Run `body` with commits stamped from `times` in order (after the
    * list is exhausted the clock holds the last value). */
  private def withClock[A](times: Long*)(body: => A): A = {
    val it = times.iterator
    var last = times.head
    TxLog.clockForTests = () => { if (it.hasNext) last = it.next(); last }
    try body finally TxLog.clockForTests = null
  }

  /** v0 @1000, v1 @2000, v2 @3000 — three single-file generations. */
  private def stamped3(): String = {
    val t = freshTable()
    withClock(1000L, 2000L, 3000L) {
      TxLog.commit(batch(0 until 100, "alpha").coalesce(1), t, "w", 0L)
      TxLog.commit(batch(100 until 200, "beta").coalesce(1), t, "w", 1L)
      TxLog.commit(batch(200 until 300, "gamma").coalesce(1), t, "w", 2L)
    }
    t
  }

  test("snapshotAtTimestamp: exact instants, between-commit instants, and after-head instants") {
    val t = stamped3()
    // exact commit instant = that version
    assert(TxLog.snapshotAtTimestamp(spark, t, 1000L).get.count() == 100)
    // between commits = the last version at or before the instant
    assert(TxLog.snapshotAtTimestamp(spark, t, 2500L).get.count() == 200)
    // at/after the head's clock = the head (reading "as of now" works)
    assert(TxLog.snapshotAtTimestamp(spark, t, 3000L).get.count() == 300)
    assert(TxLog.snapshotAtTimestamp(spark, t, 999999L).get.count() == 300)
  }

  test("an instant before the earliest recorded commit time is loud, not empty") {
    val t = stamped3()
    val e = intercept[IllegalArgumentException] {
      TxLog.snapshotAtTimestamp(spark, t, 999L)
    }
    assert(e.getMessage.contains("before"), e.getMessage)
  }

  test("clock regression across writers: monotonized resolution keeps 'as of T' well-defined") {
    val t = freshTable()
    // writer A commits @5000; writer B's slow clock then commits @4000
    withClock(5000L) {
      TxLog.commit(batch(0 until 100, "fast").coalesce(1), t, "wa", 0L)
    }
    withClock(4000L) {
      TxLog.commit(batch(100 until 150, "slow").coalesce(1), t, "wb", 0L)
    }
    // T=4500 < both effective times? No: eff(v0)=5000, eff(v1)=max(5000,4000)=5000.
    // T=4500 is before the earliest EFFECTIVE commit time -> loud
    intercept[IllegalArgumentException] {
      TxLog.snapshotAtTimestamp(spark, t, 4500L)
    }
    // T=5000: ties resolve to the LATEST version at that effective
    // instant (what a reader at T actually saw: the full log)
    assert(TxLog.snapshotAtTimestamp(spark, t, 5000L).get.count() == 150)
  }

  test("DESCRIBE HISTORY surfaces the commit timestamp column") {
    val t = stamped3()
    val h = TxLog.history(spark, t).orderBy($"version")
      .select($"timestamp").collect().map(_.getTimestamp(0))
    assert(h.map(_.getTime).toSeq == Seq(1000L, 2000L, 3000L))
  }

  test("timestampAsOf reader option: epoch millis and timestamp literals, pinned read-only") {
    val t = stamped3()
    val byMillis = spark.read.format("txlog")
      .option("timestampAsOf", "2000").load(t)
    assert(byMillis.count() == 200)
    // a literal instant (JVM default zone, like the clocks it addresses)
    val lit2 = new java.sql.Timestamp(2500L)
    val byLiteral = spark.read.format("txlog")
      .option("timestampAsOf", lit2.toString).load(t)
    assert(byLiteral.count() == 200)
    // the pin is read-only, same as versionAsOf
    val e = intercept[Exception] {
      batch(900 until 910, "x").write.format("txlog").mode("append")
        .option("timestampAsOf", "2000").save(t)
    }
    assert(e.getMessage.contains("read-only"), e.getMessage)
  }

  test("timestampAsOf and versionAsOf together are rejected; junk parses loudly") {
    val t = stamped3()
    val both = intercept[IllegalArgumentException] {
      spark.read.format("txlog").option("timestampAsOf", "2000")
        .option("versionAsOf", "1").load(t).count()
    }
    assert(both.getMessage.contains("mutually exclusive"), both.getMessage)
    val junk = intercept[IllegalArgumentException] {
      spark.read.format("txlog").option("timestampAsOf", "not-a-time").load(t).count()
    }
    assert(junk.getMessage.contains("timestampAsOf"), junk.getMessage)
  }

  test("timestampAsOf serves the schema AS OF the resolved version under evolution") {
    val t = freshTable()
    withClock(1000L, 2000L) {
      TxLog.commit(batch(0 until 50, "a").coalesce(1), t, "w", 0L)
      TxLog.commit(
        batch(50 until 100, "b").withColumn("flag", when($"id" >= 0L, true)).coalesce(1),
        t, "w", 1L)
    }
    val old = spark.read.format("txlog").option("timestampAsOf", "1500").load(t)
    assert(!old.columns.contains("flag"), "pre-evolution snapshot must not show the evolved column")
    val now = spark.read.format("txlog").option("timestampAsOf", "2000").load(t)
    assert(now.columns.contains("flag"))
  }

  test("startingTimestamp starts a stream at the first version committed at or after the instant") {
    val t = stamped3()
    val out = Files.createTempDirectory("txts_out_").toString
    val ck = Files.createTempDirectory("txts_ck_").toString
    val q = spark.readStream.format("txlog")
      .option("startingTimestamp", "1500").load(t)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.parquet(out)
    assert(got.count() == 200, "v1 (@2000) and v2 (@3000), not v0 (@1000)")
    assert(got.where($"grp" === "alpha").count() == 0)
    // past the head's clock: loud, not a silently idle stream
    val e = intercept[Exception] {
      spark.readStream.format("txlog").option("startingTimestamp", "999999")
        .load(t).writeStream.format("noop").start().processAllAvailable()
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => Option(y.getMessage).toSeq ++ msgs(y.getCause))
    assert(msgs(e).exists(_.contains("startingVersion=latest")), e.toString)
    // and the version/timestamp forms of one bound are exclusive
    val both = intercept[Exception] {
      spark.readStream.format("txlog").option("startingTimestamp", "1500")
        .option("startingVersion", "1").load(t)
        .writeStream.format("noop").start().processAllAvailable()
    }
    assert(msgs(both).exists(_.contains("mutually exclusive")), both.toString)
  }

  test("the change feed windows by timestamp: startingTimestamp/endingTimestamp resolve to versions") {
    val t = freshTable()
    withClock(500L, 1000L, 2000L, 3000L) {
      TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true")) // v0 @500
      TxLog.commit(batch(0 until 100, "a").coalesce(1), t, "w", 0L)      // v1 @1000
      TxLog.commit(batch(100 until 200, "b").coalesce(1), t, "w", 1L)    // v2 @2000
      TxLog.commit(batch(200 until 300, "c").coalesce(1), t, "w", 2L)    // v3 @3000
    }
    val feed = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingTimestamp", "1500").option("endingTimestamp", "2500")
      .load(t)
    assert(feed.count() == 100, "exactly v2's inserts (@2000)")
    assert(feed.select($"_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("checkpoints and DML stamp their clocks too; pre-feature manifests read as null timestamps") {
    val t = freshTable()
    withClock(1000L, 2000L, 3000L) {
      TxLog.commit(batch(0 until 100, "a").coalesce(1), t, "w", 0L)
      TxLog.delete(spark, t, $"id" < 10L, "del", 0L)
      TxLog.compact(spark, t)
    }
    val h = TxLog.history(spark, t).orderBy($"version").collect()
    assert(h.map(_.getTimestamp(2).getTime).toSeq == Seq(1000L, 2000L, 3000L))
    // a legacy manifest (no ts key) still parses; its timestamp is null
    val dir = new java.io.File(t, "_txlog")
    val v0 = new java.io.File(dir, f"v${0L}%020d.json")
    val txt = new String(java.nio.file.Files.readAllBytes(v0.toPath), "UTF-8")
    java.nio.file.Files.write(v0.toPath,
      txt.replaceFirst(""""ts": \d+, """, "").getBytes("UTF-8"))
    val h2 = TxLog.history(spark, t).orderBy($"version").collect()
    assert(h2(0).isNullAt(2), "stripped ts must read back as null, not crash")
    // and timestamp addressing skips it: the earliest RECORDED time is v1's
    assert(TxLog.snapshotAtTimestamp(spark, t, 2000L).get.count() == 90)
    intercept[IllegalArgumentException] {
      TxLog.snapshotAtTimestamp(spark, t, 1500L)
    }
  }
}
