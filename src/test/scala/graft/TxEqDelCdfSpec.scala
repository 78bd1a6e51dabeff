package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{Materialized, TxLog}

/** CHANGE FEED × EQUALITY DELETES (r17): a keyed write
  * ([[TxLog.deleteByKeys]] / [[TxLog.upsertByKeys]]) on a change-feed
  * table captures its retract/add delta AT COMMIT — the delete-side
  * pre-image is a zone-pruned scan of the prior snapshot's matching
  * rows plus a broadcast semi-join on the staged keys (O(matched),
  * never a rewrite: the write still stages no replacement files) —
  * so a CDC-upsert table can feed incremental consumers (batch CDF
  * windows, the live CDF stream, feed-maintained aggregates) without
  * a forced materialization. This closes r16's one CDC discontinuity
  * (the CDF-refusal contract this spec's predecessor pinned). */
class TxEqDelCdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txeqcdf_").resolve("t").toString

  /** two files: ids 0..3 ("a") and 4..7 ("b"), feed ON */
  private def buildFeed(): String = {
    val t = fresh()
    spark.range(4).select(col("id"), lit("a").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    spark.range(4, 8).select(col("id"), lit("b").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.setProperties(spark, t, Map("changeFeed" -> "true"))
    t
  }

  private def feed(t: String, from: Long, to: Long): DataFrame =
    spark.read.format("txlog")
      .option("readChangeFeed", "true")
      .option("startingVersion", from.toString)
      .option("endingVersion", to.toString)
      .load(t)

  private def deltaAt(t: String, v: Long): Seq[(Long, String, String)] =
    feed(t, v, v).select("id", "v", "_change_type")
      .as[(Long, String, String)].collect().toSeq.sorted

  private def rows(t: String): Seq[(Long, String)] =
    TxLog.snapshot(spark, t).map(_.select("id", "v").orderBy("id")
      .as[(Long, String)].collect().toSeq).getOrElse(Seq.empty)

  test("deleteByKeys on a feed table captures its delete-side delta " +
      "(keyed, no merge fallback)") {
    val t = buildFeed()
    val v = TxLog.deleteByKeys(Seq(1L, 6L, 99L).toDF("id"), t, "d", 0L)
    assert(v > 0)
    assert(TxLog.liveEqDelCount(spark, t) == 3L, "the write must stay keyed")
    assert(rows(t).map(_._1) == Seq(0L, 2L, 3L, 4L, 5L, 7L))
    // the feed reports exactly the matched prior rows as deletes —
    // the unmatched key (99) records nothing
    assert(deltaAt(t, v) == Seq((1L, "a", "delete"), (6L, "b", "delete")))
  }

  test("upsertByKeys captures retract/add; identical re-upserted rows cancel") {
    val t = buildFeed()
    // 2 -> replaced, 4 -> re-upserted identical, 10 -> fresh insert
    val v = TxLog.upsertByKeys(
      Seq((2L, "X"), (4L, "b"), (10L, "Z")).toDF("id", "v"), t, Seq("id"), "u", 0L)
    assert(TxLog.liveEqDelCount(spark, t) == 3L, "the write must stay keyed")
    assert(rows(t).toMap.apply(2L) == "X" && rows(t).toMap.apply(10L) == "Z")
    assert(deltaAt(t, v) == Seq((2L, "X", "insert"), (2L, "a", "delete"),
      (10L, "Z", "insert")),
      "replaced row = retract+add; identical row = no change; fresh key = insert")
    // the upsert's data files must NOT also serve as plain inserts: the
    // whole-window feed folds to exactly the head state
    val net = feed(t, 0L, TxLog.headVersion(spark, t))
      .groupBy("id", "v")
      .agg(sum(when(col("_change_type") === "insert", 1).otherwise(-1)).as("n"))
      .where(col("n") > 0).select("id", "v")
      .as[(Long, String)].collect().toSeq.sorted
    assert(net == rows(t), s"$net vs ${rows(t)}")
  }

  test("materializeEqDels is feed-invariant (delta already reported at the " +
      "keyed commits)") {
    val t = buildFeed()
    TxLog.deleteByKeys(Seq(1L, 5L).toDF("id"), t, "m", 0L)
    val want = rows(t)
    val r = TxLog.materializeEqDels(spark, t)
    assert(TxLog.liveEqDelCount(spark, t) == 0L)
    assert(rows(t) == want)
    assert(feed(t, r.version, r.version).count() == 0L,
      "a row-invariant materialization must serve an empty delta")
  }

  test("pre-feed eqdel versions stay loud; the feed works from enablement on") {
    val t = fresh()
    spark.range(4).select(col("id"), lit("a").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    val vDel = TxLog.deleteByKeys(Seq(1L).toDF("id"), t, "pre", 0L)
    TxLog.materializeEqDels(spark, t)
    val vOn = TxLog.setProperties(spark, t, Map("changeFeed" -> "true"))
    // crossing the pre-feed keyed delete: the delta was never recorded
    val e = intercept[Exception] {
      feed(t, vDel, TxLog.headVersion(spark, t)).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(t0 =>
        Option(t0.getMessage).toSeq ++ msgs(t0.getCause))
    assert(msgs(e).exists(_.contains("equality deletes")), msgs(e).toString)
    // from enablement on, keyed writes capture and serve
    val vU = TxLog.upsertByKeys(Seq((0L, "N")).toDF("id", "v"), t, Seq("id"), "post", 0L)
    assert(feed(t, vOn, vU).select("id", "v", "_change_type")
      .as[(Long, String, String)].collect().toSeq.sorted ==
      Seq((0L, "N", "insert"), (0L, "a", "delete")))
  }

  test("a concurrent row-changing commit during the capture CONFLICTS " +
      "(the pre-image would under-report)") {
    val t = buildFeed()
    // fires at commitManifest entry — after the capture staged, before
    // the manifest publishes: exactly a racing writer's window
    TxLog.publishRaceForTests = () =>
      spark.range(100, 102).select(col("id"), lit("z").as("v"))
        .coalesce(1).write.format("txlog").mode("append").save(t)
    val e = intercept[java.util.ConcurrentModificationException](
      TxLog.deleteByKeys(Seq(0L).toDF("id"), t, "race", 0L))
    assert(e.getMessage.contains("change capture"), e.getMessage)
    // the concurrent append landed; the keyed delete did not
    assert(rows(t).map(_._1) == (0L to 7L) ++ Seq(100L, 101L))
    assert(TxLog.liveEqDelCount(spark, t) == 0L)
  }

  test("the CDF STREAM tails keyed upserts and deletes — the CDC loop closes") {
    val t = buildFeed()
    // pre-stream key debt: the initial snapshot must apply it
    TxLog.deleteByKeys(Seq(3L).toDF("id"), t, "s0", 0L)
    val name = s"txeqcdf_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog")
      .option("readChangeFeed", "true").option("path", t).load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation",
        Files.createTempDirectory("txeqcdf_st_").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).where(col("_change_type") === "insert")
        .select("id").as[Long].collect().sorted.toSeq ==
        Seq(0L, 1L, 2L, 4L, 5L, 6L, 7L),
        "the snapshot batch must apply the live key debt")
      // a keyed upsert mid-stream: the tail serves retract/add, not death
      TxLog.upsertByKeys(Seq((0L, "U"), (20L, "U")).toDF("id", "v"),
        t, Seq("id"), "s1", 0L)
      q.processAllAvailable()
      val tail = spark.table(name)
        .where(col("_commit_version") === TxLog.headVersion(spark, t))
        .select("id", "v", "_change_type")
        .as[(Long, String, String)].collect().toSeq.sorted
      assert(tail == Seq((0L, "U", "insert"), (0L, "a", "delete"),
        (20L, "U", "insert")), tail.toString)
      // and a keyed delete
      TxLog.deleteByKeys(Seq(20L).toDF("id"), t, "s2", 0L)
      q.processAllAvailable()
      val tail2 = spark.table(name)
        .where(col("_commit_version") === TxLog.headVersion(spark, t))
        .select("id", "_change_type").as[(Long, String)].collect().toSeq
      assert(tail2 == Seq((20L, "delete")), tail2.toString)
    } finally q.stop()
  }

  test("capstone: a feed-maintained aggregate stays true across a keyed " +
      "upsert/delete history") {
    val src = fresh(); val tgt = fresh()
    Seq((1L, "g1", 10.0), (2L, "g1", 5.0), (3L, "g2", 7.0))
      .toDF("id", "grp", "amount")
      .coalesce(1).write.format("txlog").mode("append").save(src)
    TxLog.setProperties(spark, src, Map("changeFeed" -> "true"))
    val spec = Materialized.Spec(groupBy = Seq("grp"), sums = Seq("amount"))
    Materialized.refresh(spark, src, tgt, spec)
    def agg(): Seq[(String, Double)] =
      Materialized.read(spark, tgt).select("grp", "amount_sum")
        .as[(String, Double)].collect().toSeq.sorted
    assert(agg() == Seq(("g1", 15.0), ("g2", 7.0)))
    // keyed upsert: replace id=2 (g1 5→9), add id=4 (g2 +3)
    TxLog.upsertByKeys(Seq((2L, "g1", 9.0), (4L, "g2", 3.0)).toDF("id", "grp", "amount"),
      src, Seq("id"), "mv-u", 0L)
    Materialized.refresh(spark, src, tgt, spec)
    assert(agg() == Seq(("g1", 19.0), ("g2", 10.0)))
    // keyed delete: drop id=1 (g1 −10) and id=3 (g2 −7)
    TxLog.deleteByKeys(Seq(1L, 3L).toDF("id"), src, "mv-d", 0L)
    Materialized.refresh(spark, src, tgt, spec)
    assert(agg() == Seq(("g1", 9.0), ("g2", 3.0)))
    // the view equals a from-scratch aggregate of the snapshot
    val want = TxLog.snapshot(spark, src).get.groupBy("grp")
      .agg(sum("amount").as("s")).as[(String, Double)].collect().toSeq.sorted
    assert(agg() == want)
  }
}
