package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** CHANGE DATA FEED (r12): table properties, commit-time change
  * capture for every DML shape (library and SQL-planned), the batch
  * version-windowed reader, the live stream that SURVIVES DML and
  * compaction, and vacuum's referenced-change retention. The feed is
  * the retract/add model: UPDATE = delete+insert at one version. */
class TxCdfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txcdf_").resolve("t").toString

  private def batch(ids: Range, grp: String): DataFrame =
    ids.map(i => (i.toLong, grp, s"name-$i")).toDF("id", "grp", "name")

  private def changes(t: String, opts: Map[String, String] = Map.empty): DataFrame =
    opts.foldLeft(spark.read.format("txlog").option("readChangeFeed", "true")) {
      case (r, (k, v)) => r.option(k, v)
    }.load(t)

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  /** v0 props · v1 append alpha[0,100) · v2 append beta[100,200) ·
    * v3 DELETE id<50 · v4 append gamma[200,300). */
  private def curated(): String = {
    val t = freshTable()
    batch(0 until 1, "seed").coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.delete(spark, t, $"grp" === "seed", "cdf-seed-del", 0L) // pre-CDF DML (v1)
    t
  }

  private def feedTable(): String = {
    val t = freshTable()
    assert(TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true")) == 0L)
    batch(0 until 100, "alpha").coalesce(1).write.format("txlog").mode("append").save(t)
    batch(100 until 200, "beta").coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.delete(spark, t, $"id" < 50L, "cdf-del", 0L) // v3
    batch(200 until 300, "gamma").coalesce(1).write.format("txlog").mode("append").save(t)
    t
  }

  test("table properties: merge, newest wins, survive checkpoint + truncation") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map("a" -> "1"))
    TxLog.setProperties(spark, t, Map("b" -> "2"))
    assert(TxLog.properties(spark, t) == Map("a" -> "1", "b" -> "2"))
    TxLog.setProperties(spark, t, Map("a" -> "3")) // newest wins, b kept
    assert(TxLog.properties(spark, t) == Map("a" -> "3", "b" -> "2"))
    // checkpoints re-record, so truncation cannot lose them
    batch(0 until 10, "x").coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.compact(spark, t)
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    assert(TxLog.headVersion(spark, t) > 0L)
    assert(TxLog.properties(spark, t) == Map("a" -> "3", "b" -> "2"))
  }

  test("batch feed: appends are inserts, DML is its captured delta, exact rows") {
    val t = feedTable()
    val all = changes(t)
    // per-version accounting
    val byVer = all.groupBy($"_commit_version", $"_change_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byVer == Map(
      (1L, "insert") -> 100L, (2L, "insert") -> 100L,
      (3L, "delete") -> 50L, (4L, "insert") -> 100L))
    // the deleted rows are EXACTLY the pre-image of the DELETE
    val dels = all.where($"_change_type" === "delete").select($"id", $"grp", $"name")
    assert(rows(dels) == rows(batch(0 until 50, "alpha")))
    // windowing is inclusive both ends
    assert(changes(t, Map("startingVersion" -> "3", "endingVersion" -> "3"))
      .count() == 50L)
    // history surfaces the capture (n_changes on the DML version)
    assert(TxLog.history(spark, t).where($"version" === 3L)
      .select($"n_changes").collect()(0).getLong(0) > 0L)
    // materialization recipe: inserts minus deletes = the live table
    val ins = all.where($"_change_type" === "insert").select($"id", $"grp", $"name")
    assert(rows(ins.exceptAll(dels)) == rows(spark.read.format("txlog").load(t)))
  }

  test("update is a delete+insert pair at one version; self-assignment is empty, not an error") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    batch(0 until 10, "a").coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.update(spark, t, $"id" === 7L, Map("name" -> lit("renamed")), "cdf-up", 0L) // v2
    val v2 = changes(t, Map("startingVersion" -> "2", "endingVersion" -> "2"))
    assert(rows(v2.select($"id", $"name", $"_change_type")) ==
      Seq("[7,name-7,delete]", "[7,renamed,insert]"))
    // SET name = name: a real rewrite with an EMPTY delta — recorded as
    // no change rows, readable (versioned props prove the feed was on)
    TxLog.update(spark, t, $"id" === 3L, Map("name" -> $"name"), "cdf-noop", 0L) // v3
    assert(TxLog.headVersion(spark, t) == 3L)
    assert(changes(t, Map("startingVersion" -> "3", "endingVersion" -> "3")).count() == 0L)
  }

  test("SQL-planned DML (ReplaceData) captures changes through the same seam") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    batch(0 until 20, "a").coalesce(1).write.format("txlog").mode("append").save(t)
    spark.sql(s"CREATE TABLE cdf_sql_t USING txlog OPTIONS (path '$t')")
    try {
      spark.sql("DELETE FROM cdf_sql_t WHERE id >= 15")
      val v2 = changes(t, Map("startingVersion" -> "2"))
      assert(rows(v2.select($"id", $"_change_type")) ==
        (15 until 20).map(i => s"[$i,delete]").sorted)
    } finally spark.sql("DROP TABLE cdf_sql_t")
  }

  test("DML from before the feed was enabled is loud, not silently empty") {
    val t = curated() // v1 deleted rows with NO feed on
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    val e = intercept[Exception] { changes(t).collect() }
    assert(e.getMessage.contains("BEFORE the change feed was enabled"), e.getMessage)
    // but a window past it reads fine
    batch(10 until 12, "x").coalesce(1).write.format("txlog").mode("append").save(t)
    assert(changes(t, Map("startingVersion" -> "3")).count() == 2L)
  }

  test("overwrite has no row-level delta: loud") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    batch(0 until 10, "a").coalesce(1).write.format("txlog").mode("append").save(t)
    batch(0 until 5, "b").coalesce(1).write.format("txlog").mode("overwrite").save(t)
    val e = intercept[Exception] { changes(t).collect() }
    assert(e.getMessage.contains("OVERWROTE"), e.getMessage)
  }

  test("the live feed survives DML and compaction (the plain tail cannot)") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    batch(0 until 100, "alpha").coalesce(1).write.format("txlog").mode("append").save(t)
    val name = s"cdf_live_${System.nanoTime()}"
    val q = spark.readStream.format("txlog").option("readChangeFeed", "true").load(t)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("cdf_ckpt_").toString)
      .start()
    try {
      q.processAllAvailable()
      val snap = spark.table(name)
      assert(snap.count() == 100L, "initial snapshot as inserts")
      assert(snap.where($"_change_type" =!= "insert").count() == 0L)
      TxLog.delete(spark, t, $"id" < 10L, "cdf-live-del", 0L)
      q.processAllAvailable()
      assert(spark.table(name).where($"_change_type" === "delete").count() == 10L)
      TxLog.compact(spark, t) // maintenance: feed-invariant
      batch(100 until 110, "beta").coalesce(1).write.format("txlog").mode("append").save(t)
      q.processAllAvailable()
      val got = spark.table(name)
      assert(got.where($"_change_type" === "insert").count() == 110L)
      assert(got.count() == 120L)
    } finally q.stop()
  }

  test("vacuum keeps referenced change files, collects truncated ones") {
    val t = feedTable()
    // referenced: vacuum now must NOT break the feed
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    assert(changes(t, Map("startingVersion" -> "3", "endingVersion" -> "3"))
      .count() == 50L)
    // compact + vacuum truncates the log below the checkpoint — the
    // DML's manifest goes, its change files become unreferenced and die
    TxLog.compact(spark, t)
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val chRoot = new org.apache.hadoop.fs.Path(t, "_changes")
    assert(!f.exists(chRoot) || f.listStatus(chRoot).isEmpty,
      "truncated versions' change files must be collected")
    // and the feed now starts at the retained range (loud below it)
    val e = intercept[Exception] {
      changes(t, Map("startingVersion" -> "3")).collect()
    }
    assert(e.getMessage.contains("not in"), e.getMessage)
  }

  test("feed rows from pre-evolution versions backfill evolved columns with null") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    batch(0 until 10, "a").coalesce(1).write.format("txlog").mode("append").save(t) // v1
    batch(10 until 20, "b").withColumn("flag", when($"id" >= 0L, true))
      .coalesce(1).write.format("txlog").mode("append").save(t) // v2: + flag
    TxLog.delete(spark, t, $"id" === 5L, "cdf-ev-del", 0L) // v3: pre-flag file rewrite
    val all = changes(t)
    assert(all.schema.fieldNames.toSeq ==
      Seq("id", "grp", "name", "flag", "_change_type", "_commit_version"))
    assert(all.where($"_commit_version" === 1L && $"flag".isNull).count() == 10L)
    assert(all.where($"_commit_version" === 2L && $"flag" === true).count() == 10L)
    // the v3 delta (pre-image of a pre-evolution row) reads through the
    // current schema too: null flag, not a schema clash
    assert(rows(all.where($"_commit_version" === 3L)
      .select($"id", $"flag", $"_change_type")) == Seq("[5,null,delete]"))
  }

  test("capstone: a downstream aggregate maintained ONLY from the feed stays exact under DML") {
    val t = feedTable() // appends + a DELETE, all captured
    // maintain counts-per-grp incrementally: +1 per insert, -1 per delete
    // (the retract/add model — what an incremental materialized view,
    // a dedup index, or any downstream state needs from a curated table)
    val name = s"cdf_mv_${System.nanoTime()}"
    val state = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val q = spark.readStream.format("txlog").option("readChangeFeed", "true").load(t)
      .writeStream
      .option("checkpointLocation", Files.createTempDirectory("cdf_mv_").toString)
      .foreachBatch { (df: DataFrame, _: Long) =>
        df.groupBy($"grp")
          .agg(sum(when($"_change_type" === "insert", 1L).otherwise(-1L)).as("d"))
          .collect().foreach(r => state.merge(r.getString(0), r.getLong(1), Long.box(_) + _))
        ()
      }.start()
    try {
      q.processAllAvailable()
      TxLog.update(spark, t, $"id" >= 250L, Map("grp" -> lit("delta")), "cdf-mv-up", 0L)
      TxLog.delete(spark, t, $"grp" === "beta" && $"id" < 150L, "cdf-mv-del", 0L)
      TxLog.compact(spark, t)
      batch(300 until 320, "omega").coalesce(1).write.format("txlog").mode("append").save(t)
      q.processAllAvailable()
      // the incrementally-maintained counts equal a full recompute
      val expected = spark.read.format("txlog").load(t)
        .groupBy($"grp").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      import scala.jdk.CollectionConverters._
      val got = state.asScala.filter(_._2 != 0L).toMap
      assert(got == expected, s"incremental=$got recompute=$expected")
    } finally q.stop()
  }

  test("merge-upsert captures updated keys as delete+insert and new keys as insert") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    batch(0 until 10, "a").coalesce(1).write.format("txlog").mode("append").save(t)
    val src = Seq((7L, "a", "upserted"), (99L, "z", "brand-new"))
      .toDF("id", "grp", "name")
    TxLog.merge(src, t, Seq("id"), "cdf-merge", 0L) // v2
    val v2 = changes(t, Map("startingVersion" -> "2"))
    assert(rows(v2.select($"id", $"name", $"_change_type")) == Seq(
      "[7,name-7,delete]", "[7,upserted,insert]", "[99,brand-new,insert]"))
  }

  test("partitioned tables: DML capture reads through the hive-staged rewrite") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    TxLog.commitPartitioned(batch(0 until 100, "alpha")
      .union(batch(100 until 200, "beta")), t, Seq("grp"), "cdf-part", 0L)
    TxLog.delete(spark, t, $"grp" === "beta" && $"id" < 120L, "cdf-part-del", 0L)
    val dels = changes(t).where($"_change_type" === "delete")
    assert(rows(dels.select($"id", $"grp", $"name")) ==
      rows(batch(100 until 120, "beta")))
    // the rewrite stayed partitioned AND the live read agrees
    assert(spark.read.format("txlog").load(t).count() == 180L)
  }

  test("a STREAM with startingVersion=0 replays the per-version history, not the net snapshot") {
    val t = feedTable() // v1,v2 inserts · v3 delete(50) · v4 insert
    val name = s"cdf_sv0_${System.nanoTime()}"
    val q = spark.readStream.format("txlog")
      .option("readChangeFeed", "true").option("startingVersion", "0").load(t)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("cdf_sv0_").toString)
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table(name)
      // the HISTORY: 300 inserts + 50 deletes with true commit versions —
      // the snapshot branch would have served 250 net inserts at head
      assert(got.where($"_change_type" === "delete").count() == 50L)
      assert(got.where($"_change_type" === "insert").count() == 300L)
      assert(rows(got) == rows(changes(t, Map("startingVersion" -> "0"))),
        "stream and batch must agree on startingVersion=0")
    } finally q.stop()
  }

  test("changeFeed on a map-typed table is rejected at enablement and at capture") {
    val t = freshTable()
    Seq((1L, Map("k" -> "v"))).toDF("id", "m").coalesce(1)
      .write.format("txlog").mode("append").save(t)
    val e = intercept[IllegalArgumentException] {
      TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    }
    assert(e.getMessage.contains("map-typed"), e.getMessage)
    // evolution can smuggle a map in AFTER enablement: DML then fails
    // with guidance, not exceptAll's AnalysisException
    val t2 = freshTable()
    TxLog.setProperties(spark, t2, Map(TxLog.ChangeFeedProp -> "true"))
    batch(0 until 5, "a").coalesce(1).write.format("txlog").mode("append").save(t2)
    batch(5 until 10, "b")
      .withColumn("m", when($"id" >= 0L, map(lit("k"), $"grp"))).coalesce(1)
      .write.format("txlog").mode("append").save(t2)
    val e2 = intercept[IllegalStateException] {
      TxLog.delete(spark, t2, $"id" === 0L, "cdf-map-del", 0L)
    }
    assert(e2.getMessage.contains("map-typed"), e2.getMessage)
  }

  test("a batch feed window over a vacuumed change file is loud, not an executor FNF") {
    val t = feedTable()
    val root = new org.apache.hadoop.fs.Path(t)
    val f = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the aged-changes / un-aged-log vacuum state: the DML's
    // change file gone while its manifest survives (live files intact,
    // so only the feed guard can catch this)
    assert(changes(t, Map("startingVersion" -> "3", "endingVersion" -> "3"))
      .count() == 50L) // intact first
    val chDir = new org.apache.hadoop.fs.Path(t, "_changes")
    val victim = f.listStatus(chDir).flatMap(d => f.listStatus(d.getPath))
      .filter(_.getPath.getName.endsWith(".parquet")).head
    f.delete(victim.getPath, false)
    val e = intercept[IllegalStateException] { changes(t).collect() }
    assert(e.getMessage.contains("vacuum"), e.getMessage)
  }

  test("capture under crash and conflict: replay captures once, orphans are vacuum-collectable") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    batch(0 until 20, "a").coalesce(1).write.format("txlog").mode("append").save(t)
    // crash INSIDE the delete, before any publish: no manifest, no feed
    // change; the replayed statement (same token) captures exactly once
    intercept[RuntimeException] {
      TxLog.delete(spark, t, $"id" < 5L, "cdf-crash", 7L,
        beforeCommit = () => throw new RuntimeException("injected"))
    }
    assert(TxLog.headVersion(spark, t) == 1L, "crashed DML must publish nothing")
    TxLog.delete(spark, t, $"id" < 5L, "cdf-crash", 7L) // the replay
    assert(changes(t, Map("startingVersion" -> "2")).where($"_change_type" === "delete")
      .count() == 5L, "exactly one captured delta after the replay")
    // conflict: a concurrent append lands between scan and publish —
    // the rewrite throws BEFORE capture stages anything (head check
    // precedes it), the feed is untouched, and an immediate vacuum
    // must not harm the committed delta's referenced change files
    intercept[java.util.ConcurrentModificationException] {
      TxLog.delete(spark, t, $"id" === 10L, "cdf-conflict", 0L,
        beforeCommit = () => {
          batch(100 until 105, "rival").coalesce(1)
            .write.format("txlog").mode("append").save(t); ()
        })
    }
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    assert(changes(t, Map("startingVersion" -> "2", "endingVersion" -> "2"))
      .count() == 5L, "the committed delta must survive the orphan sweep")
  }

  test("column pruning serves the meta constants without data columns") {
    val t = feedTable()
    val pruned = changes(t).select($"_commit_version", $"_change_type")
    val got = pruned.groupBy($"_commit_version", $"_change_type").count()
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got((3L, "delete")) == 50L && got((4L, "insert")) == 100L)
  }

  test("incremental OPTIMIZE (compactSmall) is feed-invariant — zero entries, even pre-feed") {
    // r13 review finding follow-through: compactSmall's non-checkpoint
    // rewrite is layout-only, so the feed serves NOTHING for its
    // version — and a compactSmall from BEFORE the feed was enabled is
    // exempt from the pre-feed loudness (there never was a delta)
    val t = freshTable()
    (0 until 3).foreach(i => batch(i * 10 until (i + 1) * 10, "a").coalesce(1)
      .write.format("txlog").mode("append").save(t))
    assert(TxLog.compactSmall(spark, t, targetBytes = 1L << 30) == 3L) // pre-feed
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true")) // v4
    batch(30 until 40, "b").coalesce(1).write.format("txlog").mode("append").save(t) // v5
    assert(TxLog.compactSmall(spark, t, targetBytes = 1L << 30) == 6L) // post-feed
    val feed = changes(t, Map("startingVersion" -> "0"))
    val byV = feed.groupBy($"_commit_version").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byV == Map(0L -> 10L, 1L -> 10L, 2L -> 10L, 5L -> 10L),
      s"compactSmall versions leaked into the feed: $byV")
    assert(feed.where($"_change_type" =!= "insert").isEmpty)
  }
}
