package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** RESTORE to an earlier version: a NEW checkpoint commit whose read
  * set is v's file list — no data copied, no log truncated, history
  * preserved (the restore itself time-travels). Vacuum-safe both ways:
  * a collected target generation fails loudly, and once restored the
  * files are live again so subsequent vacuums keep them. With the
  * change feed on, the restore captures its row-level effect so feed
  * consumers follow it incrementally; the plain append-only stream
  * fails loudly, like overwrite. */
class TxRestoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txrst_").resolve("t").toString

  private def batch(ids: Range, grp: String): DataFrame =
    ids.map(i => (i.toLong, grp, s"name-$i")).toDF("id", "grp", "name")

  /** v0/v1: two appends; v2: DELETE of [50,150). */
  private def withDml(): String = {
    val t = freshTable()
    TxLog.commit(batch(0 until 100, "alpha").coalesce(1), t, "w", 0L)
    TxLog.commit(batch(100 until 200, "beta").coalesce(1), t, "w", 1L)
    TxLog.delete(spark, t, $"id" >= 50L && $"id" < 150L, "del", 0L)
    t
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("restore undoes a DML as a new commit; history and time travel survive") {
    val t = withDml()
    assert(TxLog.snapshot(spark, t).get.count() == 100)
    val v = TxLog.restore(spark, t, 1L)
    assert(v == 3L, "restore is a NEW version, not a rollback of the log")
    val got = TxLog.snapshot(spark, t).get
    assert(got.count() == 200)
    assert(rows(got) == rows(batch(0 until 200, "x")
      .withColumn("grp", when($"id" < 100L, "alpha").otherwise("beta"))))
    // the deleted state is still addressable — restore hid nothing
    assert(TxLog.snapshotAt(spark, t, 2L).get.count() == 100)
    val ops = TxLog.history(spark, t).orderBy($"version")
      .collect().map(_.getString(1)).toSeq
    assert(ops == Seq("APPEND", "APPEND", "REWRITE", "RESTORE"), ops.toString)
  }

  test("restoring to the current state is a no-op: no commit, head unchanged") {
    val t = withDml()
    val head = TxLog.headVersion(spark, t)
    assert(TxLog.restore(spark, t, head) == head)
    assert(TxLog.headVersion(spark, t) == head)
  }

  test("restore to a vacuumed generation is loud; after a restore, vacuum keeps the restored files") {
    val t = withDml()
    // the DML rewrote both original files; zero-retention vacuum
    // collects them while their manifests survive — the restore target
    // version is addressable but its generation is gone
    assert(TxLog.vacuum(spark, t, minAgeMs = 0L) > 0)
    val e = intercept[IllegalStateException] { TxLog.restore(spark, t, 1L) }
    assert(e.getMessage.contains("vacuum"), e.getMessage)
    // after compact + vacuum the log itself truncates below the
    // checkpoint: the version is no longer addressable at all — loud too
    val t3 = withDml()
    TxLog.compact(spark, t3)
    TxLog.vacuum(spark, t3, minAgeMs = 0L)
    val e3 = intercept[IllegalArgumentException] { TxLog.restore(spark, t3, 1L) }
    assert(e3.getMessage.contains("not in"), e3.getMessage)
    // whereas a live-target restore then vacuum keeps the files readable
    val t2 = withDml()
    TxLog.restore(spark, t2, 1L)
    TxLog.vacuum(spark, t2, minAgeMs = 0L)
    assert(TxLog.snapshot(spark, t2).get.count() == 200)
  }

  test("restore across schema evolution brings v's schema back") {
    val t = freshTable()
    TxLog.commit(batch(0 until 50, "a").coalesce(1), t, "w", 0L)
    TxLog.commit(
      batch(50 until 100, "b").withColumn("flag", when($"id" >= 0L, true)).coalesce(1),
      t, "w", 1L)
    assert(spark.read.format("txlog").load(t).columns.contains("flag"))
    TxLog.restore(spark, t, 0L)
    val got = spark.read.format("txlog").load(t)
    assert(!got.columns.contains("flag"), "restored schema must be v0's")
    assert(got.count() == 50)
  }

  test("with the feed on, restore captures its row-level effect; materialization stays consistent") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    TxLog.commit(batch(0 until 100, "a").coalesce(1), t, "w", 0L)     // v1
    TxLog.delete(spark, t, $"id" < 30L, "del", 0L)                    // v2
    val v = TxLog.restore(spark, t, 1L)                               // v3
    val feed = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", v.toString).option("endingVersion", v.toString)
      .load(t)
    // the restore's delta is exactly the un-delete: 30 inserts, 0 deletes
    assert(feed.where($"_change_type" === "insert").count() == 30)
    assert(feed.where($"_change_type" === "delete").count() == 0)
    assert(feed.select($"_commit_version").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(v))
    // full-feed materialization (inserts minus deletes) = the live table
    val all = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", "0").load(t)
    val ins = all.where($"_change_type" === "insert").select($"id", $"grp", $"name")
    val dels = all.where($"_change_type" === "delete").select($"id", $"grp", $"name")
    assert(rows(ins.exceptAll(dels)) == rows(spark.read.format("txlog").load(t)))
  }

  test("a restore from before the feed was enabled fails a feed read loudly") {
    val t = withDml() // no feed
    TxLog.restore(spark, t, 1L) // v3, no captured changes
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true")) // v4
    val e = intercept[Exception] {
      spark.read.format("txlog").option("readChangeFeed", "true")
        .option("startingVersion", "3").option("endingVersion", "3")
        .load(t).count()
    }
    assert(e.getMessage.contains("RESTORED") ||
      Option(e.getCause).exists(_.getMessage.contains("RESTORED")), e.getMessage)
  }

  test("the plain append-only stream fails loudly across a restore") {
    val t = withDml()
    TxLog.restore(spark, t, 1L)
    val out = Files.createTempDirectory("txrst_out_").toString
    val ck = Files.createTempDirectory("txrst_ck_").toString
    val e = intercept[Exception] {
      val q = spark.readStream.format("txlog")
        .option("startingVersion", "3").load(t)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck).start()
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => y.getMessage +: msgs(y.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("RESTORED")), e.toString)
  }
}
