package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** Stream admission control for the txlog source: the
  * `maxVersionsPerTrigger` reader option bounds how many log versions
  * one micro-batch covers (a lagging restart catches up in bounded
  * plans, not one giant batch), and `Trigger.AvailableNow` drains to
  * the head observed at query start then TERMINATES — the scheduled
  * batch-drain mode — on both the plain tail and the change feed. */
class TxAdmissionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txadm_").resolve("t").toString

  private def batch(ids: Range, grp: String): DataFrame =
    ids.map(i => (i.toLong, grp, s"name-$i")).toDF("id", "grp", "name")

  /** 4 single-file appends (v0..v3), 100 rows each. */
  private def t4(): String = {
    val t = freshTable()
    (0 until 4).foreach(i =>
      TxLog.commit(batch(i * 100 until (i + 1) * 100, s"g$i").coalesce(1), t, "w", i.toLong))
    t
  }

  test("maxVersionsPerTrigger bounds each micro-batch to that many versions") {
    val t = t4()
    val out = Files.createTempDirectory("txadm_out_").toString
    val ck = Files.createTempDirectory("txadm_ck_").toString
    val q = spark.readStream.format("txlog")
      .option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1").load(t)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck).start()
    try q.processAllAvailable() finally q.stop()
    assert(spark.read.parquet(out).count() == 400)
    // 4 versions at 1/trigger -> at least 4 non-empty micro-batches
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 4, s"got ${batches.length} non-empty batches")
    assert(batches.forall(_.numInputRows <= 100),
      "one version (100 rows) per batch at most")
  }

  test("Trigger.AvailableNow drains to the prepared head and terminates") {
    val t = t4()
    val out = Files.createTempDirectory("txadm_out2_").toString
    val ck = Files.createTempDirectory("txadm_ck2_").toString
    val q = spark.readStream.format("txlog")
      .option("maxVersionsPerTrigger", "2").load(t)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000), "AvailableNow must terminate on its own")
    assert(spark.read.parquet(out).count() == 400)
    // a second AvailableNow run on the same checkpoint picks up ONLY
    // what committed after the first drain
    TxLog.commit(batch(400 until 450, "late").coalesce(1), t, "w", 9L)
    val q2 = spark.readStream.format("txlog")
      .option("maxVersionsPerTrigger", "2").load(t)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    assert(q2.awaitTermination(120000))
    assert(spark.read.parquet(out).count() == 450)
  }

  test("the change feed honors maxVersionsPerTrigger and AvailableNow too") {
    val t = freshTable()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    (0 until 3).foreach(i =>
      TxLog.commit(batch(i * 100 until (i + 1) * 100, s"g$i").coalesce(1), t, "w", i.toLong))
    TxLog.delete(spark, t, $"id" < 50L, "del", 0L)
    val out = Files.createTempDirectory("txadm_out3_").toString
    val ck = Files.createTempDirectory("txadm_ck3_").toString
    val q = spark.readStream.format("txlog")
      .option("readChangeFeed", "true").option("startingVersion", "0")
      .option("maxVersionsPerTrigger", "1").load(t)
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(120000))
    val got = spark.read.parquet(out)
    assert(got.where($"_change_type" === "insert").count() == 300)
    assert(got.where($"_change_type" === "delete").count() == 50)
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length >= 4, s"got ${batches.length} non-empty batches")
  }

  test("junk maxVersionsPerTrigger is loud") {
    val t = t4()
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => Option(y.getMessage).toSeq ++ msgs(y.getCause))
    for (bad <- Seq("0", "-3", "many")) {
      val e = intercept[Exception] {
        spark.readStream.format("txlog")
          .option("maxVersionsPerTrigger", bad).load(t)
          .writeStream.format("noop").start().processAllAvailable()
      }
      assert(msgs(e).exists(_.contains("maxVersionsPerTrigger")), s"$bad: $e")
    }
  }
}
