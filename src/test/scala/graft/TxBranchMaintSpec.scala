package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** BRANCH-SCOPED MAINTENANCE (r18): the bounded, non-checkpoint
  * materialization doors — [[TxLog.materializeEqDels]] and
  * [[TxLog.compactSmall]] — run UNDER [[TxLog.onBranch]]: their
  * rewrite manifests are branch-labeled data commits (no checkpoint,
  * no newest-wins metadata), so a long-lived staging branch can clear
  * its keyed debt and fold its commit dribble BEFORE publishing.
  * Checkpoint maintenance (compact/cluster), restore, vacuum and
  * global metadata stay main-lineage-only (their records would
  * clobber main at adoption). A branch that materialized its own debt
  * becomes MERGEABLE ([[TxLog.mergeBranch]] requires a debt-free
  * fork and a debt-free branch). */
class TxBranchMaintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txbmt_").resolve("t").toString

  private def build(): String = {
    val t = fresh()
    spark.range(4).select(col("id"), lit("a").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    spark.range(4, 8).select(col("id"), lit("b").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    TxLog.setProperties(spark, t,
      Map(TxLog.IsolationProp -> TxLog.IsolationWriteSerializable))
    t
  }

  private def rows(df: Option[org.apache.spark.sql.DataFrame]): Seq[(Long, String)] =
    df.map(_.select("id", "v").orderBy("id").as[(Long, String)].collect().toSeq)
      .getOrElse(Seq.empty)

  test("a staging branch materializes ITS keyed debt in place, becoming " +
      "mergeable; main never sees the debt or the materialization") {
    val t = build()
    TxLog.createBranch(spark, t, "stage")
    TxLog.onBranch("stage") {
      TxLog.upsertByKeys(Seq((0L, "Z"), (10L, "n")).toDF("id", "v"),
        t, Seq("id"), "sw", 0L)
      assert(TxLog.liveEqDelCount(spark, t) == 2L, "debt lives on the branch")
    }
    assert(TxLog.liveEqDelCount(spark, t) == 0L, "main carries no debt")
    // main diverges — a plain ff is off the table, and the merge
    // refuses while the branch still owes keys
    TxLog.commit(Seq((200L, "m")).toDF("id", "v").coalesce(1), t, "mw", 0L)
    val e = intercept[java.util.ConcurrentModificationException](
      TxLog.mergeBranch(spark, t, "stage"))
    assert(e.getMessage.contains("debt on the branch") &&
      e.getMessage.contains("materialize => true"), e.getMessage)
    // branch-scoped materialization clears the debt WITHOUT a checkpoint
    val r = TxLog.onBranch("stage") {
      val r0 = TxLog.materializeEqDels(spark, t)
      assert(TxLog.liveEqDelCount(spark, t) == 0L, "branch debt cleared")
      r0
    }
    assert(r.version > 0L)
    assert(TxLog.liveEqDelCount(spark, t) == 0L)
    assert(rows(TxLog.snapshot(spark, t)).map(_._1) == (0L to 7L) :+ 200L,
      "the materialization is invisible to main")
    // now the merge publishes the staged state
    TxLog.mergeBranch(spark, t, "stage")
    val got = rows(TxLog.snapshot(spark, t))
    assert(got.map(_._1) == (0L to 7L) ++ Seq(10L, 200L), got.toString)
    assert(got.toMap.apply(0L) == "Z")
  }

  test("a branch folds its commit dribble with compactSmall — bounded, " +
      "id-stable, invisible to main, adoptable by fast-forward") {
    val t = build()
    TxLog.createBranch(spark, t, "in")
    val preMain = rows(TxLog.snapshot(spark, t))
    TxLog.onBranch("in") {
      (0 until 3).foreach(i =>
        TxLog.commit(Seq((100L + i, "s")).toDF("id", "v").coalesce(1),
          t, "iw", i.toLong))
      val ids = TxLog.snapshotLineage(spark, t).get
        .select("_row_id", "id").as[(Long, Long)].collect().toMap
      val v = TxLog.compactSmall(spark, t, targetBytes = 1L << 30)
      assert(v > 0L, "branch-scoped compactSmall must fold the dribble")
      assert(TxLog.snapshotLineage(spark, t).get
        .select("_row_id", "id").as[(Long, Long)].collect().toMap == ids,
        "row identity pinned through the branch-scoped fold")
    }
    assert(rows(TxLog.snapshot(spark, t)) == preMain, "main untouched")
    TxLog.fastForward(spark, t, "in")
    assert(rows(TxLog.snapshot(spark, t)).map(_._1) ==
      (0L to 7L) ++ Seq(100L, 101L, 102L))
  }

  test("checkpoint maintenance and global metadata still refuse on a branch") {
    val t = build()
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      val e1 = intercept[IllegalArgumentException](TxLog.compact(spark, t))
      assert(e1.getMessage.contains("main-lineage"), e1.getMessage)
      val e2 = intercept[IllegalArgumentException](TxLog.vacuum(spark, t))
      assert(e2.getMessage.contains("main-lineage"), e2.getMessage)
    }
    TxLog.dropBranch(spark, t, "b")
  }
}
