package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** Same-table MULTI-STATEMENT transactions (r20,
  * [[TxLog.transaction]]): `BEGIN … COMMIT` as an anonymous branch —
  * statements stage invisibly, reads inside the body see the staged
  * state (read-your-writes), COMMIT publishes atomically (adoption on
  * a quiet main, the writeSerializable net-delta rebase past a moved
  * one), and every failure path rolls back to an untouched main. */
class TxTransactionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txtxn_").resolve("t").toString

  private def build(ws: Boolean = true, feed: Boolean = false): String = {
    val t = fresh()
    spark.range(8).select(col("id"), lit("a").as("v"))
      .coalesce(2).write.format("txlog").mode("append").save(t)
    val props =
      (if (ws) Map(TxLog.IsolationProp -> TxLog.IsolationWriteSerializable)
       else Map.empty[String, String]) ++
      (if (feed) Map(TxLog.ChangeFeedProp -> "true",
        graft.storage.TxEqDel.MaxKeysProp -> "100000") else Map.empty)
    if (props.nonEmpty) TxLog.setProperties(spark, t, props)
    t
  }

  private def ids(t: String): Seq[Long] =
    TxLog.snapshot(spark, t).get.select("id").orderBy("id")
      .as[Long].collect().toSeq

  test("multi-statement commit is atomic: no intermediate state is ever " +
      "live on main, and the pre-commit head still serves the old state") {
    val t = build()
    val pre = TxLog.headVersion(spark, t)
    val (v, _) = TxLog.transaction(spark, t) {
      TxLog.delete(spark, t, col("id") < 2L, "txd", 0L)
      TxLog.commit(Seq((100L, "n"), (101L, "n")).toDF("id", "v")
        .coalesce(1), t, "txw", 0L)
      TxLog.upsertByKeys(Seq((5L, "U")).toDF("id", "v"), t, Seq("id"), "txu", 0L)
    }
    assert(v > pre)
    assert(ids(t) == Seq(2L, 3L, 4L, 5L, 6L, 7L, 100L, 101L))
    assert(TxLog.snapshot(spark, t).get.where(col("id") === 5L)
      .select("v").as[String].collect().toSeq == Seq("U"))
    assert(TxLog.branches(spark, t).isEmpty, "the txn branch must resolve")
    // time travel to the pre-txn head: the OLD state, all 8 rows
    assert(TxLog.snapshotAt(spark, t, pre).get.count() == 8L)
  }

  test("read-your-writes: statements inside the body see earlier staged " +
      "statements; main readers meanwhile see nothing") {
    val t = build()
    var seenInside: Seq[Long] = Seq.empty
    val (_, _) = TxLog.transaction(spark, t) {
      TxLog.delete(spark, t, col("id") >= 4L, "txd", 0L)
      seenInside = TxLog.snapshot(spark, t).get.select("id")
        .orderBy("id").as[Long].collect().toSeq
      TxLog.commit(Seq((50L, "n")).toDF("id", "v").coalesce(1), t, "txw", 0L)
    }
    assert(seenInside == Seq(0L, 1L, 2L, 3L),
      s"the body must read its own staged state: $seenInside")
    assert(ids(t) == Seq(0L, 1L, 2L, 3L, 50L))
  }

  test("rollback on body failure: main untouched, no branch left, the " +
      "staged manifests are foreign history") {
    val t = build()
    val before = ids(t)
    val e = intercept[RuntimeException] {
      TxLog.transaction(spark, t) {
        TxLog.delete(spark, t, col("id") < 4L, "txd", 0L)
        throw new RuntimeException("boom")
      }
    }
    assert(e.getMessage == "boom")
    assert(ids(t) == before, "a failed txn must change nothing")
    assert(TxLog.branches(spark, t).isEmpty)
  }

  test("optimistic abort: a SERIALIZABLE table refuses to commit past a " +
      "main moved mid-transaction; main keeps the interleaved write only") {
    val t = build(ws = false) // serializable (default isolation)
    val e = intercept[IllegalArgumentException] {
      TxLog.transaction(spark, t, beforeCommit = () => {
        TxLog.commit(Seq((200L, "m")).toDF("id", "v").coalesce(1), t, "mw", 0L)
        ()
      }) {
        TxLog.delete(spark, t, col("id") < 2L, "txd", 0L)
        ()
      }
    }
    assert(e.getMessage.contains("writeSerializable"), e.getMessage)
    assert(ids(t) == (0L to 7L) :+ 200L, "main keeps only the interleave")
    assert(TxLog.branches(spark, t).isEmpty, "the aborted txn rolls back")
  }

  test("writeSerializable: a txn REBASES past a footprint-disjoint main " +
      "commit as one net-delta version; its CDF delta is the txn's net") {
    val t = build(feed = true)
    val (v, _) = TxLog.transaction(spark, t, beforeCommit = () => {
      TxLog.commit(Seq((200L, "m")).toDF("id", "v").coalesce(1), t, "mw", 0L)
      ()
    }) {
      // churn: stage then delete inside the SAME txn — must cancel
      TxLog.commit(Seq((300L, "tmp")).toDF("id", "v").coalesce(1), t, "txw", 0L)
      TxLog.delete(spark, t, col("v") === "tmp", "txd", 0L)
      TxLog.delete(spark, t, col("id") === 0L, "txd", 1L)
      TxLog.commit(Seq((100L, "n")).toDF("id", "v").coalesce(1), t, "txw", 1L)
    }
    assert(ids(t) == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 100L, 200L))
    val delta = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", v.toString).load(t)
      .select("_change_type", "id").as[(String, Long)].collect().toSeq.sorted
    assert(delta == Seq(("delete", 0L), ("insert", 100L)),
      s"one version, net delta only (churn cancels): $delta")
  }

  test("empty transaction publishes nothing and returns the head") {
    val t = build()
    val pre = TxLog.headVersion(spark, t)
    val (v, out) = TxLog.transaction(spark, t) { 42 }
    assert(out == 42)
    assert(TxLog.headVersion(spark, t) == pre ||
      // dropBranch of the txn branch is a props commit; the DATA state
      // must be byte-identical either way
      ids(t) == (0L to 7L).toSeq)
    assert(v >= pre && TxLog.branches(spark, t).isEmpty)
  }

  test("keyed debt staged inside a txn auto-materializes at commit when " +
      "the publish must REBASE past a diverged main (no user seam exists)") {
    val t = build(feed = true)
    val (v, _) = TxLog.transaction(spark, t, beforeCommit = () => {
      TxLog.commit(Seq((200L, "m")).toDF("id", "v").coalesce(1), t, "mw", 0L)
      ()
    }) {
      TxLog.upsertByKeys(Seq((5L, "U"), (300L, "n")).toDF("id", "v"),
        t, Seq("id"), "txu", 0L)
      ()
    }
    assert(ids(t) == Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L, 7L, 200L, 300L))
    assert(TxLog.snapshot(spark, t).get.where(col("id") === 5L)
      .select("v").as[String].collect().toSeq == Seq("U"))
    val delta = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", v.toString).load(t)
      .select("_change_type", "id", "v").as[(String, Long, String)]
      .collect().toSeq.sorted
    assert(delta == Seq(("delete", 5L, "a"), ("insert", 5L, "U"),
      ("insert", 300L, "n")), delta.toString)
  }

  test("exactly-once survives the txn: a statement's writer token replayed " +
      "after commit is a no-op (tokens adopt/absorb through the publish)") {
    val t = build()
    TxLog.transaction(spark, t) {
      TxLog.commit(Seq((100L, "n")).toDF("id", "v").coalesce(1), t, "txw", 7L)
    }
    assert(TxLog.commit(Seq((999L, "x")).toDF("id", "v"), t, "txw", 7L) == -1L,
      "the txn writer's token must survive the publish")
  }
}
