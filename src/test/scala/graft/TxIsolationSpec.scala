package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** WRITE-SERIALIZABLE isolation (the `isolation` table property):
  * row-level rewrites REBASE over concurrent commits whose write-set
  * is provably disjoint from the rewrite's read footprint — pure
  * appends, property commits, and DML that touched OTHER files —
  * instead of conflicting. The semantics follow the public
  * write-serializable contract (the rewrite serializes BEFORE the
  * commits it rebased over): writes stay serializable; the accepted
  * anomaly is that a blind append racing a DELETE can land rows the
  * predicate would have matched. Checkpoints and overlapping-file DML
  * still conflict — there is no serial order that makes both right.
  *
  * Every test drives the race through `beforeCommit` (the interleave
  * seam between stage and publish), the same injection the
  * serializable specs use, so the two isolation levels are compared on
  * identical schedules. */
class TxIsolationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txiso_").resolve("t").toString

  private def batch(ids: Range, grp: String): DataFrame =
    ids.map(i => (i.toLong, grp, s"name-$i")).toDF("id", "grp", "name")

  /** Three single-file commits with disjoint id ranges under
    * writeSerializable, so zone maps make per-file footprints
    * observable. */
  private def ws3(): String = {
    val t = freshTable()
    TxLog.setProperties(spark, t,
      Map(TxLog.IsolationProp -> TxLog.IsolationWriteSerializable))
    TxLog.commit(batch(0 until 100, "alpha").coalesce(1), t, "w", 0L)
    TxLog.commit(batch(100 until 200, "beta").coalesce(1), t, "w", 1L)
    TxLog.commit(batch(200 until 300, "gamma").coalesce(1), t, "w", 2L)
    t
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("setProperties rejects an unknown isolation level loudly") {
    val t = freshTable()
    val e = intercept[IllegalArgumentException] {
      TxLog.setProperties(spark, t, Map(TxLog.IsolationProp -> "snapshot"))
    }
    assert(e.getMessage.contains("writeSerializable"))
  }

  test("delete rebases over a concurrent blind append; both commits' rows are right") {
    val t = ws3()
    val sneak = batch(300 until 310, "sneak").coalesce(1)
    val r = TxLog.delete(spark, t, $"id" >= 150L && $"id" < 160L, "del", 0L,
      beforeCommit = () => { TxLog.commit(sneak, t, "sneaker", 0L); () })
    // the append took v4 (head was v3); the rebased delete landed at v5
    assert(r.version == 5L)
    val got = TxLog.snapshot(spark, t).get
    assert(got.count() == 300, "290 survivors + 10 appended")
    assert(got.where($"id" >= 150L && $"id" < 160L).count() == 0)
    assert(got.where($"grp" === "sneak").count() == 10)
    // exactly-once: the delete's token is in the log — a replay no-ops
    assert(TxLog.delete(spark, t, $"id" >= 150L && $"id" < 160L, "del", 0L)
      == TxLog.Rewrite(-1L, 0, 0))
    // and time travel still serves the pre-race snapshot
    assert(TxLog.snapshotAt(spark, t, 3L).get.count() == 300)
  }

  test("two DMLs on disjoint files both land; overlapping files still conflict") {
    val t = ws3()
    // outer delete touches the beta file; injected update touches gamma
    val r = TxLog.delete(spark, t, $"id" >= 150L && $"id" < 160L, "del", 0L,
      beforeCommit = () => {
        TxLog.update(spark, t, $"id" === 250L,
          Map("grp" -> lit("patched")), "upd", 0L); ()
      })
    assert(r.version == 5L, "update took v4, rebased delete landed at v5")
    val got = TxLog.snapshot(spark, t).get
    assert(got.count() == 290)
    assert(rows(got.where($"id" === 250L).select($"grp")) == Seq("[patched]"))
    // overlapping: an injected delete in the SAME file the outer delete
    // read is a lost-update hazard — loud conflict, inner result intact
    val e = intercept[java.util.ConcurrentModificationException] {
      TxLog.delete(spark, t, $"id" === 120L, "del", 1L,
        beforeCommit = () => { TxLog.delete(spark, t, $"id" === 121L, "rival", 0L); () })
    }
    assert(e.getMessage.contains("rewritten"))
    val after = TxLog.snapshot(spark, t).get
    assert(after.where($"id" === 121L).count() == 0, "the rival's delete won")
    assert(after.where($"id" === 120L).count() == 1, "the conflicted delete left no trace")
  }

  test("a concurrent checkpoint (compact) still conflicts a rewrite") {
    val t = ws3()
    val e = intercept[java.util.ConcurrentModificationException] {
      TxLog.delete(spark, t, $"id" === 5L, "del", 0L,
        beforeCommit = () => { TxLog.compact(spark, t, targetBytes = 1L << 30); () })
    }
    assert(e.getMessage.contains("checkpoint"))
    assert(TxLog.snapshot(spark, t).get.count() == 300, "nothing deleted")
    // the re-run on the compacted snapshot succeeds
    assert(TxLog.delete(spark, t, $"id" === 5L, "del", 1L).removedFiles == 1)
    assert(TxLog.snapshot(spark, t).get.count() == 299)
  }

  test("the default stays serializable: the same schedule conflicts without the property") {
    val t = freshTable()
    TxLog.commit(batch(0 until 100, "alpha").coalesce(1), t, "w", 0L)
    val sneak = batch(300 until 310, "sneak").coalesce(1)
    intercept[java.util.ConcurrentModificationException] {
      TxLog.delete(spark, t, $"id" < 10L, "del", 0L,
        beforeCommit = () => { TxLog.commit(sneak, t, "sneaker", 0L); () })
    }
    // flipping the property turns the identical race into a rebase
    TxLog.setProperties(spark, t,
      Map(TxLog.IsolationProp -> TxLog.IsolationWriteSerializable))
    val sneak2 = batch(310 until 320, "sneak2").coalesce(1)
    val r = TxLog.delete(spark, t, $"id" < 10L, "del", 1L,
      beforeCommit = () => { TxLog.commit(sneak2, t, "sneaker", 1L); () })
    assert(r.removedFiles == 1)
    assert(TxLog.snapshot(spark, t).get.count() == 100 + 10 + 10 - 10)
  }

  test("a rebased rewrite folds in the schema a concurrent append evolved") {
    val t = ws3()
    val widened = (400 until 410)
      .map(i => (i.toLong, "wide", s"name-$i",
        java.lang.Double.valueOf(i * 2.0))) // boxed → nullable, as evolution requires
      .toDF("id", "grp", "name", "extra").coalesce(1)
    val r = TxLog.delete(spark, t, $"id" >= 150L && $"id" < 160L, "del", 0L,
      beforeCommit = () => { TxLog.commit(widened, t, "wide", 0L); () })
    assert(r.version == 5L)
    val got = TxLog.snapshot(spark, t).get
    assert(got.columns.toSeq == Seq("id", "grp", "name", "extra"),
      "the rewrite's recorded DDL must not revert the append's evolution")
    assert(got.where($"grp" === "wide" && $"extra".isNotNull).count() == 10)
    assert(got.where($"grp" =!= "wide" && $"extra".isNull).count() == 290,
      "pre-evolution rows backfill null through the merged schema")
  }

  test("change capture of a rebased rewrite lands at the rebased version, exactly once") {
    val t = freshTable()
    TxLog.setProperties(spark, t,
      Map(TxLog.IsolationProp -> TxLog.IsolationWriteSerializable,
        TxLog.ChangeFeedProp -> "true"))
    TxLog.commit(batch(0 until 100, "alpha").coalesce(1), t, "w", 0L)
    val sneak = batch(300 until 310, "sneak").coalesce(1)
    val r = TxLog.delete(spark, t, $"id" < 10L, "del", 0L,
      beforeCommit = () => { TxLog.commit(sneak, t, "sneaker", 0L); () })
    assert(r.version == 3L, "append v2, rebased delete v3")
    val feed = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", "3").option("endingVersion", "3").load(t)
    assert(feed.where($"_change_type" === "delete").count() == 10)
    assert(feed.where($"_change_type" === "insert").count() == 0)
  }

  test("merge vs concurrent same-key append: the documented write-serializable anomaly") {
    val t = ws3()
    // the merge decides id=500 is new; the racing append blindly adds
    // its own id=500 row. Serial order merge-then-append produces BOTH
    // rows — exactly what the rebase commits. This test pins the
    // anomaly as contract, not accident.
    val src = Seq((500L, "merged", "name-500")).toDF("id", "grp", "name")
    val rival = Seq((500L, "appended", "name-500")).toDF("id", "grp", "name").coalesce(1)
    val r = TxLog.merge(src, t, Seq("id"), "mrg", 0L,
      beforeCommit = () => { TxLog.commit(rival, t, "rival", 0L); () })
    assert(r.version == 5L)
    val got = TxLog.snapshot(spark, t).get.where($"id" === 500L)
    assert(got.count() == 2, "merge-before-append serial order keeps both rows")
  }
}
