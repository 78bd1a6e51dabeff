package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** The transactional commit protocol, attacked at every window the
  * direct-parquet sinks are documented to lose: crash between data
  * write and publish, replay after either outcome, concurrent
  * committers racing for version slots, compaction vs in-flight
  * readers, and orphan collection. */
class TxLogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txlog_").resolve("t").toString

  private def batch(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"row-$i")).toDF("id", "payload")
  }

  test("commit → snapshot roundtrip; versions increment; empty table reads as None") {
    val t = freshTable()
    assert(TxLog.snapshot(spark, t).isEmpty)
    assert(TxLog.headVersion(spark, t) == -1L)
    assert(TxLog.commit(batch(0 until 10), t, "w", 0L) == 0L)
    assert(TxLog.commit(batch(10 until 25), t, "w", 1L) == 1L)
    assert(TxLog.headVersion(spark, t) == 1L)
    val snap = TxLog.snapshot(spark, t).get
    assert(snap.count() == 25)
    assert(snap.agg(sum($"id")).first().getLong(0) == (0 until 25).sum.toLong)
  }

  test("reserved single-use writer prefixes are rejected at the public entry points") {
    // a user id like 'batch-nightly' would be silently dropped from
    // checkpoint token absorption → replays after vacuum re-commit and
    // duplicate (r11 ADVICE) — the namespace must fail loudly instead
    val t = freshTable()
    TxLog.commit(batch(0 until 5), t, "w", 0L)
    for (bad <- Seq("batch-nightly", "insert-x", "compact-me", "sql-delete-job")) {
      val e = intercept[IllegalArgumentException] {
        TxLog.commit(batch(0 until 5), t, bad, 1L)
      }
      assert(e.getMessage.contains("reserved"), s"$bad: ${e.getMessage}")
    }
    intercept[IllegalArgumentException] {
      TxLog.delete(spark, t, $"id" === 0L, "overwrite-now", 0L)
    }
    intercept[IllegalArgumentException] {
      TxLog.update(spark, t, $"id" === 0L, Map("payload" -> lit("x")), "cluster-z", 0L)
    }
    intercept[IllegalArgumentException] {
      TxLog.merge(batch(0 until 1), t, Seq("id"), "batch-m", 0L)
    }
    // the engine's own single-use paths (format writer, SQL DML) still work
    batch(5 until 8).write.format("txlog").mode("append").save(t)
    assert(TxLog.snapshot(spark, t).get.count() == 8)
  }

  test("non-deterministic DML predicates are rejected loudly (two-pass evaluation could diverge)") {
    val t = freshTable()
    TxLog.commit(batch(0 until 20), t, "w", 0L)
    val e = intercept[IllegalArgumentException] {
      TxLog.delete(spark, t, rand() < 0.5, "d", 0L)
    }
    assert(e.getMessage.contains("deterministic"), e.getMessage)
    intercept[IllegalArgumentException] {
      TxLog.update(spark, t, rand(42) < lit(0.5), Map("payload" -> lit("x")), "u", 0L)
    }
    assert(TxLog.snapshot(spark, t).get.count() == 20, "rejected DML mutated the table")
    // deterministic predicates still pass through unchanged
    assert(TxLog.delete(spark, t, $"id" < 5L, "d", 1L).version == 1L)
    assert(TxLog.snapshot(spark, t).get.count() == 15)
  }

  test("merge into an EMPTIED table still validates against the recorded schema") {
    val t = freshTable()
    TxLog.commit(batch(0 until 10), t, "w", 0L)
    TxLog.delete(spark, t, lit(true), "d", 0L) // live set now empty, schema recorded
    // mis-shaped source: must be loud, not a silent schema redefinition
    val bad = Seq((1L, 2L)).toDF("id", "other")
    val e = intercept[IllegalArgumentException] {
      TxLog.merge(bad, t, Seq("id"), "m", 0L)
    }
    assert(e.getMessage.contains("columns"), e.getMessage)
    // right-shaped source (any column order) appends under the recorded schema
    val ok = Seq(("p-1", 1L)).toDF("payload", "id")
    TxLog.merge(ok, t, Seq("id"), "m", 1L)
    val snap = TxLog.snapshot(spark, t).get
    assert(snap.columns.toSeq == Seq("id", "payload"), "column order not table order")
    assert(snap.count() == 1)
  }

  test("empty-but-known tables: tableSchema reads the manifest DDL; the source serves an empty relation") {
    val t = freshTable()
    TxLog.commit(batch(0 until 10), t, "w", 0L)
    TxLog.delete(spark, t, lit(true), "d", 0L)
    assert(TxLog.snapshot(spark, t).isEmpty, "live set should be empty")
    val sch = TxLog.tableSchema(spark, t)
    assert(sch.map(_.fieldNames.toSeq).contains(Seq("id", "payload")))
    val df = spark.read.format("txlog").load(t)
    assert(df.schema.fieldNames.toSeq == Seq("id", "payload"))
    assert(df.count() == 0L)
  }

  test("data files without a manifest are invisible — the FileOutputCommitter window closed") {
    val t = freshTable()
    TxLog.commit(batch(0 until 10), t, "w", 0L)
    // a writer that crashed after its data write but before the
    // manifest publish: files on disk, no manifest names them
    batch(100 until 200).write.parquet(s"$t/data/crashed-attempt")
    val snap = TxLog.snapshot(spark, t).get
    assert(snap.count() == 10, "uncommitted files leaked into the snapshot")
    assert(snap.filter($"id" >= 100).count() == 0)
  }

  test("replay with the same (writer, batch) token is exactly-once under BOTH crash windows") {
    val t = freshTable()
    // window 1: crash after data write, before publish → replay commits
    batch(0 until 10).write.parquet(s"$t/data/orphan-of-attempt-1")
    assert(TxLog.commit(batch(0 until 10), t, "loader", 7L) == 0L)
    assert(TxLog.snapshot(spark, t).get.count() == 10)
    // window 2: crash after publish → replay is a no-op
    assert(TxLog.commit(batch(0 until 10), t, "loader", 7L) == -1L)
    assert(TxLog.snapshot(spark, t).get.count() == 10, "replayed batch duplicated rows")
    assert(TxLog.headVersion(spark, t) == 0L)
  }

  test("concurrent committers: every commit lands in its own version, no lost updates") {
    val t = freshTable()
    val perWriter = 6
    val threads = (0 until 2).map { w =>
      new Thread(() => {
        (0 until perWriter).foreach { b =>
          TxLog.commit(batch(w * 1000 + b * 10 until (w * 1000 + b * 10 + 10)),
            t, s"writer-$w", b.toLong)
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // all 12 transactions committed, versions contiguous 0..11 —
    // put-if-absent arbitration must never overwrite a committed slot
    assert(TxLog.headVersion(spark, t) == 2L * perWriter - 1)
    val snap = TxLog.snapshot(spark, t).get
    assert(snap.count() == 2L * perWriter * 10)
    assert(snap.select($"id").distinct().count() == 2L * perWriter * 10,
      "a committed transaction was overwritten by a racing writer")
  }

  test("twin writers with the SAME token (zombie replay): the batch commits exactly once") {
    // the TOCTOU regression: token check and head version must come
    // from ONE log listing, or a zombie publishing between them lets
    // its twin land the same token in the next slot
    val t = freshTable()
    val races = 5
    (0 until races).foreach { b =>
      val threads = (0 until 2).map { _ =>
        new Thread(() => { TxLog.commit(batch(b * 10 until (b * 10 + 10)), t, "zombie-pair", b.toLong); () })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
    }
    val snap = TxLog.snapshot(spark, t).get
    assert(snap.count() == races * 10L, "a same-token twin double-committed its batch")
    assert(snap.select($"id").distinct().count() == races * 10L)
    assert(TxLog.headVersion(spark, t) == races - 1L,
      s"expected exactly $races committed manifests")
  }

  test("vacuum collects a crashed writer's orphan even with a nested _temporary subtree") {
    val t = freshTable()
    TxLog.commit(batch(0 until 10), t, "w", 0L)
    // the FileOutputCommitter staging shape a mid-write crash leaves:
    // a non-empty nested directory inside the orphan dir
    val staging = java.nio.file.Paths.get(t, "data", "crashed", "_temporary", "0")
    Files.createDirectories(staging)
    Files.writeString(staging.resolve("part-stub"), "partial")
    val deleted = TxLog.vacuum(spark, t, minAgeMs = 0L)
    assert(deleted > 0, "vacuum skipped the orphan")
    assert(!Files.exists(java.nio.file.Paths.get(t, "data", "crashed")),
      "orphan dir with committer staging survived vacuum")
    assert(TxLog.snapshot(spark, t).get.count() == 10)
  }

  test("compact: checkpoint replaces the read set atomically; pinned readers survive until vacuum") {
    val t = freshTable()
    (0 until 8).foreach(b => TxLog.commit(batch(b * 10 until (b * 10 + 10)), t, "w", b.toLong))
    val pinned = TxLog.snapshot(spark, t).get
    val before = pinned.agg(sum($"id")).first().getLong(0)
    val cpVersion = TxLog.compact(spark, t, targetBytes = 1L << 30)
    assert(cpVersion == 8L)
    // new snapshots read the compacted generation — row-identical
    val after = TxLog.snapshot(spark, t).get
    assert(after.count() == 80 && after.agg(sum($"id")).first().getLong(0) == before)
    // the pre-compaction snapshot still reads (its files not deleted)
    assert(pinned.count() == 80)
    // appends continue on top of the checkpoint
    TxLog.commit(batch(900 until 910), t, "w", 100L)
    assert(TxLog.snapshot(spark, t).get.count() == 90)
  }

  test("vacuum collects crash orphans and compacted-away generations, never live files") {
    val t = freshTable()
    (0 until 4).foreach(b => TxLog.commit(batch(b * 10 until (b * 10 + 10)), t, "w", b.toLong))
    batch(0 until 5).write.parquet(s"$t/data/crashed") // orphan
    TxLog.compact(spark, t, targetBytes = 1L << 30)
    val deleted = TxLog.vacuum(spark, t, minAgeMs = 0L)
    assert(deleted > 0, "vacuum found nothing — orphans/old generations kept forever")
    val snap = TxLog.snapshot(spark, t).get
    assert(snap.count() == 40, "vacuum deleted live data")
    // a second vacuum is a no-op — nothing live was touched
    assert(TxLog.vacuum(spark, t, minAgeMs = 0L) == 0)
  }

  test("time travel: snapshotAt(v) reads each historical version; pre-checkpoint history survives until vacuum") {
    val t = freshTable()
    (0 until 4).foreach(b => TxLog.commit(batch(b * 10 until (b * 10 + 10)), t, "w", b.toLong))
    // each version is its own prefix of the history
    (0 until 4).foreach { v =>
      val snap = TxLog.snapshotAt(spark, t, v.toLong).get
      assert(snap.count() == (v + 1) * 10L, s"version $v wrong row count")
      assert(snap.agg(max($"id")).first().getLong(0) == v * 10L + 9)
    }
    // a checkpoint rewrites the read set but not the history: v1 still
    // reads the original generation's files
    TxLog.compact(spark, t, targetBytes = 1L << 30)
    assert(TxLog.snapshotAt(spark, t, 1L).get.count() == 20)
    // the checkpoint version itself reads the full compacted set
    assert(TxLog.snapshotAt(spark, t, 4L).get.count() == 40)
    // beyond-head is loud, not silently empty
    intercept[IllegalArgumentException] { TxLog.snapshotAt(spark, t, 99L) }
  }

  test("compact rebases a concurrent APPEND instead of dropping it (lost-update guard)") {
    val t = freshTable()
    TxLog.commit(batch(0 until 20), t, "w", 0L)
    TxLog.commit(batch(20 until 40), t, "w", 1L)
    // an append lands AFTER compact read its snapshot but BEFORE it
    // publishes: the checkpoint must carry the append's files verbatim
    val v = TxLog.compact(spark, t, targetBytes = 1L << 30,
      beforeCommit = () => { TxLog.commit(batch(40 until 50), t, "sneak", 0L); () })
    assert(v == 3L)
    val snap = TxLog.snapshot(spark, t).get
    assert(snap.count() == 50, "compact dropped the concurrent append's rows")
    // the sneaked append's token survived the checkpoint (its manifest
    // sits below it in the log), so an at-least-once replay still skips
    assert(TxLog.commit(batch(40 until 50), t, "sneak", 0L) == -1L)
    assert(TxLog.snapshot(spark, t).get.count() == 50)
    // and the rebased files' zone maps came along: a probe into the
    // sneaked range prunes to its one file
    assert(TxLog.pruneCount(spark, t, col("id") === 45L)._1 == 1)
  }

  test("compact conflicts loudly on a concurrent DML rewrite or checkpoint (no silent merge)") {
    val t = freshTable()
    TxLog.commit(batch(0 until 20).coalesce(1), t, "w", 0L)
    TxLog.commit(batch(20 until 40).coalesce(1), t, "w", 1L)
    intercept[java.util.ConcurrentModificationException] {
      TxLog.compact(spark, t, targetBytes = 1L << 30,
        beforeCommit = () => { TxLog.delete(spark, t, col("id") === 5L, "d", 0L); () })
    }
    // the delete won; the failed compaction left no checkpoint and its
    // staged rewrite is vacuum garbage
    assert(TxLog.snapshot(spark, t).get.count() == 39)
    assert(TxLog.vacuum(spark, t, minAgeMs = 0L) >= 1)
    assert(TxLog.snapshot(spark, t).get.count() == 39)
  }

  test("log truncation: checkpoints absorb tokens, vacuum deletes pre-checkpoint manifests, exactly-once survives") {
    val t = freshTable()
    (0 until 8).foreach(b => TxLog.commit(batch(b * 10 until (b + 1) * 10), t, "w", b.toLong))
    TxLog.compact(spark, t, targetBytes = 1L << 30) // v8, absorbs tokens w/0..w/7
    TxLog.commit(batch(80 until 90), t, "w", 8L)    // post-checkpoint append
    val logDir = java.nio.file.Paths.get(t, "_txlog")
    def manifestCount = java.nio.file.Files.list(logDir)
      .filter(p => p.getFileName.toString.endsWith(".json")).count()
    assert(manifestCount == 10)
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    // only the checkpoint and the post-checkpoint append remain: the
    // per-commit listing is now O(commits since checkpoint), not O(all)
    assert(manifestCount == 2, s"log not truncated: $manifestCount manifests")
    assert(TxLog.snapshot(spark, t).get.count() == 90)
    // the truncated manifests' tokens still dedupe replays (absorbed)
    (0 until 9).foreach { b =>
      assert(TxLog.commit(batch(0 until 1), t, "w", b.toLong) == -1L,
        s"replay of truncated batch $b was not deduped")
    }
    assert(TxLog.snapshot(spark, t).get.count() == 90)
    // time travel below the checkpoint is loud, not silently empty
    intercept[IllegalArgumentException] { TxLog.snapshotAt(spark, t, 3L) }
    // and young manifests are protected by the retention window
    val t2 = freshTable()
    TxLog.commit(batch(0 until 10), t2, "w", 0L)
    TxLog.compact(spark, t2, targetBytes = 1L << 30)
    val before = java.nio.file.Files.list(java.nio.file.Paths.get(t2, "_txlog")).count()
    TxLog.vacuum(spark, t2, minAgeMs = 3600_000L)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(t2, "_txlog")).count() == before,
      "vacuum truncated manifests younger than the retention window")
  }

  test("log truncation is all-or-nothing: a half-aged below-checkpoint log is left intact") {
    // aging only SOME below-checkpoint manifests past retention must not
    // truncate them: the surviving suffix would replay as if it were the
    // whole history and time travel would be silently wrong
    val t = freshTable()
    (0 until 4).foreach(b => TxLog.commit(batch(b * 10 until (b + 1) * 10), t, "w", b.toLong))
    TxLog.compact(spark, t, targetBytes = 1L << 30) // v4
    val logDir = java.nio.file.Paths.get(t, "_txlog")
    val old = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() - 48L * 3600 * 1000)
    Seq(0L, 1L).foreach { v => // age only v0, v1
      java.nio.file.Files.setLastModifiedTime(
        logDir.resolve(f"v$v%020d.json"), old)
    }
    TxLog.vacuum(spark, t, minAgeMs = 24L * 3600 * 1000)
    assert(java.nio.file.Files.list(logDir).count() == 5,
      "partial truncation happened — time travel to v2/v3 would replay an incomplete log")
    assert(TxLog.snapshotAt(spark, t, 3L).get.count() == 40)
    // once EVERY below-checkpoint manifest is aged, truncation proceeds
    Seq(2L, 3L).foreach { v =>
      java.nio.file.Files.setLastModifiedTime(logDir.resolve(f"v$v%020d.json"), old)
    }
    TxLog.vacuum(spark, t, minAgeMs = 24L * 3600 * 1000)
    assert(java.nio.file.Files.list(logDir).count() == 1)
    assert(TxLog.snapshot(spark, t).get.count() == 40)
  }

  test("retention window: young unreferenced files survive vacuum (in-flight writer protection)") {
    val t = freshTable()
    TxLog.commit(batch(0 until 10), t, "w", 0L)
    batch(50 until 60).write.parquet(s"$t/data/in-flight-attempt")
    assert(TxLog.vacuum(spark, t, minAgeMs = 3600_000L) == 0,
      "vacuum deleted files younger than the retention window")
  }
}
