package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** The r20 bounded three-way ROW merge ([[TxLog.mergeBranch]] /
  * resolveRowMerge): when main's divergent commits and the branch
  * touched the SAME fork file, provably row-disjoint edits resolve at
  * row granularity — DV-vs-DV unions disjoint position deltas,
  * DV-vs-rewrite re-addresses the disjoint deleted `_row_id`s into the
  * surviving lineage's files — while genuinely overlapping rows and
  * rewrite-vs-rewrite keep refusing. Also pins the r20 UDF-free
  * per-file lookup's broadcast-join path (maps past the literal
  * threshold) on the library read surface. */
class TxRowMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txrm_").resolve("t").toString

  private def ids(t: String): Seq[Long] =
    TxLog.snapshot(spark, t).get.select("id").orderBy("id")
      .as[Long].collect().toSeq

  /** writeSerializable table, two files: ids 0..3 ("a"), 4..7 ("b") */
  private def build(mor: Boolean = false, feed: Boolean = false): String = {
    val t = fresh()
    spark.range(4).select(col("id"), lit("a").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    spark.range(4, 8).select(col("id"), lit("b").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    val props = Map(TxLog.IsolationProp -> TxLog.IsolationWriteSerializable) ++
      (if (mor) Map(TxLog.DmlModeProp -> TxLog.DmlModeMor) else Map.empty) ++
      (if (feed) Map(TxLog.ChangeFeedProp -> "true") else Map.empty)
    TxLog.setProperties(spark, t, props)
    t
  }

  test("DV vs DV on one file: disjoint position deltas union; both " +
      "lineages' deletes survive the merge") {
    val t = build(mor = true)
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L) // DV pos 0, file 1
      ()
    }
    TxLog.delete(spark, t, col("id") === 1L, "md", 0L) // DV pos 1, SAME file
    val v = TxLog.mergeBranch(spark, t, "b")
    assert(v > 0L)
    assert(ids(t) == Seq(2L, 3L, 4L, 5L, 6L, 7L),
      "the merged vector must carry BOTH deltas")
    assert(TxLog.branches(spark, t).isEmpty)
  }

  test("DV vs DV full cover: the union covering every row removes the " +
      "file outright (no-full-file-DV contract)") {
    val t = build(mor = true)
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L || col("id") === 2L, "bd", 0L)
      ()
    }
    TxLog.delete(spark, t, col("id") === 1L || col("id") === 3L, "md", 0L)
    TxLog.mergeBranch(spark, t, "b")
    assert(ids(t) == Seq(4L, 5L, 6L, 7L))
    // the merge REMOVED the fully-covered file instead of publishing a
    // full-file vector: its manifest carries no dv entry at all
    val merge = new java.io.File(t, "_txlog").listFiles()
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
      .find(_.contains("branch-merge-")).get
    assert(!merge.contains("\"dvs\""), merge)
    assert(merge.contains("\"removes\": [\""), merge)
  }

  test("DV vs DV overlapping row refuses loudly") {
    val t = build(mor = true)
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L)
      ()
    }
    TxLog.delete(spark, t, col("id") === 0L, "md", 0L) // same row!
    val e = intercept[java.util.ConcurrentModificationException](
      TxLog.mergeBranch(spark, t, "b"))
    assert(e.getMessage.contains("deleted the same row"), e.getMessage)
    assert(TxLog.branches(spark, t).contains("b"), "the branch survives")
  }

  test("main DV vs branch REWRITE, disjoint rows: main's deleted ids are " +
      "re-addressed into the branch's net files") {
    val t = build() // COW: the branch's delete rewrites file 1
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L) // rewrite file 1
      ()
    }
    // main flips to MoR and deletes id 1 — a DV on the SAME fork file
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, t, col("id") === 1L, "md", 0L)
    val v = TxLog.mergeBranch(spark, t, "b")
    assert(v > 0L)
    assert(ids(t) == Seq(2L, 3L, 4L, 5L, 6L, 7L),
      "main's delete must survive into the branch's rewrite output")
  }

  test("main DV vs branch REWRITE, same row refuses (main deleted a row " +
      "the branch edited)") {
    val t = build()
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L)
      ()
    }
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, t, col("id") === 0L, "md", 0L) // same row
    val e = intercept[java.util.ConcurrentModificationException](
      TxLog.mergeBranch(spark, t, "b"))
    assert(e.getMessage.contains("the branch edited"), e.getMessage)
  }

  test("main REWRITE vs branch DV, disjoint rows: the branch's deleted ids " +
      "are re-addressed into main's divergent live files; the branch's DV " +
      "on the main-dead fork file never publishes") {
    val t = build(mor = true) // MoR: the branch's delete grows a DV
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L) // DV on file 1
      ()
    }
    // main flips to COW and deletes id 1 — rewrites the SAME fork file
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeCow))
    TxLog.delete(spark, t, col("id") === 1L, "md", 0L)
    val v = TxLog.mergeBranch(spark, t, "b")
    assert(v > 0L)
    assert(ids(t) == Seq(2L, 3L, 4L, 5L, 6L, 7L),
      "the branch's delete must survive into main's rewrite output")
  }

  test("main REWRITE vs branch DV, same row refuses (the branch deleted a " +
      "row main edited)") {
    val t = build(mor = true)
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 1L, "bd", 0L)
      ()
    }
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeCow))
    // main UPDATEs id 1 (delete+reinsert rewrite) — the row the branch deleted
    TxLog.update(spark, t, col("id") === 1L, Map("v" -> lit("M")), "mu", 0L)
    val e = intercept[java.util.ConcurrentModificationException](
      TxLog.mergeBranch(spark, t, "b"))
    assert(e.getMessage.contains("main edited"), e.getMessage)
  }

  test("feed table: a row-merged commit's CDF serves the BRANCH's net " +
      "delta only — main's already-emitted delete is not re-reported, and " +
      "an id-keyed consumer replay equals the snapshot lineage") {
    val t = build(feed = true)
    val preIds = TxLog.snapshotLineage(spark, t).get
      .select("_row_id", "id").as[(Long, Long)].collect().toMap
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L) // rewrite file 1
      ()
    }
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, t, col("id") === 1L, "md", 0L) // DV, same file
    val v = TxLog.mergeBranch(spark, t, "b")
    val feed = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", v.toString).load(t)
      .select(col("_change_type"), col("_row_id"), col("id"))
      .as[(String, Option[Long], Long)].collect().toSeq
    assert(feed.map(r => (r._1, r._3)) == Seq(("delete", 0L)),
      s"merge version must serve ONLY the branch's delete: $feed")
    assert(feed.head._2.contains(preIds.collectFirst { case (r, 0L) => r }.get),
      "the d-row pairs by the pre-fork id")
    // full id-keyed replay from version 0 equals the merged lineage
    val ev = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("withRowIds", "true").option("startingVersion", "0").load(t)
    val lastV = ev.groupBy(col("_row_id").as("rid_"))
      .agg(max("_commit_version").as("lv"))
    val consumer = ev.join(lastV,
        ev("_row_id") === col("rid_") && ev("_commit_version") === col("lv"))
      .where(col("_change_type") === "insert")
      .select(ev("_row_id").as("rid"), col("id"), col("v"))
    val lineage = TxLog.snapshotLineage(spark, t).get
      .select(col("_row_id").as("rid"), col("id"), col("v"))
    assert(consumer.exceptAll(lineage).count() == 0L &&
      lineage.exceptAll(consumer).count() == 0L,
      "consumer replay must equal the snapshot lineage")
  }

  test("feed table, opposite direction: main REWROTE the file, the branch " +
      "DV'd it — the merge's CDF delta is the branch's delete at fork " +
      "values (equal to main's carried values by disjointness)") {
    val t = build(mor = true, feed = true)
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L) // DV on file 1
      ()
    }
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeCow))
    TxLog.delete(spark, t, col("id") === 1L, "md", 0L) // rewrites file 1
    val v = TxLog.mergeBranch(spark, t, "b")
    assert(ids(t) == Seq(2L, 3L, 4L, 5L, 6L, 7L))
    val feed = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", v.toString).load(t)
      .select("_change_type", "id").as[(String, Long)].collect().toSeq
    assert(feed == Seq(("delete", 0L)),
      s"merge version must serve ONLY the branch's delete: $feed")
    // consumer replay from v0 equals the merged lineage
    val ev = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("withRowIds", "true").option("startingVersion", "0").load(t)
    val lastV = ev.groupBy(col("_row_id").as("rid_"))
      .agg(max("_commit_version").as("lv"))
    val consumer = ev.join(lastV,
        ev("_row_id") === col("rid_") && ev("_commit_version") === col("lv"))
      .where(col("_change_type") === "insert")
      .select(ev("_row_id").as("rid"), col("id"), col("v"))
    val lineage = TxLog.snapshotLineage(spark, t).get
      .select(col("_row_id").as("rid"), col("id"), col("v"))
    assert(consumer.exceptAll(lineage).count() == 0L &&
      lineage.exceptAll(consumer).count() == 0L)
  }

  test("row merge under a benign interleaved append: the lost slot race " +
      "re-judges (main moved → resolution re-staged) and lands once") {
    val t = build(mor = true)
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L)
      ()
    }
    TxLog.delete(spark, t, col("id") === 1L, "md", 0L) // DV, same file
    var fired = false
    val v = TxLog.mergeBranch(spark, t, "b", beforeCommit = () => {
      if (!fired) {
        fired = true
        TxLog.commit(Seq((200L, "m")).toDF("id", "v").coalesce(1), t, "mw", 1L)
        ()
      }
    })
    assert(v > 0L && fired)
    assert(ids(t) == Seq(2L, 3L, 4L, 5L, 6L, 7L, 200L))
    val manifests = new java.io.File(t, "_txlog").listFiles()
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
    assert(manifests.count(_.contains("branch-merge-")) == 1)
  }

  test("orphaned resolution sidecars (a lost-race re-stage) are " +
      "vacuum-collectable and a zero-retention sweep never touches the " +
      "winning resolution's vectors") {
    val t = build(mor = true, feed = true)
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L)
      ()
    }
    TxLog.delete(spark, t, col("id") === 1L, "md", 0L) // DV, same file
    // interleaved append moves main between resolution and publish →
    // the memo key (base, branch head, MAIN head) invalidates and the
    // resolution re-stages; the first attempt's sidecars orphan
    var fired = false
    val v = TxLog.mergeBranch(spark, t, "b", beforeCommit = () => {
      if (!fired) {
        fired = true
        TxLog.commit(Seq((200L, "m")).toDF("id", "v").coalesce(1), t, "mw", 1L)
        ()
      }
    })
    assert(v > 0L && fired)
    val before = ids(t)
    assert(before == Seq(2L, 3L, 4L, 5L, 6L, 7L, 200L))
    // zero-retention vacuum: collects the orphans, keeps the winner
    val swept = TxLog.vacuum(spark, t, minAgeMs = 0L)
    assert(swept >= 0)
    assert(ids(t) == before, "the sweep must not change the merged state")
    // the id surface survives the sweep too
    val lin = TxLog.snapshotLineage(spark, t).get.select("_row_id")
    assert(lin.distinct().count() == lin.count() && lin.count() == 7L)
  }

  test("rewrite vs rewrite still refuses; schema divergence disables the " +
      "row merge (one shared coordinate system required)") {
    // rewrite-vs-rewrite: COW deletes on both sides of one file
    val t = build()
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L)
      ()
    }
    TxLog.delete(spark, t, col("id") === 1L, "md", 0L)
    val e = intercept[java.util.ConcurrentModificationException](
      TxLog.mergeBranch(spark, t, "b"))
    assert(e.getMessage.contains("rewrote file"), e.getMessage)
    // schema divergence: main evolves, then MoR-deletes in the same
    // file the branch rewrote — refuses on the coordinate system, not
    // a wrong resolution
    val t2 = build()
    TxLog.createBranch(spark, t2, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t2, col("id") === 0L, "bd", 0L)
      ()
    }
    TxLog.setProperties(spark, t2, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.evolveSchema(spark, t2, org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType, nullable = true),
      org.apache.spark.sql.types.StructField("w",
        org.apache.spark.sql.types.StringType, nullable = true))))
    TxLog.delete(spark, t2, col("id") === 1L, "md", 0L)
    val e2 = intercept[java.util.ConcurrentModificationException](
      TxLog.mergeBranch(spark, t2, "b"))
    assert(e2.getMessage.contains("coordinate system"), e2.getMessage)
  }

  test("UDF-free per-file lookup at scale: a 70-file table (past the " +
      "literal threshold → broadcast-join path) serves withRowIds reads, " +
      "DV filtering, and eqdel debt through the joined lookup") {
    val t = fresh()
    // 70 single-row files → the rid/seq lookup maps exceed
    // TailLookupLiteralMax and take the broadcast-join path
    spark.range(70).select(col("id"), lit("x").as("v"))
      .repartition(70).write.format("txlog").mode("append").save(t)
    TxLog.setProperties(spark, t, Map(
      TxLog.ChangeFeedProp -> "true",
      TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.delete(spark, t, col("id") % 10L === 3L, "d", 0L) // DVs
    TxLog.deleteByKeys(Seq(5L, 15L).toDF("id"), t, "k", 0L) // live eqdel debt
    val lin = TxLog.snapshotLineage(spark, t).get
      .select("_row_id", "id").as[(Long, Long)].collect().toSeq
    val expect = (0L until 70L).filterNot(i => i % 10L == 3L)
      .filterNot(Set(5L, 15L))
    assert(lin.map(_._2).sorted == expect,
      s"rows through DV + eqdel at 70 files: ${lin.map(_._2).sorted}")
    assert(lin.map(_._1).distinct.size == lin.size, "ids must stay unique")
    // and the merge machinery's capture read path (attachGrid over >64
    // committed files) — a keyed upsert stages an id-carrying capture
    TxLog.upsertByKeys(Seq((0L, "U")).toDF("id", "v"), t, Seq("id"), "u", 0L)
    val last = spark.read.format("txlog").option("readChangeFeed", "true")
      .load(t).agg(max("_commit_version")).as[Long].collect().head
    val delta = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", last.toString).load(t)
      .select("_change_type", "id").as[(String, Long)].collect().toSeq.sorted
    assert(delta == Seq(("delete", 0L), ("insert", 0L)), delta.toString)
  }
}
