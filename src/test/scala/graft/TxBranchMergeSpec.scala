package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** BRANCH MERGE past a diverged main (r18, [[TxLog.mergeBranch]]):
  * one main manifest carries the branch's NET delta against its fork
  * state — files/removes/dvs plus the branch writers' exactly-once
  * tokens and (feed tables) the net id-carrying capture. No adoption,
  * no history rewrite: consumers see one new version. Soundness is
  * the writeSerializable footprint algebra, so a diverged merge
  * requires `isolation=writeSerializable` and conflicts loudly on
  * checkpoint / file-overlap / equality-delete / column-mapping
  * divergence. */
class TxBranchMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txbm_").resolve("t").toString

  private def rows(df: Option[org.apache.spark.sql.DataFrame]): Seq[(Long, String)] =
    df.map(_.select("id", "v").orderBy("id").as[(Long, String)].collect().toSeq)
      .getOrElse(Seq.empty)

  /** writeSerializable table, two files: ids 0..3 ("a"), 4..7 ("b") */
  private def build(ws: Boolean = true): String = {
    val t = fresh()
    spark.range(4).select(col("id"), lit("a").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    spark.range(4, 8).select(col("id"), lit("b").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    if (ws) TxLog.setProperties(spark, t,
      Map(TxLog.IsolationProp -> TxLog.IsolationWriteSerializable))
    t
  }

  test("disjoint merge: branch DML + append rebase onto a diverged main; " +
      "tokens absorb; the branch resolves") {
    val t = build()
    TxLog.createBranch(spark, t, "stage")
    TxLog.onBranch("stage") {
      TxLog.delete(spark, t, col("id") < 2L, "st-d", 0L) // rewrites file 1
      TxLog.commit(Seq((100L, "c")).toDF("id", "v").coalesce(1), t, "st-w", 0L)
    }
    // main diverges with a blind append (disjoint by construction)
    TxLog.commit(Seq((200L, "m")).toDF("id", "v").coalesce(1), t, "mn-w", 0L)
    val v = TxLog.mergeBranch(spark, t, "stage")
    assert(v > 0L)
    assert(TxLog.branches(spark, t).isEmpty, "merge must resolve the branch")
    val got = rows(TxLog.snapshot(spark, t)).map(_._1)
    assert(got == Seq(2L, 3L, 4L, 5L, 6L, 7L, 100L, 200L), got.toString)
    // the branch writers' exactly-once survives the merge (their
    // manifests are foreign now; the merge absorbed the tokens)
    assert(TxLog.commit(Seq((999L, "x")).toDF("id", "v"), t, "st-w", 0L) == -1L)
    TxLog.delete(spark, t, col("id") === -1L, "st-d", 0L) match {
      case r => assert(r.version == -1L, s"replayed DML must be a token no-op: $r")
    }
    // time travel BEFORE the merge never sees branch rows
    assert(!rows(TxLog.snapshotAt(spark, t, v - 1)).map(_._1).contains(100L))
  }

  test("no divergence delegates to fastForward (adoption, not a rebase)") {
    val t = build()
    TxLog.createBranch(spark, t, "ff")
    TxLog.onBranch("ff") {
      TxLog.commit(Seq((50L, "f")).toDF("id", "v").coalesce(1), t, "ffw", 0L)
    }
    val v = TxLog.mergeBranch(spark, t, "ff")
    assert(rows(TxLog.snapshot(spark, t)).map(_._1).contains(50L))
    // adoption: the ff manifest carries no files of its own
    val logDir = new java.io.File(t, "_txlog")
    val ff = logDir.listFiles().map(f =>
      new String(java.nio.file.Files.readAllBytes(f.toPath)))
      .find(_.contains("branch-ff-"))
    assert(ff.isDefined && ff.get.contains("\"adopts\""), s"v$v should adopt")
  }

  test("refusals: serializable table, checkpoint, file overlap, eqdel " +
      "divergence, fork debt") {
    // serializable: diverged merge refused outright
    val t0 = build(ws = false)
    TxLog.createBranch(spark, t0, "b")
    TxLog.onBranch("b") {
      TxLog.commit(Seq((10L, "x")).toDF("id", "v"), t0, "bw", 0L)
    }
    TxLog.commit(Seq((20L, "y")).toDF("id", "v"), t0, "mw", 0L)
    val e0 = intercept[IllegalArgumentException](TxLog.mergeBranch(spark, t0, "b"))
    assert(e0.getMessage.contains("writeSerializable"), e0.getMessage)
    // checkpoint divergence
    val t1 = build()
    TxLog.createBranch(spark, t1, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t1, col("id") === 0L, "bd", 0L)
      ()
    }
    assert(TxLog.compact(spark, t1) > 0L)
    val e1 = intercept[java.util.ConcurrentModificationException](
      TxLog.mergeBranch(spark, t1, "b"))
    assert(e1.getMessage.contains("checkpoint"), e1.getMessage)
    // file overlap: both sides rewrite the same file
    val t2 = build()
    TxLog.createBranch(spark, t2, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t2, col("id") === 0L, "bd", 0L)
      ()
    }
    TxLog.delete(spark, t2, col("id") === 1L, "md", 0L) // same file 1
    val e2 = intercept[java.util.ConcurrentModificationException](
      TxLog.mergeBranch(spark, t2, "b"))
    assert(e2.getMessage.contains("rewrote file"), e2.getMessage)
    // divergent equality deletes on main
    val t3 = build()
    TxLog.createBranch(spark, t3, "b")
    TxLog.onBranch("b") {
      TxLog.commit(Seq((10L, "x")).toDF("id", "v"), t3, "bw", 0L)
    }
    TxLog.deleteByKeys(Seq(2L).toDF("id"), t3, "mk", 0L)
    val e3 = intercept[java.util.ConcurrentModificationException](
      TxLog.mergeBranch(spark, t3, "b"))
    assert(e3.getMessage.contains("equality deletes"), e3.getMessage)
    // live debt at the fork
    val t4 = build()
    TxLog.deleteByKeys(Seq(3L).toDF("id"), t4, "fk", 0L)
    TxLog.createBranch(spark, t4, "b")
    TxLog.onBranch("b") {
      TxLog.commit(Seq((10L, "x")).toDF("id", "v"), t4, "bw", 0L)
    }
    TxLog.commit(Seq((20L, "y")).toDF("id", "v"), t4, "mw", 0L)
    val e4 = intercept[java.util.ConcurrentModificationException](
      TxLog.mergeBranch(spark, t4, "b"))
    assert(e4.getMessage.contains("debt at the fork"), e4.getMessage)
  }

  test("feed tables: the merge serves its NET id-carrying delta at ONE " +
      "version; branch-internal churn never appears; a consumer stays exact") {
    val t = build()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    val preIds = TxLog.snapshotLineage(spark, t).get
      .select("_row_id", "id").as[(Long, Long)].collect().toMap
    TxLog.createBranch(spark, t, "cur")
    TxLog.onBranch("cur") {
      // churn: append then delete the same rows ON the branch
      TxLog.commit(Seq((300L, "tmp"), (301L, "tmp")).toDF("id", "v")
        .coalesce(1), t, "cw", 0L)
      TxLog.delete(spark, t, col("v") === "tmp", "cd", 0L)
      // real work: drop ids 4..5 (rewrites file 2), add 100..101
      TxLog.delete(spark, t, col("id") === 4L || col("id") === 5L, "cd", 1L)
      TxLog.commit(Seq((100L, "n"), (101L, "n")).toDF("id", "v")
        .coalesce(1), t, "cw", 1L)
    }
    TxLog.commit(Seq((200L, "m")).toDF("id", "v").coalesce(1), t, "mw", 0L)
    val v = TxLog.mergeBranch(spark, t, "cur")
    val feed = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", v.toString).load(t)
      .select(col("_change_type"), col("_row_id"), col("id"))
      .as[(String, Option[Long], Long)].collect().toSeq.sortBy(r => (r._1, r._3))
    assert(feed.map(r => (r._1, r._3)) ==
      Seq(("delete", 4L), ("delete", 5L), ("insert", 100L), ("insert", 101L)),
      s"net delta only, at the merge version: $feed")
    // d-rows carry the PRE-fork ids (pairing across the merge)
    val dIds = feed.filter(_._1 == "delete").flatMap(_._2).toSet
    assert(dIds == Set(preIds.collectFirst { case (r, 4L) => r }.get,
      preIds.collectFirst { case (r, 5L) => r }.get))
    // snapshot agrees with a value replay
    assert(rows(TxLog.snapshot(spark, t)).map(_._1) ==
      Seq(0L, 1L, 2L, 3L, 6L, 7L, 100L, 101L, 200L))
  }

  test("partitioned table: the merged net files keep their one-value-per-" +
      "tuple layout and partition pruning survives") {
    val t = fresh()
    TxLog.commitPartitioned(
      Seq((0L, "east", "a"), (1L, "east", "a"), (2L, "west", "a"))
        .toDF("id", "region", "v"), t, Seq("region"), "w", 0L)
    TxLog.setProperties(spark, t,
      Map(TxLog.IsolationProp -> TxLog.IsolationWriteSerializable))
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      // rewrite east (COW delete id 0) + append a new region
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L)
      TxLog.commitPartitioned(Seq((9L, "north", "n")).toDF("id", "region", "v"),
        t, Seq("region"), "bw", 0L)
    }
    TxLog.commitPartitioned(Seq((20L, "south", "m")).toDF("id", "region", "v"),
      t, Seq("region"), "mw", 0L) // diverge: new partition, disjoint files
    TxLog.mergeBranch(spark, t, "b")
    val got = spark.read.format("txlog").load(t)
      .select("id", "region").orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "east"), (2L, "west"), (9L, "north"), (20L, "south")),
      got.toString)
    // partition pruning still works over the merged layout (the net
    // files' pv metadata rode through the merge verbatim)
    val pruned = spark.read.format("txlog").load(t)
      .where(col("region") === "north")
    assert(pruned.count() == 1L)
    val (scanned, total) = graft.storage.TxLogV2.lastPrune.get()
    assert(scanned < total,
      s"partition pruning must survive the merge: scanned $scanned of $total")
  }

  test("merge under interleaved commits: a lost slot race re-judges and " +
      "lands ONCE without re-staging the capture; a conflicting interleave " +
      "is loud and leaves main byte-identical") {
    val t = build()
    TxLog.setProperties(spark, t, Map(TxLog.ChangeFeedProp -> "true"))
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L)
      ()
    }
    TxLog.commit(Seq((200L, "m")).toDF("id", "v").coalesce(1), t, "mw", 0L)
    // benign interleave: a pure append wins the first slot — the merge
    // must retry, re-judge, and land exactly once
    var fired = false
    val v = TxLog.mergeBranch(spark, t, "b", beforeCommit = () => {
      if (!fired) {
        fired = true
        TxLog.commit(Seq((201L, "m2")).toDF("id", "v").coalesce(1), t, "mw", 1L)
        ()
      }
    })
    assert(v > 0L && fired)
    assert(rows(TxLog.snapshot(spark, t)).map(_._1) ==
      Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 200L, 201L))
    // ONE merge manifest; its capture staged once (memoized across the
    // lost race — no orphaned duplicate change files referenced)
    val manifests = new java.io.File(t, "_txlog").listFiles()
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
    assert(manifests.count(_.contains("branch-merge-")) == 1)
    // the merge version's feed = exactly the branch's net delta
    val feed = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", v.toString).load(t)
      .where(col("_commit_version") === v)
      .select(col("_change_type"), col("id")).as[(String, Long)].collect().toSeq
    assert(feed == Seq(("delete", 0L)), feed.toString)
    // conflicting interleave: a rewrite touching the branch's files
    val t2 = build()
    TxLog.createBranch(spark, t2, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t2, col("id") === 0L, "bd", 0L)
      ()
    }
    TxLog.commit(Seq((300L, "x")).toDF("id", "v").coalesce(1), t2, "mw", 0L)
    val before = rows(TxLog.snapshot(spark, t2))
    var fired2 = false
    val e = intercept[java.util.ConcurrentModificationException] {
      TxLog.mergeBranch(spark, t2, "b", beforeCommit = () => {
        if (!fired2) {
          fired2 = true
          // main rewrites the SAME file the branch rewrote (id 1 lives
          // in file 1 with id 0) — re-judged on retry, must conflict
          TxLog.delete(spark, t2, col("id") === 1L, "md", 0L)
          ()
        }
      })
    }
    assert(e.getMessage.contains("rewrote file"), e.getMessage)
    assert(rows(TxLog.snapshot(spark, t2)) ==
      before.filterNot(_._1 == 1L), "the failed merge changed nothing else")
    assert(TxLog.branches(spark, t2).contains("b"), "the branch survives")
  }

  test("SQL door: the branch lifecycle runs through CALL system." +
      "{create_branch, branches, fast_forward, merge_branch, drop_branch}") {
    val wh = Files.createTempDirectory("txbm_cat_").toString
    spark.conf.set("spark.sql.catalog.brcat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.brcat.warehouse", wh)
    spark.sql("CREATE TABLE brcat.default.t (id BIGINT, v STRING) USING txlog")
    spark.sql("INSERT INTO brcat.default.t VALUES (0, 'a'), (1, 'a')")
    spark.sql("ALTER TABLE brcat.default.t SET TBLPROPERTIES " +
      s"('${TxLog.IsolationProp}' = '${TxLog.IsolationWriteSerializable}')")
    val path = s"$wh/default/t"
    val base = spark.sql(
      "CALL brcat.system.create_branch(table => 'default.t', name => 'st')")
      .collect()(0).getLong(0)
    assert(base >= 1L)
    assert(spark.sql("CALL brcat.system.branches(table => 'default.t')")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("st", base)))
    TxLog.onBranch("st") {
      TxLog.commit(Seq((10L, "b")).toDF("id", "v"), path, "sw", 0L)
    }
    // non-diverged: fast_forward publishes by adoption
    val ffv = spark.sql(
      "CALL brcat.system.fast_forward(table => 'default.t', name => 'st')")
      .collect()(0).getLong(0)
    assert(ffv > base)
    assert(spark.table("brcat.default.t").count() == 3L)
    // diverged: merge_branch rebases
    spark.sql("CALL brcat.system.create_branch(table => 'default.t', name => 'st2')")
    TxLog.onBranch("st2") {
      TxLog.commit(Seq((20L, "c")).toDF("id", "v"), path, "sw2", 0L)
    }
    spark.sql("INSERT INTO brcat.default.t VALUES (30, 'm')")
    val mv = spark.sql(
      "CALL brcat.system.merge_branch(table => 'default.t', name => 'st2')")
      .collect()(0).getLong(0)
    assert(mv > 0L)
    assert(spark.table("brcat.default.t").orderBy("id")
      .select("id").as[Long].collect().toSeq == Seq(0L, 1L, 10L, 20L, 30L))
    // drop is idempotent
    spark.sql("CALL brcat.system.create_branch(table => 'default.t', name => 'junk')")
    assert(spark.sql("CALL brcat.system.drop_branch(table => 'default.t', name => 'junk')")
      .collect()(0).getLong(0) > 0L)
    assert(spark.sql("CALL brcat.system.drop_branch(table => 'default.t', name => 'junk')")
      .collect()(0).getLong(0) == -1L)
    assert(spark.sql("CALL brcat.system.branches(table => 'default.t')")
      .collect().isEmpty)
  }

  test("merge carries the branch's GROWN deletion vectors (MoR divergence " +
      "on distinct files)") {
    val t = build()
    TxLog.setProperties(spark, t, Map(TxLog.DmlModeProp -> TxLog.DmlModeMor))
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.delete(spark, t, col("id") === 0L, "bd", 0L) // DV on file 1
      ()
    }
    TxLog.delete(spark, t, col("id") === 7L, "md", 0L) // DV on file 2 (main)
    TxLog.mergeBranch(spark, t, "b")
    assert(rows(TxLog.snapshot(spark, t)).map(_._1) == (1L to 6L),
      "both sides' vectors must survive the merge")
  }

  test("merge-FIRST materialize (r20): a merge_branch(materialize => true) " +
      "CALL refused for a NON-branch-debt reason leaves the branch " +
      "untouched — no materialization commit lands as a side effect") {
    val wh = Files.createTempDirectory("txbm_mf_").toString
    spark.conf.set("spark.sql.catalog.mfcat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.mfcat.warehouse", wh)
    spark.sql("CREATE TABLE mfcat.default.t (id BIGINT, v STRING) USING txlog")
    spark.sql("INSERT INTO mfcat.default.t VALUES (0, 'a'), (1, 'a'), (2, 'a')")
    val path = s"$wh/default/t"
    TxLog.setProperties(spark, path, Map(
      TxLog.IsolationProp -> TxLog.IsolationWriteSerializable))
    // FORK-side debt: live keyed delete BEFORE the branch exists
    TxLog.deleteByKeys(Seq(0L).toDF("id"), path, "fk", 0L)
    spark.sql("CALL mfcat.system.create_branch(table => 'default.t', name => 'mf')")
    TxLog.onBranch("mf") {
      // the branch ALSO accumulates its own debt — without merge-first
      // ordering, materialize => true would clear it (a persistent
      // branch commit) before the fork-debt refusal surfaced
      TxLog.upsertByKeys(Seq((1L, "U")).toDF("id", "v"), path, Seq("id"), "bu", 0L)
      ()
    }
    TxLog.commit(Seq((20L, "m")).toDF("id", "v"), path, "mw", 0L) // diverge
    val before = new java.io.File(path, "_txlog").listFiles().map(_.getName).toSet
    val e = intercept[java.util.ConcurrentModificationException] {
      spark.sql("CALL mfcat.system.merge_branch(" +
        "table => 'default.t', name => 'mf', materialize => true)").collect()
    }
    assert(e.getMessage.contains("debt at the fork"), e.getMessage)
    val after = new java.io.File(path, "_txlog").listFiles().map(_.getName).toSet
    assert(after == before,
      s"a refused CALL must commit NOTHING (new: ${after -- before})")
    assert(TxLog.branches(spark, path).contains("mf"), "the branch survives")
  }

  test("keyed-CDC staging workflow (r19): a branch that accumulated keyed " +
      "debt refuses with in-place guidance; merge_branch(materialize => " +
      "true) clears it branch-scoped and merges past a diverged main") {
    val wh = Files.createTempDirectory("txbm_cdc_").toString
    spark.conf.set("spark.sql.catalog.cdccat", "graft.storage.GraftCatalog")
    spark.conf.set("spark.sql.catalog.cdccat.warehouse", wh)
    spark.sql("CREATE TABLE cdccat.default.t (id BIGINT, v STRING) USING txlog")
    spark.sql("INSERT INTO cdccat.default.t VALUES (0, 'a'), (1, 'a'), (2, 'a')")
    val path = s"$wh/default/t"
    TxLog.setProperties(spark, path, Map(
      TxLog.IsolationProp -> TxLog.IsolationWriteSerializable,
      TxLog.ChangeFeedProp -> "true"))
    spark.sql("CALL cdccat.system.create_branch(table => 'default.t', name => 'cdc')")
    // the branch stages keyed-CDC writes — live equality-delete debt
    TxLog.onBranch("cdc") {
      TxLog.upsertByKeys(Seq((1L, "U"), (10L, "n")).toDF("id", "v"),
        path, Seq("id"), "bu", 0L)
      TxLog.deleteByKeys(Seq(0L).toDF("id"), path, "bd", 0L)
      ()
    }
    // main diverges (continuous ingestion)
    spark.sql("INSERT INTO cdccat.default.t VALUES (20, 'm')")
    // plain merge refuses on the BRANCH debt, with the in-place recipe
    val e = intercept[java.util.ConcurrentModificationException] {
      TxLog.mergeBranch(spark, path, "cdc")
    }
    assert(e.getMessage.contains("materialize => true"), e.getMessage)
    // materialize => true: branch-scoped materializeEqDels, then merge
    val mv = spark.sql("CALL cdccat.system.merge_branch(" +
      "table => 'default.t', name => 'cdc', materialize => true)")
      .collect()(0).getLong(0)
    assert(mv > 0L)
    assert(TxLog.branches(spark, path).isEmpty)
    assert(spark.table("cdccat.default.t").orderBy("id")
      .select("id", "v").as[(Long, String)].collect().toSeq ==
      Seq((1L, "U"), (2L, "a"), (10L, "n"), (20L, "m")))
    // the merge version's feed serves the branch's NET delta
    val delta = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", mv.toString)
      .option("endingVersion", mv.toString).load(path)
      .select("_change_type", "id", "v").as[(String, Long, String)]
      .collect().toSeq.sorted
    assert(delta == Seq(("delete", 0L, "a"), ("delete", 1L, "a"),
      ("insert", 1L, "U"), ("insert", 10L, "n")), delta.toString)
  }
}
