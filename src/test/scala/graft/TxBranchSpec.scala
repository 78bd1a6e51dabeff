package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.TxLog

/** BRANCHES (r17): writable refs over the shared linear log. A branch
  * is a property (`graft.branch.<name>` → base version) plus
  * branch-LABELED commits: [[TxLog.onBranch]] scopes every existing
  * door (append, DML, keyed writes, schema-evolving data commits) to
  * the branch's lineage — main ≤ base plus the branch's own commits —
  * while main readers never see unadopted branch manifests.
  * [[TxLog.fastForward]] folds the commits back into main (one
  * manifest ADOPTS their versions — zero data movement) and
  * [[TxLog.dropBranch]] abandons them. The stage-validate-publish
  * workflow a curation pipeline wants. */
class TxBranchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fresh(): String =
    Files.createTempDirectory("txbr_").resolve("t").toString

  private def rows(df: Option[org.apache.spark.sql.DataFrame]): Seq[(Long, String)] =
    df.map(_.select("id", "v").orderBy("id").as[(Long, String)].collect().toSeq)
      .getOrElse(Seq.empty)

  /** two files: ids 0..3 ("a") and 4..7 ("b") */
  private def build(): String = {
    val t = fresh()
    spark.range(4).select(col("id"), lit("a").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    spark.range(4, 8).select(col("id"), lit("b").as("v"))
      .coalesce(1).write.format("txlog").mode("append").save(t)
    t
  }

  test("stage-validate-publish: branch write invisible to main, fast-forward " +
      "adopts it with zero data movement") {
    val t = build()
    val base = TxLog.createBranch(spark, t, "stage")
    assert(base == 1L)
    assert(TxLog.branches(spark, t) == Map("stage" -> 1L))
    // stage a curated batch + a keyed replace ON the branch
    TxLog.onBranch("stage") {
      TxLog.commit(Seq((8L, "c"), (9L, "c")).toDF("id", "v").coalesce(1),
        t, "cur", 0L)
      TxLog.upsertByKeys(Seq((0L, "A")).toDF("id", "v"), t, Seq("id"), "cur", 1L)
    }
    // main is untouched — snapshot, V2 scan and count alike
    assert(rows(TxLog.snapshot(spark, t)).map(_._1) == (0L to 7L))
    assert(spark.read.format("txlog").load(t).count() == 8L)
    // the branch sees its own lineage
    val br = rows(TxLog.snapshotBranch(spark, t, "stage"))
    assert(br.map(_._1) == (0L to 9L))
    assert(br.toMap.apply(0L) == "A")
    // validate-then-publish: one fast-forward, no files rewritten
    TxLog.fastForward(spark, t, "stage")
    assert(TxLog.branches(spark, t).isEmpty)
    val main = rows(TxLog.snapshot(spark, t))
    assert(main == br, s"$main vs $br")
    // exactly-once survives adoption: the branch writer's token replays
    // as a no-op against main
    assert(TxLog.upsertByKeys(Seq((0L, "ZZ")).toDF("id", "v"), t, Seq("id"),
      "cur", 1L) == -1L)
    assert(rows(TxLog.snapshot(spark, t)).toMap.apply(0L) == "A")
  }

  test("DML on a branch: COW delete scoped to the branch lineage; ff publishes it") {
    val t = build()
    TxLog.createBranch(spark, t, "fix")
    TxLog.onBranch("fix") {
      TxLog.delete(spark, t, col("id") % 2 === 0L, "fixw", 0L)
      ()
    }
    assert(rows(TxLog.snapshot(spark, t)).size == 8, "main keeps the rows")
    assert(rows(TxLog.snapshotBranch(spark, t, "fix")).map(_._1) ==
      Seq(1L, 3L, 5L, 7L))
    TxLog.fastForward(spark, t, "fix")
    assert(rows(TxLog.snapshot(spark, t)).map(_._1) == Seq(1L, 3L, 5L, 7L))
  }

  test("schema evolution on a branch stays on the branch until ff") {
    val t = build()
    TxLog.createBranch(spark, t, "ev")
    TxLog.onBranch("ev") {
      TxLog.commit(
        Seq((10L, "c", Option(1.5))).toDF("id", "v", "score").coalesce(1),
        t, "evw", 0L)
    }
    assert(!TxLog.tableSchema(spark, t).get.fieldNames.contains("score"))
    TxLog.onBranch("ev") {
      assert(TxLog.tableSchema(spark, t).get.fieldNames.contains("score"))
    }
    TxLog.fastForward(spark, t, "ev")
    val sch = TxLog.tableSchema(spark, t).get
    assert(sch.fieldNames.contains("score"))
    assert(TxLog.snapshot(spark, t).get.where(col("score").isNotNull).count() == 1L)
  }

  test("a main stream tails PAST branch commits without dying (foreign " +
      "versions serve nothing)") {
    val t = build()
    TxLog.createBranch(spark, t, "bg")
    val name = s"txbr_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog").option("path", t).load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("txbr_st_").toString)
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table(name).count() == 8L)
      // a branch DML commit bumps the global head — the main tail must
      // treat it as present-but-foreign, not vacuumed and not a rewrite
      TxLog.onBranch("bg") {
        TxLog.delete(spark, t, col("id") === 0L, "bgw", 0L)
        ()
      }
      q.processAllAvailable()
      assert(spark.table(name).count() == 8L, "branch commit must serve nothing")
      // and the tail keeps working for real main appends
      spark.range(8, 10).select(col("id"), lit("c").as("v")).coalesce(1)
        .write.format("txlog").mode("append").save(t)
      q.processAllAvailable()
      assert(spark.table(name).count() == 10L)
    } finally q.stop()
  }

  test("concurrent branch and main commits both land (no false conflicts); " +
      "ff then refuses on the diverged main") {
    val t = build()
    TxLog.createBranch(spark, t, "par")
    // a MAIN append fires in the branch commit's publish window: the
    // branch commit must retry onto the next global slot, not conflict.
    // The racer runs on its OWN thread — the branch context is
    // thread-scoped, exactly like a real concurrent writer
    TxLog.publishRaceForTests = () => {
      val th = new Thread(() =>
        spark.range(100, 102).select(col("id"), lit("m").as("v")).coalesce(1)
          .write.format("txlog").mode("append").save(t))
      th.start(); th.join()
    }
    TxLog.onBranch("par") {
      TxLog.commit(Seq((50L, "p")).toDF("id", "v").coalesce(1), t, "parw", 0L)
    }
    assert(rows(TxLog.snapshot(spark, t)).map(_._1) == (0L to 7L) ++ Seq(100L, 101L))
    assert(rows(TxLog.snapshotBranch(spark, t, "par")).map(_._1) ==
      (0L to 7L) :+ 50L, "branch must not see the post-base main append")
    // main moved with DATA past the base — a fast-forward would lose
    // the interleaving; refused
    val e = intercept[java.util.ConcurrentModificationException](
      TxLog.fastForward(spark, t, "par"))
    assert(e.getMessage.contains("fast-forward"), e.getMessage)
    // the branch resolves by drop instead
    TxLog.dropBranch(spark, t, "par")
    assert(TxLog.branches(spark, t).isEmpty)
  }

  test("guards: maintenance and global metadata refuse on a branch; " +
      "restore refuses past a live branch; no nesting; no duplicates") {
    val t = build()
    val preBranch = TxLog.headVersion(spark, t)
    TxLog.createBranch(spark, t, "g")
    intercept[IllegalArgumentException](TxLog.createBranch(spark, t, "g"))
    TxLog.onBranch("g") {
      intercept[IllegalArgumentException](TxLog.compact(spark, t))
      intercept[IllegalArgumentException](
        TxLog.setProperties(spark, t, Map("changeFeed" -> "true")))
      intercept[IllegalArgumentException](TxLog.renameColumn(spark, t, "v", "w"))
      intercept[IllegalArgumentException](TxLog.vacuum(spark, t, 0L))
      intercept[IllegalArgumentException](TxLog.onBranch("g2")(()))
    }
    // restore to before the branch existed would unregister it silently
    val e = intercept[IllegalArgumentException](
      TxLog.restore(spark, t, preBranch))
    assert(e.getMessage.contains("branch"), e.getMessage)
    TxLog.dropBranch(spark, t, "g")
    TxLog.restore(spark, t, preBranch)
    ()
  }

  test("vacuum pins a live branch's files; dropBranch releases them") {
    val t = build()
    TxLog.createBranch(spark, t, "keep")
    TxLog.onBranch("keep") {
      TxLog.commit(Seq((20L, "k")).toDF("id", "v").coalesce(1), t, "kw", 0L)
    }
    // the branch file survives an aggressive vacuum while the branch lives
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    assert(rows(TxLog.snapshotBranch(spark, t, "keep")).map(_._1).contains(20L))
    // drop → the branch's data file is collectable
    TxLog.dropBranch(spark, t, "keep")
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    val root = new org.apache.hadoop.fs.Path(t)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dataFiles = fs.listStatus(new org.apache.hadoop.fs.Path(t, "data"))
      .flatMap(d => fs.listStatus(d.getPath)).length
    assert(dataFiles == 2, s"only main's two files must survive, saw $dataFiles")
    assert(rows(TxLog.snapshot(spark, t)).map(_._1) == (0L to 7L))
  }

  test("recreating a dropped branch name never resurrects its old commits") {
    val t = build()
    TxLog.createBranch(spark, t, "r")
    TxLog.onBranch("r") {
      TxLog.commit(Seq((30L, "old")).toDF("id", "v").coalesce(1), t, "rw", 0L)
    }
    TxLog.dropBranch(spark, t, "r")
    TxLog.createBranch(spark, t, "r")
    assert(rows(TxLog.snapshotBranch(spark, t, "r")).map(_._1) == (0L to 7L),
      "the recreated branch must fork clean — no ghost of the dropped lineage")
    TxLog.fastForward(spark, t, "r") // empty ff = just drops the property
    assert(rows(TxLog.snapshot(spark, t)).map(_._1) == (0L to 7L))
  }

  test("V2 branch option: format(\"txlog\").option(\"branch\", b) reads the " +
      "lineage; read-only; composes with _row_id; refuses time travel/cdf/stream") {
    val t = build()
    TxLog.createBranch(spark, t, "v2b")
    TxLog.onBranch("v2b") {
      TxLog.commit(Seq((50L, "x")).toDF("id", "v").coalesce(1), t, "v2w", 0L)
      TxLog.delete(spark, t, col("id") === 0L, "v2d", 0L)
      ()
    }
    val br = spark.read.format("txlog").option("branch", "v2b").load(t)
    assert(br.select("id").orderBy("id").as[Long].collect().toSeq ==
      (1L to 7L) :+ 50L)
    // pushed filters + the lineage metadata columns compose
    assert(br.where(col("id") >= 50L).select("_row_id", "id")
      .as[(Long, Long)].collect().toSeq.nonEmpty)
    // main stays main through the plain door
    assert(spark.read.format("txlog").load(t).count() == 8L)
    // read-only + incompatible options (a write declaring the branch
    // OPTION refuses — branch writes go through onBranch)
    intercept[Exception](spark.range(1).selectExpr("id", "'w' AS v")
      .write.format("txlog").option("branch", "v2b").mode("append").save(t))
    intercept[Exception](spark.read.format("txlog")
      .option("branch", "v2b").option("versionAsOf", 1L).load(t).collect())
    intercept[Exception](spark.read.format("txlog")
      .option("branch", "v2b").option("readChangeFeed", "true").load(t).collect())
    intercept[Exception](spark.read.format("txlog")
      .option("branch", "nope").load(t).collect())
    TxLog.dropBranch(spark, t, "v2b")
    ()
  }

  test("branch time machinery: tags and time travel ignore branch commits; " +
      "a second branch forks from post-ff main") {
    val t = build()
    TxLog.createBranch(spark, t, "b1")
    TxLog.onBranch("b1") {
      TxLog.commit(Seq((40L, "x")).toDF("id", "v").coalesce(1), t, "b1w", 0L)
    }
    TxLog.fastForward(spark, t, "b1")
    // time travel to the pre-branch version still excludes branch rows
    assert(rows(TxLog.snapshotAt(spark, t, 1L)).map(_._1) == (0L to 7L))
    // head includes the adopted commit
    assert(rows(TxLog.snapshot(spark, t)).map(_._1) == (0L to 7L) :+ 40L)
    // a second branch over the adopted history composes
    TxLog.createBranch(spark, t, "b2")
    TxLog.onBranch("b2") {
      TxLog.upsertByKeys(Seq((40L, "y")).toDF("id", "v"), t, Seq("id"), "b2w", 0L)
    }
    assert(rows(TxLog.snapshotBranch(spark, t, "b2")).toMap.apply(40L) == "y")
    assert(rows(TxLog.snapshot(spark, t)).toMap.apply(40L) == "x")
    TxLog.fastForward(spark, t, "b2")
    assert(rows(TxLog.snapshot(spark, t)).toMap.apply(40L) == "y")
  }

  test("a late adoption below another branch's base neither rewrites that " +
      "branch's fork prefix nor lets it fast-forward silently") {
    // v0,v1 appends; v2 create A; v3 A's data commit; v4 create C
    // (bookkeeping that pushes B's base PAST v3); v5 create B (base 4);
    // v6 ff A adopts [3] — an adoptee BELOW B's base. B's lineage must
    // stay main-as-of-the-fork (no v3 rows), and B's own ff must refuse
    // (main's row set changed after B forked).
    val t = build()
    TxLog.createBranch(spark, t, "a")
    TxLog.onBranch("a") {
      TxLog.commit(Seq((100L, "z")).toDF("id", "v").coalesce(1), t, "aw", 0L)
    }
    TxLog.createBranch(spark, t, "c") // bookkeeping: base bump only
    TxLog.createBranch(spark, t, "b")
    TxLog.onBranch("b") {
      TxLog.commit(Seq((200L, "w")).toDF("id", "v").coalesce(1), t, "bw", 0L)
    }
    TxLog.fastForward(spark, t, "a") // adopts v3 (< b's base)
    assert(rows(TxLog.snapshot(spark, t)).map(_._1).contains(100L))
    // b's fork prefix is main AS OF the fork — the late-adopted v3 is
    // not retroactively injected
    val br = rows(TxLog.snapshotBranch(spark, t, "b")).map(_._1)
    assert(br == (0L to 7L) :+ 200L, s"late adoption leaked into b: $br")
    // and b cannot fast-forward: main's rows moved past its base
    val e = intercept[java.util.ConcurrentModificationException] {
      TxLog.fastForward(spark, t, "b")
    }
    assert(e.getMessage.contains("main moved"))
    TxLog.dropBranch(spark, t, "b"); TxLog.dropBranch(spark, t, "c")
  }

  test("dropBranch records the row-id high-water; ids never re-mint after " +
      "the dropped branch's manifests are vacuumed") {
    val t = build() // ids 0..7 minted
    TxLog.createBranch(spark, t, "tmp")
    TxLog.onBranch("tmp") {
      TxLog.commit(spark.range(100).select(col("id") + 1000L as "id",
        lit("x").as("v")).coalesce(1), t, "tw", 0L)
    }
    TxLog.dropBranch(spark, t, "tmp")
    // the drop manifest itself carries the water (survives foreign sweep)
    val logDir = new java.io.File(t, "_txlog")
    val dropJson = logDir.listFiles().filter(_.getName.endsWith(".json"))
      .map(f => new String(java.nio.file.Files.readAllBytes(f.toPath)))
      .find(_.contains("branch-drop-")).get
    assert(dropJson.contains("\"nrid\": 108"),
      s"drop manifest must record nrid=108 (8 main + 100 branch rows): $dropJson")
    // sweep the foreign manifests, then append: no id collision
    assert(TxLog.compact(spark, t) > 0L)
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    TxLog.commit(Seq((5000L, "n")).toDF("id", "v").coalesce(1), t, "nw", 0L)
    val ids = spark.read.format("txlog").load(t)
      .select(col("_row_id")).as[Long].collect()
    assert(ids.distinct.length == ids.length)
    assert(ids.max >= 108L, s"new rows re-minted a dropped branch's range: ${ids.max}")
  }

  test("vacuum of a dropped branch's foreign manifests leaves lagging " +
      "streams and CDF windows serveable (main lost nothing)") {
    val t = build() // v0, v1
    TxLog.createBranch(spark, t, "junk") // v2
    TxLog.onBranch("junk") {
      TxLog.commit(Seq((300L, "j")).toDF("id", "v").coalesce(1), t, "jw", 0L) // v3
    }
    TxLog.dropBranch(spark, t, "junk") // v4
    TxLog.tag(spark, t, "pin", 1L) // v5 — pins main's below-checkpoint prefix
    assert(TxLog.compact(spark, t) > 0L) // v6 checkpoint
    TxLog.vacuum(spark, t, minAgeMs = 0L)
    // main prefix survives (tag pin); the foreign v3 manifest is gone —
    // the exact hole shape the contiguity checks must tolerate
    val vs = new java.io.File(t, "_txlog").listFiles()
      .map(_.getName).filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(_.stripPrefix("v").stripSuffix(".json").toLong).sorted.toSeq
    assert(vs.contains(0L), s"main v0 must survive the tag-pinned sweep: $vs")
    assert(!vs.contains(3L), s"foreign v3 should have been collected: $vs")
    // a lagging RANGE stream crossing the hole serves main's rows
    val name = s"txbrv_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog").option("startingVersion", "0")
      .load(t).writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("txbrv_").toString)
      .start()
    q.processAllAvailable(); q.stop()
    assert(spark.table(name).count() == 8L,
      "the collected foreign manifest broke a valid lagging stream")
    // a batch CDF window may even BOUND on the collected version
    val cdf = spark.read.format("txlog").option("readChangeFeed", "true")
      .option("startingVersion", "0").option("endingVersion", "3").load(t)
    assert(cdf.count() == 8L)
  }
}
