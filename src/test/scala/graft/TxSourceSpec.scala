package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.storage.{TxLog, TxLogV2}

/** The `txlog` DataSource V2: TxLog tables through Spark's connector
  * API — format("txlog") read/write, SQL DDL + SELECT + INSERT, NATIVE
  * row-level DML (Spark's own DELETE/UPDATE/MERGE planning over
  * SupportsRowLevelOperations), streaming source and exactly-once sink
  * — with pushed-down Filters driving the SAME manifest zone-map
  * skipping as the native API, observable via TxLogV2.lastPrune, and
  * with every filter re-applied by Spark (all filters stay residual)
  * so pruning can never change results. */
class TxSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshTable(): String =
    Files.createTempDirectory("txsrc_").resolve("t").toString

  private def batch(ids: Range, grp: String): DataFrame =
    ids.map(i => (i.toLong, grp, s"name-$i")).toDF("id", "grp", "name")

  private def clustered3(): String = {
    val t = freshTable()
    batch(0 until 100, "alpha").coalesce(1)
      .write.format("txlog").mode("append").save(t)
    batch(100 until 200, "beta").coalesce(1)
      .write.format("txlog").mode("append").save(t)
    batch(200 until 300, "gamma").coalesce(1)
      .write.format("txlog").mode("append").save(t)
    t
  }

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("format round trip: three appends are three transactions; read = native snapshot") {
    val t = clustered3()
    assert(TxLog.headVersion(spark, t) == 2L)
    val viaSource = spark.read.format("txlog").load(t)
    // the RELATION reports the recorded (declared) nullability — id was
    // written NOT NULL and the merge guard kept that truthful — while
    // the library snapshot is a file scan, which Spark relaxes to
    // nullable like every explicit read schema; values are identical
    assert(viaSource.schema.toNullable ==
      TxLog.snapshot(spark, t).get.schema.toNullable)
    assert(!viaSource.schema("id").nullable,
      "the declared NOT NULL must survive to the relation schema")
    assert(rows(viaSource) == rows(TxLog.snapshot(spark, t).get))
  }

  test("pushed filters skip files through the source seam, results identical") {
    val t = clustered3()
    val df = spark.read.format("txlog").load(t)
    val battery = Seq(
      "point" -> ($"id" === 150L),
      "range" -> ($"id" >= 250L),
      "string" -> ($"grp" === "beta"),
      "in" -> ($"id".isin(5L, 205L)),
      "or" -> ($"id" < 50L || $"id" >= 250L),
      "prefix" -> ($"name".startsWith("name-2")),
      "unsupported" -> (length($"name") === 8))
    for ((clue, p) <- battery) {
      val expected = rows(TxLog.snapshot(spark, t).get.where(p))
      assert(rows(df.where(p)) == expected, s"$clue: source scan diverged")
    }
    // the point lookup really skipped: 1 of 3 files opened
    df.where($"id" === 150L).collect()
    assert(TxLogV2.lastPrune.get() == ((1, 3)))
    // unsupported shapes keep everything (and still answer correctly)
    df.where(length($"name") === 8).collect()
    assert(TxLogV2.lastPrune.get()._1 == 3)
    // pushdown + column pruning are visible in the executed plan
    val pruned = df.where($"id" === 150L).select($"name")
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("150"), plan)
    assert(plan.contains("ReadSchema") && !plan.replaceAll("(?s)RuntimeFilters.*", "")
      .split("ReadSchema")(1).contains("grp"),
      s"projection did not prune grp from ReadSchema: $plan")
  }

  test("SQL end-to-end: CREATE TABLE USING txlog, SELECT with WHERE, INSERT INTO, INSERT OVERWRITE") {
    val t = clustered3()
    val name = s"txsrc_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $name USING txlog OPTIONS (path '$t')")
    try {
      assert(spark.sql(s"SELECT count(*) AS n FROM $name").first().getLong(0) == 300L)
      assert(spark.sql(s"SELECT name FROM $name WHERE id = 150").first().getString(0) == "name-150")
      assert(TxLogV2.lastPrune.get() == ((1, 3)), "SQL WHERE did not prune files")
      spark.sql(s"INSERT INTO $name VALUES (900, 'delta', 'name-900')")
      assert(TxLog.headVersion(spark, t) == 3L, "INSERT was not one transaction")
      assert(spark.sql(s"SELECT count(*) FROM $name").first().getLong(0) == 301L)
      spark.sql(s"INSERT OVERWRITE TABLE $name VALUES (1, 'only', 'name-1')")
      assert(spark.sql(s"SELECT count(*) FROM $name").first().getLong(0) == 1L)
      // the overwrite was a checkpoint: pre-overwrite history time-travels
      assert(TxLog.snapshotAt(spark, t, 3L).get.count() == 301L)
    } finally spark.sql(s"DROP TABLE $name")
  }

  test("save modes: overwrite replaces atomically; errorIfExists/ignore rejected per the V2 contract") {
    val t = clustered3()
    batch(0 until 5, "ow").write.format("txlog").mode("overwrite").save(t)
    assert(spark.read.format("txlog").load(t).count() == 5)
    // the overwrite was a checkpoint: pre-overwrite history time-travels
    assert(TxLog.snapshotAt(spark, t, 2L).get.count() == 300L)
    // V2 path-based saves support Append and Overwrite only — Spark
    // itself rejects ErrorIfExists/Ignore loudly (they are catalog-table
    // modes), so neither can silently write
    intercept[org.apache.spark.sql.AnalysisException] {
      batch(0 until 5, "x").write.format("txlog").mode("errorifexists").save(t)
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      batch(0 until 99, "x").write.format("txlog").mode("ignore").save(t)
    }
    assert(spark.read.format("txlog").load(t).count() == 5, "rejected mode wrote data")
  }

  test("SQL row-level DML: native DELETE / UPDATE / MERGE INTO on a txlog catalog table") {
    val t = clustered3()
    val name = s"txdml_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    spark.sql(s"CREATE TABLE $name USING txlog OPTIONS (path '$t')")
    try {
      // DELETE: three-valued semantics + minimal rewrite, through SQL —
      // Spark's runtime group filtering narrows the rewrite to the one
      // matched file; the two untouched originals survive in the live set
      spark.sql(s"DELETE FROM $name WHERE id >= 150 AND id < 160")
      assert(spark.sql(s"SELECT count(*) FROM $name").first().getLong(0) == 290L)
      assert(TxLog.pruneCount(spark, t, lit(true) === lit(true))._2 == 3,
        "SQL DELETE rewrote more than the touched file")
      // UPDATE with an expression over the old value
      spark.sql(s"UPDATE $name SET name = concat(name, '!') WHERE grp = 'beta'")
      val banged = spark.sql(s"SELECT count(*) FROM $name WHERE name LIKE '%!'").first().getLong(0)
      assert(banged == 90L, s"expected 90 updated beta rows, got $banged")
      // MERGE upsert: 5 replacements + 2 inserts via a source view
      ((165 until 170).map(i => (i.toLong, "BETA2", s"m-$i")) ++
        Seq((900L, "new", "m-900"), (901L, "new", "m-901")))
        .toDF("id", "grp", "name").createOrReplaceTempView(s"${name}_src")
      spark.sql(s"""MERGE INTO $name USING ${name}_src ON $name.id = ${name}_src.id
                    WHEN MATCHED THEN UPDATE SET *
                    WHEN NOT MATCHED THEN INSERT *""")
      assert(spark.sql(s"SELECT count(*) FROM $name").first().getLong(0) == 292L)
      assert(spark.sql(s"SELECT count(*) FROM $name WHERE grp = 'BETA2'").first().getLong(0) == 5L)
      assert(spark.sql(s"SELECT name FROM $name WHERE id = 900").first().getString(0) == "m-900")
      // every statement was one transaction: v2 (base) +3
      assert(TxLog.headVersion(spark, t) == 5L)

      // The RICHER shapes the r11 resolution rule rejected are now
      // native Spark DML planning — they RUN, with correct results:
      // (a) multi-action conditional MERGE incl. WHEN MATCHED DELETE
      spark.sql(s"""MERGE INTO $name USING ${name}_src ON $name.id = ${name}_src.id
                    WHEN MATCHED AND ${name}_src.grp = 'new' THEN DELETE
                    WHEN MATCHED THEN UPDATE SET name = concat($name.name, '?')""")
      assert(spark.sql(s"SELECT count(*) FROM $name").first().getLong(0) == 290L,
        "conditional MERGE DELETE should remove the two id-900/901 rows")
      assert(spark.sql(s"SELECT count(*) FROM $name WHERE name LIKE '%?'")
        .first().getLong(0) == 5L, "conditional MERGE UPDATE missed the 5 BETA2 rows")
      // (b) subquery DELETE
      spark.sql(s"DELETE FROM $name WHERE id IN (SELECT id FROM ${name}_src WHERE grp = 'BETA2')")
      assert(spark.sql(s"SELECT count(*) FROM $name WHERE grp = 'BETA2'").first().getLong(0) == 0L)
      assert(spark.sql(s"SELECT count(*) FROM $name").first().getLong(0) == 285L)
      // (c) non-equi extra ON condition
      spark.sql(s"""MERGE INTO $name USING ${name}_src
                    ON $name.id = ${name}_src.id AND $name.id >= 900
                    WHEN NOT MATCHED THEN INSERT *""")
      assert(spark.sql(s"SELECT count(*) FROM $name").first().getLong(0) == 292L,
        "non-equi MERGE should re-insert the 5 BETA2 + 2 new keys")
      // duplicate SET columns stay loudly rejected — by Spark's own
      // analysis now, not a custom rule
      intercept[org.apache.spark.sql.AnalysisException] {
        spark.sql(s"UPDATE $name SET grp = 'x', grp = 'y' WHERE id = 0")
      }
      // the single-use writer class keeps checkpoints token-free of DML:
      // compact + truncate, then the statement tokens are simply gone
      TxLog.compact(spark, t, targetBytes = 1L << 30)
      TxLog.vacuum(spark, t, minAgeMs = 0L)
      assert(spark.sql(s"SELECT count(*) FROM $name").first().getLong(0) == 292L)
    } finally spark.sql(s"DROP TABLE $name")
  }

  test("streaming sink: writeStream.format(txlog) commits each micro-batch exactly once") {
    val t = freshTable()
    val ckpt = Files.createTempDirectory("txsrc_ck_").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Long]
    def start() = mem.toDF.select($"value".as("id"))
      .writeStream.format("txlog")
      .option("path", t).option("checkpointLocation", ckpt)
      .start()
    val q1 = start()
    mem.addData(0L until 100L: _*); q1.processAllAvailable()
    mem.addData(100L until 200L: _*); q1.processAllAvailable()
    q1.stop()
    // restart from the checkpoint: committed epochs must not replay into
    // duplicates (the batchId token), new data must land
    val q2 = start()
    mem.addData(200L until 250L: _*); q2.processAllAvailable()
    q2.stop()
    val got = spark.read.format("txlog").load(t)
    assert(got.count() == 250)
    assert(got.select("id").distinct().count() == 250, "a replayed epoch duplicated rows")
  }

  test("streaming source: snapshot-then-tail with exact version offsets; compaction adds no duplicates") {
    val t = freshTable()
    batch(0 until 100, "a").coalesce(1).write.format("txlog").mode("append").save(t)
    val name = s"txtail_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog").option("path", t).load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("txsrc_tl_").toString)
      .start()
    q.processAllAvailable()
    assert(spark.table(name).count() == 100, "initial snapshot batch wrong")
    // live appends arrive incrementally
    batch(100 until 150, "b").coalesce(1).write.format("txlog").mode("append").save(t)
    q.processAllAvailable()
    assert(spark.table(name).count() == 150)
    // compaction mid-stream: a checkpoint rewrites already-streamed rows
    // and must NOT replay them into the tail
    TxLog.compact(spark, t, targetBytes = 1L << 30)
    batch(150 until 170, "c").coalesce(1).write.format("txlog").mode("append").save(t)
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name)
    assert(got.count() == 170, "compaction duplicated or dropped tailed rows")
    assert(got.select("id").distinct().count() == 170)
  }

  test("streaming source: incremental OPTIMIZE (compactSmall) is layout-only — the tail skips it") {
    // r13 review finding: compactSmall's non-checkpoint rewrite used to
    // kill every append-only tail ("rewrote rows (DML)") even though
    // its row multiset is unchanged — it must be skipped like full
    // compact's checkpoint, with later appends still arriving exactly
    val t = freshTable()
    (0 until 4).foreach(i => batch(i * 25 until (i + 1) * 25, "a").coalesce(1)
      .write.format("txlog").mode("append").save(t))
    val name = s"txcs_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog").option("path", t).load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("txsrc_cs_").toString)
      .start()
    q.processAllAvailable()
    assert(spark.table(name).count() == 100)
    assert(TxLog.compactSmall(spark, t, targetBytes = 1L << 30) > 0L,
      "compactSmall found nothing to pack — test setup broken")
    batch(100 until 120, "b").coalesce(1).write.format("txlog").mode("append").save(t)
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name)
    assert(got.count() == 120, "compactSmall killed, duplicated or dropped the tail")
    assert(got.select("id").distinct().count() == 120)
    // a COLD range start crossing the compactSmall version is exact too
    val name2 = s"txcs2_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q2 = spark.readStream.format("txlog").option("startingVersion", "0").load(t)
      .writeStream.format("memory").queryName(name2)
      .option("checkpointLocation", Files.createTempDirectory("txsrc_cs2_").toString)
      .start()
    q2.processAllAvailable(); q2.stop()
    assert(spark.table(name2).count() == 120,
      "range replay over a compactSmall version double-served packed rows")
  }

  test("streaming source end-to-end: tail table A into txlog table B, restart, B == A exactly") {
    val a = freshTable(); val b = freshTable()
    val ckpt = Files.createTempDirectory("txsrc_ab_").toString
    def pump(): Unit = {
      val q = spark.readStream.format("txlog").option("path", a).load()
        .writeStream.format("txlog")
        .option("path", b).option("checkpointLocation", ckpt)
        .start()
      q.processAllAvailable(); q.stop()
    }
    batch(0 until 80, "a").coalesce(1).write.format("txlog").mode("append").save(a)
    batch(80 until 120, "a").coalesce(1).write.format("txlog").mode("append").save(a)
    pump()
    assert(spark.read.format("txlog").load(b).count() == 120)
    // more appends while the stream is DOWN; restart resumes at the
    // checkpointed version — exactly-once on BOTH sides of the bus
    batch(120 until 200, "a").coalesce(1).write.format("txlog").mode("append").save(a)
    pump()
    val gotB = spark.read.format("txlog").load(b)
    assert(gotB.count() == 200, "restart lost or duplicated a batch")
    assert(rows(gotB) == rows(spark.read.format("txlog").load(a)))
  }

  test("streaming source is append-only: DML or overwrite in the tail range fails loudly") {
    val t = freshTable()
    batch(0 until 60, "a").coalesce(1).write.format("txlog").mode("append").save(t)
    val name = s"txdml_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog").option("path", t).load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("txsrc_ao_").toString)
      .start()
    q.processAllAvailable()
    TxLog.delete(spark, t, $"id" === 5L, "d", 0L)
    val e = intercept[Exception] { q.processAllAvailable(); q.awaitTermination() }
    assert(e.getMessage != null)
    assert(!q.isActive)
  }

  test("streaming source guards: truncated snapshot and overwrite-without-removes are loud") {
    import graft.storage.TxLogMicroBatchStream
    def stream(t: String, sch: org.apache.spark.sql.types.StructType) =
      new TxLogMicroBatchStream(spark, t, sch, sch)
    // (a) initial snapshot whose manifests were vacuum-truncated: a
    // restart replaying batch 0 after compact+vacuum must throw, not
    // silently deliver an empty snapshot
    val t = freshTable()
    (0 until 3).foreach(b => batch(b * 10 until (b + 1) * 10, "a").coalesce(1)
      .write.format("txlog").mode("append").save(t))
    val sch = TxLog.snapshot(spark, t).get.schema
    TxLog.compact(spark, t, targetBytes = 1L << 30) // v3 absorbs tokens
    TxLog.vacuum(spark, t, minAgeMs = 0L)           // truncates v0..v2
    val src = stream(t, sch)
    val e = intercept[IllegalStateException] {
      src.planInputPartitions(src.initialOffset(), src.deserializeOffset("2"))
    }
    assert(e.getMessage.contains("vacuum"), e.getMessage)
    // (b) overwrite detected STRUCTURALLY (writer-id class), so even an
    // overwrite whose removes list is empty — live set emptied by a
    // prior delete-all — cannot be mistaken for a compaction
    val t2 = freshTable()
    batch(0 until 10, "a").coalesce(1).write.format("txlog").mode("append").save(t2)
    val sch2 = TxLog.snapshot(spark, t2).get.schema
    TxLog.delete(spark, t2, lit(true), "d", 0L) // empty live set (v1)
    batch(0 until 5, "b").coalesce(1).write.format("txlog").mode("overwrite").save(t2) // v2
    val src2 = stream(t2, sch2)
    val e2 = intercept[IllegalStateException] {
      src2.planInputPartitions(src2.deserializeOffset("1"), src2.deserializeOffset("2"))
    }
    assert(e2.getMessage.contains("OVERWROTE"), e2.getMessage)
  }

  test("two streaming queries into one table get distinct writer identities (no cross-query dedupe)") {
    // both queries emit epoch 0 — a shared token namespace would drop
    // the second query's data as a "replay" (review finding, r11)
    val t = freshTable()
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    def run(lo: Long): Unit = {
      val mem = MemoryStream[Long]
      val q = mem.toDF.select($"value".as("id")).writeStream.format("txlog")
        .option("path", t)
        .option("checkpointLocation", Files.createTempDirectory("txsrc_ck2_").toString)
        .start()
      mem.addData(lo until lo + 10L: _*); q.processAllAvailable(); q.stop()
    }
    run(0L); run(100L)
    assert(spark.read.format("txlog").load(t).count() == 20,
      "second query's epoch 0 was deduped against the first query's")
  }

  test("explicit startingVersion=0 takes the range path: DML history is loud, not a silent snapshot") {
    import graft.storage.TxLogMicroBatchStream
    // startingVersion=0 lands at the same initial offset (−1) as the
    // no-option snapshot; conflating them would silently serve the NET
    // snapshot over a history with rewrites (r12 review finding)
    val t = freshTable()
    batch(0 until 30, "a").coalesce(1).write.format("txlog").mode("append").save(t) // v0
    TxLog.delete(spark, t, $"id" === 5L, "d", 0L)                                   // v1 DML
    val sch = TxLog.snapshot(spark, t).get.schema
    // the fixed branch, driven directly: start = Some(−1) is EXACTLY
    // what the option surface resolves "startingVersion=0" to
    val src = new TxLogMicroBatchStream(spark, t, sch, sch, start = Some(-1L))
    val e = intercept[IllegalStateException] {
      src.planInputPartitions(src.initialOffset(), src.deserializeOffset("1"))
    }
    assert(e.getMessage.contains("rewrote rows"), e.getMessage)
    // while the no-option stream legitimately snapshots the net state
    val snap = new TxLogMicroBatchStream(spark, t, sch, sch)
    val parts = snap.planInputPartitions(snap.initialOffset(), snap.deserializeOffset("1"))
    assert(parts.nonEmpty, "snapshot stream must still serve the net state")
    // and end-to-end through the option surface the query dies loudly
    val name = s"txsv0_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    val q = spark.readStream.format("txlog").option("startingVersion", "0").load(t)
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", Files.createTempDirectory("txsrc_sv0_").toString)
      .start()
    val e2 = intercept[Exception] { q.processAllAvailable(); q.awaitTermination() }
    assert(e2.getMessage != null)
    assert(!q.isActive, "startingVersion=0 over DML history must terminate the query")
  }
}
