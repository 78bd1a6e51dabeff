package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.dedup.Dedup

/** Crash-recovery proof for the EXACTLY-ONCE probe→admit ingestion loop
  * ([[Dedup.dedupIngestionStream]]): the loop is killed in BOTH
  * at-least-once windows —
  *
  *  1. between probe and admit (pairs written, index not yet extended);
  *  2. after the admit committed but before the checkpoint recorded the
  *     batch (the window a blind SaveMode.Append double-appends in);
  *  3. MID-job-commit: only a SUBSET of the batch's band rows published
  *     with the batch_id (FileOutputCommitter's job commit is a rename
  *     sequence, not atomic) — the window where a skip-on-presence
  *     ledger permanently loses the unpublished rows;
  *
  * restarted from its checkpoint, and must end with the index contents
  * AND per-batch pair outputs of the crash-free run — byte-identical,
  * no duplicated band rows, no self-pairs. Windows 2–3 are what
  * [[Dedup.bandIndexAdmitIdempotent]]'s anti-join repair and
  * [[Dedup.bandIndexProbeBatchBefore]]'s `batch_id < id` snapshot
  * exist for. */
class IngestionRecoverySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** documents split into 3 doc_id-tercile parquet files; with
    * maxFilesPerTrigger=1 each is one deterministic micro-batch. */
  lazy val streamFixture: (String, org.apache.spark.sql.types.StructType) = {
    val tmp = Files.createTempDirectory("ingest_stream_")
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text").cache()
    val cuts = docs.selectExpr(
      "percentile(doc_id, 0.3333)", "percentile(doc_id, 0.6667)").collect()(0)
    val (c1, c2) = (cuts.getDouble(0), cuts.getDouble(1))
    val streamDir = tmp.resolve("stream")
    Files.createDirectory(streamDir)
    Seq((col("doc_id") < c1, 0),
        (col("doc_id") >= c1 && col("doc_id") < c2, 1),
        (col("doc_id") >= c2, 2)).foreach { case (p, i) =>
      val part = tmp.resolve(s"part$i")
      docs.filter(p).coalesce(1).write.parquet(part.toString)
      val f = Files.list(part).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).next()
      Files.copy(f, streamDir.resolve(s"f$i.parquet"))
    }
    val schema = docs.schema
    docs.unpersist()
    (streamDir.toString, schema)
  }

  private var runId = 0

  /** Run the ingestion loop over the 3-batch source into fresh
    * table/pairs/checkpoint. `crash`: invoked in the beforeAdmit seam
    * (first attempt only — the driver rethrows into the stream, then we
    * restart from the same checkpoint). `compactEvery` forwards to the
    * loop's maintenance policy (default 0 = off, matching the baseline
    * runs that predate in-loop compaction). Returns (index rows incl.
    * batch_id, pairs rows per batch dir). */
  private def run(crash: (DataFrame, Long) => Unit = null,
                  compactEvery: Int = 0)
      : (Seq[String], Map[Long, Seq[String]]) = {
    runId += 1
    val (dir, schema) = streamFixture
    val table = s"ingest_idx_$runId"
    // self-heal after a killed JVM: the catalog forgets the managed
    // table but its warehouse location survives, and the next run's
    // CTAS dies on LOCATION_ALREADY_EXISTS — drop both sides first
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).toSeq.flatten.foreach(rm); f.delete(); ()
      }
      rm(loc)
    }
    val pairsDir = Files.createTempDirectory(s"ingest_pairs_$runId").toString
    val ckpt = Files.createTempDirectory(s"ingest_ckpt_$runId").toString
    @volatile var crashed = false
    val hook: (DataFrame, Long) => Unit = { (df, id) =>
      if (crash != null && !crashed) {
        try crash(df, id)
        catch { case e: Throwable => crashed = true; throw e }
      }
    }
    def start() = Dedup.dedupIngestionStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir),
      table, pairsDir, ckpt, hook, compactEvery)
    val q1 = start()
    if (crash != null) {
      val ex = intercept[Throwable] { q1.processAllAvailable() }
      val mentionsInjected = Iterator.iterate(ex)(_.getCause)
        .takeWhile(_ != null).take(10)
        .exists(e => Option(e.getMessage).exists(_.contains("injected crash")))
      assert(mentionsInjected, s"query failed for the wrong reason: $ex")
      q1.stop()
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()
    } else {
      try q1.processAllAvailable() finally q1.stop()
    }
    val idx = spark.table(table)
      .collect().map(_.toString).toSeq.sorted
    val pairs = (0L to 2L).map { id =>
      id -> spark.read.parquet(s"$pairsDir/batch_id=$id")
        .collect().map(_.toString).toSeq.sorted
    }.toMap
    spark.sql(s"DROP TABLE IF EXISTS $table")
    (idx, pairs)
  }

  lazy val baseline: (Seq[String], Map[Long, Seq[String]]) = run()

  test("crash-free loop: every batch admitted exactly once, no self-pairs") {
    val (idx, pairs) = baseline
    assert(idx.nonEmpty)
    // three distinct batch ids in the index, all documents banded once
    val byBatch = idx.map(_.split(",").last.stripSuffix("]")).distinct
    assert(byBatch.sorted.toSeq == Seq("0", "1", "2"))
    assert(pairs(0L).isEmpty, "batch 0 probes an empty corpus")
    pairs.values.flatten.foreach { p =>
      val Array(a, b) = p.stripPrefix("[").stripSuffix("]").split(",")
      assert(a != b, s"self-pair leaked: $p")
    }
  }

  test("crash between probe and admit: restart restores identical index and pairs") {
    val (idx, pairs) = run { (_, id) =>
      if (id == 1) sys.error("injected crash (between probe and admit)")
    }
    assert(idx == baseline._1, "index contents differ after recovery")
    assert(pairs == baseline._2, "pair outputs differ after recovery")
  }

  test("crash after admit committed: replay is a no-op admit, identical outputs") {
    // simulate the worst window: the admit's job COMMITTED, then the
    // driver died before the checkpoint advanced — the replayed batch
    // must (a) probe the pre-batch snapshot (not see itself), (b) skip
    // the already-committed admit instead of double-appending
    var table: String = null
    val (idx, pairs) = run { (df, id) =>
      if (id == 1) {
        table = s"ingest_idx_$runId"
        Dedup.bandIndexAdmitIdempotent(df, table, id)
        sys.error("injected crash (post-admit)")
      }
    }
    assert(idx == baseline._1,
      "index differs — double-append or missed admit after post-admit crash")
    assert(pairs == baseline._2, "pair outputs differ after post-admit crash")
  }

  test("crash MID-job-commit (partial band rows published): replay repairs the complement") {
    // the advisor's window: the admit's job commit renamed SOME of the
    // batch's files and died — band rows for a subset of the batch's
    // docs are published under the real batch_id. A skip-on-presence
    // ledger would lose the rest forever; the anti-join repair must
    // append exactly the complement on replay.
    val (idx, pairs) = run { (df, id) =>
      if (id == 1) {
        val table = s"ingest_idx_$runId"
        Dedup.bandIndexAdmitIdempotent(
          df.filter(col("doc_id") % 2 === 0), table, id)
        sys.error("injected crash (mid-job-commit, partial publish)")
      }
    }
    assert(idx == baseline._1,
      "index differs — partial publish was not repaired (or was double-appended)")
    assert(pairs == baseline._2, "pair outputs differ after partial-publish crash")
  }

  test("compaction interleaved with ingestion: contents identical to the compaction-free run") {
    // compact after every admit — the most aggressive interleaving the
    // policy allows — and require byte-identical index contents AND
    // probe pairs vs the never-compacted baseline
    val (idx, pairs) = run(crash = null, compactEvery = 1)
    assert(idx == baseline._1, "in-loop compaction changed index contents")
    assert(pairs == baseline._2, "in-loop compaction changed probe pairs")
  }

  test("crash DURING compaction (between DROP and RENAME): restart self-heals, identical outputs") {
    // the non-transactional window compactBandIndex documents: live
    // table dropped, complete rewrite stranded under __compact, driver
    // dies. Without recoverBandIndexCompaction the restarted loop would
    // probe a missing table as an EMPTY corpus and silently forget
    // every prior admit — the worst failure mode in this file.
    val (idx, pairs) = run { (df, id) =>
      if (id == 1) {
        val table = s"ingest_idx_$runId"
        Dedup.compactBandIndex(df.sparkSession, table,
          afterDrop = () => sys.error("injected crash (mid-compaction)"))
      }
    }
    assert(idx == baseline._1, "index differs after mid-compaction crash recovery")
    assert(pairs == baseline._2, "pairs differ after mid-compaction crash recovery")
  }
}
