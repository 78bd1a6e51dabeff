package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.storage.TxLog

/** Incremental corpus curation over TxLog MERGE — the streaming sibling
  * of `pipeline_curate`: documents arrive (and get REVISED) in
  * micro-batches; each batch's per-doc verdict upserts into a curated
  * TxLog table keyed by doc_id, so the table always holds exactly ONE
  * row per document — the latest verdict.
  *
  * What this proves beyond TxDmlSpec: the upsert loop composed with
  * Structured Streaming's at-least-once foreachBatch is exactly-once
  * END-TO-END — a crash injected in merge's stage-but-don't-publish
  * window (data files on disk, no manifest) followed by a checkpoint
  * restart replays the SAME epoch, and the replayed merge converges to
  * the batch-computed truth with no duplicate doc_ids and no lost
  * revision, because the (writerId, epochId) token and the atomic
  * manifest publish make the replay either a clean re-run (original
  * never published) or a no-op (it did).
  *
  * At 100 TB this is the shape a living corpus needs: revisions arrive
  * forever, the curated table is petabyte-scale, and each micro-batch
  * must touch only the files its doc_ids live in (TxLog.merge's
  * zone-map candidate pruning) — never rewrite the table. */
class CurationMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** The per-batch curation verdict — deterministic, so batch and
    * streaming compute identical rows for identical input versions.
    * (The verdict MATH is oracle-checked elsewhere — text_quality /
    * pipeline_curate; this spec is about the upsert protocol.) */
  private def verdicts(docs: DataFrame): DataFrame =
    docs.select(
      $"doc_id",
      size(split($"text", " ")).cast("long").as("n_tokens"),
      (size(split($"text", " ")) >= 30).as("passes_quality"),
      xxhash64($"text").as("content_hash"))

  test("streaming upsert-merge == batch curation under a crash in the stage-without-publish window") {
    val docs = graft.Tables(spark, sf, "documents")
      .select($"doc_id", $"text").orderBy($"doc_id").limit(500).cache()
    // three arrivals: v0 of ids [0,200), v0 of [200,500), then a batch
    // that REVISES [0,100) (appended marker changes token count parity)
    // — the final truth is the LATEST version of each doc
    val b1 = docs.where($"doc_id" < 200)
    val b2 = docs.where($"doc_id" >= 200)
    val b3 = docs.where($"doc_id" < 100)
      .select($"doc_id", concat($"text", lit(" rev rev rev")).as("text"))
    val latest = b1.where($"doc_id" >= 100).unionByName(b2).unionByName(b3)
    val expected = verdicts(latest).collect().map(_.toString).sorted.toSeq

    val table = Files.createTempDirectory("curation_").resolve("t").toString
    val ckpt = Files.createTempDirectory("curation_ck_").toString
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext

    @volatile var bomb = true
    def start(mem: MemoryStream[(Long, String)]) =
      mem.toDF.toDF("doc_id", "text").writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (df: DataFrame, epoch: Long) =>
          TxLog.merge(verdicts(df), table, Seq("doc_id"), "curator", epoch,
            beforeCommit = () =>
              // epoch 1's FIRST attempt dies with its rewrite staged but
              // unpublished — the worst window (data on disk, invisible)
              if (epoch == 1L && bomb) { bomb = false; sys.error("injected crash") })
          ()
        }.start()

    val mem = MemoryStream[(Long, String)]
    val q1 = start(mem)
    mem.addData(b1.as[(Long, String)].collect().toSeq: _*)
    q1.processAllAvailable()
    mem.addData(b2.as[(Long, String)].collect().toSeq: _*)
    intercept[Exception] { q1.processAllAvailable(); q1.awaitTermination() }
    assert(!bomb, "crash was not injected")
    // restart from the checkpoint: epoch 1 replays, then the revisions land
    val q2 = start(mem)
    mem.addData(b3.as[(Long, String)].collect().toSeq: _*)
    q2.processAllAvailable()
    q2.stop()

    val got = TxLog.snapshot(spark, table).get
    assert(got.count() == 500)
    assert(got.select("doc_id").distinct().count() == 500,
      "upsert produced duplicate doc_ids")
    assert(got.collect().map(_.toString).sorted.toSeq == expected,
      "curated table diverged from the batch-computed truth")
    // the revised docs really carry their v1 verdicts
    val v1 = verdicts(b3).collect().map(_.toString).sorted.toSeq
    assert(got.where($"doc_id" < 100).collect().map(_.toString).sorted.toSeq == v1)
    docs.unpersist()
  }

  test("revision micro-batch touches only the files its doc_ids live in") {
    // two disjoint single-file generations; a revision batch confined to
    // the first generation's key range must leave the second untouched
    val table = Files.createTempDirectory("curation_zm_").resolve("t").toString
    val docs = graft.Tables(spark, sf, "documents").select($"doc_id", $"text")
    TxLog.commit(verdicts(docs.where($"doc_id" < 250)).coalesce(1), table, "w", 0L)
    TxLog.commit(verdicts(docs.where($"doc_id" >= 250)).coalesce(1), table, "w", 1L)
    val rev = verdicts(docs.where($"doc_id" < 50)
      .select($"doc_id", concat($"text", lit(" x")).as("text")))
    val r = TxLog.merge(rev, table, Seq("doc_id"), "curator", 99L)
    assert(r.removedFiles == 1,
      s"revision spanning only the first file rewrote ${r.removedFiles} files")
  }
}
