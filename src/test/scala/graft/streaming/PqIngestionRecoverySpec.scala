package graft.streaming

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sim.Similarity
import graft.storage.TxLog

/** The composed r11 pieces under fire: streaming embedding ingestion
  * into a TxLog-committed IVF-PQ index with frozen codebooks. The
  * stream is killed in each crash window, restarted from its
  * checkpoint, and the final index must (a) hold every vector exactly
  * once and (b) answer the standard probe IDENTICALLY to the one-shot
  * bucketed index built from the same corpus and codebooks — the
  * ingestion path and the batch path are interchangeable. */
class PqIngestionRecoverySpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterAll {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  override def afterAll(): Unit =
    Seq(ref, s"${ref}_pqcb", s"${ref}_coarse")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

  val sf = "/root/testdata/sf0.001"

  // run-nonce suffix: concurrent suite runs share spark-warehouse/
  private val ref = s"pq_ingest_ref_${java.util.UUID.randomUUID.toString.take(8)}"

  /** One-shot reference index (also the source of the frozen
    * codebooks) + the corpus split into three one-file micro-batches. */
  lazy val fixture: (String, org.apache.spark.sql.types.StructType, Seq[org.apache.spark.sql.Row]) = {
    Similarity.writeIvfPqIndex(spark, sf, ref)
    val vecs = graft.Tables(spark, sf, "embeddings")
      .select("vec_id", "label", "embedding").cache()
    val cuts = vecs.selectExpr(
      "percentile(vec_id, 0.3333)", "percentile(vec_id, 0.6667)").collect()(0)
    val (c1, c2) = (cuts.getDouble(0), cuts.getDouble(1))
    val tmp = Files.createTempDirectory("pq_ingest_stream_")
    val streamDir = tmp.resolve("stream")
    Files.createDirectory(streamDir)
    import org.apache.spark.sql.functions.col
    Seq((col("vec_id") < c1, 0),
        (col("vec_id") >= c1 && col("vec_id") < c2, 1),
        (col("vec_id") >= c2, 2)).foreach { case (p, i) =>
      val part = tmp.resolve(s"part$i")
      vecs.filter(p).coalesce(1).write.parquet(part.toString)
      val f = Files.list(part).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).next()
      Files.copy(f, streamDir.resolve(s"f$i.parquet"))
    }
    val reference = Similarity.probeIvfPqIndex(spark, ref).collect().toSeq
    val schema = vecs.schema
    vecs.unpersist()
    (streamDir.toString, schema, reference)
  }

  private var runId = 0

  /** Drives the ingestion stream; `crash(batch, epochId, indexDir)`
    * fires once from the pre-commit hook. Returns (index rows, probe
    * rows). */
  private def run(crash: (DataFrame, Long, String) => Unit = null): (Seq[String], Seq[org.apache.spark.sql.Row]) = {
    runId += 1
    val (dir, schema, _) = fixture
    val indexDir = Files.createTempDirectory(s"pq_ingest_idx_$runId").resolve("t").toString
    val ckpt = Files.createTempDirectory(s"pq_ingest_ckpt_$runId").toString
    @volatile var crashed = false
    val hook: (DataFrame, Long) => Unit = { (df, id) =>
      if (crash != null && !crashed) {
        try crash(df, id, indexDir)
        catch { case e: Throwable => crashed = true; throw e }
      }
    }
    def start() = Similarity.ivfPqIngestionStream(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(dir),
      indexDir, s"${ref}_pqcb", s"${ref}_coarse", ckpt, hook)
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
    val idx = TxLog.snapshot(spark, indexDir).get
    val rows = idx.select($"vec_id", $"cell", $"codes".cast("string"))
      .collect().map(_.toString).toSeq.sorted
    val probe = Similarity.probeIvfPqIndexOf(idx,
      spark.table(s"${ref}_pqcb"),
      spark.table(s"${ref}_coarse")).collect().toSeq
    (rows, probe)
  }

  lazy val baseline: (Seq[String], Seq[org.apache.spark.sql.Row]) = run()

  test("crash-free ingestion: streamed index probes identically to the one-shot index") {
    val (rows, probe) = baseline
    assert(rows.size == 500, "index must hold every vector exactly once")
    assert(probe == fixture._3,
      "streamed TxLog index answers differently from the one-shot bucketed index")
  }

  test("crash before the batch commit: replay converges to the crash-free index") {
    val out = run { (_, id, _) =>
      if (id == 1) sys.error("injected crash (pre-commit)")
    }
    assert(out == baseline)
  }

  test("crash after an orphaned encode write: orphan invisible, replay exact") {
    val out = run { (df, id, indexDir) =>
      if (id == 1) {
        // the crashed attempt's encoded rows landed as data files the
        // manifest never named
        Similarity.encodeForIvfPqIndex(df,
          spark.table(s"${ref}_pqcb"), spark.table(s"${ref}_coarse"))
          .write.parquet(s"$indexDir/data/orphan-epoch$id")
        sys.error("injected crash (post-data-write)")
      }
    }
    assert(out == baseline)
  }

  test("crash after the commit published: replayed epoch is a token no-op") {
    val out = run { (df, id, indexDir) =>
      if (id == 1) {
        // perform the crashing attempt's commit for real, then die —
        // the checkpoint replays epoch 1 into an already-committed token
        TxLog.commit(Similarity.encodeForIvfPqIndex(df,
          spark.table(s"${ref}_pqcb"), spark.table(s"${ref}_coarse")),
          indexDir, "ivfpq-ingest", id)
        sys.error("injected crash (post-commit)")
      }
    }
    assert(out == baseline)
  }
}
