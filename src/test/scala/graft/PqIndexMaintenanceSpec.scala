package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sim.Similarity
import graft.storage.TxLog

/** IVF-PQ index MAINTENANCE under sustained ingestion (r11 verdict
  * item #8) — the band index has in-loop compaction + crash repair;
  * this spec gives the streamed IVF-PQ index its operational story:
  *
  *  1. sustained admits decay the layout: every epoch commits its own
  *     small files with cells smeared across all of them, so a probe
  *     reads every file; [[TxLog.clusterBy]] on `cell` restores a
  *     cell-major layout as ONE atomic checkpoint — probe results
  *     row-identical, file count collapsed, manifest zone maps prune
  *     single-cell scans again, latency restored (loose bound: host
  *     noise — the DIRECTION is the claim, as in IndexMaintenanceSpec);
  *
  *  2. codebook DRIFT is measurable and repairable: frozen-codebook
  *     ingestion keeps codes stable by design, so a shifted corpus
  *     degrades routing silently — [[Similarity.ivfPqCellDrift]] is the
  *     deterministic scalar (exactly 0 right after training, > 0 after
  *     shifted admits), and [[Similarity.retrainIvfPqIndex]] retrains +
  *     re-encodes + swaps atomically, driving it back to exactly 0 with
  *     the index bit-identical to a from-scratch encode of the current
  *     corpus. Probe row-identity through maintenance is asserted at
  *     every step. */
class PqIndexMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("sustained admits decay probe latency; clusterBy(cell) restores it row-identically") {
    import spark.implicits._
    val nonce = java.util.UUID.randomUUID.toString.take(8)
    val cbT = s"pqmaint_cb_$nonce"; val coarseT = s"pqmaint_coarse_$nonce"
    val idxDir = Files.createTempDirectory("pqmaint_").resolve("idx").toString
    try {
      // frozen codebooks trained once on the full corpus (the
      // writeIvfPqIndex recipe, minus the one-shot bucketed table)
      Similarity.trainedCodebook(spark, dir).write.format("parquet")
        .mode("overwrite").saveAsTable(coarseT)
      val q = graft.sim.KmeansQuantizer.quantized(Tables(spark, dir, "embeddings"))
      graft.sim.PqQuantizer.codebooks(graft.sim.PqQuantizer.subvectors(q))
        .write.format("parquet").mode("overwrite").saveAsTable(cbT)

      // 48 sustained admits (one TxLog txn each, frozen-codebook encode)
      val all = Tables(spark, dir, "embeddings").orderBy("vec_id").collect()
      val batches = all.grouped(math.max(1, all.length / 48)).take(48).toSeq
      assert(batches.length == 48, s"fixture too small: ${batches.length}")
      val sch = Tables(spark, dir, "embeddings").schema
      def admit(rows: Seq[org.apache.spark.sql.Row], batchId: Long): Unit = {
        val b = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), sch)
        TxLog.commit(Similarity.encodeForIvfPqIndex(b,
          spark.table(cbT), spark.table(coarseT)), idxDir, "pq-admit", batchId)
        ()
      }
      def probe(): Set[(Long, Long)] =
        Similarity.probeIvfPqCandidatesOf(TxLog.snapshot(spark, idxDir).get,
          spark.table(cbT), spark.table(coarseT))
          .select("query_id", "vec_id")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def timedProbe(): (Double, Set[(Long, Long)]) = {
        val runs = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); val r = probe()
          ((System.nanoTime() - t0) / 1e9, r)
        }
        (runs.map(_._1).min, runs.head._2)
      }
      val lat = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      batches.zipWithIndex.foreach { case (b, i) =>
        admit(b.toIndexedSeq, i.toLong)
        if (i == 0) lat("K=1") = timedProbe()._1
        if (i == 15) lat("K=16") = timedProbe()._1
      }
      val (t48, before) = timedProbe()
      lat("K=48") = t48
      val filesBefore = TxLog.pruneCount(spark, idxDir, lit(true) === lit(true))._2

      // maintenance: one atomic cell-major re-layout
      TxLog.clusterBy(spark, idxDir, Seq("cell"), targetFiles = 8)
      val (tAfter, after) = timedProbe()
      lat("clustered") = tAfter
      val filesAfter = TxLog.pruneCount(spark, idxDir, lit(true) === lit(true))._2
      info(s"probe latency (min-of-3, sec): ${lat.map { case (k, v) => f"$k=$v%.3f" }.mkString(", ")}")
      info(s"index files: $filesBefore before clusterBy, $filesAfter after")
      assert(after == before, "clusterBy changed probe candidates")
      assert(before.nonEmpty, "vacuous: probe produced no candidates")
      assert(filesAfter < filesBefore,
        s"clusterBy did not collapse files ($filesBefore -> $filesAfter)")
      assert(lat("clustered") <= lat("K=48") * 1.5,
        s"clusterBy did not restore probe latency: $lat")
      // cell-major layout: a single-cell scan prunes most files via the
      // fresh checkpoint zone maps
      val (kept, total) = TxLog.pruneCount(spark, idxDir, $"cell" === 3)
      assert(kept < total, s"single-cell scan read every file ($kept/$total)")
      // exactly-once ledger intact through maintenance: a replayed admit
      // is still a no-op
      assert(TxLog.commit(spark.range(1).toDF("x"), idxDir, "pq-admit", 0L) == -1L)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $cbT")
      spark.sql(s"DROP TABLE IF EXISTS $coarseT")
    }
  }

  test("codebook drift: exactly 0 after training, > 0 after shifted admits, 0 again after atomic retrain") {
    import spark.implicits._
    val nonce = java.util.UUID.randomUUID.toString.take(8)
    val cbT = s"pqdrift_cb_$nonce"; val coarseT = s"pqdrift_coarse_$nonce"
    val idxDir = Files.createTempDirectory("pqdrift_").resolve("idx").toString
    try {
      Similarity.trainedCodebook(spark, dir).write.format("parquet")
        .mode("overwrite").saveAsTable(coarseT)
      val q = graft.sim.KmeansQuantizer.quantized(Tables(spark, dir, "embeddings"))
      graft.sim.PqQuantizer.codebooks(graft.sim.PqQuantizer.subvectors(q))
        .write.format("parquet").mode("overwrite").saveAsTable(cbT)
      val base = Tables(spark, dir, "embeddings")
      TxLog.commit(Similarity.encodeForIvfPqIndex(base,
        spark.table(cbT), spark.table(coarseT)), idxDir, "seed", 0L)
      // same corpus the router was trained on → the fresh router agrees
      // with the frozen one EXACTLY (integer trainer, same seeds)
      assert(Similarity.ivfPqCellDrift(spark, idxDir) == 0.0)

      // distribution shift: a +0.3-offset copy of the corpus arrives
      // (new vec_ids), still encoded with the FROZEN codebooks
      val shifted = base.select(
        ($"vec_id" + 1000000L).as("vec_id"), $"label",
        transform($"embedding", x => x + lit(0.3f)).as("embedding"))
      TxLog.commit(Similarity.encodeForIvfPqIndex(shifted,
        spark.table(cbT), spark.table(coarseT)), idxDir, "seed", 1L)
      val drifted = Similarity.ivfPqCellDrift(spark, idxDir)
      info(f"cell drift after shifted admits: $drifted%.3f")
      assert(drifted > 0.05, s"expected visible drift, got $drifted")

      // atomic retrain: new codebooks from the CURRENT corpus, full
      // re-encode, checkpoint swap — drift back to exactly 0, and the
      // index is bit-identical to a from-scratch encode
      val headBefore = TxLog.headVersion(spark, idxDir)
      Similarity.retrainIvfPqIndex(spark, idxDir, cbT, coarseT)
      assert(Similarity.ivfPqCellDrift(spark, idxDir) == 0.0,
        "retrain did not zero the drift")
      val idx = TxLog.snapshot(spark, idxDir).get
      val fromScratch = Similarity.encodeForIvfPqIndex(
        idx.select($"vec_id", $"label", $"v".as("embedding")),
        spark.table(cbT), spark.table(coarseT))
      assert(idx.select($"vec_id", $"cell", $"codes").exceptAll(
        fromScratch.select($"vec_id", $"cell", $"codes")).isEmpty,
        "retrained index diverges from a from-scratch encode")
      // the swap was one checkpoint: the pre-retrain index time-travels
      assert(TxLog.snapshotAt(spark, idxDir, headBefore).get.count() == idx.count())
      // probes still serve (query ids < NumQueries are in the corpus)
      assert(Similarity.probeIvfPqCandidatesOf(idx,
        spark.table(cbT), spark.table(coarseT)).count() > 0)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $cbT")
      spark.sql(s"DROP TABLE IF EXISTS $coarseT")
    }
  }
}
