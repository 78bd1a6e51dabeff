package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.storage.TxLog

/** The persisted IVF-PQ ANN index of a CURATED embedding corpus —
  * maintained incrementally from the corpus's change data feed, the
  * [[graft.dedup.CuratedIndex]] pattern applied to the similarity
  * side: deletions and edits RETRACT code rows instead of leaving
  * phantom neighbors behind.
  *
  * Both tables are TxLog: the corpus carries `changeFeed=true`; the
  * index holds [[Similarity.encodeForIvfPqIndex]]'s rows (vec_id,
  * label, v, norm, cell, codes) encoded with FROZEN codebooks
  * ([[Similarity.trainIvfPqCodebooks]] bootstraps them — arriving or
  * edited vectors never retrain anything, the stable-code-meaning
  * contract; [[Similarity.ivfPqCellDrift]] +
  * [[Similarity.retrainIvfPqIndex]] remain the drift story). Each
  * feed micro-batch retracts every touched vec_id and admits each
  * vector's NET final state (a window may hold a vector's whole
  * lifecycle) as two idempotently tokened TxLog transactions — the
  * exactly-once-under-replay argument of the streaming sink, reused.
  *
  * Probes ([[probe]]) serve from the maintained snapshot through the
  * standard ADC + exact-re-rank path and are row-identical to probing
  * a from-scratch encode of the live corpus ([[rebuild]]) — the
  * contract CuratedIvfPqSpec pins through deletes and embedding
  * edits. At 100 TB the per-batch cost is the batch's encode plus a
  * copy-on-write delete that zone-map-prunes on `vec_id`. */
object CuratedIvfPq {

  /** Encode of the corpus's LIVE rows with the frozen codebooks — the
    * oracle the maintained index must equal. */
  def rebuild(s: SparkSession, corpus: String,
              cbTable: String, coarseTable: String): DataFrame =
    Similarity.encodeForIvfPqIndex(
      s.read.format("txlog").load(corpus),
      s.table(cbTable), s.table(coarseTable))

  /** Maintain `index` from `corpus`'s change feed: retract touched
    * vec_ids, admit net-final vectors encoded with the frozen
    * codebooks — `<writerId>-del`/`-ins` tokens per batch id. */
  def maintainFromFeed(s: SparkSession, corpus: String, index: String,
                       cbTable: String, coarseTable: String,
                       checkpoint: String,
                       writerId: String = "curated-ivfpq")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import s.implicits._
    s.readStream.format("txlog").option("readChangeFeed", "true").load(corpus)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: DataFrame, id: Long) =>
        // index-empty guard before the driver collect: the snapshot
        // batch is corpus-sized (see CuratedIndex's note)
        if (TxLog.headVersion(s, index) >= 0L) {
          val touched = df.select($"vec_id").distinct()
            .as[Long].collect() // batch-sized
          if (touched.nonEmpty)
            TxLog.delete(s, index, $"vec_id".isin(touched.map(Long.box): _*),
              s"$writerId-del", id)
        }
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"vec_id")
          .orderBy($"_commit_version".desc,
            when($"_change_type" === "insert", 1).otherwise(0).desc)
        val finalIns = df
          .withColumn("_rn", row_number().over(w))
          .where($"_rn" === 1 && $"_change_type" === "insert")
          .drop("_rn", "_change_type", "_commit_version")
        if (!finalIns.isEmpty)
          TxLog.commit(
            Similarity.encodeForIvfPqIndex(finalIns,
              s.table(cbTable), s.table(coarseTable)),
            index, s"$writerId-ins", id)
        ()
      }
      .start()
  }

  /** ADC candidates + exact re-rank against the maintained snapshot —
    * [[Similarity.probeIvfPqIndexOf]] over the TxLog read. */
  def probe(s: SparkSession, index: String,
            cbTable: String, coarseTable: String): DataFrame =
    Similarity.probeIvfPqIndexOf(
      s.read.format("txlog").load(index),
      s.table(cbTable), s.table(coarseTable))
}
