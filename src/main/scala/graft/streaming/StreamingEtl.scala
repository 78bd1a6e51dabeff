package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.etl.{EntityConf, EntityPipeline, EtlMetrics, EtlMode}

/** Stretch S3 (SURVEY §2.5): Structured Streaming port of the ETL.
  *
  * The reference pipeline is already incremental-append (per-file
  * validate → route → transform → append to sinks), so the streaming port
  * is the same dataflow fed by a file SOURCE instead of a one-shot scan:
  * new `*.json` files landing in the entity directory flow through
  * [[EntityPipeline.process]] inside foreachBatch, reusing the exact
  * batch sinks (CSV append + header-once, error log, quarantine). Spark's
  * file source tracks processed files in the checkpoint, giving
  * exactly-once per FILE — the unit the reference works in.
  *
  * At scale: `maxFilesPerTrigger` bounds per-batch work; the dataflow
  * stays embarrassingly parallel (no stateful operators — routing is
  * stateless, sinks are appends), so a 1000-executor cluster runs the
  * same query with only source listing as coordination.
  */
object StreamingEtl {

  final case class Running(query: StreamingQuery) {
    def awaitIdle(): Unit = query.processAllAvailable()
    def stop(): Unit = query.stop()
    def metrics: Seq[EtlMetrics] = Running.this.synchronized(batches.toSeq)
    private[StreamingEtl] val batches =
      scala.collection.mutable.ArrayBuffer.empty[EtlMetrics]
  }

  def start(spark: SparkSession, conf: EntityConf, mode: EtlMode,
            errorLogFile: String, checkpointDir: String,
            maxFilesPerTrigger: Int = 1000): Running = {
    val raw = spark.readStream
      .option("wholetext", "true")
      .option("pathGlobFilter", "*.json")
      .option("recursiveFileLookup", "false")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(conf.dataDir)
      // URI-decode like the batch source — a percent-encoded path would
      // crash the quarantine copy inside foreachBatch and kill the query
      .select(graft.etl.JsonDirSource.uriToPath(input_file_name()).as("src_path"),
        col("value"))
    lazy val running: Running = Running(query)
    lazy val query: StreamingQuery = raw.writeStream
      .queryName(s"etl-${conf.name}")
      .trigger(Trigger.ProcessingTime("1 second"))
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val r = EntityPipeline.process(batch, conf, mode, errorLogFile)
        running.synchronized(running.batches += r.metrics)
        ()
      }
      .start()
    running
  }
}
