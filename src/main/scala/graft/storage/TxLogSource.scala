package graft.storage

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, Row, SaveMode, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** The `txlog` Spark data source — [[TxLog]] tables through Spark's
  * standard source seams, so a user needs no graft API at all:
  *
  * {{{
  *   df.write.format("txlog").mode("append").save(path)      // txn commit
  *   spark.read.format("txlog").load(path)                    // snapshot
  *   spark.sql(s"CREATE TABLE t USING txlog OPTIONS (path '$p')")
  *   spark.sql("SELECT ... FROM t WHERE ...")                 // pruned scan
  *   spark.sql("INSERT INTO t ...")                           // txn commit
  *   stream.writeStream.format("txlog").option("path", p)...  // exactly-once
  * }}}
  *
  * Read path: [[PrunedFilteredScan]] — Spark pushes column pruning and
  * predicate Filters; the Filters drive MANIFEST zone-map file skipping
  * ([[TxStats.fromSourceFilter]]) before any data file opens, and every
  * filter is declared unhandled so Spark re-applies them all on the
  * survivors — pruning can only drop provably-dead I/O, never rows
  * (the [[TxStats]] soundness contract; spec'd in TxSourceSpec).
  *
  * Honest cost note: the DSv1 row seam (`RDD[Row]`) forgoes the
  * vectorized-scan-into-codegen handoff a native FileSourceScanExec
  * gets, so per-row cost is higher than [[TxLog.scanWhere]] — the
  * library-native path remains the performance door; this seam buys
  * SQL/DDL/INSERT integration with identical pruning semantics.
  *
  * Write path: each batch write is ONE TxLog transaction (Append =
  * [[TxLog.commit]], Overwrite = [[TxLog.overwrite]] — an atomic
  * checkpoint replacement). The streaming sink commits each micro-batch
  * under a (per-query writer id, batchId) idempotence token — the
  * writer id derives from the checkpoint location, the query's durable
  * identity — so Structured Streaming's at-least-once addBatch replays
  * become no-ops iff the original published: the same exactly-once
  * argument as [[TxLog.sink]], behind `writeStream.format("txlog")`. */
class TxLogSource extends RelationProvider with CreatableRelationProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "txlog"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException("txlog source needs a 'path' option"))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    new TxLogRelation(tablePath(parameters))(sqlContext)

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val t = tablePath(parameters)
    val exists = TxLog.headVersion(data.sparkSession, t) >= 0L
    mode match {
      case SaveMode.Append =>
        TxLog.commit(data, t, writerId = s"batch-${java.util.UUID.randomUUID()}", batchId = 0L)
      case SaveMode.Overwrite =>
        TxLog.overwrite(data, t)
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(s"txlog table $t already exists")
        TxLog.commit(data, t, writerId = s"batch-${java.util.UUID.randomUUID()}", batchId = 0L)
      case SaveMode.Ignore =>
        if (!exists)
          TxLog.commit(data, t, writerId = s"batch-${java.util.UUID.randomUUID()}", batchId = 0L)
    }
    new TxLogRelation(t)(sqlContext)
  }

  override def createSink(sqlContext: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String], outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"txlog sink supports Append output mode only, got $outputMode")
    require(partitionColumns.isEmpty,
      "txlog sink does not support partitionBy — layout is the table's (compact/cluster)")
    // writer identity must be PER QUERY: two queries sharing one token
    // namespace would dedupe each other's epochs into silent data loss.
    // The checkpoint location IS the query's durable identity (same
    // checkpoint = same epoch sequence = same dedup namespace; a fresh
    // checkpoint restarts epochs at 0 and gets a fresh namespace).
    val writerId = parameters.get("writerId").orElse(
      parameters.get("checkpointLocation").map { cp =>
        val h = java.security.MessageDigest.getInstance("SHA-256")
          .digest(cp.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        "txlog-stream-" + h.take(8).map("%02x".format(_)).mkString
      }).getOrElse(throw new IllegalArgumentException(
        "txlog sink needs a checkpointLocation (or explicit writerId) for exactly-once identity"))
    new TxLogSink(tablePath(parameters), writerId)
  }
}

/** Snapshot relation over a TxLog table with zone-map file skipping
  * driven by the pushed-down Filters. */
class TxLogRelation(table: String)(@transient val sqlContext: SQLContext)
    extends BaseRelation with PrunedFilteredScan with InsertableRelation {

  private def spark = sqlContext.sparkSession

  override val schema: StructType =
    TxLog.snapshot(spark, table).map(_.schema).getOrElse(
      throw new IllegalArgumentException(
        s"txlog table $table is empty or absent — schema unknowable"))

  /** Every filter is re-applied by Spark (we use them ONLY to skip
    * files); correctness never depends on our evaluation. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val (kept, total) = TxLog.pruneSourceFilters(spark, table, filters.toSeq)
    TxLogRelation.lastPrune.set((kept.size, total)) // spec/bench observable
    val base =
      if (kept.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      else
        spark.read.schema(schema)
          .parquet(kept.map(f => new Path(new Path(table), f).toString): _*)
    base.select(requiredColumns.toSeq.map(org.apache.spark.sql.functions.col): _*).rdd
  }

  /** SQL `INSERT INTO` (append) / `INSERT OVERWRITE` — one transaction
    * each, same as the batch writer. */
  override def insert(data: DataFrame, overwrite: Boolean): Unit =
    if (overwrite) TxLog.overwrite(data, table)
    else {
      TxLog.commit(data, table,
        writerId = s"insert-${java.util.UUID.randomUUID()}", batchId = 0L)
      ()
    }
}

object TxLogRelation {
  /** (kept, total) of the most recent buildScan on this JVM — lets the
    * specs assert real skipping through the opaque DSv1 seam. */
  val lastPrune = new java.util.concurrent.atomic.AtomicReference[(Int, Int)]((0, 0))
}

/** Exactly-once streaming sink: micro-batch `batchId` is the TxLog
  * idempotence token, so an at-least-once replay of addBatch (crash
  * anywhere around a previous attempt) re-commits iff the original
  * never published. */
class TxLogSink(table: String, writerId: String) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming Dataset is bound to the stream's IncrementalExecution
    // and cannot be re-planned by a writer — execute it once and re-wrap
    val rows = data.queryExecution.toRdd.map(_.copy())
    val batch = GraftSqlBridge.internalCreateDataFrame(data.sparkSession, rows, data.schema)
    TxLog.commit(batch, table, writerId, batchId)
    ()
  }
}
