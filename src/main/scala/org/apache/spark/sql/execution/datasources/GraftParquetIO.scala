package org.apache.spark.sql.execution.datasources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetOptions}
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** Access bridge into Spark's `private[sql]` parquet scan/write
  * machinery for the graft `txlog` DataSource V2 implementation. Lives
  * in the org.apache.spark.sql package tree for ACCESS only (the
  * [[org.apache.spark.sql.GraftSqlBridge]] pattern) — no Spark
  * internals are modified or shadowed.
  *
  * Why this exists: a file-backed DSv2 table that wants NATIVE scan
  * performance (vectorized parquet readers feeding whole-stage codegen
  * as ColumnarBatch, parquet row-group statistics skipping, split
  * planning) should reuse the same executor-side machinery Spark's own
  * parquet source runs — re-implementing a parquet reader would be
  * slower and wrong. Spark exposes that machinery only inside its own
  * package (Delta and Iceberg ship equivalent in-package shims). */
object GraftParquetIO {

  /** The V2 parquet reader factory Spark's own parquet DSv2 table uses:
    * vectorized + columnar where the schema allows, `filters` applied
    * as parquet row-group/page skipping (Spark re-applies them above —
    * they can only drop provably-dead I/O), `partitionSchema` columns
    * appended CONSTANT per file from [[partitionedFile]]'s values. */
  def readerFactory(spark: SparkSession,
                    dataSchema0: StructType,
                    readDataSchema0: StructType,
                    partitionSchema: StructType,
                    filters: Array[Filter]): PartitionReaderFactory = {
    import org.apache.spark.sql.execution.datasources.parquet.{ParquetReadSupport, ParquetWriteSupport}
    import org.apache.spark.sql.internal.SQLConf
    // the RELATION reports the declared nullability (a txlog table's
    // recorded NOT NULL stays truthful), but the parquet record readers
    // get the nullable-relaxed copy — the exact relaxation Spark's own
    // file sources apply to every explicit read schema; field metadata
    // (EXISTS_DEFAULT fills) survives asNullable
    val dataSchema = dataSchema0.asNullable
    val readDataSchema = readDataSchema0.asNullable
    val sqlConf = spark.sessionState.conf
    val hconf = spark.sessionState.newHadoopConf()
    // the conf block ParquetScan.createReaderFactory installs — the
    // executor-side record readers resolve their read-support class and
    // requested schema from the broadcast configuration, not from the
    // factory's fields
    hconf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[ParquetReadSupport].getName)
    hconf.set(ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA, readDataSchema.json)
    hconf.set(ParquetWriteSupport.SPARK_ROW_SCHEMA, readDataSchema.json)
    hconf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sqlConf.sessionLocalTimeZone)
    hconf.setBoolean(SQLConf.NESTED_SCHEMA_PRUNING_ENABLED.key,
      sqlConf.nestedSchemaPruningEnabled)
    hconf.setBoolean(SQLConf.CASE_SENSITIVE.key, sqlConf.caseSensitiveAnalysis)
    ParquetWriteSupport.setSchema(readDataSchema, hconf)
    hconf.setBoolean(SQLConf.PARQUET_BINARY_AS_STRING.key,
      sqlConf.isParquetBinaryAsString)
    hconf.setBoolean(SQLConf.PARQUET_INT96_AS_TIMESTAMP.key,
      sqlConf.isParquetINT96AsTimestamp)
    hconf.setBoolean(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlConf.parquetInferTimestampNTZEnabled)
    hconf.setBoolean(SQLConf.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlConf.legacyParquetNanosAsLong)
    val broadcast = spark.sparkContext.broadcast(new SerializableConfiguration(hconf))
    ParquetPartitionReaderFactory(sqlConf, broadcast, dataSchema, readDataSchema,
      partitionSchema, filters, aggregation = None,
      new ParquetOptions(Map.empty[String, String], sqlConf))
  }

  /** One input file for the reader factory, with the constant values
    * for `partitionSchema` columns (we use this seam for the `_file`
    * metadata column — zero per-row cost, a constant vector). */
  def partitionedFile(absPath: String, bytes: Long,
                      partitionValues: InternalRow): PartitionedFile =
    PartitionedFile(partitionValues, SparkPath.fromPathString(absPath),
      start = 0L, length = bytes, locations = Array.empty,
      modificationTime = 0L, fileSize = bytes,
      otherConstantMetadataColumnValues = Map.empty)

  /** Pack files into Spark-sized splits (openCostInBytes /
    * maxPartitionBytes / defaultParallelism — the same policy as the
    * native file source, so task sizing matches a plain parquet scan). */
  def filePartitions(spark: SparkSession,
                     files: Seq[PartitionedFile]): Array[InputPartition] = {
    val maxSplit = FilePartition.maxSplitBytes(spark,
      files.map(_.length).sum + files.size * spark.sessionState.conf.filesOpenCostInBytes)
    FilePartition.getFilePartitions(spark, files, maxSplit).toArray
  }

  /** A FilePartition that also CARRIES ITS PARTITION KEY — the
    * storage-partitioned-join seam: the reader factories downcast
    * input partitions to [[FilePartition]], so the keyed variant must
    * BE one (it is not a case class, so the extension is legal and
    * the factories see it verbatim). */
  final class KeyedFilePartition(index: Int, files: Array[PartitionedFile],
                                 key: InternalRow)
      extends FilePartition(index, files)
      with org.apache.spark.sql.connector.read.HasPartitionKey {
    override def partitionKey(): InternalRow = key
  }

  def keyedFilePartition(index: Int, files: Seq[PartitionedFile],
                         key: InternalRow): InputPartition =
    new KeyedFilePartition(index, files.toArray, key)

  /** Driver half of the executor-side parquet WRITE path: the
    * serializable OutputWriterFactory from ParquetFileFormat (codec,
    * schema converters, committer conf all baked into the returned
    * job configuration — ship it with the factory). */
  def writerFactory(spark: SparkSession, schema: StructType,
                    extraConf: Map[String, String] = Map.empty)
      : (OutputWriterFactory, SerializableConfiguration, String) = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    // pin chunk-statistics truncation OFF (the parquet-mr default,
    // made environment-proof): commit-time stats collection records
    // string bounds as EXACT, which is only sound if this writer can
    // never truncate them — see TxStats.ExactStatsOptions
    job.getConfiguration.setInt("parquet.statistics.truncate.length",
      Int.MaxValue)
    // caller-supplied hadoop/parquet keys (e.g. per-column bloom
    // filter toggles) ride in the job conf the executors serialize
    extraConf.foreach { case (k, v) => job.getConfiguration.set(k, v) }
    val factory = new ParquetFileFormat()
      .prepareWrite(spark, job, Map.empty[String, String], schema)
    val conf = new SerializableConfiguration(job.getConfiguration)
    // the extension (".snappy.parquet" etc.) needs a TaskAttemptContext
    // only for the conf — compute it here so executors get a plain string
    val ext = factory.getFileExtension(
      new TaskAttemptContextImpl(job.getConfiguration, new TaskAttemptID()))
    (factory, conf, ext)
  }

  /** Executor half: open one parquet OutputWriter at `absPath`.
    * Returns a closure-friendly writer of InternalRow. */
  def newOutputWriter(factory: OutputWriterFactory, conf: SerializableConfiguration,
                      absPath: String, schema: StructType,
                      partitionId: Int, taskId: Long): OutputWriter = {
    val attempt = new TaskAttemptID(
      new TaskID(new org.apache.hadoop.mapreduce.JobID("graft-txlog", 0),
        TaskType.MAP, partitionId), (taskId % Int.MaxValue).toInt)
    factory.newInstance(absPath, schema, new TaskAttemptContextImpl(conf.value, attempt))
  }

  def serializableConf(conf: Configuration): SerializableConfiguration =
    new SerializableConfiguration(conf)
}
