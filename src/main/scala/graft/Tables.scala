package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated TPC-H-ish parquet tables
  * (`/root/repo/TESTDATA.md`). One parquet file per table under the
  * scale-factor directory passed to every query.
  *
  * Reads are plain `spark.read.parquet` so Catalyst's parquet source
  * handles column pruning + predicate pushdown; at cluster scale the same
  * call reads a partitioned directory tree unchanged.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 refuses to read
    // as a timestamp. Read nanos as a long and truncate to micros — the
    // same truncation DuckDB applies when casting TIMESTAMP_NS → TIMESTAMP.
    // (`ts div 1000` stays in integer arithmetic: a double division would
    // lose precision above 2^53 ns.)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  /** Register every table as a temp view (for spark.sql users). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
