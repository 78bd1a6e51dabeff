package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.etl.{JsonDirSource, SchemaCompiler, Validator}

/** Dev micro-benchmark (not part of the driver contract): the O4
  * validator as codegen'd ValidateJson expression vs the r1-r3 ScalaUDF
  * twin, isolated from sinks/transforms — drives the before/after claim
  * for BASELINE.md's M-row on the §4.3 promotion.
  *
  * Usage: runMain graft.tools.ValidatorBench [usersDir] (defaults to the
  * /tmp/etl_bench corpus the M3 throughput row uses).
  */
object ValidatorBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/etl_bench/users")
    val schemaFile = args.lift(1).getOrElse("/tmp/etl_bench/user-events-schema.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val schema = SchemaCompiler.compile(schemaFile)
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    // replicate the corpus so the per-record harness cost is visible
    // above job overhead (64 × 10k = 640k validation calls per pass)
    val rep = sys.env.getOrElse("VBENCH_REPLICATE", "64").toInt
    val raw = JsonDirSource.read(spark, dir)
      .crossJoin(spark.range(rep))
      .select(col("src_path"), col("value"))
      .repartition(cpus.toInt * 4)
      .cache()
    println(s"[vbench] corpus rows: ${raw.count()}") // materialize cache
    def time(label: String)(f: => Long): Unit = {
      // min of 3 (same throttle-noise reasoning as Bench.scala)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val best = ts.map(_._1).min
      println(f"[vbench] $label%-12s min=$best%6.3fs  (ok=${ts.head._2})")
    }
    time("expression") {
      raw.withColumn("v", Validator.validateCol(schema)(col("value")))
        .filter(col("v.errClass") === "ok").count()
    }
    time("udf") {
      raw.withColumn("v", Validator.validateColUdf(schema)(col("value")))
        .filter(col("v.errClass") === "ok").count()
    }
    time("expression") {
      raw.withColumn("v", Validator.validateCol(schema)(col("value")))
        .filter(col("v.errClass") === "ok").count()
    }
    time("udf") {
      raw.withColumn("v", Validator.validateColUdf(schema)(col("value")))
        .filter(col("v.errClass") === "ok").count()
    }
    spark.stop()
  }
}
