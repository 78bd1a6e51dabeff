package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: phase timing for the ETL small-file read — how long the
  * wholetext scan+parse+validate takes at a given openCostInBytes /
  * maxPartitionBytes, and how many partitions it fans out to. */
object EtlReadProbe {
  def main(args: Array[String]): Unit = {
    val dataDir = args.headOption.getOrElse("/tmp/etl20k_r21/users")
    val openCost = args.lift(1).getOrElse((64 * 1024).toString)
    val maxPart = args.lift(2).getOrElse((128 * 1024 * 1024).toString)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.files.openCostInBytes", openCost)
    spark.conf.set("spark.sql.files.maxPartitionBytes", maxPart)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = spark.read.option("wholetext", "true")
        .option("pathGlobFilter", "*.json")
        .option("recursiveFileLookup", "false")
        .text(dataDir)
      val parts = df.rdd.getNumPartitions
      val n = df.count()
      println(f"[etlprobe] openCost=$openCost maxPart=$maxPart parts=$parts files=$n run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
