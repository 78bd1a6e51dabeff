package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: dump formatted plans for every SparkEntry query to a dir,
  * and print one-line plan health checks (pushdown, pruning, broadcast,
  * codegen) for the scan-shaped queries. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/plans")
    // optional 3rd arg: core/partition count, so plan dumps can match the
    // bench session shape (local[32]/32) instead of the default dev shape
    val cores = args.lift(2).getOrElse("8")
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/$name.txt"), plan)
        val pushed = plan.contains("PushedFilters: [") &&
          !plan.contains("PushedFilters: []")
        // note: codegen ids only appear in plans AFTER execution under
        // AQE; this dump is pre-execution, so don't look for them here
        val bcast = plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin")
        println(f"[explain] $name%-26s pushedFilters=$pushed%-5s broadcastJoin=$bcast")
      } catch { case e: Throwable => println(s"[explain] $name FAILED: ${e.getMessage}") }
    }
    spark.stop()
  }
}
