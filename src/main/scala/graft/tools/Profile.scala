package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev profiler for the dedup hot path (not part of the driver contract).
  * Prints per-run wall time plus the slowest stages (executor side) so
  * driver-side costs (broadcast builds, planning) show up as the gap. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.add((si.stageId, ms, si.numTasks))
      }
    })
    def time[T](label: String)(f: => T): T = {
      stages.clear()
      val t0 = System.nanoTime(); val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val top = stages.asScala.toSeq.sortBy(-_._2).take(4)
        .map { case (id, ms, nt) => f"s$id:${ms / 1000.0}%.1fs/${nt}t" }.mkString(" ")
      val stageSum = stages.asScala.map(_._2).sum / 1000.0
      println(f"[profile] $label%-24s wall=$wall%6.2fs stages=$stageSum%6.2fs  top: $top")
      r
    }
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    (1 to 2).foreach { i =>
      time(s"jaccard #$i")(graft.dedup.Dedup.ngramJaccard(spark, sfDir).count())
      time(s"clusters #$i")(graft.dedup.Dedup.clusters(spark, sfDir).count())
      time(s"cosine #$i")(graft.dedup.Dedup.embeddingCosine(spark, sfDir).count())
      time(s"editdist #$i")(graft.dedup.Dedup.editDistance(spark, sfDir).count())
      time(s"boilerplate #$i")(graft.text.TextAnalysis.boilerplate(spark, sfDir).count())
      time(s"q05 #$i")(graft.queries.Declared.q05(spark, sfDir).count())
      time(s"q56 contamination #$i")(graft.queries.Declared5.q56(spark, sfDir).count())
    }
    spark.stop()
  }
}
