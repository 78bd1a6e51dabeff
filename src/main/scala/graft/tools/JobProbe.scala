package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE SparkEntry query and print every Spark job it
  * schedules (duration + description/callsite) plus the slowest stages —
  * the attribution step of opt guide §1 when the aggregate TimeOne
  * number doesn't say WHERE the time goes. Not part of the driver
  * contract. */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: JobProbe <query> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val fn = graft.SparkEntry.queries(name)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        jobs.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.get(je.jobId)).foreach { case (t0, desc) =>
          done.add((je.jobId, je.time - t0, desc))
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = (for { s <- si.submissionTime; c <- si.completionTime } yield c - s).getOrElse(-1L)
        stages.add((si.stageId, ms, si.numTasks))
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect()
    import scala.jdk.CollectionConverters._
    for (i <- 1 to reps) {
      done.clear(); stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener drain
      val js = done.asScala.toSeq.sortBy(_._1)
      println(f"[jobprobe] $name run$i wall=$wall%.3f s, ${js.size} jobs, jobSum=${js.map(_._2).sum / 1000.0}%.3f s")
      js.foreach { case (id, ms, desc) =>
        println(f"[jobprobe]   job$id%-4d ${ms / 1000.0}%7.3f s  ${desc.take(110)}")
      }
      val top = stages.asScala.toSeq.sortBy(-_._2).take(8)
      println("[jobprobe]   top stages: " + top.map { case (id, ms, nt) =>
        f"s$id:${ms / 1000.0}%.2fs/${nt}t" }.mkString(" "))
    }
    spark.stop()
  }
}
