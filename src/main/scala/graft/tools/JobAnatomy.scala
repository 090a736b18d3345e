package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-JOB anatomy of a query: each job's wall span, task count, and the
  * DRIVER GAP since the previous job ended (planning/codegen/commit time
  * that no stage metric shows). The sf0.1 bench is fixed-cost dominated;
  * this tool says whether the fixed cost is scheduling (many jobs), task
  * overhead (many tasks), or driver think-time (big gaps).
  * Usage: JobAnatomy <sfDir> <query>[,query...] [reps]
  */
object JobAnatomy {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    case class Job(id: Int, start: Long, var end: Long = 0L, var tasks: Int = 0,
                   var desc: String = "")
    val jobs = mutable.LinkedHashMap.empty[Int, Job]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.synchronized {
        // the result stage's callsite names what the job IS (broadcast
        // build, shuffle stage materialization, noop write, collect …)
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("")
        jobs(j.jobId) = Job(j.jobId, j.time, desc = site.take(70))
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = jobs.synchronized {
        jobs.get(j.jobId).foreach(_.end = j.time)
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = jobs.synchronized {
        // stageId → job mapping unavailable here cheaply; count via last job
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = jobs.synchronized {
        val tid = s.stageInfo.numTasks
        if (jobs.nonEmpty) jobs.values.toSeq.filter(j => j.end == 0L).foreach(_.tasks += tid)
      }
    })

    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings"))
      try spark.read.parquet(s"$dir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }

    for (rep <- 1 to reps; n <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n"))
      spark.catalog.clearCache()
      System.gc()
      jobs.synchronized(jobs.clear())
      val t0 = System.currentTimeMillis()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = System.currentTimeMillis() - t0
      Thread.sleep(300)
      jobs.synchronized {
        var prevEnd = t0
        var jobSum = 0L
        var gapSum = 0L
        println(f"[anatomy] $n rep$rep wall=${wall}%d ms jobs=${jobs.size}")
        for (j <- jobs.values) {
          val gap = j.start - prevEnd
          val dur = j.end - j.start
          jobSum += dur; gapSum += math.max(gap, 0)
          println(f"[anatomy]   job${j.id}%-4d gap=${gap}%5d ms dur=${dur}%5d ms tasks=${j.tasks}%-4d ${j.desc}")
          prevEnd = j.end
        }
        val tail = t0 + wall - prevEnd
        println(f"[anatomy]   jobSum=${jobSum}%d ms gapSum=${gapSum}%d ms tailAfterLastJob=${tail}%d ms")
      }
    }
    spark.stop()
  }
}
