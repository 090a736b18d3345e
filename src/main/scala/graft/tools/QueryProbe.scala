package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Generic per-query cost profiler: runs named [[graft.SparkEntry]]
  * queries with a job/stage listener and prints, per rep, wall seconds
  * plus the JOB and STAGE counts and total shuffle read/write bytes —
  * the fixed-cost anatomy of the sf0.1 bench lines (each job on a tiny
  * sf carries ~0.1 s of scheduling/planning latency regardless of data).
  * Usage: QueryProbe <sfDir> <query>[,query...] [reps]
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var shufR = 0L
    @volatile var shufW = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufR += m.shuffleReadMetrics.totalBytesRead
          shufW += m.shuffleWriteMetrics.bytesWritten
        }
      }
    })

    // warm file listing/footers once per table, like Bench
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings"))
      try spark.read.parquet(s"$dir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }

    for (rep <- 1 to reps; n <- names) {
      val fn = graft.SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n"))
      spark.catalog.clearCache()
      System.gc()
      jobs = 0; stages = 0; shufR = 0L; shufW = 0L
      spark.sparkContext.setJobDescription(s"queryprobe $n rep$rep")
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      // listener events drain async; give the bus a beat before reading
      Thread.sleep(300)
      println(f"[queryprobe] $n%-28s rep$rep $s%7.2f s  jobs=$jobs%-3d stages=$stages%-3d shufR=${shufR / 1048576}%5d MB shufW=${shufW / 1048576}%5d MB")
    }
    spark.stop()
  }
}
