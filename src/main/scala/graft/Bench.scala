package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line of per-query seconds.
  *
  * Execution is forced with a `noop`-format write so the full plan runs —
  * a bare `count()` would let Catalyst prune projections and skip most of
  * the work being measured.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.mergeSchema", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen/file-listing paths once so per-query numbers
    // measure steady-state execution, not first-touch JIT.
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // also touch every BENCH-dir table once (file listing + footer decode
    // + scan JIT happen per directory): without this the alphabetically
    // first query absorbs the whole first-touch cost of the sf dir.
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings"))
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] warm $t: $e") }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e") }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries may persist reused intermediates; drop them synchronously
      // (and let GC settle) so one query's cache/garbage never skews the
      // next query's measurement. The explicit GC only pays for itself
      // after cache-holding (iterative/checkpointing) queries — a
      // per-query System.gc() across 100+ queries adds ~10 s of pure
      // pause time to the total.
      val persisted = spark.sparkContext.getPersistentRDDs.values
      spark.catalog.clearCache()
      persisted.foreach(_.unpersist(blocking = true))
      if (persisted.nonEmpty) System.gc()
      name -> dt
    }
    val total = results.map(_._2).sum
    // Full per-query detail goes to a file: the driver captures only the
    // LAST ~2000 chars of sbt output, and a single JSON line carrying all
    // queries (~2.6 KB) gets its head truncated and never parses. The
    // stdout line stays compact — most-expensive queries first, greedily
    // packed under a length budget, the rest folded into "other".
    val detail = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val detailJson =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","nq":${results.size},"queries":$detail,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter("bench_detail.json")
      try w.println(detailJson) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[bench] detail write: $e") }
    println(compactLine(results, sfDir))
    spark.stop()
  }

  /** The stdout summary line, greedily packed so it ALWAYS fits the
    * driver's 2000-char output tail (BenchLineSpec pins the invariant):
    * most-expensive queries first under a char budget, the rest summed
    * into "other". */
  def compactLine(results: Seq[(String, Double)], sfDir: String): String = {
    val total = results.map(_._2).sum
    val budget = 1500 // chars for the queries map; whole line must fit 2000-char tail
    val byCost = results.sortBy(-_._2)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var used = 0
    for ((k, v) <- byCost) {
      // "name":12345.67, — value width bounded because a query exceeding
      // 5 digits of seconds would have failed the bench long before
      val entryLen = k.length + 13
      if (used + entryLen <= budget) { picked += ((k, v)); used += entryLen }
    }
    val pickedSet = picked.map(_._1).toSet
    val other = results.collect { case (k, v) if !pickedSet.contains(k) => v }.sum
    val qs = picked.sortBy(_._1)
      .map { case (k, v) => "\"" + k + f"\":$v%.2f" }.mkString("{", ",", "}")
    f"""{"metric":"total","value":$total%.2f,"unit":"sec","nq":${results.size},"queries":$qs,"other":$other%.2f,"detail":"bench_detail.json","sf":"$sfDir"}"""
  }
}
