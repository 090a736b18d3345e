package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Variance/plan probe for `dedup_minhash_sql` (round-13 verdict item 4:
  * 52.8 → 130.9/84 s at sf10 across rounds on UNCHANGED code). Runs N
  * isolated reps per plan variant in ONE host session and prints one
  * JSON line per rep with wall seconds plus the task-metric totals that
  * explain sort-spill variance (memory/disk bytes spilled, shuffle
  * bytes written).
  *
  * Variants (all output-identical — the probe asserts pair-count and
  * checksum equality once per run):
  *   - join:   the shipped plan — band-table self-join on (band, key)
  *             (sort-merge; streams C(k,2) pairs without materializing
  *             bucket lists, the robust shape when semantics carry no
  *             bucket cap)
  *   - gate:   count ≥ 2 pre-gate — aggregate (band, key) counts first
  *             (constant-size partial buffers), semi-join the band table
  *             to multi-member keys, THEN self-join: singleton buckets
  *             (the majority on low-dup corpora) never enter the join
  *             sort
  *   - kernel: bucket lists + sortedLongPairsKernel explode + pair
  *             count — the production minhashPairs shape, but UNCAPPED
  *             (the SQL-parity semantics has no bucket cap), so lists
  *             materialize full membership; included to measure what the
  *             cap is worth, not as a candidate to ship
  *
  * Usage: tools/runmain.sh graft.tools.MinhashSqlProbe <sfDir> [reps] [variants]
  *   variants: comma list from {join,gate,kernel}, default all three
  */
object MinhashSqlProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val variants = (if (args.length > 2) args(2) else "join,gate,kernel")
      .split(",").map(_.trim).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-minhash-sql-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val memSpill = new AtomicLong(0)
    val diskSpill = new AtomicLong(0)
    val shufWrite = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val m = e.taskMetrics
        if (m != null) {
          memSpill.addAndGet(m.memoryBytesSpilled)
          diskSpill.addAndGet(m.diskBytesSpilled)
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    def bands: DataFrame = graft.ops.Dedup.minhashSqlBands(spark, sfDir)

    def pairTail(joined: DataFrame): DataFrame = joined
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared_bands"))
      .orderBy("doc_a", "doc_b")

    def build(variant: String): DataFrame = variant match {
      case "join" =>
        val b = bands
        pairTail(b.as("x").join(b.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id")))
      case "gate" =>
        val b = bands
        val multi = b.groupBy(col("band"), col("key"))
          .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
          .select(col("band"), col("key"))
        val gated = b.join(multi, Seq("band", "key"), "left_semi")
        pairTail(gated.as("x").join(gated.as("y"),
          col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
            col("x.doc_id") < col("y.doc_id")))
      case "kernel" =>
        import graft.functions.GraftFunctions.sortedLongPairsKernel
        bands.groupBy(col("band"), col("key"))
          .agg(collect_set(col("doc_id")).as("ids"))
          .filter(size(col("ids")) >= 2)
          .select(explode(sortedLongPairsKernel(col("ids"))).as("p"))
          .groupBy(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
          .agg(count(lit(1)).as("n_shared_bands"))
          .orderBy("doc_a", "doc_b")
      case other =>
        sys.error(s"unknown variant '$other' (expected join|gate|kernel)")
    }

    // one-time output-identity check across the requested variants
    def checksum(df: DataFrame): (Long, Long) = {
      val r = df.select(xxhash64(col("doc_a"), col("doc_b"),
          col("n_shared_bands")).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).collect()(0)
      // bit_xor over zero rows is NULL — a no-collision corpus is a
      // legitimate (0, 0) checksum, not an NPE
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val sums = variants.map(v => v -> checksum(build(v))).toMap
    require(sums.values.toSet.size == 1,
      s"variants disagree: $sums — refusing to time non-equivalent plans")
    println(s"""{"probe":"minhash_sql","parity":"ok","pairs":${sums(variants.head)._1},"sf":"$sfDir"}""")

    for (v <- variants; r <- 1 to reps) {
      System.gc()
      memSpill.set(0); diskSpill.set(0); shufWrite.set(0)
      val t0 = System.nanoTime()
      build(v).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // deterministic listener-bus drain: a fixed sleep can attribute late
      // task-end events to the NEXT rep on a loaded host; record the
      // drained flag so an undrained rep is visibly suspect in the JSONL
      val drained = org.apache.spark.sql.graft.bridge.drainListenerBus(spark)
      println(f"""{"probe":"minhash_sql","variant":"$v","rep":$r,"sec":$sec%.2f,""" +
        s""""mem_spill_mb":${memSpill.get / 1048576},"disk_spill_mb":${diskSpill.get / 1048576},""" +
        s""""shuffle_write_mb":${shufWrite.get / 1048576},"bus_drained":$drained,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
