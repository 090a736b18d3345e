package graft.tools

import java.util.concurrent.atomic.AtomicLong

import graft.ops.Dedup
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-19 A/B probe for the packed candidate-pair emission: the MinHash
  * candidate distinct (all-C(k,2) form) and the reps chain distinct, each
  * as the 16-byte struct variant vs the 8-byte packed-long variant, over
  * the REAL band buckets of <sfDir>. Output-identical by construction
  * (PackedPairsSpec pins it); this measures wall + shuffle bytes only.
  *
  * Usage: tools/runmain.sh graft.tools.PackProbe <sfDir> [reps]
  */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shufR = new AtomicLong(0L)
    val shufW = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })

    import graft.functions.GraftFunctions.{sortedLongPairsKernel, sortedLongPairsPackedKernel}
    val (_, sigs) = Dedup.minhashDocsSigs(graft.Tables.documents(spark, sfDir))
    val buckets = Dedup.truncate(Dedup.minhashBuckets(sigs))

    def candStruct = buckets
      .select(explode(sortedLongPairsKernel(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
    def candPacked = buckets
      .select(explode(sortedLongPairsPackedKernel(col("ids"))).as("uv"))
      .distinct()
      .select(shiftrightunsigned(col("uv"), 32).as("doc_a"),
        col("uv").bitwiseAND(lit(4294967295L)).as("doc_b"))
    def chainStruct = buckets
      .select(sort_array(col("ids")).as("ids"))
      .select(explode(expr(
        "transform(sequence(1, size(ids) - 1), " +
          "i -> named_struct('a', element_at(ids, i), 'b', element_at(ids, i + 1)))")).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
    def chainPacked = buckets
      .select(sort_array(col("ids")).as("ids"))
      .select(explode(expr(
        "transform(sequence(1, size(ids) - 1), " +
          "i -> shiftleft(element_at(ids, i), 32) | element_at(ids, i + 1))")).as("uv"))
      .distinct()
      .select(shiftrightunsigned(col("uv"), 32).as("doc_a"),
        col("uv").bitwiseAND(lit(4294967295L)).as("doc_b"))

    val variants = Seq(
      "cand_struct" -> (() => candStruct),
      "cand_packed" -> (() => candPacked),
      "chain_struct" -> (() => chainStruct),
      "chain_packed" -> (() => chainPacked))
    for (rep <- 1 to reps; (name, mk) <- variants) {
      System.gc()
      shufR.set(0L); shufW.set(0L)
      spark.sparkContext.setJobDescription(s"packprobe $name rep$rep")
      val t0 = System.nanoTime()
      mk().write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"""{"probe":"$name","rep":$rep,"sec":$s%.2f,"shufR_mb":${shufR.get / 1048576},"shufW_mb":${shufW.get / 1048576},"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
