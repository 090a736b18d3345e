package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Micro-probe for the round-14 capped bucket aggregate: times the
  * MinHash band-bucket build in both shapes (CappedCollect aggregator
  * vs collect_set + size filter) over the same sf dir, N reps each, so
  * a regression in the shipped shape is attributable to the aggregate
  * itself and not sweep noise.
  *
  * Usage: tools/runmain.sh graft.tools.CappedAggProbe <sfDir> [reps]
  */
object CappedAggProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-capped-agg-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import graft.functions.TextKernels
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), TextKernels.shinglesKernel(col("text"), 3).as("shingles"))
    val sigs = docs.select(col("doc_id"),
      TextKernels.minhashSigKernel(col("shingles"), graft.ops.Dedup.NumPerms).as("sig"))
      .persist()
    sigs.write.format("noop").mode("overwrite").save() // materialize once

    val bandRows = sigs.select(
        col("doc_id"),
        explode(array((0 until graft.ops.Dedup.Bands).map(b =>
          struct(lit(b).as("band"),
            col("sig")(b * graft.ops.Dedup.Rows).as("k0"),
            col("sig")(b * graft.ops.Dedup.Rows + 1).as("k1"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.k0").as("k0"), col("bk.k1").as("k1"))

    def capped: DataFrame = graft.ops.Dedup.cappedBuckets(
      bandRows, Seq("band", "k0", "k1"), "doc_id", 2, 1000)
    def setForm: DataFrame = bandRows
      .groupBy(col("band"), col("k0"), col("k1"))
      .agg(collect_set(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, 1000))

    for ((name, build) <- Seq("capped" -> (() => capped),
                              "collect_set" -> (() => setForm));
         r <- 1 to reps) {
      System.gc()
      val t0 = System.nanoTime()
      build().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"capped_agg","variant":"$name","rep":$r,"sec":$sec%.3f,"sf":"$sfDir"}""")
    }
    spark.stop()
  }
}
