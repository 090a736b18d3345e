package graft.tools

import graft.ops.Graph
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-session interleaved A/B for `graph_triangles`' close stage — the
  * per-oriented-edge out-list intersection. Cross-session single-rep A/Bs
  * are useless on this host (documented 2-4× plateau windows; a fresh-JVM
  * triangles leg read 12.9/23.1/63.6 s across 10 minutes), so both forms
  * run alternately over the SAME persisted sorted adjacency in one JVM:
  *   hash   — explode(array_intersect(un, vn))          (pre-r18 form)
  *   merge  — explode(sortedLongIntersect(un, vn))      (two-pointer kernel)
  * Also times the oriented-adjacency aggregate with and without the
  * sort_array the kernel form needs. Prints per-rep seconds; compare
  * session-min per form. Usage: TriProbe [sfDir] [reps]
  */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("data/sf10")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.storage.StorageLevel

    def time(label: String)(body: => Any): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[triprobe] $label%-24s $s%8.2f s   ($r)")
    }

    // orientation joins: gated degree broadcast vs the sort-merge shape,
    // interleaved over the same materialized edge/degree memos
    println(s"[triprobe] nodes: ${Graph.degrees(spark, dir).count()}")
    for (rep <- 1 to reps) {
      spark.conf.set(Graph.BcastDegreesMaxNodesKey, "0")
      time(s"rep$rep orient-smj")(
        Graph.orientedEdges(Graph.edges(spark, dir), Graph.degrees(spark, dir))
          .write.format("noop").mode("overwrite").save())
      spark.conf.unset(Graph.BcastDegreesMaxNodesKey)
      time(s"rep$rep orient-bhj")(
        Graph.orientedEdges(Graph.edges(spark, dir), Graph.degrees(spark, dir))
          .write.format("noop").mode("overwrite").save())
    }

    val oriented = Graph.orientedEdges(Graph.edges(spark, dir), Graph.degrees(spark, dir))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[triprobe] oriented edges: ${oriented.count()}")

    // adjacency aggregate cost, unsorted vs sorted lists
    for (rep <- 1 to reps) {
      time(s"rep$rep oadj-unsorted")(
        oriented.groupBy(col("u")).agg(collect_list(col("v")).as("on"))
          .write.format("noop").mode("overwrite").save())
      time(s"rep$rep oadj-sorted")(
        oriented.groupBy(col("u")).agg(sort_array(collect_list(col("v"))).as("on"))
          .write.format("noop").mode("overwrite").save())
    }

    val oadj = oriented.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("on"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    println(s"[triprobe] oadj rows: ${oadj.count()}")

    def closeStage(kernel: Boolean) = {
      val w =
        if (kernel) explode(graft.functions.GraftFunctions.sortedLongIntersectKernel(
          col("un"), col("vn")))
        else explode(array_intersect(col("un"), col("vn")))
      oadj
        .select(col("u"), col("on").as("un"), explode(col("on")).as("v"))
        .join(oadj.select(col("u").as("v"), col("on").as("vn")), Seq("v"))
        .select(col("u"), col("v"), w.as("w"))
        .select(explode(array(col("u"), col("v"), col("w"))).as("part_id"))
        .groupBy(col("part_id")).agg(count(lit(1)).as("n_triangles"))
        .orderBy(desc("n_triangles"), col("part_id"))
        .limit(25)
    }
    // value parity inside the probe, then interleaved timing
    val a = closeStage(false).collect().map(_.toString).toSeq
    val b = closeStage(true).collect().map(_.toString).toSeq
    println(s"[triprobe] close parity: ${a == b} (${a.size} rows)")
    for (rep <- 1 to reps) {
      time(s"rep$rep close-hash")(
        closeStage(false).write.format("noop").mode("overwrite").save())
      time(s"rep$rep close-merge")(
        closeStage(true).write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
