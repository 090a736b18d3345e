package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints `.explain("formatted")` for named [[graft.SparkEntry]] queries —
  * the plan evidence the optimization rounds commit under plans/rNN/.
  *
  * Usage: tools/runmain.sh graft.tools.ExplainDump <sfDir> <query>[,query...] [confKey=value ...]
  *
  * Session conf mirrors Bench (local[32], shuffle=32) so the dumped plan
  * is the one the bench executes at that data size; the plan is printed
  * WITHOUT running the query (size-estimate-driven choices like
  * auto-broadcast still reflect the named sfDir because file sizes are
  * read at planning time; corpus-count-driven graft gates run their small
  * count jobs at construction).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").map(_.trim).toSeq
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(2).foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    }
    // pseudo-names for queries whose declared form eagerly materializes
    // (Dedup.truncate) and so explains as a bare ExistingRDD leaf: dump
    // the un-truncated plan builder instead — the plan the truncate runs
    val internal: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "graph_triangles!plan" -> ((s, d) => graft.ops.Graph.trianglePlanOriented(
        graft.ops.Graph.orientedEdges(
          graft.ops.Graph.edges(s, d), graft.ops.Graph.degrees(s, d)))._1))
    for (n <- names) {
      val fn = internal.getOrElse(n,
        graft.SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n")))
      println(s"=== $n @ $sfDir ===")
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
