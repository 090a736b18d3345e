package graft.tools

import graft.ops.{Dedup, Graph}
import org.apache.spark.sql.SparkSession

/** Stage-decomposition profiler for `graph_nbr_jaccard` (the sf1 #1 bench
  * line) — same in-process repetition methodology as [[StreamProbe]]: the
  * first rep pays JVM/codegen warmup, later reps are the steady state this
  * host can actually compare. Modes (space-separated in args(1)):
  *   adj    — (re)build the shared adjacency memo (forced fresh) and count
  *   wedges — shuffle+radix-sort+RLE common-neighbor count, no scoring
  *   full   — the complete operator (attach + score + top-50 collect)
  * Each rep clears the adjacency memo first unless KEEP_MEMO=1, so `full`
  * can be measured with the memo either cold (bench shape: pagerank builds
  * it first in a real run) or warm.
  */
object NbrProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("data/sf1")
    val modes = args.lift(1).getOrElse("adj wedges full").split("\\s+").toSeq
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val keepMemo = sys.env.get("KEEP_MEMO").contains("1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[nbrprofile] $label%-28s $s%8.2f s   ($r)")
    }

    for (rep <- 1 to reps; m <- modes) {
      if (!keepMemo) Graph.clearAdjacencyMemo()
      m match {
        case "adj" =>
          time(s"rep$rep adjacency")(Graph.adjacency(spark, dir).count())
        case "wedges" =>
          Graph.adjacency(spark, dir).count() // memo warm; measure the tail only
          val adj = Graph.adjacency(spark, dir)
          time(s"rep$rep wedges+rle")(graft.ops.GraphProbe.commonsCount(adj))
        case "sizes" =>
          Graph.adjacency(spark, dir).count()
          val adj = Graph.adjacency(spark, dir)
          time(s"rep$rep sizes")(graft.ops.GraphProbe.sizesCount(adj))
        case "fulljoin" =>
          Graph.adjacency(spark, dir).count()
          val adj = Graph.adjacency(spark, dir)
          time(s"rep$rep full(joinattach)")(graft.ops.GraphProbe.fullJoinAttach(adj))
        case "full" =>
          // warm the memos the round-15 driver path actually reads
          Graph.edges(spark, dir).count()
          Graph.degrees(spark, dir).count()
          Graph.cappedAdjacency(spark, dir).count()
          time(s"rep$rep full")(Graph.neighborJaccard(spark, dir).collect().length)
        case other => sys.error(s"unknown mode $other")
      }
      System.gc()
    }
    spark.stop()
  }
}
