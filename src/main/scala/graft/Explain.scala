package graft
import org.apache.spark.sql.SparkSession

/** Plan-inspection utility: prints `explain("formatted")` for each query
  * (or the subset named in args) so scan pushdown (`PushedFilters`,
  * `ReadSchema`), join strategies, and WholeStageCodegen spans can be
  * audited. Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSet else SparkEntry.queries.keySet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).filter(q => names(q._1)).foreach {
      case (name, fn) =>
        println(s"\n========== $name ==========")
        try fn(spark, sfDir).explain("formatted")
        catch { case e: Throwable => println(s"explain failed: $e") }
        // the nbr_jaccard wedge count crosses into RDD space (run-length
        // pass over a sorted shuffle), so the outer plan shows only an
        // ExistingRDD leaf — dump the inner subplan too for audit
        if (name == "graph_nbr_jaccard") {
          println(s"\n---------- $name (inner tagged+sorted wedge∪edge subplan) ----------")
          try graft.ops.Graph.nbrTaggedSortedParts(
            graft.ops.Graph.cappedAdjacency(spark, sfDir),
            graft.ops.Graph.edges(spark, sfDir)).explain("formatted")
          catch { case e: Throwable => println(s"explain failed: $e") }
        }
    }
    spark.stop()
  }
}
