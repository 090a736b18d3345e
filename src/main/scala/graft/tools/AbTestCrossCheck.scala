package graft.tools

import graft.ops.EventTime
import org.apache.spark.sql.SparkSession

/** One-off cross-engine harness for `ev_ab_test`: runs the Spark query over
  * each synthetic events dir given on the command line and dumps the result
  * parquet for a DuckDB-side diff against `SparkEntry.oracleSql`. Local SF
  * data is degenerate (every user converts, z = 0), so this is the only
  * local way to exercise the integer-exact rendering path cross-engine. */
object AbTestCrossCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { dir =>
      EventTime.abTest(spark, dir).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/spark_out")
      println(s"[abtest-crosscheck] wrote $dir/spark_out")
    }
    spark.stop()
  }
}
