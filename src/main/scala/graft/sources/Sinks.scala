package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File sinks (absent in the reference — its only sink is in-process
  * collect, SURVEY.md §2.1 S3). At 100 TB the write layout IS the read
  * plan: partition columns give partition pruning on the next scan,
  * bucketing gives shuffle-free joins on the bucket key.
  */
object Sinks {

  /** Hive-style partitioned parquet write: one directory per distinct
    * value of each partition column. Reads with a predicate on the
    * partition column scan only matching directories (partition pruning —
    * visible as `PartitionFilters` in explain). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write
      .partitionBy(partitionCols: _*)
      .mode("overwrite")
      .parquet(path)

  /** Bucketed + sorted table write: co-locates rows by hash(bucket key) so
    * a later join/agg on that key needs no shuffle. Requires a catalog
    * table (bucket metadata lives in the metastore). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)

  /** CSV sink with the reference source's conventions (`;`-style
    * configurable delimiter, `null` literal for NULLs, header) so a write
    * round-trips through [[CsvSource.read]] losslessly — sink conventions
    * that don't round-trip with the companion source are how export
    * pipelines corrupt nulls into empty strings. */
  def writeCsv(df: DataFrame, path: String, delimiter: String = ","): Unit =
    df.write
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("nullValue", "null")
      .mode("overwrite")
      .csv(path)

  /** ORC sink/source round-trip: Spark's second columnar format, same
    * pushdown/pruning machinery as parquet (predicate pushdown into ORC
    * stripes, column projection) — interchange with Hive/Trino stacks
    * costs one `.format` switch, no operator changes. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Round-trip demo used by the spec: partition lineitem by returnflag,
    * read back one partition, prove pruning via the file count actually
    * scanned. */
  def partitionedRoundTrip(spark: SparkSession, dir: String, outPath: String): DataFrame = {
    val l = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
    writePartitioned(l, outPath, "l_returnflag")
    spark.read.parquet(outPath).filter(col("l_returnflag") === "R")
  }
}
