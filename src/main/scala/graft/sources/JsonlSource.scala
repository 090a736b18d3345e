package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSON-lines corpus reader with corrupt-record quarantine — the
  * production ingestion pattern for web-scale text corpora (beyond the
  * reference, which reads only CSV: `src/execution/file_stream.rs`).
  *
  * PERMISSIVE mode + `_corrupt_record`: a malformed line neither fails
  * the job (FAILFAST — at 100 TB a handful of bad lines per shard is
  * normal and a restart is not an option) nor silently disappears
  * (DROPMALFORMED — silent data loss is how corpora drift). Bad lines
  * surface as rows with the raw text in the quarantine column, so the
  * pipeline can count, sample, and route them to a dead-letter sink.
  */
object JsonlSource {

  val CorruptCol = "_corrupt_record"

  /** Declared-schema JSONL scan; the returned frame carries [[CorruptCol]]
    * (null for clean rows). Schema declaration, not inference: at scale an
    * inference pass is a full extra read of the input. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val withQuarantine = schema.add(StructField(CorruptCol, StringType, nullable = true))
    spark.read
      .schema(withQuarantine)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
  }

  /** Split a [[read]] result into (clean rows without the quarantine
    * column, quarantined raw lines). Callers persist the input when
    * consuming both sides, or write the quarantine side first. */
  def partition(df: DataFrame): (DataFrame, DataFrame) = {
    val clean = df.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line"))
    (clean, bad)
  }
}
