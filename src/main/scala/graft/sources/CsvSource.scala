package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CSV source with the reference's parsing semantics
  * (reference: `src/execution/file_stream.rs:10-335`):
  *
  *   - caller-declared schema (`LazyFrame::from_csv`,
  *     `src/logical_plan/builder.rs:41-55`) — no inference;
  *   - header row skipped (`file_stream.rs:134-150`);
  *   - configurable delimiter (the demo uses `;`, `src/main.rs:238-246`);
  *   - `""` and `"null"` (case-insensitive) parse as NULL, fields trimmed
  *     (`file_stream.rs:59-114`);
  *   - booleans accept `true/t/1` and `false/f/0` case-insensitively
  *     (`file_stream.rs:78-96`).
  *
  * Implementation: Spark's native CSV reader (distributed, splittable —
  * a 100 TB CSV directory scans in parallel across executors) reading every
  * declared column as string, then a projection applies the trim/null/boolean
  * lexing rules as codegen'd expressions and casts to the declared type. The
  * reference's adaptive batch sizing (8 MB target, `file_stream.rs:346-369`)
  * maps to `spark.sql.files.maxPartitionBytes` — a scan-partitioning config,
  * not per-operator code.
  */
object CsvSource {

  def read(spark: SparkSession, path: String, schema: StructType,
           delimiter: String = ",", header: Boolean = true): DataFrame = {
    val rawSchema = StructType(schema.fields.map(f => StructField(f.name, StringType, nullable = true)))
    val raw = spark.read
      .schema(rawSchema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      // reference trims fields before lexing (file_stream.rs:61)
      .option("ignoreLeadingWhiteSpace", "true")
      .option("ignoreTrailingWhiteSpace", "true")
      .csv(path)
    raw.select(schema.fields.toIndexedSeq.map(f => lex(col(f.name), f.dataType).as(f.name)): _*)
  }

  /** `""`/`"null"` → NULL, then type-specific parse (file_stream.rs:59-114). */
  private def lex(c: Column, dt: DataType): Column = {
    val trimmed = trim(c)
    val nulled = when(trimmed === "" || lower(trimmed) === "null", lit(null)).otherwise(trimmed)
    dt match {
      case BooleanType =>
        when(lower(nulled).isin("true", "t", "1"), lit(true))
          .when(lower(nulled).isin("false", "f", "0"), lit(false))
          .otherwise(lit(null).cast(BooleanType))
      case other => nulled.cast(other)
    }
  }
}
