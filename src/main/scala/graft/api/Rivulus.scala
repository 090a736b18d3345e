package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Thin fluent facade mirroring the reference `LazyFrame` API surface
  * (reference: `src/logical_plan/builder.rs:27-113` — `from_dataframe`,
  * `from_csv`, `select`, `filter`, `limit`, `inner_join`, `collect`,
  * `collect_streaming`).
  *
  * This is deliberately a zero-cost wrapper: every call delegates straight to
  * the Spark `DataFrame` API, so the plan stays declarative and Catalyst does
  * analysis/optimization/physical planning. The reference's single optimizer
  * rule (projection pushdown, `src/logical_plan/optimizer.rs:15-64`) is
  * subsumed by Catalyst's `ColumnPruning`/`PushDownPredicate`; its hard-coded
  * left-build hash join (`src/physical_plan/planner.rs:100-108`) is replaced
  * by Catalyst join selection (broadcast / shuffle-hash / sort-merge + AQE).
  *
  * Semantics deltas vs the reference, chosen deliberately (SURVEY.md §7.5):
  *   - SQL three-valued null logic (reference treats Null == Null as true,
  *     `src/datatypes/series.rs:85-117`); use [[innerJoinNullEq]] to opt in
  *     to the reference's null-matching join behavior.
  *   - select with computed expressions/aliases always executes (the
  *     reference's planners reject anything but bare/renamed columns,
  *     `src/physical_plan/planner.rs:113-132`).
  */
final case class Rivulus(df: DataFrame) {

  /** Projection. Accepts bare columns, aliases, and full expressions
    * (reference: `builder.rs:57-64`; executable subset `planner.rs:113-132`). */
  def select(cols: Column*): Rivulus = Rivulus(df.select(cols: _*))

  def selectNames(names: String*): Rivulus =
    Rivulus(df.select(names.map(df.col): _*))

  /** Row filter with the full predicate language (reference executes only
    * `col <op> literal`, `planner.rs:134-189`). SQL null semantics: a null
    * predicate drops the row — same as the reference's streaming engine
    * (`src/execution/record_batch.rs:221-243`). */
  def filter(predicate: Column): Rivulus = Rivulus(df.filter(predicate))

  /** First-n rows (reference: `builder.rs:75-82`; early-terminating stream
    * `src/physical_plan/streaming.rs:246-288` ≈ Spark `CollectLimitExec`). */
  def limit(n: Int): Rivulus = Rivulus(df.limit(n))

  /** Single-key inner equi-join reproducing the reference's output shape
    * (`src/physical_plan/plan.rs:174-254`): probe-side (right) columns first,
    * then build-side (left) columns minus the build key, with name
    * collisions suffixed `_right` (suffix logic `plan.rs:244-249` — the
    * *later* duplicate gets the suffix; since left/build columns are emitted
    * last there, our right-emits-first order keeps probe columns unsuffixed
    * just like the reference).
    */
  def innerJoin(right: Rivulus, leftKey: String, rightKey: String): Rivulus = {
    val l = df.alias("l")
    val r = right.df.alias("r")
    val joined = l.join(r, l.col(leftKey) === r.col(rightKey), "inner")
    val rightCols = right.df.columns.map(c => r.col(c).as(c))
    val leftKept = df.columns.filterNot(_ == leftKey).map { c =>
      val name = if (right.df.columns.contains(c)) c + "_right" else c
      l.col(c).as(name)
    }
    Rivulus(joined.select((rightCols ++ leftKept).toIndexedSeq: _*))
  }

  /** Reference-bug-compatible variant: join keys match on NULL = NULL
    * (`AnyValue::Null == Null` is true, `src/datatypes/series.rs:90`;
    * exploited by the hash join `src/physical_plan/plan.rs:183-204`).
    * Spark's `<=>` (eqNullSafe) expresses this natively. */
  def innerJoinNullEq(right: Rivulus, leftKey: String, rightKey: String): Rivulus = {
    val l = df.alias("l")
    val r = right.df.alias("r")
    Rivulus(l.join(r, l.col(leftKey) <=> r.col(rightKey), "inner"))
  }

  /** Eager collect (reference: `builder.rs:96-104`). */
  def collect(): Array[Row] = df.collect()

  /** The reference's "streaming collect" is bounded batch-at-a-time pulling
    * (`builder.rs:106-113`, `src/physical_plan/streaming.rs:235-243`) — the
    * Spark equivalent of incremental batch consumption is
    * `toLocalIterator`, which pulls one partition at a time instead of
    * materializing the whole result on the driver. */
  def collectStreaming(): Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }
}

object Rivulus {
  /** Reference `LazyFrame::from_dataframe` (`builder.rs:27-39`): wrap an
    * in-memory table as a leaf (→ Spark `LocalRelation`). */
  def fromDataFrame(df: DataFrame): Rivulus = Rivulus(df)

  def fromRows(spark: SparkSession, schema: StructType, rows: Seq[Row]): Rivulus =
    Rivulus(spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq), schema))

  /** Schema-inferring variant mirroring the reference's `Series::new`
    * (`/root/reference/src/datatypes/series.rs:185-229`): per column the
    * dtype comes from the values; integer columns promote to Float64 when
    * doubles co-occur (reference's Int64→Float64 promotion); genuinely
    * mixed types are rejected like `SeriesError::MixedTypes`, and a
    * zero-row input / all-null column is rejected like
    * `SeriesError::EmptyData` (nothing to infer from). */
  def fromRowsInferred(spark: SparkSession, names: Seq[String],
                       rows: Seq[Seq[Any]]): Rivulus = {
    import org.apache.spark.sql.types._
    if (rows.isEmpty)
      throw new IllegalArgumentException("EmptyData: cannot infer a schema from zero rows")
    val fields = names.zipWithIndex.map { case (name, i) =>
      val vs = rows.map(_(i)).filter(_ != null)
      if (vs.isEmpty)
        throw new IllegalArgumentException(
          s"EmptyData: column '$name' has no non-null values to infer from")
      val kinds = vs.map {
        case _: Int | _: Long     => "int"
        case _: Double | _: Float => "float"
        case _: String            => "str"
        case _: Boolean           => "bool"
        case v => throw new IllegalArgumentException(
          s"MixedTypes: unsupported value type ${v.getClass.getName} in column '$name'")
      }.distinct.sorted
      val dt = kinds match {
        case Seq("int")                       => LongType
        case Seq("float") | Seq("float", "int") => DoubleType // Int64 → Float64
        case Seq("str")                       => StringType
        case Seq("bool")                      => BooleanType
        case ks => throw new IllegalArgumentException(
          s"MixedTypes: column '$name' mixes ${ks.mkString(", ")}")
      }
      StructField(name, dt, nullable = true)
    }
    val coerced = rows.map { r =>
      Row.fromSeq(r.zipWithIndex.map { case (v, i) =>
        (v, fields(i).dataType) match {
          case (null, _)               => null
          case (x: Int, LongType)      => x.toLong
          case (x: Int, DoubleType)    => x.toDouble
          case (x: Long, DoubleType)   => x.toDouble
          case (x: Float, DoubleType)  => x.toDouble
          case (x, _)                  => x
        }
      })
    }
    fromRows(spark, StructType(fields), coerced)
  }

  /** Reference `LazyFrame::from_csv` (`builder.rs:41-55`): declared-schema
    * CSV scan. Parsing semantics matched to `src/execution/file_stream.rs:
    * 59-114`: header skipped, `""` and `"null"` → null, configurable
    * delimiter. (Boolean `t/f/1/0` forms are handled in
    * [[graft.sources.CsvSource]].) */
  def fromCsv(spark: SparkSession, path: String, schema: StructType,
              delimiter: String = ",", header: Boolean = true): Rivulus =
    Rivulus(graft.sources.CsvSource.read(spark, path, schema, delimiter, header))
}
