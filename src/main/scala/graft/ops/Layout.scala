package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout planning — the write-side optimization that makes the
  * read side's min/max skipping work: multi-dimensional (Z-order)
  * clustering assigns co-queried rows to the same output file so a
  * point/range predicate on EITHER dimension prunes most files from the
  * scan. The lakehouse formats expose this as `OPTIMIZE ... ZORDER BY`;
  * here it is plain DataFrame algebra over the orders fact.
  *
  * Scale design: tiles come from fixed-width ranges over broadcast
  * global min/max (ONE bounded aggregate + a single-row broadcast) —
  * map-side assignment, NO global sort and NO single-partition window,
  * which is what makes this shape survive a 100 TB fact table (a
  * ntile-based ranking would funnel the corpus through one sort
  * partition). The bit-interleave is exact integer math, identical in
  * both engines.
  */
object Layout {

  /** Tiles per dimension (2^6) — 64×64 z-grid, 4096 cells, 64 files. */
  val ZTiles = 64
  private val ZBits = 6

  /** Bit-interleave two [[ZBits]]-bit tile columns into the z-value:
    * z = Σ a_i·2^(2i+1) + b_i·2^(2i). */
  private def interleave(a: Column, b: Column): Column =
    (0 until ZBits).map { i =>
      (shiftright(a, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))) +
        (shiftright(b, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
    }.reduce(_ + _)

  /** The same interleave rendered as SQL text for the DuckDB oracle —
    * generated from the same loop so the two engines cannot drift. */
  private def interleaveSql(a: String, b: String): String =
    (0 until ZBits).map { i =>
      s"((($a >> $i) & 1) * ${1L << (2 * i + 1)} + (($b >> $i) & 1) * ${1L << (2 * i)})"
    }.mkString(" + ")

  /** Z-order layout plan for the orders fact over (customer, order day):
    * every row maps to a 64×64 z-grid cell via range tiles, cells pack
    * into 64 output files by z prefix (top [[ZBits]] interleaved bits),
    * and the emitted manifest carries each file's per-dimension tile
    * bounding box — the min/max stats a reader's file-skipping consults.
    * Because z-ordering keeps both dimensions local, each file's box is
    * a small fraction of the grid (LayoutSpec pins it far below the
    * full-range boxes a single-dimension sort leaves on its secondary
    * dimension). All-integer output → bit-exact oracle. */
  def zorderPlan(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir).select(
      col("o_orderkey"),
      col("o_custkey"),
      datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date"))
        .cast("long").as("dday"))
    val bounds = o.agg(
      min(col("o_custkey")).as("min_c"), max(col("o_custkey")).as("max_c"),
      min(col("dday")).as("min_d"), max(col("dday")).as("max_d"))
    // integer DIV, not Column./ (double division could land an ulp under
    // an exact boundary and flip a tile vs the oracle's exact //)
    o.crossJoin(broadcast(bounds))
      .select(col("o_orderkey"),
        expr(s"((o_custkey - min_c) * $ZTiles) DIV (max_c - min_c + 1)").as("tc"),
        expr(s"((dday - min_d) * $ZTiles) DIV (max_d - min_d + 1)").as("td"))
      .withColumn("file_id", shiftright(interleave(col("tc"), col("td")), ZBits))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("tc")).as("min_ctile"), max(col("tc")).as("max_ctile"),
        min(col("td")).as("min_dtile"), max(col("td")).as("max_dtile"))
      .orderBy("file_id")
  }

  /** DuckDB oracle for [[zorderPlan]] — identical integer tile and
    * interleave arithmetic. */
  def zorderOracle: String = {
    val z = interleaveSql("tc", "td")
    s"""WITH o AS (
       |  SELECT o_orderkey, o_custkey,
       |         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS dday
       |  FROM orders),
       |b AS (SELECT min(o_custkey) AS min_c, max(o_custkey) AS max_c,
       |             min(dday) AS min_d, max(dday) AS max_d FROM o),
       |tiles AS (SELECT o_orderkey,
       |    ((o_custkey - min_c) * ${ZTiles}) // (max_c - min_c + 1) AS tc,
       |    ((dday - min_d) * ${ZTiles}) // (max_d - min_d + 1) AS td
       |  FROM o, b),
       |placed AS (SELECT o_orderkey, tc, td, ($z) >> ${ZBits} AS file_id FROM tiles)
       |SELECT file_id, count(*) AS n_rows,
       |       min(tc) AS min_ctile, max(tc) AS max_ctile,
       |       min(td) AS min_dtile, max(td) AS max_dtile
       |FROM placed GROUP BY 1 ORDER BY file_id""".stripMargin
  }
}
