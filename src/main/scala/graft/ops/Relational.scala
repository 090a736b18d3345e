package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reference-parity relational operators (SURVEY.md §2.2/§2.3/§2.4) expressed
  * on driver test data: projection/alias (P1), filter (P2), limit (P3),
  * single-key inner join (J1), and the expression surface E1-E6 — executed
  * for real (the reference only type-checks arithmetic/boolean expressions,
  * `src/physical_plan/planner.rs:124-156`).
  *
  * Every query carries a deterministic ORDER BY on a unique key so the
  * DuckDB-oracle hash compare is order-insensitive-safe (BASELINE.md §2).
  *
  * Scale notes: all of these are single-pass scans (no shuffle except the
  * join and the global sort). Filters and projections reach the parquet scan
  * as PushedFilters/ReadSchema; the orders⋈customer join at real scale is a
  * shuffle-hash/sort-merge on the key — at test scale AQE converts it to a
  * broadcast automatically. The global sorts exist only for oracle
  * determinism; a production query would drop them (noted per-query).
  */
object Relational {

  /** P1: projection + alias (reference `LazyFrame::select`,
    * `src/logical_plan/builder.rs:57-64`; alias `expr.rs:40-42`). */
  def selectAlias(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(
        col("c_custkey").as("custkey"),
        col("c_name").as("name"),
        col("c_acctbal").as("acctbal"))
      .orderBy("custkey")

  /** P2 (eager form): `col > literal` filter — the exact shape the reference
    * executes (`src/physical_plan/planner.rs:134-189`). */
  def filterGtLiteral(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .filter(col("c_acctbal") > lit(5000.0))
      .select(
        col("c_custkey").as("custkey"),
        col("c_mktsegment").as("segment"),
        col("c_acctbal").as("acctbal"))
      .orderBy("custkey")

  /** P2+E6: compound AND/OR/IN/BETWEEN predicate — present in the reference
    * expression AST (`expr.rs:124-138`) but rejected by its planners; fully
    * executable here and pushed into the parquet scan by Catalyst. */
  def filterCompound(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(
        col("o_orderstatus") === "O" &&
          (col("o_totalprice").between(1000.0, 50000.0) ||
            col("o_orderpriority").isin("1-URGENT", "2-HIGH")))
      .select(
        col("o_orderkey").as("orderkey"),
        col("o_custkey").as("custkey"),
        col("o_totalprice").as("totalprice"),
        col("o_orderpriority").as("priority"))
      .orderBy("orderkey")

  /** P3: limit. Deterministic top-k = orderBy + limit (reference's limit is
    * positional, `src/physical_plan/plan.rs:151-173`; order-insensitive
    * oracle needs the sort — SURVEY.md §7.5.4). Spark plans this as a
    * TakeOrderedAndProject: no global sort materialization, each partition
    * keeps a k-heap — exactly the 100 TB-safe top-k shape. */
  def topK(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").as("orderkey"),
        col("o_totalprice").as("totalprice"))
      .orderBy(col("totalprice").desc, col("orderkey").asc)
      .limit(100)

  /** J1: single-key inner equi-join (reference `inner_join`,
    * `src/logical_plan/builder.rs:84-94`, exec `src/physical_plan/plan.rs:
    * 174-254`). No broadcast hint: AQE picks broadcast when customer's
    * actual size is under the threshold and falls back to a shuffle join
    * when it isn't (a forced hint would OOM the driver at 100× — customer
    * is ~15M rows at sf100). The reference hard-codes left as build side
    * and admits the smaller side should build, `planner.rs:100-108`. */
  def joinInner(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .select(
        o("o_orderkey").as("orderkey"),
        o("o_totalprice").as("totalprice"),
        c("c_name").as("cust_name"),
        c("c_mktsegment").as("segment"))
      .orderBy("orderkey")
  }

  /** E4: arithmetic projection (+ - * /) — schema-checked but unexecutable in
    * the reference (`src/physical_plan/planner.rs:124-127`); here a plain
    * codegen'd row-wise projection over 600k+ rows. */
  def arithmeticProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .select(
        col("l_orderkey").as("orderkey"),
        col("l_linenumber").as("linenumber"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        (col("l_quantity") + col("l_tax")).as("qty_plus_tax"),
        (col("l_extendedprice") / col("l_quantity")).as("unit_price"))
      .orderBy("orderkey", "linenumber")

  /** Math scalar breadth: sqrt / ln / exp / mod / abs / sign — all
    * codegen'd built-ins in one whole-stage projection. sqrt is IEEE
    * correctly-rounded (bit-identical cross-engine); ln/exp may differ by
    * an ulp between libm implementations, so those are rounded to 6dp on
    * both sides (non-terminating values, so the decimal-tie hazard does
    * not apply); mod/abs/sign are exact. */
  def mathBreadth(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_linenumber") === 1) // one line per order: the kernel
      // coverage is identical and the oracle sort doesn't dominate bench
      .select(
        col("l_orderkey").as("orderkey"),
        col("l_linenumber").as("linenumber"),
        round(sqrt(col("l_extendedprice")), 6).as("sqrt_price"),
        round(log(col("l_extendedprice")), 6).as("ln_price"),
        round(exp(col("l_discount")), 6).as("exp_disc"),
        pmod(col("l_orderkey"), lit(7)).as("key_mod"),
        abs(col("l_discount") - lit(0.05)).as("disc_dev"),
        signum(col("l_tax") - lit(0.04)).cast("int").as("tax_sign"))
      .orderBy("orderkey", "linenumber")

  /** Bitwise scalar breadth: and / or / xor / shifts / popcount — integer
    * bit kernels (the primitives under bitmap indexes, bloom probes, and
    * hash mixing), all exact cross-engine. One codegen projection. */
  def bitwiseBreadth(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").as("orderkey"),
        col("o_orderkey").bitwiseAND(lit(255L)).as("key_and"),
        col("o_orderkey").bitwiseOR(lit(4096L)).as("key_or"),
        col("o_orderkey").bitwiseXOR(col("o_custkey")).as("key_xor"),
        shiftleft(col("o_custkey"), 3).as("cust_shl"),
        shiftright(col("o_orderkey"), 2).as("key_shr"),
        bit_count(col("o_orderkey")).as("key_bits"))
      .orderBy("orderkey")
}
