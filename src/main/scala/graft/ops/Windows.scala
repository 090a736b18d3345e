package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window functions + event-time analytics (absent in the reference —
  * SURVEY.md §2.6). Window specs partition by a key, so at 100 TB each
  * partition's state stays executor-local after one shuffle on the partition
  * key; no driver-side work anywhere.
  */
object Windows {

  /** Top-3 orders per customer by price — row_number with a deterministic
    * orderkey tiebreak. One shuffle on o_custkey; the rank filter cuts
    * output before the oracle sort. */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(spark, dir)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        col("o_totalprice").as("totalprice"),
        col("rk"))
      .orderBy("custkey", "rk")
  }

  /** Running total per customer over order date — a frame-bounded running
    * sum. Both Spark and the oracle accumulate left-to-right over the same
    * deterministic order, so even FP addition matches bit-for-bit; rounding
    * is belt-and-braces. */
  def runningTotal(spark: SparkSession, dir: String): DataFrame = {
    val ord = Seq(col("o_orderdate").asc, col("o_orderkey").asc)
    val w = Window.partitionBy(col("o_custkey")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderkey").as("orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_total"))
      .orderBy("custkey", "orderkey")
  }

  /** Ranking-function breadth over one window spec: ntile quartiles,
    * percent_rank, cume_dist, dense_rank, lead, and first/last value with
    * an explicit full-partition frame. One shuffle on the partition key
    * serves all seven functions (same WindowExec). */
  def windowBreadth(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(spark, dir)
      .filter(col("o_custkey") % 100 === 0) // thin slice keeps the oracle dump small
      .select(
        col("o_orderstatus").as("status"),
        col("o_orderkey").as("orderkey"),
        col("o_totalprice").as("price"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        dense_rank().over(w).as("drank"),
        lead(col("o_orderkey"), 1).over(w).as("next_orderkey"),
        first(col("o_orderkey")).over(wFull).as("cheapest_key"),
        last(col("o_orderkey")).over(wFull).as("priciest_key"))
      .orderBy("status", "orderkey")
  }

  /** RANGE-frame sliding aggregate: per event, the count/value-sum of the
    * same user's events in the trailing hour — a VALUE-based frame
    * (RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW over epoch seconds),
    * the window shape [[runningTotal]]'s ROWS frame can't express: the
    * frame extends by time distance, not row count, and equal-timestamp
    * peers are all included. Same single shuffle on user_id. */
  def rangeFrameHourly(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
      .rangeBetween(-3600L, Window.currentRow)
    Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("es"), col("value"))
      .select(col("user_id"), col("event_id"), col("es"),
        count(lit(1)).over(w).as("n_last_hour"),
        // exact cents over the range frame: the window sum accumulates
        // integers, so the per-row render cannot straddle a cent
        (sum(round(col("value") * 100).cast("long")).over(w)
          .cast("double") / 100.0).as("value_last_hour"))
      .orderBy("user_id", "event_id")
  }

  /** lag/lead deltas: per-user gap between consecutive events (seconds).
    * The canonical event-sequence analysis shape: shuffle once on user_id,
    * sort within partition, no global sort of the fact table. */
  def eventGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .select(
        col("user_id"),
        col("event_id"),
        (unix_timestamp(col("ts")) - unix_timestamp(lag(col("ts"), 1).over(w))).as("gap_sec"))
      .orderBy("user_id", "event_id")
  }

  /** Forward-fill (last observation carried forward): `last(…, ignoreNulls)`
    * over an explicit running ROWS frame — the gap-filling primitive for
    * sensor/price series. `click` readings are treated as missing and
    * inherit the user's previous non-missing value; leading missings stay
    * null (no value to carry — filling with 0 would fabricate data). One
    * shuffle on user_id, state never leaves the partition. */
  def forwardFill(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("v", when(col("event_type") =!= "click", col("value")))
      .select(
        col("user_id"),
        col("event_id"),
        last(col("v"), ignoreNulls = true).over(w).as("filled"))
      .orderBy("user_id", "event_id")
  }

  /** SCD2 (slowly-changing-dimension type 2) build: collapse each
    * customer's o_orderpriority sequence into validity intervals — emit a
    * version row only where the tracked attribute CHANGES (lag ≠ current,
    * or first observation), then close each interval with the next
    * change's start (`lead`); the open interval is the current version.
    * This is the standard warehouse pattern for building a temporal
    * dimension from an event log, and the batch analog of a CDC merge.
    *
    * Scale shape: both window passes share ONE partitioning (o_custkey) —
    * the change-point filter runs on the first pass's output without
    * re-shuffling, so the whole build is a single exchange + two
    * executor-local sorts over (custkey, date, orderkey). At 100 TB the
    * dimension key is the shuffle key and per-key state is a sequential
    * scan — no driver involvement, no self-join (the naive SCD2 via
    * "join each row to the next change" would shuffle twice and skew on
    * hot keys). */
  def scd2Intervals(spark: SparkSession, dir: String): DataFrame =
    scd2Df(Tables.orders(spark, dir))

  /** Core of [[scd2Intervals]] over any orders-shaped frame (spec entry
    * point: synthetic change sequences with known intervals). */
  def scd2Df(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    orders
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderpriority"))
      .withColumn("prev", lag(col("o_orderpriority"), 1).over(w))
      .filter(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
      // second window runs on the CHANGE ROWS under the same partitioning:
      // Catalyst reuses the exchange, so no second shuffle appears
      .withColumn("valid_to", lead(col("o_orderdate"), 1).over(w))
      .select(
        col("o_custkey").as("custkey"),
        col("o_orderpriority").as("priority"),
        col("o_orderdate").as("valid_from"),
        col("valid_to"),
        col("valid_to").isNull.as("is_current"),
        col("o_orderkey"))
      // (custkey, valid_from, priority) is NOT a total order: >=3 same-date
      // orders whose tracked priority repeats (A,X,A on one date) give two
      // change rows with identical keys but different valid_to, so row order
      // would be engine-dependent. The change row's o_orderkey is unique per
      // customer — sort on it, then drop it (projection preserves the sort)
      .orderBy("custkey", "valid_from", "o_orderkey")
      .drop("o_orderkey")
  }
}
