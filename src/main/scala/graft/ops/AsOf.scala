package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series joins the reference lacks entirely (its only join is a
  * single-key inner hash join, `src/physical_plan/plan.rs:174-254`) and
  * Spark lacks as built-ins: as-of join and range (interval) join,
  * composed from native operators per the preference order in the build
  * brief (compose > custom plan).
  *
  * As-of join strategy — the merge-scan shape that scales: tag both sides,
  * union (no join at all!), sort within each key partition by time, carry
  * the most recent left row forward with a last_value window, keep right
  * rows. Cost = one shuffle on the key + one in-partition sort; no
  * broadcast, no range explosion, skew-bounded by key cardinality. This is
  * how kdb/Flink-style as-of joins map onto a shuffle engine.
  *
  * Range join strategy: equi-join on (key, coarse time bucket) with the
  * interval predicate as a post-filter. Bucketing turns an unbounded
  * theta-join into an equi-join with bounded fan-out (each left row joins
  * ≤2 buckets for a window ≤ bucket width) — the standard interval-join
  * decomposition at scale.
  */
object AsOf {

  /** Generic as-of join: for each `right` row, the latest `left` row with
    * the same key and leftTime <= rightTime; ties on leftTime resolved to
    * the largest `tiebreak` value (determinism for the oracle compare).
    * Output = right columns + `asof_`-prefixed selected left columns (null
    * when no prior left row). Output columns: `k`, `t` (the right rows'
    * key/time) plus one `asof_<c>` per requested left column.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               leftVals: Seq[String], tiebreak: String): DataFrame = {
    val lTagged = left.select(
      col(key).as("k"), col(time).as("t"), lit(0).as("side"),
      col(tiebreak).as("tb"),
      struct(leftVals.map(col): _*).as("lv"))
    val rTagged = right.select(
      col(key).as("k"), col(time).as("t"), lit(1).as("side"),
      lit(null).cast(lTagged.schema("tb").dataType).as("tb"),
      lit(null).cast(lTagged.schema("lv").dataType).as("lv"))
    // left rows sort before right rows at equal timestamps (side 0 < 1),
    // so an equal-time left row IS visible to the right row — asof <=;
    // among equal-time left rows the max-tiebreak one sorts last and wins.
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("side").asc, col("tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = lTagged.unionByName(rTagged)
      .withColumn("asof", last(col("lv"), ignoreNulls = true).over(w))
    val rightRows = unioned.filter(col("side") === 1)
    leftVals.foldLeft(rightRows) { (df, c) =>
      df.withColumn(s"asof_$c", col("asof").getField(c))
    }.drop("side", "tb", "lv", "asof")
  }

  /** Backward as-of join with a STALENESS TOLERANCE (pandas
    * `merge_asof(tolerance=...)` semantics): matches older than
    * `toleranceSec` before the right row are nulled out, right rows kept.
    * Same union + merge-scan as [[asofJoin]] — the tolerance is a pure
    * post-window projection, so the plan shape (ONE shuffle on the key,
    * no join operator) is unchanged. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String, time: String,
                        leftVals: Seq[String], tiebreak: String,
                        toleranceSec: Long): DataFrame = {
    val lTagged = left.select(
      col(key).as("k"), col(time).as("t"), lit(0).as("side"),
      col(tiebreak).as("tb"),
      struct((leftVals.map(col) :+ col(time).as("_lt")): _*).as("lv"))
    val rTagged = right.select(
      col(key).as("k"), col(time).as("t"), lit(1).as("side"),
      lit(null).cast(lTagged.schema("tb").dataType).as("tb"),
      lit(null).cast(lTagged.schema("lv").dataType).as("lv"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("side").asc, col("tb").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val unioned = lTagged.unionByName(rTagged)
      .withColumn("asof_raw", last(col("lv"), ignoreNulls = true).over(w))
      .withColumn("asof",
        when(col("asof_raw").isNotNull &&
          col("t") - col("asof_raw").getField("_lt") <= toleranceSec, col("asof_raw")))
    val rightRows = unioned.filter(col("side") === 1)
    leftVals.foldLeft(rightRows) { (df, c) =>
      df.withColumn(s"asof_$c", col("asof").getField(c))
    }.drop("side", "tb", "lv", "asof", "asof_raw")
  }

  /** Tolerance-bounded as-of on events: each click picks up the most
    * recent prior-or-equal view of the same user ONLY if it happened
    * within the last 5 minutes — stale context is worse than none. */
  def eventAsofTolerance(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("es"), col("event_id").as("view_id"), col("value").as("view_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("es"), col("event_id"))
    asofJoinTolerance(views, clicks, "user_id", "es",
      Seq("view_id", "view_value"), "view_id", toleranceSec = 300L)
      .select(col("k").as("user_id"), col("t").as("click_es"),
        col("asof_view_id").as("view_id"),
        round(col("asof_view_value"), 2).as("view_value"))
      .orderBy("user_id", "click_es")
  }

  /** Forward as-of join: for each `right` row, the EARLIEST `left` row
    * with the same key and leftTime >= rightTime (the mirror of
    * [[asofJoin]] — same union + merge-scan shape, with the window frame
    * flipped to currentRow→unboundedFollowing and `first` instead of
    * `last`). Right rows sort before left rows at equal timestamps
    * (side 0 < 1) so an equal-time left row IS visible — asof >=; among
    * equal-time left rows the min-tiebreak one sorts first and wins. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String, time: String,
                      leftVals: Seq[String], tiebreak: String): DataFrame = {
    val lTagged = left.select(
      col(key).as("k"), col(time).as("t"), lit(1).as("side"),
      col(tiebreak).as("tb"),
      struct(leftVals.map(col): _*).as("lv"))
    val rTagged = right.select(
      col(key).as("k"), col(time).as("t"), lit(0).as("side"),
      lit(null).cast(lTagged.schema("tb").dataType).as("tb"),
      lit(null).cast(lTagged.schema("lv").dataType).as("lv"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("side").asc, col("tb").asc_nulls_last)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val unioned = rTagged.unionByName(lTagged)
      .withColumn("asof", first(col("lv"), ignoreNulls = true).over(w))
    val rightRows = unioned.filter(col("side") === 0)
    leftVals.foldLeft(rightRows) { (df, c) =>
      df.withColumn(s"asof_$c", col("asof").getField(c))
    }.drop("side", "tb", "lv", "asof")
  }

  /** Forward as-of self-join on events: each 'click' event picks up the
    * next at-or-after 'view' event of the same user. */
  def eventAsofForward(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("es"), col("event_id").as("view_id"), col("value").as("view_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("es"), col("event_id"))
    asofJoinForward(views, clicks, "user_id", "es", Seq("view_id", "view_value"), "view_id")
      .select(col("k").as("user_id"), col("t").as("click_es"),
        col("asof_view_id").as("next_view_id"),
        round(col("asof_view_value"), 2).as("next_view_value"))
      .orderBy("user_id", "click_es")
  }

  /** NEAREST-direction as-of join (pandas `merge_asof(direction=
    * 'nearest')`): for each `right` row, whichever of {latest left row at
    * or before, earliest left row strictly after} is closer in time —
    * ties go backward. ONE union + ONE shuffle + ONE sort: both window
    * frames (preceding-last and following-first) share the same
    * (t, side, tb) ordering, so Spark plans a single Exchange + Sort and
    * evaluates both directions in one Window operator — the nearest
    * variant costs no more than either one-sided form. Left rows sort
    * before right rows at equal t, so an equal-time left row lands in the
    * backward frame (asof ≤ / strict >). Among equal-time left rows the
    * max-tiebreak one wins backward and the min-tiebreak forward, both
    * deterministic. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String, time: String,
                      leftVals: Seq[String], tiebreak: String): DataFrame = {
    val lTagged = left.select(
      col(key).as("k"), col(time).as("t"), lit(0).as("side"),
      col(tiebreak).as("tb"),
      struct((leftVals.map(col) :+ col(time).as("_lt")): _*).as("lv"))
    val rTagged = right.select(
      col(key).as("k"), col(time).as("t"), lit(1).as("side"),
      lit(null).cast(lTagged.schema("tb").dataType).as("tb"),
      lit(null).cast(lTagged.schema("lv").dataType).as("lv"))
    val ord = Window.partitionBy(col("k"))
      .orderBy(col("t").asc, col("side").asc, col("tb").asc_nulls_first)
    val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val unioned = lTagged.unionByName(rTagged)
      .withColumn("prev", last(col("lv"), ignoreNulls = true).over(back))
      .withColumn("next", first(col("lv"), ignoreNulls = true).over(fwd))
    val dPrev = col("t") - col("prev").getField("_lt")
    val dNext = col("next").getField("_lt") - col("t")
    val chosen = when(col("prev").isNull, col("next"))
      .when(col("next").isNull, col("prev"))
      .when(dPrev <= dNext, col("prev"))
      .otherwise(col("next"))
    val rightRows = unioned.filter(col("side") === 1).withColumn("asof", chosen)
    leftVals.foldLeft(rightRows) { (df, c) =>
      df.withColumn(s"asof_$c", col("asof").getField(c))
    }.drop("side", "tb", "lv", "prev", "next", "asof")
  }

  /** Nearest as-of self-join on events: each 'click' picks up whichever
    * same-user 'view' is closest in time (prior-or-equal wins ties). */
  def eventAsofNearest(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("es"), col("event_id").as("view_id"), col("value").as("view_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("es"), col("event_id"))
    asofJoinNearest(views, clicks, "user_id", "es", Seq("view_id", "view_value"), "view_id")
      .select(col("k").as("user_id"), col("t").as("click_es"),
        col("asof_view_id").as("view_id"),
        round(col("asof_view_value"), 2).as("view_value"))
      .orderBy("user_id", "click_es")
  }

  /** As-of self-join on events: each 'click' event picks up the most recent
    * prior-or-equal 'view' event of the same user. */
  def eventAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"), col("value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("es"), col("event_id").as("view_id"), col("value").as("view_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("es"), col("event_id"))
    asofJoin(views, clicks, "user_id", "es", Seq("view_id", "view_value"), "view_id")
      .select(col("k").as("user_id"), col("t").as("click_es"),
        col("asof_view_id").as("view_id"),
        round(col("asof_view_value"), 2).as("view_value"))
      .orderBy("user_id", "click_es")
  }

  /** Range join: pair each 'purchase' event with all same-user 'click'
    * events in the preceding 10 minutes. Bucketed equi-join: both sides
    * keyed by (user, 10-min bucket); each purchase probes its own and the
    * previous bucket; exact interval filter afterwards. */
  def eventRangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val bucketSec = 600L
    val ev = Tables.events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("es"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("es").as("click_es"),
        (col("es") / bucketSec).cast("long").as("bucket"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("es").as("purchase_es"))
      .withColumn("bucket", explode(array(
        (col("purchase_es") / bucketSec).cast("long"),
        (col("purchase_es") / bucketSec).cast("long") - 1)))
    purchases.join(clicks, Seq("user_id", "bucket"))
      .filter(col("click_es") >= col("purchase_es") - bucketSec &&
        col("click_es") <= col("purchase_es"))
      // no distinct needed: a click lives in exactly one bucket and the two
      // probed buckets differ, so each (purchase, click) pair matches once
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        (col("purchase_es") - col("click_es")).as("lag_sec"))
      .orderBy("user_id", "purchase_id", "click_id")
  }

  /** Left outer join with null-extension (absent in reference — JoinType
    * variants commented out, `src/logical_plan/plan.rs:44-46`): customers
    * with their urgent-order count, 0 for customers without. */
  def leftOuterOrderCounts(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_urgent"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .select(col("c_custkey").as("custkey"),
        coalesce(col("n_urgent"), lit(0L)).as("n_urgent"))
      .orderBy("custkey")
  }

  /** Full outer join of two aggregate views (nation-level customer vs
    * supplier counts) — exercises both-side null extension. */
  def fullOuterNationCounts(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).groupBy(col("c_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_cust"))
      .filter(col("nk") % 3 =!= 0) // carve holes so both sides have misses
    val s = Tables.supplier(spark, dir).groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n_supp"))
      .filter(col("nk") % 3 =!= 1)
    c.join(s, Seq("nk"), "full_outer")
      .select(col("nk").as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy("nationkey")
  }
}
