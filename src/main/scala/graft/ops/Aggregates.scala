package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Standard OLAP operators — absent from the reference (its capability-
  * absence ledger, SURVEY.md §2.6: no agg/sort/set-ops/subqueries) but
  * required for a credible analytics engine. All native Spark: hash
  * aggregation with map-side partial aggregation, AQE-selected join
  * strategies, TakeOrderedAndProject top-k.
  *
  * Double-typed aggregates are rounded (2-4 dp) in both the Spark query and
  * the DuckDB oracle: FP addition is non-associative, so an unrounded
  * parallel sum would hash-mismatch the oracle's sequential sum at the last
  * ulp while being equally correct.
  */
object Aggregates {

  /** INTEGER-EXACT money summation — the anti-straddle discipline the sf1
    * replica replay mandated (q11/q14/q15 failures): lineitem money is
    * 2-decimal, so cents = round(price·100) is an exact integer and every
    * revenue term cents·(100−discCents) is an exact count of 1e-4 units.
    * Summing integers is immune to parallel FP summation order;
    * round(sum(double), 2) straddles a cent whenever the two engines'
    * last-ulp-different sums sit on a .005 boundary — a dice roll per
    * group per round that 10× data magnitudes made land. Sums are
    * DECIMAL(38,0) so the headroom survives 100 TB row counts (a long
    * overflows at ~7·10⁷ max-value charge rows under ANSI). */
  private[graft] def centsCol(price: Column): Column =
    round(price * 100).cast("long")

  /** Exact 1e-4-unit revenue term: cents × (100 − discCents). */
  private[graft] def revUnits(price: Column, discount: Column): Column =
    centsCol(price) * (lit(100L) - centsCol(discount))

  /** DECIMAL(38,0) sum of an exact integer term, for the renderers. */
  private[graft] def unitSum(term: Column): Column =
    sum(term.cast("decimal(38,0)"))

  /** Half-up 2-dp render of a NAMED unit-sum column (div needs SQL text):
    * one integer division + one exact double division — bit-identical
    * cross-engine at any magnitude. Non-negative sums. `scale` is the
    * units-per-cent factor: 1 for cents, 100 for 1e-4, 10000 for 1e-6. */
  private[graft] def render2dp(u: String, scale: Long): Column =
    (if (scale == 1L) col(u).cast("decimal(38,0)")
     else expr(s"($u + ${scale / 2}) div $scale"))
      .cast("double") / 100.0

  /** TPC-H Q1 pricing summary: the canonical groupBy-agg. Two-stage hash agg
    * (partial map-side combine → final after shuffle on the 6-value grouping
    * key) — at 100 TB the partial agg collapses each scan partition to ≤6
    * rows, so the shuffle is trivially small regardless of input size.
    * Money sums are integer-exact (see [[centsCol]]); sum_qty stays a
    * double sum because quantity is integer-valued, making that sum exact
    * in fp anyway (≤ 2^53). */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val cents = centsCol(col("l_extendedprice"))
    val dc = centsCol(col("l_discount")); val tc = centsCol(col("l_tax"))
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        unitSum(cents).as("u_base"),
        unitSum(cents * (lit(100L) - dc)).as("u_disc"),
        unitSum(cents * (lit(100L) - dc) * (lit(100L) + tc)).as("u_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .select(col("returnflag"), col("linestatus"), col("sum_qty"),
        render2dp("u_base", 1L).as("sum_base_price"),
        render2dp("u_disc", 100L).as("sum_disc_price"),
        render2dp("u_charge", 10000L).as("sum_charge"),
        col("avg_qty"), col("avg_price"), col("avg_disc"), col("count_order"))
      .orderBy("returnflag", "linestatus")
  }

  /** TPC-H Q3-style: 3-way join + agg + top-10 by revenue. customer filter
    * reduces the build side before the join; both joins shuffle on their key
    * at scale (orderkey join co-partitions lineitem/orders). No hints —
    * AQE broadcasts the filtered customer side when its post-filter size
    * fits, and degrades gracefully to shuffle when it doesn't. */
  def revenueTopOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(o("o_orderkey").as("orderkey"))
      .agg(unitSum(revUnits(l("l_extendedprice"), l("l_discount"))).as("u"))
      .select(col("orderkey"), render2dp("u", 100L).as("revenue"))
      .orderBy(col("revenue").desc, col("orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-style: 5-way star join + agg by nation. region/nation keep
    * explicit broadcast hints (spec-bounded at 5/25 rows at EVERY scale
    * factor — always broadcast-safe); supplier/customer get no hint so AQE
    * decides from actual size (supplier is ~1M rows at sf100 — a forced
    * hint there becomes a driver OOM). The fact-fact lineitem⋈orders join
    * shuffles on orderkey. s_nationkey = c_nationkey is the classic Q5
    * "local supplier" constraint. */
  def revenueByNation(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).filter(col("r_name").isin("ASIA", "AMERICA"))
    val n = Tables.nation(spark, dir)
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val s = Tables.supplier(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(s, l("l_suppkey") === s("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey") && c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(n("n_name").as("nation"))
      .agg(unitSum(revUnits(l("l_extendedprice"), l("l_discount"))).as("u"))
      .select(col("nation"), render2dp("u", 100L).as("revenue"))
      .orderBy(col("revenue").desc, col("nation"))
  }

  /** TPC-H Q14-style promo revenue share: lineitem ⋈ part with a
    * conditional aggregate. part is a mid-size dim (~20M rows at sf100) —
    * no broadcast hint; AQE broadcasts at small SF and switches to a
    * shuffle join co-partitioned on partkey when part outgrows the
    * threshold. */
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    // revenue summed as integer-exact 1e-4 money units (cents ×
    // (100−discCents)) and rendered 2dp by integer half-up division —
    // round(sum(double), 2) straddled a cent boundary on 10× data
    // (parallel FP summation order differs between engines); the exact
    // integer sum cannot, at any magnitude
    val units = round(l("l_extendedprice") * 100).cast("long") *
      (lit(100L) - round(l("l_discount") * 100).cast("long"))
    l.join(p, l("l_partkey") === p("p_partkey"))
      .groupBy(p("p_type").as("ptype"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(units).as("u"),
        round(avg("p_retailprice"), 4).as("avg_retail"))
      .select(col("ptype"), col("n_items"),
        (expr("(u + 50) div 100").cast("double") / 100.0).as("revenue"),
        col("avg_retail"))
      .orderBy("ptype")
  }

  /** TPC-H Q4-style order-priority check: a date-windowed LEFT SEMI join
    * (EXISTS) + count by priority. The semi join shuffles only orderkeys
    * from lineitem — Spark never materializes matched rows, and AQE picks
    * broadcast/shuffle from the post-filter orders size. */
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
    val l = Tables.lineitem(spark, dir).select(col("l_orderkey"))
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("priority")
  }

  /** TPC-H Q10-style returned-item revenue: 4-way join filtered to
    * returned lineitems, grouped per customer, top-20 by lost revenue.
    * nation keeps a broadcast hint (spec-bounded 25 rows); the fact joins
    * and customer are AQE-selected. Top-k via TakeOrderedAndProject. */
  def returnsTopCustomers(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir).filter(col("l_returnflag") === "R")
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(c("c_custkey").as("custkey"), c("c_name").as("name"),
        n("n_name").as("nation"))
      .agg(unitSum(revUnits(l("l_extendedprice"), l("l_discount"))).as("u"))
      .select(col("custkey"), col("name"), col("nation"), render2dp("u", 100L).as("revenue"))
      .orderBy(col("revenue").desc, col("custkey").asc)
      .limit(20)
  }

  /** TPC-H Q7-style volume shipping: revenue between DIFFERENT supplier
    * and customer nations by ship year — the same dimension table joined
    * twice under different roles (n1 = supplier nation, n2 = customer
    * nation, both broadcast-hinted: spec-bounded 25 rows). Like the real
    * Q7, restricted to ONE nation pair in both directions — which also
    * keeps the output at ~14 groups, where round(sum, 2) cannot brush a
    * decimal rounding tie the way a 4000-group variant measurably does
    * (see EventTime.tumblingHourly's note). The fact-side joins shuffle
    * on their keys; the pair filter applies before aggregation. */
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val s = Tables.supplier(spark, dir)
    val n1 = Tables.nation(spark, dir).select(
      col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, dir).select(
      col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    l.join(s, l("l_suppkey") === s("s_suppkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), s("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), c("c_nationkey") === col("n2_key"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(l("l_shipdate")).as("yr"))
      .agg(unitSum(revUnits(l("l_extendedprice"), l("l_discount"))).as("u"),
        count(lit(1)).as("n_items"))
      .select(col("supp_nation"), col("cust_nation"), col("yr"),
        render2dp("u", 100L).as("revenue"), col("n_items"))
      .orderBy("supp_nation", "cust_nation", "yr")
  }

  /** TPC-H Q13-style customer distribution: two-level aggregation — first
    * orders-per-customer over a LEFT join (customers with zero orders must
    * appear), then customers-per-order-count. Both shuffles are on keys
    * that shrink the data (custkey, then the tiny count domain). */
  def customerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey"))
      .agg(count(o("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q18-style large-volume orders: orders whose total lineitem
    * quantity exceeds a threshold — the grouped-subquery-in-join shape.
    * The lineitem aggregation collapses to one row per order BEFORE the
    * joins, so the join input is already reduced ~4× and AQE can
    * broadcast the survivors. */
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    val big = Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum("l_quantity").as("qty"))
      .filter(col("qty") > 250.0)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(c("c_name").as("name"), c("c_custkey").as("custkey"),
        o("o_orderkey").as("orderkey"), o("o_totalprice").as("totalprice"),
        round(col("qty"), 2).as("sum_qty"))
      .orderBy(col("totalprice").desc, col("orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q22-style: customers with above-average balance and no URGENT
    * orders, by segment — scalar aggregate subquery (broadcast single-row
    * cross join, no driver collect) + anti join + group. (The classic
    * "no orders at all" predicate is empty on the driver data — every
    * rich customer orders — so the urgency filter keeps the shape with a
    * non-trivial result.) */
  def idleRichCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).filter(col("o_orderpriority") === "1-URGENT")
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg(avg("c_acctbal").as("ab"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(o, col("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_cust"), round(sum("c_acctbal"), 2).as("total_bal"))
      .orderBy("segment")
  }

  /** Semi-structured column handling: parse the events JSON `props` with
    * a declared schema (from_json — codegen'd Jackson parse, no UDF) and
    * aggregate the extracted field. */
  def jsonProps(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.events(spark, dir)
      .select(col("event_type").as("etype"),
        from_json(col("props"), schema).getField("k").as("k"))
      .groupBy(col("etype"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("etype")
  }

  /** Same aggregation as [[jsonProps]] through Spark 4's VARIANT type:
    * `parse_json` once into a binary-encoded variant, then typed
    * `variant_get` path extraction. For heterogeneous/deep JSON this is
    * the scale path — the parse happens once per row regardless of how
    * many paths are later extracted, and the binary encoding pushes
    * through shuffles smaller than JSON text. */
  def jsonVariantProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_type").as("etype"),
        variant_get(parse_json(col("props")), "$.k", "long").as("k"))
      .groupBy(col("etype"))
      .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("etype")

  /** TPC-H Q19-style disjunctive predicate join: revenue over an OR of
    * three (brand, size, quantity) condition groups. Catalyst extracts the
    * common l_partkey = p_partkey conjunct so this still plans as an
    * equi-join (not a nested loop), with the disjunction as a post-join
    * filter — the classic test that complex predicates don't break join
    * planning. */
  def disjunctivePredicateJoin(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val p = Tables.part(spark, dir)
    l.join(p, l("l_partkey") === p("p_partkey") && (
      (p("p_brand") === "Brand#1" && p("p_size").between(1, 15) &&
        l("l_quantity").between(1, 11)) ||
      (p("p_brand") === "Brand#2" && p("p_size").between(1, 25) &&
        l("l_quantity").between(10, 20)) ||
      (p("p_brand") === "Brand#3" && p("p_size").between(1, 35) &&
        l("l_quantity").between(20, 30))))
      .agg(
        unitSum(revUnits(l("l_extendedprice"), l("l_discount"))).as("u"),
        count(lit(1)).as("n_items"))
      .select(render2dp("u", 100L).as("revenue"), col("n_items"))
  }

  /** Exact money arithmetic: DECIMAL(18,2) aggregation — no FP drift, so
    * the oracle matches with NO rounding anywhere (the double-typed
    * queries all need round() on both engines; decimal is the type a
    * financial pipeline would actually use at scale).
    *
    * The aggregation runs in decimal space (exact), but the OUTPUT is
    * integer cents (BIGINT): decimal columns survive two different
    * readback paths (pyarrow Decimal objects vs DuckDB native decimals)
    * with different canonical forms, so any decimal-typed output column
    * hash-mismatches cross-engine even when values are byte-identical
    * (observed rounds 2 AND 3, at widths 28,2 and 18,2 alike). Cents are
    * exact — the decimal is scale-2, so *100 is integral — and hash as
    * plain int64 everywhere. */
  def decimalExact(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderstatus").as("status"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      .groupBy("status")
      .agg(
        (sum("price") * 100).cast("long").as("total_cents"),
        (min("price") * 100).cast("long").as("lo_cents"),
        (max("price") * 100).cast("long").as("hi_cents"),
        count(lit(1)).as("n"))
      .orderBy("status")

  /** Date/time scalar breadth: extraction, truncation, differencing, and
    * offset arithmetic on the orders timeline. */
  def dateArithmetic(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(
        col("o_orderkey").as("orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofweek(col("o_orderdate")).as("dow"),
        datediff(lit("1998-12-31").cast("date"), col("o_orderdate").cast("date"))
          .as("days_to_eoy"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3mo"),
        quarter(col("o_orderdate")).as("qtr"))
      .orderBy("orderkey")

  /** Pivot: order counts + revenue by status (rows) x priority (columns).
    * Explicit pivot values keep the schema static — at scale an implicit
    * pivot would need a driver-side distinct pass first. */
  def pivotStatusPriority(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus").as("status"))
      .pivot("o_orderpriority", prios)
      .agg(round(sum("o_totalprice"), 2))
      .na.fill(0.0)
      .withColumnsRenamed(prios.zip(Seq("p_urgent", "p_high", "p_medium",
        "p_notspec", "p_low")).toMap)
      .orderBy("status")
  }

  /** Unpivot (wide->long): per-status min/avg/max price re-shaped into
    * (status, metric, value) rows — the inverse of pivot, via stack. */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        round(min("o_totalprice"), 2).as("min_price"),
        round(avg("o_totalprice"), 2).as("avg_price"),
        round(max("o_totalprice"), 2).as("max_price"))
      .selectExpr("status",
        "stack(3, 'min', min_price, 'avg', avg_price, 'max', max_price) AS (metric, value)")
      .orderBy("status", "metric")

  /** Statistical aggregate breadth: correlation, covariance, stddev,
    * skewness — single-pass moment aggregations (mergeable partials, so
    * map-side combine applies like any sum). */
  def statsAggregates(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("returnflag"))
      .agg(
        round(corr("l_quantity", "l_extendedprice"), 4).as("corr_qty_price"),
        round(covar_pop("l_quantity", "l_extendedprice"), 2).as("covar_qty_price"),
        round(stddev_pop("l_extendedprice"), 4).as("std_price"),
        round(var_pop("l_discount"), 6).as("var_disc"),
        round(skewness(col("l_extendedprice")), 4).as("skew_price"))
      .orderBy("returnflag")

  /** Conditional / selective aggregate breadth: count_if, bool_and /
    * bool_or, and max_by / min_by (argmax without a self-join — at scale
    * this replaces the "join back on the max" anti-pattern with one
    * single-pass aggregate). The ordering value is a TIE-FREE packed
    * int64 — exact cents (totalprice is 2-decimal money, so
    * round(p·100) recovers the integer exactly) shifted by 2^33 plus the
    * unique order key: a bare max_by(key, price) picks
    * partition-order-arbitrarily among TIED prices (non-deterministic
    * run to run and engine-divergent — caught by the sf1 replica replay,
    * where every price has 10 copies). Packing bound: cents < 2^26,
    * keys < 2^33 (≈8.6e9 orders) — widen the shift alongside the key
    * space if a larger corpus needs it. */
  def conditionalAggregates(spark: SparkSession, dir: String): DataFrame = {
    val packed = round(col("o_totalprice") * 100).cast("long") *
      lit(8589934592L) + col("o_orderkey") // 2^33
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        count_if(col("o_totalprice") > 100000.0).as("n_big"),
        bool_and(col("o_totalprice") > 0.0).as("all_positive"),
        bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"),
        max_by(col("o_orderkey"), packed).as("priciest_key"),
        min_by(col("o_orderkey"), packed).as("cheapest_key"))
      .orderBy("status")
  }

  /** HLL sketch MERGE — the property that makes approx-distinct work at
    * 100 TB: per-(status, priority) sketches are built in one pass (the
    * partials a partitioned corpus would persist), then hll_union_agg
    * merges them to per-status estimates WITHOUT re-reading the input.
    * Sketch estimates are implementation-specific, so the output carries
    * the EXACT companion (hashable in DuckDB) plus `est_ok` = estimate
    * within 10% of exact, checked in-plan — the oracle emits TRUE, so a
    * drifting sketch flips the oracle row red. Tighter error pinning
    * stays in AggregatesSpec. SCALE CAVEAT: the exact countDistinct
    * companion expands all values — oracle-harness-only; at 100 TB run
    * the sketch columns alone (see [[percentilesApprox]]). */
  def hllMergePartials(spark: SparkSession, dir: String): DataFrame = {
    val partials = Tables.orders(spark, dir)
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
    val merged = partials.groupBy(col("o_orderstatus").as("status"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_customers"))
    val exact = Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"))
    exact.join(merged, Seq("status"))
      .select(col("status"), col("n_customers"),
        (abs(col("approx_customers") - col("n_customers")) <=
          col("n_customers") * 0.10).as("est_ok"))
      .orderBy("status")
  }

  /** Linear-regression aggregates (regr_slope / regr_intercept / regr_r2 /
    * regr_count): the OLS-over-groups surface — single-pass moment
    * accumulation with map-side partial merge, so the shuffle carries one
    * moment tuple per (partition, group) at any scale. Continuous-double
    * moments → round() is tie-safe. */
  def regression(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag").as("returnflag"))
      .agg(
        round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
        round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("intercept"),
        round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6).as("r2"),
        regr_count(col("l_extendedprice"), col("l_quantity")).as("n"))
      .orderBy("returnflag")

  /** Exact percentiles per group (Spark `percentile` = exact linear
    * interpolation, matching DuckDB quantile_cont bit-for-bit after
    * rounding; at 100 TB swap for percentile_approx — same plan shape,
    * sketch-mergeable). */
  def percentiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
        round(min("o_totalprice"), 2).as("lo"),
        round(max("o_totalprice"), 2).as("hi"))
      .orderBy("status")

  /** Sketch-based quantiles: `percentile_approx` (Greenwald-Khanna) — the
    * 100 TB path next to the exact [[percentiles]]: bounded-memory,
    * mergeable partials, accuracy knob. The sketch values are not
    * reproducible in DuckDB, so the output carries the EXACT percentiles
    * (hashable vs quantile_cont) plus per-quantile `*_ok` booleans =
    * sketch within 2% of exact, checked in-plan; the oracle emits TRUE.
    * AggregatesSpec pins tighter rank-error bounds.
    *
    * SCALE CAVEAT: the exact `percentile()` companions buffer all group
    * values, so THIS query as benched is the oracle-harness shape, not the
    * bounded-memory production shape — at 100 TB run the sketch columns
    * alone (drop the exact companions and `*_ok` probes; the sketch is the
    * operator, the exact side exists to make it falsifiable cross-engine).
    * The fixed 2% tolerance is calibrated to the GK accuracy knob (1000)
    * on these distributions; an adversarial distribution could flake it —
    * in that case widen the knob, not the tolerance. */
  def percentilesApprox(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"),
        (abs(expr("percentile_approx(o_totalprice, 0.5, 1000)") -
          expr("percentile(o_totalprice, 0.5)")) <=
          expr("percentile(o_totalprice, 0.5)") * 0.02).as("p50_ok"),
        (abs(expr("percentile_approx(o_totalprice, 0.9, 1000)") -
          expr("percentile(o_totalprice, 0.9)")) <=
          expr("percentile(o_totalprice, 0.9)") * 0.02).as("p90_ok"),
        (abs(expr("percentile_approx(o_totalprice, 0.99, 1000)") -
          expr("percentile(o_totalprice, 0.99)")) <=
          expr("percentile(o_totalprice, 0.99)") * 0.02).as("p99_ok"))
      .orderBy("status")

  /** Calendar rollup: revenue by order month — date_trunc + two-stage agg,
    * the universal time-series reporting shape. */
  def monthlyRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("month")

  /** Exact count-distinct per group (Spark plans distinct via expand +
    * two-phase agg; at scale prefer [[approxDistinct]]). */
  def distinctCustomers(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_customers"),
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total"))
      .orderBy("priority")

  /** HLL-sketch distinct — the 100 TB answer to count-distinct (single
    * aggregation pass, fixed-size sketch, no expand). rsd = 0.02: the
    * 2%-error register count costs ~2× less per-row update than 1% and
    * AggregatesSpec pins the result within 5% of exact. Approx values
    * differ per implementation, so the output hashes via the EXACT
    * count-distinct companion + in-plan `est_ok` (oracle emits TRUE).
    *
    * Plan shape (round 13 — was the worst non-dedup sf10 line at 17×):
    * mixing `countDistinct` with a non-distinct agg makes Catalyst plan
    * an Expand (2 projections → 2× the input rows through the exchange)
    * plus the 3-phase distinct machinery. Instead the exact side is an
    * EXPLICIT two-stage aggregate: dedup to (priority, custkey) first —
    * map-side partial dedup, one exchange of already-deduped pairs —
    * then count. HLL insertion is idempotent, so
    * `approx_count_distinct` over the DEDUPED rows builds the identical
    * register set (identical estimate) while updating |distinct| rows
    * instead of |orders|. Same results, no Expand, strictly less
    * exchange volume. SCALE CAVEAT: the exact companion still shuffles
    * one row per distinct pair — oracle-harness shape; at 100 TB run
    * the sketch alone over the raw table (see [[percentilesApprox]]). */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderpriority").as("priority"), col("o_custkey").as("custkey"))
      .distinct()
      .groupBy(col("priority"))
      .agg(
        // count(custkey) over distinct (priority, custkey) rows ==
        // countDistinct (both ignore nulls)
        count(col("custkey")).as("n_customers"),
        // est_ok = HLL++ estimate within 10% of exact (rsd 0.02 → ~2%
        // std err), checked in-plan so the oracle (TRUE) pins the sketch
        (abs(approx_count_distinct(col("custkey"), rsd = 0.02) -
          count(col("custkey"))) <=
          count(col("custkey")) * 0.10).as("est_ok"))
      .orderBy("priority")

  /** ROLLUP grouping sets (absent in reference; native `.rollup`).
    * Grouped-out keys are COALESCEd to a sentinel so the oracle compare does
    * not depend on NULL-vs-NULL grouping representation or null ordering. */
  def rollupStatusPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup(col("o_orderstatus").as("status"), col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .select(
        coalesce(col("status"), lit("(all)")).as("status"),
        coalesce(col("priority"), lit("(all)")).as("priority"),
        col("n"), col("total"))
      .orderBy("status", "priority")

  /** CUBE grouping sets over two dimensions. */
  def cubeFlagStatus(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .cube(col("l_returnflag").as("returnflag"), col("l_linestatus").as("linestatus"))
      .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("sum_qty"))
      .select(
        coalesce(col("returnflag"), lit("(all)")).as("returnflag"),
        coalesce(col("linestatus"), lit("(all)")).as("linestatus"),
        col("n"), col("sum_qty"))
      .orderBy("returnflag", "linestatus")

  /** Left-semi join = EXISTS: customers that placed at least one order.
    * Semi joins ship only the key column of the probe side and stop at first
    * match — strictly cheaper than join+distinct at scale. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"))
      .orderBy("custkey")
  }

  /** Left-anti join = NOT EXISTS: customers with no urgent orders (every
    * customer has *some* order in the driver data, so plain no-orders would
    * be trivially empty). */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey").as("custkey"), col("c_acctbal").as("acctbal"))
      .orderBy("custkey")
  }

  /** Set operations (absent in reference): big spenders ∪/∩/∖ urgent-order
    * customers, tagged by which set op produced each row. UNION/INTERSECT/
    * EXCEPT all plan as aggregations/joins on the full row — at scale each is
    * one shuffle on the row hash. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    val rich = c.filter(col("c_acctbal") > 7500).select(col("c_custkey").as("custkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("custkey")).distinct()
    rich.union(urgent).distinct().withColumn("op", lit("union"))
      .unionAll(rich.intersect(urgent).withColumn("op", lit("intersect")))
      .unionAll(rich.except(urgent).withColumn("op", lit("except")))
      .orderBy("op", "custkey")
  }

  /** Cross join (absent in reference): small-dim cartesian product —
    * broadcast nested loop, fine because both sides are tiny dims. */
  def crossSmall(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables.region(spark, dir).select(col("r_name").as("region"))
    val n = Tables.nation(spark, dir).select(col("n_name").as("nation"))
    r.crossJoin(n).orderBy("region", "nation")
  }

  // ---- Misra-Gries heavy hitters --------------------------------------

  /** Misra-Gries summary buffer: item → decremented count. Immutable map
    * in a product wrapper so [[Encoders.product]] serializes the partial
    * state for the map-side/final aggregation split. */
  case class MgAcc(m: Map[String, Long])

  /** Misra-Gries frequent-items sketch as a typed [[Aggregator]] — the
    * third classic mergeable sketch next to HLL ([[approxDistinct]]) and
    * GK quantiles ([[percentilesApprox]]). Spark plans it with map-side
    * partial aggregation: each input partition reduces to a ≤[[MgCapacity]]-
    * entry summary and the shuffle carries one bounded buffer per
    * partition — versus the exact top-k path, which must shuffle the FULL
    * (token, count) vocabulary. Guarantee: for every item,
    * true_count − N/C ≤ estimate ≤ true_count, so any item with
    * frequency > N/C is guaranteed present.
    *
    * Merged-summary combine (sum counts, then subtract the (C+1)-th
    * largest and drop non-positives) preserves the error bound
    * (Agarwal et al., "Mergeable Summaries", PODS'12). */
  case class MisraGries(C: Int) extends Aggregator[String, MgAcc, Map[String, Long]] {
    def zero: MgAcc = MgAcc(Map.empty)
    def reduce(b: MgAcc, tok: String): MgAcc = {
      val m = b.m
      m.get(tok) match {
        case Some(c) => MgAcc(m.updated(tok, c + 1L))
        case None if m.size < C => MgAcc(m.updated(tok, 1L))
        case None =>
          // decrement-all: the classic counter give-back step
          MgAcc(m.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None })
      }
    }
    def merge(x: MgAcc, y: MgAcc): MgAcc = {
      val combined = y.m.foldLeft(x.m) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (combined.size <= C) MgAcc(combined)
      else {
        // subtract the (C+1)-th largest count; strictly-greater survivors
        // number at most C
        val d = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse).apply(C)
        MgAcc(combined.flatMap { case (k, c) => if (c > d) Some(k -> (c - d)) else None })
      }
    }
    def finish(r: MgAcc): Map[String, Long] = r.m
    def bufferEncoder: Encoder[MgAcc] = Encoders.product[MgAcc]
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder[Map[String, Long]]()
  }

  val MgCapacity = 200

  /** Heavy-hitter readout over the token stream: exact top-25 tokens
    * (the DuckDB-hashable companion) each checked against the [[MisraGries]]
    * sketch IN-PLAN — `in_sketch` (guaranteed for any token with
    * n > N/C) and `est_ok` (the MG error bound n − N/C ≤ est ≤ n) must
    * both be TRUE on every row, so a drifting sketch flips the oracle
    * red. The estimates themselves are NOT emitted: partial-merge order
    * varies run to run, and MG estimates (unlike the bound booleans) are
    * order-dependent. Single-row sketch re-attach is a broadcast
    * crossJoin (whitelisted). */
  def topkSketch(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select(explode(graft.ops.Text.tokensCol(lower(col("text")))).as("token"))
      .filter(col("token") =!= "")
    val sketch = toks.as[String]
      .select(MisraGries(MgCapacity).toColumn, count(lit(1)).as[Long])
      .toDF("sketch", "n_total")
    val exact = toks.groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(25)
    // try_element_at, not element_at: under ANSI mode a missing map key
    // throws — a drifting sketch must degrade to FALSE rows, not crash
    exact.crossJoin(broadcast(sketch))
      .select(col("token"), col("n"),
        try_element_at(col("sketch"), col("token")).isNotNull.as("in_sketch"),
        (coalesce(try_element_at(col("sketch"), col("token")), lit(0L))
          .between(col("n") - floor(col("n_total") / MgCapacity).cast("long"), col("n")))
          .as("est_ok"))
      .orderBy(col("n").desc, col("token").asc)
  }
}
