package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-engineering operators around table trust: constraint audits and
  * snapshot diffing (beyond-reference — the operational layer a pipeline
  * runs before/after every load).
  *
  * Scale notes: every check is a single aggregate or anti-join —
  * referential checks broadcast nothing (semi/anti hash joins, dim side
  * auto-broadcast when small), uniqueness is count vs count-distinct in
  * ONE pass, and the whole report is a union of one-row aggregates, so
  * output size is O(#checks) at any input scale. The snapshot diff is one
  * full-outer join on the primary key — the canonical CDC shape: at
  * 100 TB both sides shuffle-partition on the key once (or co-locate for
  * free if the snapshots are bucketed on it).
  */
object Quality {

  private def check(name: String, df: DataFrame): DataFrame =
    df.select(lit(name).as("check"), col("n").cast("long").as("n"))

  /** Constraint audit over the star schema: row counts, primary-key
    * uniqueness violations, null-key counts, and referential orphans for
    * every FK edge of the schema. One row per check.
    *
    * Shape: the per-TABLE scalar checks (rowcount, pk dups, fk nulls) run
    * in ONE aggregate pass per table and fan out to rows via explode —
    * the former one-subtree-per-check union scanned orders three times
    * and lineitem twice for values a single agg computes together (a lone
    * countDistinct plans without Expand, so adding count/count-when
    * columns to it is free). The four referential checks stay as separate
    * anti-join subtrees: at sf0.1 each dim auto-broadcasts, and the fused
    * single-exchange alternative (tagged key union + two-level aggregate)
    * measured SLOWER end-to-end (solo-bench 1.4 → 1.9 s) because the
    * per-key level-1 aggregate costs more than the subtree scheduling it
    * saves — tried and reverted, see OPTIMIZATION_r19.md. */
  def dqReport(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.orders(spark, dir)
    val customer = Tables.customer(spark, dir)
    val lineitem = Tables.lineitem(spark, dir)
    val part = Tables.part(spark, dir)
    val supplier = Tables.supplier(spark, dir)

    def kv(name: String, n: org.apache.spark.sql.Column) =
      struct(lit(name).as("check"), n.cast("long").as("n"))
    /** One aggregate pass over `df`, fanned out to |checks| rows. */
    def multiCheck(df: DataFrame, aggs: Seq[org.apache.spark.sql.Column],
                   rows: Seq[(String, String)]) =
      df.agg(aggs.head, aggs.drop(1): _*)
        .select(explode(array(rows.map { case (name, c) => kv(name, col(c)) }: _*)).as("kv"))
        .select(col("kv.check").as("check"), col("kv.n").as("n"))
    def orphans(name: String, fact: DataFrame, fk: String,
                dim: DataFrame, pk: String) =
      check(name,
        fact.join(dim, fact(fk) === dim(pk), "left_anti")
          .agg(count(lit(1)).as("n")))

    Seq(
      multiCheck(orders,
        Seq(count(lit(1)).as("rc"),
          (count(lit(1)) - countDistinct(col("o_orderkey"))).as("dups"),
          count(when(col("o_custkey").isNull, 1)).as("nulls")),
        Seq("orders.rowcount" -> "rc", "orders.o_orderkey.dups" -> "dups",
          "orders.o_custkey.nulls" -> "nulls")),
      multiCheck(lineitem,
        Seq(count(lit(1)).as("rc"),
          count(when(col("l_partkey").isNull, 1)).as("nulls")),
        Seq("lineitem.rowcount" -> "rc", "lineitem.l_partkey.nulls" -> "nulls")),
      multiCheck(customer,
        Seq((count(lit(1)) - countDistinct(col("c_custkey"))).as("dups")),
        Seq("customer.c_custkey.dups" -> "dups")),
      multiCheck(part,
        Seq((count(lit(1)) - countDistinct(col("p_partkey"))).as("dups")),
        Seq("part.p_partkey.dups" -> "dups")),
      orphans("orders.custkey.orphans", orders, "o_custkey", customer, "c_custkey"),
      orphans("lineitem.orderkey.orphans", lineitem, "l_orderkey", orders, "o_orderkey"),
      orphans("lineitem.partkey.orphans", lineitem, "l_partkey", part, "p_partkey"),
      orphans("lineitem.suppkey.orphans", lineitem, "l_suppkey", supplier, "s_suppkey"))
      .reduce(_ unionByName _)
      .orderBy("check")
  }

  /** Distribution-drift audit (Population Stability Index) between the
    * "baseline" and "current" halves of the orders table (split on a
    * fixed order-date pivot — the before/after-a-load shape): order
    * totals bucket into fixed 50k-wide bands (top band open-ended) and
    * each band contributes (p−q)·ln(p/q) with Laplace-smoothed shares
    * (n+0.5 over N+4.5, nine possible bands), so an empty band degrades
    * smoothly instead of dividing by zero. Per-band terms are emitted
    * (the audit wants to see WHERE the drift is); Σ psi_term ≥ 0.2 is
    * the conventional "investigate" line.
    *
    * Scale shape: one scan → one hash aggregate keyed by the 9 bands →
    * single-row totals broadcast back via crossJoin (documented in the
    * no-NLJ whitelist) → map-side math. O(#bands) output at any scale. */
  def dqDrift(spark: SparkSession, dir: String): DataFrame = {
    val bucketed = Tables.orders(spark, dir)
      .select(
        least(floor(col("o_totalprice") / 50000.0), lit(8)).cast("long").as("bucket"),
        (col("o_orderdate") < lit("1995-06-17").cast("timestamp")).as("is_base"))
    val counts = bucketed.groupBy(col("bucket"))
      .agg(count(when(col("is_base"), 1)).as("n_base"),
        count(when(!col("is_base"), 1)).as("n_curr"))
    val totals = counts.agg(sum(col("n_base")).as("tb"), sum(col("n_curr")).as("tc"))
    val p = (col("n_base") + 0.5) / (col("tb") + 4.5)
    val q = (col("n_curr") + 0.5) / (col("tc") + 4.5)
    counts.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_base"), col("n_curr"),
        round((p - q) * log(p / q), 6).as("psi_term"))
      .orderBy("bucket")
  }

  /** CDC-style snapshot diff: two deterministic "versions" of the orders
    * table (v1 drops keys ≡ 9 mod 10; v2 drops keys ≡ 0 mod 10 and bumps
    * totalprice by 1000 for keys ≡ 0 mod 7 — an exact double addition, so
    * change detection never touches rounding) are full-outer joined on
    * the primary key and classified insert/delete/update/unchanged.
    * Emits per-class counts + key ranges — the summary a merge/upsert
    * job validates against before committing. */
  def snapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.orders(spark, dir)
      .select(col("o_orderkey").as("okey"), col("o_totalprice").as("price"))
    val v1 = base.filter(pmod(col("okey"), lit(10)) =!= 9)
      .select(col("okey").as("k1"), col("price").as("p1"))
    val v2 = base.filter(pmod(col("okey"), lit(10)) =!= 0)
      .select(col("okey").as("k2"),
        when(pmod(col("okey"), lit(7)) === 0, col("price") + 1000.0)
          .otherwise(col("price")).as("p2"))
    v1.join(v2, col("k1") === col("k2"), "full_outer")
      .select(
        coalesce(col("k1"), col("k2")).as("okey"),
        when(col("k1").isNull, "insert")
          .when(col("k2").isNull, "delete")
          .when(col("p1") =!= col("p2"), "update")
          .otherwise("unchanged").as("change"))
      .groupBy(col("change"))
      .agg(count(lit(1)).as("n"), min(col("okey")).as("min_key"),
        max(col("okey")).as("max_key"))
      .orderBy("change")
  }

  /** Per-stream freshness audit — the "is this source still feeding us"
    * check every ingestion dashboard runs: each event type's last-seen
    * timestamp against the corpus watermark, with an SLA flag. One
    * bounded aggregate (≤ |event types| rows out at any volume); the
    * corpus watermark attaches via an unpartitioned window over that
    * already-bounded frame — no second scan, no crossJoin. All-integer
    * epoch arithmetic → bit-exact oracle. */
  def freshness(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        max(unix_timestamp(col("ts"))).as("last_seen_es"))
      .withColumn("watermark_es",
        max(col("last_seen_es")).over(Window.rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
      .select(col("event_type"), col("n"), col("last_seen_es"),
        (col("watermark_es") - col("last_seen_es")).as("lag_s"),
        (col("watermark_es") - col("last_seen_es") <= 86400L).as("fresh_24h"))
      .orderBy("event_type")
  }
}
