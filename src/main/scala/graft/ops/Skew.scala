package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-resistant join patterns. At 100 TB a handful of hot keys (the
  * boilerplate document, the bot user, the NULL-ish default) concentrate a
  * shuffle partition onto one executor; AQE's skew-join splitting handles
  * moderate skew, salting handles the pathological tail deterministically.
  *
  * Salting: the big (skewed) side gets a deterministic salt in [0, S) from
  * hashing its whole row identity; the small side is replicated S times so
  * every (key, salt) combination finds its match. Join key becomes
  * (key, salt) — the hot key's rows now spread over S partitions. Result is
  * row-identical to the unsalted join (oracle-checked), only the shuffle
  * layout changes.
  */
object Skew {

  /** Inner equi-join of `big ⋈ small` on bigKey = smallKey with an S-way
    * salt on the big side and S-fold replication of the small side. */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, salts: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.toIndexedSeq.map(col): _*)), lit(salts)))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated,
      salted(bigKey) === replicated(smallKey) && salted("_salt") === replicated("_salt"))
      .drop("_salt")
  }

  /** Salted orders⋈customer aggregation — same result as the plain join
    * (the oracle runs the unsalted SQL), different shuffle layout: the
    * orders side shuffles on (custkey, salt) so a hot customer spreads over
    * 8 partitions. */
  def saltedOrderRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir).select(col("c_custkey"), col("c_mktsegment"))
    saltedJoin(o, c, "o_custkey", "c_custkey", salts = 8)
      .groupBy(col("c_mktsegment").as("segment"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("segment")
  }

  /** Two-stage (partial/final) aggregation made explicit: stage 1 aggregates
    * on (key, salt) — bounded-size partials even under key skew — stage 2
    * merges partials per key. Spark's hash aggregate already does this
    * map-side, but for high-cardinality skewed group-bys the explicit form
    * also bounds the shuffle partition size. Result equals the plain
    * groupBy (oracle-checked). */
  def twoStageAgg(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val partial = l
      .withColumn("_salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(16)))
      .groupBy(col("l_returnflag"), col("_salt"))
      .agg(sum("l_quantity").as("p_qty"), count(lit(1)).as("p_n"))
    partial
      .groupBy(col("l_returnflag").as("returnflag"))
      .agg(round(sum("p_qty"), 2).as("sum_qty"), sum("p_n").as("n"))
      .orderBy("returnflag")
  }
}
