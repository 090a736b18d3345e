package graft.api

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-text front-end (absent in the reference — SURVEY.md §2.6 lists "no
  * SQL parser"; here it is Spark SQL for free). Registers every driver
  * table as a temp view once per session, then any ANSI query runs through
  * the same Catalyst pipeline as the DataFrame API.
  */
object GraftSql {
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  // Weak keys: a discarded session must not be pinned by this cache.
  // Values record which dir the session's views currently point at, so
  // switching dirs re-registers instead of serving stale tables.
  private val currentDir =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, String]())

  /** Registers the dir's tables as temp views. Idempotent per (session,
    * dir); switching dir on the same session replaces the views. The
    * whole check-and-create is synchronized so a concurrent first caller
    * never sees a partially-registered set. */
  def register(spark: SparkSession, dir: String): Unit =
    currentDir.synchronized {
      if (currentDir.get(spark) != dir) {
        tables.foreach { t =>
          val df = t match {
            case "events" => Tables.events(spark, dir)
            case other => Tables.load(spark, dir, other)
          }
          df.createOrReplaceTempView(t)
        }
        currentDir.put(spark, dir)
      }
    }

  def sql(spark: SparkSession, dir: String, query: String): DataFrame = {
    register(spark, dir)
    spark.sql(query)
  }

  /** TPC-H Q6 (forecast revenue change) as SQL text — scan + pushed filter
    * + single global agg, the simplest whole-pipeline SQL check. */
  def tpchQ6(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24
        |""".stripMargin)

  /** Explicit GROUPING SETS (the general form of rollup/cube) in SQL. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT coalesce(o_orderstatus, '(all)') AS status,
        |       coalesce(o_orderpriority, '(all)') AS priority,
        |       count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY status, priority
        |""".stripMargin)

  /** The custom codegen expression [[graft.functions.CosineSimilarity]]
    * invoked FROM SQL TEXT (via the live-session function registration) —
    * and oracle-checked against DuckDB's independent
    * `list_cosine_similarity`, so the custom Catalyst expression's math
    * is pinned by a second engine, not just by our own HOF cross-check. */
  def vecCosineSql(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftExtensions.register(spark)
    sql(spark, dir,
      """SELECT a.vec_id AS q_id, b.vec_id AS c_id,
        |       round(vec_cosine(a.embedding, b.embedding), 4) AS cos
        |FROM embeddings a JOIN embeddings b
        |  ON a.vec_id < 3 AND b.vec_id BETWEEN 3 AND 40
        |ORDER BY q_id, c_id
        |""".stripMargin)
  }

  /** Correlated scalar subquery in SQL (reference has no subqueries at
    * all): orders above their customer's average order value. */
  def aboveCustomerAvg(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT o_custkey AS custkey, o_orderkey AS orderkey,
        |       o_totalprice AS totalprice
        |FROM orders o
        |WHERE o_totalprice > 2 * (SELECT avg(o2.o_totalprice) FROM orders o2
        |                          WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY custkey, orderkey
        |""".stripMargin)
}
