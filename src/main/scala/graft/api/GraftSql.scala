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
      // integer-exact 1e-4 units (cents x discCents) + half-up render:
      // immune to parallel-sum rounding straddles at any magnitude
      """SELECT CAST((sum(CAST(round(l_extendedprice * 100) AS DECIMAL(38,0))
        |                 * CAST(round(l_discount * 100) AS BIGINT)) + 50) DIV 100
        |            AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24
        |""".stripMargin)

  /** LATERAL correlated subquery — top-2 orders per customer as SQL
    * text: each customer row drives a correlated, ordered, LIMITed
    * subquery. Catalyst decorrelates the lateral (DecorrelateInnerQuery)
    * into ONE row_number window over o_custkey with a rank filter,
    * equi-joined back to customer, so the executed plan is one
    * shuffle-and-rank, NOT a per-customer nested loop — the difference
    * between O(|cust|) subquery executions and one distributed pass at
    * 100 TB. (The subquery's ORDER BY renders as a sort feeding an
    * order-less row_number spec, so the WindowGroupLimit pushdown does
    * not apply to this decorrelated form; PlanShapeSpec pins the exact
    * shape.) Rich customers only (bounded driver output); inner lateral
    * drops order-less customers. */
  def lateralTopOrders(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT c_custkey AS custkey, o.orderkey, o.totalprice
        |FROM customer,
        |LATERAL (SELECT o_orderkey AS orderkey, o_totalprice AS totalprice
        |         FROM orders WHERE o_custkey = c_custkey
        |         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2) o
        |WHERE c_acctbal > 9000
        |ORDER BY custkey, totalprice DESC, orderkey""".stripMargin)

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

  /** TPC-H Q2-style correlated MIN-subquery (adapted: this schema has no
    * partsupp, so lineitem plays the part-supplier fact and unit price
    * l_extendedprice/l_quantity plays supplycost): for each small part,
    * the supplier(s) selling it at the part's minimum unit price. The
    * subquery has its own join (lineitem ⋈ supplier) — the shape that
    * stresses Catalyst's decorrelation: RewriteCorrelatedScalarSubquery
    * turns it into an aggregate on l_partkey joined back equi on partkey,
    * so no nested-loop anywhere (PlanShapeSpec's no-NLJ sweep covers it).
    * The unit price is emitted UNROUNDED: both engines divide the same
    * doubles, so values are bit-identical, while round() would reopen the
    * cross-engine half-up-vs-binary tie hazard. */
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT DISTINCT p.p_partkey AS partkey, s.s_name AS sname,
        |       n.n_name AS nation,
        |       l.l_extendedprice / l.l_quantity AS min_unit_price
        |FROM part p, lineitem l, supplier s, nation n
        |WHERE p.p_partkey = l.l_partkey AND l.l_suppkey = s.s_suppkey
        |  AND s.s_nationkey = n.n_nationkey
        |  AND p.p_size <= 5 AND s.s_acctbal > 0
        |  AND l.l_extendedprice / l.l_quantity = (
        |      SELECT min(l2.l_extendedprice / l2.l_quantity)
        |      FROM lineitem l2, supplier s2
        |      WHERE l2.l_partkey = p.p_partkey AND l2.l_suppkey = s2.s_suppkey
        |        AND s2.s_acctbal > 0)
        |ORDER BY partkey, sname
        |""".stripMargin)

  /** TPC-H Q21-style stacked EXISTS / NOT-EXISTS self-joins (adapted:
    * no commit/receipt dates in this schema, so "kept the order waiting"
    * becomes "only supplier whose item was returned"): for finished
    * multi-supplier orders, suppliers whose lineitem was returned while
    * EXISTS another supplier's item in the order and NOT EXISTS another
    * supplier's returned item. Catalyst plans the EXISTS as a left-semi
    * and the NOT EXISTS as a left-anti hash join, both equi on orderkey
    * with the suppkey inequality as residual — the multi-semi-join
    * pipeline Q21 exists to stress; no nested-loop (swept). */
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT s.s_name AS sname, count(*) AS numwait
        |FROM supplier s, lineitem l1, orders o
        |WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
        |  AND o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s.s_name
        |ORDER BY numwait DESC, sname
        |LIMIT 20
        |""".stripMargin)

  /** TPC-H Q11-style HAVING-vs-global-aggregate: per-part value share
    * against a scalar subquery over the SAME aggregated CTE. Catalyst
    * evaluates the uncorrelated scalar subquery once (a one-row broadcast)
    * and the CTE is shared — the "aggregate compared to aggregate of
    * itself" shape. Threshold 1.5× the mean part value (the TPC-H spec's
    * fraction scales with SF the same way). */
  def partValueShare(spark: SparkSession, dir: String): DataFrame =
    // INTEGER-EXACT money: price/discount are 2-decimal, so each line's
    // value is an exact count of 1e-4 units (cents × (100−discCents));
    // the sum, the 1.5×-average filter (integer cross-multiplication:
    // v > 1.5·T/n ⟺ 2·v·n > 3·T) and the half-up 2dp render
    // ((u+50) div 100) are all integer ops — no FP summation-order or
    // rounding-boundary divergence at ANY scale (the round(sum(double))
    // form straddled a cent boundary on the 10× replica data)
    // the n/T totals ride ONE scalar-subquery struct: Spark inlines CTEs,
    // so `(SELECT count(*) FROM pv)` + `(SELECT sum(units) FROM pv)` as
    // separate scalar subqueries re-computed the whole lineitem aggregate
    // a 2nd and 3rd time (16 AQE jobs at sf0.1); packing both into one
    // subquery makes it twice total — same rows, same integer math
    sql(spark, dir,
      """WITH pv AS (SELECT l_partkey AS partkey,
        |                   sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |                       * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS units
        |            FROM lineitem GROUP BY 1)
        |SELECT partkey,
        |       CAST((units + 50) DIV 100 AS DOUBLE) / 100.0 AS part_value
        |FROM pv
        |WHERE CAST(units AS DECIMAL(38,0))
        |      * (SELECT struct(count(*), sum(units)) FROM pv).col1 * 2
        |      > CAST((SELECT struct(count(*), sum(units)) FROM pv).col2
        |             AS DECIMAL(38,0)) * 3
        |ORDER BY part_value DESC, partkey
        |""".stripMargin)

  /** TPC-H Q16-style NOT IN subquery: distinct supplier count per part
    * attribute, excluding a supplier denylist via `NOT IN`. NOT IN over a
    * nullable-free key plans as Spark's NULL-AWARE ANTI JOIN
    * (BroadcastHashJoin ... NAAJ) — a distinct decorrelation shape from
    * EXISTS/NOT EXISTS (which become plain semi/anti). */
  def supplierCountNotIn(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT p.p_brand AS brand, p.p_type AS ptype,
        |       count(DISTINCT l.l_suppkey) AS supplier_cnt
        |FROM part p JOIN lineitem l ON p.p_partkey = l.l_partkey
        |WHERE p.p_size IN (1, 9, 14, 19, 23)
        |  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                          WHERE s_acctbal < 0)
        |GROUP BY 1, 2
        |ORDER BY supplier_cnt DESC, brand, ptype
        |LIMIT 25
        |""".stripMargin)

  /** TPC-H Q17-style small-quantity revenue: correlated scalar AVG
    * subquery against the SAME fact table as the outer query — Catalyst
    * decorrelates into a per-partkey aggregate of lineitem joined back to
    * lineitem (self-decorrelation, a different rewrite than Q2's
    * dimension-correlated min). The quantity threshold is exact
    * cross-engine: integer-valued doubles sum exactly (< 2^53), so the
    * avg is order-independent and the comparison cannot flip. */
  def smallQuantityRevenue(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      // exact cents sum; round2(u/700) = (2u+7) div 14 then /100 - the
      // half-up division stays in integers, so /7.0 cannot straddle
      """SELECT CAST((2 * sum(CAST(round(l.l_extendedprice * 100) AS DECIMAL(38,0))) + 7) DIV 14
        |            AS DOUBLE) / 100.0 AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand = 'Brand#1'
        |  AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
        |                      FROM lineitem l2
        |                      WHERE l2.l_partkey = l.l_partkey)
        |""".stripMargin)

  /** TPC-H Q20-style IN-subquery with aggregation + HAVING inside: the
    * supplier denylist shape inverted — suppliers who shipped a large
    * aggregate quantity of a part class. Spark plans the IN as a left-semi
    * join against the aggregated-and-filtered subquery (semi over agg — a
    * different pipeline than Q21's row-level EXISTS). acctbal emitted
    * unrounded: both engines read the identical parquet double. */
  def bulkShippers(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT s_name AS sname, s_acctbal AS acctbal
        |FROM supplier
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        |    WHERE p_name LIKE 'small%'
        |    GROUP BY l_suppkey HAVING sum(l_quantity) > 500)
        |ORDER BY sname
        |""".stripMargin)

  /** TPC-H Q8-style market share: an 8-table join tree feeding a
    * conditional-share aggregate (share = one nation's fraction of total
    * volume per order year). nation/region join twice in different roles
    * (supplier side vs customer side) — the widest join tree in the
    * suite; Catalyst's join reorder + AQE broadcast the three dimension
    * chains while the lineitem⋈orders fact join shuffles on orderkey.
    * The share is a ratio of two continuous-double sums — round(…, 6) is
    * tie-safe there (the cross-engine hazard is integer/decimal
    * quotients). */
  def marketShare(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """WITH vol AS (
        |  SELECT year(o.o_orderdate) AS yr,
        |         CAST(round(l.l_extendedprice * 100) AS DECIMAL(38,0))
        |           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS v,
        |         ns.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN orders o   ON l.l_orderkey = o.o_orderkey
        |  JOIN part p     ON l.l_partkey = p.p_partkey
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
        |  JOIN region rc  ON nc.n_regionkey = rc.r_regionkey
        |  WHERE rc.r_name = 'AMERICA' AND p.p_type = 'LARGE')
        |SELECT yr,
        |       round(CAST(sum(CASE WHEN supp_nation = 'NATION_5' THEN v ELSE 0 END) AS DOUBLE)
        |             / CAST(sum(v) AS DOUBLE), 6) AS mkt_share
        |FROM vol GROUP BY yr ORDER BY yr
        |""".stripMargin)

  /** MULTISET set operations (INTERSECT ALL / EXCEPT ALL): occurrence
    * arithmetic, not membership — Spark rewrites both through the
    * replicate_rows generator over per-row min/diff counts, a completely
    * different plan than the distinct set-ops in `set_ops`. Counted per
    * group so the result is deterministic and small. */
  def setOpsMultiset(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """WITH a AS (SELECT o_orderpriority AS p FROM orders
        |           WHERE o_orderstatus = 'F'),
        |     b AS (SELECT o_orderpriority AS p FROM orders
        |           WHERE o_totalprice > 450000)
        |SELECT 'intersect_all' AS op, p, count(*) AS n
        |FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 2
        |UNION ALL
        |SELECT 'except_all' AS op, p, count(*) AS n
        |FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 2
        |ORDER BY op, p
        |""".stripMargin)

  /** RECURSIVE CTE (Spark 4's WITH RECURSIVE): generate a complete month
    * spine 1995-01..2001-12, then LEFT JOIN the monthly order aggregate —
    * the canonical gap-filled time series (months with no orders emit 0,
    * which a plain GROUP BY would silently drop). The recursion is the
    * spine generator, bounded at 84 levels, nothing per-row — exactly the
    * pattern that stays driver-cheap at any data scale. */
  def monthlySpine(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """WITH RECURSIVE months(m) AS (
        |  SELECT CAST('1995-01-01' AS DATE)
        |  UNION ALL
        |  SELECT add_months(m, 1) FROM months
        |  WHERE m < CAST('2001-12-01' AS DATE))
        |SELECT date_format(m, 'yyyy-MM') AS month,
        |       coalesce(n_orders, 0) AS n_orders,
        |       coalesce(total, 0.0) AS total
        |FROM months LEFT JOIN (
        |  SELECT date_format(o_orderdate, 'yyyy-MM') AS om,
        |         count(*) AS n_orders,
        |         round(sum(o_totalprice), 2) AS total
        |  FROM orders GROUP BY 1) s ON date_format(m, 'yyyy-MM') = s.om
        |ORDER BY month
        |""".stripMargin)

  /** TPC-H Q9-style product-type profit (adapted: no partsupp table, so
    * supply cost is proxied by 0.6 × p_retailprice × quantity): a 5-table
    * join tree (fact ⋈ part ⋈ supplier ⋈ nation ⋈ orders) feeding a
    * (nation, year) profit aggregate with a LIKE-filtered part dimension.
    * The widest *fact-anchored* join after Q8; Catalyst broadcasts the
    * three dimension chains and shuffles the fact once on orderkey.
    * Profit must round at 4dp, NOT 2dp: the sum is a lattice of 1e-4
    * multiples (2dp × 2dp products), so round(…, 2) ties whenever the
    * true value's 3rd-4th decimals are exactly 50 (~1% of groups — this
    * query failed by one cent at sf0.001 when rounded at 2dp), while an
    * on-lattice value can never be a midpoint of its own grid. */
  def productProfit(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      // profit in exact 1e-4 units: cents(100-dc) - retailCents*60*qty
      // (retail 2-decimal, qty integer-valued); u/10000 has exactly 4
      // decimals, so the round(...,4) disappears entirely
      """SELECT n.n_name AS nation, year(o.o_orderdate) AS yr,
        |       CAST(sum(CAST(round(l.l_extendedprice * 100) AS DECIMAL(38,0))
        |                  * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
        |                - CAST(round(p.p_retailprice * 100) AS DECIMAL(38,0))
        |                  * 60 * CAST(round(l.l_quantity) AS BIGINT))
        |            AS DOUBLE) / 10000.0 AS profit
        |FROM lineitem l
        |JOIN part p     ON p.p_partkey = l.l_partkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |JOIN nation n   ON n.n_nationkey = s.s_nationkey
        |JOIN orders o   ON o.o_orderkey = l.l_orderkey
        |WHERE p.p_name LIKE '%bolt%'
        |GROUP BY 1, 2
        |ORDER BY nation, yr DESC
        |""".stripMargin)

  /** TPC-H Q12-style shipping-bucket priority counts (adapted: no
    * l_shipmode/commit/receipt columns, so the "mode" is l_linestatus and
    * lateness is ship-lag > 60 days from order date): conditional CASE
    * sums per group — the canonical pivot-by-predicate aggregate. Counts
    * are integers, so the output is hash-exact with no rounding. */
  def shipPriority(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT l.l_linestatus AS linestatus,
        |       CASE WHEN datediff(CAST(l.l_shipdate AS DATE),
        |                          CAST(o.o_orderdate AS DATE)) > 60
        |            THEN 'late' ELSE 'ontime' END AS shipbucket,
        |       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 1 ELSE 0 END) AS high_line_count,
        |       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                THEN 0 ELSE 1 END) AS low_line_count
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |GROUP BY 1, 2
        |ORDER BY linestatus, shipbucket
        |""".stripMargin)

  /** TPC-H Q15-style top supplier: a revenue CTE aggregated per supplier
    * (Q15's VIEW becomes a CTE), then the argmax via ORDER BY … LIMIT 1
    * with a key tie-break. NOT the spec's `WHERE total_rev = (SELECT
    * max(...) FROM rev)`: that equality compares two INDEPENDENT
    * re-evaluations of the same floating-point sum, and partial-merge
    * order varies run to run — a last-ulp difference between the two
    * evaluations returns zero rows. Rank-over-one-evaluation is
    * deterministic within each engine, and the argmax is stable across
    * engines because supplier revenues are continuous doubles (no
    * near-ties). The scalar-subquery-over-own-CTE shape Q15 also
    * exercises lives safely (as an inequality) in [[partValueShare]]. */
  def topSupplier(spark: SparkSession, dir: String): DataFrame =
    // integer-exact revenue (see partValueShare) + the suppkey tiebreak:
    // top-1 on a double revenue was BOTH rounding-fragile and
    // tie-arbitrary when distinct suppliers earn identical revenue (the
    // 10× replica data makes that certain); exact units + key order is
    // deterministic everywhere
    sql(spark, dir,
      """WITH rev AS (
        |  SELECT l_suppkey AS suppkey,
        |         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |             * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS units
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s.s_suppkey AS suppkey, s.s_name AS sname,
        |       CAST((r.units + 50) DIV 100 AS DOUBLE) / 100.0 AS total_rev
        |FROM supplier s JOIN rev r ON s.s_suppkey = r.suppkey
        |ORDER BY r.units DESC, suppkey LIMIT 1
        |""".stripMargin)

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
