package graft

import graft.ops._
import org.apache.spark.sql.functions._

class AggregatesSpec extends SparkSpec {

  test("q1 pricing summary groups to the 4 flag/status combos") {
    val rows = Aggregates.pricingSummary(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total == expected)
  }

  test("q3 top orders returns at most 10, descending revenue") {
    val rows = Aggregates.revenueTopOrders(spark, sfDir).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q5 nation revenue covers only ASIA/AMERICA nations") {
    val nations = Aggregates.revenueByNation(spark, sfDir)
      .select("nation").collect().map(_.getString(0)).toSet
    val expected = Tables.nation(spark, sfDir)
      .join(Tables.region(spark, sfDir).filter(col("r_name").isin("ASIA", "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(nations.subsetOf(expected))
  }

  test("distinct vs approx distinct agree within rsd at small scale") {
    val exact = Aggregates.distinctCustomers(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_customers")).toMap
    val approx = Aggregates.approxDistinct(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_customers")).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v).toDouble / v < 0.05, s"$k: $v vs ${approx(k)}")
    }
  }

  test("rollup emits grand total row") {
    val rows = Aggregates.rollupStatusPriority(spark, sfDir).collect()
    val grand = rows.filter(r => r.getString(0) == "(all)" && r.getString(1) == "(all)")
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n") == Tables.orders(spark, sfDir).count())
  }

  test("cube emits 1 grand + marginals") {
    val rows = Aggregates.cubeFlagStatus(spark, sfDir).collect()
    assert(rows.count(r => r.getString(0) == "(all)" && r.getString(1) == "(all)") == 1)
    assert(rows.count(r => r.getString(0) == "(all)" ^ r.getString(1) == "(all)") >= 2)
  }

  test("semi + anti partition customers (anti on urgent orders)") {
    val c = Tables.customer(spark, sfDir).count()
    val semiUrgent = {
      val cust = Tables.customer(spark, sfDir)
      val o = Tables.orders(spark, sfDir)
        .filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
      cust.join(o, cust("c_custkey") === o("o_custkey"), "left_semi").count()
    }
    assert(Aggregates.antiJoin(spark, sfDir).count() + semiUrgent == c)
    assert(Aggregates.semiJoin(spark, sfDir).count() <= c)
  }

  test("set ops: union >= intersect, except = rich - intersect") {
    val byOp = Aggregates.setOps(spark, sfDir).collect()
      .groupBy(_.getAs[String]("op")).view.mapValues(_.length).toMap
    val richCount = Tables.customer(spark, sfDir).filter(col("c_acctbal") > 7500).count()
    assert(byOp.getOrElse("union", 0) >= byOp.getOrElse("intersect", 0))
    assert(byOp.getOrElse("except", 0) + byOp.getOrElse("intersect", 0) == richCount)
  }

  test("cross join cardinality = |region| * |nation|") {
    val r = Tables.region(spark, sfDir).count()
    val n = Tables.nation(spark, sfDir).count()
    assert(Aggregates.crossSmall(spark, sfDir).count() == r * n)
  }

  test("approx_count_distinct (rsd 0.01) within 5% of exact distinct counts") {
    val exact = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority")).agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Aggregates.approxDistinct(spark, sfDir).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val e = exact(r.getAs[String]("priority")).toDouble
      val a = r.getAs[Long]("approx_customers").toDouble
      assert(math.abs(a - e) / e < 0.05, s"${r.getAs[String]("priority")}: $a vs $e")
    }
  }

  test("percentile_approx tracks exact percentiles within 5% relative error") {
    val exact = Aggregates.percentiles(spark, sfDir).collect()
      .map(r => r.getAs[String]("status") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toMap
    val approx = Aggregates.percentilesApprox(spark, sfDir).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val (e50, e90) = exact(r.getAs[String]("status"))
      assert(math.abs(r.getAs[Double]("p50") - e50) / e50 < 0.05,
        s"${r.getAs[String]("status")} p50 ${r.getAs[Double]("p50")} vs $e50")
      assert(math.abs(r.getAs[Double]("p90") - e90) / e90 < 0.05,
        s"${r.getAs[String]("status")} p90 ${r.getAs[Double]("p90")} vs $e90")
    }
  }
  test("hll sketch merge: merged per-status estimate within 5% of exact") {
    val exact = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus")).agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = Aggregates.hllMergePartials(spark, sfDir).collect()
    assert(merged.nonEmpty)
    merged.foreach { r =>
      val e = exact(r.getAs[String]("status")).toDouble
      val a = r.getAs[Long]("approx_customers").toDouble
      assert(math.abs(a - e) / e < 0.05, s"${r.getAs[String]("status")}: $a vs $e")
    }
  }
}
