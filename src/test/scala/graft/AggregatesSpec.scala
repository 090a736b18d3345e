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

  test("approx distinct emits exact counts with in-plan sketch check green") {
    val exact = Aggregates.distinctCustomers(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_customers")).toMap
    val rows = Aggregates.approxDistinct(spark, sfDir).collect()
    assert(exact.keySet == rows.map(_.getString(0)).toSet)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_customers") == exact(r.getString(0)))
      assert(r.getAs[Boolean]("est_ok"), s"${r.getString(0)}: sketch drifted >10%")
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

  test("approx_count_distinct (rsd 0.02) within 5% of exact distinct counts") {
    val rows = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderpriority"))
      .agg(countDistinct("o_custkey").as("n"),
        approx_count_distinct(col("o_custkey"), rsd = 0.02).as("a"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("n").toDouble
      val a = r.getAs[Long]("a").toDouble
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: $a vs $e")
    }
  }

  test("percentile_approx tracks exact percentiles within 5% relative error") {
    val rows = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus").as("status"))
      .agg(expr("percentile(o_totalprice, 0.5)").as("e50"),
        expr("percentile(o_totalprice, 0.9)").as("e90"),
        expr("percentile_approx(o_totalprice, 0.5, 1000)").as("a50"),
        expr("percentile_approx(o_totalprice, 0.9, 1000)").as("a90"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("a50") - r.getAs[Double]("e50")) /
        r.getAs[Double]("e50") < 0.05, s"${r.getString(0)} p50")
      assert(math.abs(r.getAs[Double]("a90") - r.getAs[Double]("e90")) /
        r.getAs[Double]("e90") < 0.05, s"${r.getString(0)} p90")
    }
    // the query's own in-plan checks agree
    val q = Aggregates.percentilesApprox(spark, sfDir).collect()
    assert(q.nonEmpty && q.forall(r => r.getAs[Boolean]("p50_ok") &&
      r.getAs[Boolean]("p90_ok") && r.getAs[Boolean]("p99_ok")))
  }

  test("hll sketch merge: exact companions match and in-plan estimate check green") {
    val exact = Tables.orders(spark, sfDir)
      .groupBy(col("o_orderstatus")).agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val merged = Aggregates.hllMergePartials(spark, sfDir).collect()
    assert(merged.nonEmpty)
    merged.foreach { r =>
      assert(r.getAs[Long]("n_customers") == exact(r.getAs[String]("status")))
      assert(r.getAs[Boolean]("est_ok"), s"${r.getAs[String]("status")}: sketch drifted >10%")
    }
  }

  test("misra-gries: error bound holds under eviction at tiny capacity") {
    import spark.implicits._
    // 60×"a", 30×"b", 6 singletons; C=3 forces decrements. N=96, N/C=32:
    // every item with true count > 32 (i.e. "a") MUST survive with
    // estimate in [count−32, count].
    val items = Seq.fill(60)("a") ++ Seq.fill(30)("b") ++
      Seq("c", "d", "e", "f", "g", "h")
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = items.size
    // 4 partitions exercises partial buffers + merged-summary combine
    val sketch: Map[String, Long] = items.toDS.repartition(4)
      .select(Aggregates.MisraGries(3).toColumn.name("m"))
      .collect()(0)
    assert(sketch.size <= 3)
    assert(sketch.contains("a"), s"heavy hitter evicted: $sketch")
    sketch.foreach { case (k, est) =>
      val t = truth(k)
      assert(est <= t && est >= t - n / 3, s"$k: est $est vs true $t")
    }
  }

  test("topk sketch: exact top-25 with both guarantee booleans green") {
    val rows = Aggregates.topkSketch(spark, sfDir).collect()
    assert(rows.length == 25)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("in_sketch"), r.toString)
      assert(r.getAs[Boolean]("est_ok"), r.toString)
    }
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }
}
