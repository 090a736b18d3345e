package graft

import graft.ops._
import org.apache.spark.sql.functions._

/** Per-operator correctness at sf0.001 (fast); the DuckDB oracle at sf0.01
  * is the authoritative differential check (Verify.scala). */
class RelationalSpec extends SparkSpec {

  test("p1 select+alias projects and renames") {
    val df = Relational.selectAlias(spark, sfDir)
    assert(df.columns.toSeq == Seq("custkey", "name", "acctbal"))
    assert(df.count() == Tables.customer(spark, sfDir).count())
  }

  test("p2 filter keeps only rows above the literal") {
    val df = Relational.filterGtLiteral(spark, sfDir)
    assert(df.count() > 0)
    assert(df.agg(min("acctbal")).first().getDouble(0) > 5000.0)
  }

  test("p2 compound predicate is equivalent to manual evaluation") {
    val o = Tables.orders(spark, sfDir)
    val expected = o.filter(col("o_orderstatus") === "O")
      .filter(col("o_totalprice").between(1000.0, 50000.0) ||
        col("o_orderpriority").isin("1-URGENT", "2-HIGH")).count()
    assert(Relational.filterCompound(spark, sfDir).count() == expected)
  }

  test("p3 top-k returns exactly k rows in descending price order") {
    val rows = Relational.topK(spark, sfDir).collect()
    assert(rows.length == 100)
    val prices = rows.map(_.getDouble(1))
    assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
  }

  test("j1 inner join row count equals orders with existing customer") {
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val expected = o.join(c, o("o_custkey") === c("c_custkey")).count()
    assert(Relational.joinInner(spark, sfDir).count() == expected)
  }

  test("e4 arithmetic projection computes revenue = price * (1 - discount)") {
    val row = Relational.arithmeticProject(spark, sfDir).first()
    val orderkey = row.getAs[Number]("orderkey").longValue
    val linenumber = row.getAs[Number]("linenumber").longValue
    val l = Tables.lineitem(spark, sfDir)
      .filter(col("l_orderkey") === orderkey && col("l_linenumber") === linenumber)
      .first()
    val price = l.getAs[Double]("l_extendedprice")
    val disc = l.getAs[Double]("l_discount")
    assert(math.abs(row.getDouble(2) - price * (1 - disc)) < 1e-9)
  }

  test("rivulus facade: select/filter/limit/innerJoin compose") {
    import graft.api.Rivulus
    val users = Rivulus(Tables.customer(spark, sfDir))
    val out = users
      .select(col("c_custkey"), col("c_name"), col("c_acctbal").as("bal"))
      .filter(col("bal") > 0)
      .limit(5)
    assert(out.collect().length == 5)

    val orders = Rivulus(Tables.orders(spark, sfDir).select("o_orderkey", "o_custkey"))
    val cust = Rivulus(Tables.customer(spark, sfDir).select("c_custkey", "c_name"))
    val joined = orders.innerJoin(cust, "o_custkey", "c_custkey")
    // reference output shape: right cols first, left minus key appended
    assert(joined.df.columns.toSeq == Seq("c_custkey", "c_name", "o_orderkey"))
    assert(joined.df.count() > 0)
  }

  test("rivulus facade: _right suffix on collision") {
    import graft.api.Rivulus
    import spark.implicits._
    val l = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val r = Seq((1L, "x"), (2L, "y")).toDF("rk", "name")
    val joined = Rivulus(l).innerJoin(Rivulus(r), "k", "rk")
    assert(joined.df.columns.toSeq == Seq("rk", "name", "name_right"))
  }
}
