package graft

import graft.sources.Sinks
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SinksSpec extends SparkSpec {

  test("partitioned write creates per-value dirs and prunes on read") {
    val out = Files.createTempDirectory("graftsink").resolve("li").toString
    val pruned = Sinks.partitionedRoundTrip(spark, sfDir, out)
    // directory layout: one dir per returnflag value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("l_returnflag=")))
    assert(dirs.length >= 2)
    // pruning: the filtered read touches only the R partition
    val expected = Tables.lineitem(spark, sfDir).filter(col("l_returnflag") === "R").count()
    assert(pruned.count() == expected)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), "expected partition filters in scan")
  }

  test("bucketed table join avoids shuffle on the bucket key") {
    val spark2 = spark
    val o = Tables.orders(spark2, sfDir).select(col("o_custkey"), col("o_totalprice"))
    Sinks.writeBucketed(o, "orders_bkt", "o_custkey", 4)
    val t = spark2.table("orders_bkt")
    val agg = t.groupBy("o_custkey").agg(sum("o_totalprice"))
    val plan = agg.queryExecution.executedPlan.toString
    // bucketed layout satisfies the hash requirement: no Exchange before agg
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free agg on bucket key, got:\n$plan")
    assert(agg.count() == o.select("o_custkey").distinct().count())
    spark2.sql("DROP TABLE IF EXISTS orders_bkt")
  }
}
