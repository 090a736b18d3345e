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

  test("bucketed fact-fact join runs with ZERO shuffle (100 TB co-location path)") {
    // both facts bucketed+sorted on the join key with the same bucket
    // count: the join satisfies its distribution requirement straight
    // from the file layout — no exchange on either side. At 100 TB this
    // is how the lineitem⋈orders shuffle disappears entirely.
    val o = Tables.orders(spark, sfDir).select(col("o_orderkey"), col("o_totalprice"))
    val l = Tables.lineitem(spark, sfDir).select(col("l_orderkey"), col("l_quantity"))
    Sinks.writeBucketed(o, "orders_bj", "o_orderkey", 4)
    Sinks.writeBucketed(l, "lineitem_bj", "l_orderkey", 4)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    spark.conf.set("spark.sql.adaptive.enabled", "false")        // plain plan tree
    try {
      val j = spark.table("lineitem_bj").join(spark.table("orders_bj"),
        col("l_orderkey") === col("o_orderkey"))
      val shuffles = j.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(shuffles.isEmpty,
        s"bucketed join must be shuffle-free, got:\n${j.queryExecution.executedPlan}")
      assert(j.queryExecution.executedPlan.toString.contains("SortMergeJoin"))
      // and it computes the same thing as the plain join
      val expected = l.join(o, col("l_orderkey") === col("o_orderkey")).count()
      assert(j.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS orders_bj")
      spark.sql("DROP TABLE IF EXISTS lineitem_bj")
    }
  }

  test("csv sink round-trips nulls and booleans through CsvSource") {
    import org.apache.spark.sql.types._
    import graft.api.Rivulus
    val out = java.nio.file.Files.createTempDirectory("graftcsvsink").toString + "/t"
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("score", DoubleType), StructField("active", BooleanType)))
    val df = Rivulus.fromRows(spark, schema, Seq(
      org.apache.spark.sql.Row(1L, "alice", 9.5, true),
      org.apache.spark.sql.Row(2L, null, null, false),
      org.apache.spark.sql.Row(3L, "carol", 7.25, null))).df
    graft.sources.Sinks.writeCsv(df, out, delimiter = ";")
    val back = graft.sources.CsvSource.read(spark, out, schema, delimiter = ";")
      .orderBy("id").collect()
    assert(back.length == 3)
    assert(back(1).isNullAt(1) && back(1).isNullAt(2)) // nulls survive
    assert(back(2).isNullAt(3))
    assert(back(0).getString(1) == "alice" && back(2).getDouble(2) == 7.25)
  }

  test("orc sink round-trips values and pushes filters into the orc scan") {
    val out = Files.createTempDirectory("graftorc").resolve("o").toString
    val src = Tables.orders(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    Sinks.writeOrc(src, out)
    val back = Sinks.readOrc(spark, out)
    assert(back.count() == src.count())
    val filtered = back.filter(col("o_totalprice") > 1000.0).select("o_orderkey")
    val formatted = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters:") &&
      formatted.contains("GreaterThan(o_totalprice"), formatted.take(2000))
    assert(filtered.count() ==
      src.filter(col("o_totalprice") > 1000.0).count())
  }

  test("jsonl source quarantines corrupt lines instead of failing or dropping") {
    import org.apache.spark.sql.types._
    import graft.sources.JsonlSource
    val dir = java.nio.file.Files.createTempDirectory("graftjsonl")
    val f = dir.resolve("docs.jsonl")
    java.nio.file.Files.writeString(f,
      """{"doc_id": 1, "text": "hello world", "lang": "en"}
        |{"doc_id": 2, "text": "bonjour", "lang": "fr"}
        |{not valid json at all
        |{"doc_id": 4, "text": "hola", "lang": "es"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))
    val raw = JsonlSource.read(spark, f.toString, schema).persist()
    val (clean, bad) = JsonlSource.partition(raw)
    assert(clean.count() == 3)
    assert(clean.columns.toSeq == Seq("doc_id", "text", "lang"))
    assert(bad.count() == 1)
    assert(bad.first().getString(0).contains("not valid json"))
    raw.unpersist()
  }
  test("schema evolution: mergeSchema unions columns across file generations") {
    // a long-lived 100 TB dataset accretes columns; old files must stay
    // readable (missing columns -> null) without a rewrite
    import spark.implicits._
    val dir = Files.createTempDirectory("graftevo").toString
    Seq((1L, "a")).toDF("id", "a").write.parquet(s"$dir/g=1")
    Seq((2L, "b", 9.5)).toDF("id", "a", "score").write.parquet(s"$dir/g=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("a", "g", "id", "score"))
    val byId = merged.collect().map(r => r.getAs[Long]("id") -> r).toMap
    assert(byId(1L).isNullAt(byId(1L).fieldIndex("score")))
    assert(byId(2L).getAs[Double]("score") == 9.5)
  }
  test("dynamic partition pruning: dim filter prunes fact partitions at runtime") {
    // the partition-column cousin of the bloom-filter test: with the fact
    // laid out by l_returnflag, a selective filter on the dim side must
    // turn into a DynamicPruning subquery on the fact SCAN — at 100 TB
    // whole partition directories are never read
    import spark.implicits._
    val out = Files.createTempDirectory("graftdpp").resolve("li").toString
    Sinks.writePartitioned(
      Tables.lineitem(spark, sfDir).select(
        col("l_orderkey"), col("l_quantity"), col("l_returnflag")),
      out, "l_returnflag")
    val fact = spark.read.parquet(out)
    // the dim must be a parquet-backed scan WITH a filter: a local Seq
    // gets its filter constant-folded into the LocalRelation
    // (ConvertToLocalRelation), and DPP only fires when the pruning side
    // carries a selective predicate
    val dimPath = Files.createTempDirectory("graftdpp").resolve("dim").toString
    Seq(("R", "keep"), ("A", "drop"), ("N", "drop"))
      .toDF("flag", "label").write.parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("label") === "keep")
    val j = fact.join(dim, col("l_returnflag") === col("flag"))
      .groupBy("flag").agg(sum("l_quantity").as("qty"))
    j.collect()
    val plan = j.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("dynamicpruning"), plan.take(3000))
  }
}
