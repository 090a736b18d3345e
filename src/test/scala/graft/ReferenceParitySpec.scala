package graft

import graft.api.Rivulus
import graft.sources.CsvSource
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** The reference's own acceptance suite — the 11 scenarios its `main.rs`
  * demo runs (`/root/reference/src/main.rs:5-261`, catalogued in SURVEY.md
  * §3.3) plus the canonical inline fixtures (FIXTURES.md §A), reproduced
  * through the [[Rivulus]] facade with the reference's documented outputs
  * asserted. This is the "a user of the reference could switch" proof.
  */
class ReferenceParitySpec extends SparkSpec {
  import org.apache.spark.sql.DataFrame

  /** A1: the 3-row people table (`builder.rs:128-160`, 5-row variant
    * `main.rs:9-42` — we use the 3-row canonical form). */
  private def people: DataFrame = {
    import spark.implicits._
    Seq(("Alice", 25L, 85.5), ("Bob", 30L, 92.0), ("Charlie", 35L, 78.5))
      .toDF("name", "age", "score")
  }

  /** A2: users × orders with dangling key 99 (`main.rs:98-164`). */
  private def users: DataFrame = {
    import spark.implicits._
    Seq((1L, "Alice", "NYC"), (2L, "Bob", "LA"), (3L, "Charlie", "Chicago"),
      (4L, "Diana", "Houston")).toDF("user_id", "name", "city")
  }
  private def orders: DataFrame = {
    import spark.implicits._
    Seq((101L, 1L, 250.5), (102L, 2L, 89.9), (103L, 1L, 320.0),
      (104L, 3L, 150.0), (105L, 99L, 75.0))
      .toDF("order_id", "user_id", "amount")
  }

  // Scenario 1 (main.rs:49-52): select(name, age) + filter(age > 28)
  test("scenario 1: select then filter") {
    val out = Rivulus(people).select(col("name"), col("age"))
      .filter(col("age") > 28).collect()
    assert(out.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("Bob", 30L), ("Charlie", 35L)))
  }

  // Scenario 2 (main.rs:59-62): filter(score >= 90) then select with alias
  test("scenario 2: filter then select with alias") {
    val out = Rivulus(people).filter(col("score") >= 90.0)
      .select(col("name").as("student"), col("score").as("points"))
    assert(out.df.columns.toSeq == Seq("student", "points"))
    assert(out.collect().map(r => (r.getString(0), r.getDouble(1))).toSet ==
      Set(("Bob", 92.0)))
  }

  // Scenario 3 (main.rs:69-72): filter + limit
  test("scenario 3: filter then limit") {
    val out = Rivulus(people).filter(col("age") >= 25).limit(2).collect()
    assert(out.length == 2)
  }

  // Scenario 4 (main.rs:79-81): empty result keeps schema
  test("scenario 4: empty-result filter keeps typed schema") {
    val out = Rivulus(people).filter(col("age") > 100)
    assert(out.collect().isEmpty)
    assert(out.df.schema.fieldNames.toSeq == Seq("name", "age", "score"))
  }

  // Scenario 5 (main.rs:88-91): limit 0
  test("scenario 5: limit 0 is a typed empty frame") {
    val out = Rivulus(people).limit(0)
    assert(out.collect().isEmpty)
    assert(out.df.schema("age").dataType == LongType)
  }

  // Scenario 6 (main.rs:172-178): users ⋈ orders inner join.
  // Reference semantics (plan.rs:174-254): probe(orders) columns first,
  // build(users) minus key appended, dangling order 105 + user 4 dropped,
  // Alice matched twice.
  test("scenario 6: inner join drops dangling keys, keeps dup matches") {
    val joined = Rivulus(users).innerJoin(Rivulus(orders), "user_id", "user_id")
    assert(joined.df.columns.toSeq ==
      Seq("order_id", "user_id", "amount", "name", "city"))
    val rows = joined.collect()
    assert(rows.length == 4) // 105 and Diana dropped
    val names = rows.map(_.getAs[String]("name"))
    assert(names.count(_ == "Alice") == 2)
    assert(!names.contains("Diana"))
    assert(!rows.map(_.getAs[Long]("order_id")).contains(105L))
  }

  // Scenario 7 (main.rs:185-196): join then select
  test("scenario 7: join then projected select") {
    val out = Rivulus(users).innerJoin(Rivulus(orders), "user_id", "user_id")
      .select(col("name"), col("amount"))
      .collect()
    assert(out.map(r => (r.getString(0), r.getDouble(1))).toSet ==
      Set(("Alice", 250.5), ("Alice", 320.0), ("Bob", 89.9), ("Charlie", 150.0)))
  }

  // Scenarios 8-10 (main.rs:206-228): the "streaming collect" mode —
  // same results as eager collect, pulled incrementally.
  test("scenarios 8-10: streaming collect equals eager collect") {
    val q = Rivulus(people).select(col("name").as("n"), col("score")).limit(2)
    val eager = q.collect().toSeq
    val streamed = q.collectStreaming().toSeq
    assert(eager == streamed)
    assert(q.df.columns.head == "n") // alias survives (ref streaming drops it — deliberate fix, SURVEY §7.5.2)
  }

  // Scenario 11 (main.rs:238-253): ;-delimited CSV with declared schema + limit
  test("scenario 11: csv streaming with ; delimiter and limit") {
    val dir = Files.createTempDirectory("refcsv")
    val f = dir.resolve("users.csv")
    Files.writeString(f,
      """Username;Identifier;First_name;Last_name
        |booker12;9012;Rachel;Booker
        |grey07;2070;Laura;Grey
        |johnson81;4081;Craig;Johnson
        |jenkins46;9346;Mary;Jenkins
        |smith79;5079;Jamie;Smith
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("Username", StringType), StructField("Identifier", LongType),
      StructField("First_name", StringType), StructField("Last_name", StringType)))
    val out = Rivulus.fromCsv(spark, f.toString, schema, delimiter = ";").limit(3).collect()
    assert(out.length == 3)
    assert(out.map(_.getLong(1)).forall(Set(9012L, 2070L, 4081L, 9346L, 5079L)))
  }

  // A4 CSV fixture with embedded nulls (file_stream.rs:379-397)
  test("A4: csv null tokens parse per reference lexing") {
    val dir = Files.createTempDirectory("refcsv2")
    val f = dir.resolve("t.csv")
    Files.writeString(f,
      """id,name,score,active
        |1,Alice,85.5,true
        |2,Bob,92.0,false
        |3,Charlie,78.5,true
        |4,,90.0,false
        |5,Eve,null,true
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType),
      StructField("score", DoubleType),
      StructField("active", BooleanType, nullable = false)))
    val rows = CsvSource.read(spark, f.toString, schema).orderBy("id").collect()
    assert(rows.length == 5)
    assert(rows(3).isNullAt(1)) // "" -> null name
    assert(rows(4).isNullAt(2)) // "null" -> null score
    assert(rows.map(_.getBoolean(3)).toSeq == Seq(true, false, true, false, true))
  }

  // A5: null-semantics deltas (SURVEY §7.5.1) — SQL drops null keys in the
  // standard join; innerJoinNullEq reproduces the reference's Null==Null.
  test("A5: null join keys — SQL semantics vs reference null-eq variant") {
    import spark.implicits._
    val l = Seq((Some(1L), "a"), (None, "lnull")).toDF("k", "lv")
    val r = Seq((Some(1L), "x"), (None, "rnull")).toDF("k2", "rv")
    val sqlJoin = Rivulus(l).innerJoin(Rivulus(r), "k", "k2").collect()
    assert(sqlJoin.length == 1) // null keys dropped
    val refJoin = Rivulus(l).innerJoinNullEq(Rivulus(r), "k", "k2").collect()
    assert(refJoin.length == 2) // null == null matches (reference behavior)
  }

  // Reference `test_collect_streaming_vs_collect` (`builder.rs:596-614`):
  // the eager and streaming collect paths are pinned to the same results.
  test("collect equals collectStreaming on the parity queries") {
    val queries = Seq(
      Rivulus(people).filter(col("age") > lit(26)).select(col("name"), col("score")),
      Rivulus(users).innerJoin(Rivulus(orders), "user_id", "user_id"),
      Rivulus(people).select(col("name"), (col("score") * lit(2.0)).as("s2")).limit(2))
    queries.foreach { q =>
      val eager = q.collect().toSeq
      val streamed = q.collectStreaming().toSeq
      assert(eager.size == streamed.size)
      assert(eager.groupBy(identity).view.mapValues(_.size).toMap ==
        streamed.groupBy(identity).view.mapValues(_.size).toMap)
    }
  }

  // Reference `Series::new` dtype inference (`series.rs:185-229`):
  // value-driven dtypes, Int64→Float64 promotion, MixedTypes/EmptyData
  // rejection — the reference's DataFrame path needs no declared schema.
  test("fromRowsInferred: dtype inference with Int64->Float64 promotion") {
    val r = Rivulus.fromRowsInferred(spark, Seq("a", "b", "c", "d"),
      Seq(Seq(1, "x", true, 7L), Seq(2.5, "y", false, null)))
    val schema = r.df.schema
    assert(schema("a").dataType == DoubleType) // promoted int → double
    assert(schema("b").dataType == StringType)
    assert(schema("c").dataType == BooleanType)
    assert(schema("d").dataType == LongType)
    assert(r.collect().map(_.getDouble(0)).sorted.toSeq == Seq(1.0, 2.5))
  }

  test("fromRowsInferred rejects MixedTypes and EmptyData like the reference") {
    val mixed = intercept[IllegalArgumentException] {
      Rivulus.fromRowsInferred(spark, Seq("a"), Seq(Seq(1), Seq("x")))
    }
    assert(mixed.getMessage.contains("MixedTypes"))
    val empty = intercept[IllegalArgumentException] {
      Rivulus.fromRowsInferred(spark, Seq("a"), Seq.empty)
    }
    assert(empty.getMessage.contains("EmptyData"))
    val allNull = intercept[IllegalArgumentException] {
      Rivulus.fromRowsInferred(spark, Seq("a"), Seq(Seq(null), Seq(null)))
    }
    assert(allNull.getMessage.contains("EmptyData"))
  }
}
