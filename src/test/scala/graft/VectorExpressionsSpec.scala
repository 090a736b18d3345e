package graft

import graft.functions.VectorExpressions._
import graft.ops.Vectors
import org.apache.spark.sql.functions._

/** Native codegen expressions vs the interpreted higher-order-function
  * forms: must agree to ~1e-9 on seeded random vectors, and handle float
  * arrays, empty arrays, and zero vectors. */
class VectorExpressionsSpec extends SparkSpec {

  test("native dot/cosine == HOF dot/cosine on random double vectors") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val pairs = Seq.fill(50)((
      Seq.fill(16)(rng.nextDouble() * 200 - 100),
      Seq.fill(16)(rng.nextDouble() * 200 - 100)))
    val rows = pairs.toDF("a", "b").select(
      vecDot(col("a"), col("b")).as("d1"),
      Vectors.dotColHof(col("a"), col("b")).as("d2"),
      vecCosine(col("a"), col("b")).as("c1"),
      Vectors.cosineColHof(col("a"), col("b")).as("c2")).collect()
    rows.foreach { row =>
      assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 1e-8)
      assert(math.abs(row.getDouble(2) - row.getDouble(3)) < 1e-9)
    }
  }

  test("float arrays read natively (no cast) and match double math") {
    import spark.implicits._
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0, 5.0, 6.0))).toDF("f", "d")
    val row = df.select(
      vecDot(col("f"), col("d")).as("dot"),
      vecCosine(col("f"), col("f")).as("self")).first()
    assert(math.abs(row.getDouble(0) - 32.0) < 1e-6)
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
  }

  test("edge cases: empty arrays and zero vectors") {
    import spark.implicits._
    val df = Seq((Seq.empty[Double], Seq.empty[Double], Seq(0.0, 0.0), Seq(1.0, 2.0)))
      .toDF("e1", "e2", "z", "v")
    val row = df.select(
      vecDot(col("e1"), col("e2")).as("dot_empty"),
      vecCosine(col("z"), col("v")).as("cos_zero")).first()
    assert(row.getDouble(0) == 0.0)
    assert(row.getDouble(1) == 0.0) // zero norm -> 0, not NaN
  }

  test("sql-registered functions work (live-session registration)") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    Seq((Seq(1.0, 0.0), Seq(0.0, 1.0))).toDF("a", "b").createOrReplaceTempView("vt")
    val row = spark.sql(
      "SELECT vec_cosine(a, b) AS c, vec_dot(a, a) AS d FROM vt").first()
    assert(math.abs(row.getDouble(0)) < 1e-9) // orthogonal
    assert(math.abs(row.getDouble(1) - 1.0) < 1e-9)
    // arity error surfaces as a clear message, not IndexOutOfBounds
    val e = intercept[Exception](spark.sql("SELECT vec_dot(a) FROM vt").collect())
    assert(e.getMessage.contains("2 arguments"), e.getMessage)
  }

  test("optimizer rule rewrites the HOF dot product into codegen vec_dot (opt-in)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.{DotProduct, VecRewrite}
    // parquet-backed input: a LocalRelation would be eagerly evaluated by
    // ConvertToLocalRelation before user-provided rules run
    val df = Tables.embeddings(spark, sfDir).limit(8)
      .select(
        org.apache.spark.sql.functions.transform(col("embedding"), _.cast("double")).as("a"),
        org.apache.spark.sql.functions.transform(col("embedding"), _.cast("double")).as("b"))
    def hofQuery = df.select(graft.ops.Vectors.dotColHof(col("a"), col("b")).as("d"))
    // flag off (default): the HOF stays interpreted — no DotProduct node
    def hasDot(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
      plan.exists(_.expressions.exists(_.exists(_.isInstanceOf[DotProduct])))
    assert(!hasDot(hofQuery.queryExecution.optimizedPlan))
    val want = hofQuery.collect().map(_.getDouble(0)).toSeq
    VecRewrite.enable(spark)
    try {
      val after = hofQuery.queryExecution.optimizedPlan
      assert(hasDot(after), s"rule did not fire:\n$after")
      val got = hofQuery.collect().map(_.getDouble(0)).toSeq
      assert(got == want, "rewrite must not change results on well-formed input")
      // strictness: an int-array aggregate must NOT be rewritten
      val ints = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
      val intHof = ints.select(org.apache.spark.sql.functions.aggregate(
        org.apache.spark.sql.functions.zip_with(col("a"), col("b"), (x, y) => x * y),
        org.apache.spark.sql.functions.lit(0.0),
        (acc, v) => acc + v).as("d"))
      assert(!hasDot(intHof.queryExecution.optimizedPlan))
      assert(math.abs(intHof.first().getDouble(0) - 11.0) < 1e-9)
    } finally VecRewrite.disable(spark)
  }

  test("sql-registered text kernels match the Column wrappers") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.functions.GraftExtensions.register(spark)
    Seq(("the quick brown fox jumps", 1L)).toDF("text", "id")
      .createOrReplaceTempView("tt")
    val viaSql = spark.sql(
      """SELECT graft_shingles(text, 3) AS sh,
        |       graft_minhash(graft_shingles(text, 3), 8) AS mh,
        |       graft_simhash(text) AS sim FROM tt""".stripMargin).first()
    val viaCol = spark.table("tt").select(
      graft.functions.TextKernels.shinglesKernel(col("text"), 3).as("sh"),
      graft.functions.TextKernels.minhashSigKernel(
        graft.functions.TextKernels.shinglesKernel(col("text"), 3), 8).as("mh"),
      graft.functions.TextKernels.simhashKernel(col("text")).as("sim")).first()
    assert(viaSql.getSeq[String](0) == viaCol.getSeq[String](0))
    assert(viaSql.getSeq[Long](1) == viaCol.getSeq[Long](1))
    assert(viaSql.getLong(2) == viaCol.getLong(2))
  }

  test("sql-registered term-freqs and trigram-score kernels work from SQL text") {
    import spark.implicits._
    graft.functions.GraftExtensions.register(spark)
    Seq(("spark spark shuffle other", 1L)).toDF("text", "id")
      .createOrReplaceTempView("tf_tt")
    val tf = spark.sql(
      "SELECT graft_term_freqs(text, array('spark', 'shuffle', 'join')) AS t FROM tf_tt")
      .first().getSeq[Long](0)
    assert(tf == Seq(4L, 2L, 1L, 0L)) // [n_tokens, tf(spark), tf(shuffle), tf(join)]
    val score = spark.sql(
      """SELECT graft_trigram_score(array('abc', 'abc', 'xyz'),
        |                           array('abc', 'xyz'),
        |                           array(CAST(3 AS BIGINT), CAST(1 AS BIGINT)),
        |                           CAST(4.0 AS DOUBLE)) AS s""".stripMargin)
      .first().getDouble(0)
    val expected = (2 * math.log(3.0 / 4.0) + math.log(1.0 / 4.0)) / 3.0
    assert(math.abs(score - expected) < 1e-12, s"$score vs $expected")
  }

  test("sql-registered repStats / gopherStats / sortedPairs kernels work from SQL text") {
    graft.functions.GraftExtensions.register(spark)
    val rep = spark.sql("SELECT graft_rep_stats('a b a b') AS r")
      .first().getSeq[Long](0)
    assert(rep == Seq(4L, 2L, 2L, 3L)) // tokens, distinct, top bigram ('a b'×2), bigrams
    val gopher = spark.sql(
      "SELECT graft_gopher_stats('the cat the', array('the', 'of')) AS g")
      .first().getSeq[Long](0)
    assert(gopher == Seq(3L, 9L, 1L)) // words, chars, distinct stop hits
    val pairs = spark.sql(
      "SELECT graft_sorted_pairs(array(CAST(3 AS BIGINT), CAST(1 AS BIGINT), CAST(3 AS BIGINT))) AS p")
      .first().getSeq[org.apache.spark.sql.Row](0)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))) == Seq((1L, 3L)))
  }
}
