package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Registers the native vector expressions as SQL functions via the public
  * `SparkSessionExtensions` API, so `spark.sql("SELECT vec_cosine(a, b)")`
  * works and the expressions participate in Catalyst like built-ins.
  *
  * Use: `SparkSession.builder.withExtensions(new GraftExtensions()(_))` or
  * `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      dotBuilder))
    ext.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cosine"),
      cosineBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(TextKernels.getClass.getName, "graft_shingles"),
      shinglesBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(TextKernels.getClass.getName, "graft_minhash"),
      minhashBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(TextKernels.getClass.getName, "graft_simhash"),
      simhashBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_term_freqs"),
      new ExpressionInfo(TextKernels.getClass.getName, "graft_term_freqs"),
      termFreqsBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_trigram_score"),
      new ExpressionInfo(TextKernels.getClass.getName, "graft_trigram_score"),
      trigramScoreBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_rep_stats"),
      new ExpressionInfo(TextKernels.getClass.getName, "graft_rep_stats"),
      repStatsBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_gopher_stats"),
      new ExpressionInfo(TextKernels.getClass.getName, "graft_gopher_stats"),
      gopherStatsBuilder))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_pairs"),
      new ExpressionInfo(GraftFunctions.getClass.getName, "graft_sorted_pairs"),
      sortedPairsBuilder))
    // HOF-dot-product -> vec_dot rewrite; inert until the session sets
    // spark.graft.rewriteHofVectorOps=true (the rule checks the flag at
    // apply time — see VecRewriteRule's scaladoc for the opt-in rationale)
    ext.injectOptimizerRule(_ => VecRewriteRule)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions.Expression

  private def arity2(name: String)(args: Seq[Expression])(
      mk: (Expression, Expression) => Expression): Expression = {
    require(args.length == 2, s"$name takes exactly 2 arguments, got ${args.length}")
    mk(args(0), args(1))
  }

  val dotBuilder: Seq[Expression] => Expression =
    args => arity2("vec_dot")(args)(DotProduct)
  val cosineBuilder: Seq[Expression] => Expression =
    args => arity2("vec_cosine")(args)(CosineSimilarity)

  // text-kernel SQL entry points (same StaticInvoke shapes as the Column
  // wrappers in TextKernels — one static call per row inside codegen).
  // Unlike the internal wrappers these are user-reachable with ARBITRARY
  // nullable inputs, and StaticInvoke's default propagateNull yields NULL
  // for a NULL input — so the declared nullability must be `true` here or
  // the optimizer may elide null checks and NPE/drop rows downstream.
  import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
  import org.apache.spark.sql.types._

  val shinglesBuilder: Seq[Expression] => Expression = args => {
    require(args.length == 2, s"graft_shingles(text, k) takes 2 arguments, got ${args.length}")
    StaticInvoke(TextKernels.getClass, ArrayType(StringType, containsNull = false),
      "shingles", Seq(args(0), args(1)),
      inputTypes = Seq(StringType, IntegerType), returnNullable = true)
  }
  val minhashBuilder: Seq[Expression] => Expression = args => {
    require(args.length == 2, s"graft_minhash(shingles, numPerms) takes 2 arguments, got ${args.length}")
    StaticInvoke(TextKernels.getClass, ArrayType(LongType, containsNull = false),
      "minhashSig", Seq(args(0), args(1)),
      inputTypes = Seq(ArrayType(StringType), IntegerType), returnNullable = true)
  }
  val simhashBuilder: Seq[Expression] => Expression = args => {
    require(args.length == 1, s"graft_simhash(text) takes 1 argument, got ${args.length}")
    StaticInvoke(TextKernels.getClass, LongType, "simhash64", Seq(args(0)),
      inputTypes = Seq(StringType), returnNullable = true)
  }
  val termFreqsBuilder: Seq[Expression] => Expression = args => {
    require(args.length == 2, s"graft_term_freqs(text, terms) takes 2 arguments, got ${args.length}")
    StaticInvoke(TextKernels.getClass, ArrayType(LongType, containsNull = false),
      "termFreqs", Seq(args(0), args(1)),
      inputTypes = Seq(StringType, ArrayType(StringType)), returnNullable = true)
  }
  val trigramScoreBuilder: Seq[Expression] => Expression = args => {
    require(args.length == 4,
      s"graft_trigram_score(tris, keys, counts, total) takes 4 arguments, got ${args.length}")
    StaticInvoke(TextKernels.getClass, DoubleType, "trigramScore",
      Seq(args(0), args(1), args(2), args(3)),
      inputTypes = Seq(ArrayType(StringType), ArrayType(StringType),
        ArrayType(LongType), DoubleType), returnNullable = true)
  }

  val repStatsBuilder: Seq[Expression] => Expression = args => {
    require(args.length == 1, s"graft_rep_stats(text) takes 1 argument, got ${args.length}")
    StaticInvoke(TextKernels.getClass, ArrayType(LongType, containsNull = false),
      "repStats", Seq(args(0)),
      inputTypes = Seq(StringType), returnNullable = true)
  }
  val gopherStatsBuilder: Seq[Expression] => Expression = args => {
    require(args.length == 2, s"graft_gopher_stats(text, stops) takes 2 arguments, got ${args.length}")
    StaticInvoke(TextKernels.getClass, ArrayType(LongType, containsNull = false),
      "gopherStats", Seq(args(0), args(1)),
      inputTypes = Seq(StringType, ArrayType(StringType)), returnNullable = true)
  }
  val sortedPairsBuilder: Seq[Expression] => Expression = args => {
    require(args.length == 1, s"graft_sorted_pairs(ids) takes 1 argument, got ${args.length}")
    StaticInvoke(GraftFunctions.getClass,
      ArrayType(StructType(Seq(
        StructField("a", LongType, nullable = false),
        StructField("b", LongType, nullable = false))), containsNull = false),
      "sortedLongPairs", Seq(args(0)),
      inputTypes = Seq(ArrayType(LongType)), returnNullable = true)
  }

  /** Register on a live session (extensions only bind at builder time). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "vec_dot", dotBuilder)
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "vec_cosine", cosineBuilder)
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "graft_shingles", shinglesBuilder)
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "graft_minhash", minhashBuilder)
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "graft_simhash", simhashBuilder)
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "graft_term_freqs", termFreqsBuilder)
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "graft_trigram_score", trigramScoreBuilder)
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "graft_rep_stats", repStatsBuilder)
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "graft_gopher_stats", gopherStatsBuilder)
    org.apache.spark.sql.graft.bridge.registerFunction(spark, "graft_sorted_pairs", sortedPairsBuilder)
  }
}
