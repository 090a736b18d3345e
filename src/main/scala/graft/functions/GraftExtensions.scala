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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "vec_dot"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_cosine"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "vec_cosine"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        CosineSimilarity(args(0), args(1))))
  }
}
