package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the interpreted higher-order-function dot
  * product — `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0,
  * (acc, v) -> acc + v)` — into the codegen'd [[DotProduct]] expression
  * (measured ~4-5× end-to-end on the ANN queries; see
  * VectorExpressions). This is the `Rule[LogicalPlan]` rung of the
  * custom-Catalyst ladder: users keep writing portable HOF SQL/Column
  * code and the optimizer swaps in the native kernel.
  *
  * OPT-IN via `spark.graft.rewriteHofVectorOps=true`
  * ([[VecRewrite.enable]]) because the two forms differ
  * on MALFORMED input: `zip_with` pads the shorter array with null, so
  * the HOF sum of a length-mismatched pair is NULL, while [[DotProduct]]
  * sums the common prefix. On fixed-dimension embedding columns (the
  * only sane input) they are identical — the equivalence spec pins that
  * — but the engine must not silently change null behavior without the
  * user asserting fixed dims, hence the flag.
  *
  * The match is deliberately strict: exact lambda-variable usage checked
  * by exprId, zero literal exactly 0.0d, and float/double array inputs
  * only — anything else (int arrays, reused vars, extra arithmetic)
  * falls through untouched.
  */
object VecRewriteRule extends Rule[LogicalPlan] {

  val FlagKey = "spark.graft.rewriteHofVectorOps"

  private def vecTyped(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  /** f is exactly `va * vb` / `va + vb` over the two bound variables. */
  private def usesBoth(l: Expression, r: Expression,
                       a: NamedLambdaVariable, b: NamedLambdaVariable): Boolean =
    (l, r) match {
      case (x: NamedLambdaVariable, y: NamedLambdaVariable) =>
        Set(x.exprId, y.exprId) == Set(a.exprId, b.exprId)
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(FlagKey, "false").toBoolean) plan
    else plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(ml, mr, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0.0, DoubleType),
            LambdaFunction(Add(al, ar, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable,
              Seq(fa: NamedLambdaVariable), _))
          if vecTyped(a) && vecTyped(b) &&
            usesBoth(ml, mr, x, y) && usesBoth(al, ar, acc, v) &&
            fin.exprId == fa.exprId =>
        DotProduct(a, b)
    }
}

object VecRewrite {
  /** Turn the rewrite on for a live session: registers the rule in the
    * user-provided optimizer batch (idempotent) and flips the flag. New
    * sessions built `withExtensions(_.injectOptimizerRule(...))` get the
    * same rule at construction time. */
  def enable(spark: SparkSession): Unit = {
    spark.conf.set(VecRewriteRule.FlagKey, "true")
    if (!spark.experimental.extraOptimizations.contains(VecRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ VecRewriteRule
  }

  def disable(spark: SparkSession): Unit =
    spark.conf.set(VecRewriteRule.FlagKey, "false")
}
