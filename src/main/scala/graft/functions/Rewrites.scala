package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite the portable higher-order-function dot
  * product
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) }}}
  * into graft's fused codegen [[DotLong]].
  *
  * Why a `Rule[LogicalPlan]`: users writing engine-portable SQL (the
  * DuckDB-twin form) shouldn't pay the interpreted-lambda tax — the
  * composed form allocates an intermediate array and walks two lambda
  * interpreters per row, which is the entire cost of a cosine scoring
  * pass. The rewrite fires only on the exact shape with long element
  * types, where the two forms are semantically identical (including
  * null propagation: both are null iff an input array is null).
  *
  * Installed by [[GraftFunctions.register]] via
  * `experimental.extraOptimizations` (works on any existing session)
  * and by [[graft.GraftExtensions]] for `spark.sql.extensions` setups.
  */
object DotProductRewrite extends Rule[LogicalPlan] {

  private def isVarPair(e1: Expression, e2: Expression,
      v1: NamedLambdaVariable, v2: NamedLambdaVariable): Boolean =
    (e1, e2) match {
      case (a: NamedLambdaVariable, b: NamedLambdaVariable) =>
        Set(a.exprId, b.exprId) == Set(v1.exprId, v2.exprId)
      case _ => false
    }

  private def isLongArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(left, right,
              LambdaFunction(Multiply(m1, m2, _), Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(0L, LongType),
            LambdaFunction(Add(a1, a2, _), Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(fin: NamedLambdaVariable, Seq(fv: NamedLambdaVariable), _))
          if isLongArray(left) && isLongArray(right) &&
            isVarPair(m1, m2, x, y) && isVarPair(a1, a2, acc, v) &&
            fin.exprId == fv.exprId =>
        DotLong(left, right)
    }
}
