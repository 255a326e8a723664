package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the composable dot-product idiom
  *
  *   aggregate(zip_with(a, b, (x, y) -> x * y), 0.0d, (acc, e) -> acc + e)
  *
  * anywhere in a plan and substitute the allocation-free codegen'd
  * [[DotProduct]] kernel. Users (and generated SQL) can keep writing the
  * declarative form; the engine quietly drops the per-row intermediate
  * array — the same contract as Spark's own expression rewrites.
  *
  * The substitution is semantics-preserving by construction:
  * [[DotProduct]] implements exactly the composed form's null/length
  * behavior (NULL on length mismatch — zip_with's null padding poisons
  * the sum — and NULL on a null element) and the same left-to-right
  * fold order, so results are bit-identical. The match is deliberately
  * narrow: double arrays, a literal 0.0 zero, and lambda bodies that
  * are pure `x * y` / `acc + e` over the lambda's own variables
  * (either operand order — both ops are bitwise commutative on
  * doubles). Anything else is left untouched.
  *
  * Injected by [[GraftExtensions]] via `injectOptimizerRule`.
  */
object VectorDotRewrite extends Rule[LogicalPlan] {

  private def isDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def sameVar(a: Expression, b: NamedExpression): Boolean = (a, b) match {
    case (x: NamedLambdaVariable, y: NamedLambdaVariable) => x.exprId == y.exprId
    case _ => false
  }

  /** body is a commutative binary op over exactly the two lambda vars. */
  private def overVars(x: Expression, y: Expression,
      v1: NamedExpression, v2: NamedExpression): Boolean =
    (sameVar(x, v1) && sameVar(y, v2)) || (sameVar(x, v2) && sameVar(y, v1))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
        ZipWith(l, r, LambdaFunction(Multiply(mx, my, _), Seq(zx, zy), _)),
        Literal(0.0, DoubleType),
        LambdaFunction(Add(ax, ay, _), Seq(acc, el), _),
        LambdaFunction(fin, Seq(facc), _))
      if isDoubleArray(l) && isDoubleArray(r) &&
        overVars(mx, my, zx, zy) && overVars(ax, ay, acc, el) &&
        sameVar(fin, facc) =>
      DotProduct(l, r)
  }
}
