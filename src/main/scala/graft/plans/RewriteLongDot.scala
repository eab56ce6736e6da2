package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

import graft.functions.LongArrayDot

/** Optimizer rule: rewrite the declarative dot-product idiom
  * {{{ aggregate(zip_with(a, b, (x, y) -> x * y), 0L, (acc, v) -> acc + v) }}}
  * into the codegen'd [[LongArrayDot]] primitive.
  *
  * Users writing the natural builtin formulation silently get the fast
  * path (~20× on similarity joins: the HOF chain evaluates interpreted,
  * per element, with an intermediate array allocation per row). The
  * rewrite fires only for Long element types and the exact
  * multiply-then-sum shape, where the primitive is bit-identical.
  */
object RewriteLongDot extends Rule[LogicalPlan] {

  private object MulLambda {
    def unapply(f: Expression): Option[(NamedLambdaVariable, NamedLambdaVariable)] =
      f match {
        case LambdaFunction(Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
            Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _)
            if (x.exprId == a.exprId && y.exprId == b.exprId) ||
               (x.exprId == b.exprId && y.exprId == a.exprId) =>
          Some((a, b))
        case _ => None
      }
  }

  private object SumLambda {
    def unapply(f: Expression): Boolean = f match {
      case LambdaFunction(Add(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable), _) =>
        (x.exprId == a.exprId && y.exprId == b.exprId) ||
          (x.exprId == b.exprId && y.exprId == a.exprId)
      case _ => false
    }
  }

  private object IdentityFinish {
    def unapply(f: Expression): Boolean = f match {
      // functions.aggregate without a finish builds an explicit
      // identity lambda; anything else must NOT match or the rewrite
      // would silently drop the finish transform.
      case LambdaFunction(v: NamedLambdaVariable, Seq(a: NamedLambdaVariable), _) =>
        v.exprId == a.exprId
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(left, right, MulLambda(_, _)),
            Literal(0L, LongType),
            SumLambda(),
            finish @ IdentityFinish())
          if finish.dataType == LongType =>
        LongArrayDot(left, right)
    }
}
