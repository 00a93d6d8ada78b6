package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Optimizer rule: recognize the declarative higher-order-function dot
  * product —
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x * y), 0.0d, (acc, x) => acc + x) }}}
  *
  * — and substitute the codegen'd [[DotProduct]]. Users keep writing the
  * natural Spark form; the engine runs the tight primitive loop (the HOF
  * chain is interpreted and allocates an intermediate array per row).
  *
  * Exact-semantics guard: `zip_with` null-pads when lengths differ, and one
  * null product drives the whole fold to NULL — while DotProduct folds over
  * the common prefix. The rewrite is therefore
  * `If(size(a) = size(b), DotProduct(a, b), NULL)` (with non-null element
  * types, the mismatched case is ALWAYS null, so no original expression
  * needs to survive — which also keeps the rule idempotent under the
  * optimizer's fixed-point batches). Only `ARRAY<DOUBLE>` with non-null
  * elements is rewritten.
  *
  * Registered for new sessions via [[GraftExtensions]]
  * (`injectOptimizerRule`); on a live session use
  * `spark.experimental.extraOptimizations`.
  */
object NativeDotProductRule extends Rule[LogicalPlan] {

  private val NonNullDoubleArray = ArrayType(DoubleType, containsNull = false)

  private def isIdentity(f: Expression): Boolean = f match {
    case LambdaFunction(body: NamedLambdaVariable, Seq(arg: NamedLambdaVariable), _) =>
      body.exprId == arg.exprId
    case _ => false
  }

  /** (x, y) => x * y with the lambda's own arguments, in order. */
  private def isElementwiseProduct(f: Expression): Boolean = f match {
    case LambdaFunction(
          Multiply(x: NamedLambdaVariable, y: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, b: NamedLambdaVariable),
          _
        ) =>
      x.exprId == a.exprId && y.exprId == b.exprId
    case _ => false
  }

  /** (acc, x) => acc + x with the lambda's own arguments, in order. */
  private def isSum(f: Expression): Boolean = f match {
    case LambdaFunction(
          Add(acc: NamedLambdaVariable, x: NamedLambdaVariable, _),
          Seq(a: NamedLambdaVariable, e: NamedLambdaVariable),
          _
        ) =>
      acc.exprId == a.exprId && x.exprId == e.exprId
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(ZipWith(l, r, product), Literal(zero: Double, DoubleType), merge, finish)
        if zero == 0.0 && isElementwiseProduct(product) && isSum(merge) && isIdentity(finish) &&
          l.dataType == NonNullDoubleArray && r.dataType == NonNullDoubleArray =>
      If(
        EqualTo(Size(l, legacySizeOfNull = false), Size(r, legacySizeOfNull = false)),
        DotProduct(l, r),
        Literal(null, DoubleType)
      )
  }
}
