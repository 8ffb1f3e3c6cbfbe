package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, Cast,
  Expression, LambdaFunction, Literal, Multiply, NamedLambdaVariable, ZipWith}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule rewriting the built-in HOF dot-product composition
  *
  * {{{ aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  *               0.0, (acc, v) -> acc + v) }}}
  *
  * into the fused, whole-stage-codegen'd [[DotProduct]] expression.
  * Higher-order functions evaluate their lambdas INTERPRETED per
  * element, and the zip_with materializes an intermediate product array
  * per row — so user queries written with the (perfectly idiomatic)
  * built-in composition silently pay 3x+ over the native kernel. The
  * rewrite is semantics-preserving: DotProduct returns null exactly
  * where the HOF chain does (length mismatch via zip_with's null
  * padding, null elements poisoning the sum) and accumulates
  * left-to-right in double like the lambda chain.
  *
  * Matches conservatively: the exact shape above (casts may be elided
  * by the analyzer when the arrays are already double) over
  * array<float|double> inputs. Injected by [[GraftExtensions]] via
  * `injectOptimizerRule`.
  */
object RewriteHofDot extends Rule[LogicalPlan] {

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case nv: NamedLambdaVariable => nv.exprId == v.exprId
    case _ => false
  }

  /** The lambda body reads `v` widened to double: either an explicit
    * cast or the bare variable (analyzer elides no-op casts). */
  private def doubleOf(e: Expression, v: NamedLambdaVariable): Boolean = e match {
    case c: Cast => c.dataType == DoubleType && isVar(c.child, v)
    case _ => isVar(e, v) && e.dataType == DoubleType
  }

  private def floatOrDoubleArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(t, _) => t == FloatType || t == DoubleType
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
            ZipWith(a, b,
              LambdaFunction(Multiply(mx, my, _),
                Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
            Literal(zero, DoubleType),
            LambdaFunction(Add(accRef, vRef, _),
              Seq(acc: NamedLambdaVariable, v: NamedLambdaVariable), _),
            LambdaFunction(finBody, Seq(fin: NamedLambdaVariable), _))
          if zero == 0.0 &&
            floatOrDoubleArray(a) && floatOrDoubleArray(b) &&
            doubleOf(mx, x) && doubleOf(my, y) &&
            isVar(accRef, acc) && isVar(vRef, v) && isVar(finBody, fin) =>
        DotProduct(a, b)
    }
}
