package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the idiomatic HOF dot-product fold
  *
  * {{{ aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  *     0.0, (acc, v) => acc + v) }}}
  *
  * on two `array<float>` columns into the native codegen'd
  * [[FloatVecDot]] — so a user writing the portable HOF formulation
  * (exactly [[graft.functions.Similarity.dotFold]]) gets the fused-loop
  * speed automatically. Semantics-preserving by [[FloatVecDot]]'s
  * contract: identical left-to-right double accumulation and identical
  * null behavior (null array / unequal lengths / null element → null).
  *
  * The match is deliberately exact — any other zero, lambda body, or
  * element type keeps the original fold. (The custom-`Rule` extension
  * point of the brief, registered via GraftExtensions alongside the
  * expressions.)
  */
object FoldToVecDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(
              Multiply(Cast(x1: NamedLambdaVariable, DoubleType, _, _),
                Cast(y1: NamedLambdaVariable, DoubleType, _, _), _),
              Seq(px: NamedLambdaVariable, py: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(
            Add(a1: NamedLambdaVariable, a2: NamedLambdaVariable, _),
            Seq(pa: NamedLambdaVariable, pv: NamedLambdaVariable), _),
          LambdaFunction(f1: NamedLambdaVariable, Seq(pf: NamedLambdaVariable), _))
        if isFloatArray(l) && isFloatArray(r) && zero == 0.0d &&
          x1.exprId == px.exprId && y1.exprId == py.exprId &&
          a1.exprId == pa.exprId && a2.exprId == pv.exprId &&
          f1.exprId == pf.exprId =>
      FloatVecDot(l, r)
  }
}
