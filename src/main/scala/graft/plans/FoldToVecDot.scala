package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

/** Optimizer rule: rewrite the two idiomatic HOF folds of the embedding
  * hot path into their native codegen'd expressions, so a user writing
  * the portable formulation gets the fused-loop speed automatically.
  *
  *  - dot product ([[graft.functions.Similarity.dotFold]]):
  *    {{{ aggregate(zip_with(a, b, (x, y) => x.cast(double) * y.cast(double)),
  *        0.0, (acc, v) => acc + v) }}}
  *    on two `array<float>` columns → [[FloatVecDot]].
  *  - squared L2 ([[graft.functions.Similarity.sqDistFold]]):
  *    {{{ aggregate(zip_with(a, b, (x, y) => { val d = x.cast(double) -
  *        y.cast(double); d * d }), 0.0, (acc, v) => acc + v) }}}
  *    on float/double arrays → [[DoubleVecSqDist]].
  *
  * Both rewrites are semantics-preserving by the expressions' contracts:
  * identical left-to-right double accumulation and identical null
  * behavior (null array / unequal lengths / null element → null). The
  * matches are deliberately exact — any other zero, lambda body, or
  * element type keeps the original fold. (The custom-`Rule` extension
  * point of the brief, registered via GraftExtensions alongside the
  * expressions.) The element casts may already be elided by
  * SimplifyCasts when the input is array<double> (the optimizer batch
  * runs to fixed point), so the operand extractor accepts the lambda
  * variable with or without its widening cast.
  */
object FoldToVecDot extends Rule[LogicalPlan] {

  private def isFloatArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  private def isNumVecArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _                                                  => false
  }

  /** a zip_with lambda operand as a double: the variable itself (double
    * input, cast elided) or its explicit widening cast
    */
  private object VarAsDouble {
    def unapply(e: Expression): Option[NamedLambdaVariable] = e match {
      case v: NamedLambdaVariable if v.dataType == DoubleType => Some(v)
      case Cast(v: NamedLambdaVariable, DoubleType, _, _)     => Some(v)
      case _                                                  => None
    }
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

    case ArrayAggregate(
          ZipWith(l, r,
            LambdaFunction(
              Multiply(Subtract(VarAsDouble(x1), VarAsDouble(y1), _),
                Subtract(VarAsDouble(x2), VarAsDouble(y2), _), _),
              Seq(px: NamedLambdaVariable, py: NamedLambdaVariable), _)),
          Literal(zero, DoubleType),
          LambdaFunction(
            Add(a1: NamedLambdaVariable, a2: NamedLambdaVariable, _),
            Seq(pa: NamedLambdaVariable, pv: NamedLambdaVariable), _),
          LambdaFunction(f1: NamedLambdaVariable, Seq(pf: NamedLambdaVariable), _))
        if isNumVecArray(l) && isNumVecArray(r) && zero == 0.0d &&
          x1.exprId == px.exprId && y1.exprId == py.exprId &&
          x2.exprId == px.exprId && y2.exprId == py.exprId &&
          a1.exprId == pa.exprId && a2.exprId == pv.exprId &&
          f1.exprId == pf.exprId =>
      DoubleVecSqDist(l, r)
  }
}
