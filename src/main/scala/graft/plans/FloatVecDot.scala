package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expression for the embedding hot path: ordered-fold dot
  * product of two `array<float>` columns in double precision.
  *
  * Why a custom Expression (the brief's preferred extension point) instead
  * of `aggregate(zip_with(...))`: the higher-order-function pipeline
  * allocates an intermediate products array and evaluates a lambda per
  * element through the interpreted HOF machinery; this expression is one
  * fused whole-stage-codegen loop over the two `ArrayData`, no
  * intermediates, no virtual calls. Semantics are bit-identical to the
  * fold (left-to-right double accumulation, `(double)f1 * (double)f2`),
  * so results still match the DuckDB `list_inner_product` oracle exactly.
  *
  * Null contract — identical to the fold: null input array → null;
  * unequal lengths → null (zip_with null-pads the shorter side and the
  * null product nulls the accumulator); any null element → null. A
  * malformed embedding therefore surfaces as NULL, never as a silently
  * partial score.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects two array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  // can be null even for non-null inputs (unequal lengths, null elements)
  override def nullable: Boolean  = true
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** SparkSessionExtensions entry point: registers `vec_dot` in the session
  * FunctionRegistry so the engine (and SQL users) call it as a normal
  * function — the documented injection mechanism, applied via
  * `SparkSession.builder.withExtensions` in GraftSession.
  */
object GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vec_dot takes exactly 2 arguments")
        FloatVecDot(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("gather_lookup"),
      new ExpressionInfo(classOf[GatherLookup].getName, "gather_lookup"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "gather_lookup takes exactly 3 arguments")
        GatherLookup(children.head, children(1), children(2))
      }))
    ext.injectFunction((
      new FunctionIdentifier("poly_hash"),
      new ExpressionInfo(classOf[PolyHash].getName, "poly_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "poly_hash takes exactly 1 argument")
        PolyHash(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "bloom_might_contain takes exactly 2 arguments")
        BloomMightContain(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_sqdist"),
      new ExpressionInfo(classOf[DoubleVecSqDist].getName, "vec_sqdist"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "vec_sqdist takes exactly 2 arguments")
        DoubleVecSqDist(children.head, children(1))
      }))
    // the HOF dot fold on float arrays rewrites to the native expression
    ext.injectOptimizerRule(_ => FoldToVecDot)
  }
}
