package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native squared-L2 distance over two numeric-array columns — the
  * k-means assignment hot loop ([[graft.functions.Similarity.sqDist]]).
  * Each side is independently `array<double>` or `array<float>` (float
  * elements widen to double exactly, so the FoldToVecDot rewrite of the
  * float-input HOF fold is bit-identical). Left-to-right accumulation of
  * `(a_i - b_i)^2`, and the same null contract as [[FloatVecDot]]:
  * null array / unequal lengths / null element → null. At 100k vectors ×
  * 16 centroids the interpreted fold was ~10x the cost of the whole
  * Lloyd round; this is one fused codegen loop.
  */
case class DoubleVecSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(t: DataType): Option[DataType] = t match {
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case ArrayType(FloatType, _)  => Some(FloatType)
    case _                        => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemType(left.dataType).isDefined && elemType(right.dataType).isDefined)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_sqdist expects array<double> or array<float> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean  = true
  override def prettyName: String = "vec_sqdist"

  @inline private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => a.getDouble(i)
    case _          => a.getFloat(i).toDouble
  }

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val a  = l.asInstanceOf[ArrayData]
    val b  = r.asInstanceOf[ArrayData]
    val lt = elemType(left.dataType).get
    val rt = elemType(right.dataType).get
    val n  = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = get(a, i, lt) - get(b, i, rt)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n   = ctx.freshName("n")
      val i   = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d   = ctx.freshName("d")
      def access(arr: String, side: Expression) =
        if (elemType(side.dataType).get == DoubleType) s"$arr.getDouble($i)"
        else s"(double) $arr.getFloat($i)"
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = ${access(a, left)} - ${access(b, right)};
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleVecSqDist =
    copy(left = newLeft, right = newRight)
}
