package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression for the Gather sampler's constant-list
  * re-index: `gather_lookup(index, sortedKeys, positions)` returns
  * `positions[binarySearch(sortedKeys, index)]`, or null when `index` is
  * not in the list. `sortedKeys`/`positions` must be foldable
  * `array<bigint>` literals (the gather list is a plan-time constant).
  *
  * Why a custom Expression: the reference's Gather (`sampler.cpp:265-336`)
  * re-indexes with an O(1) table lookup per row; Spark's literal-map
  * `element_at` is a linear probe and `isin` boxes every comparison, so a
  * large gather list pays O(|list|) per row. This compiles to one
  * primitive `Arrays.binarySearch` over a shared `long[]` inside
  * whole-stage codegen — O(log |list|), no boxing, no join operator —
  * which keeps Gather scan-dominated (BASELINE.md target 2) at any list
  * size below the broadcast-join crossover.
  */
case class GatherLookup(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def arr(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _                      => false
    }
    if (first.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"gather_lookup expects a bigint index, got ${first.dataType.simpleString}")
    else if (!arr(second.dataType) || !arr(third.dataType))
      TypeCheckResult.TypeCheckFailure("gather_lookup expects array<bigint> key/position lists")
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure("gather_lookup key/position lists must be constants")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = LongType
  // null for any index outside the gather list
  override def nullable: Boolean  = true
  override def prettyName: String = "gather_lookup"

  @transient private lazy val keys: Array[Long] =
    second.eval(null).asInstanceOf[ArrayData].toLongArray()
  @transient private lazy val positions: Array[Long] =
    third.eval(null).asInstanceOf[ArrayData].toLongArray()

  override protected def nullSafeEval(idx: Any, k: Any, p: Any): Any = {
    val pos = java.util.Arrays.binarySearch(keys, idx.asInstanceOf[Long])
    if (pos < 0) null else positions(pos)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val keysRef = ctx.addReferenceObj("gatherKeys", keys, "long[]")
    val posRef  = ctx.addReferenceObj("gatherPositions", positions, "long[]")
    val idx     = first.genCode(ctx)
    val p       = ctx.freshName("p")
    ev.copy(code = idx.code +
      code"""
        boolean ${ev.isNull} = true;
        long ${ev.value} = -1L;
        if (!${idx.isNull}) {
          int $p = java.util.Arrays.binarySearch($keysRef, ${idx.value});
          if ($p >= 0) { ${ev.isNull} = false; ${ev.value} = $posRef[$p]; }
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): GatherLookup =
    copy(first = newFirst, second = newSecond, third = newThird)
}
