package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the text hot path: the polynomial
  * rolling hash `acc = (acc*31 + codePoint) mod (2^31-1)` over a string.
  *
  * Replaces the `aggregate(transform(split(text, "")))` HOF pipeline,
  * which allocates a per-character array and runs interpreted lambda
  * machinery per element; this is one fused loop inside whole-stage
  * codegen. Iterates Unicode CODE POINTS — identical to the DuckDB
  * oracle's per-character `ascii()` fold (DuckDB characters are code
  * points), and to the HOF formulation on ASCII/BMP text.
  *
  * Used by TextFunctions.rollingHash (doc fingerprints, the stratified
  * sampling key) and the winnowing token hashes.
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects a string argument, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PolyHash.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** static hot loop — called directly from generated code */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }
}
