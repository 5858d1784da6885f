package graft.plans

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst probe for the bloom-prefiltered semi-join
  * (`JoinStrategies.bloomSemiJoin`): `bloom_might_contain(filterBytes, key)`.
  *
  * Why a custom Expression: the probe sits on the FULL fact scan — the one
  * place the operator exists to cheapen — and the previous Scala-UDF probe
  * forced per-row serialization out of Tungsten rows and broke the
  * whole-stage-codegen span over every fact row. This expression keeps the
  * scan inside one codegen'd loop: the filter's serialized bytes ride the
  * plan as a foldable binary literal (the same shape Spark's own AQE
  * runtime filter uses: `InjectRuntimeFilter` rewrites to an internal
  * `BloomFilterMightContain` over a serialized-sketch subquery result),
  * are deserialized ONCE per expression instance — never per row — and
  * the generated code calls `mightContainLong`/`mightContainBinary`
  * directly on the reference object.
  *
  * Key contract matches how `DataFrameStatFunctions.bloomFilter` inserted
  * the keys: integral keys were put as longs (probe `mightContainLong` on
  * the caller's `cast("long")`), string keys as their UTF-8 bytes (probe
  * `mightContainBinary(utf8.getBytes)` — identical to `mightContainString`
  * without re-encoding through java.lang.String). A null key returns null
  * (filtered out — a null can't equi-join anyway).
  */
case class BloomMightContain(bloomBytes: Expression, key: Expression)
    extends BinaryExpression {

  override def left: Expression  = bloomBytes
  override def right: Expression = key

  override def checkInputDataTypes(): TypeCheckResult =
    if (bloomBytes.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects binary filter bytes, got ${bloomBytes.dataType.simpleString}")
    else if (!bloomBytes.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bloom_might_contain filter bytes must be a constant (the serialized filter)")
    else key.dataType match {
      case LongType | StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects a bigint or string key, got ${t.simpleString}")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean  = key.nullable
  override def prettyName: String = "bloom_might_contain"

  // deserialized once per expression instance (driver side for codegen
  // reference capture; lazily on executors for interpreted eval) — the
  // bytes child is foldable by contract so eval(null) is legal here
  @transient private lazy val filter: BloomFilter = {
    val b = bloomBytes.eval(null).asInstanceOf[Array[Byte]]
    require(b != null, "bloom_might_contain: filter bytes are null")
    BloomFilter.readFrom(new ByteArrayInputStream(b))
  }

  override def eval(input: InternalRow): Any = {
    val v = key.eval(input)
    if (v == null) null
    else v match {
      case l: Long       => filter.mightContainLong(l)
      case s: UTF8String => filter.mightContainBinary(s.getBytes)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("graftBloomFilter", filter,
      classOf[BloomFilter].getName)
    val keyGen = key.genCode(ctx)
    val probe = key.dataType match {
      case LongType   => s"$bf.mightContainLong(${keyGen.value})"
      case StringType => s"$bf.mightContainBinary(${keyGen.value}.getBytes())"
    }
    ev.copy(code =
      code"""
        ${keyGen.code}
        boolean ${ev.isNull} = ${keyGen.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) { ${ev.value} = $probe; }
      """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(bloomBytes = newLeft, key = newRight)
}
