package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.PolyHash

class PolyHashSpec extends SparkSpec {
  import spark.implicits._

  private def model(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % 2147483647L
      i += Character.charCount(cp)
    }
    acc
  }

  test("poly_hash matches the sequential code-point model (incl. empty + supplementary)") {
    val inputs = Seq("", "a", "hello world", "a" * 500, "café", "😀x")
    val got = inputs.toDF("s")
      .select(call_function("poly_hash", col("s")))
      .collect().map(_.getLong(0)).toSeq
    assert(got == inputs.map(model))
  }

  test("poly_hash matches the legacy HOF fold on ASCII text") {
    val hof = aggregate(
      transform(split(col("s"), ""), ch => ascii(ch).cast("long")),
      lit(0L), (acc, c) => (acc * 31 + c) % 2147483647L)
    val rows = Seq("some plain ascii words", "x", "").toDF("s")
      .select(call_function("poly_hash", col("s")), hof)
      .collect()
    rows.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("null in, null out") {
    val r = Seq(Option.empty[String]).toDF("s")
      .select(call_function("poly_hash", col("s"))).collect()(0)
    assert(r.isNullAt(0))
  }

  test("interpreted eval agrees with codegen path") {
    assert(PolyHash.hash(UTF8String.fromString("abc")) == model("abc"))
  }
}
