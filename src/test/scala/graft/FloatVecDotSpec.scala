package graft

import org.apache.spark.sql.functions._
import graft.functions.Similarity

/** The custom Catalyst expression must agree exactly with the
  * expression-fold definition (which in turn matches the DuckDB
  * list_inner_product oracle) — and be callable from SQL via the
  * session-extension registration.
  */
class FloatVecDotSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (2L, Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.25f)),
    (3L, Array.tabulate(64)(i => (i * 0.37f - 11f) / 7f),
      Array.tabulate(64)(i => (i * 0.91f - 29f) / 13f))
  ).toDF("id", "a", "b")

  test("vec_dot equals the ordered-fold definition bit-for-bit") {
    val rows = vecs.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotFold(col("a"), col("b")).as("fold")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("vec_dot is registered as a SQL function") {
    vecs.createOrReplaceTempView("vdv")
    val got = spark.sql("SELECT id, vec_dot(a, b) AS d FROM vdv ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length == 3)
    assert(math.abs(got.head._2 - 32.0) < 1e-9) // 1*4 + 2*5 + 3*6
  }

  test("null input yields null") {
    val df = Seq((Option(Array(1.0f)), Option.empty[Array[Float]]))
      .toDF("a", "b")
    assert(df.select(Similarity.dot(col("a"), col("b"))).collect().head.isNullAt(0))
  }

  test("unequal lengths and null elements yield null, matching the fold") {
    val df = Seq(
      (1L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](1.0f)),
      (2L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f)))
      .toDF("id", "a", "b")
    val rows = df.select(
      Similarity.dot(col("a"), col("b")).as("native"),
      Similarity.dotFold(col("a"), col("b")).as("fold")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(0), "vec_dot should be null")
      assert(r.isNullAt(1), "fold should be null")
    }
  }

  // non-foldable float arrays off range(): literal inputs would constant-
  // fold the whole expression before any optimizer rule could see it
  private def rangedPair = spark.range(1, 2).select(
    array(col("id").cast("float"), lit(2f), lit(3f)).as("a"),
    array(lit(4f), lit(5f), lit(6f)).as("b"))

  test("optimizer rewrites the HOF dot fold on float arrays into vec_dot") {
    val q = rangedPair.select(Similarity.dotFold(col("a"), col("b")).as("d"))
    assert(q.queryExecution.optimizedPlan.toString.contains("vec_dot"),
      "FoldToVecDot should replace the aggregate(zip_with(...)) pattern")
    assert(q.collect()(0).getDouble(0) == 32.0)
  }

  test("optimizer rewrites the HOF sqdist fold into vec_sqdist (float AND double arrays)") {
    // float arrays: the lambda keeps its explicit widening casts
    val qf = rangedPair.select(Similarity.sqDistFold(col("a"), col("b")).as("d"))
    assert(qf.queryExecution.optimizedPlan.toString.contains("vec_sqdist"),
      "FoldToVecDot should replace the sqdist aggregate(zip_with(...)) pattern on floats")
    assert(qf.collect()(0).getDouble(0) == 27.0) // 9 + 9 + 9
    // double arrays: SimplifyCasts elides the casts first — the rule still fires
    val dd = spark.range(1, 2).select(
      array(col("id").cast("double"), lit(2.0)).as("a"),
      array(lit(3.0), lit(4.0)).as("b"))
    val qd = dd.select(Similarity.sqDistFold(col("a"), col("b")).as("d"))
    assert(qd.queryExecution.optimizedPlan.toString.contains("vec_sqdist"),
      "FoldToVecDot should replace the sqdist fold on doubles too")
    assert(qd.collect()(0).getDouble(0) == 8.0) // 4 + 4
  }

  test("rewritten sqdist fold is bit-identical to the fold, incl. null cases") {
    val rows = vecs.select(
      Similarity.sqDist(transform(col("a"), _.cast("double")),
        transform(col("b"), _.cast("double"))).as("native"),
      Similarity.sqDistFold(col("a"), col("b")).as("fold")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    val nulls = Seq(
      (1L, Array[java.lang.Float](1.0f, 2.0f), Array[java.lang.Float](1.0f)),
      (2L, Array[java.lang.Float](1.0f, null), Array[java.lang.Float](1.0f, 2.0f)))
      .toDF("id", "a", "b")
      .select(Similarity.sqDistFold(col("a"), col("b")).as("d")).collect()
    nulls.foreach(r => assert(r.isNullAt(0), "sqdist fold on malformed input should be null"))
  }

  test("the rewrite leaves non-float folds and other zeros untouched") {
    val dd = spark.range(1, 2).select(
      array(col("id").cast("double"), lit(2.0)).as("a"),
      array(lit(3.0), lit(4.0)).as("b"))
    val q1 = dd.select(Similarity.dotFold(col("a"), col("b")).as("d"))
    assert(!q1.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(q1.collect()(0).getDouble(0) == 11.0)
    // float arrays but a different seed: still the fold
    val q2 = rangedPair.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x.cast("double") * y.cast("double")),
      lit(1.0), (acc, v) => acc + v).as("d"))
    assert(!q2.queryExecution.optimizedPlan.toString.contains("vec_dot"))
    assert(q2.collect()(0).getDouble(0) == 33.0)
  }
}
