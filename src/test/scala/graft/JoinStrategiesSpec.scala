package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.JoinStrategies

/** Plan + parity pins for the join-layout operators: bucketed co-location
  * must join without an exchange; salting must preserve join results while
  * splitting the hot key across sub-partitions.
  */
class JoinStrategiesSpec extends SparkSpec {
  import spark.implicits._

  private def seqDf(n: Int, valName: String, f: Long => Long): DataFrame =
    (0 until n).map(i => (i.toLong % 4, i.toLong / 4, f(i.toLong)))
      .toDF("streamId", "index", valName)

  test("aligned bucketed tables positional-join with ZERO exchanges") {
    val a = s"graft_aligned_a_${System.nanoTime()}"
    val b = s"graft_aligned_b_${System.nanoTime()}"
    val bcKey = "spark.sql.autoBroadcastJoinThreshold"
    val bcOld = spark.conf.get(bcKey)
    try {
      // force the sort-merge path (at real scale both sides are far over
      // the broadcast threshold) so bucket co-location is observable
      spark.conf.set(bcKey, "-1")
      JoinStrategies.writeAligned(seqDf(400, "va", _ * 3), a, buckets = 8)
      JoinStrategies.writeAligned(seqDf(400, "vb", _ + 7), b, buckets = 8)
      val j = JoinStrategies.positionalJoinAligned(spark, Seq(a, b))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed positional join must be shuffle-free, got:\n$plan")
      assert(plan.contains("SortMergeJoin"))
      val rows = j.collect()
      assert(rows.length == 400)
      rows.foreach { r =>
        val i = r.getAs[Long]("streamId") + r.getAs[Long]("index") * 4
        // (streamId, index) = (i%4, i/4) -> va = 3i, vb = i+7
        assert(r.getAs[Long]("va") == 3 * i && r.getAs[Long]("vb") == i + 7)
      }
    } finally {
      spark.conf.set(bcKey, bcOld)
      spark.sql(s"DROP TABLE IF EXISTS $a")
      spark.sql(s"DROP TABLE IF EXISTS $b")
    }
  }

  test("aligned join disambiguates colliding payload columns with a table prefix") {
    val a = s"graft_pay_a_${System.nanoTime()}"
    val b = s"graft_pay_b_${System.nanoTime()}"
    try {
      // both tables carry the model's standard column name `payload`
      JoinStrategies.writeAligned(seqDf(40, "payload", _ * 2), a, buckets = 4)
      JoinStrategies.writeAligned(seqDf(40, "payload", _ + 1), b, buckets = 4)
      val j = JoinStrategies.positionalJoinAligned(spark, Seq(a, b))
      assert(j.columns.toSet == Set("streamId", "index", s"${a}_payload", s"${b}_payload"))
      // downstream single-column select works (would be AMBIGUOUS otherwise)
      assert(j.select(s"${a}_payload").count() == 40)
    } finally {
      spark.sql(s"DROP TABLE IF EXISTS $a")
      spark.sql(s"DROP TABLE IF EXISTS $b")
    }
  }

  test("saltedJoin rejects a reserved __salt column instead of clobbering it") {
    val big   = Seq((0L, 1L)).toDF("streamId", "__salt")
    val small = Seq((0L, "x")).toDF("streamId", "label")
    val e = intercept[IllegalArgumentException] {
      JoinStrategies.saltedJoin(big, small, Seq("streamId"), salt = 4)
    }
    assert(e.getMessage.contains("__salt"))
  }

  test("salted join: identical results to the plain join; salt reaches the join keys") {
    // skew: 90% of the big side lands on streamId 0
    val big = (0 until 2000).map { i =>
      val sid = if (i % 10 == 0) (i / 10) % 4 + 1 else 0L
      (sid.toLong, i.toLong, i.toLong * 2)
    }.toDF("streamId", "id", "v")
    val small = (0L until 5L).map(sid => (sid, s"dim_$sid")).toDF("streamId", "label")
    val plain  = big.join(small, Seq("streamId"))
    val salted = JoinStrategies.saltedJoin(big, small, Seq("streamId"), salt = 8)
    def canon(df: DataFrame) = df.select("streamId", "id", "v", "label")
      .collect().map(_.toSeq).sortBy(_.mkString(",")).toSeq
    assert(canon(salted) == canon(plain))
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), "join must key on the salt column")
  }

  test("bloomSemiJoin equals the plain semi-join and prefilters the fact side") {
    val big   = spark.range(0, 10000).toDF("k")
    val keyed = spark.range(0, 10000).filter(col("id") % 100 === 0).toDF("j")
    val got = JoinStrategies.bloomSemiJoin(big, keyed, "k", "j", expectedKeys = 200L)
      .collect().map(_.getLong(0)).sorted.toSeq
    val exact = big.join(keyed, col("k") === col("j"), "left_semi")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == exact) // no false negatives, false positives cleared
    // the bloom pass alone must reject the vast majority of non-matching rows
    val bf = keyed.stat.bloomFilter("j", 200L, 0.01)
    val passed = (0L until 10000L).count(bf.mightContainLong)
    assert(passed >= 100 && passed < 400,
      s"bloom prefilter should pass ~matches + fpp, passed $passed of 10000")
  }

  test("bloomSemiJoin probes string keys as strings (not a silent long cast)") {
    val big   = spark.range(0, 2000).select(concat(lit("user-"), col("id")).as("k"))
    val keyed = spark.range(0, 2000).filter(col("id") % 40 === 0)
      .select(concat(lit("user-"), col("id")).as("j"))
    val got = JoinStrategies.bloomSemiJoin(big, keyed, "k", "j", expectedKeys = 100L)
      .collect().map(_.getString(0)).sorted.toSeq
    val exact = big.join(keyed, col("k") === col("j"), "left_semi")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(got == exact && got.size == 50)
  }

  test("bucketedRangeJoin: half-open containment, multi-bucket spans, negatives (hand-computed)") {
    import spark.implicits._
    // bucketWidth 10. Intervals: A=[5,25) spans buckets 0-2; B=[20,30)
    // spans 2; C=[-15,-5) spans buckets -2..-1 (floor, not truncate-to-
    // zero); D=[40,40) is empty and must vanish.
    val points = Seq(5L, 24L, 25L, 20L, 29L, 30L, -15L, -6L, -5L, 0L)
      .toDF("p")
    val ivals = Seq(("A", 5L, 25L), ("B", 20L, 30L), ("C", -15L, -5L),
      ("D", 40L, 40L)).toDF("iv", "s", "e")
    val got = JoinStrategies.bucketedRangeJoin(points, ivals, "p", "s", "e", 10L)
      .select(col("iv"), col("p")).collect()
      .map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    assert(got == Seq(
      ("A", 5L), ("A", 20L), ("A", 24L),           // 25 excluded (half-open)
      ("B", 20L), ("B", 24L), ("B", 25L), ("B", 29L), // 30 excluded
      ("C", -15L), ("C", -6L)))                     // -5 excluded; D gone
  }

  test("bucketedRangeJoin matches the naive theta join and plans no nested loop") {
    import spark.implicits._
    val points = spark.range(0, 2000).select((col("id") * 7 % 1000).as("p"))
    val ivals = spark.range(0, 40).select(
      col("id").as("iv"), (col("id") * 25).as("s"), (col("id") * 25 + 60).as("e"))
    val bucketed = JoinStrategies.bucketedRangeJoin(points, ivals, "p", "s", "e", 50L)
    val got = bucketed.groupBy("iv").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val naive = points.join(ivals, col("p") >= col("s") && col("p") < col("e"))
      .groupBy("iv").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == naive)
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"bucketed rewrite must stay an equi-join:\n$plan")
  }

  test("bloomSemiJoin rejects unsupported key types loudly") {
    val big   = spark.range(0, 5).select((col("id") * 1.5).as("k"))
    val keyed = spark.range(0, 5).select((col("id") * 1.5).as("j"))
    val ex = intercept[IllegalArgumentException] {
      JoinStrategies.bloomSemiJoin(big, keyed, "k", "j")
    }
    assert(ex.getMessage.contains("integral or string"))
  }
}
