package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorderKey interleaves bits (hand-computed Morton value)") {
    // p=0b101 owns even bit positions, q=0b011 owns odd:
    // z = p0<<0 + q0<<1 + p1<<2 + q1<<3 + p2<<4 = 1 + 2 + 0 + 8 + 16 = 27
    val z = Seq((5L, 3L)).toDF("p", "q")
      .select(Layout.zorderKey(Seq(col("p"), col("q")), 3))
      .collect()(0).getLong(0)
    assert(z == 27L)
  }

  test("zorderLayoutRanked handles signed + skewed-double columns (tight envelopes)") {
    // x: signed -2048..2047; y: heavily skewed double (id^3 scaled) — a
    // linear min/max split would put ~all rows in one y-cell; quantile
    // rank buckets keep the tiles balanced on both axes
    val n = 4096
    val data = spark.range(0, n).select(
      (col("id") - n / 2).cast("int").as("x"),
      (col("id") * col("id") * col("id")).cast("double").as("y"))
    val laid = Layout.zorderLayoutRanked(data, Seq("x", "y"), bits = 6, partitions = 16)
    assert(laid.count() == n)
    // measure spread in RANK space (quantiles of the skewed domain): each
    // partition must bound both columns' rank range well below full width
    val ranked = laid.select(
      ((col("x") + n / 2) * 64 / n).cast("long").as("rx"),
      percent_rank().over(org.apache.spark.sql.expressions.Window.orderBy(col("y")))
        .multiply(63).cast("long").as("ry"),
      spark_partition_id().as("part"))
    val spreads = ranked.groupBy("part")
      .agg((max(col("rx")) - min(col("rx"))).as("sx"),
        (max(col("ry")) - min(col("ry"))).as("sy"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val (avgX, avgY) = (spreads.map(_._1).sum / spreads.length.toDouble,
      spreads.map(_._2).sum / spreads.length.toDouble)
    assert(avgX <= 24 && avgY <= 24,
      s"ranked z-order envelopes too loose: avg x-spread $avgX, y-rank-spread $avgY")
  }

  test("rankBuckets maps strings order-preservingly into bucket space") {
    val words = Seq("apple", "banana", "cherry", "date", "elderberry", "fig",
      "grape", "honeydew").zipWithIndex.map { case (w, i) => (w, i.toLong) }
    val df = words.toDF("w", "i")
    val ranked = df.select(col("w"), col("i"),
      Layout.rankBuckets(df, Seq("w"), bits = 3).head.as("r"))
      .orderBy("i").collect().map(r => r.getLong(2))
    // order-preserving: rank sequence must be non-decreasing in word order
    assert(ranked.sliding(2).forall(p => p(0) <= p(1)),
      s"string ranks not monotone: ${ranked.mkString(",")}")
    assert(ranked.distinct.length >= 6, "8 distinct words should spread over buckets")
  }

  test("zorderLayout gives every partition a tight envelope on BOTH columns") {
    val grid = spark.range(0, 64 * 64).select(
      (col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val laid = Layout.zorderLayout(grid, Seq("x", "y"), bits = 6, partitions = 16)
    val spreads = laid
      .withColumn("part", spark_partition_id())
      .groupBy("part")
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // a single-column sort would leave the other column at full 0..63
    // spread in every partition; z-order bounds both. 16 partitions of a
    // 64x64 grid are 16x16-ish tiles (+1 slack for range-boundary rows).
    val (avgX, avgY) = (spreads.map(_._1).sum / spreads.length.toDouble,
      spreads.map(_._2).sum / spreads.length.toDouble)
    assert(avgX <= 24 && avgY <= 24,
      s"z-order envelopes too loose: avg x-spread $avgX, y-spread $avgY")
  }
}
