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
