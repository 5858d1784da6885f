package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("kmeansCentroids: Lloyd rounds converge to the hand-computed means") {
    // init = ids < k: c0=(0,0), c1=(10,10); two obvious blobs
    val pts = Seq(
      (0L, Seq(0f, 0f)), (1L, Seq(10f, 10f)),
      (2L, Seq(1f, 0f)), (3L, Seq(0f, 1f)),
      (4L, Seq(9f, 10f)), (5L, Seq(10f, 9f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansCentroids(pts, "vec_id", "embedding", k = 2, iters = 3)
      .orderBy("cid", "pos")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    val third = 0.333333 // round(1/3, 6) — exact-decimal mean then 6 dp
    assert(got == Seq(
      (0L, 0L, third, 3L), (0L, 1L, third, 3L),
      (1L, 0L, 10 - third, 3L), (1L, 1L, 10 - third, 3L)))
  }

  test("kmeansCentroids is invariant to input partitioning (exact decimal means)") {
    val rnd = new scala.util.Random(7)
    val pts = (0L until 200L).map(i =>
      (i, Seq.fill(8)(rnd.nextFloat() * 4 - 2)))
    def run(parts: Int) = {
      val df = spark.createDataFrame(pts).toDF("vec_id", "embedding")
        .repartition(parts)
      Similarity.kmeansCentroids(df, "vec_id", "embedding", k = 4, iters = 3)
        .orderBy("cid", "pos")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
        .toSeq
    }
    // bit-identical across 1, 7, and 32 partitions: the DECIMAL sums make
    // the means independent of partition/merge order, which is exactly
    // what the cross-engine oracle hash relies on
    val one = run(1)
    assert(one == run(7) && one == run(32))
  }

  test("kmeansCentroids: assignment ties break to the smaller centroid id") {
    // point 2 is equidistant from both centroids -> joins cid 0
    val pts = Seq(
      (0L, Seq(0f)), (1L, Seq(2f)), (2L, Seq(1f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kmeansCentroids(pts, "vec_id", "embedding", k = 2, iters = 1)
      .select("cid", "cval", "n")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(got == Seq((0L, 0.5, 2L), (1L, 2.0, 1L)))
  }
}
