package graft

import org.apache.spark.sql.functions._

import graft.functions.CountMin

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(77)
  private val vocab = Seq("a", "b", "c", "d", "e", "f", "g", "h")

  test("estimates never under-count and are exact without collisions") {
    val items = Seq.fill(500)(vocab(rnd.nextInt(vocab.size))).toDF("token")
    val truth = items.groupBy("token").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // w=2: collisions certain, estimates must only over-count
    val tight = CountMin.estimate(
      CountMin.sketch(items, "token", d = 3, w = 2),
      vocab.toDF("token"), "token", d = 3, w = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vocab.foreach(t => assert(tight(t) >= truth.getOrElse(t, 0L), s"under-count for $t"))
    // w=4096 over 8 tokens: collisions vanish, estimates are exact
    val wide = CountMin.estimate(
      CountMin.sketch(items, "token", d = 3, w = 4096),
      (vocab :+ "absent").toDF("token"), "token", d = 3, w = 4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vocab.foreach(t => assert(wide(t) == truth(t)))
    assert(wide("absent") == 0L)
  }

  test("sketch is mergeable: cell-wise SUM of shard sketches equals the whole-corpus sketch") {
    val items = Seq.fill(300)(vocab(rnd.nextInt(vocab.size))).zipWithIndex
      .map { case (t, i) => (t, i % 2) }.toDF("token", "shard")
    val whole = CountMin.sketch(items, "token", d = 2, w = 16)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = Seq(0, 1).map(s =>
        CountMin.sketch(items.filter(col("shard") === s), "token", d = 2, w = 16))
      .reduce(_ unionByName _)
      .groupBy("r", "c").agg(sum("cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == whole)
  }
}
