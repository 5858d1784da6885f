package graft

import graft.functions.Packing

/** Greedy first-fit sequence packing: the budget recurrence, its edge
  * cases, and shard/group isolation (the sf-scale oracle replay lives in
  * the txt_pack driver query's recursive-CTE oracle).
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def pack(rows: Seq[(Long, String, Long)], budget: Long, shards: Int = 1) =
    Packing.packSequences(rows.toDF("doc_id", "source", "n_tok"),
        "doc_id", "n_tok", "source", budget, shards)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"), r.getAs[Long]("pack_id")))
      .sortBy(t => (t._1, t._2)).toSeq

  test("greedy first-fit: new pack exactly when the budget would overflow") {
    // weights 3,3,3 under budget 7 -> packs 0,0,1; exact fill is NOT a split
    assert(pack(Seq((0L, "a", 3L), (1L, "a", 3L), (2L, "a", 3L)), budget = 7)
      .map(_._3) == Seq(0L, 0L, 1L))
    assert(pack(Seq((0L, "a", 4L), (1L, "a", 3L), (2L, "a", 1L)), budget = 7)
      .map(_._3) == Seq(0L, 0L, 1L))
  }

  test("an oversized row gets its own pack, never dropped") {
    val got = pack(Seq((0L, "a", 2L), (1L, "a", 99L), (2L, "a", 2L)), budget = 10)
    assert(got.map(_._3) == Seq(0L, 1L, 2L))
    // oversized FIRST row: pack 0, and the next row starts pack 1
    val first = pack(Seq((0L, "a", 99L), (1L, "a", 2L)), budget = 10)
    assert(first.map(_._3) == Seq(0L, 1L))
  }

  test("packs are independent per (group, shard); shard = order % shards") {
    val rows = (0L until 8L).map(i => (i, if (i < 4) "a" else "b", 5L))
    val got  = pack(rows, budget = 10, shards = 2)
    // each (group, shard) has 2 rows of weight 5 = one full pack 0
    assert(got.forall(_._3 == 0L))
    assert(got.map(_._2) == Seq(0L, 1L, 0L, 1L, 0L, 1L, 0L, 1L))
  }
}
