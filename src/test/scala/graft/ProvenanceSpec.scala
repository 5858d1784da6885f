package graft

import graft.functions.Provenance

class ProvenanceSpec extends SparkSpec {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged (hand-computed)") {
    val a = Seq((1L, "x"), (2L, "y"), (3L, "z")).toDF("doc_id", "text")
    val b = Seq((2L, "y"), (3L, "z2"), (4L, "w")).toDF("doc_id", "text")
    val got = Provenance.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    assert(got == Seq(
      (1L, "removed"), (2L, "unchanged"), (3L, "changed"), (4L, "added")))
  }

  test("snapshotChurn rolls the same statuses up per group") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("doc_id", "text")
    val b = Seq((1L, "x"), (2L, "y2"), (3L, "w")).toDF("doc_id", "text")
    val grp = Seq((1L, "s0"), (2L, "s0"), (3L, "s1")).toDF("doc_id", "grp")
    val got = Provenance.snapshotChurn(a, b, "doc_id", "text", grp)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == Seq(
      ("s0", "changed", 1L), ("s0", "unchanged", 1L), ("s1", "added", 1L)))
  }
}
