package graft

import org.apache.spark.sql.functions._

import graft.functions.Dsir

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // target exemplars: fruit vocabulary
    (0L, "apple banana cherry apple banana", "tgt"),
    (1L, "banana cherry apple cherry", "tgt"),
    // raw pool: one fruit-like doc, one off-domain, one single-token
    (2L, "apple banana apple banana cherry", "raw"),
    (3L, "gearbox piston crankshaft flywheel torque", "raw"),
    (4L, "apple", "raw")
  ).toDF("doc_id", "text", "kind")

  test("importance weights rank target-like raw docs above off-domain ones") {
    val w = Dsir.importanceWeights(corpus, "doc_id", "text",
        col("kind") === "tgt", b = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    CacheScope.release()
    assert(w.keySet == Set(2L, 3L, 4L)) // only the raw pool is scored
    assert(w(2L) > w(3L)) // fruit doc beats the gearbox doc
    assert(w(2L) > 0 && w(3L) < 0) // in-domain up-weighted, off-domain down
  }

  test("single-token docs produce zero bigrams (no descending-sequence walk)") {
    val f = Dsir.featureBuckets(
        Seq((9L, "solo")).toDF("doc_id", "text"), "doc_id", "text", 16)
      .collect()
    assert(f.length == 1) // the unigram only
  }

  test("weights and gumbel sample are bit-identical across input partitionings") {
    def run(parts: Int) = {
      val w = Dsir.importanceWeights(corpus.repartition(parts), "doc_id", "text",
        col("kind") === "tgt", b = 64)
      val out = Dsir.gumbelTopN(w, "doc_id", n = 2)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
      CacheScope.release()
      out
    }
    val base = run(1)
    assert(base.length == 2 && base == run(5) && base == run(32))
  }
}
