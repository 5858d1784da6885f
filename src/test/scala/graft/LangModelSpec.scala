package graft

import graft.functions.LangModel

/** Corpus-trained bigram-LM scoring (the CCNet perplexity filter):
  * closed-form cross-entropy on a hand-computable corpus, tercile bucket
  * boundaries, and the indexing edge cases.
  */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("cross-entropy matches the closed-form add-one-smoothed bigram LM") {
    // bigrams: d1/d2 = "a b" (x2 in the corpus), d3 = "a c" (x1);
    // contexts: only "a" (n1 = 3), V = 1
    // p(b|a) = (2+1)/(3+1), p(c|a) = (1+1)/(3+1)
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = LangModel.crossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    CacheScope.release()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) === ((1L, r6(-math.log(3.0 / 4)))))
    assert(got(2L) === ((1L, r6(-math.log(3.0 / 4)))))
    assert(got(3L) === ((1L, r6(-math.log(2.0 / 4)))))
  }

  test("multi-bigram doc averages nll over positions; 1-token docs emit nothing") {
    // d1 = "a a b": bigrams "a a", "a b"; d2 = "a b"; d9 = "solo" (no row)
    // c2: "a a"->1, "a b"->2; c1: a->3; V=1
    val docs = Seq((1L, "a a b"), (2L, "a b"), (9L, "solo")).toDF("doc_id", "text")
    val got = LangModel.crossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    CacheScope.release()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val nllAA = -math.log(2.0 / 4) // (1+1)/(3+1)
    val nllAB = -math.log(3.0 / 4) // (2+1)/(3+1)
    assert(!got.contains(9L))
    assert(got(1L) === ((2L, r6((nllAA + nllAB) / 2))))
    assert(got(2L) === ((1L, r6(nllAB))))
  }

  test("tercile buckets: head = lowest entropy, comparisons on the 6-dp grid") {
    // entropies: two at ln(4/3) ~ 0.2877, one at ln 2 ~ 0.6931
    // t1 = 0.287682 (interpolating between two equal grid values),
    // t2 ~ 0.4228 (strictly between grid values) -> buckets head/head/tail
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val got = LangModel.perplexityBuckets(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    CacheScope.release()
    assert(got === Map(1L -> "head", 2L -> "head", 3L -> "tail"))
  }
}
