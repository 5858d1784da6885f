package graft

import graft.functions.NaiveBayes

class NaiveBayesSpec extends SparkSpec {
  import spark.implicits._

  // Hand corpus: class A is "cat"-heavy, class B is "dog"-heavy; the held-in
  // docs must classify back to their own class, and the math below is small
  // enough to replay by hand.
  private val corpus = Seq(
    (1L, "cat cat fish", "A"),
    (2L, "cat cat cat", "A"),
    (3L, "dog dog bird", "B"),
    (4L, "dog bird bird", "B")
  ).toDF("doc_id", "text", "cls")

  test("trainScorePredict recovers the generating class on a separable corpus") {
    val out = NaiveBayes.trainScorePredict(corpus, "doc_id", "text", "cls")
      .orderBy("doc_id").collect()
    CacheScope.release()
    assert(out.map(r => r.getLong(0) -> r.getString(1)).toSeq ==
      Seq(1L -> "A", 2L -> "A", 3L -> "B", 4L -> "B"))
  }

  test("score matches the closed-form NB log-likelihood") {
    // Model: V=4 (cat,fish,dog,bird); A: cat=5,fish=1,totA=6; B: dog=3,bird=3,totB=6
    // Doc 1 = [cat,cat,fish], prior=0.5, nd=3:
    //   score(A) = ln(.5) - 3 ln(6+4) + 2 ln(5+1) + 1 ln(1+1)
    val expected = math.log(0.5) - 3 * math.log(10) + 2 * math.log(6) + math.log(2)
    val got = NaiveBayes.trainScorePredict(corpus, "doc_id", "text", "cls")
      .filter($"doc_id" === 1L).collect()(0).getDouble(2)
    CacheScope.release()
    assert(math.abs(got - BigDecimal(expected).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("argmax ties break toward the lexicographically smallest class") {
    // Perfectly symmetric corpus: every doc scores identically under both
    // classes, so every prediction must be the smaller class name.
    val sym = Seq(
      (1L, "x y", "A"), (2L, "x y", "B")
    ).toDF("doc_id", "text", "cls")
    val preds = NaiveBayes.trainScorePredict(sym, "doc_id", "text", "cls")
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    CacheScope.release()
    assert(preds == Seq("A", "A"))
  }
}
