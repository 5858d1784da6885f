package graft

import graft.functions.Bpe

/** BPE merge induction against the hand-computed classic example
  * (low/lower/newest — the Sennrich-style walkthrough corpus).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("greedy merge application is left-to-right, non-overlapping") {
    assert(Bpe.applyMerge(Seq("a", "a", "a"), "a", "a") == Seq("aa", "a"))
    assert(Bpe.applyMerge(Seq("l", "o", "w"), "l", "o") == Seq("lo", "w"))
    assert(Bpe.applyMerge(Seq("x"), "a", "b") == Seq("x"))
    assert(Bpe.applyMerge(Seq("a", "b", "a", "b"), "a", "b") == Seq("ab", "ab"))
  }

  test("induceMerges reproduces the hand-computed merge sequence with deterministic ties") {
    // words: low x3, lower x2, newest x1
    // round 1 pair counts: (l,o)=5 (o,w)=5 (w,e)=3 (e,r)=2 rest 1
    //   -> tie at 5 broken lexicographically: (l,o)
    // round 2: (lo,w)=5 beats (w,e)=3 -> (lo,w)
    // round 3: (low,e)=2 (e,r)=2 tie -> "e" < "low": (e,r)
    // round 4: (low,er)=2 -> (low,er)
    val docs = Seq("low low low", "lower lower", "newest").toDF("text")
    val got = Bpe.induceMerges(docs, "text", 4)
      .map(m => (m.rank, m.left, m.right, m.count))
    assert(got == Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "e", "r", 2L), (4, "low", "er", 2L)))
  }

  test("induceMerges stops early when no pairs remain") {
    val docs = Seq("a b", "c").toDF("text") // single-char words only
    assert(Bpe.induceMerges(docs, "text", 5).isEmpty)
  }
}
