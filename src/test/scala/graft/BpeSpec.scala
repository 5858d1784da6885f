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

  test("local and distributed induction produce identical merges") {
    val docs = Seq("low low low", "lower lower", "newest newest", "wide wider",
      "er er er low", "estest").toDF("text")
    val local = Bpe.induceMerges(docs, "text", 6) // vocab far under default cap
    val dist  = Bpe.induceMerges(docs, "text", 6, maxLocalVocab = 0)
    assert(local == dist)
  }

  test("supplementary characters stay whole symbols (code points, not UTF-16 units)") {
    // U+1F600 GRINNING FACE is a surrogate pair in UTF-16; repeated next to
    // 'a' so the (emoji, a) pair wins a merge — the merged symbol must be
    // the full emoji + 'a', never an unpaired half-surrogate
    val e = new String(Character.toChars(0x1F600))
    assert(Bpe.codePointSyms(s"${e}a") == Seq(e, "a"))
    val docs = Seq(s"${e}a ${e}a ${e}a").toDF("text")
    val got = Bpe.induceMerges(docs, "text", 1)
    assert(got == Seq(Bpe.Merge(1, e, "a", 3L)))
  }

  test("utf8Lt tie-break matches Spark's UTF8String binary order") {
    // U+FFFD (efbfbd in UTF-8) vs U+10400 (f0909080): UTF-16 code-unit
    // order says U+10400 < U+FFFD (high surrogate 0xD801 < 0xFFFD) but
    // UTF-8 binary order says the opposite — pin the Spark-matching choice
    val bmp = "�"
    val supp = new String(Character.toChars(0x10400))
    assert(supp.compareTo(bmp) < 0)    // UTF-16 order (what we must NOT use)
    assert(Bpe.utf8Lt(bmp, supp))      // UTF-8 binary order (what Spark uses)
    assert(!Bpe.utf8Lt(supp, bmp))
    assert(Bpe.utf8Lt("a", "ab") && !Bpe.utf8Lt("ab", "a") && !Bpe.utf8Lt("a", "a"))
  }

  test("encodeExpr matches the sequential applyMerge model word by word") {
    import org.apache.spark.sql.functions.col
    // the U+2028 line separator is NOT \s, so it stays inside a token and
    // must survive encode as its own symbol (DOTALL code-point split)
    val texts = Seq("low lower lowest", "newer newest new", "low new low", "",
      "a\u2028b low")
    val docs  = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Bpe.induceMerges(docs, "text", 5)
    val got = docs.orderBy("doc_id")
      .select(Bpe.encodeExpr(col("text"), merges))
      .collect().map(_.getString(0)).toSeq
    val want = texts.map(_.trim.split("\\s+").toSeq.map { w =>
      val syms = merges.sortBy(_.rank).foldLeft(Bpe.codePointSyms(w)) { (ss, m) =>
        Bpe.applyMerge(ss, m.left, m.right)
      }
      syms.map(sym => Bpe.L + sym + Bpe.R).mkString
    }.mkString(" "))
    assert(got == want)
    // symbol counts ride the same string
    val counts = docs.orderBy("doc_id")
      .select(Bpe.symbolCount(Bpe.encodeExpr(col("text"), merges)))
      .collect().map(_.getLong(0)).toSeq
    assert(counts == want.map(_.count(_ == Bpe.R.charAt(0)).toLong))
  }
}
