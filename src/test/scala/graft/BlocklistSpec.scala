package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Blocklist

/** Aho-Corasick correctness pins: the automaton must agree with naive
  * per-phrase `contains` on randomized text (including overlapping
  * phrases and phrases that are suffixes of other phrases — the output-
  * merge cases a broken fail-link construction gets wrong).
  */
class BlocklistSpec extends AnyFunSuite {

  test("automaton agrees with naive contains on randomized text") {
    val phrases = Seq("ab", "abc", "bc", "c", "abcd", "dab", "aa")
    val ac = Blocklist.build(phrases)
    val r = new scala.util.Random(7)
    (0 until 500).foreach { _ =>
      val text = (0 until r.nextInt(40)).map(_ => "abcd".charAt(r.nextInt(4))).mkString
      val got = ac.hits(text).map(ac.phrases).toSet
      val want = phrases.filter(text.contains).toSet
      assert(got == want, s"text='$text'")
    }
  }

  test("suffix outputs surface: matching 'abcd' must also report bc, c, abc") {
    val ac = Blocklist.build(Seq("abcd", "bc", "c", "abc"))
    assert(ac.hits("xabcdx").map(ac.phrases).toSet == Set("abcd", "bc", "c", "abc"))
  }

  test("non-ASCII input resets the automaton rather than corrupting state") {
    val ac = Blocklist.build(Seq("ab"))
    assert(ac.hits("aéb").isEmpty) // é breaks the run
    assert(ac.hits("éab").map(ac.phrases).toSeq == Seq("ab"))
  }

  test("build refuses empty and non-ASCII phrases loudly") {
    intercept[IllegalArgumentException](Blocklist.build(Seq("")))
    intercept[IllegalArgumentException](Blocklist.build(Seq("café")))
    intercept[IllegalArgumentException](Blocklist.build(Nil))
  }

  test("matching cost is one pass: phrase count does not change the walk") {
    // structural pin: hits() touches each char once — verified indirectly
    // by matching a 10k-phrase list over a long text quickly and exactly
    val phrases = (0 until 10000).map(i => s"phrase$i xx")
    val ac = Blocklist.build(phrases :+ "needle")
    val text = ("filler " * 5000) + "needle" + (" filler" * 5000)
    val t0 = System.nanoTime()
    val got = ac.hits(text).map(ac.phrases).toSeq
    val ms = (System.nanoTime() - t0) / 1e6
    assert(got == Seq("needle"))
    assert(ms < 200, s"10k-phrase match took $ms ms — not scan-linear")
  }
}
