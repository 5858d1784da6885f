package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** BPE merge induction — tokenizer training over a corpus: repeatedly
  * merge the most frequent adjacent symbol pair (byte-pair encoding,
  * Sennrich et al. 2016 style over whitespace-tokenized words).
  *
  * The scale shape: the CORPUS-sized work happens exactly once (the
  * word-frequency aggregation — one explode + map-side-combining count);
  * every merge round then iterates on the DISTINCT-WORD relation, which is
  * vocab-bounded — at 100 TB that is orders of magnitude smaller than the
  * corpus and the k driver-synchronized rounds each cost one small
  * aggregation + argmax, the same loop discipline as connected components.
  * Ties break deterministically (count desc, then pair lexicographic), so
  * induced merges are reproducible across runs and engines.
  */
object Bpe {

  /** one induced merge: rank (1-based), left & right symbol, weighted count */
  final case class Merge(rank: Int, left: String, right: String, count: Long)

  /** Split a word into one symbol per Unicode CODE POINT (not UTF-16 code
    * unit): supplementary characters (emoji, rare CJK) must stay whole, or
    * induced merges contain unpaired surrogate halves — standard BPE
    * operates on code points or bytes, never UTF-16 units.
    */
  private[graft] def codePointSyms(w: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** standard greedy left-to-right, non-overlapping application of one merge */
  private[graft] def applyMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Spark's string ordering is UTF-8 BINARY (UTF8String compares bytes
    * unsigned); Scala's String.compareTo is UTF-16 code-unit order. They
    * diverge for supplementary vs U+E000..U+FFFF characters, so the local
    * induction path compares UTF-8 bytes to tie-break EXACTLY like the
    * distributed `orderBy(cnt.desc, a, b)` it substitutes for.
    */
  private[graft] def utf8Lt(x: String, y: String): Boolean = {
    val a = x.getBytes("UTF-8"); val b = y.getBytes("UTF-8")
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    a.length < b.length
  }

  /** In-memory greedy induction over a collected word-frequency table —
    * identical output to the distributed loop (same argmax, same
    * count-desc / pair-UTF-8-binary tie-break), k rounds over a
    * vocab-bounded array instead of k driver-synchronized Spark jobs.
    */
  private[graft] def induceLocal(vocab: Array[(String, Long)], k: Int): Seq[Merge] = {
    var syms: Array[(Seq[String], Long)] =
      vocab.map { case (w, n) => (codePointSyms(w), n) }
    val merges = Seq.newBuilder[Merge]
    var round = 1
    var continue = true
    while (round <= k && continue) {
      val counts = new java.util.HashMap[(String, String), Long]()
      syms.foreach { case (ss, n) =>
        var i = 0
        while (i + 1 < ss.length) {
          counts.merge((ss(i), ss(i + 1)), n, (x, y) => x + y)
          i += 1
        }
      }
      if (counts.isEmpty) continue = false
      else {
        var best: ((String, String), Long) = null
        counts.forEach { (p, c) =>
          if (best == null || c > best._2 ||
              (c == best._2 && (utf8Lt(p._1, best._1._1) ||
                (p._1 == best._1._1 && utf8Lt(p._2, best._1._2)))))
            best = (p, c)
        }
        val ((a, b), cnt) = best
        merges += Merge(round, a, b, cnt)
        syms = syms.map { case (ss, n) => (applyMerge(ss, a, b), n) }
        round += 1
      }
    }
    merges.result()
  }

  /** sentinel brackets for [[encodeExpr]]'s symbol representation — must
    * not occur in corpus text (control chars; enforce upstream if needed)
    */
  private[graft] val L = "\u0001"
  private[graft] val R = "\u0002"

  /** Apply an induced merge table to every whitespace word of a text
    * column — tokenizer ENCODE, the inference half of [[induceMerges]].
    * The merge table is vocab-bounded (k entries), so it ships as literals
    * inside one codegen'd expression chain: each word becomes its code
    * points wrapped in sentinel brackets (symbol x -> Lx R), and each
    * merge in rank order is one `replace` of "L a R L b R" with "L ab R".
    * Bracket wrapping (not a flat separator) makes matches symbol-exact —
    * symbols ["xa","b"] can never match the pair (a,b) — and adjacent
    * matches never share a boundary char, so replace's left-to-right
    * non-overlapping pass per merge IS standard BPE application (a merge
    * of rank r only ever creates pairs of later rank, so one ordered
    * sweep is exact). One narrow scan pass, no shuffle, no UDF.
    *
    * Returns the bracketed symbol string (words joined by a space);
    * symbol count = number of R sentinels.
    */
  def encodeExpr(text: Column, merges: Seq[Merge]): Column = {
    // '(?s).': one code point per match (never half a surrogate pair);
    // DOTALL because tokens() splits only on \s, so line separators like
    // U+2028 survive inside a token and must stay symbols — a bare '.'
    // would silently drop them and diverge from induceMerges' code points
    val wrapped = transform(TextFunctions.tokens(text), w =>
      concat_ws("", transform(regexp_extract_all(w, lit("(?s)."), lit(0)),
        cp => concat(lit(L), cp, lit(R)))))
    merges.sortBy(_.rank).foldLeft(concat_ws(" ", wrapped)) { (acc, m) =>
      replace(acc, lit(L + m.left + R + L + m.right + R),
        lit(L + m.left + m.right + R))
    }
  }

  /** symbol count of an [[encodeExpr]] string: one R sentinel per symbol */
  def symbolCount(encoded: Column): Column =
    (length(encoded) - length(replace(encoded, lit(R)))).cast("long")

  /** Induce the top-k BPE merges. The corpus-scale pass (tokenize + word
    * count) is always distributed and runs exactly once; the k-round
    * induction then runs LOCALLY when the distinct-word table fits under
    * `maxLocalVocab` rows (the shape every production tokenizer trainer
    * uses — word counts are vocab-bounded, orders of magnitude smaller
    * than the corpus; Spark MLlib's Word2Vec collects its vocab the same
    * way), and falls back to the per-round distributed loop for corpora
    * whose raw vocab genuinely exceeds driver memory. Both paths produce
    * identical merges (same deterministic tie-break).
    */
  def induceMerges(docs: DataFrame, textCol: String, k: Int,
      maxLocalVocab: Int = 1 << 22): Seq[Merge] = {
    require(k > 0, s"k must be positive, got $k")
    val spark = docs.sparkSession
    import spark.implicits._
    // the ONE corpus-scale pass: word -> weight
    val words = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .as[(String, Long)]
    // limit(maxLocalVocab + 1): bounded driver transfer — never an
    // unbounded collect; one extra row is enough to detect overflow
    val head = words.limit(maxLocalVocab + 1).collect()
    if (head.length <= maxLocalVocab) return induceLocal(head, k)
    var syms = words.map { case (w, n) => (codePointSyms(w), n) }.persist()
    val merges = Seq.newBuilder[Merge]
    var round = 1
    var continue = true
    while (round <= k && continue) {
      val top = syms.flatMap { case (ss, n) =>
        if (ss.size < 2) Iterator.empty
        else ss.iterator.zip(ss.iterator.drop(1)).map { case (x, y) => (x, y, n) }
      }.toDF("a", "b", "n")
        .groupBy(col("a"), col("b")).agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1) // tiny argmax: ONE driver row per round
        .collect()
      if (top.isEmpty) continue = false
      else {
        val r = top.head
        val (a, b, cnt) = (r.getAs[String]("a"), r.getAs[String]("b"), r.getAs[Long]("cnt"))
        merges += Merge(round, a, b, cnt)
        val next = syms.map { case (ss, n) => (applyMerge(ss, a, b), n) }.persist()
        next.count() // materialize before releasing the parent cache
        syms.unpersist()
        syms = next
        round += 1
      }
    }
    syms.unpersist()
    merges.result()
  }
}
