package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.DataFrame

/** Multi-phrase blocklist filtering via a real Aho-Corasick automaton —
  * the C4/RefinedWeb "badwords" gate done the way it must be done at
  * corpus scale: ONE scan pass matches ALL phrases simultaneously
  * (O(text + hits), independent of phrase count), instead of the
  * O(text x phrases) `contains` loop that dies at a 10k-phrase list.
  * The automaton is built once on the driver and ships to executors as
  * a broadcast-sized immutable structure; matching is scan-local with
  * zero exchange — the filter composes into any corpus scan for free.
  *
  * Matching is case-sensitive raw-substring (no word boundaries), the
  * exact semantics of SQL `contains`, so a DuckDB oracle can replay the
  * result with a phrases-VALUES join.
  */
object Blocklist {

  /** immutable serialized Aho-Corasick automaton over phrase bytes.
    * Arrays, not node objects: one allocation, cheap to broadcast,
    * cache-friendly to walk.
    */
  final class Automaton private[Blocklist] (
      private val next: Array[Array[Int]],   // state -> char -> state (goto ∪ fail closure)
      private val outputs: Array[Array[Int]], // state -> phrase ids ending here
      val phrases: Array[String]) extends Serializable {

    /** distinct phrase ids present in `text`, ascending */
    def hits(text: String): Array[Int] = {
      val seen = new Array[Boolean](phrases.length)
      var nHit = 0
      var st = 0
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        st = if (c < 128) next(st)(c) else 0 // non-ASCII resets (phrases are ASCII)
        val out = outputs(st)
        var k = 0
        while (k < out.length) {
          if (!seen(out(k))) { seen(out(k)) = true; nHit += 1 }
          k += 1
        }
        i += 1
      }
      val res = new Array[Int](nHit)
      var j = 0; var p = 0
      while (p < seen.length) { if (seen(p)) { res(j) = p; j += 1 }; p += 1 }
      res
    }
  }

  /** classic BFS construction: trie, fail links, output merge, then the
    * goto/fail closure flattened into a dense transition table
    */
  def build(phrases: Seq[String]): Automaton = {
    require(phrases.nonEmpty, "empty blocklist")
    phrases.foreach(p => require(p.nonEmpty && p.forall(_ < 128),
      s"blocklist phrases must be non-empty ASCII, got '$p'"))
    val uniq = phrases.distinct.toArray
    // trie
    val children = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val out = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    uniq.zipWithIndex.foreach { case (p, pid) =>
      var st = 0
      p.foreach { c =>
        st = children(st).getOrElseUpdate(c, {
          children += mutable.Map.empty[Char, Int]
          out += mutable.ArrayBuffer.empty[Int]
          children.length - 1
        })
      }
      out(st) += pid
    }
    val n = children.length
    val fail = new Array[Int](n)
    val next = Array.fill(n)(new Array[Int](128))
    val queue = mutable.Queue.empty[Int]
    // depth-1: fail to root; root transitions default to root
    (0 until 128).foreach { c =>
      children(0).get(c.toChar) match {
        case Some(s) => next(0)(c) = s; fail(s) = 0; queue += s
        case None    => next(0)(c) = 0
      }
    }
    while (queue.nonEmpty) {
      val st = queue.dequeue()
      (0 until 128).foreach { c =>
        children(st).get(c.toChar) match {
          case Some(s) =>
            fail(s) = next(fail(st))(c)
            out(s) ++= out(fail(s)) // output merge: suffixes match too
            next(st)(c) = s
            queue += s
          case None =>
            next(st)(c) = next(fail(st))(c)
        }
      }
    }
    new Automaton(next, out.map(_.toArray.sorted).toArray, uniq)
  }

  /** Annotate `df` with the blocklist verdict: `n_hits` (distinct
    * phrases present), `hit_phrases` (sorted, comma-joined), `blocked`.
    * One scan-local UDF-free... — matching runs in a deserialized map
    * over the text column; the automaton rides a broadcast variable.
    */
  def annotate(df: DataFrame, textCol: String, phrases: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    val acB = spark.sparkContext.broadcast(build(phrases))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(org.apache.spark.sql.types.StructType(
        df.schema.fields ++ Seq(
          org.apache.spark.sql.types.StructField("n_hits", org.apache.spark.sql.types.IntegerType, false),
          org.apache.spark.sql.types.StructField("hit_phrases", org.apache.spark.sql.types.StringType, false),
          org.apache.spark.sql.types.StructField("blocked", org.apache.spark.sql.types.BooleanType, false))))
    val idx = df.schema.fieldIndex(textCol)
    df.map { row =>
      val ac = acB.value
      val ids = ac.hits(row.getString(idx))
      val names = ids.map(ac.phrases).sorted
      org.apache.spark.sql.Row.fromSeq(row.toSeq ++ Seq(
        ids.length, names.mkString(","), ids.nonEmpty))
    }(enc)
  }
}
