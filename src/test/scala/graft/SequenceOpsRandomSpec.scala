package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.operators.SequenceOps

/** Randomized parity of the samplers against brute-force reference models
  * (fixed seed — reproducible): the reference semantics (`sampler.cpp`
  * re-densification, concatenation-with-overlap, gather ordering) hold for
  * arbitrary parameter draws, not only the hand-picked spec cases. Both
  * gather plans (native lookup and broadcast-join fallback) are exercised
  * by drawing duplicate-free and duplicate-bearing row lists.
  */
class SequenceOpsRandomSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  /** dense 2-stream input; model = Map (stream, index) -> value */
  private def mkStream(n: Int): (DataFrame, Map[(Long, Long), Long]) = {
    val rows = for (s <- 0L until 2L; i <- 0L until n.toLong)
      yield (s, i, s * 1000 + i * 7 % 97)
    (rows.toDF(SequenceOps.STREAM, SequenceOps.INDEX, "v"),
      rows.map(r => (r._1, r._2) -> r._3).toMap)
  }

  private def collect(df: DataFrame): Seq[(Long, Long, Option[Long])] =
    df.collect().map { r =>
      (r.getAs[Long](SequenceOps.STREAM), r.getAs[Long](SequenceOps.INDEX),
        if (r.isNullAt(r.fieldIndex("v"))) None else Some(r.getAs[Long]("v")))
    }.sortBy(t => (t._1, t._2)).toSeq

  test("stride parity over random widths") {
    (1 to 8).foreach { _ =>
      val n  = 1 + rnd.nextInt(200)
      val st = 1L + rnd.nextInt(12)
      val (df, model) = mkStream(n)
      val expect = for (s <- 0L until 2L; i <- 0L until n.toLong; if i % st == 0)
        yield (s, i / st, Some(model((s, i))))
      assert(collect(SequenceOps.stride(df, st)) ==
        expect.sortBy(t => (t._1, t._2)).toSeq, s"n=$n stride=$st")
    }
  }

  test("stridedRanges parity incl. overlapping intervals (concatenation semantics)") {
    (1 to 8).foreach { _ =>
      val n  = 50 + rnd.nextInt(150)
      val st = 1L + rnd.nextInt(5)
      val nIv = 1 + rnd.nextInt(3)
      val ivs = (0 until nIv).map { _ =>
        val s = rnd.nextInt(n).toLong
        val e = s + rnd.nextInt(n - s.toInt).toLong
        (s, e)
      }
      val (df, model) = mkStream(n)
      // reference model: concatenate intervals; each contributes its own
      // strided rows at offset = rows of earlier intervals
      val counts  = ivs.map { case (s, e) => (e - s + st - 1) / st }
      val offs    = counts.scanLeft(0L)(_ + _)
      val expect = for {
        sid <- 0L until 2L
        (iv, j) <- ivs.zipWithIndex
        (s, e) = iv
        local <- 0L until counts(j)
        src = s + local * st
        if src < e
      } yield (sid, offs(j) + local, Some(model((sid, src))))
      assert(collect(SequenceOps.stridedRanges(df, ivs, st)) ==
        expect.sortBy(t => (t._1, t._2)).toSeq, s"n=$n ivs=$ivs stride=$st")
    }
  }

  test("gather parity on both plans (native lookup and duplicate-row join fallback)") {
    (1 to 8).foreach { k =>
      val n = 30 + rnd.nextInt(100)
      val base = Seq.fill(3 + rnd.nextInt(10))(rnd.nextInt(n * 2).toLong) // some out of range
      // odd iterations force duplicates -> the broadcast-join fallback
      val rows = if (k % 2 == 1) base ++ base.take(2) else base.distinct
      val (df, model) = mkStream(n)
      val expect = for {
        sid <- 0L until 2L
        (src, j) <- rows.zipWithIndex
        v <- model.get((sid, src))
      } yield (sid, j.toLong, Some(v))
      assert(collect(SequenceOps.gather(df, rows)) ==
        expect.sortBy(t => (t._1, t._2)).toSeq, s"n=$n rows=$rows")
    }
  }

  test("repeat / repeatNull parity over random spacings") {
    (1 to 6).foreach { _ =>
      val n = 1 + rnd.nextInt(60)
      val k = 1L + rnd.nextInt(5)
      val (df, model) = mkStream(n)
      val expectRep = for (s <- 0L until 2L; i <- 0L until n.toLong; p <- 0L until k)
        yield (s, i * k + p, Some(model((s, i))))
      assert(collect(SequenceOps.repeat(df, k)) ==
        expectRep.sortBy(t => (t._1, t._2)).toSeq, s"repeat n=$n k=$k")
      val expectNull = for (s <- 0L until 2L; i <- 0L until n.toLong; p <- 0L until k)
        yield (s, i * k + p, if (p == 0) Some(model((s, i))) else None)
      assert(collect(SequenceOps.repeatNull(df, k)) ==
        expectNull.sortBy(t => (t._1, t._2)).toSeq, s"repeatNull n=$n k=$k")
    }
  }

  test("slice(All)+unslice round-trips dense streams for random group sizes") {
    (1 to 6).foreach { _ =>
      val n = 1 + rnd.nextInt(200)
      val g = 1L + rnd.nextInt(50)
      val (df, model) = mkStream(n)
      val back = SequenceOps.unslice(
        SequenceOps.slice(df, SequenceOps.Partitioner.All(g)))
      val expect = (for (s <- 0L until 2L; i <- 0L until n.toLong)
        yield (s, i, Some(model((s, i))))).sortBy(t => (t._1, t._2)).toSeq
      assert(collect(back.select(col(SequenceOps.STREAM), col(SequenceOps.INDEX), col("v")))
        == expect, s"n=$n g=$g")
    }
  }
}
