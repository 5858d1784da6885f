package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.H264Codec

/** WHITE-BOX pin of the Intra_8x8 prediction math: this spec
  * reimplements §8.3.2.2 independently — the §8.3.2.2.1 reference
  * filter and all nine mode formulas, written directly from the spec
  * text in straightforward (non-performance) code — and compares the
  * codec's [[H264Codec.i8PredForTest]] output sample-by-sample over
  * randomized planted neighbors and every availability configuration.
  * (Same method as H264Intra4Spec for the 4x4 modes.)
  */
class H264Intra8PredSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  /** independent §8.3.2.2 model: returns the 64 predicted samples */
  private def model(top: Option[Array[Int]], tr: Option[Array[Int]],
      left: Option[Array[Int]], corner: Option[Int], mode: Int): Array[Int] = {
    val hasT = top.isDefined; val hasL = left.isDefined; val hasD = corner.isDefined
    // raw p[x, -1] x = 0..15 (top-right replicated from p[7,-1] when absent)
    val t = new Array[Int](16)
    if (hasT) {
      (0 until 8).foreach(i => t(i) = top.get(i))
      (8 until 16).foreach(i => t(i) = tr.map(_(i - 8)).getOrElse(t(7)))
    }
    val l = if (hasL) left.get.clone() else new Array[Int](8)
    val d = corner.getOrElse(0)
    // §8.3.2.2.1 reference filtering
    val ft = new Array[Int](16)
    val fl = new Array[Int](8)
    if (hasT) {
      ft(0) = if (hasD) (d + 2 * t(0) + t(1) + 2) / 4 else (3 * t(0) + t(1) + 2) / 4
      (1 until 15).foreach(i => ft(i) = (t(i - 1) + 2 * t(i) + t(i + 1) + 2) / 4)
      ft(15) = (t(14) + 3 * t(15) + 2) / 4
    }
    if (hasL) {
      fl(0) = if (hasD) (d + 2 * l(0) + l(1) + 2) / 4 else (3 * l(0) + l(1) + 2) / 4
      (1 until 7).foreach(i => fl(i) = (l(i - 1) + 2 * l(i) + l(i + 1) + 2) / 4)
      fl(7) = (l(6) + 3 * l(7) + 2) / 4
    }
    val fd =
      if (!hasD) 0
      else if (hasT && hasL) (t(0) + 2 * d + l(0) + 2) / 4
      else if (hasT) (3 * d + t(0) + 2) / 4
      else if (hasL) (3 * d + l(0) + 2) / 4
      else d
    def ftp(i: Int) = if (i < 0) fd else ft(i)
    def flp(i: Int) = if (i < 0) fd else fl(i)
    val out = new Array[Int](64)
    for (y <- 0 until 8; x <- 0 until 8) {
      out(y * 8 + x) = mode match {
        case 0 => ft(x)
        case 1 => fl(y)
        case 2 =>
          if (hasT && hasL) ((0 until 8).map(ft).sum + (0 until 8).map(fl).sum + 8) / 16
          else if (hasT) ((0 until 8).map(ft).sum + 4) / 8
          else if (hasL) ((0 until 8).map(fl).sum + 4) / 8
          else 128
        case 3 =>
          if (x == 7 && y == 7) (ft(14) + 3 * ft(15) + 2) / 4
          else (ft(x + y) + 2 * ft(x + y + 1) + ft(x + y + 2) + 2) / 4
        case 4 =>
          if (x > y) (ftp(x - y - 2) + 2 * ftp(x - y - 1) + ft(x - y) + 2) / 4
          else if (x < y) (flp(y - x - 2) + 2 * flp(y - x - 1) + fl(y - x) + 2) / 4
          else (ft(0) + 2 * fd + fl(0) + 2) / 4
        case 5 =>
          val z = 2 * x - y
          if (z >= 0 && z % 2 == 0) (ftp(x - y / 2 - 1) + ftp(x - y / 2) + 1) / 2
          else if (z > 0) (ftp(x - y / 2 - 2) + 2 * ftp(x - y / 2 - 1) + ftp(x - y / 2) + 2) / 4
          else if (z == -1) (fl(0) + 2 * fd + ft(0) + 2) / 4
          else (flp(y - 2 * x - 1) + 2 * flp(y - 2 * x - 2) + flp(y - 2 * x - 3) + 2) / 4
        case 6 =>
          val z = 2 * y - x
          if (z >= 0 && z % 2 == 0) (flp(y - x / 2 - 1) + flp(y - x / 2) + 1) / 2
          else if (z > 0) (flp(y - x / 2 - 2) + 2 * flp(y - x / 2 - 1) + flp(y - x / 2) + 2) / 4
          else if (z == -1) (fl(0) + 2 * fd + ft(0) + 2) / 4
          else (ftp(x - 2 * y - 1) + 2 * ftp(x - 2 * y - 2) + ftp(x - 2 * y - 3) + 2) / 4
        case 7 =>
          val i = x + y / 2
          if (y % 2 == 0) (ft(i) + ft(i + 1) + 1) / 2
          else (ft(i) + 2 * ft(i + 1) + ft(i + 2) + 2) / 4
        case 8 =>
          val z = x + 2 * y
          if (z > 13) fl(7)
          else if (z == 13) (fl(6) + 3 * fl(7) + 2) / 4
          else if (z % 2 == 0) (fl(y + x / 2) + fl(y + x / 2 + 1) + 1) / 2
          else (fl(y + x / 2) + 2 * fl(y + x / 2 + 1) + fl(y + x / 2 + 2) + 2) / 4
      }
    }
    out
  }

  private def samples(r: scala.util.Random, n: Int): Array[Int] =
    Array.fill(n)(r.nextInt(256))

  test("all nine modes match the independent spec model over random refs") {
    val r = rng(0xC0DEC8L)
    for (trial <- 0 until 40) {
      val top = samples(r, 8); val tr = samples(r, 8)
      val left = samples(r, 8); val corner = r.nextInt(256)
      for (mode <- 0 to 8) {
        val got = H264Codec.i8PredForTest(Some(top), Some(tr), Some(left),
          Some(corner), mode)
        val want = model(Some(top), Some(tr), Some(left), Some(corner), mode)
        assert(got.toSeq == want.toSeq, s"mode $mode trial $trial")
      }
    }
  }

  test("top-right replication when the upper-right block is unavailable") {
    val r = rng(7L)
    for (mode <- Seq(0, 3, 7)) {
      val top = samples(r, 8); val left = samples(r, 8); val corner = r.nextInt(256)
      val got = H264Codec.i8PredForTest(Some(top), None, Some(left), Some(corner), mode)
      val want = model(Some(top), None, Some(left), Some(corner), mode)
      assert(got.toSeq == want.toSeq, s"mode $mode tr-replicated")
    }
  }

  test("partial availability: DC variants and filter edge cases") {
    val r = rng(13L)
    val top = samples(r, 8); val tr = samples(r, 8); val left = samples(r, 8)
    // top only (no corner: ft(0) uses the 3x-weighted end form)
    assert(H264Codec.i8PredForTest(Some(top), Some(tr), None, None, 2).toSeq ==
      model(Some(top), Some(tr), None, None, 2).toSeq)
    assert(H264Codec.i8PredForTest(Some(top), Some(tr), None, None, 0).toSeq ==
      model(Some(top), Some(tr), None, None, 0).toSeq)
    // left only
    assert(H264Codec.i8PredForTest(None, None, Some(left), None, 2).toSeq ==
      model(None, None, Some(left), None, 2).toSeq)
    assert(H264Codec.i8PredForTest(None, None, Some(left), None, 8).toSeq ==
      model(None, None, Some(left), None, 8).toSeq)
    // nothing -> DC 128
    assert(H264Codec.i8PredForTest(None, None, None, None, 2).forall(_ == 128))
  }

  test("modes needing absent neighbors refuse loudly") {
    val r = rng(21L)
    val left = samples(r, 8)
    intercept[IllegalArgumentException] {
      H264Codec.i8PredForTest(None, None, Some(left), None, 0) // V needs top
    }
    intercept[IllegalArgumentException] {
      H264Codec.i8PredForTest(None, None, Some(left), None, 4) // DDR needs all
    }
  }
}
