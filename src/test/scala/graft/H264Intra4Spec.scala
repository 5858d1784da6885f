package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.H264Codec
import graft.sources.H264Codec.Yuv

/** Intra_4x4 pins: every §8.3.2.2 prediction mode checked against
  * independently recomputed formulas (directional half/quarter-sample
  * interpolation, DC folds, top-right substitution), the Table 9-4 INTRA
  * cbp mapping's bijectivity, the I16-vs-I4 mode competition actually
  * engaging on 4x4-scale texture (and NOT on flat content), and full
  * roundtrips with CAVLC/CABAC pixel parity — the closed analysis loop
  * must equal the decoder's closed reconstruction loop exactly.
  */
class H264Intra4Spec extends AnyFunSuite {

  private val top = Array(10, 40, 90, 160)
  private val tr = Array(200, 220, 240, 250)
  private val left = Array(70, 30, 110, 190)
  private val corner = 55
  private def t8(i: Int): Int = if (i < 4) top(i) else tr(i - 4)
  private def t8sub(i: Int): Int = if (i < 4) top(i) else top(3) // C unavailable
  private def pred(mode: Int, hasTr: Boolean = true): Array[Int] =
    H264Codec.i4PredForTest(Some(top), if (hasTr) Some(tr) else None,
      Some(left), Some(corner), mode)

  test("modes 0-2: vertical / horizontal / DC match the spec folds") {
    val v = pred(0)
    for (y <- 0 until 4; x <- 0 until 4) assert(v(y * 4 + x) == top(x))
    val h = pred(1)
    for (y <- 0 until 4; x <- 0 until 4) assert(h(y * 4 + x) == left(y))
    assert(pred(2).forall(_ == (top.sum + left.sum + 4) >> 3))
    val dcTopOnly = H264Codec.i4PredForTest(Some(top), None, None, None, 2)
    assert(dcTopOnly.forall(_ == (top.sum + 2) >> 2))
    assert(H264Codec.i4PredForTest(None, None, None, None, 2).forall(_ == 128))
  }

  test("mode 3 DDL: diagonal filter + top-right substitution") {
    val g = pred(3)
    for (y <- 0 until 4; x <- 0 until 4) {
      val exp =
        if (x == 3 && y == 3) (t8(6) + 3 * t8(7) + 2) >> 2
        else (t8(x + y) + 2 * t8(x + y + 1) + t8(x + y + 2) + 2) >> 2
      assert(g(y * 4 + x) == exp, s"DDL($x,$y)")
    }
    // C unavailable: p[4..7,-1] substitute p[3,-1]
    val gs = pred(3, hasTr = false)
    for (y <- 0 until 4; x <- 0 until 4) {
      val exp =
        if (x == 3 && y == 3) (t8sub(6) + 3 * t8sub(7) + 2) >> 2
        else (t8sub(x + y) + 2 * t8sub(x + y + 1) + t8sub(x + y + 2) + 2) >> 2
      assert(gs(y * 4 + x) == exp, s"DDL-sub($x,$y)")
    }
  }

  test("modes 4-8: DDR / VR / HD / VL / HU match the spec formulas") {
    def tp(i: Int) = if (i < 0) corner else t8(i)
    def lp(i: Int) = if (i < 0) corner else left(i)
    val ddr = pred(4)
    for (y <- 0 until 4; x <- 0 until 4) {
      val exp =
        if (x > y) (tp(x - y - 2) + 2 * tp(x - y - 1) + top(x - y) + 2) >> 2
        else if (x < y) (lp(y - x - 2) + 2 * lp(y - x - 1) + left(y - x) + 2) >> 2
        else (top(0) + 2 * corner + left(0) + 2) >> 2
      assert(ddr(y * 4 + x) == exp, s"DDR($x,$y)")
    }
    val vr = pred(5)
    for (y <- 0 until 4; x <- 0 until 4) {
      val z = 2 * x - y
      val exp =
        if (z >= 0 && z % 2 == 0) (tp(x - (y >> 1) - 1) + tp(x - (y >> 1)) + 1) >> 1
        else if (z >= 0) (tp(x - (y >> 1) - 2) + 2 * tp(x - (y >> 1) - 1) + tp(x - (y >> 1)) + 2) >> 2
        else if (z == -1) (left(0) + 2 * corner + top(0) + 2) >> 2
        else (lp(y - 2 * x - 1) + 2 * lp(y - 2 * x - 2) + lp(y - 2 * x - 3) + 2) >> 2
      assert(vr(y * 4 + x) == exp, s"VR($x,$y)")
    }
    val hd = pred(6)
    for (y <- 0 until 4; x <- 0 until 4) {
      val z = 2 * y - x
      val exp =
        if (z >= 0 && z % 2 == 0) (lp(y - (x >> 1) - 1) + lp(y - (x >> 1)) + 1) >> 1
        else if (z >= 0) (lp(y - (x >> 1) - 2) + 2 * lp(y - (x >> 1) - 1) + lp(y - (x >> 1)) + 2) >> 2
        else if (z == -1) (left(0) + 2 * corner + top(0) + 2) >> 2
        else (tp(x - 2 * y - 1) + 2 * tp(x - 2 * y - 2) + tp(x - 2 * y - 3) + 2) >> 2
      assert(hd(y * 4 + x) == exp, s"HD($x,$y)")
    }
    val vl = pred(7)
    for (y <- 0 until 4; x <- 0 until 4) {
      val i = x + (y >> 1)
      val exp =
        if (y % 2 == 0) (t8(i) + t8(i + 1) + 1) >> 1
        else (t8(i) + 2 * t8(i + 1) + t8(i + 2) + 2) >> 2
      assert(vl(y * 4 + x) == exp, s"VL($x,$y)")
    }
    val hu = pred(8)
    for (y <- 0 until 4; x <- 0 until 4) {
      val z = x + 2 * y
      val exp =
        if (z > 5) left(3)
        else if (z == 5) (left(2) + 3 * left(3) + 2) >> 2
        else if (z % 2 == 0) (left(y + (x >> 1)) + left(y + (x >> 1) + 1) + 1) >> 1
        else (left(y + (x >> 1)) + 2 * left(y + (x >> 1) + 1) + left(y + (x >> 1) + 2) + 2) >> 2
      assert(hu(y * 4 + x) == exp, s"HU($x,$y)")
    }
  }

  test("Table 9-4 intra cbp mapping is a bijection on 0..47") {
    val m = H264Codec.cbpIntraFromCode
    assert(m.length == 48)
    assert(m.toSet == (0 until 48).toSet)
  }

  // locally-smooth, globally-CURVED luma: every 4x4 patch is close to
  // linear (the directional I4 modes extrapolate it from the adjacent
  // row/column), but the gradient direction turns WITHIN each 16x16 MB,
  // so no single I16 mode fits — Intra_4x4's home turf
  private def cellFrame(w: Int, h: Int, t: Int): Yuv = {
    val y = Array.tabulate(w * h) { i =>
      val x = i % w; val yy = i / w
      (((x - 20) * (x - 20) + (yy - 14) * (yy - 14) + x * yy / 3 + t * 31) / 6 % 256).toByte
    }
    Yuv(w, h, y, Array.fill(w / 2 * h / 2)(128.toByte), Array.fill(w / 2 * h / 2)(128.toByte))
  }

  private def flatFrame(w: Int, h: Int): Yuv =
    Yuv(w, h, Array.fill(w * h)(128.toByte),
      Array.fill(w / 2 * h / 2)(128.toByte), Array.fill(w / 2 * h / 2)(128.toByte))

  test("mode competition engages on 4x4 texture and stays out of flat content") {
    H264Codec.i4MbCount.set(0)
    H264Codec.encode(Seq(flatFrame(48, 48)), qp = 16, allIntra = true)
    assert(H264Codec.i4MbCount.get() == 0,
      "I_NxN chosen for flat content — the SAD bias is broken")
    H264Codec.i4MbCount.set(0)
    H264Codec.encode(Seq(cellFrame(48, 48, 0)), qp = 16, allIntra = true)
    assert(H264Codec.i4MbCount.get() > 0,
      "I_NxN never chosen on 4x4-scale texture — competition inert")
  }

  test("Intra_4x4 roundtrips with CAVLC/CABAC pixel parity across QPs") {
    val frames = (0 until 3).map(t => cellFrame(48, 32, t))
    for (qp <- Seq(8, 16, 30)) {
      H264Codec.i4MbCount.set(0)
      val sv = H264Codec.encode(frames, qp = qp, allIntra = true)
      assert(H264Codec.i4MbCount.get() > 0)
      val cavlc = H264Codec.decode(sv)
      val cabac = H264Codec.decode(
        H264Codec.encode(frames, qp = qp, allIntra = true, cabac = true))
      assert(cavlc.size == 3 && cabac.size == 3)
      cavlc.zip(cabac).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.y.sameElements(b.y), s"qp $qp frame $i CAVLC/CABAC luma diverge")
        assert(a.cb.sameElements(b.cb) && a.cr.sameElements(b.cr))
      }
    }
  }

  test("mixed I4/I16 pictures roundtrip (texture + smooth regions in one frame)") {
    // left half curved (I4 country), right half flat (I16 country) —
    // both MB types inside one picture, and the boundary MBs exercise
    // cross-type neighbor prediction
    val w = 64; val h = 32
    val y = Array.tabulate(w * h) { i =>
      val x = i % w; val yy = i / w
      (if (x < 32) ((x - 20) * (x - 20) + (yy - 14) * (yy - 14) + x * yy / 3) / 6 % 256
       else 128).toByte
    }
    val f = Yuv(w, h, y, Array.fill(w / 2 * h / 2)(128.toByte),
      Array.fill(w / 2 * h / 2)(128.toByte))
    for (qp <- Seq(12, 24); slices <- Seq(1, 2)) {
      val cavlc = H264Codec.decode(
        H264Codec.encode(Seq(f), qp = qp, allIntra = true, slicesPerFrame = slices))
      val cabac = H264Codec.decode(H264Codec.encode(Seq(f), qp = qp,
        allIntra = true, cabac = true, slicesPerFrame = slices))
      assert(cavlc.head.y.sameElements(cabac.head.y),
        s"qp $qp slices $slices mixed-type picture diverges across entropy layers")
    }
  }

  test("P GOPs over textured content roundtrip with I4 IDR frames") {
    val frames = (0 until 4).map(t => cellFrame(32, 32, t % 2))
    H264Codec.i4MbCount.set(0)
    val cavlc = H264Codec.decode(H264Codec.encode(frames, qp = 16))
    assert(H264Codec.i4MbCount.get() > 0, "IDR of the textured GOP should pick I4")
    val cabac = H264Codec.decode(H264Codec.encode(frames, qp = 16, cabac = true))
    assert(cavlc.size == 4)
    cavlc.zip(cabac).foreach { case (a, b) => assert(a.y.sameElements(b.y)) }
  }
}
