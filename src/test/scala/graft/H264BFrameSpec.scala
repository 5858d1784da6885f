package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.StdKernels
import graft.sources.{H264Codec, H264GopCodec}
import graft.sources.H264Codec.Yuv

/** B-frame GOP coding (round 13): IBPBP coding order, one non-reference
  * bi-predicted picture between anchors, POC type 0 + decoder output
  * reordering. Reference equivalent: scanner decodes arbitrary-GOP
  * streams via FFmpeg (scanner/video/decoder_automata.h:28-51); this
  * subset makes the dominant real-world GOP shape a first-class store
  * tier on both sides of the codec.
  */
class H264BFrameSpec extends AnyFunSuite {

  /** smooth translating texture: every frame differs from every other,
    * so a reordering bug shows up as a wrong-nearest-source match */
  private def movingYuv(w: Int, h: Int, t: Int): Yuv = {
    def base(x: Int, y: Int): Int =
      (128 + 55 * math.sin(0.31 * x + 0.17 * y) * math.cos(0.23 * y - 0.11 * x)
        + 45 * math.sin(0.13 * x) * math.sin(0.19 * y)).round.toInt.max(0).min(255)
    val yb = Array.tabulate(w * h)(i => base(i % w + 2 * t, i / w + t).toByte)
    Yuv(w, h, yb, Array.fill(w / 2 * h / 2)(128.toByte),
      Array.fill(w / 2 * h / 2)(128.toByte))
  }

  private def mse(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) & 0xff) - (b(i) & 0xff); s += d * d; i += 1 }
    s / a.length
  }

  /** decoded frame i must be pixel-closest to SOURCE i — the ordering
    * oracle a consistent-reorder bug cannot pass */
  private def assertOrdered(src: Seq[Yuv], dec: Seq[Yuv]): Unit =
    dec.indices.foreach { i =>
      val dists = src.indices.map(j => mse(src(j).y, dec(i).y))
      assert(dists.indexOf(dists.min) == i % src.size,
        s"decoded frame $i is closest to source ${dists.indexOf(dists.min)}")
    }

  test("B GOP round-trips in display order at every length (both entropy layers)") {
    for (n <- Seq(1, 2, 5, 6, 7); cabac <- Seq(false, true)) {
      val frames = (0 until n).map(t => movingYuv(64, 48, t))
      val dec = H264Codec.decode(
        H264Codec.encode(frames, qp = 12, bframes = true, cabac = cabac))
      assert(dec.size == n, s"n=$n cabac=$cabac")
      assertOrdered(frames, dec)
      dec.indices.foreach(i => assert(mse(frames(i).y, dec(i).y) < 4.0,
        s"n=$n cabac=$cabac frame $i poor reconstruction"))
    }
  }

  test("CAVLC and CABAC B streams decode to identical pixels (all planes)") {
    val frames = (0 until 7).map(t => movingYuv(64, 48, t))
    val dA = H264Codec.decode(H264Codec.encode(frames, qp = 12, bframes = true))
    val dB = H264Codec.decode(
      H264Codec.encode(frames, qp = 12, bframes = true, cabac = true))
    frames.indices.foreach { i =>
      assert(java.util.Arrays.equals(dA(i).y, dB(i).y), s"frame $i luma")
      assert(java.util.Arrays.equals(dA(i).cb, dB(i).cb), s"frame $i cb")
      assert(java.util.Arrays.equals(dA(i).cr, dB(i).cr), s"frame $i cr")
    }
  }

  test("static content collapses to B_Skip runs") {
    val static = (0 until 9).map(_ => movingYuv(64, 48, 0))
    val moving = (0 until 9).map(t => movingYuv(64, 48, t))
    val sStatic = H264Codec.encode(static, qp = 12, bframes = true)
    val sMoving = H264Codec.encode(moving, qp = 12, bframes = true)
    val sIdrOnly = H264Codec.encode(static.take(1), qp = 12, bframes = true)
    // the 8 inter pictures after the IDR must cost skip-run bytes, not
    // residual bytes (~25 B/frame of slice headers + runs)
    val interTail = sStatic.length - sIdrOnly.length
    assert(interTail < 8 * 40, s"static inter tail $interTail B")
    assert(sStatic.length < sMoving.length,
      s"static ${sStatic.length} B vs moving ${sMoving.length} B")
    assert(H264Codec.decode(sStatic).size == 9)
  }

  test("maxFrames early-stop returns a display-order prefix") {
    val frames = (0 until 7).map(t => movingYuv(64, 48, t))
    val stream = H264Codec.encode(frames, qp = 12, bframes = true)
    for (k <- 1 to 7) {
      val dec = H264Codec.decode(stream, maxFrames = k)
      assert(dec.size == k)
      assertOrdered(frames, dec)
    }
  }

  test("concatenated GOPs flush the reorder buffer at each IDR") {
    val frames = (0 until 7).map(t => movingYuv(64, 48, t))
    val gop = H264Codec.encode(frames, qp = 12, bframes = true)
    val dec = H264Codec.decode(gop ++ gop)
    assert(dec.size == 14)
    assertOrdered(frames, dec)
  }

  test("BFrames store tier round-trips FrameElems through encodeGop/decodeGop") {
    val frames = (0 until 10).map(i =>
      StdKernels.syntheticFrame(0L, i.toLong, 16, 24, 3))
    for (codec <- Seq(H264GopCodec.BFrames,
        new H264GopCodec(qp = 12, cabac = true, bframes = true))) {
      val payload = codec.encodeGop(frames)
      val dec = codec.decodeGop(payload, 0L, 0L, Int.MaxValue, None).toSeq
      assert(dec.size == 10)
      dec.zip(frames).zipWithIndex.foreach { case ((d, f), i) =>
        assert(d.index == f.index, s"frame $i index")
        var diff = 0
        var p = 0
        while (p < d.data.length) {
          diff += math.abs((d.data(p) & 0xff) - (f.data(p) & 0xff)); p += 1
        }
        assert(diff.toDouble / d.data.length < 3.0, s"frame $i mean abs err")
      }
      // sparse decode honors upTo through the reorder buffer
      val firstThree = codec.decodeGop(payload, 0L, 0L, 2, None).toSeq
      assert(firstThree.size == 3)
    }
  }

  test("bframes rejects the tiers it cannot carry") {
    val f = Seq(movingYuv(32, 32, 0))
    intercept[IllegalArgumentException](
      H264Codec.encode(f, pcm = true, bframes = true))
    intercept[IllegalArgumentException](
      H264Codec.encode(f, allIntra = true, bframes = true))
    intercept[IllegalArgumentException](
      H264Codec.encode(f, multiRef = true, bframes = true))
  }
}
