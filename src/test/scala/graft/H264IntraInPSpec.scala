package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264Codec, H264Writer => W}
import graft.sources.H264Codec.Yuv

/** Intra macroblocks inside P slices (round 14, §7.4.5: P mb_type
  * 5..30 / the CABAC Table 9-37 prefix bin; B mb_type 23..48 accepted
  * on decode) — scene cuts and uncovered regions, where motion
  * compensation has nothing to predict from. Reference equivalent:
  * FFmpeg decodes these everywhere; scene cuts inside a GOP are
  * routine in crawled video.
  */
class H264IntraInPSpec extends AnyFunSuite {

  private def pat(w: Int, h: Int, t: Int, scene: Int): Yuv = {
    def a(x: Int, y: Int): Int =
      (128 + 55 * math.sin(0.31 * x + 0.17 * y) * math.cos(0.23 * y - 0.11 * x)).round.toInt.max(0).min(255)
    // scene B is SMOOTH (plane/V/H intra modes fit it well) but shares
    // nothing with scene A — exactly the content where intra must beat
    // any motion-compensated shape, partitioned or not
    def b(x: Int, y: Int): Int = (x * 3 + y * 2 + 15).min(250)
    val f = if (scene == 0) a _ else b _
    Yuv(w, h, Array.tabulate(w * h)(i => f(i % w + 2 * t, i / w).toByte),
      Array.fill(w / 2 * h / 2)(128.toByte), Array.fill(w / 2 * h / 2)(128.toByte))
  }

  private def mse(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) & 0xff) - (b(i) & 0xff); s += d * d; i += 1 }
    s / a.length
  }

  /** frames 0-2 scene A, frames 3-5 a structurally different scene B —
    * frame 3 is a P picture whose reference shares nothing */
  private def cutFrames: Seq[Yuv] =
    (0 until 6).map(t => pat(64, 48, t, if (t < 3) 0 else 1))

  test("scene-cut P pictures engage intra-in-P and round-trip (both entropy layers)") {
    for (cabac <- Seq(false, true)) {
      H264Codec.intraInPCount.set(0)
      val dec = H264Codec.decode(
        H264Codec.encode(cutFrames, qp = 12, cabac = cabac))
      assert(H264Codec.intraInPCount.get() > 0,
        s"cabac=$cabac: the cut frame must code intra MBs in its P slice")
      dec.indices.foreach(i => assert(mse(cutFrames(i).y, dec(i).y) < 8.0,
        s"cabac=$cabac frame $i poor reconstruction"))
    }
  }

  test("smooth motion never pays the intra competition") {
    H264Codec.intraInPCount.set(0)
    H264Codec.encode((0 until 6).map(t => pat(64, 48, t, 0)), qp = 12)
    assert(H264Codec.intraInPCount.get() == 0,
      "no intra-in-P on content motion compensation handles")
  }

  test("CAVLC and CABAC scene-cut streams decode to identical pixels") {
    val dA = H264Codec.decode(H264Codec.encode(cutFrames, qp = 12))
    val dB = H264Codec.decode(H264Codec.encode(cutFrames, qp = 12, cabac = true))
    cutFrames.indices.foreach { i =>
      assert(java.util.Arrays.equals(dA(i).y, dB(i).y), s"frame $i luma")
      assert(java.util.Arrays.equals(dA(i).cb, dB(i).cb), s"frame $i cb")
      assert(java.util.Arrays.equals(dA(i).cr, dB(i).cr), s"frame $i cr")
    }
  }

  test("intra-in-P composes with the parts and wp tiers") {
    for ((parts, wpOn) <- Seq((true, false), (false, true))) {
      H264Codec.intraInPCount.set(0)
      val dec = H264Codec.decode(H264Codec.encode(cutFrames, qp = 12,
        parts = parts, weightedPred = wpOn))
      assert(H264Codec.intraInPCount.get() > 0, s"parts=$parts wp=$wpOn")
      dec.indices.foreach(i => assert(mse(cutFrames(i).y, dec(i).y) < 8.0,
        s"parts=$parts wp=$wpOn frame $i"))
    }
  }

  // ------------------------------------------------------- conformance

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  /** hand-built P slice whose single MB is INTRA (mb_type 8 = 5 +
    * I_16x16_2_0_0): DC prediction with no neighbours is the spec's
    * flat 128 on every plane — a decoder mis-mapping the P intra space
    * or predicting from the reference instead fails the exact pixels */
  test("hand-built intra-in-P stream decodes to the flat-DC spec pixels") {
    val sps = {
      val bw = new W.BitWriter
      bw.u(8, 66); bw.u(8, 0); bw.u(8, 10)
      bw.ue(0); bw.ue(0); bw.ue(2); bw.ue(1); bw.u1(0)
      bw.ue(0); bw.ue(0) // 1x1 MBs
      bw.u1(1); bw.u1(1); bw.u1(0); bw.u1(0)
      bw.rbspTrailing()
    }
    val pps = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(0); bw.u1(0); bw.u1(0); bw.ue(0)
      bw.ue(0); bw.ue(0); bw.u1(0); bw.u(2, 0)
      bw.se(0); bw.se(0); bw.se(0)
      bw.u1(1); bw.u1(0); bw.u1(0)
      bw.rbspTrailing()
    }
    val lumaA = Array.tabulate(256)(i => ((7 * i + 13) % 256).toByte)
    val cA = Array.fill(64)(90.toByte)
    val idr = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(7); bw.ue(0)
      bw.u(4, 0); bw.ue(0)
      bw.u1(0); bw.u1(0)
      bw.se(0); bw.ue(1)
      bw.ue(25); bw.alignZero()
      lumaA.foreach(b => bw.u(8, b & 0xff))
      cA.foreach(b => bw.u(8, b & 0xff))
      cA.foreach(b => bw.u(8, b & 0xff))
      W.nal(3, 5, bw.rbspTrailing())
    }
    val p = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(5); bw.ue(0) // P slice
      bw.u(4, 1)
      bw.u1(0); bw.u1(0)           // no override / list modification
      bw.u1(0)                     // adaptive marking
      bw.se(0); bw.ue(1)           // qp delta, deblocking OFF
      bw.ue(0)                     // mb_skip_run
      bw.ue(8)                     // mb_type 5 + 3 = I_16x16_2_0_0 (DC, cbp 0)
      bw.ue(0)                     // intra_chroma_pred_mode DC
      bw.se(0)                     // mb_qp_delta
      W.nal(2, 1, bw.rbspTrailing())
    }
    val stream = W.nal(3, 7, sps) ++ W.nal(3, 8, pps) ++ idr ++ p
    assert(md5hex(stream) == "d2f6cf23ac079d597c97fb1781e304e3") // golden
    val out = H264Codec.decode(stream)
    assert(out.size == 2)
    assert(out(0).y.toSeq == lumaA.toSeq)
    assert(out(1).y.forall(b => (b & 0xff) == 128),
      "intra DC with no neighbours must reconstruct flat 128 luma")
    assert(out(1).cb.forall(b => (b & 0xff) == 128))
    assert(out(1).cr.forall(b => (b & 0xff) == 128))
  }
}
