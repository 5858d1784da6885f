package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264Codec, H264Writer => W}
import graft.sources.H264Codec.Yuv

/** Temporal direct B prediction (round 14, §8.4.1.2.3,
  * direct_spatial_mv_pred_flag = 0): B direct/skip motion is the
  * colocated block's L0 vector scaled by POC distance (tx /
  * DistScaleFactor arithmetic), per 8x8 quadrant under
  * direct_8x8_inference, with the colocated reference mapped back into
  * the current L0 list by the per-block reference-POC state. Reference
  * equivalent: FFmpeg behind scanner/video/decoder_automata.h.
  */
class H264TemporalDirectSpec extends AnyFunSuite {

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

  test("temporal-direct B GOP round-trips in display order (both entropy layers)") {
    for (n <- Seq(5, 7); cabac <- Seq(false, true)) {
      val frames = (0 until n).map(t => movingYuv(64, 48, t))
      val dec = H264Codec.decode(H264Codec.encode(frames, qp = 12,
        bframes = true, tdirect = true, cabac = cabac))
      assert(dec.size == n, s"n=$n cabac=$cabac")
      dec.indices.foreach(i => assert(mse(frames(i).y, dec(i).y) < 4.0,
        s"n=$n cabac=$cabac frame $i poor reconstruction"))
    }
  }

  test("CAVLC and CABAC temporal-direct streams decode to identical pixels") {
    val frames = (0 until 7).map(t => movingYuv(64, 48, t))
    val dA = H264Codec.decode(
      H264Codec.encode(frames, qp = 12, bframes = true, tdirect = true))
    val dB = H264Codec.decode(
      H264Codec.encode(frames, qp = 12, bframes = true, tdirect = true, cabac = true))
    frames.indices.foreach { i =>
      assert(java.util.Arrays.equals(dA(i).y, dB(i).y), s"frame $i luma")
      assert(java.util.Arrays.equals(dA(i).cb, dB(i).cb), s"frame $i cb")
      assert(java.util.Arrays.equals(dA(i).cr, dB(i).cr), s"frame $i cr")
    }
  }

  test("temporal direct collapses a perfectly linear pan to near-skip B pictures") {
    // anchors pan 4 px/2 frames; the POC-scaled colocated MV is exactly
    // the B's true 2 px displacement, so B MBs should ride direct/skip
    // with (near) no residual. This pins the poc-live-during-encode
    // invariant: an encoder deriving tb from a stale poc 0 prices the
    // direct candidate with wrong motion, codes full residual instead,
    // and blows the marginal-cost bound (measured ~8x it).
    val frames = (0 until 3).map(t => movingYuv(64, 48, t)) // I, B, P coding order: I P B
    H264Codec.directBCount.set(0)
    val withB = H264Codec.encode(frames, qp = 12, bframes = true, tdirect = true)
    assert(H264Codec.directBCount.get() > 0,
      "no B MB chose the temporal-direct candidate on a perfectly linear pan " +
        "(measured 0/12 when the encoder derived tb from a stale poc 0; " +
        "3/12 with poc live — edge MBs see revealed content and " +
        "legitimately code their own motion)")
    val anchorsOnly = H264Codec.encode(Seq(frames(0), frames(2)), qp = 12,
      bframes = true, tdirect = true) // same I + P anchors, no B between
    val bCost = withB.length - anchorsOnly.length
    assert(bCost < 600,
      s"B picture marginal cost $bCost B — temporal direct must track the linear pan")
  }

  test("the spatial and temporal flags produce genuinely different streams") {
    val frames = (0 until 7).map(t => movingYuv(64, 48, t))
    val sp = H264Codec.encode(frames, qp = 12, bframes = true)
    val td = H264Codec.encode(frames, qp = 12, bframes = true, tdirect = true)
    assert(!java.util.Arrays.equals(sp, td),
      "tdirect must flip direct_spatial_mv_pred_flag and change the stream")
  }

  // ------------------------------------------------------- conformance

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  /** Hand-built stream: I_PCM IDR "A" (poc 0), a P picture at poc 4
    * whose single MB moves by mvCol = (16, 8) quarter-pel, then a B
    * picture at poc 2 with direct_spatial_mv_pred_flag = 0 and one
    * B_Direct_16x16 MB, cbp 0. The spec arithmetic gives tb = 2,
    * td = 4, tx = 4096, DistScaleFactor = 128, mvL0 = (8, 4),
    * mvL1 = (-8, -4); the test recomputes every predicted sample
    * (integer luma, half-pel chroma bilinear, clamped edges)
    * independently and compares the decode exactly.
    */
  test("hand-built temporal-direct stream decodes to the §8.4.1.2.3 arithmetic") {
    val sps = {
      val bw = new W.BitWriter
      bw.u(8, 66); bw.u(8, 0); bw.u(8, 10)
      bw.ue(0); bw.ue(0) // sps_id, 4-bit frame_num
      bw.ue(0)           // pic_order_cnt_type 0
      bw.ue(0)           // 4-bit poc lsb
      bw.ue(2)           // max_num_ref_frames: both anchors
      bw.u1(0)
      bw.ue(0); bw.ue(0) // 1x1 MBs
      bw.u1(1); bw.u1(1) // frame_mbs_only, direct_8x8_inference
      bw.u1(0); bw.u1(0)
      bw.rbspTrailing()
    }
    val pps = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(0)
      bw.u1(0); bw.u1(0)
      bw.ue(0)
      bw.ue(0); bw.ue(0) // list defaults 1/1
      bw.u1(0); bw.u(2, 0)
      bw.se(0); bw.se(0); bw.se(0)
      bw.u1(1); bw.u1(0); bw.u1(0)
      bw.rbspTrailing()
    }
    val lumaA = Array.tabulate(256)(i => ((7 * i + 13) % 256).toByte)
    val cbA = Array.tabulate(64)(i => ((5 * i + 1) % 256).toByte)
    val crA = Array.tabulate(64)(i => ((3 * i + 9) % 256).toByte)
    val idr = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(7); bw.ue(0)
      bw.u(4, 0); bw.ue(0)
      bw.u(4, 0)          // poc lsb 0
      bw.u1(0); bw.u1(0)
      bw.se(0); bw.ue(1)
      bw.ue(25); bw.alignZero()
      lumaA.foreach(b => bw.u(8, b & 0xff))
      cbA.foreach(b => bw.u(8, b & 0xff))
      crA.foreach(b => bw.u(8, b & 0xff))
      W.nal(3, 5, bw.rbspTrailing())
    }
    val p = { // poc 4, P_L0_16x16, mvd (16, 8), cbp 0
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(5); bw.ue(0)
      bw.u(4, 1)          // frame_num
      bw.u(4, 4)          // poc lsb 4
      bw.u1(0); bw.u1(0)  // no override, no list modification
      bw.u1(0)            // adaptive marking
      bw.se(0); bw.ue(1)
      bw.ue(0)            // mb_skip_run
      bw.ue(0)            // P_L0_16x16
      bw.se(16); bw.se(8) // mvd -> MV (16, 8)
      bw.ue(0)            // cbp 0
      W.nal(2, 1, bw.rbspTrailing())
    }
    val b = { // poc 2, temporal direct, one B_Direct_16x16, cbp 0
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(6); bw.ue(0)
      bw.u(4, 2)          // frame_num (PrevRefFrameNum + 1)
      bw.u(4, 2)          // poc lsb 2: BETWEEN the anchors
      bw.u1(0)            // direct_spatial_mv_pred_flag = 0: TEMPORAL
      bw.u1(0)            // no list-active override (1/1)
      bw.u1(0); bw.u1(0)  // no list modifications
      bw.se(0); bw.ue(1)
      bw.ue(0)            // mb_skip_run
      bw.ue(0)            // mb_type B_Direct_16x16
      bw.ue(0)            // cbp 0
      W.nal(0, 1, bw.rbspTrailing())
    }
    val stream = W.nal(3, 7, sps) ++ W.nal(3, 8, pps) ++ idr ++ p ++ b
    assert(md5hex(stream) == "565519ca7c940901ceb1e7bea54c84a8") // golden
    val out = H264Codec.decode(stream)
    assert(out.size == 3)
    assert(out(0).y.toSeq == lumaA.toSeq, "display 0 = IDR")
    // the P picture: clamped copy at (+4, +2) px luma / (+2, +1) chroma
    @inline def cl(v: Int, hi: Int) = math.max(0, math.min(hi, v))
    def lA(y: Int, x: Int) = lumaA(cl(y, 15) * 16 + cl(x, 15)) & 0xff
    def cA(p: Array[Byte])(y: Int, x: Int) = p(cl(y, 7) * 8 + cl(x, 7)) & 0xff
    val pY = Array.tabulate(256)(i => lA(i / 16 + 2, i % 16 + 4))
    val pCb = Array.tabulate(64)(i => cA(cbA)(i / 8 + 1, i % 8 + 2))
    val pCr = Array.tabulate(64)(i => cA(crA)(i / 8 + 1, i % 8 + 2))
    assert(out(2).y.map(_ & 0xff).toSeq == pY.toSeq, "display 2 = the P anchor")
    assert(out(2).cb.map(_ & 0xff).toSeq == pCb.toSeq)
    assert(out(2).cr.map(_ & 0xff).toSeq == pCr.toSeq)
    // the B picture: bi average of A at mvL0 (8,4) and P at mvL1 (-8,-4)
    def pP(y: Int, x: Int) = pY(cl(y, 15) * 16 + cl(x, 15))
    val expY = Array.tabulate(256) { i =>
      val y = i / 16; val x = i % 16
      val l0 = lA(y + 1, x + 2)
      val l1 = pP(y - 1, x - 2)
      (l0 + l1 + 1) >> 1
    }
    // chroma at eighth-pel: mvL0 (8,4) -> int (1,0) frac (0,4) — the
    // §8.4.2.2.2 vertical bilinear; mvL1 (-8,-4) -> int (-1,-1) frac
    // (0,4)
    def pPc(arr: Array[Int])(y: Int, x: Int) = arr(cl(y, 7) * 8 + cl(x, 7))
    def expC(ref0: (Int, Int) => Int, ref1: (Int, Int) => Int) =
      Array.tabulate(64) { i =>
        val y = i / 8; val x = i % 8
        val l0 = (32 * ref0(y, x + 1) + 32 * ref0(y + 1, x + 1) + 32) >> 6
        val l1 = (32 * ref1(y - 1, x - 1) + 32 * ref1(y, x - 1) + 32) >> 6
        (l0 + l1 + 1) >> 1
      }
    val expCb = expC(cA(cbA), pPc(pCb))
    val expCr = expC(cA(crA), pPc(pCr))
    assert(out(1).y.map(_ & 0xff).toSeq == expY.toSeq,
      "display 1 = the temporal-direct B picture (luma)")
    assert(out(1).cb.map(_ & 0xff).toSeq == expCb.toSeq, "B chroma Cb")
    assert(out(1).cr.map(_ & 0xff).toSeq == expCr.toSeq, "B chroma Cr")
  }
}
