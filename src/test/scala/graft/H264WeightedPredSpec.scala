package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264Codec, H264Writer => W}
import graft.sources.H264Codec.Yuv

/** Explicit weighted prediction (round 14, §7.3.3.2 pred_weight_table +
  * §8.4.2.3.2 reconstruction): fades/dissolves — ubiquitous in crawled
  * video — become (w·pred + o) corrections instead of full-frame
  * residuals. Reference equivalent: scanner decodes WP streams via
  * FFmpeg (scanner/video/software/software_video_decoder.cpp).
  */
class H264WeightedPredSpec extends AnyFunSuite {

  /** static texture under a global brightness fade: frame t is the base
    * scaled by (1 - 0.07 t) — exactly the content WP exists for */
  private def fadeYuv(w: Int, h: Int, t: Int): Yuv = {
    def base(x: Int, y: Int): Int =
      (128 + 55 * math.sin(0.31 * x + 0.17 * y) * math.cos(0.23 * y - 0.11 * x)
        + 45 * math.sin(0.13 * x) * math.sin(0.19 * y)).round.toInt.max(0).min(255)
    val g = 1.0 - 0.07 * t
    val yb = Array.tabulate(w * h)(i =>
      (base(i % w, i / w) * g).round.toInt.max(0).min(255).toByte)
    Yuv(w, h, yb, Array.fill(w / 2 * h / 2)(128.toByte),
      Array.fill(w / 2 * h / 2)(128.toByte))
  }

  private def mse(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) & 0xff) - (b(i) & 0xff); s += d * d; i += 1 }
    s / a.length
  }

  test("wp tier round-trips a fade (both entropy layers)") {
    val frames = (0 until 6).map(t => fadeYuv(64, 48, t))
    for (cabac <- Seq(false, true)) {
      val dec = H264Codec.decode(
        H264Codec.encode(frames, qp = 12, weightedPred = true, cabac = cabac))
      assert(dec.size == frames.size)
      dec.indices.foreach(i => assert(mse(frames(i).y, dec(i).y) < 6.0,
        s"cabac=$cabac frame $i poor reconstruction"))
    }
  }

  test("CAVLC and CABAC wp streams decode to identical pixels") {
    val frames = (0 until 6).map(t => fadeYuv(64, 48, t))
    val dA = H264Codec.decode(H264Codec.encode(frames, qp = 12, weightedPred = true))
    val dB = H264Codec.decode(
      H264Codec.encode(frames, qp = 12, weightedPred = true, cabac = true))
    frames.indices.foreach { i =>
      assert(java.util.Arrays.equals(dA(i).y, dB(i).y), s"frame $i luma")
      assert(java.util.Arrays.equals(dA(i).cb, dB(i).cb), s"frame $i cb")
      assert(java.util.Arrays.equals(dA(i).cr, dB(i).cr), s"frame $i cr")
    }
  }

  // ------------------------------------ implicit B weighting (round 15)

  test("wpImplicit GOPs derive NON-trivial weights and round-trip (both layers)") {
    val frames = (0 until 7).map(t => fadeYuv(64, 48, t))
    for (cabac <- Seq(false, true)) {
      H264Codec.implicitWpCount.set(0)
      val dec = H264Codec.decode(H264Codec.encode(frames, qp = 12,
        bframes = true, wpImplicit = true, cabac = cabac))
      assert(H264Codec.implicitWpCount.get() > 0,
        s"cabac=$cabac: the I B B P ladder must derive w1 != 32 at least once")
      assert(dec.size == frames.size)
      dec.indices.foreach(i => assert(mse(frames(i).y, dec(i).y) < 12.0,
        s"cabac=$cabac frame $i poor reconstruction"))
    }
  }

  test("CAVLC and CABAC wpImplicit streams decode to identical pixels") {
    val frames = (0 until 7).map(t => fadeYuv(64, 48, t))
    val dA = H264Codec.decode(H264Codec.encode(frames, qp = 12,
      bframes = true, wpImplicit = true))
    val dB = H264Codec.decode(H264Codec.encode(frames, qp = 12,
      bframes = true, wpImplicit = true, cabac = true))
    frames.indices.foreach { i =>
      assert(java.util.Arrays.equals(dA(i).y, dB(i).y), s"frame $i luma")
      assert(java.util.Arrays.equals(dA(i).cb, dB(i).cb), s"frame $i cb")
      assert(java.util.Arrays.equals(dA(i).cr, dB(i).cr), s"frame $i cr")
    }
  }

  test("a fade compresses measurably better with WP on") {
    val frames = (0 until 8).map(t => fadeYuv(64, 48, t))
    val plain = H264Codec.encode(frames, qp = 12)
    val wp = H264Codec.encode(frames, qp = 12, weightedPred = true)
    // compare the INTER TAILS: the shared IDR dominates a short stream
    // and would dilute the invariant (measured: WP tail ~2.9 kB vs
    // unweighted ~4.2 kB on this fixture)
    val idrOnly = H264Codec.encode(frames.take(1), qp = 12).length
    val plainTail = plain.length - idrOnly
    val wpTail = wp.length - idrOnly
    assert(wpTail < (plainTail * 8) / 10,
      s"WP inter tail $wpTail B must undercut unweighted $plainTail B by >20% on a fade")
  }

  test("wp composes with parts") {
    val frames = (0 until 6).map(t => fadeYuv(64, 48, t))
    val dec = H264Codec.decode(
      H264Codec.encode(frames, qp = 12, weightedPred = true, parts = true))
    dec.indices.foreach(i => assert(mse(frames(i).y, dec(i).y) < 6.0, s"frame $i"))
  }

  // ------------------------------------------------------- conformance

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  /** Hand-built stream with NON-DEFAULT weights (never produced by this
    * encoder: luma logWD 6 / w 32 / o 10, chroma logWD 5 / w 16 / o -5,
    * i.e. a 0.5x dim plus offset on every plane): PCM IDR, then a P
    * picture whose single MB is P_L0_16x16 at mv (0,0), cbp 0 — the
    * decode IS the §8.4.2.3.2 formula, which the test recomputes
    * independently per pixel.
    */
  /** Implicit B weighting (§8.4.2.3.1) against hand-built bytes: anchors
    * at poc 0 ("A", IDR I_PCM) and poc 6 ("B", non-IDR I_PCM), a
    * non-reference B picture at poc 2 under a PPS with
    * weighted_bipred_idc 2. tb/td = 2/6 -> tx 2731, DistScaleFactor 85,
    * w1 = 21, w0 = 43. The three MBs pin the three §8.4.2.3.1 branches:
    * B_L0 and B_L1 stay UNWEIGHTED (implicit mode touches only bi), and
    * B_Bi must land on clip((43*a + 21*b + 32) >> 6) exactly — a decoder
    * averaging instead drifts on every asymmetric sample pair.
    */
  test("hand-built implicit-WP B stream decodes to the POC-derived weights") {
    val sps = {
      val bw = new W.BitWriter
      bw.u(8, 66); bw.u(8, 0); bw.u(8, 10)
      bw.ue(0); bw.ue(0)
      bw.ue(0)    // pic_order_cnt_type 0
      bw.ue(0)    // 4-bit poc lsb
      bw.ue(2)    // max_num_ref_frames
      bw.u1(0)
      bw.ue(2); bw.ue(0) // 3x1 MBs
      bw.u1(1); bw.u1(1); bw.u1(0); bw.u1(0)
      bw.rbspTrailing()
    }
    val pps = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(0); bw.u1(0); bw.u1(0); bw.ue(0)
      bw.ue(0); bw.ue(0)
      bw.u1(0)   // weighted_pred_flag
      bw.u(2, 2) // weighted_bipred_idc 2: IMPLICIT
      bw.se(0); bw.se(0); bw.se(0)
      bw.u1(1); bw.u1(0); bw.u1(0)
      bw.rbspTrailing()
    }
    val mbs = 3
    def pat(mul: Int, add: Int, n: Int) =
      Array.tabulate(n)(i => ((mul * i + add) % 256).toByte)
    val lumaA = pat(7, 13, 256 * mbs); val lumaB = pat(11, 40, 256 * mbs)
    val cA = pat(5, 1, 64 * mbs); val cB = pat(3, 9, 64 * mbs)
    def pcmPicture(idr: Boolean, frameNum: Int, pocLsb: Int,
        luma: Array[Byte], cb: Array[Byte], cr: Array[Byte]): Array[Byte] = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(7); bw.ue(0)
      bw.u(4, frameNum)
      if (idr) bw.ue(0)
      bw.u(4, pocLsb)
      if (idr) { bw.u1(0); bw.u1(0) } else bw.u1(0)
      bw.se(0); bw.ue(1)
      var mb = 0
      while (mb < mbs) {
        bw.ue(25); bw.alignZero()
        (0 until 256).foreach(i => bw.u(8, luma(i / 16 * 16 * mbs + mb * 16 + i % 16) & 0xff))
        (0 until 64).foreach(i => bw.u(8, cb(i / 8 * 8 * mbs + mb * 8 + i % 8) & 0xff))
        (0 until 64).foreach(i => bw.u(8, cr(i / 8 * 8 * mbs + mb * 8 + i % 8) & 0xff))
        mb += 1
      }
      W.nal(if (idr) 3 else 2, if (idr) 5 else 1, bw.rbspTrailing())
    }
    val bPicture = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(6); bw.ue(0) // B slice
      bw.u(4, 2)                   // frame_num
      bw.u(4, 2)                   // poc lsb 2: tb 2, td 6
      bw.u1(1)                     // spatial direct
      bw.u1(0); bw.u1(0); bw.u1(0) // no override / list modifications
      // idc 2: NO pred_weight_table in the header
      bw.se(0); bw.ue(1)           // qp, deblocking OFF
      bw.ue(0); bw.ue(1); bw.se(0); bw.se(0); bw.ue(0) // MB0 B_L0 mv(0,0)
      bw.ue(0); bw.ue(2); bw.se(0); bw.se(0); bw.ue(0) // MB1 B_L1 mv(0,0)
      bw.ue(0); bw.ue(3); bw.se(0); bw.se(0); bw.se(0); bw.se(0); bw.ue(0) // MB2 B_Bi
      W.nal(0, 1, bw.rbspTrailing())
    }
    val stream = W.nal(3, 7, sps) ++ W.nal(3, 8, pps) ++
      pcmPicture(idr = true, 0, 0, lumaA, cA, cA) ++
      pcmPicture(idr = false, 1, 6, lumaB, cB, cB) ++
      bPicture
    val out = H264Codec.decode(stream)
    assert(out.size == 3)
    assert(out(0).y.toSeq == lumaA.toSeq)
    assert(out(2).y.toSeq == lumaB.toSeq)
    def wtd(a: Byte, b: Byte): Int = {
      val v = ((a & 0xff) * 43 + (b & 0xff) * 21 + 32) >> 6
      if (v < 0) 0 else if (v > 255) 255 else v
    }
    val bY = out(1).y
    val w = 16 * mbs
    (0 until 16).foreach { r =>
      (0 until 16).foreach { c =>
        assert(bY(r * w + c) == lumaA(r * w + c),
          s"MB0 L0 pixel ($r,$c): single-list must stay UNWEIGHTED under implicit")
        assert(bY(r * w + 16 + c) == lumaB(r * w + 16 + c),
          s"MB1 L1 pixel ($r,$c): single-list must stay UNWEIGHTED under implicit")
        assert((bY(r * w + 32 + c) & 0xff) == wtd(lumaA(r * w + 32 + c), lumaB(r * w + 32 + c)),
          s"MB2 Bi pixel ($r,$c): (43*a + 21*b + 32) >> 6")
      }
    }
    val bCb = out(1).cb
    val cwd = 8 * mbs
    (0 until 8).foreach { r =>
      (0 until 8).foreach { c =>
        assert((bCb(r * cwd + 16 + c) & 0xff) == wtd(cA(r * cwd + 16 + c), cB(r * cwd + 16 + c)),
          s"MB2 Bi chroma ($r,$c)")
      }
    }
  }

  test("hand-built weighted P stream decodes to the §8.4.2.3.2 arithmetic") {
    val sps = {
      val bw = new W.BitWriter
      bw.u(8, 66); bw.u(8, 0); bw.u(8, 10)
      bw.ue(0); bw.ue(0) // sps_id, log2_max_frame_num_minus4 -> 4 bits
      bw.ue(2)           // pic_order_cnt_type 2
      bw.ue(1)           // max_num_ref_frames
      bw.u1(0)
      bw.ue(0); bw.ue(0) // 1x1 MBs
      bw.u1(1); bw.u1(1)
      bw.u1(0); bw.u1(0)
      bw.rbspTrailing()
    }
    val pps = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(0)
      bw.u1(0)           // CAVLC
      bw.u1(0)
      bw.ue(0)
      bw.ue(0); bw.ue(0) // list defaults 1/1
      bw.u1(1)           // weighted_pred_flag = 1
      bw.u(2, 0)         // weighted_bipred_idc
      bw.se(0); bw.se(0); bw.se(0)
      bw.u1(1)           // deblocking control present
      bw.u1(0); bw.u1(0)
      bw.rbspTrailing()
    }
    val lumaA = Array.tabulate(256)(i => ((7 * i + 13) % 256).toByte)
    val cbA = Array.tabulate(64)(i => ((5 * i + 1) % 256).toByte)
    val crA = Array.tabulate(64)(i => ((3 * i + 9) % 256).toByte)
    val idr = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(7); bw.ue(0)
      bw.u(4, 0); bw.ue(0)
      bw.u1(0); bw.u1(0)
      bw.se(0); bw.ue(1)
      bw.ue(25); bw.alignZero()
      lumaA.foreach(b => bw.u(8, b & 0xff))
      cbA.foreach(b => bw.u(8, b & 0xff))
      crA.foreach(b => bw.u(8, b & 0xff))
      W.nal(3, 5, bw.rbspTrailing())
    }
    val p = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(5); bw.ue(0) // P slice
      bw.u(4, 1)                   // frame_num
      bw.u1(0)                     // num_ref_idx_active_override
      bw.u1(0)                     // ref_pic_list_modification_flag_l0
      // pred_weight_table (§7.3.3.2)
      bw.ue(6)                     // luma_log2_weight_denom
      bw.ue(5)                     // chroma_log2_weight_denom
      bw.u1(1); bw.se(32); bw.se(10)  // luma w/o
      bw.u1(1)                        // chroma_weight_l0_flag
      bw.se(16); bw.se(-5)            // cb w/o
      bw.se(16); bw.se(-5)            // cr w/o
      bw.u1(0)                     // adaptive_ref_pic_marking_mode_flag
      bw.se(0); bw.ue(1)           // qp delta, deblocking OFF
      bw.ue(0)                     // mb_skip_run
      bw.ue(0)                     // mb_type P_L0_16x16
      bw.se(0); bw.se(0)           // mvd (0,0)
      bw.ue(0)                     // cbp 0
      W.nal(2, 1, bw.rbspTrailing())
    }
    val stream = W.nal(3, 7, sps) ++ W.nal(3, 8, pps) ++ idr ++ p
    assert(md5hex(stream) == "a86882675084265744af09e9820eb8fd") // golden
    val out = H264Codec.decode(stream)
    assert(out.size == 2)
    assert(out(0).y.toSeq == lumaA.toSeq)
    def wL(p: Int) = math.max(0, math.min(255, ((p * 32 + 32) >> 6) + 10))
    def wC(p: Int) = math.max(0, math.min(255, ((p * 16 + 16) >> 5) - 5))
    (0 until 256).foreach(i => assert((out(1).y(i) & 0xff) == wL(lumaA(i) & 0xff),
      s"luma pixel $i"))
    (0 until 64).foreach { i =>
      assert((out(1).cb(i) & 0xff) == wC(cbA(i) & 0xff), s"cb pixel $i")
      assert((out(1).cr(i) & 0xff) == wC(crA(i) & 0xff), s"cr pixel $i")
    }
  }
}
