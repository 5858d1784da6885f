package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264Cavlc, H264Codec, H264Writer => W}
import graft.sources.H264Codec.Yuv

/** Adaptive QP (round 15, §7.4.5): per-macroblock mb_qp_delta in BOTH
  * entropy layers — CAVLC se(v) and the CABAC unary binarization with
  * §9.3.3.1.1.5 contexts — with the per-MB QP threaded through dequant
  * and the §8.7 deblock α/β/t_C0 lookups. The feature essentially every
  * real-world encoder emits (rate control); its absence was the top
  * decodes-real-streams refusal after round 14 (VERDICT r14 ask 1).
  * Reference equivalent: FFmpeg decodes rate-controlled streams behind
  * `scanner/video/decoder_automata.h:28-51`.
  */
class H264AdaptiveQpSpec extends AnyFunSuite {

  /** left half flat (activity -> QP-2), right half busy (-> QP+2) */
  private def mixedFrame(w: Int, h: Int, t: Int): Yuv = {
    val y = Array.tabulate(w * h) { i =>
      val x = i % w; val r = i / w
      if (x < w / 2) (100 + (r / 8)).toByte // near-flat
      else (128 + 60 * math.sin(1.9 * x + 2.3 * r + t)).round.toByte // busy
    }
    Yuv(w, h, y, Array.fill(w / 2 * h / 2)(110.toByte),
      Array.fill(w / 2 * h / 2)(140.toByte))
  }

  private def frames: Seq[Yuv] = (0 until 5).map(t => mixedFrame(64, 48, t))

  private def mse(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) & 0xff) - (b(i) & 0xff); s += d * d; i += 1 }
    s / a.length
  }

  test("aqp streams code NONZERO mb_qp_delta and round-trip (both entropy layers)") {
    for (cabac <- Seq(false, true)) {
      H264Codec.aqpDeltaCount.set(0)
      val dec = H264Codec.decode(
        H264Codec.encode(frames, qp = 16, cabac = cabac, aqp = true))
      assert(H264Codec.aqpDeltaCount.get() > 0,
        s"cabac=$cabac: mixed-activity content must emit nonzero deltas")
      assert(dec.size == frames.size)
      dec.indices.foreach(i => assert(mse(frames(i).y, dec(i).y) < 30.0,
        s"cabac=$cabac frame $i poor reconstruction"))
    }
  }

  test("CAVLC and CABAC aqp streams decode to identical pixels") {
    val dA = H264Codec.decode(H264Codec.encode(frames, qp = 16, aqp = true))
    val dB = H264Codec.decode(
      H264Codec.encode(frames, qp = 16, cabac = true, aqp = true))
    frames.indices.foreach { i =>
      assert(java.util.Arrays.equals(dA(i).y, dB(i).y), s"frame $i luma")
      assert(java.util.Arrays.equals(dA(i).cb, dB(i).cb), s"frame $i cb")
      assert(java.util.Arrays.equals(dA(i).cr, dB(i).cr), s"frame $i cr")
    }
  }

  test("mid-band activity emits no deltas (aqp degenerates to constant QP)") {
    H264Codec.aqpDeltaCount.set(0)
    // every MB's activity sits in the neutral band (1024, 4096]: a
    // column-alternating +/-8 texture gives act = 256 * 8 = 2048
    val mid = (0 until 3).map { t =>
      val y = Array.tabulate(64 * 48)(i => (100 + 16 * ((i % 64) % 2) + t).toByte)
      Yuv(64, 48, y, Array.fill(32 * 24)(128.toByte), Array.fill(32 * 24)(128.toByte))
    }
    H264Codec.decode(H264Codec.encode(mid, qp = 16, aqp = true))
    assert(H264Codec.aqpDeltaCount.get() == 0,
      "uniform mid-band activity must keep every MB at the slice QP")
  }

  test("non-aqp streams stay byte-identical to the pre-aqp encoder") {
    // the aqp flag must be a pure superset: defaults untouched
    val a = H264Codec.encode(frames, qp = 12)
    val b = H264Codec.encode(frames, qp = 12, aqp = false)
    assert(java.util.Arrays.equals(a, b))
  }

  // ------------------------------------------------------- conformance

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  /** 2x1-MB Baseline SPS (32x16), poc type 2 — written field-by-field */
  private def handSps(): Array[Byte] = {
    val bw = new W.BitWriter
    bw.u(8, 66); bw.u(8, 0); bw.u(8, 10)
    bw.ue(0); bw.ue(0); bw.ue(2); bw.ue(1); bw.u1(0)
    bw.ue(1); bw.ue(0) // 2x1 MBs
    bw.u1(1); bw.u1(1); bw.u1(0); bw.u1(0)
    bw.rbspTrailing()
  }

  private def handPps(): Array[Byte] = {
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(0); bw.u1(0); bw.u1(0); bw.ue(0)
    bw.ue(0); bw.ue(0); bw.u1(0); bw.u(2, 0)
    bw.se(0); bw.se(0); bw.se(0) // pic_init_qp 26
    bw.u1(1); bw.u1(0); bw.u1(0)
    bw.rbspTrailing()
  }

  /** one I16 MB with DC-only luma residual `level` and mb_qp_delta */
  private def writeI16DcMb(bw: W.BitWriter, qpDelta: Int, level: Int, nC: Int): Unit = {
    bw.ue(3)       // mb_type I_16x16_2_0_0: DC pred, cbp luma 0 chroma 0
    bw.ue(0)       // intra_chroma_pred_mode DC
    bw.se(qpDelta) // mb_qp_delta
    val dc = new Array[Int](16)
    dc(0) = level
    H264Cavlc.writeBlock(bw, dc, nC) // luma DC block (always coded for I16)
  }

  /** Mid-slice QP step, expected pixels derived from the spec arithmetic
    * independently: MB0 codes a DC-only residual (level 8) at qp 26
    * (dequantLumaDc -> 8*13<<2 = 416; inverse impulse -> (416+32)>>6 = 7
    * on flat 128 prediction -> 135); MB1 carries mb_qp_delta +4 -> qp 30
    * and the SAME level now dequantizes to 8*10<<3 = 640 -> step 10 on
    * the 135 left-DC prediction -> 145. A decoder ignoring the delta
    * reconstructs 142 instead; one mis-threading deblock qp changes
    * nothing here (deblocking off) — the dequant path is what's pinned.
    */
  test("hand-built stream with a mid-slice QP step decodes to the spec pixels") {
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(7); bw.ue(0) // first_mb, I slice, pps
    bw.u(4, 0); bw.ue(0)         // frame_num, idr_pic_id
    bw.u1(0); bw.u1(0)           // no_output_of_prior_pics, long_term
    bw.se(0)                     // slice_qp_delta -> qp 26
    bw.ue(1)                     // deblocking OFF
    writeI16DcMb(bw, qpDelta = 0, level = 8, nC = 0)  // MB0 at qp 26
    writeI16DcMb(bw, qpDelta = 4, level = 8, nC = 0)  // MB1 at qp 30
    val stream = W.nal(3, 7, handSps()) ++ W.nal(3, 8, handPps()) ++
      W.nal(3, 5, bw.rbspTrailing())
    assert(md5hex(stream) == "c2bdfbafba6504cbf9a64e0d6dfe29dc") // golden bytes
    val out = H264Codec.decode(stream)
    assert(out.size == 1)
    val y = out(0).y // 32x16
    for (r <- 0 until 16; c <- 0 until 16)
      assert((y(r * 32 + c) & 0xff) == 135, s"MB0 ($c,$r) must be flat 135 (qp 26)")
    for (r <- 0 until 16; c <- 16 until 32)
      assert((y(r * 32 + c) & 0xff) == 145, s"MB1 ($c,$r) must be flat 145 (qp 30)")
    assert(out(0).cb.forall(b => (b & 0xff) == 128))
    assert(out(0).cr.forall(b => (b & 0xff) == 128))
  }

  /** chroma_qp_index_offset (§8.5, round 15 — previously parsed and
    * IGNORED, a silent wrong decode on foreign streams): a 1x1-MB stream
    * whose PPS carries offset +12 codes a chroma-DC-only I16 residual.
    * QPc = Table 8-15 at 26+12 = 35, so dc level 4 dequantizes to 1152
    * and steps chroma by (1152+32)>>6 = 18 -> flat 146. A decoder
    * ignoring the offset dequantizes at QPc 26 and lands on 135.
    */
  test("hand-built stream with chroma_qp_index_offset dequantizes chroma at the shifted QP") {
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
      bw.se(0); bw.se(0)
      bw.se(12) // chroma_qp_index_offset +12
      bw.u1(1); bw.u1(0); bw.u1(0)
      bw.rbspTrailing()
    }
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(7); bw.ue(0)
    bw.u(4, 0); bw.ue(0)
    bw.u1(0); bw.u1(0)
    bw.se(0); bw.ue(1) // qp 26, deblocking OFF
    bw.ue(7) // mb_type I_16x16_2_1_0: DC pred, cbp luma 0 chroma 1
    bw.ue(0) // intra_chroma_pred_mode DC
    bw.se(0) // mb_qp_delta
    H264Cavlc.writeBlock(bw, new Array[Int](16), 0) // zero luma DC
    val dc = Array(4, 0, 0, 0)
    H264Cavlc.writeBlock(bw, dc, -1) // Cb DC
    H264Cavlc.writeBlock(bw, dc, -1) // Cr DC
    val stream = W.nal(3, 7, sps) ++ W.nal(3, 8, pps) ++
      W.nal(3, 5, bw.rbspTrailing())
    val out = H264Codec.decode(stream)
    assert(out.size == 1)
    assert(out(0).y.forall(b => (b & 0xff) == 128))
    assert(out(0).cb.forall(b => (b & 0xff) == 146),
      "QPc must shift by the PPS chroma offset (146, not the unshifted 135)")
    assert(out(0).cr.forall(b => (b & 0xff) == 146))
  }

  /** second_chroma_qp_index_offset (§7.3.2.2, round 15 — a DISTINCT Cr
    * offset was previously refused): offsets (+12, 0) must dequantize
    * the SAME dc level to 146 on Cb (QPc 35) but 135 on Cr (QPc 26),
    * through per-plane QPc threading in dequant AND deblock thresholds.
    */
  test("hand-built stream with a distinct second_chroma_qp_index_offset splits the planes") {
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
      bw.se(0); bw.se(0)
      bw.se(12) // chroma_qp_index_offset +12 (Cb)
      bw.u1(1); bw.u1(0); bw.u1(0)
      bw.u1(0)  // transform_8x8_mode_flag (extension trio present)
      bw.u1(0)  // pic_scaling_matrix_present_flag
      bw.se(0)  // second_chroma_qp_index_offset 0 (Cr)
      bw.rbspTrailing()
    }
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(7); bw.ue(0)
    bw.u(4, 0); bw.ue(0)
    bw.u1(0); bw.u1(0)
    bw.se(0); bw.ue(1) // qp 26, deblocking OFF
    bw.ue(7) // mb_type I_16x16_2_1_0: DC pred, cbp luma 0 chroma 1
    bw.ue(0) // intra_chroma_pred_mode DC
    bw.se(0) // mb_qp_delta
    H264Cavlc.writeBlock(bw, new Array[Int](16), 0) // zero luma DC
    val dc = Array(4, 0, 0, 0)
    H264Cavlc.writeBlock(bw, dc, -1) // Cb DC
    H264Cavlc.writeBlock(bw, dc, -1) // Cr DC
    val stream = W.nal(3, 7, sps) ++ W.nal(3, 8, pps) ++
      W.nal(3, 5, bw.rbspTrailing())
    val out = H264Codec.decode(stream)
    assert(out.size == 1)
    assert(out(0).y.forall(b => (b & 0xff) == 128))
    assert(out(0).cb.forall(b => (b & 0xff) == 146),
      "Cb must dequantize at QPc 35 (first offset +12)")
    assert(out(0).cr.forall(b => (b & 0xff) == 135),
      "Cr must dequantize at QPc 26 (second offset 0), not follow Cb")
  }

  test("an out-of-range mb_qp_delta is refused loudly, not wrapped silently") {
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(7); bw.ue(0)
    bw.u(4, 0); bw.ue(0)
    bw.u1(0); bw.u1(0)
    bw.se(0); bw.ue(1)
    writeI16DcMb(bw, qpDelta = 0, level = 8, nC = 0)
    writeI16DcMb(bw, qpDelta = 26, level = 8, nC = 0) // spec max is +25
    val stream = W.nal(3, 7, handSps()) ++ W.nal(3, 8, handPps()) ++
      W.nal(3, 5, bw.rbspTrailing())
    val e = intercept[IllegalArgumentException](H264Codec.decode(stream))
    assert(e.getMessage.contains("mb_qp_delta"))
  }
}
