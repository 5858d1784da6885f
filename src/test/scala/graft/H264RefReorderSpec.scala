package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264Cavlc, H264Codec, H264Writer => W}
import graft.sources.H264Codec.Yuv

/** ref_pic_list_modification (round 15, §7.3.3.1 + §8.2.4.3): the
  * short-term reordering ops real encoders emit whenever the default
  * recency order isn't the best prediction order. The decoder applies
  * arbitrary op sequences (P list and both B lists, picNum wrap
  * included); the `reorder` capability self-hosts the gate tier by
  * swapping the two multiRef references and signalling the swap.
  * Reference equivalent: FFmpeg reorders behind
  * `scanner/video/decoder_automata.h:28-51`.
  */
class H264RefReorderSpec extends AnyFunSuite {

  /** drifting gradient + a static corner so both references stay useful */
  private def frames: Seq[Yuv] = (0 until 6).map { t =>
    val y = Array.tabulate(64 * 48) { i =>
      val x = i % 64; val r = i / 64
      if (x < 16 && r < 16) 200.toByte
      else (96 + ((x + 3 * t) % 48) + (r % 9)).toByte
    }
    Yuv(64, 48, y, Array.fill(32 * 24)(118.toByte), Array.fill(32 * 24)(136.toByte))
  }

  private def mse(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) & 0xff) - (b(i) & 0xff); s += d * d; i += 1 }
    s / a.length
  }

  test("reorder streams carry modification ops and round-trip (both entropy layers)") {
    for (cabac <- Seq(false, true)) {
      H264Codec.refModCount.set(0)
      val dec = H264Codec.decode(H264Codec.encode(frames, qp = 16,
        cabac = cabac, multiRef = true, reorder = true))
      assert(H264Codec.refModCount.get() >= 4,
        s"cabac=$cabac: every P slice past the second frame must reorder")
      assert(dec.size == frames.size)
      dec.indices.foreach(i => assert(mse(frames(i).y, dec(i).y) < 40.0,
        s"cabac=$cabac frame $i poor reconstruction"))
    }
  }

  test("CAVLC and CABAC reorder streams decode to identical pixels") {
    val dA = H264Codec.decode(H264Codec.encode(frames, qp = 16,
      multiRef = true, reorder = true))
    val dB = H264Codec.decode(H264Codec.encode(frames, qp = 16,
      cabac = true, multiRef = true, reorder = true))
    frames.indices.foreach { i =>
      assert(java.util.Arrays.equals(dA(i).y, dB(i).y), s"frame $i luma")
      assert(java.util.Arrays.equals(dA(i).cb, dB(i).cb), s"frame $i cb")
      assert(java.util.Arrays.equals(dA(i).cr, dB(i).cr), s"frame $i cr")
    }
  }

  test("non-reorder streams stay byte-identical to the pre-reorder encoder") {
    val a = H264Codec.encode(frames, qp = 12, multiRef = true)
    val b = H264Codec.encode(frames, qp = 12, multiRef = true, reorder = false)
    assert(java.util.Arrays.equals(a, b))
  }

  // ------------------------------------------------------- conformance

  /** Baseline 1x1-MB SPS (16x16), poc type 2, 2-deep DPB, 12-bit
    * frame_num */
  private def sps2ref(): Array[Byte] = {
    val bw = new W.BitWriter
    bw.u(8, 66); bw.u(8, 0); bw.u(8, 10)
    bw.ue(0); bw.ue(8); bw.ue(2); bw.ue(2); bw.u1(0)
    bw.ue(0); bw.ue(0) // 1x1 MBs
    bw.u1(1); bw.u1(1); bw.u1(0); bw.u1(0)
    bw.rbspTrailing()
  }

  private def pps(): Array[Byte] = {
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(0); bw.u1(0); bw.u1(0); bw.ue(0)
    bw.ue(0); bw.ue(0); bw.u1(0); bw.u(2, 0)
    bw.se(0); bw.se(0); bw.se(0)
    bw.u1(1); bw.u1(0); bw.u1(0)
    bw.rbspTrailing()
  }

  /** IDR: one I16 DC-pred MB, zero residual -> flat 128 */
  private def idrSlice(): Array[Byte] = {
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(7); bw.ue(0)
    bw.u(12, 0); bw.ue(0)
    bw.u1(0); bw.u1(0)
    bw.se(0); bw.ue(1)
    bw.ue(3); bw.ue(0); bw.se(0)
    H264Cavlc.writeBlock(bw, new Array[Int](16), 0)
    bw.rbspTrailing()
  }

  /** P1: one intra-in-P I16 MB with DC level 8 -> flat 135 */
  private def p1Slice(): Array[Byte] = {
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(5); bw.ue(0)
    bw.u(12, 1)
    bw.u1(0) // num_ref_idx override
    bw.u1(0) // ref_pic_list_modification_flag_l0
    bw.u1(0) // adaptive_ref_pic_marking
    bw.se(0); bw.ue(1)
    bw.ue(0)     // mb_skip_run
    bw.ue(5 + 3) // P mb_type 8 = intra I_16x16_2_0_0
    bw.ue(0); bw.se(0)
    val dc = new Array[Int](16); dc(0) = 8
    H264Cavlc.writeBlock(bw, dc, 0)
    bw.rbspTrailing()
  }

  /** P2: list modification targets the IDR (picNum 0: abs_diff 2), then
    * one P_Skip MB — copies list[0], which the modification made the
    * IDR, not the default most-recent P1 */
  private def p2Slice(modify: Boolean): Array[Byte] = {
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(5); bw.ue(0)
    bw.u(12, 2)
    bw.u1(0) // num_ref_idx override
    if (modify) {
      bw.u1(1)
      bw.ue(0); bw.ue(1) // idc 0, abs_diff_pic_num_minus1 1 -> picNum 0
      bw.ue(3)           // end
    } else bw.u1(0)
    bw.u1(0) // adaptive_ref_pic_marking
    bw.se(0); bw.ue(1)
    bw.ue(1) // mb_skip_run: the whole (1-MB) picture is P_Skip
    bw.rbspTrailing()
  }

  test("hand-built stream: a modification op retargets P_Skip at the IDR") {
    val stream = W.nal(3, 7, sps2ref()) ++ W.nal(3, 8, pps()) ++
      W.nal(3, 5, idrSlice()) ++ W.nal(2, 1, p1Slice()) ++
      W.nal(2, 1, p2Slice(modify = true))
    val out = H264Codec.decode(stream)
    assert(out.size == 3)
    assert(out(0).y.forall(b => (b & 0xff) == 128), "IDR flat 128")
    assert(out(1).y.forall(b => (b & 0xff) == 135), "P1 flat 135")
    assert(out(2).y.forall(b => (b & 0xff) == 128),
      "P2 must skip-copy the REORDERED list head (the IDR, 128) — 135 " +
        "means the modification was ignored")
    // and the unmodified twin proves the default order really differs
    val plain = W.nal(3, 7, sps2ref()) ++ W.nal(3, 8, pps()) ++
      W.nal(3, 5, idrSlice()) ++ W.nal(2, 1, p1Slice()) ++
      W.nal(2, 1, p2Slice(modify = false))
    val out2 = H264Codec.decode(plain)
    assert(out2(2).y.forall(b => (b & 0xff) == 135),
      "without modification P_Skip copies the most recent reference (135)")
  }

  test("long-term modification ops are refused loudly") {
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(5); bw.ue(0)
    bw.u(12, 2)
    bw.u1(0)
    bw.u1(1)
    bw.ue(2); bw.ue(0) // idc 2: long_term_pic_num
    bw.ue(3)
    bw.u1(0); bw.se(0); bw.ue(1); bw.ue(1)
    val stream = W.nal(3, 7, sps2ref()) ++ W.nal(3, 8, pps()) ++
      W.nal(3, 5, idrSlice()) ++ W.nal(2, 1, p1Slice()) ++
      W.nal(2, 1, bw.rbspTrailing())
    val e = intercept[RuntimeException](H264Codec.decode(stream))
    assert(e.getMessage.contains("long-term"))
  }

  test("a modification targeting a picNum outside the DPB is refused loudly") {
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(5); bw.ue(0)
    bw.u(12, 2)
    bw.u1(0)
    bw.u1(1)
    bw.ue(0); bw.ue(5) // abs_diff 6 -> picNum -4: no such reference
    bw.ue(3)
    bw.u1(0); bw.se(0); bw.ue(1); bw.ue(1)
    val stream = W.nal(3, 7, sps2ref()) ++ W.nal(3, 8, pps()) ++
      W.nal(3, 5, idrSlice()) ++ W.nal(2, 1, p1Slice()) ++
      W.nal(2, 1, bw.rbspTrailing())
    val e = intercept[RuntimeException](H264Codec.decode(stream))
    assert(e.getMessage.contains("not in the DPB"))
  }
}
