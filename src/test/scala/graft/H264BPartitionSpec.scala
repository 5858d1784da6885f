package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264Codec, H264Writer => W}
import graft.sources.H264Codec.Yuv

/** B-slice sub-16x16 partitions (round 15, Table 7-14 / 7-18): the
  * two-partition B types (every L0/L1/Bi pairing at 16x8 and 8x16) and
  * B_8x8 sub-MBs (direct / L0 / L1 / Bi at 8x8, 8x4, 4x8, 4x4) in both
  * entropy layers — real B streams partition routinely; after round 14
  * only P slices did. The encoder competes 16x8 / 8x16 / B_8x8 (8x8
  * subs) per B MB, each partition picking L0 / L1 / Bi independently;
  * the decoder accepts every shape. Reference: FFmpeg decodes these
  * behind `scanner/video/decoder_automata.h:28-51`.
  */
class H264BPartitionSpec extends AnyFunSuite {

  /** top half tracks the past anchor, bottom half the future one —
    * divergent per-half motion that only a 16x8 split codes cheaply */
  private def split(w: Int, h: Int, t: Int): Yuv = {
    val y = Array.tabulate(w * h) { i =>
      val x = i % w; val r = i / w
      val dx = if (r < h / 2) 3 * t else -3 * t
      (90 + math.floorMod(x - dx, 31) * 5 + (r % 5) * 2).toByte
    }
    Yuv(w, h, y, Array.fill(w / 2 * h / 2)(121.toByte),
      Array.fill(w / 2 * h / 2)(133.toByte))
  }

  private def frames: Seq[Yuv] = (0 until 7).map(t => split(64, 48, t))

  private def mse(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) & 0xff) - (b(i) & 0xff); s += d * d; i += 1 }
    s / a.length
  }

  test("B partitions engage and round-trip (both entropy layers)") {
    for (cabac <- Seq(false, true)) {
      H264Codec.bPartMbCount.set(0)
      val dec = H264Codec.decode(H264Codec.encode(frames, qp = 14,
        bframes = true, parts = true, cabac = cabac))
      assert(H264Codec.bPartMbCount.get() > 0,
        s"cabac=$cabac: divergent-half motion must fragment B MBs")
      assert(dec.size == frames.size)
      dec.indices.foreach(i => assert(mse(frames(i).y, dec(i).y) < 10.0,
        s"cabac=$cabac frame $i poor reconstruction"))
    }
  }

  test("CAVLC and CABAC B-partition streams decode to identical pixels") {
    val dA = H264Codec.decode(H264Codec.encode(frames, qp = 14,
      bframes = true, parts = true))
    val dB = H264Codec.decode(H264Codec.encode(frames, qp = 14,
      bframes = true, parts = true, cabac = true))
    frames.indices.foreach { i =>
      assert(java.util.Arrays.equals(dA(i).y, dB(i).y), s"frame $i luma")
      assert(java.util.Arrays.equals(dA(i).cb, dB(i).cb), s"frame $i cb")
      assert(java.util.Arrays.equals(dA(i).cr, dB(i).cr), s"frame $i cr")
    }
  }

  test("bframes without parts stays byte-identical to the pre-B-partition encoder") {
    val a = H264Codec.encode(frames, qp = 12, bframes = true)
    val b = H264Codec.encode(frames, qp = 12, bframes = true, parts = false)
    assert(java.util.Arrays.equals(a, b))
  }

  test("every Table 9-37/9-38 B binarization round-trips through the CABAC pair") {
    assert(H264Codec.cabacBTypeRoundtripForTest())
  }

  // ------------------------------------------------------- conformance

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  /** 64x16 (4 MBs), poc type 0 (4-bit lsb), 2-deep DPB — the anchor
    * scaffolding of the round-14 B conformance stream, one MB wider */
  private val mbs = 4

  private def sps(): Array[Byte] = {
    val bw = new W.BitWriter
    bw.u(8, 66); bw.u(8, 0); bw.u(8, 10)
    bw.ue(0); bw.ue(0); bw.ue(0); bw.ue(0)
    bw.ue(2); bw.u1(0)
    bw.ue(mbs - 1); bw.ue(0)
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

  private def pat(mul: Int, add: Int, n: Int) =
    Array.tabulate(n)(i => ((mul * i + add) % 256).toByte)

  private def pcmPicture(idr: Boolean, frameNum: Int, pocLsb: Int,
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

  /** Every MV is (0,0) — every §8.4.1.3 predictor then resolves to
    * (0,0) whatever the reference-match path, so mvd 0 everywhere and
    * the expected pixels are pure region copies: L0 regions show anchor
    * A, L1 regions anchor B, Bi regions the rounded average. What the
    * stream pins is therefore the partition GEOMETRY and per-partition
    * LIST ROUTING of all four Table 7-18 shapes and two mixed Table
    * 7-14 types — any mis-parse shears a region onto the wrong anchor.
    */
  test("hand-built B stream: every partition shape and list routing") {
    val lumaA = pat(7, 13, 256 * mbs); val lumaB = pat(11, 40, 256 * mbs)
    val cbA = pat(5, 1, 64 * mbs); val cbB = pat(3, 9, 64 * mbs)
    val bPicture = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(6); bw.ue(0) // first_mb, B slice, pps
      bw.u(4, 2); bw.u(4, 2)       // frame_num, poc BETWEEN anchors
      bw.u1(1)                     // direct_spatial_mv_pred_flag
      bw.u1(0)                     // num_ref_idx override (1/1)
      bw.u1(0); bw.u1(0)           // no list modification
      bw.se(0); bw.ue(1)           // qp 26, deblocking OFF
      // MB0: B_L0_L1_16x8 (mb_type 8): top half <- A, bottom <- B
      bw.ue(0)                     // mb_skip_run
      bw.ue(8)
      bw.se(0); bw.se(0)           // mvd_l0 partition 0
      bw.se(0); bw.se(0)           // mvd_l1 partition 1
      bw.ue(0)                     // cbp 0
      // MB1: B_L1_L0_8x16 (mb_type 11): left half <- B, right <- A
      bw.ue(0)
      bw.ue(11)
      bw.se(0); bw.se(0)           // mvd_l0 partition 1
      bw.se(0); bw.se(0)           // mvd_l1 partition 0
      bw.ue(0)
      // MB2: B_8x8, sub types [L0_8x8, L1_8x4, Bi_4x8, Bi_4x4]:
      // TL <- A, TR <- B, BL <- avg, BR <- avg — all four shapes
      bw.ue(0)
      bw.ue(22)
      bw.ue(1); bw.ue(6); bw.ue(9); bw.ue(12)
      // mvd_l0: TL 1 pair + BL 2 pairs + BR 4 pairs
      (0 until 7).foreach(_ => { bw.se(0); bw.se(0) })
      // mvd_l1: TR 2 pairs + BL 2 pairs + BR 4 pairs
      (0 until 8).foreach(_ => { bw.se(0); bw.se(0) })
      bw.ue(0)
      // MB3: B_8x8 all B_Direct_8x8. Spatial derivation samples
      // neighbour A = MB2's top-right 4x4 cell, which the L1-only 8x4
      // quadrant owns (ref0 -1, ref1 0) with B/C unavailable on the top
      // row — so MinPositive yields an L1-ONLY direct at (0,0): a copy
      // of anchor B, NOT the bi average (a decoder that derives direct
      // refs from the MB-level 16x16 state instead of the partitioned
      // neighbour cell gets avg here and fails)
      bw.ue(0)
      bw.ue(22)
      bw.ue(0); bw.ue(0); bw.ue(0); bw.ue(0)
      bw.ue(0)
      W.nal(0, 1, bw.rbspTrailing())
    }
    val stream = W.nal(3, 7, sps()) ++ W.nal(3, 8, pps()) ++
      pcmPicture(idr = true, 0, 0, lumaA, cbA, cbA) ++
      pcmPicture(idr = false, 1, 4, lumaB, cbB, cbB) ++
      bPicture
    assert(md5hex(stream) == "5df75dbddc262ff10b01afb0a894c86c") // golden bytes
    val out = H264Codec.decode(stream)
    assert(out.size == 3)
    assert(out(0).y.toSeq == lumaA.toSeq)
    assert(out(2).y.toSeq == lumaB.toSeq)
    def avg(a: Byte, b: Byte) = (((a & 0xff) + (b & 0xff) + 1) >> 1).toByte
    val w = 16 * mbs
    val bY = out(1).y
    def expectY(r: Int, c: Int): Byte = {
      val mb = c / 16; val cx = c % 16
      mb match {
        case 0 => if (r < 8) lumaA(r * w + c) else lumaB(r * w + c)
        case 1 => if (cx < 8) lumaB(r * w + c) else lumaA(r * w + c)
        case 2 =>
          if (r < 8 && cx < 8) lumaA(r * w + c)
          else if (r < 8) lumaB(r * w + c)
          else avg(lumaA(r * w + c), lumaB(r * w + c))
        case _ => lumaB(r * w + c) // L1-only spatial direct (see above)
      }
    }
    for (r <- 0 until 16; c <- 0 until w)
      assert(bY(r * w + c) == expectY(r, c),
        s"luma ($r,$c): partition geometry / list routing mis-decoded")
    val cw = 8 * mbs
    val bCb = out(1).cb
    def expectC(r: Int, c: Int): Byte = {
      val mb = c / 8; val cx = c % 8
      mb match {
        case 0 => if (r < 4) cbA(r * cw + c) else cbB(r * cw + c)
        case 1 => if (cx < 4) cbB(r * cw + c) else cbA(r * cw + c)
        case 2 =>
          if (r < 4 && cx < 4) cbA(r * cw + c)
          else if (r < 4) cbB(r * cw + c)
          else avg(cbA(r * cw + c), cbB(r * cw + c))
        case _ => cbB(r * cw + c) // L1-only spatial direct
      }
    }
    for (r <- 0 until 8; c <- 0 until cw)
      assert(bCb(r * cw + c) == expectC(r, c), s"chroma ($r,$c)")
  }

  /** B reference lists deeper than 1 (round 15 — previously refused):
    * three I_PCM anchors A(poc 0) / B(poc 4) / C(poc 8) and a B picture
    * at poc 6 overriding actives to (2,1): L0 = [B, A] (closer past
    * first), L1 = [C]. Its four MBs select by ref_idx: L0 ref 1 -> A,
    * L0 ref 0 -> B, L1 -> C, Bi(ref0 1) -> avg(A, C) — a decoder
    * ignoring the te(v) ref_idx bits (the old 1-deep assumption)
    * desyncs the parse or shears every region onto the wrong anchor.
    */
  test("hand-built B stream with num_ref_idx_l0_active 2 selects by ref_idx") {
    val sps3 = {
      val bw = new W.BitWriter
      bw.u(8, 66); bw.u(8, 0); bw.u(8, 10)
      bw.ue(0); bw.ue(0); bw.ue(0); bw.ue(0)
      bw.ue(3); bw.u1(0) // max_num_ref_frames 3
      bw.ue(mbs - 1); bw.ue(0)
      bw.u1(1); bw.u1(1); bw.u1(0); bw.u1(0)
      bw.rbspTrailing()
    }
    val lumaA = pat(7, 13, 256 * mbs); val lumaB = pat(11, 40, 256 * mbs)
    val lumaC = pat(13, 77, 256 * mbs)
    val cbA = pat(5, 1, 64 * mbs); val cbB = pat(3, 9, 64 * mbs)
    val cbC = pat(9, 21, 64 * mbs)
    val bPicture = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(6); bw.ue(0)
      bw.u(4, 3); bw.u(4, 6) // frame_num, poc 6
      bw.u1(1)               // direct_spatial
      bw.u1(1); bw.ue(1); bw.ue(0) // override: actives (2, 1)
      bw.u1(0); bw.u1(0)     // no list modification
      bw.se(0); bw.ue(1)
      // MB0: B_L0_16x16, ref_idx_l0 = 1 (te inverted bit 0) -> A
      bw.ue(0); bw.ue(1); bw.u1(0); bw.se(0); bw.se(0); bw.ue(0)
      // MB1: B_L0_16x16, ref_idx_l0 = 0 (te bit 1) -> B
      bw.ue(0); bw.ue(1); bw.u1(1); bw.se(0); bw.se(0); bw.ue(0)
      // MB2: B_L1_16x16 (L1 actives 1: no ref bits) -> C
      bw.ue(0); bw.ue(2); bw.se(0); bw.se(0); bw.ue(0)
      // MB3: B_Bi_16x16, ref0 = 1, ref1 = 0 -> avg(A, C)
      bw.ue(0); bw.ue(3); bw.u1(0); bw.se(0); bw.se(0); bw.se(0); bw.se(0); bw.ue(0)
      W.nal(0, 1, bw.rbspTrailing())
    }
    val stream = W.nal(3, 7, sps3) ++ W.nal(3, 8, pps()) ++
      pcmPicture(idr = true, 0, 0, lumaA, cbA, cbA) ++
      pcmPicture(idr = false, 1, 4, lumaB, cbB, cbB) ++
      pcmPicture(idr = false, 2, 8, lumaC, cbC, cbC) ++
      bPicture
    val out = H264Codec.decode(stream)
    assert(out.size == 4)
    assert(out(0).y.toSeq == lumaA.toSeq)
    assert(out(1).y.toSeq == lumaB.toSeq)
    assert(out(3).y.toSeq == lumaC.toSeq)
    def avg(a: Byte, b: Byte) = (((a & 0xff) + (b & 0xff) + 1) >> 1).toByte
    val w = 16 * mbs
    val bY = out(2).y
    for (r <- 0 until 16; c <- 0 until w) {
      val exp = (c / 16) match {
        case 0 => lumaA(r * w + c)
        case 1 => lumaB(r * w + c)
        case 2 => lumaC(r * w + c)
        case _ => avg(lumaA(r * w + c), lumaC(r * w + c))
      }
      assert(bY(r * w + c) == exp, s"luma ($r,$c): ref_idx routing mis-decoded")
    }
  }

  test("a B sub_mb_type beyond Table 7-18 is refused loudly") {
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(6); bw.ue(0)
    bw.u(4, 2); bw.u(4, 2)
    bw.u1(1); bw.u1(0); bw.u1(0); bw.u1(0)
    bw.se(0); bw.ue(1)
    bw.ue(0); bw.ue(22)
    bw.ue(13); bw.ue(0); bw.ue(0); bw.ue(0) // sub type 13: out of range
    val lumaA = pat(7, 13, 256 * mbs); val cbA = pat(5, 1, 64 * mbs)
    val stream = W.nal(3, 7, sps()) ++ W.nal(3, 8, pps()) ++
      pcmPicture(idr = true, 0, 0, lumaA, cbA, cbA) ++
      pcmPicture(idr = false, 1, 4, lumaA, cbA, cbA) ++
      W.nal(0, 1, bw.rbspTrailing())
    val e = intercept[IllegalArgumentException](H264Codec.decode(stream))
    assert(e.getMessage.contains("sub_mb_type"))
  }
}
