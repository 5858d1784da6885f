package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264Codec, H264Writer => W}
import graft.sources.H264Codec.Yuv

/** Sub-16x16 inter partitions (round 14): P_L0_L0_16x8 / P_L0_L0_8x16 /
  * P_8x8 (+ 8x4/4x8/4x4 sub-partitions and P_8x8ref0 on the decode
  * side), §8.4.1.3 partition-granular MV prediction, per-edge boundary
  * strengths. Reference equivalent: scanner decodes partitioned streams
  * via FFmpeg (scanner/video/software/software_video_decoder.cpp); this
  * makes the near-universal real-stream syntax a first-class store tier.
  */
class H264PartitionSpec extends AnyFunSuite {

  /** two half-frames translating in OPPOSITE directions: a single 16x16
    * MV cannot fit MBs straddling the divide, so the partition
    * competition must engage */
  private def shearYuv(w: Int, h: Int, t: Int): Yuv = {
    def base(x: Int, y: Int): Int =
      (128 + 55 * math.sin(0.31 * x + 0.17 * y) * math.cos(0.23 * y - 0.11 * x)
        + 45 * math.sin(0.13 * x) * math.sin(0.19 * y)).round.toInt.max(0).min(255)
    val yb = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (y < h / 2) base(x + 2 * t, y).toByte else base(x - 2 * t, y).toByte
    }
    Yuv(w, h, yb, Array.fill(w / 2 * h / 2)(128.toByte),
      Array.fill(w / 2 * h / 2)(128.toByte))
  }

  private def mse(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) & 0xff) - (b(i) & 0xff); s += d * d; i += 1 }
    s / a.length
  }

  test("parts tier round-trips and the competition engages (both entropy layers)") {
    val frames = (0 until 5).map(t => shearYuv(64, 48, t))
    for (cabac <- Seq(false, true)) {
      H264Codec.partMbCount.set(0)
      val stream = H264Codec.encode(frames, qp = 12, parts = true, cabac = cabac)
      assert(H264Codec.partMbCount.get() > 0,
        s"cabac=$cabac: shear motion must trigger partitioned MBs")
      val dec = H264Codec.decode(stream)
      assert(dec.size == frames.size)
      dec.indices.foreach(i => assert(mse(frames(i).y, dec(i).y) < 6.0,
        s"cabac=$cabac frame $i poor reconstruction"))
    }
  }

  test("CAVLC and CABAC parts streams decode to identical pixels (all planes)") {
    val frames = (0 until 5).map(t => shearYuv(64, 48, t))
    val dA = H264Codec.decode(H264Codec.encode(frames, qp = 12, parts = true))
    val dB = H264Codec.decode(
      H264Codec.encode(frames, qp = 12, parts = true, cabac = true))
    frames.indices.foreach { i =>
      assert(java.util.Arrays.equals(dA(i).y, dB(i).y), s"frame $i luma")
      assert(java.util.Arrays.equals(dA(i).cb, dB(i).cb), s"frame $i cb")
      assert(java.util.Arrays.equals(dA(i).cr, dB(i).cr), s"frame $i cr")
    }
  }

  test("parts beats 16x16-only on shear motion (compression evidence)") {
    val frames = (0 until 8).map(t => shearYuv(64, 48, t))
    val plain = H264Codec.encode(frames, qp = 12)
    val split = H264Codec.encode(frames, qp = 12, parts = true)
    assert(split.length < plain.length,
      s"parts ${split.length} B must beat 16x16-only ${plain.length} B on shear motion")
  }

  test("parts composes with B-frame GOPs") {
    val frames = (0 until 7).map(t => shearYuv(64, 48, t))
    H264Codec.partMbCount.set(0)
    val dec = H264Codec.decode(
      H264Codec.encode(frames, qp = 12, parts = true, bframes = true))
    assert(H264Codec.partMbCount.get() > 0)
    assert(dec.size == frames.size)
    dec.indices.foreach(i => assert(mse(frames(i).y, dec(i).y) < 6.0, s"frame $i"))
  }

  // ------------------------------------------------------- conformance

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  /** Hand-built CAVLC stream (48x16, 3 MBs): I_PCM IDR, then a P picture
    * whose three MBs exercise EVERY partition shape the decoder claims —
    * P_L0_L0_16x8, P_L0_L0_8x16, and P_8x8ref0 with sub_mb_types
    * [8x8, 8x4, 4x8, 4x4]. All MVs are multiples of 8 quarter-pel
    * (integer luma AND chroma displacement), cbp 0 everywhere, so the
    * expected pixels are pure clamped-copy spec arithmetic the test
    * derives independently from the per-block MV table. The mvd values
    * encode AGAINST the §8.4.1.3 predictors (median, the b/c-absent
    * A-shortcut, the 16x8/8x16 directional rules), so a predictor bug
    * shifts pixels and fails loudly.
    */
  test("hand-built mixed-partition P stream decodes to spec-derived pixels") {
    val mbs = 3
    val w = 16 * mbs; val h = 16
    val cw = w / 2; val ch = h / 2
    def pat(mul: Int, add: Int, n: Int) =
      Array.tabulate(n)(i => ((mul * i + add) % 256).toByte)
    val lumaA = pat(7, 13, w * h)
    val cbA = pat(5, 1, cw * ch); val crA = pat(3, 9, cw * ch)
    val sps = {
      val bw = new W.BitWriter
      bw.u(8, 66); bw.u(8, 0); bw.u(8, 10)
      bw.ue(0)    // sps_id
      bw.ue(0)    // log2_max_frame_num_minus4 -> 4 bits
      bw.ue(2)    // pic_order_cnt_type 2
      bw.ue(1)    // max_num_ref_frames
      bw.u1(0)    // gaps_in_frame_num_value_allowed_flag
      bw.ue(mbs - 1); bw.ue(0) // 3x1 MBs
      bw.u1(1); bw.u1(1) // frame_mbs_only, direct_8x8_inference
      bw.u1(0); bw.u1(0) // no cropping, no VUI
      bw.rbspTrailing()
    }
    val pps = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(0)
      bw.u1(0)    // CAVLC
      bw.u1(0)
      bw.ue(0)    // one slice group
      bw.ue(0); bw.ue(0) // list defaults 1/1
      bw.u1(0); bw.u(2, 0)
      bw.se(0); bw.se(0); bw.se(0)
      bw.u1(1)    // deblocking control present
      bw.u1(0); bw.u1(0)
      bw.rbspTrailing()
    }
    val idr = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(7); bw.ue(0) // first_mb, slice_type I, pps_id
      bw.u(4, 0)                   // frame_num
      bw.ue(0)                     // idr_pic_id
      bw.u1(0); bw.u1(0)           // dec_ref_pic_marking (IDR)
      bw.se(0)                     // slice_qp_delta
      bw.ue(1)                     // deblocking OFF
      var mb = 0
      while (mb < mbs) {           // I_PCM per MB
        bw.ue(25); bw.alignZero()
        (0 until 256).foreach(i => bw.u(8, lumaA(i / 16 * w + mb * 16 + i % 16) & 0xff))
        (0 until 64).foreach(i => bw.u(8, cbA(i / 8 * cw + mb * 8 + i % 8) & 0xff))
        (0 until 64).foreach(i => bw.u(8, crA(i / 8 * cw + mb * 8 + i % 8) & 0xff))
        mb += 1
      }
      W.nal(3, 5, bw.rbspTrailing())
    }
    val p = {
      val bw = new W.BitWriter
      bw.ue(0); bw.ue(5); bw.ue(0) // first_mb, slice_type P, pps_id
      bw.u(4, 1)                   // frame_num
      bw.u1(0)                     // num_ref_idx_active_override (default 1)
      bw.u1(0)                     // ref_pic_list_modification_flag_l0
      bw.u1(0)                     // adaptive_ref_pic_marking_mode_flag
      bw.se(0)                     // slice_qp_delta
      bw.ue(1)                     // deblocking OFF
      // MB0: P_L0_L0_16x8. Top: pred (0,0) [no neighbours], mvd (8,0)
      // -> MV (8,0). Bottom: exactly-one-same-ref from the top
      // partition -> pred (8,0), mvd (-8,0) -> MV (0,0).
      bw.ue(0)  // mb_skip_run
      bw.ue(1)  // mb_type P_L0_L0_16x8
      bw.se(8); bw.se(0)   // mvd top
      bw.se(-8); bw.se(0)  // mvd bottom
      bw.ue(0)  // cbp 0
      // MB1: P_L0_L0_8x16. Left: the DIRECTIONAL rule takes A (MB0's
      // block (3,0), ref 0, MV (8,0)) -> pred (8,0), mvd (0,8) ->
      // MV (8,8). Right: C and D unavailable, B unavailable, A defined
      // -> A-shortcut pred = left partition (8,8), mvd (-8,-8) -> (0,0).
      bw.ue(0)
      bw.ue(2)  // mb_type P_L0_L0_8x16
      bw.se(0); bw.se(8)
      bw.se(-8); bw.se(-8)
      bw.ue(0)  // cbp 0
      // MB2: P_8x8ref0 with sub_mb_types [8x8, 8x4, 4x8, 4x4]; no
      // ref_idx fields (inferred 0). Predictors derived by hand per
      // §8.4.1.3 over the progressively-assigned cells:
      bw.ue(0)
      bw.ue(4)  // mb_type P_8x8ref0
      bw.ue(0); bw.ue(1); bw.ue(2); bw.ue(3) // sub_mb_types
      // sub0 8x8: A = MB1 right (0,0); B/C unavail -> A-shortcut (0,0);
      //   mvd (8,0) -> MV (8,0)
      bw.se(8); bw.se(0)
      // sub1 8x4 a: A = sub0 (8,0); B/C unavail -> (8,0); mvd (-8,0) -> (0,0)
      bw.se(-8); bw.se(0)
      // sub1 8x4 b: A = sub0 (8,0), B = 8x4a (0,0), C outside -> D =
      //   sub0 (8,0); median (8,0); mvd (0,8) -> (8,8)
      bw.se(0); bw.se(8)
      // sub2 4x8 a: A = MB1 right (0,0), B = sub0 (8,0), C = sub0 (8,0);
      //   median (8,0); mvd (-8,0) -> (0,0)
      bw.se(-8); bw.se(0)
      // sub2 4x8 b: A = 4x8a (0,0), B = sub0 (8,0), C = 8x4b (8,8);
      //   median (8,0); mvd (0,0) -> (8,0)
      bw.se(0); bw.se(0)
      // sub3 4x4 p0: A = 4x8b (8,0), B = 8x4b (8,8), C = 8x4b (8,8);
      //   median (8,8); mvd (0,-8) -> (8,0)
      bw.se(0); bw.se(-8)
      // p1: A = p0 (8,0), B = 8x4b (8,8), C outside -> D = 8x4b (8,8);
      //   median (8,8); mvd (-8,-8) -> (0,0)
      bw.se(-8); bw.se(-8)
      // p2: A = 4x8b (8,0), B = p0 (8,0), C = p1 (0,0); median (8,0);
      //   mvd (0,0) -> (8,0)
      bw.se(0); bw.se(0)
      // p3: A = p2 (8,0), B = p1 (0,0), C outside -> D = p0 (8,0);
      //   median (8,0); mvd (-8,0) -> (0,0)
      bw.se(-8); bw.se(0)
      bw.ue(0)  // cbp 0
      W.nal(2, 1, bw.rbspTrailing())
    }
    val stream = W.nal(3, 7, sps) ++ W.nal(3, 8, pps) ++ idr ++ p
    // golden byte literal: the constructed stream itself is pinned
    assert(md5hex(stream) == "33ad181af7bffaad8bb2b721818236be") // golden
    val out = H264Codec.decode(stream)
    assert(out.size == 2)
    assert(out(0).y.toSeq == lumaA.toSeq)
    // expected = clamped copy of the reference at each block's MV
    // (quarter-pel MVs here are all multiples of 8 -> integer luma and
    // chroma displacement)
    val blocks: Seq[(Int, Int, Int, Int, Int, Int)] = Seq( // x0,y0,w,h,dxPx,dyPx
      (0, 0, 16, 8, 2, 0), (0, 8, 16, 8, 0, 0),            // MB0 16x8
      (16, 0, 8, 16, 2, 2), (24, 0, 8, 16, 0, 0),          // MB1 8x16
      (32, 0, 8, 8, 2, 0),                                 // MB2 sub0
      (40, 0, 8, 4, 0, 0), (40, 4, 8, 4, 2, 2),            // sub1 8x4
      (32, 8, 4, 8, 0, 0), (36, 8, 4, 8, 2, 0),            // sub2 4x8
      (40, 8, 4, 4, 2, 0), (44, 8, 4, 4, 0, 0),            // sub3 4x4
      (40, 12, 4, 4, 2, 0), (44, 12, 4, 4, 0, 0))
    val gotY = out(1).y; val gotCb = out(1).cb; val gotCr = out(1).cr
    blocks.foreach { case (x0, y0, bw_, bh, dx, dy) =>
      (0 until bh).foreach { r =>
        (0 until bw_).foreach { c =>
          val sx = math.min(w - 1, math.max(0, x0 + c + dx))
          val sy = math.min(h - 1, math.max(0, y0 + r + dy))
          assert(gotY((y0 + r) * w + x0 + c) == lumaA(sy * w + sx),
            s"luma block ($x0,$y0,${bw_}x$bh) pixel ($r,$c)")
        }
      }
      // chroma: half geometry, half displacement
      (0 until bh / 2).foreach { r =>
        (0 until bw_ / 2).foreach { c =>
          val sx = math.min(cw - 1, math.max(0, x0 / 2 + c + dx / 2))
          val sy = math.min(ch - 1, math.max(0, y0 / 2 + r + dy / 2))
          assert(gotCb((y0 / 2 + r) * cw + x0 / 2 + c) == cbA(sy * cw + sx),
            s"cb block ($x0,$y0) pixel ($r,$c)")
          assert(gotCr((y0 / 2 + r) * cw + x0 / 2 + c) == crA(sy * cw + sx),
            s"cr block ($x0,$y0) pixel ($r,$c)")
        }
      }
    }
  }
}
