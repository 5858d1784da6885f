package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264Cavlc, H264Codec, H264Writer => W}

/** Decode-side conformance corpus (the closest offline proxy to running
  * a third-party encoder's output through the decoder): minimal
  * CONFORMANT bitstreams are constructed BY HAND here — SPS, PPS, and
  * slice headers written field-by-field per §7.3 with the ingest-side
  * bit primitives, never by the codec's own encoder — then decoded to
  * pixels the test derives from the spec's arithmetic independently.
  * The byte streams are additionally pinned by digest (golden
  * literals): any change in NAL escaping, header layout, or block
  * coding that alters the bytes or the decode flips the test.
  */
class H264ConformanceSpec extends AnyFunSuite {

  /** Baseline SPS written field-by-field (§7.3.2.1.1):
    * poc type 2, 4-bit frame_num, no cropping
    */
  private def handSps(mbW: Int, mbH: Int): Array[Byte] = {
    val bw = new W.BitWriter
    bw.u(8, 66) // profile_idc Baseline
    bw.u(8, 0)  // constraint flags
    bw.u(8, 10) // level 1.0
    bw.ue(0)    // seq_parameter_set_id
    bw.ue(0)    // log2_max_frame_num_minus4
    bw.ue(2)    // pic_order_cnt_type
    bw.ue(1)    // max_num_ref_frames
    bw.u1(0)    // gaps_in_frame_num_value_allowed_flag
    bw.ue(mbW - 1) // pic_width_in_mbs_minus1
    bw.ue(mbH - 1) // pic_height_in_map_units_minus1
    bw.u1(1)    // frame_mbs_only_flag
    bw.u1(1)    // direct_8x8_inference_flag
    bw.u1(0)    // frame_cropping_flag
    bw.u1(0)    // vui_parameters_present_flag
    bw.rbspTrailing()
  }

  /** CAVLC PPS written field-by-field (§7.3.2.2), pic_init_qp 26 */
  private def handPps(): Array[Byte] = {
    val bw = new W.BitWriter
    bw.ue(0)    // pic_parameter_set_id
    bw.ue(0)    // seq_parameter_set_id
    bw.u1(0)    // entropy_coding_mode_flag (CAVLC)
    bw.u1(0)    // bottom_field_pic_order_in_frame_present_flag
    bw.ue(0)    // num_slice_groups_minus1
    bw.ue(0); bw.ue(0) // num_ref_idx_l{0,1}_default_active_minus1
    bw.u1(0)    // weighted_pred_flag
    bw.u(2, 0)  // weighted_bipred_idc
    bw.se(0)    // pic_init_qp_minus26
    bw.se(0)    // pic_init_qs_minus26
    bw.se(0)    // chroma_qp_index_offset
    bw.u1(1)    // deblocking_filter_control_present_flag
    bw.u1(0)    // constrained_intra_pred_flag
    bw.u1(0)    // redundant_pic_cnt_present_flag
    bw.rbspTrailing()
  }

  /** IDR I-slice header (§7.3.3): first_mb 0, qp 26, deblocking OFF so
    * the expected pixels stay filter-free spec arithmetic
    */
  private def newIdrSlice(): W.BitWriter = {
    val bw = new W.BitWriter
    bw.ue(0)    // first_mb_in_slice
    bw.ue(7)    // slice_type: I (all slices of the picture)
    bw.ue(0)    // pic_parameter_set_id
    bw.u(4, 0)  // frame_num (log2_max_frame_num = 4)
    bw.ue(0)    // idr_pic_id
    bw.u1(0)    // no_output_of_prior_pics_flag
    bw.u1(0)    // long_term_reference_flag
    bw.se(0)    // slice_qp_delta -> qp 26
    bw.ue(1)    // disable_deblocking_filter_idc: OFF
    bw
  }

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  test("hand-built I_PCM stream decodes to exactly its raw samples") {
    val lumaPat = Array.tabulate(256)(i => ((7 * i + 13) % 256).toByte)
    val cbPat = Array.tabulate(64)(i => ((i * 5 + 1) % 256).toByte)
    val crPat = Array.tabulate(64)(i => ((i * 3 + 2) % 256).toByte)
    val bw = newIdrSlice()
    bw.ue(25)      // mb_type I_PCM
    bw.alignZero() // pcm_alignment_zero_bit(s)
    lumaPat.foreach(b => bw.u(8, b & 0xff))
    cbPat.foreach(b => bw.u(8, b & 0xff))
    crPat.foreach(b => bw.u(8, b & 0xff))
    val stream =
      W.nal(3, 7, handSps(1, 1)) ++ W.nal(3, 8, handPps()) ++
        W.nal(3, 5, bw.rbspTrailing())
    // golden byte literal: the constructed stream itself is pinned
    assert(md5hex(stream) == "d0e76856b707316e22d157df043db87e") // golden
    val out = H264Codec.decode(stream)
    assert(out.size == 1)
    assert(out.head.w == 16 && out.head.h == 16)
    assert(out.head.y.toSeq == lumaPat.toSeq)
    assert(out.head.cb.toSeq == cbPat.toSeq)
    assert(out.head.cr.toSeq == crPat.toSeq)
  }

  test("hand-built CAVLC Intra_16x16 two-MB stream decodes to spec-derived pixels") {
    val bw = newIdrSlice()
    // MB0: Intra_16x16, DC pred, cbp 0 -> mb_type 1 + 2 (DC) = 3;
    // luma DC block carries ONE +1 trailing-one coefficient. Expected
    // per §8.5: inverse Hadamard spreads 1 to every 4x4 DC, scaled
    // dequantLumaDc(1, 26) = 13 << 2 = 52, inverse transform
    // (52 + 32) >> 6 = +1 on the 128 DC prediction -> all 129.
    bw.ue(3)  // mb_type I_16x16_2_0_0 (DC, cbp luma 0, chroma 0)
    bw.ue(0)  // intra_chroma_pred_mode: DC
    bw.se(0)  // mb_qp_delta
    locally { // luma DC 4x4 block, nC 0 (no neighbors)
      val zig = new Array[Int](16); zig(0) = 1
      H264Cavlc.writeBlock(bw, zig, 0)
    }
    // MB1: same shape, all-zero DC block (nC 0: MB0 recorded 0 AC
    // coeffs). DC pred from MB0's left column (all 129) -> all 129.
    bw.ue(3)
    bw.ue(0)
    bw.se(0)
    locally {
      val zig = new Array[Int](16)
      H264Cavlc.writeBlock(bw, zig, 0)
    }
    val stream =
      W.nal(3, 7, handSps(2, 1)) ++ W.nal(3, 8, handPps()) ++
        W.nal(3, 5, bw.rbspTrailing())
    assert(md5hex(stream) == "a6ab9680d56a655e713569315816c048") // golden
    val out = H264Codec.decode(stream)
    assert(out.size == 1)
    assert(out.head.w == 32 && out.head.h == 16)
    assert(out.head.y.forall(b => (b & 0xff) == 129),
      s"luma must be uniformly 129, got ${out.head.y.take(8).map(_ & 0xff).mkString(",")}")
    assert(out.head.cb.forall(b => (b & 0xff) == 128))
    assert(out.head.cr.forall(b => (b & 0xff) == 128))
  }

  test("hand-built multi-reference stream: ref_idx_l0 = 1 selects the picture TWO back") {
    // SPS with a 2-deep DPB, PPS with num_ref_idx_l0_default_active 2
    val sps = {
      val bw = new W.BitWriter
      bw.u(8, 66); bw.u(8, 0); bw.u(8, 10)
      bw.ue(0)    // sps_id
      bw.ue(0)    // log2_max_frame_num_minus4 -> 4 bits
      bw.ue(2)    // pic_order_cnt_type
      bw.ue(2)    // max_num_ref_frames: TWO short-term pictures
      bw.u1(0)    // gaps_in_frame_num_value_allowed_flag
      bw.ue(0); bw.ue(0) // 1x1 MBs (16x16 picture)
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
      bw.ue(1)    // num_ref_idx_l0_default_active_minus1 = 1 (TWO refs)
      bw.ue(0)    // l1 default
      bw.u1(0); bw.u(2, 0)
      bw.se(0); bw.se(0); bw.se(0)
      bw.u1(1)    // deblocking control present
      bw.u1(0); bw.u1(0)
      bw.rbspTrailing()
    }
    val lumaA = Array.tabulate(256)(i => ((7 * i + 13) % 256).toByte)
    val lumaB = Array.tabulate(256)(i => ((11 * i + 40) % 256).toByte)
    val cA = Array.fill(64)(90.toByte); val cB = Array.fill(64)(200.toByte)
    def pcmPicture(idr: Boolean, frameNum: Int, luma: Array[Byte],
        cb: Array[Byte], cr: Array[Byte]): Array[Byte] = {
      val bw = new W.BitWriter
      bw.ue(0)                   // first_mb_in_slice
      bw.ue(7)                   // slice_type I
      bw.ue(0)                   // pps_id
      bw.u(4, frameNum)
      if (idr) bw.ue(0)          // idr_pic_id
      if (idr) { bw.u1(0); bw.u1(0) } // dec_ref_pic_marking (IDR)
      else bw.u1(0)              // adaptive_ref_pic_marking_mode_flag
      bw.se(0)                   // slice_qp_delta
      bw.ue(1)                   // deblocking OFF
      bw.ue(25); bw.alignZero()  // I_PCM
      luma.foreach(b => bw.u(8, b & 0xff))
      cb.foreach(b => bw.u(8, b & 0xff))
      cr.foreach(b => bw.u(8, b & 0xff))
      W.nal(if (idr) 3 else 2, if (idr) 5 else 1, bw.rbspTrailing())
    }
    // P picture, one P_L0_16x16 MB at mv (0,0), cbp 0, ref_idx_l0 = 1:
    // with the DPB holding [picture1(B), picture0(A)], a correct decoder
    // outputs A; a decoder that ignores ref_idx outputs B
    val pPicture = {
      val bw = new W.BitWriter
      bw.ue(0)                   // first_mb_in_slice
      bw.ue(5)                   // slice_type P
      bw.ue(0)                   // pps_id
      bw.u(4, 2)                 // frame_num
      bw.u1(0)                   // num_ref_idx_active_override_flag (PPS: 2)
      bw.u1(0)                   // ref_pic_list_modification_flag_l0
      bw.u1(0)                   // adaptive_ref_pic_marking_mode_flag
      bw.se(0)                   // slice_qp_delta
      bw.ue(1)                   // deblocking OFF
      bw.ue(0)                   // mb_skip_run 0
      bw.ue(0)                   // mb_type P_L0_16x16
      bw.u1(0)                   // ref_idx_l0 te(v), cMax 1: inverted bit -> 1
      bw.se(0); bw.se(0)         // mvd (0,0)
      bw.ue(0)                   // coded_block_pattern: inter code 0 -> cbp 0
      W.nal(2, 1, bw.rbspTrailing())
    }
    val stream = W.nal(3, 7, sps) ++ W.nal(3, 8, pps) ++
      pcmPicture(idr = true, 0, lumaA, cA, cA) ++
      pcmPicture(idr = false, 1, lumaB, cB, cB) ++
      pPicture
    assert(md5hex(stream) == "43ded74b515ced5c0258988ab319a981") // golden
    val out = H264Codec.decode(stream)
    assert(out.size == 3)
    assert(out(0).y.toSeq == lumaA.toSeq && out(1).y.toSeq == lumaB.toSeq)
    assert(out(2).y.toSeq == lumaA.toSeq,
      "ref_idx_l0=1 must predict from the picture two back (pattern A)")
    assert(out(2).cb.toSeq == cA.toSeq && out(2).cr.toSeq == cA.toSeq)
  }

  test("hand-built B stream: POC reorder + L0/L1/Bi prediction against both anchors") {
    // 48x16 (3 MBs wide), POC type 0 with 4-bit lsb, 2-deep DPB.
    // Decode order: IDR I_PCM "A" (poc 0) -> non-IDR I_PCM "B" (poc 4)
    // -> non-ref B picture (poc 2) whose three MBs are B_L0_16x16,
    // B_L1_16x16, B_Bi_16x16, all at mv (0,0), no residual. Display
    // order must come back [A, b, B] — a decoder ignoring POC emits the
    // B picture LAST; one ignoring the list split predicts the wrong
    // anchor; one mis-rounding the bi average misses the exact
    // (A + B + 1) >> 1 pixels.
    val sps = {
      val bw = new W.BitWriter
      bw.u(8, 66); bw.u(8, 0); bw.u(8, 10)
      bw.ue(0)    // sps_id
      bw.ue(0)    // log2_max_frame_num_minus4 -> 4 bits
      bw.ue(0)    // pic_order_cnt_type 0
      bw.ue(0)    // log2_max_pic_order_cnt_lsb_minus4 -> 4-bit lsb
      bw.ue(2)    // max_num_ref_frames: both anchors
      bw.u1(0)    // gaps_in_frame_num_value_allowed_flag
      bw.ue(2); bw.ue(0) // 3x1 MBs (48x16 picture)
      bw.u1(1); bw.u1(1) // frame_mbs_only, direct_8x8_inference
      bw.u1(0); bw.u1(0) // no cropping, no VUI
      bw.rbspTrailing()
    }
    val pps = handPps() // CAVLC, list defaults 1/1
    val mbs = 3
    def pat(mul: Int, add: Int, n: Int) =
      Array.tabulate(n)(i => ((mul * i + add) % 256).toByte)
    val lumaA = pat(7, 13, 256 * mbs); val lumaB = pat(11, 40, 256 * mbs)
    val cbA = pat(5, 1, 64 * mbs); val cbB = pat(3, 9, 64 * mbs)
    def pcmPicture(idr: Boolean, frameNum: Int, pocLsb: Int,
        luma: Array[Byte], cb: Array[Byte], cr: Array[Byte]): Array[Byte] = {
      val bw = new W.BitWriter
      bw.ue(0)                   // first_mb_in_slice
      bw.ue(7)                   // slice_type I
      bw.ue(0)                   // pps_id
      bw.u(4, frameNum)
      if (idr) bw.ue(0)          // idr_pic_id
      bw.u(4, pocLsb)            // pic_order_cnt_lsb
      if (idr) { bw.u1(0); bw.u1(0) } // dec_ref_pic_marking (IDR)
      else bw.u1(0)              // adaptive_ref_pic_marking_mode_flag
      bw.se(0)                   // slice_qp_delta
      bw.ue(1)                   // deblocking OFF
      var mb = 0
      while (mb < mbs) {         // I_PCM per MB, planes interleaved per MB
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
      bw.ue(0)                   // first_mb_in_slice
      bw.ue(6)                   // slice_type B
      bw.ue(0)                   // pps_id
      bw.u(4, 2)                 // frame_num (PrevRefFrameNum + 1)
      bw.u(4, 2)                 // pic_order_cnt_lsb: BETWEEN the anchors
      bw.u1(1)                   // direct_spatial_mv_pred_flag
      bw.u1(0)                   // num_ref_idx_active_override (1/1 defaults)
      bw.u1(0)                   // ref_pic_list_modification_flag_l0
      bw.u1(0)                   // ref_pic_list_modification_flag_l1
      // nal_ref_idc 0: no dec_ref_pic_marking
      bw.se(0)                   // slice_qp_delta
      bw.ue(1)                   // deblocking OFF
      // MB0: B_L0_16x16 at mv(0,0) -> past anchor A exactly
      bw.ue(0); bw.ue(1); bw.se(0); bw.se(0); bw.ue(0)
      // MB1: B_L1_16x16 at mv(0,0) -> future anchor B exactly
      bw.ue(0); bw.ue(2); bw.se(0); bw.se(0); bw.ue(0)
      // MB2: B_Bi_16x16 at mv(0,0)/(0,0) -> (A + B + 1) >> 1
      bw.ue(0); bw.ue(3); bw.se(0); bw.se(0); bw.se(0); bw.se(0); bw.ue(0)
      W.nal(0, 1, bw.rbspTrailing())
    }
    val stream = W.nal(3, 7, sps) ++ W.nal(3, 8, pps) ++
      pcmPicture(idr = true, 0, 0, lumaA, cbA, cbA) ++
      pcmPicture(idr = false, 1, 4, lumaB, cbB, cbB) ++
      bPicture
    val out = H264Codec.decode(stream)
    assert(out.size == 3)
    // display order restored from POC
    assert(out(0).y.toSeq == lumaA.toSeq, "display 0 must be the IDR (poc 0)")
    assert(out(2).y.toSeq == lumaB.toSeq, "display 2 must be the ref I (poc 4)")
    // the B picture sits between them: per-MB expected pixels
    def avg(a: Byte, b: Byte) = (((a & 0xff) + (b & 0xff) + 1) >> 1).toByte
    val bY = out(1).y
    (0 until 16).foreach { r =>
      (0 until 16).foreach { c =>
        val w = 16 * mbs
        assert(bY(r * w + c) == lumaA(r * w + c), s"MB0 L0 pixel ($r,$c)")
        assert(bY(r * w + 16 + c) == lumaB(r * w + 16 + c), s"MB1 L1 pixel ($r,$c)")
        assert(bY(r * w + 32 + c) == avg(lumaA(r * w + 32 + c), lumaB(r * w + 32 + c)),
          s"MB2 Bi pixel ($r,$c)")
      }
    }
    val bCb = out(1).cb
    (0 until 8).foreach { r =>
      (0 until 8).foreach { c =>
        val w = 8 * mbs
        assert(bCb(r * w + c) == cbA(r * w + c), s"MB0 L0 chroma ($r,$c)")
        assert(bCb(r * w + 8 + c) == cbB(r * w + 8 + c), s"MB1 L1 chroma ($r,$c)")
        assert(bCb(r * w + 16 + c) == avg(cbA(r * w + 16 + c), cbB(r * w + 16 + c)),
          s"MB2 Bi chroma ($r,$c)")
      }
    }
    // golden byte literal: the constructed stream itself is pinned
    assert(md5hex(stream) == "354f01ed18bd3b6f1ca3842d259c93ee")
  }

  /** Two slices in ONE picture (round 15, VERDICT r14 ask 6): slice 0
    * covers MB (0,0) with a DC-only I16 residual (level 8 at qp 26 →
    * flat 135 per the §8.5 arithmetic pinned above); slice 1 starts at
    * first_mb_in_slice = 1 and covers MB (0,1) with NO residual. The
    * §7.4.4 pin: MB (0,1)'s top neighbour lies in the OTHER slice, so
    * its Intra_16x16 DC prediction must fall back to flat 128 — a
    * decoder that lets intra prediction (or the nC contexts) cross the
    * slice boundary reconstructs 135 instead.
    */
  test("hand-built 2-slice picture: intra prediction must not cross the slice boundary") {
    val sps = handSps(1, 2) // 16x32, one MB per row
    val pps = handPps()
    def slice(firstMb: Int, level: Int): Array[Byte] = {
      val bw = new W.BitWriter
      bw.ue(firstMb) // first_mb_in_slice
      bw.ue(7)       // slice_type I (all slices)
      bw.ue(0)       // pps_id
      bw.u(4, 0)     // frame_num
      bw.ue(0)       // idr_pic_id
      bw.u1(0); bw.u1(0) // no_output_of_prior_pics, long_term_reference
      bw.se(0)       // slice_qp_delta -> qp 26
      bw.ue(1)       // disable_deblocking_filter_idc: OFF
      bw.ue(3)       // mb_type I_16x16_2_0_0 (DC, cbp 0)
      bw.ue(0)       // intra_chroma_pred_mode DC
      bw.se(0)       // mb_qp_delta
      val dc = new Array[Int](16)
      dc(0) = level
      H264Cavlc.writeBlock(bw, dc, 0) // nC 0: no same-slice neighbours
      W.nal(3, 5, bw.rbspTrailing())
    }
    val stream = W.nal(3, 7, sps) ++ W.nal(3, 8, pps) ++
      slice(0, 8) ++ slice(1, 0)
    assert(md5hex(stream) == "504673ed3689a7c960d840ff878904a9") // golden bytes
    val out = H264Codec.decode(stream)
    assert(out.size == 1)
    val y = out(0).y // 16x32
    for (r <- 0 until 16; c <- 0 until 16)
      assert((y(r * 16 + c) & 0xff) == 135, s"slice-0 MB ($c,$r): flat 135 (128 + dequant step)")
    for (r <- 16 until 32; c <- 0 until 16)
      assert((y(r * 16 + c) & 0xff) == 128,
        s"slice-1 MB ($c,$r): DC across the slice boundary must be UNAVAILABLE (flat 128)")
    assert(out(0).cb.forall(b => (b & 0xff) == 128))
    assert(out(0).cr.forall(b => (b & 0xff) == 128))
  }

  test("slicesPerFrame 2 splits a single-MB-row picture MB-granularly (round 15)") {
    // the gate fixture pictures are one MB row tall, so the encoder must
    // fall back from row-aligned splits to MB-granular ones — two VCL
    // NALs per picture with a HORIZONTAL (left-neighbour) slice seam
    import graft.sources.H264Codec.Yuv
    val frames = (0 until 3).map { t =>
      val y = Array.tabulate(16 * 32)(i => ((i * 5 + t * 29) % 256).toByte)
      Yuv(32, 16, y, Array.fill(16 * 8)(120.toByte), Array.fill(16 * 8)(130.toByte))
    }
    for (cabac <- Seq(false, true)) {
      val stream = H264Codec.encode(frames, qp = 12, slicesPerFrame = 2,
        cabac = cabac)
      val vcl = graft.sources.H264.nalUnits(stream).filter(_.isVcl)
      assert(vcl.size == frames.size * 2, s"cabac=$cabac: 2 slices per picture")
      val dec = H264Codec.decode(stream)
      assert(dec.size == frames.size)
    }
    // both entropy layers agree on every pixel across the seam
    val dA = H264Codec.decode(H264Codec.encode(frames, qp = 12, slicesPerFrame = 2))
    val dB = H264Codec.decode(H264Codec.encode(frames, qp = 12, slicesPerFrame = 2,
      cabac = true))
    frames.indices.foreach { i =>
      assert(java.util.Arrays.equals(dA(i).y, dB(i).y), s"frame $i luma")
      assert(java.util.Arrays.equals(dA(i).cb, dB(i).cb), s"frame $i cb")
      assert(java.util.Arrays.equals(dA(i).cr, dB(i).cr), s"frame $i cr")
    }
  }
}
