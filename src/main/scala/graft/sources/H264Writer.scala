package graft.sources

import scala.collection.mutable

/** Spec-compliant H.264 Annex-B NAL writer — the inverse of [[H264]]'s
  * parser, used to synthesize REAL (header-level) byte streams for the
  * ingest/index pipeline: valid SPS/PPS/slice-header bitstreams with
  * exp-Golomb coding and emulation-prevention escaping (ITU-T H.264
  * §7.3/§7.4.1.1; the macroblock payload after each slice header is
  * caller-supplied opaque bytes, which indexing never reads). The same
  * role `Mp4Writer` plays for the container layer: the writer and parser
  * implement the public spec independently, so round-trip specs check
  * the parser against the spec, not against itself.
  */
object H264Writer {

  /** MSB-first bit writer with exp-Golomb; byte-aligns with
    * rbsp_trailing_bits (a 1 bit then zeros, spec §7.3.2.11)
    */
  final class BitWriter {
    private val bytes = new mutable.ArrayBuilder.ofByte
    private var cur = 0
    private var nBits = 0
    def u1(v: Int): this.type = {
      cur = (cur << 1) | (v & 1)
      nBits += 1
      if (nBits == 8) { bytes += cur.toByte; cur = 0; nBits = 0 }
      this
    }
    def u(n: Int, v: Int): this.type = {
      var i = n - 1
      while (i >= 0) { u1((v >> i) & 1); i -= 1 }
      this
    }
    def ue(v: Int): this.type = {
      require(v >= 0, s"ue($v)")
      val code = v + 1
      val len = 32 - Integer.numberOfLeadingZeros(code)
      u(len - 1, 0)
      u(len, code)
    }
    def se(v: Int): this.type = ue(if (v > 0) 2 * v - 1 else -2 * v)
    /** pad with zero bits to the next byte boundary (pcm alignment, §7.3.5) */
    def alignZero(): this.type = { while (nBits != 0) u1(0); this }
    /** pad with ONE bits to the next byte boundary
      * (cabac_alignment_one_bit, §7.3.4) */
    def alignOne(): this.type = { while (nBits != 0) u1(1); this }
    /** rbsp_trailing_bits + flush */
    def rbspTrailing(): Array[Byte] = {
      u1(1)
      while (nBits != 0) u1(0)
      bytes.result()
    }
    /** flush WITHOUT trailing bits — for CABAC slices, whose flush
      * already carried the stop bit (§9.3.4.6); caller must be aligned */
    def rbspBytes(): Array[Byte] = {
      require(nBits == 0, "rbspBytes on an unaligned writer")
      bytes.result()
    }
  }

  /** emulation prevention: 00 00 {00,01,02,03} -> 00 00 03 xx */
  def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new mutable.ArrayBuilder.ofByte
    out.sizeHint(rbsp.length + 8)
    var zeros = 0
    rbsp.foreach { b =>
      if (zeros >= 2 && (b & 0xff) <= 3) { out += 3; zeros = 0 }
      out += b
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.result()
  }

  /** start code + NAL header + escaped RBSP. `fourByte` emits the long
    * (00 00 00 01) start code some muxers use for parameter sets.
    */
  def nal(refIdc: Int, nalType: Int, rbsp: Array[Byte],
      fourByte: Boolean = false): Array[Byte] = {
    val sc: Array[Byte] =
      if (fourByte) Array(0, 0, 0, 1) else Array(0, 0, 1)
    sc ++ Array(((refIdc << 5) | nalType).toByte) ++ escapeRbsp(rbsp)
  }

  /** Baseline-profile SPS with explicit frame cropping. Dimensions must
    * be even (4:2:0 crop units); `log2MaxFrameNum`/`log2MaxPocLsb`
    * mirror [[H264.Sps]].
    */
  def sps(spsId: Int, width: Int, height: Int, levelIdc: Int = 30,
      log2MaxFrameNum: Int = 8, log2MaxPocLsb: Int = 8): Array[Byte] = {
    require(width % 2 == 0 && height % 2 == 0, "4:2:0 needs even dims")
    val w = new BitWriter
    w.u(8, 66) // profile_idc: Baseline
    w.u(8, 0)  // constraint flags + reserved_zero
    w.u(8, levelIdc)
    w.ue(spsId)
    w.ue(log2MaxFrameNum - 4)
    w.ue(0)    // pic_order_cnt_type 0
    w.ue(log2MaxPocLsb - 4)
    w.ue(1)    // max_num_ref_frames
    w.u1(0)    // gaps_in_frame_num_value_allowed_flag
    val widthMbs = (width + 15) / 16
    val heightMbs = (height + 15) / 16
    w.ue(widthMbs - 1)
    w.ue(heightMbs - 1)
    w.u1(1)    // frame_mbs_only_flag
    w.u1(1)    // direct_8x8_inference_flag
    val cropR = (widthMbs * 16 - width) / 2
    val cropB = (heightMbs * 16 - height) / 2
    if (cropR > 0 || cropB > 0) {
      w.u1(1)
      w.ue(0); w.ue(cropR); w.ue(0); w.ue(cropB)
    } else w.u1(0)
    w.u1(0)    // vui_parameters_present_flag
    w.rbspTrailing()
  }

  def pps(ppsId: Int, spsId: Int): Array[Byte] = {
    val w = new BitWriter
    w.ue(ppsId)
    w.ue(spsId)
    w.u1(0)    // entropy_coding_mode_flag: CAVLC
    w.u1(0)    // pic_order_present_flag
    w.ue(0)    // num_slice_groups_minus1
    w.ue(0)    // num_ref_idx_l0_active_minus1
    w.ue(0)    // num_ref_idx_l1_active_minus1
    w.u1(0)    // weighted_pred_flag
    w.u(2, 0)  // weighted_bipred_idc
    w.se(0)    // pic_init_qp_minus26
    w.se(0)    // pic_init_qs_minus26
    w.se(0)    // chroma_qp_index_offset
    w.u1(0)    // deblocking_filter_control_present_flag
    w.u1(0)    // constrained_intra_pred_flag
    w.u1(0)    // redundant_pic_cnt_present_flag
    w.rbspTrailing()
  }

  /** slice-header RBSP (+ opaque macroblock filler). IDR slices use
    * slice_type 7 (I, "all slices in picture"), others 5 (P);
    * `firstMb != 0` marks a continuation slice of the same picture.
    */
  def slice(idr: Boolean, ppsId: Int, frameNum: Int, pocLsb: Int,
      idrPicId: Int = 0, firstMb: Int = 0, log2MaxFrameNum: Int = 8,
      log2MaxPocLsb: Int = 8, filler: Array[Byte] = Array[Byte](0x5a)): Array[Byte] = {
    val w = new BitWriter
    w.ue(firstMb)
    w.ue(if (idr) 7 else 5)            // slice_type
    w.ue(ppsId)
    w.u(log2MaxFrameNum, frameNum)
    if (idr) w.ue(idrPicId)
    w.u(log2MaxPocLsb, pocLsb)         // pic_order_cnt_lsb (poc type 0)
    if (!idr) {
      w.u1(0)                          // num_ref_idx_active_override_flag
      w.u1(0)                          // ref_pic_list_modification_flag_l0
    }
    // (no PPS-conditional fields: writer PPS pins them off)
    w.rbspTrailing() ++ filler
  }
}
