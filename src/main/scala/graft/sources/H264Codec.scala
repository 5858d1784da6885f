package graft.sources

import scala.collection.mutable.ArrayBuffer

/** A real H.264 encoder/decoder pair in pure JVM code — the pixel half
  * of the video layer the container's missing FFmpeg had kept behind the
  * [[GopCodec]] seam. Produces/consumes spec-syntax Annex-B streams
  * (Baseline profile, CAVLC, frame-coded 4:2:0) built entirely from the
  * public ITU-T H.264 spec: SPS/PPS generation, I slices whose
  * macroblocks are either Intra_16x16 (DC prediction, 4x4 integer
  * transform + Hadamard DC transforms, CAVLC residuals — §8.3.3, §8.5,
  * §9.2) or I_PCM (raw macroblocks, §7.3.5 — bit-exact, so grayscale
  * content round-trips losslessly).
  *
  * P slices are real temporal prediction (§8.4): P_L0_16x16 macroblocks
  * with full-search motion estimation against the reconstructed
  * reference, median MV prediction with the spec's P_Skip zero
  * conditions, mb_skip_run coding, inter coded_block_pattern, and
  * motion-compensated residual coding (chroma at eighth-pel bilinear).
  *
  * Luma motion is full quarter-pel (§8.4.2.2.1: 6-tap Wiener half
  * samples, rounding-average quarter samples); chroma rides the
  * eighth-pel bilinear. ME refines integer → half → quarter.
  *
  * The normative in-loop deblocking filter (§8.7) runs by default: full
  * boundary-strength derivation (intra/coded/mv rules), α/β activity
  * gates, t_C0 clipping and the bS=4 strong filter ([[H264Deblock]]),
  * applied identically in the encoder's reconstruction loop and the
  * decoder — the filtered picture is the P reference on both sides.
  * The decoder honours disable_deblocking_filter_idc 0/1/2 and the
  * slice α/β offsets; the bit-exact I_PCM tier encodes with the filter
  * disabled so losslessness survives.
  *
  * Scope, by design (documented subset, each refused loudly on decode):
  * Intra_16x16 DC luma + DC chroma prediction modes only, single
  * reference picture, no B slices. The reference feeds FFmpeg/NVDEC
  * behind `scanner/video/decoder_automata.h:28-51`; this class is the
  * software instance of that seam this container permits.
  *
  * Conformance evidence available in-container: the streams parse under
  * the independent [[H264]] ingest indexer (NAL/AU/SPS grammar), every
  * VLC table is pinned prefix-free, and encode→decode round-trips are
  * pinned numerically (lossless for PCM, near-lossless at QP 0). True
  * cross-decoder conformance needs a second decoder, which the offline
  * container cannot ship — the honest residual gap.
  */
object H264Codec {

  /** one 4:2:0 frame: full-range planes, chroma half-size each dimension */
  final case class Yuv(w: Int, h: Int, y: Array[Byte], cb: Array[Byte], cr: Array[Byte])

  /** coded_block_pattern me(v) mapping for Inter macroblocks (spec Table
    * 9-4, Inter column): codeNum -> cbp. Same transcription caveat as the
    * CAVLC tables (verified bijective below; conformance unverifiable
    * offline). The Intra column is not needed — Intra_16x16 carries its
    * cbp inside mb_type.
    */
  private val cbpInterFromCode: Array[Int] = Array(
    0, 16, 1, 2, 4, 8, 32, 3, 5, 10, 12, 15, 47, 7, 11, 13,
    14, 6, 9, 31, 35, 37, 42, 44, 33, 34, 36, 40, 39, 43, 45, 46,
    17, 18, 20, 24, 19, 21, 26, 28, 23, 27, 29, 30, 22, 25, 38, 41)
  private val cbpInterToCode: Array[Int] = {
    val inv = Array.fill(48)(-1)
    cbpInterFromCode.zipWithIndex.foreach { case (cbp, code) => inv(cbp) = code }
    require(inv.forall(_ >= 0), "inter cbp mapping must be a bijection on 0..47")
    inv
  }

  /** Table 9-4 Intra column (needed by I_NxN macroblocks, whose cbp is a
    * separate me(v) SE — Intra_16x16 carries its cbp inside mb_type).
    * Same transcription caveat as every table here (bijectivity checked;
    * spec-suite pins it); exposed read-only for the structural spec.
    */
  private[graft] val cbpIntraFromCode: Array[Int] = Array(
    47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
    16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4,
    8, 17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
  private val cbpIntraToCode: Array[Int] = {
    val inv = Array.fill(48)(-1)
    cbpIntraFromCode.zipWithIndex.foreach { case (cbp, code) => inv(cbp) = code }
    require(inv.forall(_ >= 0), "intra cbp mapping must be a bijection on 0..47")
    inv
  }

  /** test-suite observability: I_NxN macroblocks emitted by the most
    * recent encodes on this JVM (specs reset + assert the mode
    * competition actually engages on 4x4-scale texture)
    */
  private[graft] val i4MbCount = new java.util.concurrent.atomic.AtomicLong
  private[graft] val i8MbCount = new java.util.concurrent.atomic.AtomicLong
  /** partitioned P MBs emitted by the most recent encodes (specs assert
    * the 16x8/8x16/8x8 competition actually engages on divergent motion) */
  private[graft] val partMbCount = new java.util.concurrent.atomic.AtomicLong
  /** partitioned B MBs decoded/emitted (round 15: the Table 7-14
    * two-partition types and B_8x8 sub-MBs) */
  private[graft] val bPartMbCount = new java.util.concurrent.atomic.AtomicLong
  /** direct/skip B MBs emitted by the most recent encodes (specs assert
    * the direct candidate actually wins where its derivation is exact) */
  private[graft] val directBCount = new java.util.concurrent.atomic.AtomicLong
  /** intra MBs emitted inside P slices by the most recent encodes
    * (specs assert the intra competition engages on scene cuts) */
  private[graft] val intraInPCount = new java.util.concurrent.atomic.AtomicLong
  /** NONZERO mb_qp_delta elements emitted by the most recent encodes
    * (specs assert the Aqp activity modulation actually varies QP) */
  private[graft] val aqpDeltaCount = new java.util.concurrent.atomic.AtomicLong
  /** non-DC intra_chroma_pred_mode elements emitted by the most recent
    * encodes (specs assert the §8.3.4 mode competition engages) */
  private[graft] val chromaModeCount = new java.util.concurrent.atomic.AtomicLong
  /** implicit-WP slices built with NON-trivial weights (w1 != 32) by
    * either coder side (specs assert asymmetric-POC GOPs actually weight) */
  private[graft] val implicitWpCount = new java.util.concurrent.atomic.AtomicLong

  /** blkIdx -> (x4, y4) block coords inside the MB (spec Figure 6-10 order) */
  // §8.5.9 scaling-list indices (ScalingMatrices list layout)
  private final val LIntraY = 0
  private final val LIntraCb = 1
  private final val LIntraCr = 2
  private final val LInterY = 3
  private final val LInterCb = 4
  private final val LInterCr = 5
  private final val L8Intra = 0

  private val blkX = Array(0, 1, 0, 1, 2, 3, 2, 3, 0, 1, 0, 1, 2, 3, 2, 3)
  /** inverse: (y4 * 4 + x4) raster position -> z-order blkIdx */
  private lazy val zOf: Array[Int] = {
    val a = new Array[Int](16)
    var i = 0
    while (i < 16) { a(blkY(i) * 4 + blkX(i)) = i; i += 1 }
    a
  }
  private val blkY = Array(0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3)

  import H264Transform._

  /** §7.4.5 per-MB luma QP update: QPy = ((QPy,prev + mb_qp_delta + 52)
    * % 52) for 8-bit video, with the spec's [-26, +25] range check —
    * shared by both entropy decoders and the Aqp encoder
    */
  @inline private def qpWrap(prev: Int, delta: Int): Int = {
    require(delta >= -26 && delta <= 25, s"mb_qp_delta $delta out of [-26,25]")
    ((prev + delta) % 52 + 52) % 52
  }

  /** per-MB adaptive-QP offset from source luma activity (mean absolute
    * deviation over the 16x16): flat macroblocks quantize finer, busy
    * ones coarser — the textbook perceptual rate-control shape, kept to
    * {-2, 0, +2} so the delta stays deep inside the §7.4.5 range. Purely
    * a function of the SOURCE pixels, so CAVLC and CABAC encodes of the
    * same frames pick identical per-MB QPs (the roundtrip tier's
    * cross-entropy pixel-equality argument needs that determinism).
    */
  private def aqpOffset(srcY: Array[Byte], pw: Int, mbX: Int, mbY: Int): Int = {
    val x0 = mbX * 16; val y0 = mbY * 16
    var sum = 0
    var i = 0
    while (i < 256) {
      sum += srcY((y0 + (i >> 4)) * pw + x0 + (i & 15)) & 0xff
      i += 1
    }
    val mean = (sum + 128) >> 8
    var act = 0
    i = 0
    while (i < 256) {
      val d = (srcY((y0 + (i >> 4)) * pw + x0 + (i & 15)) & 0xff) - mean
      act += (if (d < 0) -d else d)
      i += 1
    }
    if (act < 1024) -2 else if (act > 4096) 2 else 0
  }

  /** the Aqp tiers' per-MB target QP (base + activity offset, clamped
    * away from the lossless-ish floor and the 51 ceiling) */
  @inline private def aqpTarget(base: Int, srcY: Array[Byte], pw: Int,
      mbX: Int, mbY: Int): Int =
    math.max(1, math.min(51, base + aqpOffset(srcY, pw, mbX, mbY)))

  // ------------------------------------------------------------ headers

  /** codec SPS: Baseline, poc type 2 (no slice-header POC fields) for
    * I/P-only streams or type 0 (8-bit pic_order_cnt_lsb) when B frames
    * reorder output, frame MBs only, cropping for non-multiple-of-16 dims
    */
  private def codecSps(w: Int, h: Int, high: Boolean = false,
      maxRefFrames: Int = 1, pocType: Int = 2, cqm: Boolean = false): Array[Byte] = {
    val bw = new H264Writer.BitWriter
    bw.u(8, if (high) 100 else 66) // profile_idc High (8x8 transform) / Baseline
    bw.u(8, 0)  // constraint flags
    bw.u(8, 40) // level 4.0
    bw.ue(0)    // sps_id
    if (high) {
      bw.ue(1)  // chroma_format_idc 4:2:0
      bw.ue(0); bw.ue(0) // bit_depth_{luma,chroma}_minus8
      bw.u1(0)  // qpprime_y_zero_transform_bypass_flag
      if (cqm) {
        // seq_scaling_matrix: the spec default lists, emitted so the
        // parse exercises all three encodings — explicit delta_scale
        // runs (lists 0 and 3), the in-band use-default signal (first
        // delta drives nextScale to 0: list 1), and absent lists
        // resolving through fall-back rule A (2 copies 1; 4,5 copy
        // their predecessors; 6,7 take the 8x8 defaults)
        bw.u1(1)
        bw.u1(1); writeScalingList(bw, H264Transform.default4Intra)
        bw.u1(1); bw.se(-8) // list 1: useDefaultScalingMatrixFlag
        bw.u1(0)            // list 2: rule A copy of list 1
        bw.u1(1); writeScalingList(bw, H264Transform.default4Inter)
        bw.u1(0); bw.u1(0)  // lists 4,5: rule A copies
        bw.u1(0); bw.u1(0)  // lists 6,7 (8x8): rule A defaults
      } else bw.u1(0) // seq_scaling_matrix_present_flag (flat)
    }
    bw.ue(8)    // log2_max_frame_num_minus4 -> 12 bits of frame_num
    bw.ue(pocType) // pic_order_cnt_type (2: decode order; 0: explicit lsb)
    if (pocType == 0) bw.ue(4) // log2_max_pic_order_cnt_lsb_minus4 -> 8 bits
    bw.ue(maxRefFrames) // max_num_ref_frames (DPB size)
    bw.u1(0)    // gaps_in_frame_num_value_allowed_flag
    val mbW = (w + 15) / 16; val mbH = (h + 15) / 16
    bw.ue(mbW - 1)
    bw.ue(mbH - 1)
    bw.u1(1)    // frame_mbs_only_flag
    bw.u1(1)    // direct_8x8_inference_flag
    val cropR = (mbW * 16 - w) / 2; val cropB = (mbH * 16 - h) / 2
    if (cropR > 0 || cropB > 0) { bw.u1(1); bw.ue(0); bw.ue(cropR); bw.ue(0); bw.ue(cropB) }
    else bw.u1(0)
    bw.u1(0)    // vui_parameters_present_flag
    bw.rbspTrailing()
  }

  /** one explicit scaling_list() emission: delta_scale runs in scan
    * order ([[H264.parseSps]]'s exact mirror; weights 1..255 so the
    * ±-wrap keeps deltas in [-128,127]) */
  private def writeScalingList(bw: H264Writer.BitWriter, wZig: Array[Int]): Unit = {
    var last = 8
    wZig.foreach { v =>
      var d = v - last
      if (d < -128) d += 256 else if (d > 127) d -= 256
      bw.se(d)
      last = v
    }
  }

  /** the matrices the cqm tier encodes under — exactly what the SPS
    * [[codecSps]] writes resolves to on parse (spec-default intra lists
    * for 0-2, inter for 3-5; the 8x8 defaults ride along unused)
    */
  private[sources] val cqmMatrices: ScalingMatrices = new ScalingMatrices(
    Array(H264Transform.default4Intra, H264Transform.default4Intra,
      H264Transform.default4Intra, H264Transform.default4Inter,
      H264Transform.default4Inter, H264Transform.default4Inter),
    Array(H264Transform.default8Intra, H264Transform.default8Inter))

  /** codec PPS: CAVLC or CABAC, deblocking control present */
  private def codecPps(cabac: Boolean = false,
      transform8x8: Boolean = false, numRefL0: Int = 1,
      weightedPred: Boolean = false,
      weightedBipredIdc: Int = 0): Array[Byte] = {
    val bw = new H264Writer.BitWriter
    bw.ue(0)   // pps_id
    bw.ue(0)   // sps_id
    bw.u1(if (cabac) 1 else 0) // entropy_coding_mode_flag
    bw.u1(0)   // pic_order_present_flag
    bw.ue(0)   // num_slice_groups_minus1
    bw.ue(numRefL0 - 1); bw.ue(0) // num_ref_idx_l{0,1}_active_minus1
    bw.u1(if (weightedPred) 1 else 0) // weighted_pred_flag (explicit P)
    bw.u(2, weightedBipredIdc) // 0 default, 2 implicit B (§8.4.2.3.1)
    bw.se(0)   // pic_init_qp_minus26
    bw.se(0)   // pic_init_qs_minus26
    bw.se(0)   // chroma_qp_index_offset
    bw.u1(1)   // deblocking_filter_control_present_flag
    bw.u1(0)   // constrained_intra_pred_flag
    bw.u1(0)   // redundant_pic_cnt_present_flag
    if (transform8x8) { // §7.3.2.2 extension trio (High profile)
      bw.u1(1) // transform_8x8_mode_flag
      bw.u1(0) // pic_scaling_matrix_present_flag (flat)
      bw.se(0) // second_chroma_qp_index_offset
    }
    bw.rbspTrailing()
  }

  // ----------------------------------------------------- pixel plumbing

  /** edge-replicate `src` (w x h) into a (pw x ph) padded plane */
  private def pad(src: Array[Byte], w: Int, h: Int, pw: Int, ph: Int): Array[Byte] = {
    val out = new Array[Byte](pw * ph)
    var y = 0
    while (y < ph) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < pw) { out(y * pw + x) = src(sy * w + math.min(x, w - 1)); x += 1 }
      y += 1
    }
    out
  }

  private def crop(src: Array[Byte], pw: Int, w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](w * h)
    if (w == pw) System.arraycopy(src, 0, out, 0, w * h) // MB-multiple width
    else {
      var y = 0
      while (y < h) { System.arraycopy(src, y * pw, out, y * w, w); y += 1 }
    }
    out
  }

  /** per-picture coding state shared by encode and decode */
  private final class PicState(val mbW: Int, val mbH: Int) {
    val pw: Int = mbW * 16; val ph: Int = mbH * 16
    val cw: Int = pw / 2; val ch: Int = ph / 2
    val reconY = new Array[Byte](pw * ph)
    val reconCb = new Array[Byte](cw * ch)
    val reconCr = new Array[Byte](cw * ch)
    // TotalCoeff per 4x4 block, for CAVLC nC contexts
    val bw4: Int = mbW * 4
    val cbw4: Int = mbW * 2
    val nzY = new Array[Int](bw4 * mbH * 4)
    val nzCb = new Array[Int](cbw4 * mbH * 2)
    val nzCr = new Array[Int](cbw4 * mbH * 2)
    // Motion state at 4x4-BLOCK granularity (since round 14, for
    // sub-16x16 inter partitions): §8.4.1.3 MV prediction, §8.7.2.1
    // per-edge boundary strength, the ref_idx/mvd entropy contexts, and
    // spatial/temporal direct all sample the specific neighbour block.
    // A 16x16 MB fills all 16 cells uniformly, so every pre-partition
    // stream decodes bit-identically. ref4 = -1 marks intra/uncoded
    // (participates in prediction as "no reference"); -2 marks a cell of
    // the MB CURRENTLY being coded whose partition has not been reached
    // yet (§6.4 neighbour availability: not yet decoded -> unavailable).
    val mv4X = new Array[Int](bw4 * mbH * 4)
    val mv4Y = new Array[Int](bw4 * mbH * 4)
    val ref4: Array[Int] = Array.fill(bw4 * mbH * 4)(-1)
    // list-1 twin state for B slices (ref -1: list unused by the block)
    val mv4XL1 = new Array[Int](bw4 * mbH * 4)
    val mv4YL1 = new Array[Int](bw4 * mbH * 4)
    val ref4L1: Array[Int] = Array.fill(bw4 * mbH * 4)(-1)
    // POC of the picture each block's L0 refIdx selected at decode time
    // (temporal-direct MV scaling reads the COLOCATED block's reference
    // distance; the colocated picture's reference lists are long gone)
    val refPoc4 = new Array[Int](bw4 * mbH * 4)
    val inter = new Array[Boolean](mbW * mbH)
    /** assign one partition's two-list motion to its 4x4 cells */
    def setMotion4(bx4: Int, by4: Int, w4: Int, h4: Int,
        r0: Int, m0x: Int, m0y: Int, r1: Int, m1x: Int, m1y: Int,
        poc0: Int = 0): Unit = {
      // row-segment fills (branches hoisted): this runs per partition of
      // every inter MB and the per-cell branchy loop measured ~4% of
      // 720p decode
      val v0x = if (r0 >= 0) m0x else 0
      val v0y = if (r0 >= 0) m0y else 0
      val v1x = if (r1 >= 0) m1x else 0
      val v1y = if (r1 >= 0) m1y else 0
      var y = by4
      while (y < by4 + h4) {
        val i0 = y * bw4 + bx4
        val i1 = i0 + w4
        var x = i0
        while (x < i1) {
          mv4X(x) = v0x; mv4Y(x) = v0y; ref4(x) = r0; refPoc4(x) = poc0
          mv4XL1(x) = v1x; mv4YL1(x) = v1y; ref4L1(x) = r1
          x += 1
        }
        y += 1
      }
    }
    /** mark the current MB's cells not-yet-decoded before partitioned
      * parsing (sliceOfMb is set BEFORE the MB parses, so without the
      * sentinel an in-MB neighbour of a later partition would read
      * stale motion as "available") */
    def beginPartitionedMb(mbX: Int, mbY: Int): Unit = {
      var y = mbY * 4
      while (y < mbY * 4 + 4) {
        var x = mbX * 4
        while (x < mbX * 4 + 4) { ref4(y * bw4 + x) = -2; x += 1 }
        y += 1
      }
    }
    // picture order count (display order, §8.2.1) — drives B-slice
    // default reference-list ordering and the decoder's output reorder
    var poc: Int = 0
    // frame_num as coded (mod MaxFrameNum) — the §8.2.4.3.1 short-term
    // picNum this picture resolves to in ref_pic_list_modification
    var frameNum: Int = 0
    // per-MB qp + I_PCM flag, for deblocking-filter strength/thresholds
    // (§8.7: an I_PCM macroblock filters as qp 0)
    val mbQp = new Array[Int](mbW * mbH)
    // the active PPS's chroma_qp_index_offset (§8.5: QPc looks up Table
    // 8-15 at QPy + offset) — set per slice by the decoder; encoder
    // pictures keep 0 (this encoder emits offset 0)
    var cqpOff: Int = 0
    // second_chroma_qp_index_offset (Cr); equals cqpOff unless the PPS
    // carries a distinct value (round 15 — previously refused)
    var cqpOff2: Int = 0
    val pcmMb = new Array[Boolean](mbW * mbH)
    // per-MB transform_size_8x8_flag — deblocking skips the 4x4-internal
    // luma edges of these MBs (the transform grid is 8x8)
    val trans8 = new Array[Boolean](mbW * mbH)
    // the picture's active scaling matrices (§8.5.9, PPS over SPS) —
    // Flat for every pre-CQM stream; set per picture by the decoder
    // (pooled states!) and at encode setup by the cqm tier
    var scal: ScalingMatrices = ScalingMatrices.Flat
    // per-4x4-block Intra_4x4 prediction mode (-1 = not an I4 block) —
    // the neighbor state §8.3.1.1's most-probable-mode derivation reads
    val i4Mode: Array[Int] = Array.fill(bw4 * mbH * 4)(-1)
    // slice membership (§7.4.4 neighbour availability: a macroblock in
    // another slice is NOT available for nC contexts, MV prediction, or
    // intra prediction). -1 = not yet coded; curSlice advances per slice.
    val sliceOfMb: Array[Int] = Array.fill(mbW * mbH)(-1)
    var curSlice = 0
    /** restore the freshly-constructed state for picture reuse (the
      * decoder pools PicStates — allocating + zeroing ~0.7 MB per VGA
      * picture profiled at ~5%). Only the neighbor/context arrays need
      * it: recon planes and nz counts are fully overwritten by any
      * picture that passes the all-MBs-covered check, and MVs are
      * re-zeroed per MB by the inter paths — but i4Mode/refIdx/slice
      * membership gate "was this cell written", so they must read as
      * unwritten. MVs and qp join them out of caution (both are read
      * through gates, but the gates live in other methods).
      */
    def reset(): Unit = {
      java.util.Arrays.fill(sliceOfMb, -1)
      java.util.Arrays.fill(ref4, -1)
      java.util.Arrays.fill(ref4L1, -1)
      java.util.Arrays.fill(i4Mode, -1)
      java.util.Arrays.fill(pcmMb, false)
      java.util.Arrays.fill(trans8, false)
      java.util.Arrays.fill(inter, false)
      // mv4*/refPoc4 deliberately NOT cleared: every read is gated on
      // the cell's ref4 (>= 0 or == a specific value), and setMotion4
      // writes mv+ref+poc together — clearing 5 more 57k-cell arrays
      // per pooled-picture acquire measured ~1.5% of 720p decode
      java.util.Arrays.fill(mbQp, 0)
      curSlice = 0
      poc = 0
      cqpOff = 0
      cqpOff2 = 0
    }
    @inline def mbAvail(x: Int, y: Int): Boolean =
      x >= 0 && y >= 0 && x < mbW && y < mbH &&
        sliceOfMb(y * mbW + x) == curSlice
    /** 4x4-block availability for motion sampling: inside the picture,
      * same slice, and (for cells of the MB being coded) its partition
      * already decoded — the -2 sentinel beginPartitionedMb plants */
    @inline def avail4(x4: Int, y4: Int): Boolean =
      x4 >= 0 && y4 >= 0 && x4 < bw4 && y4 < mbH * 4 &&
        sliceOfMb((y4 >> 2) * mbW + (x4 >> 2)) == curSlice &&
        ref4(y4 * bw4 + x4) != -2
    def nC(nz: Array[Int], rowW: Int, bx: Int, by: Int): Int = {
      val blkPerMb = if (rowW == bw4) 4 else 2
      val nA = if (bx > 0 && mbAvail((bx - 1) / blkPerMb, by / blkPerMb))
        nz(by * rowW + bx - 1) else -1
      val nB = if (by > 0 && mbAvail(bx / blkPerMb, (by - 1) / blkPerMb))
        nz((by - 1) * rowW + bx) else -1
      if (nA >= 0 && nB >= 0) (nA + nB + 1) >> 1
      else if (nA >= 0) nA
      else if (nB >= 0) nB
      else 0
    }
  }

  /** parsed/encoded residual of one Intra_16x16 macroblock */
  private final class MbCoeffs {
    var predMode = 2 // Intra_16x16 luma mode: 0 V, 1 H, 2 DC, 3 plane
    var chromaMode = 0 // intra_chroma_pred_mode (§8.3.4): 0 DC, 1 H, 2 V, 3 plane
    val lumaDcZig = new Array[Int](16)
    val lumaAcZig: Array[Array[Int]] = Array.fill(16)(new Array[Int](15))
    val cbDcZig = new Array[Int](4)
    val crDcZig = new Array[Int](4)
    val cbAcZig: Array[Array[Int]] = Array.fill(4)(new Array[Int](15))
    val crAcZig: Array[Array[Int]] = Array.fill(4)(new Array[Int](15))
    var cbpLuma = 0   // 0 or 15
    var cbpChroma = 0 // 0, 1, 2
  }

  @inline private def clip(v: Int): Byte = (if (v < 0) 0 else if (v > 255) 255 else v).toByte

  /** Intra_16x16 DC luma prediction (§8.3.3.3) from reconstructed neighbours */
  private def predLumaDc(st: PicState, mbX: Int, mbY: Int): Int = {
    val x0 = mbX * 16; val y0 = mbY * 16
    val hasL = st.mbAvail(mbX - 1, mbY); val hasT = st.mbAvail(mbX, mbY - 1)
    var sum = 0
    if (hasT) { var i = 0; while (i < 16) { sum += st.reconY((y0 - 1) * st.pw + x0 + i) & 0xff; i += 1 } }
    if (hasL) { var i = 0; while (i < 16) { sum += st.reconY((y0 + i) * st.pw + x0 - 1) & 0xff; i += 1 } }
    if (hasT && hasL) (sum + 16) >> 5
    else if (hasT || hasL) (sum + 8) >> 4
    else 128
  }

  /** Intra_16x16 prediction modes available at (mbX, mbY) given neighbor
    * reconstruction (§8.3.3): 0 = vertical (needs top), 1 = horizontal
    * (needs left), 2 = DC (always), 3 = plane (needs top, left, and the
    * top-left corner)
    */
  private def i16Modes(st: PicState, mbX: Int, mbY: Int): Seq[Int] = {
    val hasL = st.mbAvail(mbX - 1, mbY); val hasT = st.mbAvail(mbX, mbY - 1)
    // the corner sample belongs to the top-left MB; for the interior of a
    // raster slice it is available iff both top and left are (the same
    // slice-availability rule the DC fold uses)
    val hasTL = hasL && hasT && st.mbAvail(mbX - 1, mbY - 1)
    Seq(2) ++ (if (hasT) Seq(0) else Nil) ++ (if (hasL) Seq(1) else Nil) ++
      (if (hasTL) Seq(3) else Nil)
  }

  /** spec-suite hook: run [[predLuma16]] against planted neighbor
    * samples (top row / left column / corner) without a real decode —
    * the prediction math is verified directly against the §8.3.3
    * formulas recomputed in the test
    */
  private[graft] def i16PredForTest(top: Option[Array[Int]],
      left: Option[Array[Int]], corner: Int, mode: Int): Array[Int] = {
    val st = new PicState(2, 2) // target MB at (1,1); neighbors planted
    st.curSlice = 0
    java.util.Arrays.fill(st.sliceOfMb, -1)
    st.sliceOfMb(3) = 0 // the target itself
    top.foreach { t =>
      st.sliceOfMb(1) = 0 // MB above
      var i = 0
      while (i < 16) { st.reconY(15 * st.pw + 16 + i) = t(i).toByte; i += 1 }
    }
    left.foreach { l =>
      st.sliceOfMb(2) = 0 // MB to the left
      var i = 0
      while (i < 16) { st.reconY((16 + i) * st.pw + 15) = l(i).toByte; i += 1 }
    }
    if (top.isDefined && left.isDefined) {
      st.sliceOfMb(0) = 0 // corner MB
      st.reconY(15 * st.pw + 15) = corner.toByte
    }
    require(i16Modes(st, 1, 1).contains(mode),
      s"mode $mode not available for the planted neighbors")
    predLuma16(st, 1, 1, mode)
  }

  /** per-pixel Intra_16x16 luma prediction (§8.3.3.1-4) from the
    * reconstructed neighbors; returns 256 samples in raster order
    */
  private def predLuma16(st: PicState, mbX: Int, mbY: Int, mode: Int): Array[Int] = {
    val x0 = mbX * 16; val y0 = mbY * 16
    val out = new Array[Int](256)
    @inline def top(x: Int) = st.reconY((y0 - 1) * st.pw + x0 + x) & 0xff
    @inline def left(y: Int) = st.reconY((y0 + y) * st.pw + x0 - 1) & 0xff
    mode match {
      case 0 => // vertical: copy the row above
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) { out(y * 16 + x) = top(x); x += 1 }
          y += 1
        }
      case 1 => // horizontal: replicate the left column
        var y = 0
        while (y < 16) {
          val v = left(y)
          var x = 0
          while (x < 16) { out(y * 16 + x) = v; x += 1 }
          y += 1
        }
      case 3 => // plane (§8.3.3.4)
        val corner = st.reconY((y0 - 1) * st.pw + x0 - 1) & 0xff
        var h = 0
        var v = 0
        var i = 1
        while (i <= 8) {
          h += i * (top(7 + i) - (if (i == 8) corner else top(7 - i)))
          v += i * (left(7 + i) - (if (i == 8) corner else left(7 - i)))
          i += 1
        }
        val a = 16 * (left(15) + top(15))
        val b = (5 * h + 32) >> 6
        val c = (5 * v + 32) >> 6
        var y = 0
        while (y < 16) {
          var x = 0
          while (x < 16) {
            val p = (a + b * (x - 7) + c * (y - 7) + 16) >> 5
            out(y * 16 + x) = if (p < 0) 0 else if (p > 255) 255 else p
            x += 1
          }
          y += 1
        }
      case _ => // DC
        java.util.Arrays.fill(out, predLumaDc(st, mbX, mbY))
    }
    out
  }

  // ------------------------------------------------ Intra_4x4 prediction

  /** Intra_4x4 luma prediction (§8.3.2.2.1-9), all nine modes, for the
    * 4x4 block whose top-left ABSOLUTE pixel is (x0, y0). `avail(x, y)`
    * answers whether the neighbor SAMPLE at absolute (x, y) is decoded
    * and same-slice (within-MB decode order included). Top-right
    * substitution per §8.3.2.2: when p[4..7, -1] are unavailable but the
    * top row is, they take p[3, -1]. Returns 16 samples raster-order.
    * Formula transcription carries the repo-wide offline caveat (no
    * reference decoder to cross-check); the spec suite pins each mode
    * against independently recomputed §8.3.2.2 arithmetic.
    */
  private def predLuma4(st: PicState, x0: Int, y0: Int, mode: Int,
      avail: (Int, Int) => Boolean): Array[Int] = {
    @inline def s(x: Int, y: Int) = st.reconY(y * st.pw + x) & 0xff
    val hasL = avail(x0 - 1, y0)
    val hasT = avail(x0, y0 - 1)
    val hasD = avail(x0 - 1, y0 - 1)
    val hasC = avail(x0 + 4, y0 - 1)
    val t = new Array[Int](8)
    if (hasT) {
      var i = 0
      while (i < 4) { t(i) = s(x0 + i, y0 - 1); i += 1 }
      while (i < 8) { t(i) = if (hasC) s(x0 + i, y0 - 1) else t(3); i += 1 }
    }
    val l = new Array[Int](4)
    if (hasL) { var i = 0; while (i < 4) { l(i) = s(x0 - 1, y0 + i); i += 1 } }
    val d = if (hasD) s(x0 - 1, y0 - 1) else 0
    val out = new Array[Int](16)
    @inline def put(x: Int, y: Int, v: Int): Unit = out(y * 4 + x) = v
    mode match {
      case 0 => // vertical
        require(hasT, "Intra_4x4 vertical needs the top row")
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { put(x, y, t(x)); x += 1 }; y += 1 }
      case 1 => // horizontal
        require(hasL, "Intra_4x4 horizontal needs the left column")
        var y = 0
        while (y < 4) { var x = 0; while (x < 4) { put(x, y, l(y)); x += 1 }; y += 1 }
      case 2 => // DC
        val v =
          if (hasT && hasL) (t(0) + t(1) + t(2) + t(3) + l(0) + l(1) + l(2) + l(3) + 4) >> 3
          else if (hasT) (t(0) + t(1) + t(2) + t(3) + 2) >> 2
          else if (hasL) (l(0) + l(1) + l(2) + l(3) + 2) >> 2
          else 128
        java.util.Arrays.fill(out, v)
      case 3 => // diagonal down-left
        require(hasT, "Intra_4x4 DDL needs the top row")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            put(x, y,
              if (x == 3 && y == 3) (t(6) + 3 * t(7) + 2) >> 2
              else (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2)
            x += 1
          }
          y += 1
        }
      case 4 => // diagonal down-right
        require(hasT && hasL && hasD, "Intra_4x4 DDR needs top+left+corner")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            put(x, y,
              if (x > y) (tp(t, d, x - y - 2) + 2 * tp(t, d, x - y - 1) + t(x - y) + 2) >> 2
              else if (x < y) (lp(l, d, y - x - 2) + 2 * lp(l, d, y - x - 1) + l(y - x) + 2) >> 2
              else (t(0) + 2 * d + l(0) + 2) >> 2)
            x += 1
          }
          y += 1
        }
      case 5 => // vertical-right
        require(hasT && hasL && hasD, "Intra_4x4 VR needs top+left+corner")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = 2 * x - y
            put(x, y,
              if (z >= 0 && z % 2 == 0) (tp(t, d, x - (y >> 1) - 1) + tp(t, d, x - (y >> 1)) + 1) >> 1
              else if (z >= 0) (tp(t, d, x - (y >> 1) - 2) + 2 * tp(t, d, x - (y >> 1) - 1) + tp(t, d, x - (y >> 1)) + 2) >> 2
              else if (z == -1) (l(0) + 2 * d + t(0) + 2) >> 2
              else (lp(l, d, y - 2 * x - 1) + 2 * lp(l, d, y - 2 * x - 2) + lp(l, d, y - 2 * x - 3) + 2) >> 2)
            x += 1
          }
          y += 1
        }
      case 6 => // horizontal-down
        require(hasT && hasL && hasD, "Intra_4x4 HD needs top+left+corner")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = 2 * y - x
            put(x, y,
              if (z >= 0 && z % 2 == 0) (lp(l, d, y - (x >> 1) - 1) + lp(l, d, y - (x >> 1)) + 1) >> 1
              else if (z >= 0) (lp(l, d, y - (x >> 1) - 2) + 2 * lp(l, d, y - (x >> 1) - 1) + lp(l, d, y - (x >> 1)) + 2) >> 2
              else if (z == -1) (l(0) + 2 * d + t(0) + 2) >> 2
              else (tp(t, d, x - 2 * y - 1) + 2 * tp(t, d, x - 2 * y - 2) + tp(t, d, x - 2 * y - 3) + 2) >> 2)
            x += 1
          }
          y += 1
        }
      case 7 => // vertical-left
        require(hasT, "Intra_4x4 VL needs the top row")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val i = x + (y >> 1)
            put(x, y,
              if (y % 2 == 0) (t(i) + t(i + 1) + 1) >> 1
              else (t(i) + 2 * t(i + 1) + t(i + 2) + 2) >> 2)
            x += 1
          }
          y += 1
        }
      case 8 => // horizontal-up
        require(hasL, "Intra_4x4 HU needs the left column")
        var y = 0
        while (y < 4) {
          var x = 0
          while (x < 4) {
            val z = x + 2 * y
            put(x, y,
              if (z > 5) l(3)
              else if (z == 5) (l(2) + 3 * l(3) + 2) >> 2
              else if (z % 2 == 0) (l(y + (x >> 1)) + l(y + (x >> 1) + 1) + 1) >> 1
              else (l(y + (x >> 1)) + 2 * l(y + (x >> 1) + 1) + l(y + (x >> 1) + 2) + 2) >> 2)
            x += 1
          }
          y += 1
        }
      case other => sys.error(s"Intra_4x4 prediction mode $other out of range")
    }
    out
  }

  /** top-row sample with index -1 resolving to the corner */
  @inline private def tp(t: Array[Int], corner: Int, i: Int): Int =
    if (i < 0) corner else t(i)
  /** left-column sample with index -1 resolving to the corner */
  @inline private def lp(l: Array[Int], corner: Int, i: Int): Int =
    if (i < 0) corner else l(i)

  /** spec-suite hook: [[predLuma4]] against planted neighbor samples
    * with independently controlled availability of the top / top-right /
    * left / corner sample groups
    */
  private[graft] def i4PredForTest(top: Option[Array[Int]],
      topRight: Option[Array[Int]], left: Option[Array[Int]],
      corner: Option[Int], mode: Int): Array[Int] = {
    val st = new PicState(2, 2)
    top.foreach { t =>
      var i = 0; while (i < 4) { st.reconY(15 * st.pw + 16 + i) = t(i).toByte; i += 1 } }
    topRight.foreach { t =>
      var i = 0; while (i < 4) { st.reconY(15 * st.pw + 20 + i) = t(i).toByte; i += 1 } }
    left.foreach { l =>
      var i = 0; while (i < 4) { st.reconY((16 + i) * st.pw + 15) = l(i).toByte; i += 1 } }
    corner.foreach(c => st.reconY(15 * st.pw + 15) = c.toByte)
    val avail: (Int, Int) => Boolean = (x, y) =>
      if (y == 15 && x >= 16 && x < 20) top.isDefined
      else if (y == 15 && x >= 20 && x < 24) topRight.isDefined
      else if (x == 15 && y >= 16 && y < 20) left.isDefined
      else if (x == 15 && y == 15) corner.isDefined
      else false
    predLuma4(st, 16, 16, mode, avail)
  }

  /** the modes available for the 4x4 block at absolute (x0, y0) */
  private def i4AvailableModes(x0: Int, y0: Int,
      avail: (Int, Int) => Boolean): Seq[Int] = {
    val hasL = avail(x0 - 1, y0)
    val hasT = avail(x0, y0 - 1)
    val hasD = avail(x0 - 1, y0 - 1)
    Seq(2) ++
      (if (hasT) Seq(0, 3, 7) else Nil) ++
      (if (hasL) Seq(1, 8) else Nil) ++
      (if (hasT && hasL && hasD) Seq(4, 5, 6) else Nil)
  }

  /** §8.3.1.1 most-probable-mode: min of the left/top neighbor 4x4
    * blocks' modes, with 2 (DC) for unavailable or non-I4 neighbors.
    * (bx, by) are absolute 4x4-block coordinates.
    */
  private def predI4Mode(st: PicState, bx: Int, by: Int): Int = {
    def nb(nbx: Int, nby: Int): Int =
      if (nbx < 0 || nby < 0) 2
      else if (!st.mbAvail(nbx / 4, nby / 4)) 2
      else { val m = st.i4Mode(nby * st.bw4 + nbx); if (m < 0) 2 else m }
    math.min(nb(bx - 1, by), nb(bx, by - 1))
  }

  /** sample-availability callback for the I4 block loop of MB (mbX, mbY):
    * cross-MB samples follow mbAvail (raster slice order), within-MB
    * samples follow the z-order decode progress in `done`
    */
  private def i4SampleAvail(st: PicState, mbX: Int, mbY: Int,
      done: Array[Boolean]): (Int, Int) => Boolean = { (x, y) =>
    if (x < 0 || y < 0 || x >= st.pw || y >= st.ph) false
    else {
      val omx = x / 16; val omy = y / 16
      if (omx == mbX && omy == mbY)
        done(zOf(((y % 16) / 4) * 4 + (x % 16) / 4))
      else st.mbAvail(omx, omy)
    }
  }

  /** Closed-loop Intra_4x4 ANALYSIS + reconstruction for one MB: per 4x4
    * block in z-order, pick the lowest-SAD available mode (tie to the
    * smaller index), transform/quantize the residual, and reconstruct
    * immediately (later blocks predict from reconstructed earlier ones —
    * the same closed loop the decoder replays). Luma only; the caller
    * runs the shared chroma analysis. Returns (modes, per-block zig
    * coefficients, cbpLuma, total prediction SAD).
    */
  private def analyseLumaI4(st: PicState, mbX: Int, mbY: Int, qp: Int,
      srcY: Array[Byte]): (Array[Int], Array[Array[Int]], Int, Long) = {
    val modes = new Array[Int](16)
    val zigs = Array.fill(16)(new Array[Int](16))
    val done = new Array[Boolean](16)
    val avail = i4SampleAvail(st, mbX, mbY, done)
    val b = new Array[Int](16)
    val w = new Array[Int](16)
    var cbp = 0
    var sadTotal = 0L
    var blk = 0
    while (blk < 16) {
      val bx0 = mbX * 16 + blkX(blk) * 4
      val by0 = mbY * 16 + blkY(blk) * 4
      // mode decision on this block's source vs candidate predictions
      var bestMode = 2
      var bestSad = Long.MaxValue
      var bestPred: Array[Int] = null
      i4AvailableModes(bx0, by0, avail).sorted.foreach { m =>
        val p = predLuma4(st, bx0, by0, m, avail)
        var sad = 0L
        var i = 0
        while (i < 16) {
          sad += math.abs((srcY((by0 + i / 4) * st.pw + bx0 + i % 4) & 0xff) - p(i))
          i += 1
        }
        if (sad < bestSad) { bestSad = sad; bestMode = m; bestPred = p }
      }
      modes(blk) = bestMode
      sadTotal += bestSad
      st.i4Mode((by0 / 4) * st.bw4 + bx0 / 4) = bestMode
      // transform + quantize the residual (coefficient 0 is a plain AC
      // coefficient here — no separate DC plane in I_NxN luma)
      var i = 0
      while (i < 16) {
        b(i) = (srcY((by0 + i / 4) * st.pw + bx0 + i % 4) & 0xff) - bestPred(i)
        i += 1
      }
      forward4x4(b)
      var any = false
      var zi = 0
      while (zi < 16) {
        val pos = zigzag4x4(zi)
        val z = st.scal.qAc(b(pos), qp, pos, LIntraY)
        zigs(blk)(zi) = z
        if (z != 0) any = true
        zi += 1
      }
      if (any) cbp |= 1 << (blk / 4)
      // immediate reconstruction so later blocks predict from recon
      java.util.Arrays.fill(w, 0)
      zi = 0
      while (zi < 16) {
        val pos = zigzag4x4(zi)
        w(pos) = st.scal.deqAc(zigs(blk)(zi), qp, pos, LIntraY)
        zi += 1
      }
      inverse4x4(w)
      i = 0
      while (i < 16) {
        st.reconY((by0 + i / 4) * st.pw + bx0 + i % 4) =
          clip(bestPred(i) + w(i))
        i += 1
      }
      done(blk) = true
      blk += 1
    }
    (modes, zigs, cbp, sadTotal)
  }

  /** decoder-side Intra_4x4 luma reconstruction from parsed modes +
    * coefficients — the exact mirror of [[analyseLumaI4]]'s closed loop
    */
  private def reconstructLumaI4(st: PicState, mbX: Int, mbY: Int, qp: Int,
      modes: Array[Int], zigs: Array[Array[Int]], cbpLuma: Int): Unit = {
    val done = new Array[Boolean](16)
    val avail = i4SampleAvail(st, mbX, mbY, done)
    val w = new Array[Int](16)
    var blk = 0
    while (blk < 16) {
      val bx0 = mbX * 16 + blkX(blk) * 4
      val by0 = mbY * 16 + blkY(blk) * 4
      st.i4Mode((by0 / 4) * st.bw4 + bx0 / 4) = modes(blk)
      val pred = predLuma4(st, bx0, by0, modes(blk), avail)
      java.util.Arrays.fill(w, 0)
      if (((cbpLuma >> (blk / 4)) & 1) != 0) {
        var zi = 0
        while (zi < 16) {
          val pos = zigzag4x4(zi)
          w(pos) = st.scal.deqAc(zigs(blk)(zi), qp, pos, LIntraY)
          zi += 1
        }
      }
      inverse4x4(w)
      var i = 0
      while (i < 16) {
        st.reconY((by0 + i / 4) * st.pw + bx0 + i % 4) = clip(pred(i) + w(i))
        i += 1
      }
      done(blk) = true
      blk += 1
    }
  }

  /** chroma DC prediction (§8.3.4), per 4x4 quadrant of the 8x8 block;
    * returns the 4 quadrant DC values indexed [by*2+bx]
    */
  private def predChromaDc(plane: Array[Byte], cw: Int, mbX: Int, mbY: Int,
      hasL: Boolean, hasT: Boolean): Array[Int] = {
    val x0 = mbX * 8; val y0 = mbY * 8
    def sumT(from: Int): Int = {
      var s = 0; var i = 0
      while (i < 4) { s += plane((y0 - 1) * cw + x0 + from + i) & 0xff; i += 1 }
      s
    }
    def sumL(from: Int): Int = {
      var s = 0; var i = 0
      while (i < 4) { s += plane((y0 + from + i) * cw + x0 - 1) & 0xff; i += 1 }
      s
    }
    val q = new Array[Int](4)
    // (0,0): both; (1,0): prefer top; (0,1): prefer left; (1,1): both
    q(0) =
      if (hasT && hasL) (sumT(0) + sumL(0) + 4) >> 3
      else if (hasT) (sumT(0) + 2) >> 2
      else if (hasL) (sumL(0) + 2) >> 2
      else 128
    q(1) =
      if (hasT) (sumT(4) + 2) >> 2
      else if (hasL) (sumL(0) + 2) >> 2
      else 128
    q(2) =
      if (hasL) (sumL(4) + 2) >> 2
      else if (hasT) (sumT(0) + 2) >> 2
      else 128
    q(3) =
      if (hasT && hasL) (sumT(4) + sumL(4) + 4) >> 3
      else if (hasT) (sumT(4) + 2) >> 2
      else if (hasL) (sumL(4) + 2) >> 2
      else 128
    q
  }

  /** §8.3.4 chroma intra prediction: one 8x8 prediction block for
    * intra_chroma_pred_mode `mode` — 0 DC per 4x4 quadrant (§8.3.4.1,
    * via [[predChromaDc]]), 1 horizontal (§8.3.4.2), 2 vertical
    * (§8.3.4.3), 3 plane (§8.3.4.4 at ChromaArrayType 1: the 34-weight
    * gradient fit over the 8x8 block). Directional/plane modes REQUIRE
    * their neighbour samples — a stream signalling a mode whose
    * neighbours are missing is refused as a parse error, never predicted
    * from garbage (same refuse-loudly stance as the Intra_16x16 modes).
    */
  private def predChroma8(plane: Array[Byte], cw: Int, mbX: Int, mbY: Int,
      mode: Int, hasL: Boolean, hasT: Boolean, hasTL: Boolean): Array[Int] = {
    val x0 = mbX * 8; val y0 = mbY * 8
    val out = new Array[Int](64)
    @inline def top(x: Int) = plane((y0 - 1) * cw + x0 + x) & 0xff
    @inline def left(y: Int) = plane((y0 + y) * cw + x0 - 1) & 0xff
    mode match {
      case 0 =>
        val q = predChromaDc(plane, cw, mbX, mbY, hasL, hasT)
        var i = 0
        while (i < 64) {
          out(i) = q(((i >> 3) >> 2) * 2 + ((i & 7) >> 2))
          i += 1
        }
      case 1 =>
        require(hasL, "intra_chroma_pred_mode 1 (horizontal) without a left neighbour")
        var y = 0
        while (y < 8) {
          val v = left(y)
          var x = 0
          while (x < 8) { out(y * 8 + x) = v; x += 1 }
          y += 1
        }
      case 2 =>
        require(hasT, "intra_chroma_pred_mode 2 (vertical) without a top neighbour")
        var x = 0
        while (x < 8) {
          val v = top(x)
          var y = 0
          while (y < 8) { out(y * 8 + x) = v; y += 1 }
          x += 1
        }
      case 3 =>
        require(hasL && hasT && hasTL,
          "intra_chroma_pred_mode 3 (plane) without left+top+corner neighbours")
        @inline def p(x: Int, y: Int): Int =
          if (x == -1 && y == -1) plane((y0 - 1) * cw + x0 - 1) & 0xff
          else if (y == -1) top(x)
          else left(y)
        var hS = 0; var vS = 0
        var i = 0
        while (i < 4) {
          hS += (i + 1) * (p(4 + i, -1) - p(2 - i, -1))
          vS += (i + 1) * (p(-1, 4 + i) - p(-1, 2 - i))
          i += 1
        }
        val a = 16 * (p(-1, 7) + p(7, -1))
        val b = (34 * hS + 32) >> 6
        val c = (34 * vS + 32) >> 6
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val v = (a + b * (x - 3) + c * (y - 3) + 16) >> 5
            out(y * 8 + x) = if (v < 0) 0 else if (v > 255) 255 else v
            x += 1
          }
          y += 1
        }
      case other => sys.error(s"intra_chroma_pred_mode $other out of range")
    }
    out
  }

  // ---------------------------------------------- Intra_8x8 (High profile)

  /** sample availability for the I8 block loop of MB (mbX, mbY): cross-MB
    * samples follow mbAvail; within-MB samples follow the z-order decode
    * progress of the four 8x8 blocks in `done`
    */
  private def i8SampleAvail(st: PicState, mbX: Int, mbY: Int,
      done: Array[Boolean]): (Int, Int) => Boolean = { (x, y) =>
    if (x < 0 || y < 0 || x >= st.pw || y >= st.ph) false
    else {
      val omx = x / 16; val omy = y / 16
      if (omx == mbX && omy == mbY)
        done(((y % 16) / 8) * 2 + (x % 16) / 8)
      else st.mbAvail(omx, omy)
    }
  }

  /** available Intra_8x8 modes at (x0, y0) — same availability algebra
    * as [[i4AvailableModes]] (§8.3.2.2): DC always; V/DDL/VL need top;
    * H/HU need left; DDR/VR/HD need top+left+corner
    */
  private def i8AvailableModes(x0: Int, y0: Int,
      avail: (Int, Int) => Boolean): Seq[Int] = {
    val hasT = avail(x0, y0 - 1)
    val hasL = avail(x0 - 1, y0)
    val hasD = avail(x0 - 1, y0 - 1)
    Seq(2) ++
      (if (hasT) Seq(0, 3, 7) else Nil) ++
      (if (hasL) Seq(1, 8) else Nil) ++
      (if (hasT && hasL && hasD) Seq(4, 5, 6) else Nil)
  }

  /** per-pixel Intra_8x8 luma prediction (§8.3.2.2) from the
    * reconstructed neighbors, INCLUDING the §8.3.2.2.1 reference-sample
    * low-pass filter ([1 2 1] with 3x-weighted ends) that distinguishes
    * 8x8 intra from the 4x4 modes; returns 64 samples in raster order
    */
  private def predLuma8(st: PicState, x0: Int, y0: Int, mode: Int,
      avail: (Int, Int) => Boolean): Array[Int] = {
    @inline def s(x: Int, y: Int) = st.reconY(y * st.pw + x) & 0xff
    val hasL = avail(x0 - 1, y0)
    val hasT = avail(x0, y0 - 1)
    val hasD = avail(x0 - 1, y0 - 1)
    val hasC = avail(x0 + 8, y0 - 1)
    val t = new Array[Int](16)
    if (hasT) {
      var i = 0
      while (i < 8) { t(i) = s(x0 + i, y0 - 1); i += 1 }
      while (i < 16) { t(i) = if (hasC) s(x0 + i, y0 - 1) else t(7); i += 1 }
    }
    val l = new Array[Int](8)
    if (hasL) { var i = 0; while (i < 8) { l(i) = s(x0 - 1, y0 + i); i += 1 } }
    val d = if (hasD) s(x0 - 1, y0 - 1) else 0
    // §8.3.2.2.1 reference filtering
    val ft = new Array[Int](16)
    val fl = new Array[Int](8)
    if (hasT) {
      ft(0) = if (hasD) (d + 2 * t(0) + t(1) + 2) >> 2 else (3 * t(0) + t(1) + 2) >> 2
      var i = 1
      while (i < 15) { ft(i) = (t(i - 1) + 2 * t(i) + t(i + 1) + 2) >> 2; i += 1 }
      ft(15) = (t(14) + 3 * t(15) + 2) >> 2
    }
    if (hasL) {
      fl(0) = if (hasD) (d + 2 * l(0) + l(1) + 2) >> 2 else (3 * l(0) + l(1) + 2) >> 2
      var i = 1
      while (i < 7) { fl(i) = (l(i - 1) + 2 * l(i) + l(i + 1) + 2) >> 2; i += 1 }
      fl(7) = (l(6) + 3 * l(7) + 2) >> 2
    }
    val fd =
      if (!hasD) 0
      else if (hasT && hasL) (t(0) + 2 * d + l(0) + 2) >> 2
      else if (hasT) (3 * d + t(0) + 2) >> 2
      else if (hasL) (3 * d + l(0) + 2) >> 2
      else d
    val out = new Array[Int](64)
    @inline def put(x: Int, y: Int, v: Int): Unit = out(y * 8 + x) = v
    @inline def ftp(i: Int): Int = if (i < 0) fd else ft(i)
    @inline def flp(i: Int): Int = if (i < 0) fd else fl(i)
    mode match {
      case 0 =>
        require(hasT, "Intra_8x8 vertical needs the top row")
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) { put(x, y, ft(x)); x += 1 }; y += 1 }
      case 1 =>
        require(hasL, "Intra_8x8 horizontal needs the left column")
        var y = 0
        while (y < 8) { var x = 0; while (x < 8) { put(x, y, fl(y)); x += 1 }; y += 1 }
      case 2 =>
        var st8 = 0; var sl8 = 0
        var i = 0
        while (i < 8) { st8 += ft(i); sl8 += fl(i); i += 1 }
        val v =
          if (hasT && hasL) (st8 + sl8 + 8) >> 4
          else if (hasT) (st8 + 4) >> 3
          else if (hasL) (sl8 + 4) >> 3
          else 128
        java.util.Arrays.fill(out, v)
      case 3 =>
        require(hasT, "Intra_8x8 DDL needs the top row")
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            put(x, y,
              if (x == 7 && y == 7) (ft(14) + 3 * ft(15) + 2) >> 2
              else (ft(x + y) + 2 * ft(x + y + 1) + ft(x + y + 2) + 2) >> 2)
            x += 1
          }
          y += 1
        }
      case 4 =>
        require(hasT && hasL && hasD, "Intra_8x8 DDR needs top+left+corner")
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            put(x, y,
              if (x > y) (ftp(x - y - 2) + 2 * ftp(x - y - 1) + ft(x - y) + 2) >> 2
              else if (x < y) (flp(y - x - 2) + 2 * flp(y - x - 1) + fl(y - x) + 2) >> 2
              else (ft(0) + 2 * fd + fl(0) + 2) >> 2)
            x += 1
          }
          y += 1
        }
      case 5 =>
        require(hasT && hasL && hasD, "Intra_8x8 VR needs top+left+corner")
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val z = 2 * x - y
            put(x, y,
              if (z >= 0 && z % 2 == 0) (ftp(x - (y >> 1) - 1) + ftp(x - (y >> 1)) + 1) >> 1
              else if (z >= 0) (ftp(x - (y >> 1) - 2) + 2 * ftp(x - (y >> 1) - 1) + ftp(x - (y >> 1)) + 2) >> 2
              else if (z == -1) (fl(0) + 2 * fd + ft(0) + 2) >> 2
              else (flp(y - 2 * x - 1) + 2 * flp(y - 2 * x - 2) + flp(y - 2 * x - 3) + 2) >> 2)
            x += 1
          }
          y += 1
        }
      case 6 =>
        require(hasT && hasL && hasD, "Intra_8x8 HD needs top+left+corner")
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val z = 2 * y - x
            put(x, y,
              if (z >= 0 && z % 2 == 0) (flp(y - (x >> 1) - 1) + flp(y - (x >> 1)) + 1) >> 1
              else if (z >= 0) (flp(y - (x >> 1) - 2) + 2 * flp(y - (x >> 1) - 1) + flp(y - (x >> 1)) + 2) >> 2
              else if (z == -1) (fl(0) + 2 * fd + ft(0) + 2) >> 2
              else (ftp(x - 2 * y - 1) + 2 * ftp(x - 2 * y - 2) + ftp(x - 2 * y - 3) + 2) >> 2)
            x += 1
          }
          y += 1
        }
      case 7 =>
        require(hasT, "Intra_8x8 VL needs the top row")
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val i = x + (y >> 1)
            put(x, y,
              if (y % 2 == 0) (ft(i) + ft(i + 1) + 1) >> 1
              else (ft(i) + 2 * ft(i + 1) + ft(i + 2) + 2) >> 2)
            x += 1
          }
          y += 1
        }
      case 8 =>
        require(hasL, "Intra_8x8 HU needs the left column")
        var y = 0
        while (y < 8) {
          var x = 0
          while (x < 8) {
            val z = x + 2 * y
            put(x, y,
              if (z > 13) fl(7)
              else if (z == 13) (fl(6) + 3 * fl(7) + 2) >> 2
              else if (z % 2 == 0) (fl(y + (x >> 1)) + fl(y + (x >> 1) + 1) + 1) >> 1
              else (fl(y + (x >> 1)) + 2 * fl(y + (x >> 1) + 1) + fl(y + (x >> 1) + 2) + 2) >> 2)
            x += 1
          }
          y += 1
        }
      case other => sys.error(s"Intra_8x8 prediction mode $other out of range")
    }
    out
  }

  /** spec-suite hook: [[predLuma8]] against planted neighbor samples —
    * the white-box pin recomputes the §8.3.2.2 filter + mode formulas
    * independently in the test and compares (same pattern as
    * [[i4PredForTest]]/[[i16PredForTest]])
    */
  private[graft] def i8PredForTest(top: Option[Array[Int]],
      topRight: Option[Array[Int]], left: Option[Array[Int]],
      corner: Option[Int], mode: Int): Array[Int] = {
    val st = new PicState(2, 2)
    top.foreach { t =>
      var i = 0; while (i < 8) { st.reconY(15 * st.pw + 16 + i) = t(i).toByte; i += 1 } }
    topRight.foreach { t =>
      var i = 0; while (i < 8) { st.reconY(15 * st.pw + 24 + i) = t(i).toByte; i += 1 } }
    left.foreach { l =>
      var i = 0; while (i < 8) { st.reconY((16 + i) * st.pw + 15) = l(i).toByte; i += 1 } }
    corner.foreach(c => st.reconY(15 * st.pw + 15) = c.toByte)
    val avail: (Int, Int) => Boolean = (x, y) =>
      if (y == 15 && x >= 16 && x < 24) top.isDefined
      else if (y == 15 && x >= 24 && x < 32) topRight.isDefined
      else if (x == 15 && y >= 16 && y < 24) left.isDefined
      else if (x == 15 && y == 15) corner.isDefined
      else false
    predLuma8(st, 16, 16, mode, avail)
  }

  /** replicate an 8x8 block's mode into its four covering 4x4 cells —
    * neighbor MPM derivations (both I4-vs-I8 directions) then read the
    * covering cell, which is the spec's cross-size MPM rule
    */
  @inline private def setI8ModeCells(st: PicState, mbX: Int, mbY: Int,
      blk: Int, mode: Int): Unit = {
    val bx = mbX * 4 + (blk % 2) * 2; val by = mbY * 4 + (blk / 2) * 2
    st.i4Mode(by * st.bw4 + bx) = mode
    st.i4Mode(by * st.bw4 + bx + 1) = mode
    st.i4Mode((by + 1) * st.bw4 + bx) = mode
    st.i4Mode((by + 1) * st.bw4 + bx + 1) = mode
  }

  /** closed-loop Intra_8x8 ANALYSIS + reconstruction for one MB (mirror
    * of [[analyseLumaI4]] at 8x8 granularity): per block in z-order,
    * lowest-SAD available mode, 8x8 transform/quant, immediate recon.
    * Returns (modes, per-block 64-coeff zigzags, cbpLuma, total SAD).
    */
  private def analyseLumaI8(st: PicState, mbX: Int, mbY: Int, qp: Int,
      srcY: Array[Byte]): (Array[Int], Array[Array[Int]], Int, Long) = {
    val modes = new Array[Int](4)
    val zigs = Array.fill(4)(new Array[Int](64))
    val done = new Array[Boolean](4)
    val avail = i8SampleAvail(st, mbX, mbY, done)
    val buf = new Array[Int](64)
    val w = new Array[Int](64)
    var cbp = 0
    var sadTotal = 0L
    var blk = 0
    while (blk < 4) {
      val x0 = mbX * 16 + (blk % 2) * 8
      val y0 = mbY * 16 + (blk / 2) * 8
      var bestMode = 2
      var bestSad = Long.MaxValue
      var bestPred: Array[Int] = null
      i8AvailableModes(x0, y0, avail).sorted.foreach { m =>
        val p = predLuma8(st, x0, y0, m, avail)
        var sad = 0L
        var i = 0
        while (i < 64) {
          sad += math.abs((srcY((y0 + i / 8) * st.pw + x0 + i % 8) & 0xff) - p(i))
          i += 1
        }
        if (sad < bestSad) { bestSad = sad; bestMode = m; bestPred = p }
      }
      modes(blk) = bestMode
      sadTotal += bestSad
      setI8ModeCells(st, mbX, mbY, blk, bestMode)
      var i = 0
      while (i < 64) {
        buf(i) = (srcY((y0 + i / 8) * st.pw + x0 + i % 8) & 0xff) - bestPred(i)
        i += 1
      }
      forward8x8(buf)
      var any = false
      var zi = 0
      while (zi < 64) {
        val pos = zigzag8x8(zi)
        val z = st.scal.qAc8(buf(pos), qp, pos, L8Intra)
        zigs(blk)(zi) = z
        if (z != 0) any = true
        zi += 1
      }
      if (any) cbp |= 1 << blk
      java.util.Arrays.fill(w, 0)
      zi = 0
      while (zi < 64) {
        val pos = zigzag8x8(zi)
        w(pos) = st.scal.deqAc8(zigs(blk)(zi), qp, pos, L8Intra)
        zi += 1
      }
      inverse8x8(w)
      i = 0
      while (i < 64) {
        st.reconY((y0 + i / 8) * st.pw + x0 + i % 8) = clip(bestPred(i) + w(i))
        i += 1
      }
      done(blk) = true
      blk += 1
    }
    (modes, zigs, cbp, sadTotal)
  }

  /** decoder-side Intra_8x8 luma reconstruction — exact mirror of
    * [[analyseLumaI8]]'s closed loop (the caller has already replicated
    * the parsed modes into the 4x4 cells)
    */
  private def reconstructLumaI8(st: PicState, mbX: Int, mbY: Int, qp: Int,
      modes: Array[Int], zig8: Array[Array[Int]], cbpLuma: Int): Unit = {
    val done = new Array[Boolean](4)
    val avail = i8SampleAvail(st, mbX, mbY, done)
    val w = new Array[Int](64)
    var blk = 0
    while (blk < 4) {
      val x0 = mbX * 16 + (blk % 2) * 8
      val y0 = mbY * 16 + (blk / 2) * 8
      val pred = predLuma8(st, x0, y0, modes(blk), avail)
      java.util.Arrays.fill(w, 0)
      if (((cbpLuma >> blk) & 1) != 0) {
        var zi = 0
        while (zi < 64) {
          val pos = zigzag8x8(zi)
          w(pos) = st.scal.deqAc8(zig8(blk)(zi), qp, pos, L8Intra)
          zi += 1
        }
      }
      inverse8x8(w)
      var i = 0
      while (i < 64) {
        st.reconY((y0 + i / 8) * st.pw + x0 + i % 8) = clip(pred(i) + w(i))
        i += 1
      }
      done(blk) = true
      blk += 1
    }
  }

  /** shared encoder/decoder reconstruction of one Intra_16x16 MB: dequant,
    * inverse transforms, prediction add, clip — into the recon planes
    */
  private def reconstructMb(st: PicState, mbX: Int, mbY: Int, qp: Int, mc: MbCoeffs): Unit = {
    st.mbQp(mbY * st.mbW + mbX) = qp
    val qpc = chromaQp(qp + st.cqpOff)
    val qpcCr = chromaQp(qp + st.cqpOff2)
    // ---- luma
    val dcArr = new Array[Int](16)
    var i = 0
    while (i < 16) { dcArr(zigzag4x4(i)) = mc.lumaDcZig(i); i += 1 }
    hadamard4x4(dcArr)
    i = 0
    while (i < 16) { dcArr(i) = st.scal.deqLumaDc(dcArr(i), qp); i += 1 }
    val predY = predLuma16(st, mbX, mbY, mc.predMode)
    val x0 = mbX * 16; val y0 = mbY * 16
    if (Simd.enabled && st.scal.flat) {
      // batched I16 luma: the separately-scaled DC (inverse Hadamard +
      // dequantLumaDc above) fills the SoA position-0 row, the AC levels
      // vector-dequant from position 1 — then the same two-batch
      // inverse + row-commit shape as the inter path
      val sc = mcScratch.get()
      val res = sc.res256
      val soa = sc.soa128
      val vArr = H264Transform.vRaster(qp % 6)
      val shift = qp / 6
      var batch = 0
      while (batch < 2) {
        java.util.Arrays.fill(soa, 0)
        var b = 0
        while (b < 8) {
          val blk = batch * 8 + b
          if (mc.cbpLuma != 0) {
            val zigs = mc.lumaAcZig(blk)
            var zi = 1
            while (zi < 16) {
              val z = zigs(zi - 1)
              if (z != 0) soa(zigzag4x4(zi) * 8 + b) = z
              zi += 1
            }
          }
          b += 1
        }
        graft.simd.VectorKernels.dequantRows8(soa, vArr, shift, 1)
        b = 0
        while (b < 8) {
          val blk = batch * 8 + b
          soa(b) = dcArr(blkY(blk) * 4 + blkX(blk))
          b += 1
        }
        graft.simd.VectorKernels.inverse4x4x8(soa)
        b = 0
        while (b < 8) {
          val blk = batch * 8 + b
          val bx0 = blkX(blk) * 4; val by0 = blkY(blk) * 4
          var p = 0
          while (p < 16) {
            res((by0 + (p >> 2)) * 16 + bx0 + (p & 3)) = soa(p * 8 + b)
            p += 1
          }
          b += 1
        }
        batch += 1
      }
      var r = 0
      while (r < 16) {
        graft.simd.VectorKernels.addClipNarrowRow16(predY, r * 16, res, r * 16,
          st.reconY, (y0 + r) * st.pw + x0)
        r += 1
      }
    } else {
    var blk = 0
    val w = new Array[Int](16)
    while (blk < 16) {
      java.util.Arrays.fill(w, 0)
      w(0) = dcArr(blkY(blk) * 4 + blkX(blk))
      if (mc.cbpLuma != 0) {
        var zi = 1
        while (zi < 16) {
          val pos = zigzag4x4(zi)
          w(pos) = st.scal.deqAc(mc.lumaAcZig(blk)(zi - 1), qp, pos, LIntraY)
          zi += 1
        }
      }
      inverse4x4(w)
      val bx0 = x0 + blkX(blk) * 4; val by0 = y0 + blkY(blk) * 4
      var r = 0
      while (r < 4) {
        var c = 0
        while (c < 4) {
          st.reconY((by0 + r) * st.pw + bx0 + c) = clip(
            predY((blkY(blk) * 4 + r) * 16 + blkX(blk) * 4 + c) + w(r * 4 + c))
          c += 1
        }
        r += 1
      }
      blk += 1
    }
    }
    // ---- chroma
    intraChromaRecon(st, mbX, mbY, qpc, mc.cbpChroma,
      mc.cbDcZig, mc.cbAcZig, mc.crDcZig, mc.crAcZig, mc.chromaMode,
      qpcCrIn = qpcCr)
  }

  /** shared intra-MB chroma reconstruction (§8.3.4 prediction by
    * `chromaMode` + residual add) — identical for Intra_16x16, Intra_4x4,
    * and Intra_8x8 macroblocks
    */
  private def intraChromaRecon(st: PicState, mbX: Int, mbY: Int, qpcCb: Int,
      cbpChroma: Int, cbDcZig: Array[Int], cbAcZig: Array[Array[Int]],
      crDcZig: Array[Int], crAcZig: Array[Array[Int]],
      chromaMode: Int = 0, qpcCrIn: Int = -1): Unit = {
    val qpcCr = if (qpcCrIn >= 0) qpcCrIn else qpcCb
    val w = new Array[Int](16)
    val hasL = st.mbAvail(mbX - 1, mbY)
    val hasT = st.mbAvail(mbX, mbY - 1)
    val hasTL = st.mbAvail(mbX - 1, mbY - 1)
    def chroma(plane: Array[Byte], dcZig: Array[Int], acZig: Array[Array[Int]],
        list: Int, qpc: Int): Unit = {
      val dc = new Array[Int](4)
      // cbpChroma == 0 means NO chroma residual was parsed — the dcZig
      // scratch may hold a previous MB's data (pooled), so it must not be
      // read (zero DC == zero residual, matching the parse)
      if (cbpChroma != 0) {
        var k = 0
        while (k < 4) { dc(k) = dcZig(k); k += 1 }
        hadamard2x2(dc)
        k = 0
        while (k < 4) { dc(k) = st.scal.deqChromaDc(dc(k), qpc, list); k += 1 }
      }
      val pred = predChroma8(plane, st.cw, mbX, mbY, chromaMode, hasL, hasT, hasTL)
      val cx0 = mbX * 8; val cy0 = mbY * 8
      var cb = 0
      while (cb < 4) {
        val bx = cb % 2; val by = cb / 2
        java.util.Arrays.fill(w, 0)
        w(0) = dc(by * 2 + bx)
        if (cbpChroma == 2) {
          var zi = 1
          while (zi < 16) {
            val pos = zigzag4x4(zi)
            w(pos) = st.scal.deqAc(acZig(cb)(zi - 1), qpc, pos, list)
            zi += 1
          }
        }
        inverse4x4(w)
        val px0 = cx0 + bx * 4; val py0 = cy0 + by * 4
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            plane((py0 + r) * st.cw + px0 + c) = clip(
              pred((by * 4 + r) * 8 + bx * 4 + c) + w(r * 4 + c))
            c += 1
          }
          r += 1
        }
        cb += 1
      }
    }
    chroma(st.reconCb, cbDcZig, cbAcZig, LIntraCb, qpcCb)
    chroma(st.reconCr, crDcZig, crAcZig, LIntraCr, qpcCr)
  }

  // ----------------------------------------------------- inter (P) path

  /** edge-replicated reference sample (the spec's unrestricted-MV padding) */
  @inline private def refSample(plane: Array[Byte], pw: Int, ph: Int, x: Int, y: Int): Int = {
    val cx = if (x < 0) 0 else if (x >= pw) pw - 1 else x
    val cy = if (y < 0) 0 else if (y >= ph) ph - 1 else y
    plane(cy * pw + cx) & 0xff
  }

  /** per-thread MC/reconstruction scratch — motion compensation runs per
    * macroblock (hundreds of thousands per VGA GOP) and the per-call
    * temporaries (quarter-pel halves, the separable 6-tap row buffer, the
    * prediction blocks) profiled as a steady GC tax. One codec call runs
    * per thread at a time (Spark task threads each decode their own GOP),
    * so thread-local reuse is safe; the recursion in [[mcLuma]] is one
    * level deep (quarter -> two even positions) and the even paths touch
    * only `hrow`, never `qa`/`qb`.
    */
  private final class McScratch {
    val qa = new Array[Int](256) // quarter-pel half A
    val qb = new Array[Int](256) // quarter-pel half B
    val hrow = new Array[Int](16 * 21) // separable center-j row buffer
    val predL = new Array[Int](256) // inter luma prediction
    val predL1 = new Array[Int](256) // list-1 luma (bi averaging)
    val predC = new Array[Int](64) // inter chroma prediction (Cb)
    val predC1 = new Array[Int](64) // list-1 chroma (bi averaging temp)
    val predC2 = new Array[Int](64) // inter chroma prediction (Cr)
    val w16 = new Array[Int](16) // dequantised 4x4 residual
    val res256 = new Array[Int](256) // SIMD residual-commit spread (luma)
    val res64 = new Array[Int](64)   // SIMD residual-commit spread (chroma)
    val soa128 = new Array[Int](128) // SoA batch: 8 blocks x 16 positions
    val ch0 = new Array[Int](8) // chroma separable row caches
    val ch1 = new Array[Int](8)
    val sig64 = new Array[Boolean](64) // CABAC significance map scratch
  }
  private val mcScratch = new ThreadLocal[McScratch] {
    override def initialValue(): McScratch = new McScratch
  }

  /** 16x16 luma motion compensation. MVs are QUARTER-pel per the spec's
    * mvd semantics; integer and HALF-pel positions are implemented (the
    * spec's 6-tap (1,-5,20,20,-5,1)/32 Wiener filter, §8.4.2.2.1, with
    * the exact b/h/j formulas incl. the 10-bit center normalisation).
    * Quarter-pel positions (the final averaging step) are refused loudly
    * — the encoder never emits them.
    */
  /** 16x16 luma motion compensation at any quarter-pel MV (§8.4.2.2.1):
    * integer copy, the 6-tap Wiener half-pel positions (b/h/j), and the
    * quarter positions as the spec's rounding average of the two nearest
    * integer/half samples — a/c/d/n average along one axis, f/i/k/q
    * average the half position with the centre j, and the diagonal
    * e/g/p/r average the adjacent b-row and h-column half samples.
    */
  /** 16x16 whole-MB luma MC, kept as a SEPARATE constant-bound copy of
    * [[mcLumaBlk]]: the JIT unrolls the fixed 16-wide loops here where
    * the generic version's variable bounds cost ~15-20% of total decode
    * (measured via DecodeProfile when the round-14 refactor briefly
    * routed this through the generic path) — and whole-MB prediction is
    * the dominant case in every tier. */
  private def mcLuma(ref: PicState, mbX: Int, mbY: Int, mvx: Int, mvy: Int,
      out: Array[Int]): Unit = {
    val fx = mvx & 3; val fy = mvy & 3
    if (fx % 2 == 1 || fy % 2 == 1) {
      val (mvAx, mvAy, mvBx, mvBy) =
        if (fy % 2 == 0)      (mvx - 1, mvy, mvx + 1, mvy)
        else if (fx % 2 == 0) (mvx, mvy - 1, mvx, mvy + 1)
        else if ((fx + fy) % 4 == 2) (mvx + 1, mvy - 1, mvx - 1, mvy + 1)
        else                  (mvx - 1, mvy - 1, mvx + 1, mvy + 1)
      val sc = mcScratch.get()
      val a = sc.qa
      val b = sc.qb
      mcLuma(ref, mbX, mbY, mvAx, mvAy, a)
      mcLuma(ref, mbX, mbY, mvBx, mvBy, b)
      if (Simd.enabled) {
        var o = 0
        while (o < 256) { graft.simd.VectorKernels.avg3Row16(a, o, b, o, out, o); o += 16 }
      } else {
        var i = 0
        while (i < 256) { out(i) = (a(i) + b(i) + 1) >> 1; i += 1 }
      }
      return
    }
    val x0 = mbX * 16 + (mvx >> 2); val y0 = mbY * 16 + (mvy >> 2)
    val pw = ref.pw; val ph = ref.ph; val plane = ref.reconY
    @inline def s(x: Int, y: Int) = refSample(plane, pw, ph, x, y)
    @inline def clip255(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    val interior = x0 >= 2 && y0 >= 2 && x0 + 18 < pw && y0 + 18 < ph
    if (fx == 0 && fy == 0) {
      if (interior && Simd.enabled) {
        var r = 0
        while (r < 16) {
          graft.simd.VectorKernels.widenRow16(plane, (y0 + r) * pw + x0, out, r * 16)
          r += 1
        }
      } else if (interior) {
        var r = 0
        while (r < 16) {
          val base = (y0 + r) * pw + x0
          val o = r * 16
          var c = 0
          while (c < 16) { out(o + c) = plane(base + c) & 0xff; c += 1 }
          r += 1
        }
      } else {
        var r = 0
        while (r < 16) {
          var c = 0
          while (c < 16) { out(r * 16 + c) = s(x0 + c, y0 + r); c += 1 }
          r += 1
        }
      }
    } else if (fx == 2 && fy == 0) { // horizontal half-pel b
      if (interior && Simd.enabled) {
        var r = 0
        while (r < 16) {
          graft.simd.VectorKernels.hfirRow16(plane, (y0 + r) * pw + x0, out, r * 16)
          r += 1
        }
      } else if (interior) {
        var r = 0
        while (r < 16) {
          val base = (y0 + r) * pw + x0
          val o = r * 16
          var c = 0
          while (c < 16) {
            val p = base + c
            val b1 = ((plane(p - 2) & 0xff) + (plane(p + 3) & 0xff)) +
              20 * ((plane(p) & 0xff) + (plane(p + 1) & 0xff)) -
              5 * ((plane(p - 1) & 0xff) + (plane(p + 2) & 0xff))
            out(o + c) = clip255((b1 + 16) >> 5)
            c += 1
          }
          r += 1
        }
      } else {
        var r = 0
        while (r < 16) {
          var c = 0
          while (c < 16) {
            val x = x0 + c; val y = y0 + r
            val b1 = s(x - 2, y) - 5 * s(x - 1, y) + 20 * s(x, y) +
              20 * s(x + 1, y) - 5 * s(x + 2, y) + s(x + 3, y)
            out(r * 16 + c) = clip255((b1 + 16) >> 5)
            c += 1
          }
          r += 1
        }
      }
    } else if (fx == 0 && fy == 2) { // vertical half-pel h
      if (interior && Simd.enabled) {
        var r = 0
        while (r < 16) {
          graft.simd.VectorKernels.vfirRow16(plane, (y0 + r) * pw + x0, pw, out, r * 16)
          r += 1
        }
      } else if (interior) {
        var r = 0
        while (r < 16) {
          val base = (y0 + r) * pw + x0
          val o = r * 16
          var c = 0
          while (c < 16) {
            val p = base + c
            val h1 = ((plane(p - 2 * pw) & 0xff) + (plane(p + 3 * pw) & 0xff)) +
              20 * ((plane(p) & 0xff) + (plane(p + pw) & 0xff)) -
              5 * ((plane(p - pw) & 0xff) + (plane(p + 2 * pw) & 0xff))
            out(o + c) = clip255((h1 + 16) >> 5)
            c += 1
          }
          r += 1
        }
      } else {
        var r = 0
        while (r < 16) {
          var c = 0
          while (c < 16) {
            val x = x0 + c; val y = y0 + r
            val h1 = s(x, y - 2) - 5 * s(x, y - 1) + 20 * s(x, y) +
              20 * s(x, y + 1) - 5 * s(x, y + 2) + s(x, y + 3)
            out(r * 16 + c) = clip255((h1 + 16) >> 5)
            c += 1
          }
          r += 1
        }
      }
    } else { // center half-pel j: separable (see mcLumaBlk)
      val hb = mcScratch.get().hrow
      val simd = Simd.enabled
      var rr = 0
      while (rr < 21) {
        val y = y0 - 2 + rr
        val o = rr * 16
        if (interior && simd) {
          graft.simd.VectorKernels.hrawRow16(plane, y * pw + x0, hb, o)
        } else if (interior) {
          val base = y * pw + x0
          var c = 0
          while (c < 16) {
            val p = base + c
            hb(o + c) = ((plane(p - 2) & 0xff) + (plane(p + 3) & 0xff)) +
              20 * ((plane(p) & 0xff) + (plane(p + 1) & 0xff)) -
              5 * ((plane(p - 1) & 0xff) + (plane(p + 2) & 0xff))
            c += 1
          }
        } else {
          var c = 0
          while (c < 16) {
            val x = x0 + c
            hb(o + c) = s(x - 2, y) - 5 * s(x - 1, y) + 20 * s(x, y) +
              20 * s(x + 1, y) - 5 * s(x + 2, y) + s(x + 3, y)
            c += 1
          }
        }
        rr += 1
      }
      if (simd) {
        var r = 0
        while (r < 16) {
          graft.simd.VectorKernels.jfirRow16(hb, r * 16, out, r * 16)
          r += 1
        }
      } else {
      var r = 0
      while (r < 16) {
        val o = r * 16
        var c = 0
        while (c < 16) {
          val i = o + c
          val j1 = (hb(i) + hb(i + 80)) + 20 * (hb(i + 32) + hb(i + 48)) -
            5 * (hb(i + 16) + hb(i + 64))
          out(i) = clip255((j1 + 512) >> 10)
          c += 1
        }
        r += 1
      }
      }
    }
  }

  /** Block-size-generic luma MC (sub-16x16 partitions since round 14):
    * predicts the w x h block whose top-left source position is
    * (px, py) + mv into `out` (a 16x16 MB-local buffer, stride 16) at
    * offset (ox, oy). The 16x16 wrapper above is the pre-partition MB
    * path, byte-identical to the round-13 implementation.
    */
  private def mcLumaBlk(ref: PicState, px: Int, py: Int, w: Int, h: Int,
      mvx: Int, mvy: Int, out: Array[Int], ox: Int, oy: Int): Unit = {
    val fx = mvx & 3; val fy = mvy & 3
    if (fx % 2 == 1 || fy % 2 == 1) {
      // quarter position: average the two source positions (both with
      // even fractions, so the recursive calls hit the half/integer
      // paths). One-axis odd: neighbours along that axis. Both odd: the
      // spec's diagonal pairing — (1,1)/(3,3) average (fx+1,fy-1) with
      // (fx-1,fy+1); (3,1)/(1,3) average (fx-1,fy-1) with (fx+1,fy+1).
      val (mvAx, mvAy, mvBx, mvBy) =
        if (fy % 2 == 0)      (mvx - 1, mvy, mvx + 1, mvy)
        else if (fx % 2 == 0) (mvx, mvy - 1, mvx, mvy + 1)
        else if ((fx + fy) % 4 == 2) (mvx + 1, mvy - 1, mvx - 1, mvy + 1)
        else                  (mvx - 1, mvy - 1, mvx + 1, mvy + 1)
      val sc = mcScratch.get()
      val a = sc.qa
      val b = sc.qb
      // halves land at offset (0,0) of the scratch buffers (stride 16)
      mcLumaBlk(ref, px, py, w, h, mvAx, mvAy, a, 0, 0)
      mcLumaBlk(ref, px, py, w, h, mvBx, mvBy, b, 0, 0)
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          val i = r * 16 + c
          out((oy + r) * 16 + ox + c) = (a(i) + b(i) + 1) >> 1
          c += 1
        }
        r += 1
      }
      return
    }
    val x0 = px + (mvx >> 2); val y0 = py + (mvy >> 2)
    val pw = ref.pw; val ph = ref.ph; val plane = ref.reconY
    @inline def s(x: Int, y: Int) = refSample(plane, pw, ph, x, y)
    @inline def clip255(v: Int) = if (v < 0) 0 else if (v > 255) 255 else v
    // interior = the whole 6-tap footprint (x0-2 .. x0+w+2, y0-2 ..
    // y0+h+2) lands inside the plane, so the clamp in refSample can be
    // skipped and samples indexed directly — true for every block that
    // isn't on the picture edge with an outward-pointing MV
    val interior = x0 >= 2 && y0 >= 2 && x0 + w + 2 < pw && y0 + h + 2 < ph
    if (fx == 0 && fy == 0) {
      if (interior) {
        var r = 0
        while (r < h) {
          val base = (y0 + r) * pw + x0
          val o = (oy + r) * 16 + ox
          var c = 0
          while (c < w) { out(o + c) = plane(base + c) & 0xff; c += 1 }
          r += 1
        }
      } else {
        var r = 0
        while (r < h) {
          val o = (oy + r) * 16 + ox
          var c = 0
          while (c < w) { out(o + c) = s(x0 + c, y0 + r); c += 1 }
          r += 1
        }
      }
    } else if (fx == 2 && fy == 0) { // horizontal half-pel b
      if (interior) {
        var r = 0
        while (r < h) {
          val base = (y0 + r) * pw + x0
          val o = (oy + r) * 16 + ox
          var c = 0
          while (c < w) {
            val p = base + c
            // (1,-5,20,20,-5,1) via 2 multiplies: (a+f) + 20(c+d) - 5(b+e)
            val b1 = ((plane(p - 2) & 0xff) + (plane(p + 3) & 0xff)) +
              20 * ((plane(p) & 0xff) + (plane(p + 1) & 0xff)) -
              5 * ((plane(p - 1) & 0xff) + (plane(p + 2) & 0xff))
            out(o + c) = clip255((b1 + 16) >> 5)
            c += 1
          }
          r += 1
        }
      } else {
        var r = 0
        while (r < h) {
          val o = (oy + r) * 16 + ox
          var c = 0
          while (c < w) {
            val x = x0 + c; val y = y0 + r
            val b1 = s(x - 2, y) - 5 * s(x - 1, y) + 20 * s(x, y) +
              20 * s(x + 1, y) - 5 * s(x + 2, y) + s(x + 3, y)
            out(o + c) = clip255((b1 + 16) >> 5)
            c += 1
          }
          r += 1
        }
      }
    } else if (fx == 0 && fy == 2) { // vertical half-pel h
      if (interior) {
        var r = 0
        while (r < h) {
          val base = (y0 + r) * pw + x0
          val o = (oy + r) * 16 + ox
          var c = 0
          while (c < w) {
            val p = base + c
            val h1 = ((plane(p - 2 * pw) & 0xff) + (plane(p + 3 * pw) & 0xff)) +
              20 * ((plane(p) & 0xff) + (plane(p + pw) & 0xff)) -
              5 * ((plane(p - pw) & 0xff) + (plane(p + 2 * pw) & 0xff))
            out(o + c) = clip255((h1 + 16) >> 5)
            c += 1
          }
          r += 1
        }
      } else {
        var r = 0
        while (r < h) {
          val o = (oy + r) * 16 + ox
          var c = 0
          while (c < w) {
            val x = x0 + c; val y = y0 + r
            val h1 = s(x, y - 2) - 5 * s(x, y - 1) + 20 * s(x, y) +
              20 * s(x, y + 1) - 5 * s(x, y + 2) + s(x, y + 3)
            out(o + c) = clip255((h1 + 16) >> 5)
            c += 1
          }
          r += 1
        }
      }
    } else { // center half-pel j: separable — horizontal 6-tap rows once
      // (h+5 rows cover the vertical footprint), then the vertical 6-tap
      // over the row buffer. The naive form recomputed each horizontal
      // tap 6x per output pixel (36 clamped loads/pixel); this is ~6.
      val hb = mcScratch.get().hrow
      var rr = 0
      while (rr < h + 5) {
        val y = y0 - 2 + rr
        val o = rr * 16
        if (interior) {
          val base = y * pw + x0
          var c = 0
          while (c < w) {
            val p = base + c
            hb(o + c) = ((plane(p - 2) & 0xff) + (plane(p + 3) & 0xff)) +
              20 * ((plane(p) & 0xff) + (plane(p + 1) & 0xff)) -
              5 * ((plane(p - 1) & 0xff) + (plane(p + 2) & 0xff))
            c += 1
          }
        } else {
          var c = 0
          while (c < w) {
            val x = x0 + c
            hb(o + c) = s(x - 2, y) - 5 * s(x - 1, y) + 20 * s(x, y) +
              20 * s(x + 1, y) - 5 * s(x + 2, y) + s(x + 3, y)
            c += 1
          }
        }
        rr += 1
      }
      var r = 0
      while (r < h) {
        val o = (oy + r) * 16 + ox
        var c = 0
        while (c < w) {
          val i = r * 16 + c
          val j1 = (hb(i) + hb(i + 80)) + 20 * (hb(i + 32) + hb(i + 48)) -
            5 * (hb(i + 16) + hb(i + 64))
          out(o + c) = clip255((j1 + 512) >> 10)
          c += 1
        }
        r += 1
      }
    }
  }

  /** 8x8 chroma MC: the luma quarter-pel MV IS the chroma eighth-pel MV;
    * integer-pel luma motion lands on {0, 1/2} chroma positions, handled
    * by the spec's bilinear interpolation (§8.4.2.2.2)
    */
  /** 8x8 whole-MB chroma MC — constant-bound copy of [[mcChromaBlk]]
    * for the same JIT reason as [[mcLuma]] */
  private def mcChroma(plane: Array[Byte], cw: Int, ch: Int, mbX: Int, mbY: Int,
      mvx: Int, mvy: Int, out: Array[Int]): Unit = {
    val fx = mvx & 7 // eighth-pel fraction (two's-complement & handles <0)
    val fy = mvy & 7
    val bx = mbX * 8 + (mvx >> 3)
    val by = mbY * 8 + (mvy >> 3)
    val interior = bx >= 0 && by >= 0 && bx + 9 <= cw && by + 9 <= ch
    if (fx == 0 && fy == 0) {
      if (interior && Simd.enabled) {
        var r = 0
        while (r < 8) {
          graft.simd.VectorKernels.widenRow8(plane, (by + r) * cw + bx, out, r * 8)
          r += 1
        }
        return
      }
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          out(r * 8 + c) =
            if (interior) plane((by + r) * cw + bx + c) & 0xff
            else refSample(plane, cw, ch, bx + c, by + r)
          c += 1
        }
        r += 1
      }
      return
    }
    if (interior && Simd.enabled) {
      // vectorised separable bilinear: same row caching as the scalar
      // path, one 8-lane op per pass (fx/fy 0 degenerate exactly)
      val sc = mcScratch.get()
      var h0 = sc.ch0; var h1 = sc.ch1
      graft.simd.VectorKernels.chromaHRow8(plane, by * cw + bx, fx, h0, 0)
      var r = 0
      while (r < 8) {
        graft.simd.VectorKernels.chromaHRow8(plane, (by + r + 1) * cw + bx, fx, h1, 0)
        graft.simd.VectorKernels.chromaVRow8(h0, 0, h1, 0, fy, out, r * 8)
        val t = h0; h0 = h1; h1 = t
        r += 1
      }
    } else if (interior) {
      val sc = mcScratch.get()
      var h0 = sc.ch0; var h1 = sc.ch1
      var p = by * cw + bx
      var c = 0
      if (fx == 0) {
        while (c < 8) { h0(c) = (plane(p + c) & 0xff) << 3; c += 1 }
      } else {
        while (c < 8) {
          val a = plane(p + c) & 0xff
          h0(c) = (a << 3) + fx * ((plane(p + c + 1) & 0xff) - a)
          c += 1
        }
      }
      var r = 0
      while (r < 8) {
        p = (by + r + 1) * cw + bx
        c = 0
        if (fx == 0) {
          while (c < 8) { h1(c) = (plane(p + c) & 0xff) << 3; c += 1 }
        } else {
          while (c < 8) {
            val a = plane(p + c) & 0xff
            h1(c) = (a << 3) + fx * ((plane(p + c + 1) & 0xff) - a)
            c += 1
          }
        }
        val o = r * 8
        c = 0
        if (fy == 0) {
          while (c < 8) { out(o + c) = ((h0(c) << 3) + 32) >> 6; c += 1 }
        } else {
          while (c < 8) {
            out(o + c) = ((h0(c) << 3) + fy * (h1(c) - h0(c)) + 32) >> 6
            c += 1
          }
        }
        val t = h0; h0 = h1; h1 = t
        r += 1
      }
    } else {
      val w00 = (8 - fx) * (8 - fy); val w10 = fx * (8 - fy)
      val w01 = (8 - fx) * fy; val w11 = fx * fy
      var r = 0
      while (r < 8) {
        var c = 0
        while (c < 8) {
          val a = refSample(plane, cw, ch, bx + c, by + r)
          val b = refSample(plane, cw, ch, bx + c + 1, by + r)
          val d = refSample(plane, cw, ch, bx + c, by + r + 1)
          val e = refSample(plane, cw, ch, bx + c + 1, by + r + 1)
          out(r * 8 + c) = (w00 * a + w10 * b + w01 * d + w11 * e + 32) >> 6
          c += 1
        }
        r += 1
      }
    }
  }

  /** Block-size-generic chroma MC: predicts the cwB x chB chroma block at
    * source position (cpx, cpy) + mv into `out` (an 8x8 MB-local buffer,
    * stride 8) at offset (ox, oy). The 8x8 wrapper above is the
    * pre-partition MB path. */
  private def mcChromaBlk(plane: Array[Byte], cw: Int, ch: Int,
      cpx: Int, cpy: Int, cwB: Int, chB: Int,
      mvx: Int, mvy: Int, out: Array[Int], ox: Int, oy: Int): Unit = {
    val fx = mvx & 7 // eighth-pel fraction (two's-complement & handles <0)
    val fy = mvy & 7
    val bx = cpx + (mvx >> 3)
    val by = cpy + (mvy >> 3)
    val interior = bx >= 0 && by >= 0 && bx + cwB + 1 <= cw && by + chB + 1 <= ch
    if (fx == 0 && fy == 0) {
      var r = 0
      while (r < chB) {
        val o = (oy + r) * 8 + ox
        var c = 0
        while (c < cwB) {
          out(o + c) =
            if (interior) plane((by + r) * cw + bx + c) & 0xff
            else refSample(plane, cw, ch, bx + c, by + r)
          c += 1
        }
        r += 1
      }
      return
    }
    if (interior) {
      // separable bilinear: horizontal pass h = 8a + fx(b-a) per row,
      // cached so each source row is filtered once (row r's bottom pair
      // is row r+1's top pair), then vertical v = 8h0 + fy(h1-h0)
      val sc = mcScratch.get()
      var h0 = sc.ch0; var h1 = sc.ch1
      var p = by * cw + bx
      var c = 0
      if (fx == 0) {
        while (c < cwB) { h0(c) = (plane(p + c) & 0xff) << 3; c += 1 }
      } else {
        while (c < cwB) {
          val a = plane(p + c) & 0xff
          h0(c) = (a << 3) + fx * ((plane(p + c + 1) & 0xff) - a)
          c += 1
        }
      }
      var r = 0
      while (r < chB) {
        p = (by + r + 1) * cw + bx
        c = 0
        if (fx == 0) {
          while (c < cwB) { h1(c) = (plane(p + c) & 0xff) << 3; c += 1 }
        } else {
          while (c < cwB) {
            val a = plane(p + c) & 0xff
            h1(c) = (a << 3) + fx * ((plane(p + c + 1) & 0xff) - a)
            c += 1
          }
        }
        val o = (oy + r) * 8 + ox
        c = 0
        if (fy == 0) {
          while (c < cwB) { out(o + c) = ((h0(c) << 3) + 32) >> 6; c += 1 }
        } else {
          while (c < cwB) {
            out(o + c) = ((h0(c) << 3) + fy * (h1(c) - h0(c)) + 32) >> 6
            c += 1
          }
        }
        val t = h0; h0 = h1; h1 = t
        r += 1
      }
    } else {
      val w00 = (8 - fx) * (8 - fy); val w10 = fx * (8 - fy)
      val w01 = (8 - fx) * fy; val w11 = fx * fy
      var r = 0
      while (r < chB) {
        val o = (oy + r) * 8 + ox
        var c = 0
        while (c < cwB) {
          val a = refSample(plane, cw, ch, bx + c, by + r)
          val b = refSample(plane, cw, ch, bx + c + 1, by + r)
          val d = refSample(plane, cw, ch, bx + c, by + r + 1)
          val e = refSample(plane, cw, ch, bx + c + 1, by + r + 1)
          out(o + c) = (w00 * a + w10 * b + w01 * d + w11 * e + 32) >> 6
          c += 1
        }
        r += 1
      }
    }
  }

  /** median MV predictor for a 16x16 partition (§8.4.1.3): neighbours
    * A=left, B=above, C=above-right (D=above-left when C is outside).
    * Returns (pred, A, B) — A and B feed the P_Skip zero conditions.
    */
  /** §8.4.1.3 luma MV predictor for a 16x16 partition with reference
    * index `refIdx`. Neighbor tuples carry (mvx, mvy, refIdxN) with
    * refIdxN = -1 for intra/uncoded; the exactly-one shortcut fires only
    * for a neighbor whose refIdxL0 EQUALS the current refIdx
    * (§8.4.1.3.1), while the median fallback uses every inter neighbor's
    * actual MV regardless of its reference (§8.4.1.3.2 zeroes only
    * unavailable/intra neighbors).
    */
  private def predictMv(st: PicState, mbX: Int, mbY: Int,
      refIdx: Int = 0, list: Int = 0): (Int, Int) =
    predictMvPart(st, mbX * 4, mbY * 4, 4, 4, refIdx, list)

  /** §8.4.1.3 luma MV predictor for an arbitrary partition at absolute
    * 4x4-block coords (bx4, by4), size (w4 x h4) blocks. Neighbours are
    * the spec's partition neighbours: A left of the top-left block,
    * B above it, C above-right of the partition (D above-left when C is
    * unavailable) — sampled at 4x4 granularity so partitioned neighbour
    * MBs contribute the correct block. The 16x8/8x16 directional rules
    * (§8.4.1.3: top takes B, bottom takes A, left takes A, right takes
    * C — each only when that neighbour codes the SAME refIdx) are
    * derived from the partition geometry. */
  private def predictMvPart(st: PicState, bx4: Int, by4: Int, w4: Int, h4: Int,
      refIdx: Int, list: Int): (Int, Int) = {
    // allocation-free neighbour sampling (the Option/tuple version
    // measured ~4% of 720p decode purely in garbage): availability and
    // index per neighbour as locals, with D substituting C
    val bw4 = st.bw4
    val mvXArr = if (list == 0) st.mv4X else st.mv4XL1
    val mvYArr = if (list == 0) st.mv4Y else st.mv4YL1
    val refArr = if (list == 0) st.ref4 else st.ref4L1
    val aAvail = st.avail4(bx4 - 1, by4)
    val iA = by4 * bw4 + bx4 - 1
    val aRef = if (aAvail) refArr(iA) else -9
    val bAvail = st.avail4(bx4, by4 - 1)
    val iB = (by4 - 1) * bw4 + bx4
    val bRef = if (bAvail) refArr(iB) else -9
    var cAvail = st.avail4(bx4 + w4, by4 - 1)
    var iC = (by4 - 1) * bw4 + bx4 + w4
    if (!cAvail) { // D substitutes C
      cAvail = st.avail4(bx4 - 1, by4 - 1)
      iC = (by4 - 1) * bw4 + bx4 - 1
    }
    val cRef = if (cAvail) refArr(iC) else -9
    // 16x8 / 8x16 directional shortcuts (fire only on a same-reference
    // neighbour; geometry identifies the partition: 16x8 rows are 4x2
    // blocks, 8x16 columns 2x4)
    if (w4 == 4 && h4 == 2) {
      if ((by4 & 3) == 0) { // top <- B
        if (bRef == refIdx) return (mvXArr(iB), mvYArr(iB))
      } else if (aRef == refIdx) return (mvXArr(iA), mvYArr(iA)) // bottom <- A
    } else if (w4 == 2 && h4 == 4) {
      if ((bx4 & 3) == 0) { // left <- A
        if (aRef == refIdx) return (mvXArr(iA), mvYArr(iA))
      } else if (cRef == refIdx) return (mvXArr(iC), mvYArr(iC)) // right <- C(/D)
    }
    // B/C-absent A-shortcut: an INTRA A contributes zero motion
    // (§8.4.1.3.2 zeroes intra neighbours BEFORE the substitution —
    // reading A's array cells raw was only accidentally right while
    // intra rows were pre-zeroed; a pooled decoder picture keeps
    // stale values there by design since the round-14 reset trim)
    if (!bAvail && !cAvail && aAvail)
      return (if (aRef >= 0) (mvXArr(iA), mvYArr(iA)) else (0, 0))
    // exactly-one-same-reference rule (refIdxN == refIdx; intra = -1)
    val sameA = aRef == refIdx
    val sameB = bRef == refIdx
    val sameC = cRef == refIdx
    val nSame = (if (sameA) 1 else 0) + (if (sameB) 1 else 0) + (if (sameC) 1 else 0)
    if (nSame == 1) {
      if (sameA) return (mvXArr(iA), mvYArr(iA))
      if (sameB) return (mvXArr(iB), mvYArr(iB))
      return (mvXArr(iC), mvYArr(iC))
    }
    val ax = if (aRef >= 0) mvXArr(iA) else 0
    val ay = if (aRef >= 0) mvYArr(iA) else 0
    val bx = if (bRef >= 0) mvXArr(iB) else 0
    val by = if (bRef >= 0) mvYArr(iB) else 0
    val cx = if (cRef >= 0) mvXArr(iC) else 0
    val cy = if (cRef >= 0) mvYArr(iC) else 0
    @inline def med(p: Int, q: Int, r: Int) =
      math.max(math.min(p, q), math.min(math.max(p, q), r))
    (med(ax, bx, cx), med(ay, by, cy))
  }

  /** Spatial direct luma motion for a whole B macroblock (§8.4.1.2.2 at
    * 16x16 granularity — the per-4x4 colocated-partition refinement of
    * conformant sub-partitioned streams collapses to one decision for
    * the 16x16-only MB subset this codec emits and accepts):
    *
    *  - per-list reference index = MinPositive over the MV-prediction
    *    neighbors A, B, C (D substituting an absent C), -1 when no
    *    neighbor uses the list;
    *  - both lists refIdx < 0 → directZeroPredictionFlag: refIdx 0 / 0
    *    with zero motion;
    *  - otherwise each used list takes its §8.4.1.3 median prediction at
    *    the derived refIdx, zeroed when refIdx == 0 and the colocated
    *    macroblock in RefPicList1[0] moves by at most a quarter sample
    *    with refIdxCol 0 (colZeroFlag — every DPB picture here is
    *    short-term).
    *
    * Returns (refIdxL0, refIdxL1, mv0x, mv0y, mv1x, mv1y); refIdx -1
    * means the list is unused. `col` is RefPicList1[0] (never null for a
    * B slice). Encoder and decoder share this single derivation — the
    * symmetry that makes B_Skip/B_Direct_16x16 self-consistent.
    */
  /** Spatial-direct derivation result: per-list reference indices and
    * per-8x8-quadrant motion (z-order quadrants; quad(q*4+{0,1,2,3}) =
    * m0x, m0y, m1x, m1y). Quadrants differ only through the per-quadrant
    * colZeroFlag, so a colocated picture coded 16x16-only yields four
    * identical quadrants (the pre-partition behaviour, bit-exact). */
  private final case class DirectMv(ref0: Int, ref1: Int, quad: Array[Int]) {
    def uniform: Boolean =
      quad(0) == quad(4) && quad(0) == quad(8) && quad(0) == quad(12) &&
      quad(1) == quad(5) && quad(1) == quad(9) && quad(1) == quad(13) &&
      quad(2) == quad(6) && quad(2) == quad(10) && quad(2) == quad(14) &&
      quad(3) == quad(7) && quad(3) == quad(11) && quad(3) == quad(15)
  }

  private def directSpatial(st: PicState, col: PicState, mbX: Int, mbY: Int)
      : DirectMv = {
    val bx4 = mbX * 4; val by4 = mbY * 4
    def nbRef(list: Int)(x4: Int, y4: Int): Int =
      if (!st.avail4(x4, y4)) -1
      else {
        val i = y4 * st.bw4 + x4
        if (list == 0) st.ref4(i) else st.ref4L1(i)
      }
    def minPositive(list: Int): Int = {
      val f = nbRef(list) _
      val a = f(bx4 - 1, by4)
      val b = f(bx4, by4 - 1)
      val cRaw = if (st.avail4(bx4 + 4, by4 - 1)) f(bx4 + 4, by4 - 1)
        else f(bx4 - 1, by4 - 1) // D substitutes C, as in predictMv
      Seq(a, b, cRaw).filter(_ >= 0) match {
        case Nil => -1
        case xs => xs.min
      }
    }
    var ref0 = minPositive(0)
    var ref1 = minPositive(1)
    if (ref0 < 0 && ref1 < 0)
      return DirectMv(0, 0, new Array[Int](16)) // directZeroPrediction
    def listPred(list: Int, refIdx: Int): (Int, Int) =
      if (refIdx < 0) (0, 0)
      else { val (px, py) = predictMv(st, mbX, mbY, refIdx, list); (px, py) }
    val (p0x, p0y) = listPred(0, ref0)
    val (p1x, p1y) = listPred(1, ref1)
    // per-quadrant colZeroFlag (direct_8x8_inference_flag = 1: the
    // quadrant's CORNER 4x4 block of the colocated picture decides —
    // blocks 0, 3, 12, 15 of the colocated MB)
    val quad = new Array[Int](16)
    var q = 0
    while (q < 4) {
      val cx4 = bx4 + (q & 1) * 3
      val cy4 = by4 + (q >> 1) * 3
      val ci = cy4 * col.bw4 + cx4
      val colZero = col.ref4(ci) == 0 &&
        math.abs(col.mv4X(ci)) <= 1 && math.abs(col.mv4Y(ci)) <= 1
      quad(q * 4) = if (ref0 == 0 && colZero) 0 else p0x
      quad(q * 4 + 1) = if (ref0 == 0 && colZero) 0 else p0y
      quad(q * 4 + 2) = if (ref1 == 0 && colZero) 0 else p1x
      quad(q * 4 + 3) = if (ref1 == 0 && colZero) 0 else p1y
      q += 1
    }
    DirectMv(ref0, ref1, quad)
  }

  /** Temporal direct motion (§8.4.1.2.3, direct_spatial_mv_pred_flag
    * = 0): per 8x8 quadrant (direct_8x8_inference), the colocated block
    * of RefPicList1[0] contributes its L0 motion, scaled by the POC
    * distance ratio — tx = (16384 + |td|/2) / td, DistScaleFactor =
    * clip3(-1024, 1023, (tb·tx + 32) >> 6), mvL0 = (dsf·mvCol + 128) >>
    * 8, mvL1 = mvL0 - mvCol. refIdxL0 maps the colocated block's
    * reference back into the current L0 list by POC (refPoc4 recorded
    * it at the colocated picture's decode); an intra colocated block
    * contributes zero motion. td == 0 keeps mvCol unscaled with a zero
    * list-1 vector (all pictures here are short-term). */
  private def directTemporal(st: PicState, l0: IndexedSeq[PicState],
      col: PicState, mbX: Int, mbY: Int): DirectMv = {
    val quad = new Array[Int](16)
    var ref0 = 0
    var q = 0
    while (q < 4) {
      val cx4 = mbX * 4 + (q & 1) * 3
      val cy4 = mbY * 4 + (q >> 1) * 3
      val ci = cy4 * col.bw4 + cx4
      if (col.ref4(ci) < 0 && col.ref4L1(ci) >= 0)
        sys.error("temporal direct over an L1-predicted colocated block " +
          "unsupported (colocated pictures here are P/I)")
      if (col.ref4(ci) >= 0) {
        val mvColX = col.mv4X(ci); val mvColY = col.mv4Y(ci)
        val colRefPoc = col.refPoc4(ci)
        val r0 = l0.indexWhere(_.poc == colRefPoc)
        require(r0 >= 0, s"temporal direct: colocated reference (poc " +
          s"$colRefPoc) not in the current L0 list")
        ref0 = r0
        val tb = clip3i(-128, 127, st.poc - colRefPoc)
        val td = clip3i(-128, 127, col.poc - colRefPoc)
        if (td == 0) {
          quad(q * 4) = mvColX; quad(q * 4 + 1) = mvColY
          quad(q * 4 + 2) = 0; quad(q * 4 + 3) = 0
        } else {
          val tx = (16384 + math.abs(td) / 2) / td
          val dsf = clip3i(-1024, 1023, (tb * tx + 32) >> 6)
          val m0x = (dsf * mvColX + 128) >> 8
          val m0y = (dsf * mvColY + 128) >> 8
          quad(q * 4) = m0x; quad(q * 4 + 1) = m0y
          quad(q * 4 + 2) = m0x - mvColX; quad(q * 4 + 3) = m0y - mvColY
        }
      } // intra colocated block: all-zero motion on both lists
      q += 1
    }
    DirectMv(ref0, 0, quad)
  }

  /** direct-mode dispatch: the slice header's
    * direct_spatial_mv_pred_flag selects the derivation */
  private def deriveDirect(st: PicState, l0: IndexedSeq[PicState],
      l1: IndexedSeq[PicState], mbX: Int, mbY: Int,
      spatial: Boolean): DirectMv =
    if (spatial) directSpatial(st, l1(0), mbX, mbY)
    else directTemporal(st, l0, l1(0), mbX, mbY)

  /** P_Skip motion vector (§8.4.1.1): the refIdx-0 median predictor,
    * forced to zero when a boundary/zero-neighbour condition holds
    * (P_Skip always references picture 0 of list 0)
    */
  private def skipMv(st: PicState, mbX: Int, mbY: Int): (Int, Int) = {
    val bx4 = mbX * 4; val by4 = mbY * 4
    val bw4 = st.bw4
    val aAvail = st.avail4(bx4 - 1, by4)
    val bAvail = st.avail4(bx4, by4 - 1)
    val iA = by4 * bw4 + bx4 - 1
    val iB = (by4 - 1) * bw4 + bx4
    val zero =
      !aAvail || !bAvail ||
        (st.ref4(iA) == 0 && st.mv4X(iA) == 0 && st.mv4Y(iA) == 0) ||
        (st.ref4(iB) == 0 && st.mv4X(iB) == 0 && st.mv4Y(iB) == 0)
    if (zero) (0, 0) else predictMv(st, mbX, mbY, refIdx = 0)
  }

  /** inter residual of one P MB: 16 luma 4x4 blocks (16 coeffs each, no
    * separate DC) + the chroma DC/AC structure shared with intra
    */
  private final class PMbCoeffs {
    val lumaZig: Array[Array[Int]] = Array.fill(16)(new Array[Int](16))
    val cbDcZig = new Array[Int](4)
    val crDcZig = new Array[Int](4)
    val cbAcZig: Array[Array[Int]] = Array.fill(4)(new Array[Int](15))
    val crAcZig: Array[Array[Int]] = Array.fill(4)(new Array[Int](15))
    var cbp = 0 // 6 bits: low 4 = luma 8x8 groups, high 2 = chroma mode
    def cbpLuma: Int = cbp & 15
    def cbpChroma: Int = cbp >> 4
    // intra_chroma_pred_mode of an INTRA MB carrying this residual
    // (§8.3.4; 0 DC — inter MBs never read it). POOLED scratch: the
    // intra parse/analysis paths overwrite it per MB before any read.
    var chromaMode = 0
  }

  /** Explicit weighted-prediction state for one slice (§7.3.3.2
    * pred_weight_table, §8.4.2.3.2 reconstruction): per-list per-refIdx
    * luma and chroma weights/offsets; log denominators shared across a
    * list. Identity entries carry w = 1 << logWD, o = 0 (the inferred
    * value when the per-ref flag is 0). null WpCtx = default
    * (unweighted) prediction everywhere. */
  private final class WpCtx(val lumaLog2: Int, val chromaLog2: Int,
      val lw: Array[Array[Int]], val lo: Array[Array[Int]],
      val cw: Array[Array[Array[Int]]], val co: Array[Array[Array[Int]]],
      val biOnly: Boolean = false,
      // §8.4.2.3.1 implicit mode with multi-ref lists: w1 per (ref0,
      // ref1) PAIR (w0 = 64 - w1, offsets 0, logWD 5) — the POC-derived
      // weights depend on both references, which the factored per-list
      // tables cannot represent
      val implicitW1: Array[Array[Int]] = null) {
    /** weighted single-list luma transform of a stride-16 region
      * (no-op under implicit mode: §8.4.2.3.1 weights ONLY bi MBs) */
    def applyLuma(list: Int, ref: Int, buf: Array[Int], ox: Int, oy: Int,
        w: Int, h: Int): Unit = {
      if (biOnly) return
      val ww = lw(list)(ref); val oo = lo(list)(ref)
      val rnd = if (lumaLog2 > 0) 1 << (lumaLog2 - 1) else 0
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          val i = (oy + r) * 16 + ox + c
          val v = ((buf(i) * ww + rnd) >> lumaLog2) + oo
          buf(i) = if (v < 0) 0 else if (v > 255) 255 else v
          c += 1
        }
        r += 1
      }
    }
    /** weighted single-list chroma transform of a stride-8 region;
      * plane 0 = Cb, 1 = Cr */
    def applyChroma(list: Int, ref: Int, plane: Int, buf: Array[Int],
        ox: Int, oy: Int, w: Int, h: Int): Unit = {
      if (biOnly) return
      val ww = cw(list)(ref)(plane); val oo = co(list)(ref)(plane)
      val rnd = if (chromaLog2 > 0) 1 << (chromaLog2 - 1) else 0
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          val i = (oy + r) * 8 + ox + c
          val v = ((buf(i) * ww + rnd) >> chromaLog2) + oo
          buf(i) = if (v < 0) 0 else if (v > 255) 255 else v
          c += 1
        }
        r += 1
      }
    }
    /** §8.4.2.3.2 explicit BI combine: a(i) = clip(((a*w0 + b*w1 +
      * 2^logWD) >> (logWD+1)) + (o0+o1+1)>>1) over a stride-`stride`
      * region; luma = true selects the luma tables */
    def applyBi(ref0: Int, ref1: Int, luma: Boolean, a: Array[Int],
        b: Array[Int], ox: Int, oy: Int, stride: Int, w: Int, h: Int,
        plane: Int = 0): Unit = {
      val log2 = if (implicitW1 != null) 5 else if (luma) lumaLog2 else chromaLog2
      val w1 = if (implicitW1 != null) implicitW1(ref0)(ref1)
        else if (luma) lw(1)(ref1) else cw(1)(ref1)(plane)
      val w0 = if (implicitW1 != null) 64 - w1
        else if (luma) lw(0)(ref0) else cw(0)(ref0)(plane)
      val o0 = if (implicitW1 != null) 0
        else if (luma) lo(0)(ref0) else co(0)(ref0)(plane)
      val o1 = if (implicitW1 != null) 0
        else if (luma) lo(1)(ref1) else co(1)(ref1)(plane)
      val rnd = 1 << log2
      val off = (o0 + o1 + 1) >> 1
      var r = 0
      while (r < h) {
        var c = 0
        while (c < w) {
          val i = (oy + r) * stride + ox + c
          val v = ((a(i) * w0 + b(i) * w1 + rnd) >> (log2 + 1)) + off
          a(i) = if (v < 0) 0 else if (v > 255) 255 else v
          c += 1
        }
        r += 1
      }
    }
  }

  /** §8.4.2.3.1 implicit B weights from POC distances (round 15; the
    * 1-deep B lists this subset requires mean exactly one (w0, w1) pair
    * per slice): the DistScaleFactor arithmetic of temporal direct,
    * w1 = DSF >> 2 and w0 = 64 - w1 with the spec's degenerate-distance
    * and range fallbacks to (32, 32) — a plain rounded average. Offsets
    * are zero, logWD 5, chroma shares the luma weights; single-list
    * prediction stays UNWEIGHTED (the biOnly flag). Derivation is a
    * pure function of the three POCs, so encoder and decoder agree.
    */
  private def implicitWpCtx(pocCur: Int, l0Pocs: IndexedSeq[Int],
      l1Pocs: IndexedSeq[Int]): WpCtx = {
    def w1Of(poc0: Int, poc1: Int): Int =
      if (poc1 == poc0) 32
      else {
        val tb = math.max(-128, math.min(127, pocCur - poc0))
        val td = math.max(-128, math.min(127, poc1 - poc0))
        val tx = (16384 + math.abs(td / 2)) / td
        val dsf = math.max(-1024, math.min(1023, (tb * tx + 32) >> 6))
        val w1c = dsf >> 2
        if (w1c < -64 || w1c > 128) 32 else w1c
      }
    val pairs = Array.tabulate(math.max(l0Pocs.length, 1),
      math.max(l1Pocs.length, 1))((i, j) =>
      w1Of(l0Pocs(math.min(i, l0Pocs.length - 1)),
        l1Pocs(math.min(j, l1Pocs.length - 1))))
    if (pairs.exists(_.exists(_ != 32))) implicitWpCount.incrementAndGet()
    // the factored tables are placeholders (applyLuma/applyChroma no-op
    // under biOnly; applyBi reads the pair table)
    new WpCtx(5, 5,
      Array(Array(32), Array(32)), Array(Array(0), Array(0)),
      Array(Array(Array(32, 32)), Array(Array(32, 32))),
      Array(Array(Array(0, 0)), Array(Array(0, 0))),
      biOnly = true, implicitW1 = pairs)
  }

  /** parse §7.3.3.2 pred_weight_table: one (flag, w, o) group per active
    * reference of each coded list; absent flags infer identity */
  private def parsePredWeightTable(r: H264.BitReader, nL0: Int,
      nL1: Int): WpCtx = {
    val lumaLog2 = r.ue
    require(lumaLog2 <= 7, s"luma_log2_weight_denom $lumaLog2 out of range")
    val chromaLog2 = r.ue
    require(chromaLog2 <= 7, s"chroma_log2_weight_denom $chromaLog2 out of range")
    val n = Array(nL0, nL1)
    val lw = Array(Array.fill(math.max(nL0, 1))(1 << lumaLog2),
      Array.fill(math.max(nL1, 1))(1 << lumaLog2))
    val lo = Array(Array.fill(math.max(nL0, 1))(0), Array.fill(math.max(nL1, 1))(0))
    val cw = Array.tabulate(2)(l => Array.fill(math.max(n(l), 1))(
      Array.fill(2)(1 << chromaLog2)))
    val co = Array.tabulate(2)(l => Array.fill(math.max(n(l), 1))(
      Array.fill(2)(0)))
    var list = 0
    while (list < 2) {
      var i = 0
      while (i < n(list)) {
        if (r.u1 == 1) { // luma_weight_lX_flag
          lw(list)(i) = r.se; lo(list)(i) = r.se
          require(lw(list)(i) >= -128 && lw(list)(i) <= 127 &&
            lo(list)(i) >= -128 && lo(list)(i) <= 127,
            "luma weight/offset out of the 8-bit spec range")
        }
        if (r.u1 == 1) { // chroma_weight_lX_flag
          var p = 0
          while (p < 2) {
            cw(list)(i)(p) = r.se; co(list)(i)(p) = r.se
            require(cw(list)(i)(p) >= -128 && cw(list)(i)(p) <= 127 &&
              co(list)(i)(p) >= -128 && co(list)(i)(p) <= 127,
              "chroma weight/offset out of the 8-bit spec range")
            p += 1
          }
        }
        i += 1
      }
      list += 1
    }
    new WpCtx(lumaLog2, chromaLog2, lw, lo, cw, co)
  }

  /** shared P-MB reconstruction: MC prediction + dequantised residual.
    * `ref` is the picture list-0 entry `refIdx` selects (the caller
    * indexes its DPB); `refIdx` is recorded for MV prediction, entropy
    * contexts, and deblocking. */
  private def reconstructPMb(st: PicState, ref: PicState, mbX: Int, mbY: Int,
      qp: Int, mvx: Int, mvy: Int, mc: PMbCoeffs, refIdx: Int = 0,
      wp: WpCtx = null): Unit =
    reconstructInterMb(st, mbX, mbY, qp, ref, refIdx, mvx, mvy,
      null, -1, 0, 0, mc, wp)

  /** Inter reconstruction over one or two prediction lists: each used
    * list motion-compensates independently, two lists average per
    * §8.4.2.3.1's default (no weighted prediction):
    * (predL0 + predL1 + 1) >> 1 — then the shared dequantised residual
    * adds on top. Per-list MV/refIdx state is recorded for MV
    * prediction, entropy contexts, and the B-aware boundary strength.
    * refIdx -1 marks a list unused (P MBs and B_L0/B_L1 use one).
    */
  private def reconstructInterMb(st: PicState, mbX: Int, mbY: Int, qp: Int,
      ref0: PicState, refIdx0: Int, mv0x: Int, mv0y: Int,
      ref1: PicState, refIdx1: Int, mv1x: Int, mv1y: Int,
      mc: PMbCoeffs, wp: WpCtx = null): Unit = {
    require(refIdx0 >= 0 || refIdx1 >= 0, "inter MB with no prediction list")
    val bi = refIdx0 >= 0 && refIdx1 >= 0
    st.mbQp(mbY * st.mbW + mbX) = qp
    // no-residual integer-pel single-list MB (P_Skip on panning/static
    // content — the common case): the reconstruction IS a plane-to-plane
    // block copy, so skip the int prediction buffer entirely. Byte-
    // identical to the general path (integer MC is a clamped copy and
    // the residual is zero); chroma qualifies separately (its eighth-pel
    // fraction is mv & 7). Weighted prediction transforms samples, so
    // the copy shortcut is off whenever a WpCtx is active.
    if (mc == null && !bi && wp == null) {
      val refP = if (refIdx0 >= 0) ref0 else ref1
      val mvx0 = if (refIdx0 >= 0) mv0x else mv1x
      val mvy0 = if (refIdx0 >= 0) mv0y else mv1y
      if ((mvx0 & 3) == 0 && (mvy0 & 3) == 0) {
        val sx = mbX * 16 + (mvx0 >> 2); val sy = mbY * 16 + (mvy0 >> 2)
        if (sx >= 0 && sy >= 0 && sx + 16 <= refP.pw && sy + 16 <= refP.ph) {
          val dx = mbX * 16; val dy = mbY * 16
          var r = 0
          while (r < 16) {
            System.arraycopy(refP.reconY, (sy + r) * refP.pw + sx,
              st.reconY, (dy + r) * st.pw + dx, 16)
            r += 1
          }
          val chromaCopied = (mvx0 & 7) == 0 && (mvy0 & 7) == 0 && {
            val cx = mbX * 8 + (mvx0 >> 3); val cy = mbY * 8 + (mvy0 >> 3)
            cx >= 0 && cy >= 0 && cx + 8 <= st.cw && cy + 8 <= st.ch && {
              var cr0 = 0
              while (cr0 < 8) {
                System.arraycopy(refP.reconCb, (cy + cr0) * st.cw + cx,
                  st.reconCb, (mbY * 8 + cr0) * st.cw + mbX * 8, 8)
                System.arraycopy(refP.reconCr, (cy + cr0) * st.cw + cx,
                  st.reconCr, (mbY * 8 + cr0) * st.cw + mbX * 8, 8)
                cr0 += 1
              }
              true
            }
          }
          if (!chromaCopied) {
            val scc = mcScratch.get()
            var pl = 0
            while (pl < 2) {
              val (plane, refPlane) =
                if (pl == 0) (st.reconCb, refP.reconCb) else (st.reconCr, refP.reconCr)
              val predC = scc.predC
              mcChroma(refPlane, st.cw, st.ch, mbX, mbY, mvx0, mvy0, predC)
              var r2 = 0
              while (r2 < 8) {
                val rb = (mbY * 8 + r2) * st.cw + mbX * 8
                val pb = r2 * 8
                var c2 = 0
                while (c2 < 8) { plane(rb + c2) = predC(pb + c2).toByte; c2 += 1 }
                r2 += 1
              }
              pl += 1
            }
          }
          st.inter(mbY * st.mbW + mbX) = true
          st.setMotion4(mbX * 4, mbY * 4, 4, 4, refIdx0, mv0x, mv0y,
            refIdx1, mv1x, mv1y, if (refIdx0 >= 0) ref0.poc else 0)
          return
        }
      }
    }
    val sc = mcScratch.get()
    val predL = sc.predL
    if (refIdx0 >= 0) {
      mcLuma(ref0, mbX, mbY, mv0x, mv0y, predL)
      if (wp != null && !bi) wp.applyLuma(0, refIdx0, predL, 0, 0, 16, 16)
    }
    if (refIdx1 >= 0) {
      if (!bi) {
        mcLuma(ref1, mbX, mbY, mv1x, mv1y, predL)
        if (wp != null) wp.applyLuma(1, refIdx1, predL, 0, 0, 16, 16)
      } else {
        val p1 = sc.predL1
        mcLuma(ref1, mbX, mbY, mv1x, mv1y, p1)
        if (wp != null)
          wp.applyBi(refIdx0, refIdx1, luma = true, predL, p1, 0, 0, 16, 16, 16)
        else if (Simd.enabled) {
          var o = 0
          while (o < 256) { graft.simd.VectorKernels.avgRow16(predL, o, p1, o); o += 16 }
        } else {
          var i = 0
          while (i < 256) { predL(i) = (predL(i) + p1(i) + 1) >> 1; i += 1 }
        }
      }
    }
    // single-list motion/ref for the chroma MC (bi combines again)
    val mvx = if (refIdx0 >= 0) mv0x else mv1x
    val mvy = if (refIdx0 >= 0) mv0y else mv1y
    val ref = if (refIdx0 >= 0) ref0 else ref1
    val wpList = if (refIdx0 >= 0) 0 else 1
    val wpRef = if (refIdx0 >= 0) refIdx0 else refIdx1
    val predCb = sc.predC; val predCr = sc.predC2
    mcChroma(ref.reconCb, st.cw, st.ch, mbX, mbY, mvx, mvy, predCb)
    if (bi) {
      val p1 = sc.predC1
      mcChroma(ref1.reconCb, st.cw, st.ch, mbX, mbY, mv1x, mv1y, p1)
      if (wp != null)
        wp.applyBi(refIdx0, refIdx1, luma = false, predCb, p1, 0, 0, 8, 8, 8, plane = 0)
      else {
        var i = 0
        while (i < 64) { predCb(i) = (predCb(i) + p1(i) + 1) >> 1; i += 1 }
      }
    } else if (wp != null) wp.applyChroma(wpList, wpRef, 0, predCb, 0, 0, 8, 8)
    mcChroma(ref.reconCr, st.cw, st.ch, mbX, mbY, mvx, mvy, predCr)
    if (bi) {
      val p1 = sc.predC1
      mcChroma(ref1.reconCr, st.cw, st.ch, mbX, mbY, mv1x, mv1y, p1)
      if (wp != null)
        wp.applyBi(refIdx0, refIdx1, luma = false, predCr, p1, 0, 0, 8, 8, 8, plane = 1)
      else {
        var i = 0
        while (i < 64) { predCr(i) = (predCr(i) + p1(i) + 1) >> 1; i += 1 }
      }
    } else if (wp != null) wp.applyChroma(wpList, wpRef, 1, predCr, 0, 0, 8, 8)
    interResidualCommit(st, mbX, mbY, qp, mc, predL, predCb, predCr)
    st.inter(mbY * st.mbW + mbX) = true
    // unused lists keep zero motion with refIdx -1 (the entropy contexts
    // and boundary strength read refIdx to tell "unused" apart)
    st.setMotion4(mbX * 4, mbY * 4, 4, 4, refIdx0, mv0x, mv0y,
      refIdx1, mv1x, mv1y, if (refIdx0 >= 0) ref0.poc else 0)
  }

  /** shared inter-MB residual add: writes recon = clip(pred + residual)
    * for luma (16 4x4 blocks against `predL`, stride 16) and chroma
    * (DC/AC structure against `predCb`/`predCr`, stride 8). mc == null
    * means no residual anywhere (skip / cbp 0). */
  private def interResidualCommit(st: PicState, mbX: Int, mbY: Int, qp: Int,
      mc: PMbCoeffs, predL: Array[Int], predCb: Array[Int],
      predCr: Array[Int]): Unit = {
    val sc = mcScratch.get()
    val qpc = chromaQp(qp + st.cqpOff)
    val qpcCr = chromaQp(qp + st.cqpOff2)
    val x0 = mbX * 16; val y0 = mbY * 16
    // the joint Cb+Cr SIMD batch dequants both planes at one QPc — a
    // distinct second offset takes the per-plane scalar path
    if (Simd.enabled && st.scal.flat && qpc == qpcCr) {
      // row-wise vector commit: spread the dequantised residual (if
      // any) into an MB-local buffer, then one clip(pred+res)+narrow
      // vector op per 16-sample luma / 8-sample chroma row — the
      // per-4x4 scalar add/clip/store loops measured ~25% of 720p
      // decode. Bit-identical: uncoded regions add zero and pred is
      // already in [0,255].
      val w = sc.w16
      val cx0 = mbX * 8; val cy0 = mbY * 8
      if (mc == null) {
        var r = 0
        while (r < 16) {
          graft.simd.VectorKernels.narrowRow16(predL, r * 16,
            st.reconY, (y0 + r) * st.pw + x0)
          r += 1
        }
        r = 0
        while (r < 8) {
          graft.simd.VectorKernels.narrowRow8(predCb, r * 8,
            st.reconCb, (cy0 + r) * st.cw + cx0)
          graft.simd.VectorKernels.narrowRow8(predCr, r * 8,
            st.reconCr, (cy0 + r) * st.cw + cx0)
          r += 1
        }
        return
      }
      if (mc.cbpLuma != 0) {
        // coded luma: dequant + inverse-transform the 16 blocks as two
        // SoA batches of 8 (one vector lane per block — the §8.5.12.2
        // butterflies with zero shuffles), then one vector
        // clip(pred+res)+narrow per row. Uncoded blocks ride the batch
        // with zero levels — since round 15's batched transform made a
        // zero block ~8x cheaper, the sparse-cbp case that used to favor
        // the per-block scalar path (SimdAb 0.94x at VGA, r14) now wins
        // on the uniform pass too.
        val res = sc.res256
        val soa = sc.soa128
        val vArr = H264Transform.vRaster(qp % 6)
        val shift = qp / 6
        var batch = 0
        while (batch < 2) {
          java.util.Arrays.fill(soa, 0)
          var b = 0
          while (b < 8) {
            val blk = batch * 8 + b
            if (((mc.cbpLuma >> (blk / 4)) & 1) != 0) {
              val zigs = mc.lumaZig(blk)
              var zi = 0
              while (zi < 16) {
                val z = zigs(zi)
                if (z != 0) soa(zigzag4x4(zi) * 8 + b) = z
                zi += 1
              }
            }
            b += 1
          }
          graft.simd.VectorKernels.dequantRows8(soa, vArr, shift, 0)
          graft.simd.VectorKernels.inverse4x4x8(soa)
          b = 0
          while (b < 8) {
            val blk = batch * 8 + b
            val bx0 = blkX(blk) * 4; val by0 = blkY(blk) * 4
            var p = 0
            while (p < 16) {
              res((by0 + (p >> 2)) * 16 + bx0 + (p & 3)) = soa(p * 8 + b)
              p += 1
            }
            b += 1
          }
          batch += 1
        }
        var r = 0
        while (r < 16) {
          graft.simd.VectorKernels.addClipNarrowRow16(predL, r * 16, res, r * 16,
            st.reconY, (y0 + r) * st.pw + x0)
          r += 1
        }
      } else {
        // cbp luma 0 (chroma-only residual): luma is pure prediction
        var r = 0
        while (r < 16) {
          graft.simd.VectorKernels.narrowRow16(predL, r * 16,
            st.reconY, (y0 + r) * st.pw + x0)
          r += 1
        }
      }
      // joint chroma batch: the two planes' eight 4x4 blocks fill the
      // eight SoA lanes exactly (Cb quadrants in lanes 0-3, Cr in 4-7);
      // AC levels vector-dequant from position 1, the separately-scaled
      // DC (2x2 Hadamard + dequantChromaDc) lands in the position-0 row
      if (mc.cbpChroma == 0) {
        var r = 0
        while (r < 8) {
          graft.simd.VectorKernels.narrowRow8(predCb, r * 8,
            st.reconCb, (cy0 + r) * st.cw + cx0)
          graft.simd.VectorKernels.narrowRow8(predCr, r * 8,
            st.reconCr, (cy0 + r) * st.cw + cx0)
          r += 1
        }
      } else {
        val soa = sc.soa128
        java.util.Arrays.fill(soa, 0)
        if (mc.cbpChroma == 2) {
          var b = 0
          while (b < 8) {
            val zigs = if (b < 4) mc.cbAcZig(b) else mc.crAcZig(b - 4)
            var zi = 1
            while (zi < 16) {
              val z = zigs(zi - 1)
              if (z != 0) soa(zigzag4x4(zi) * 8 + b) = z
              zi += 1
            }
            b += 1
          }
          graft.simd.VectorKernels.dequantRows8(soa,
            H264Transform.vRaster(qpc % 6), qpc / 6, 1)
        }
        def dcInto(dcZig: Array[Int], lane0: Int): Unit = {
          val dc = new Array[Int](4)
          var k = 0
          while (k < 4) { dc(k) = dcZig(k); k += 1 }
          hadamard2x2(dc)
          k = 0
          while (k < 4) { soa(lane0 + k) = dequantChromaDc(dc(k), qpc); k += 1 }
        }
        dcInto(mc.cbDcZig, 0)
        dcInto(mc.crDcZig, 4)
        graft.simd.VectorKernels.inverse4x4x8(soa)
        def commitPlane(plane: Array[Byte], predC: Array[Int], lane0: Int): Unit = {
          val resC = sc.res64
          var b = 0
          while (b < 4) {
            val bx = (b % 2) * 4; val by = (b / 2) * 4
            var p = 0
            while (p < 16) {
              resC((by + (p >> 2)) * 8 + bx + (p & 3)) = soa(p * 8 + lane0 + b)
              p += 1
            }
            b += 1
          }
          var r = 0
          while (r < 8) {
            graft.simd.VectorKernels.addClipNarrowRow8(predC, r * 8, resC, r * 8,
              plane, (cy0 + r) * st.cw + cx0)
            r += 1
          }
        }
        commitPlane(st.reconCb, predCb, 0)
        commitPlane(st.reconCr, predCr, 4)
      }
      return
    }
    val w = sc.w16
    var blk = 0
    while (blk < 16) {
      val coded = mc != null && ((mc.cbpLuma >> (blk / 4)) & 1) != 0
      val bx0 = blkX(blk) * 4; val by0 = blkY(blk) * 4
      if (coded) {
        java.util.Arrays.fill(w, 0)
        val zigs = mc.lumaZig(blk)
        var zi = 0
        while (zi < 16) {
          val z = zigs(zi)
          if (z != 0) { val pos = zigzag4x4(zi); w(pos) = st.scal.deqAc(z, qp, pos, LInterY) }
          zi += 1
        }
        inverse4x4(w)
        var r = 0
        while (r < 4) {
          val rb = (y0 + by0 + r) * st.pw + x0 + bx0
          val pb = (by0 + r) * 16 + bx0
          val wb = r * 4
          var c = 0
          while (c < 4) {
            st.reconY(rb + c) = clip(predL(pb + c) + w(wb + c))
            c += 1
          }
          r += 1
        }
      } else {
        // no residual: the MC prediction IS the reconstruction (mcLuma
        // output is already clipped to 0..255)
        var r = 0
        while (r < 4) {
          val rb = (y0 + by0 + r) * st.pw + x0 + bx0
          val pb = (by0 + r) * 16 + bx0
          var c = 0
          while (c < 4) { st.reconY(rb + c) = predL(pb + c).toByte; c += 1 }
          r += 1
        }
      }
      blk += 1
    }
    def chromaRec(plane: Array[Byte], predC: Array[Int],
        dcZig: Array[Int], acZig: Array[Array[Int]], list: Int,
        qpc: Int): Unit = {
      val cbpChroma = if (mc == null) 0 else mc.cbpChroma
      val dc = new Array[Int](4)
      if (cbpChroma != 0) {
        var k = 0
        while (k < 4) { dc(k) = dcZig(k); k += 1 }
        hadamard2x2(dc)
        k = 0
        while (k < 4) { dc(k) = st.scal.deqChromaDc(dc(k), qpc, list); k += 1 }
      }
      val cx0 = mbX * 8; val cy0 = mbY * 8
      if (cbpChroma == 0) {
        // no chroma residual: the MC prediction IS the reconstruction
        var r = 0
        while (r < 8) {
          val rb = (cy0 + r) * st.cw + cx0
          val pb = r * 8
          var c = 0
          while (c < 8) { plane(rb + c) = predC(pb + c).toByte; c += 1 }
          r += 1
        }
      } else {
      var cb = 0
      while (cb < 4) {
        val bx = cb % 2; val by = cb / 2
        java.util.Arrays.fill(w, 0)
        w(0) = dc(by * 2 + bx)
        if (cbpChroma == 2) {
          val zigs = acZig(cb)
          var zi = 1
          while (zi < 16) {
            val z = zigs(zi - 1)
            if (z != 0) { val pos = zigzag4x4(zi); w(pos) = st.scal.deqAc(z, qpc, pos, list) }
            zi += 1
          }
        }
        inverse4x4(w)
        var r = 0
        while (r < 4) {
          val rb = (cy0 + by * 4 + r) * st.cw + cx0 + bx * 4
          val pb = (by * 4 + r) * 8 + bx * 4
          val wb = r * 4
          var c = 0
          while (c < 4) {
            plane(rb + c) = clip(predC(pb + c) + w(wb + c))
            c += 1
          }
          r += 1
        }
        cb += 1
      }
      }
    }
    chromaRec(st.reconCb, predCb,
      if (mc == null) null else mc.cbDcZig, if (mc == null) null else mc.cbAcZig,
      LInterCb, qpc)
    chromaRec(st.reconCr, predCr,
      if (mc == null) null else mc.crDcZig, if (mc == null) null else mc.crAcZig,
      LInterCr, qpcCr)
  }

  /** Decode-order geometry of the partitions of one P macroblock:
    * (ox4, oy4, w4, h4, refSlot) per partition, MB-relative 4x4-block
    * units. refSlot indexes the per-partition ref_idx list (one slot
    * per MB partition — both 16x8 halves, or the four 8x8 sub-MBs).
    * mbType: 1 P_L0_L0_16x8, 2 P_L0_L0_8x16, 3/4 P_8x8(ref0) with
    * `subTypes` (Table 7-17: 0 8x8, 1 8x4, 2 4x8, 3 4x4) per sub-MB. */
  private def pPartGeometry(mbType: Int, subTypes: Array[Int])
      : Seq[(Int, Int, Int, Int, Int)] = mbType match {
    case 1 => Seq((0, 0, 4, 2, 0), (0, 2, 4, 2, 1))
    case 2 => Seq((0, 0, 2, 4, 0), (2, 0, 2, 4, 1))
    case _ =>
      (0 until 4).flatMap { i =>
        val ox = (i & 1) * 2; val oy = (i >> 1) * 2
        subTypes(i) match {
          case 0 => Seq((ox, oy, 2, 2, i))
          case 1 => Seq((ox, oy, 2, 1, i), (ox, oy + 1, 2, 1, i))
          case 2 => Seq((ox, oy, 1, 2, i), (ox + 1, oy, 1, 2, i))
          case _ => Seq((ox, oy, 1, 1, i), (ox + 1, oy, 1, 1, i),
            (ox, oy + 1, 1, 1, i), (ox + 1, oy + 1, 1, 1, i))
        }
      }
  }

  /** geometry + two-list motion of one inter partition / sub-partition:
    * MB-relative offset (ox4, oy4) and size (w4, h4), all in 4x4-block
    * units. ref -1 = list unused. */
  private final case class InterPart(ox4: Int, oy4: Int, w4: Int, h4: Int,
      ref0: Int, mv0x: Int, mv0y: Int,
      ref1: Int = -1, mv1x: Int = 0, mv1y: Int = 0)

  /** Table 7-14 two-partition B types (mbType 4..21): prediction mode of
    * the first and second partition (1 L0, 2 L1, 3 Bi) and the shape —
    * the nine (L0/L1/Bi)^2 pairs each in 16x8 then 8x16 order */
  private val bPartPairs: Array[(Int, Int)] = Array((1, 1), (2, 2), (1, 2),
    (2, 1), (1, 3), (2, 3), (3, 1), (3, 2), (3, 3))
  private def bPartModes(mbType: Int): (Int, Int, Boolean) = {
    val (m0, m1) = bPartPairs((mbType - 4) / 2)
    (m0, m1, mbType % 2 == 0)
  }
  /** the encoder's inverse: two partition modes + shape -> Table 7-14 type */
  private def bTwoPartType(m0: Int, m1: Int, is16x8: Boolean): Int =
    4 + 2 * bPartPairs.indexOf((m0, m1)) + (if (is16x8) 0 else 1)

  /** Table 7-18 B sub_mb_type: (mode 0 direct / 1 L0 / 2 L1 / 3 Bi,
    * sub-partition w4, h4) */
  private def bSubMbShape(t: Int): (Int, Int, Int) = t match {
    case 0 => (0, 2, 2)
    case 1 => (1, 2, 2)
    case 2 => (2, 2, 2)
    case 3 => (3, 2, 2)
    case 4 => (1, 2, 1)
    case 5 => (1, 1, 2)
    case 6 => (2, 2, 1)
    case 7 => (2, 1, 2)
    case 8 => (3, 2, 1)
    case 9 => (3, 1, 2)
    case 10 => (1, 1, 1)
    case 11 => (2, 1, 1)
    case 12 => (3, 1, 1)
    case other => sys.error(s"B sub_mb_type $other out of the Table 7-18 range")
  }
  /** sub-partition offsets within one 8x8 quadrant for a (w4, h4) shape */
  private def subPartOffsets(w4: Int, h4: Int): Seq[(Int, Int)] = (w4, h4) match {
    case (2, 2) => Seq((0, 0))
    case (2, 1) => Seq((0, 0), (0, 1))
    case (1, 2) => Seq((0, 0), (1, 0))
    case _      => Seq((0, 0), (1, 0), (0, 1), (1, 1))
  }

  /** one partition of a parsed-but-not-yet-derived B MB: geometry, the
    * Table 7-14/7-18 prediction mode, the owning quadrant (for direct
    * sub-MBs), and the raw mvds (list-major in the bitstream) */
  private final case class BRawPart(ox4: Int, oy4: Int, w4: Int, h4: Int,
      mode: Int, quadIdx: Int,
      d0x: Int = 0, d0y: Int = 0, d1x: Int = 0, d1y: Int = 0,
      r0: Int = 0, r1: Int = 0)

  /** collect the raw partitions of a partitioned B MB (mbType 4..22):
    * geometry + prediction modes from the type tables, then the mvds in
    * §7.3.5.1 BITSTREAM order — every mvd_l0 first, then every mvd_l1 —
    * via the entropy-layer callback (MB-relative offset + shape + list,
    * so the CABAC side can update its mvd context state in exactly this
    * order). Derivation order is [[deriveBParts]]'s job, not this one's.
    */
  private def readBRawParts(mbType: Int, subTypes: Array[Int],
      readRef: (Int, Int, Int) => Int,
      readMvdPair: (Int, Int, Int, Int, Int) => (Int, Int)): Seq[BRawPart] = {
    val skel0: Seq[BRawPart] =
      if (mbType <= 21) {
        val (m0, m1, is16x8) = bPartModes(mbType)
        val geo =
          if (is16x8) Seq((0, 0, 4, 2), (0, 2, 4, 2))
          else Seq((0, 0, 2, 4), (2, 0, 2, 4))
        geo.zip(Seq(m0, m1)).map { case ((ox, oy, w, h), m) =>
          BRawPart(ox, oy, w, h, m, 0)
        }
      } else
        (0 until 4).flatMap { q =>
          val (mode, w4, h4) = bSubMbShape(subTypes(q))
          val qx = (q & 1) * 2; val qy = (q >> 1) * 2
          if (mode == 0) Seq(BRawPart(qx, qy, 2, 2, 0, q))
          else subPartOffsets(w4, h4).map { case (ox, oy) =>
            BRawPart(qx + ox, qy + oy, w4, h4, mode, q)
          }
        }
    // ref_idx (§7.3.5.1/.2: every lX slot in partition/sub-MB order
    // BEFORE any mvd; one slot per MB partition or per sub-MB, shared by
    // that sub-MB's sub-partitions)
    def refsFor(list: Int): Map[Int, Int] = {
      val uses = (p: BRawPart) =>
        if (list == 0) p.mode == 1 || p.mode == 3 else p.mode >= 2
      if (mbType <= 21)
        skel0.zipWithIndex.collect { case (p, i) if uses(p) =>
          i -> readRef(p.ox4, p.oy4, list)
        }.toMap
      else {
        val perQuad = (0 until 4).collect {
          case q if skel0.exists(p => p.quadIdx == q && uses(p)) =>
            val head = skel0.find(p => p.quadIdx == q && uses(p)).get
            q -> readRef(head.ox4, head.oy4, list)
        }.toMap
        skel0.zipWithIndex.collect { case (p, i) if uses(p) =>
          i -> perQuad(p.quadIdx)
        }.toMap
      }
    }
    val refs0 = refsFor(0)
    val refs1 = refsFor(1)
    val skel = skel0.zipWithIndex.map { case (p, i) =>
      p.copy(r0 = refs0.getOrElse(i, 0), r1 = refs1.getOrElse(i, 0))
    }
    val withL0 = skel.map { p =>
      if (p.mode == 1 || p.mode == 3) {
        val (dx, dy) = readMvdPair(p.ox4, p.oy4, p.w4, p.h4, 0)
        p.copy(d0x = dx, d0y = dy)
      } else p
    }
    withL0.map { p =>
      if (p.mode >= 2) {
        val (dx, dy) = readMvdPair(p.ox4, p.oy4, p.w4, p.h4, 1)
        p.copy(d1x = dx, d1y = dy)
      } else p
    }
  }

  /** §8.4.1.3 motion derivation of a partitioned B MB: runs in PARTITION
    * decode order (the bitstream groups mvds list-major, but each
    * partition's predictor samples the final motion of every earlier
    * partition — both lists), records motion per partition, and returns
    * the reconstruction-ready parts. `dm` carries the direct-derivation
    * for B_Direct_8x8 sub-MBs (null when none occur). */
  private def deriveBParts(st: PicState, l0: IndexedSeq[PicState],
      l1: IndexedSeq[PicState], mbX: Int, mbY: Int, raw: Seq[BRawPart],
      dm: DirectMv): IndexedSeq[InterPart] = {
    st.beginPartitionedMb(mbX, mbY)
    raw.toIndexedSeq.map { p =>
      val bx4 = mbX * 4 + p.ox4; val by4 = mbY * 4 + p.oy4
      if (p.mode == 0) {
        val q = p.quadIdx
        val (m0x, m0y, m1x, m1y) =
          if (dm.uniform) (dm.quad(0), dm.quad(1), dm.quad(2), dm.quad(3))
          else (dm.quad(q * 4), dm.quad(q * 4 + 1),
            dm.quad(q * 4 + 2), dm.quad(q * 4 + 3))
        st.setMotion4(bx4, by4, 2, 2, dm.ref0, m0x, m0y, dm.ref1, m1x, m1y,
          if (dm.ref0 >= 0) l0(dm.ref0).poc else 0)
        InterPart(p.ox4, p.oy4, 2, 2, dm.ref0, m0x, m0y, dm.ref1, m1x, m1y)
      } else {
        var r0 = -1; var m0x = 0; var m0y = 0
        var r1 = -1; var m1x = 0; var m1y = 0
        if ((p.mode & 1) == 1) { // L0 or Bi
          val (px, py) = predictMvPart(st, bx4, by4, p.w4, p.h4, p.r0, 0)
          r0 = p.r0; m0x = px + p.d0x; m0y = py + p.d0y
        }
        if (p.mode >= 2) { // L1 or Bi
          val (px, py) = predictMvPart(st, bx4, by4, p.w4, p.h4, p.r1, 1)
          r1 = p.r1; m1x = px + p.d1x; m1y = py + p.d1y
        }
        st.setMotion4(bx4, by4, p.w4, p.h4, r0, m0x, m0y, r1, m1x, m1y,
          if (r0 >= 0) l0(r0).poc else 0)
        InterPart(p.ox4, p.oy4, p.w4, p.h4, r0, m0x, m0y, r1, m1x, m1y)
      }
    }
  }

  /** Reconstruction of a PARTITIONED inter MB (P_16x8 / P_8x16 / P_8x8
    * with sub-partitions, and the per-quadrant direct B MB): each
    * partition motion-compensates into the MB-local prediction buffers
    * (bi partitions average per §8.4.2.3.1), then the shared residual
    * commits. The caller must have recorded per-partition motion state
    * (setMotion4) BEFORE calling — parse-order MV prediction already
    * needed it. */
  private def reconstructInterParts(st: PicState, l0: IndexedSeq[PicState],
      l1: IndexedSeq[PicState], mbX: Int, mbY: Int, qp: Int,
      parts: Seq[InterPart], mc: PMbCoeffs, wp: WpCtx = null): Unit = {
    st.mbQp(mbY * st.mbW + mbX) = qp
    val sc = mcScratch.get()
    val predL = sc.predL
    val predCb = sc.predC; val predCr = sc.predC2
    assembleInterPred(st, l0, l1, mbX, mbY, parts, predL, predCb, predCr, wp)
    interResidualCommit(st, mbX, mbY, qp, mc, predL, predCb, predCr)
    st.inter(mbY * st.mbW + mbX) = true
  }

  /** per-partition (bi-)MC into MB-local prediction buffers (luma
    * stride 16, chroma stride 8) — shared by partitioned reconstruction
    * and the encoder's direct-candidate evaluation */
  private def assembleInterPred(st: PicState, l0: IndexedSeq[PicState],
      l1: IndexedSeq[PicState], mbX: Int, mbY: Int, parts: Seq[InterPart],
      predL: Array[Int], predCb: Array[Int], predCr: Array[Int],
      wp: WpCtx = null): Unit = {
    val sc = mcScratch.get()
    parts.foreach { p =>
      require(p.ref0 >= 0 || p.ref1 >= 0, "inter partition with no list")
      val bi = p.ref0 >= 0 && p.ref1 >= 0
      val px = mbX * 16 + p.ox4 * 4; val py = mbY * 16 + p.oy4 * 4
      val w = p.w4 * 4; val h = p.h4 * 4
      val cpx = mbX * 8 + p.ox4 * 2; val cpy = mbY * 8 + p.oy4 * 2
      val ox = p.ox4 * 4; val oy = p.oy4 * 4
      val cox = p.ox4 * 2; val coy = p.oy4 * 2
      if (p.ref0 >= 0) {
        val r0 = l0(p.ref0)
        mcLumaBlk(r0, px, py, w, h, p.mv0x, p.mv0y, predL, ox, oy)
        mcChromaBlk(r0.reconCb, st.cw, st.ch, cpx, cpy, w / 2, h / 2,
          p.mv0x, p.mv0y, predCb, cox, coy)
        mcChromaBlk(r0.reconCr, st.cw, st.ch, cpx, cpy, w / 2, h / 2,
          p.mv0x, p.mv0y, predCr, cox, coy)
        if (wp != null && !bi) {
          wp.applyLuma(0, p.ref0, predL, ox, oy, w, h)
          wp.applyChroma(0, p.ref0, 0, predCb, cox, coy, w / 2, h / 2)
          wp.applyChroma(0, p.ref0, 1, predCr, cox, coy, w / 2, h / 2)
        }
      }
      if (p.ref1 >= 0) {
        val r1 = l1(p.ref1)
        if (!bi) {
          mcLumaBlk(r1, px, py, w, h, p.mv1x, p.mv1y, predL, ox, oy)
          mcChromaBlk(r1.reconCb, st.cw, st.ch, cpx, cpy, w / 2, h / 2,
            p.mv1x, p.mv1y, predCb, cox, coy)
          mcChromaBlk(r1.reconCr, st.cw, st.ch, cpx, cpy, w / 2, h / 2,
            p.mv1x, p.mv1y, predCr, cox, coy)
          if (wp != null) {
            wp.applyLuma(1, p.ref1, predL, ox, oy, w, h)
            wp.applyChroma(1, p.ref1, 0, predCb, cox, coy, w / 2, h / 2)
            wp.applyChroma(1, p.ref1, 1, predCr, cox, coy, w / 2, h / 2)
          }
        } else {
          // list-1 prediction into scratch at offset 0, then combine
          // into the partition's region of the MB-local buffers —
          // §8.4.2.3.1 rounding average, or the §8.4.2.3.2 explicit
          // two-weight formula under weighted prediction
          val pL1 = sc.predL1; val pC1 = sc.predC1
          @inline def biL(a: Int, b: Int): Int =
            if (wp == null) (a + b + 1) >> 1
            else {
              val v = ((a * wp.lw(0)(p.ref0) + b * wp.lw(1)(p.ref1) +
                (1 << wp.lumaLog2)) >> (wp.lumaLog2 + 1)) +
                ((wp.lo(0)(p.ref0) + wp.lo(1)(p.ref1) + 1) >> 1)
              if (v < 0) 0 else if (v > 255) 255 else v
            }
          @inline def biC(a: Int, b: Int, pl: Int): Int =
            if (wp == null) (a + b + 1) >> 1
            else {
              val v = ((a * wp.cw(0)(p.ref0)(pl) + b * wp.cw(1)(p.ref1)(pl) +
                (1 << wp.chromaLog2)) >> (wp.chromaLog2 + 1)) +
                ((wp.co(0)(p.ref0)(pl) + wp.co(1)(p.ref1)(pl) + 1) >> 1)
              if (v < 0) 0 else if (v > 255) 255 else v
            }
          mcLumaBlk(r1, px, py, w, h, p.mv1x, p.mv1y, pL1, 0, 0)
          var r = 0
          while (r < h) {
            var c = 0
            while (c < w) {
              val d = (oy + r) * 16 + ox + c
              predL(d) = biL(predL(d), pL1(r * 16 + c))
              c += 1
            }
            r += 1
          }
          mcChromaBlk(r1.reconCb, st.cw, st.ch, cpx, cpy, w / 2, h / 2,
            p.mv1x, p.mv1y, pC1, 0, 0)
          r = 0
          while (r < h / 2) {
            var c = 0
            while (c < w / 2) {
              val d = (coy + r) * 8 + cox + c
              predCb(d) = biC(predCb(d), pC1(r * 8 + c), 0)
              c += 1
            }
            r += 1
          }
          mcChromaBlk(r1.reconCr, st.cw, st.ch, cpx, cpy, w / 2, h / 2,
            p.mv1x, p.mv1y, pC1, 0, 0)
          r = 0
          while (r < h / 2) {
            var c = 0
            while (c < w / 2) {
              val d = (coy + r) * 8 + cox + c
              predCr(d) = biC(predCr(d), pC1(r * 8 + c), 1)
              c += 1
            }
            r += 1
          }
        }
      }
    }
  }

  // ------------------------------------------------------------- encode

  /** forward-code one MB as Intra_16x16 and return its coefficients */
  /** the I16 mode decision: (mode, per-pixel prediction, SAD) — shared
    * by the I16 analysis and the I16-vs-I4 MB-type competition */
  private def selectI16(st: PicState, mbX: Int, mbY: Int,
      srcY: Array[Byte]): (Int, Array[Int], Long) = {
    val x0 = mbX * 16; val y0 = mbY * 16
    var bestMode = 2
    var bestPred: Array[Int] = null
    var bestSad = Long.MaxValue
    i16Modes(st, mbX, mbY).sorted.foreach { m =>
      val p = predLuma16(st, mbX, mbY, m)
      var sad = 0L
      var i = 0
      while (i < 256) {
        sad += math.abs((srcY((y0 + i / 16) * st.pw + x0 + i % 16) & 0xff) - p(i))
        i += 1
      }
      if (sad < bestSad) { bestSad = sad; bestMode = m; bestPred = p }
    }
    (bestMode, bestPred, bestSad)
  }

  /** Does ANY available Intra_16x16 mode beat `bound` on source SAD?
    * Decision-identical to `selectI16(...)._3 < bound` but with per-row
    * early exit — the intra-in-P gate needs only this boolean, and on
    * smooth-motion MBs (where the gate almost always rejects) the SAD
    * accumulation crosses the bound within a few rows instead of paying
    * four full 256-sample sums (VERDICT r14 ask 5: the gate cost showed
    * up as a 720p encode fps dip).
    */
  private def i16Beats(st: PicState, mbX: Int, mbY: Int,
      srcY: Array[Byte], bound: Long): Boolean = {
    if (bound <= 0) return false
    val x0 = mbX * 16; val y0 = mbY * 16
    i16Modes(st, mbX, mbY).sorted.exists { m =>
      val p = predLuma16(st, mbX, mbY, m)
      var sad = 0L
      var r = 0
      while (r < 16 && sad < bound) {
        val rowBase = (y0 + r) * st.pw + x0
        val pBase = r * 16
        var c = 0
        while (c < 16) {
          sad += math.abs((srcY(rowBase + c) & 0xff) - p(pBase + c))
          c += 1
        }
        r += 1
      }
      sad < bound
    }
  }

  private def analyseMbI16(st: PicState, mbX: Int, mbY: Int, qp: Int,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      chromaModes: Boolean = false): MbCoeffs = {
    val qpc = chromaQp(qp)
    val mc = new MbCoeffs
    // ---- luma: pick the lowest-SAD available Intra_16x16 mode
    // (deterministic tie-break toward the smaller mode index), then
    // transform the per-pixel residual against that prediction
    val x0 = mbX * 16; val y0 = mbY * 16
    val (bestMode, bestPred, _) = selectI16(st, mbX, mbY, srcY)
    mc.predMode = bestMode
    val predY = bestPred
    val dcArr = new Array[Int](16)
    val b = new Array[Int](16)
    var anyLumaAc = false
    var blk = 0
    while (blk < 16) {
      val bx0 = x0 + blkX(blk) * 4; val by0 = y0 + blkY(blk) * 4
      var r = 0
      while (r < 4) {
        var c = 0
        while (c < 4) {
          b(r * 4 + c) = (srcY((by0 + r) * st.pw + bx0 + c) & 0xff) -
            predY((blkY(blk) * 4 + r) * 16 + blkX(blk) * 4 + c)
          c += 1
        }
        r += 1
      }
      forward4x4(b)
      dcArr(blkY(blk) * 4 + blkX(blk)) = b(0)
      var zi = 1
      while (zi < 16) {
        val pos = zigzag4x4(zi)
        val z = st.scal.qAc(b(pos), qp, pos, LIntraY)
        mc.lumaAcZig(blk)(zi - 1) = z
        if (z != 0) anyLumaAc = true
        zi += 1
      }
      blk += 1
    }
    hadamard4x4(dcArr)
    var i = 0
    while (i < 16) { dcArr(i) = dcArr(i) / 2; i += 1 }
    i = 0
    while (i < 16) { mc.lumaDcZig(i) = st.scal.qLumaDc(dcArr(zigzag4x4(i)), qp); i += 1 }
    mc.cbpLuma = if (anyLumaAc) 15 else 0
    // ---- chroma (shared with the Intra_4x4 MB analysis)
    val packed = analyseIntraChroma(st, mbX, mbY, qpc, srcCb, srcCr,
      mc.cbDcZig, mc.cbAcZig, mc.crDcZig, mc.crAcZig, tryModes = chromaModes)
    mc.cbpChroma = packed & 3
    mc.chromaMode = packed >> 2
    mc
  }

  /** intra-MB chroma analysis (§8.3.4 prediction, forward transform +
    * quantization into the caller's zig arrays); returns cbpChroma
    * packed with the chosen intra_chroma_pred_mode as
    * `cbp | (mode << 2)` — identical for Intra_16x16, Intra_4x4, and
    * Intra_8x8 macroblocks. With `tryModes` the four §8.3.4 modes
    * compete on joint Cb+Cr SAD (non-DC modes charged a small signaling
    * bias; deterministic tie-break toward the smaller mode index —
    * source-only inputs, so CAVLC and CABAC encodes agree); without it
    * the mode stays DC (pre-round-15 streams byte-identical).
    */
  private def analyseIntraChroma(st: PicState, mbX: Int, mbY: Int, qpc: Int,
      srcCb: Array[Byte], srcCr: Array[Byte],
      cbDcZig: Array[Int], cbAcZig: Array[Array[Int]],
      crDcZig: Array[Int], crAcZig: Array[Array[Int]],
      tryModes: Boolean = false): Int = {
    val hasL = st.mbAvail(mbX - 1, mbY)
    val hasT = st.mbAvail(mbX, mbY - 1)
    val hasTL = st.mbAvail(mbX - 1, mbY - 1)
    val cx0 = mbX * 8; val cy0 = mbY * 8
    def sadVs(src: Array[Byte], pred: Array[Int]): Long = {
      var sad = 0L
      var i = 0
      while (i < 64) {
        sad += math.abs((src((cy0 + (i >> 3)) * st.cw + cx0 + (i & 7)) & 0xff) - pred(i))
        i += 1
      }
      sad
    }
    val mode =
      if (!tryModes) 0
      else {
        var best = 0
        var bestCost = Long.MaxValue
        var m = 0
        while (m < 4) {
          val ok = m == 0 || (m == 1 && hasL) || (m == 2 && hasT) ||
            (m == 3 && hasL && hasT && hasTL)
          if (ok) {
            val cost = sadVs(srcCb, predChroma8(st.reconCb, st.cw, mbX, mbY, m, hasL, hasT, hasTL)) +
              sadVs(srcCr, predChroma8(st.reconCr, st.cw, mbX, mbY, m, hasL, hasT, hasTL)) +
              (if (m == 0) 0 else 8) // TU signaling bias
            if (cost < bestCost) { bestCost = cost; best = m }
          }
          m += 1
        }
        best
      }
    val b = new Array[Int](16)
    var anyChromaAc = false
    var anyChromaDc = false
    def chroma(src: Array[Byte], plane: Array[Byte], dcZig: Array[Int],
        acZig: Array[Array[Int]], list: Int): Unit = {
      val pred = predChroma8(plane, st.cw, mbX, mbY, mode, hasL, hasT, hasTL)
      val dc = new Array[Int](4)
      var cb = 0
      while (cb < 4) {
        val bx = cb % 2; val by = cb / 2
        val px0 = cx0 + bx * 4; val py0 = cy0 + by * 4
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            b(r * 4 + c) = (src((py0 + r) * st.cw + px0 + c) & 0xff) -
              pred((by * 4 + r) * 8 + bx * 4 + c)
            c += 1
          }
          r += 1
        }
        forward4x4(b)
        dc(by * 2 + bx) = b(0)
        var zi = 1
        while (zi < 16) {
          val pos = zigzag4x4(zi)
          val z = st.scal.qAc(b(pos), qpc, pos, list)
          acZig(cb)(zi - 1) = z
          if (z != 0) anyChromaAc = true
          zi += 1
        }
        cb += 1
      }
      hadamard2x2(dc)
      var k = 0
      while (k < 4) {
        dcZig(k) = st.scal.qChromaDc(dc(k), qpc, list)
        if (dcZig(k) != 0) anyChromaDc = true
        k += 1
      }
    }
    chroma(srcCb, st.reconCb, cbDcZig, cbAcZig, LIntraCb)
    chroma(srcCr, st.reconCr, crDcZig, crAcZig, LIntraCr)
    if (mode != 0) chromaModeCount.incrementAndGet()
    (if (anyChromaAc) 2 else if (anyChromaDc) 1 else 0) | (mode << 2)
  }

  /** I16-vs-I4 macroblock-type competition + full Intra_4x4 analysis.
    * Runs the closed-loop I4 analysis speculatively (it must write recon
    * — later blocks predict from earlier ones); when I16 wins, the luma
    * region and the i4Mode grid are restored. The SAD bias charges
    * I_NxN's extra signaling (~16-65 mode bits + per-block entropy
    * overhead) so near-ties don't bloat the stream.
    */
  private def tryI4(st: PicState, mbX: Int, mbY: Int, qp: Int,
      srcY: Array[Byte], srcCb: Array[Byte],
      srcCr: Array[Byte],
      chromaModes: Boolean = false): Option[(Array[Int], PMbCoeffs)] = {
    val (_, _, sad16) = selectI16(st, mbX, mbY, srcY)
    val x0 = mbX * 16; val y0 = mbY * 16
    val saved = Array.tabulate(16)(rr => java.util.Arrays.copyOfRange(
      st.reconY, (y0 + rr) * st.pw + x0, (y0 + rr) * st.pw + x0 + 16))
    val (modes, zigs, cbpL, sad4) = analyseLumaI4(st, mbX, mbY, qp, srcY)
    if (sad4 + 96 < sad16) {
      val m = new PMbCoeffs
      var blk = 0
      while (blk < 16) {
        System.arraycopy(zigs(blk), 0, m.lumaZig(blk), 0, 16)
        blk += 1
      }
      val qpc = chromaQp(qp)
      val packed = analyseIntraChroma(st, mbX, mbY, qpc, srcCb, srcCr,
        m.cbDcZig, m.cbAcZig, m.crDcZig, m.crAcZig, tryModes = chromaModes)
      val cbpC = packed & 3
      m.chromaMode = packed >> 2
      m.cbp = cbpL | (cbpC << 4)
      intraChromaRecon(st, mbX, mbY, qpc, cbpC,
        m.cbDcZig, m.cbAcZig, m.crDcZig, m.crAcZig, m.chromaMode)
      st.mbQp(mbY * st.mbW + mbX) = qp
      i4MbCount.incrementAndGet()
      Some((modes, m))
    } else {
      var rr = 0
      while (rr < 16) {
        System.arraycopy(saved(rr), 0, st.reconY, (y0 + rr) * st.pw + x0, 16)
        rr += 1
      }
      var by = 0
      while (by < 4) {
        var bx = 0
        while (bx < 4) {
          st.i4Mode((mbY * 4 + by) * st.bw4 + mbX * 4 + bx) = -1
          bx += 1
        }
        by += 1
      }
      None
    }
  }

  /** the CAVLC I-slice intra choice of one MB */
  private sealed trait IntraSel
  private object IntraSel {
    case object I16 extends IntraSel
    final case class I4(modes: Array[Int], m: PMbCoeffs) extends IntraSel
    final case class I8(modes: Array[Int], zig8: Array[Array[Int]], m: PMbCoeffs)
      extends IntraSel
  }

  /** Three-way intra mode competition (I16 vs I_NxN-4x4 vs
    * I_NxN-8x8 when `allow8`): each NxN analysis runs its closed loop
    * against a saved reconstruction; the winner's analysis OUTPUTS
    * (modes, zigs, cbp, and the luma recon + i4Mode region it produced)
    * are captured on the first pass and restored, so no winning MB pays
    * its prediction+transform+quant loop twice (ADVICE r12). Biases
    * mirror the historical I4-vs-I16 margin (+96, sixteen mode codes of
    * overhead); I8 carries a smaller one (+64, four mode codes).
    */
  private def tryIntraNxN(st: PicState, mbX: Int, mbY: Int, qp: Int,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      allow8: Boolean, chromaModes: Boolean = false): IntraSel = {
    if (!allow8)
      return tryI4(st, mbX, mbY, qp, srcY, srcCb, srcCr, chromaModes) match {
        case Some((modes, m)) => IntraSel.I4(modes, m)
        case None             => IntraSel.I16
      }
    val (_, _, sad16) = selectI16(st, mbX, mbY, srcY)
    val x0 = mbX * 16; val y0 = mbY * 16
    // the analyses mutate exactly st.reconY's 16x16 region and this MB's
    // 16 i4Mode cells — snapshot/restore of those is a full state swap
    def snapRegion(): (Array[Array[Byte]], Array[Int]) = {
      val rec = Array.tabulate(16)(rr => java.util.Arrays.copyOfRange(
        st.reconY, (y0 + rr) * st.pw + x0, (y0 + rr) * st.pw + x0 + 16))
      val im = new Array[Int](16)
      var k = 0
      while (k < 16) {
        im(k) = st.i4Mode((mbY * 4 + k / 4) * st.bw4 + mbX * 4 + k % 4)
        k += 1
      }
      (rec, im)
    }
    def restoreRegion(snapped: (Array[Array[Byte]], Array[Int])): Unit = {
      var rr = 0
      while (rr < 16) {
        System.arraycopy(snapped._1(rr), 0, st.reconY, (y0 + rr) * st.pw + x0, 16)
        rr += 1
      }
      var k = 0
      while (k < 16) {
        st.i4Mode((mbY * 4 + k / 4) * st.bw4 + mbX * 4 + k % 4) = snapped._2(k)
        k += 1
      }
    }
    val before = snapRegion() // pre-analysis state (i4Mode cells are -1)
    def finishChroma(m: PMbCoeffs, cbpL: Int): Unit = {
      val qpc = chromaQp(qp)
      val packed = analyseIntraChroma(st, mbX, mbY, qpc, srcCb, srcCr,
        m.cbDcZig, m.cbAcZig, m.crDcZig, m.crAcZig, tryModes = chromaModes)
      val cbpC = packed & 3
      m.chromaMode = packed >> 2
      m.cbp = cbpL | (cbpC << 4)
      intraChromaRecon(st, mbX, mbY, qpc, cbpC,
        m.cbDcZig, m.cbAcZig, m.crDcZig, m.crAcZig, m.chromaMode)
      st.mbQp(mbY * st.mbW + mbX) = qp
    }
    val (modes4, zigs4, cbp4, sad4) = analyseLumaI4(st, mbX, mbY, qp, srcY)
    val after4 = snapRegion()
    restoreRegion(before)
    val (modes8, zigs8, cbp8, sad8) = analyseLumaI8(st, mbX, mbY, qp, srcY)
    val cost16 = sad16
    val cost4 = sad4 + 96
    val cost8 = sad8 + 64
    if (cost8 <= cost4 && cost8 < cost16) {
      // I8 recon is already in place from its analysis
      val m = new PMbCoeffs
      finishChroma(m, cbp8)
      st.trans8(mbY * st.mbW + mbX) = true
      i8MbCount.incrementAndGet()
      IntraSel.I8(modes8, zigs8, m)
    } else if (cost4 < cost16) {
      restoreRegion(after4)
      val m = new PMbCoeffs
      var blk = 0
      while (blk < 16) {
        System.arraycopy(zigs4(blk), 0, m.lumaZig(blk), 0, 16)
        blk += 1
      }
      finishChroma(m, cbp4)
      i4MbCount.incrementAndGet()
      IntraSel.I4(modes4, m)
    } else {
      restoreRegion(before)
      IntraSel.I16
    }
  }

  /** write one Intra_8x8 MB (CAVLC High): mb_type 0 +
    * transform_size_8x8_flag 1, four prev/rem mode codes, DC chroma
    * mode, the Table 9-4 INTRA cbp mapping, then each coded 8x8 block as
    * four interleaved 4x4 CAVLC blocks (sub-block i carries scan
    * positions 4k + i of the 8x8 zigzag) + the shared chroma writer
    */
  private def writeMbI8(bw: H264Writer.BitWriter, st: PicState, mbX: Int, mbY: Int,
      modes: Array[Int], zig8: Array[Array[Int]], m: PMbCoeffs,
      qpDelta: Int = 0): Unit = {
    bw.ue(0) // mb_type I_NxN
    bw.u1(1) // transform_size_8x8_flag
    var b = 0
    while (b < 4) {
      val bx = mbX * 4 + (b % 2) * 2; val by = mbY * 4 + (b / 2) * 2
      val pm = predI4Mode(st, bx, by)
      if (modes(b) == pm) bw.u1(1)
      else {
        bw.u1(0)
        bw.u(3, if (modes(b) < pm) modes(b) else modes(b) - 1)
      }
      b += 1
    }
    bw.ue(m.chromaMode) // intra_chroma_pred_mode
    bw.ue(cbpIntraToCode(m.cbp))
    if (m.cbp != 0) {
      bw.se(qpDelta) // mb_qp_delta
      if (qpDelta != 0) aqpDeltaCount.incrementAndGet()
      writeI8LumaResidual(bw, st, mbX, mbY, m.cbpLuma, zig8)
      writeChromaResidual(bw, st, mbX, mbY, m)
    } else clearNz(st, mbX, mbY)
  }

  /** the luma half of the I8 residual: per coded 8x8 block, four
    * interleaved 4x4 sub-blocks with standard neighbor nC contexts at
    * their covering 4x4 positions
    */
  private def writeI8LumaResidual(bw: H264Writer.BitWriter, st: PicState,
      mbX: Int, mbY: Int, cbpLuma: Int, zig8: Array[Array[Int]]): Unit = {
    val bX = mbX * 4; val bY = mbY * 4
    val sub = new Array[Int](16)
    var b = 0
    while (b < 4) {
      var i = 0
      while (i < 4) {
        val ax = bX + (b % 2) * 2 + i % 2
        val ay = bY + (b / 2) * 2 + i / 2
        val tc =
          if (((cbpLuma >> b) & 1) != 0) {
            var k = 0
            while (k < 16) { sub(k) = zig8(b)(4 * k + i); k += 1 }
            H264Cavlc.writeBlock(bw, sub, st.nC(st.nzY, st.bw4, ax, ay))
          } else 0
        st.nzY(ay * st.bw4 + ax) = tc
        i += 1
      }
      b += 1
    }
  }

  /** mirror of [[writeI8LumaResidual]] */
  private def readI8LumaResidual(r: H264.BitReader, st: PicState,
      mbX: Int, mbY: Int, cbpLuma: Int, zig8: Array[Array[Int]]): Unit = {
    val bX = mbX * 4; val bY = mbY * 4
    val sub = new Array[Int](16)
    var b = 0
    while (b < 4) {
      var i = 0
      while (i < 4) {
        val ax = bX + (b % 2) * 2 + i % 2
        val ay = bY + (b / 2) * 2 + i / 2
        val tc =
          if (((cbpLuma >> b) & 1) != 0) {
            val n = H264Cavlc.readBlockInto(r, 16, st.nC(st.nzY, st.bw4, ax, ay), sub)
            var k = 0
            while (k < 16) { zig8(b)(4 * k + i) = sub(k); k += 1 }
            n
          } else 0
        st.nzY(ay * st.bw4 + ax) = tc
        i += 1
      }
      b += 1
    }
  }

  /** write one Intra_4x4 MB (CAVLC): mb_type 0, sixteen
    * prev/rem mode codes against the §8.3.1.1 most-probable mode, DC
    * chroma mode, the Table 9-4 INTRA cbp mapping, then the shared
    * 16-coeff-block residual writer
    */
  private def writeMbI4(bw: H264Writer.BitWriter, st: PicState, mbX: Int, mbY: Int,
      modes: Array[Int], m: PMbCoeffs, t8pps: Boolean = false,
      qpDelta: Int = 0): Unit = {
    bw.ue(0) // mb_type I_NxN
    if (t8pps) bw.u1(0) // transform_size_8x8_flag: this MB stays 4x4
    var blk = 0
    while (blk < 16) {
      val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
      val pm = predI4Mode(st, bx, by)
      if (modes(blk) == pm) bw.u1(1)
      else {
        bw.u1(0)
        bw.u(3, if (modes(blk) < pm) modes(blk) else modes(blk) - 1)
      }
      blk += 1
    }
    bw.ue(m.chromaMode) // intra_chroma_pred_mode
    bw.ue(cbpIntraToCode(m.cbp))
    if (m.cbp != 0) {
      bw.se(qpDelta) // mb_qp_delta
      if (qpDelta != 0) aqpDeltaCount.incrementAndGet()
      writePResidual(bw, st, mbX, mbY, m)
    } else clearNz(st, mbX, mbY)
  }

  /** write one Intra_16x16 MB's syntax elements + CAVLC residuals,
    * updating the nC bookkeeping (shared block order with the parser)
    */
  private def writeMbI16(bw: H264Writer.BitWriter, st: PicState, mbX: Int, mbY: Int,
      mc: MbCoeffs, typeOffset: Int = 0, qpDelta: Int = 0): Unit = {
    val mbType = typeOffset +
      1 + mc.predMode + 4 * mc.cbpChroma + 12 * (if (mc.cbpLuma == 15) 1 else 0)
    bw.ue(mbType)
    bw.ue(mc.chromaMode) // intra_chroma_pred_mode
    bw.se(qpDelta) // mb_qp_delta (always coded for Intra_16x16, §7.3.5)
    if (qpDelta != 0) aqpDeltaCount.incrementAndGet()
    val bX = mbX * 4; val bY = mbY * 4
    // luma DC: nC of blkIdx 0
    H264Cavlc.writeBlock(bw, mc.lumaDcZig, st.nC(st.nzY, st.bw4, bX, bY))
    // luma AC
    var blk = 0
    while (blk < 16) {
      val ax = bX + blkX(blk); val ay = bY + blkY(blk)
      val tc =
        if (mc.cbpLuma != 0)
          H264Cavlc.writeBlock(bw, mc.lumaAcZig(blk), st.nC(st.nzY, st.bw4, ax, ay))
        else 0
      st.nzY(ay * st.bw4 + ax) = tc
      blk += 1
    }
    // chroma DC (Cb then Cr), nC = -1
    if (mc.cbpChroma != 0) {
      H264Cavlc.writeBlock(bw, mc.cbDcZig, -1)
      H264Cavlc.writeBlock(bw, mc.crDcZig, -1)
    }
    // chroma AC
    val cX = mbX * 2; val cY = mbY * 2
    def chromaAc(nz: Array[Int], acZig: Array[Array[Int]]): Unit = {
      var cb = 0
      while (cb < 4) {
        val ax = cX + cb % 2; val ay = cY + cb / 2
        val tc =
          if (mc.cbpChroma == 2)
            H264Cavlc.writeBlock(bw, acZig(cb), st.nC(nz, st.cbw4, ax, ay))
          else 0
        nz(ay * st.cbw4 + ax) = tc
        cb += 1
      }
    }
    chromaAc(st.nzCb, mc.cbAcZig)
    chromaAc(st.nzCr, mc.crAcZig)
  }

  /** motion-estimate + forward-code one P MB. Full search over integer
    * displacements in [-`range`, range]^2 on luma SAD against the
    * RECONSTRUCTED reference (closed loop — the decoder sees the same
    * prediction), zero-preferring tie-break. Returns (mv quarter-pel,
    * coeffs) — coeffs null when every quantised level is zero.
    */
  private def analysePMb(st: PicState, ref: PicState, mbX: Int, mbY: Int, qp: Int,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      range: Int, halfPel: Boolean, quarterPel: Boolean,
      wp: WpCtx = null, wpRef: Int = 0): (Int, Int, PMbCoeffs, Long) = {
    val x0 = mbX * 16; val y0 = mbY * 16
    // SAD with a row-wise early exit against `bound`: once the running
    // sum can no longer beat the incumbent the exact value is irrelevant
    // (the caller only does a strict < compare), so the argmin — and the
    // emitted bitstream — is unchanged while the full search drops ~4x
    // of its pixel work. Interior displacements skip the edge clamp.
    def sad(dx: Int, dy: Int, bound: Long): Long = {
      val rx0 = x0 + dx; val ry0 = y0 + dy
      val refPlane = ref.reconY
      var s = 0L
      if (rx0 >= 0 && ry0 >= 0 && rx0 + 16 <= ref.pw && ry0 + 16 <= ref.ph) {
        if (Simd.enabled)
          return graft.simd.VectorKernels.sadByte16(srcY, y0 * st.pw + x0,
            st.pw, refPlane, ry0 * ref.pw + rx0, ref.pw, 16, bound)
        var r = 0
        while (r < 16) {
          val sb = (y0 + r) * st.pw + x0
          val rb = (ry0 + r) * ref.pw + rx0
          var c = 0
          while (c < 16) {
            val d = (srcY(sb + c) & 0xff) - (refPlane(rb + c) & 0xff)
            s += (if (d < 0) -d else d)
            c += 1
          }
          if (s >= bound) return s
          r += 1
        }
      } else {
        var r = 0
        while (r < 16) {
          val sb = (y0 + r) * st.pw + x0
          var c = 0
          while (c < 16) {
            val d = (srcY(sb + c) & 0xff) -
              refSample(refPlane, ref.pw, ref.ph, rx0 + c, ry0 + r)
            s += (if (d < 0) -d else d)
            c += 1
          }
          if (s >= bound) return s
          r += 1
        }
      }
      s
    }
    var bestDx = 0; var bestDy = 0
    var best = sad(0, 0, Long.MaxValue)
    var dy = -range
    while (dy <= range) {
      var dx = -range
      while (dx <= range) {
        if (dx != 0 || dy != 0) {
          val s = sad(dx, dy, best)
          if (s < best) { best = s; bestDx = dx; bestDy = dy }
        }
        dx += 1
      }
      dy += 1
    }
    // half-pel refinement: the 8 half-sample neighbours of the integer
    // winner, SAD over the actual 6-tap interpolated prediction
    // (integer-preferring tie-break keeps zero-motion skip paths cheap)
    var mvx = bestDx * 4; var mvy = bestDy * 4
    val predTmp = new Array[Int](256) // local: mcLuma may use the shared scratch
    def sadInterp(qx: Int, qy: Int, bound: Long): Long = {
      mcLuma(ref, mbX, mbY, qx, qy, predTmp)
      if (Simd.enabled)
        return graft.simd.VectorKernels.sadPred16(srcY, y0 * st.pw + x0,
          st.pw, predTmp, 0, 16, 16, bound)
      var s = 0L
      var r = 0
      while (r < 16) {
        val sb = (y0 + r) * st.pw + x0
        val pb = r * 16
        var c = 0
        while (c < 16) {
          val d = (srcY(sb + c) & 0xff) - predTmp(pb + c)
          s += (if (d < 0) -d else d)
          c += 1
        }
        if (s >= bound) return s
        r += 1
      }
      s
    }
    var hy = if (halfPel) -2 else 4
    while (hy <= 2) {
      var hx = -2
      while (hx <= 2) {
        if ((hx != 0 || hy != 0) && (hx % 4 != 0 || hy % 4 != 0)) {
          val s = sadInterp(bestDx * 4 + hx, bestDy * 4 + hy, best)
          if (s < best) { best = s; mvx = bestDx * 4 + hx; mvy = bestDy * 4 + hy }
        }
        hx += 2
      }
      hy += 2
    }
    // quarter-pel refinement around the sub-pel winner (strict
    // improvement only, so cheap zero-motion skip paths survive ties)
    if (halfPel && quarterPel) {
      val cx = mvx; val cy = mvy
      var qy = -1
      while (qy <= 1) {
        var qx = -1
        while (qx <= 1) {
          if (qx != 0 || qy != 0) {
            val s = sadInterp(cx + qx, cy + qy, best)
            if (s < best) { best = s; mvx = cx + qx; mvy = cy + qy }
          }
          qx += 1
        }
        qy += 1
      }
    }
    val predL = new Array[Int](256)
    mcLuma(ref, mbX, mbY, mvx, mvy, predL)
    val predCb = new Array[Int](64)
    val predCr = new Array[Int](64)
    mcChroma(ref.reconCb, st.cw, st.ch, mbX, mbY, mvx, mvy, predCb)
    mcChroma(ref.reconCr, st.cw, st.ch, mbX, mbY, mvx, mvy, predCr)
    // under explicit WP the residual codes against the WEIGHTED
    // prediction — the same transform reconstruction will apply (the
    // integer-pel MV search above stays unweighted: a global fade is a
    // monotone sample map, so the SAD argmin is essentially unchanged)
    if (wp != null) {
      wp.applyLuma(0, wpRef, predL, 0, 0, 16, 16)
      wp.applyChroma(0, wpRef, 0, predCb, 0, 0, 8, 8)
      wp.applyChroma(0, wpRef, 1, predCr, 0, 0, 8, 8)
    }
    val mc = interCoeffsFromPred(st, mbX, mbY, qp, srcY, srcCb, srcCr,
      predL, predCb, predCr)
    (mvx, mvy, mc, best)
  }

  /** Inter residual construction for one 16x16 MB against ARBITRARY
    * prediction buffers (single-list MC or the bi-predictive average):
    * forward transform + quant per 4x4 block with the code-vs-zero
    * distortion gate, chroma DC/AC split — the entropy-independent
    * analysis tail shared by the P path and every B-candidate. Returns
    * null when nothing codes (cbp == 0).
    */
  private def interCoeffsFromPred(st: PicState, mbX: Int, mbY: Int, qp: Int,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      predL: Array[Int], predCb: Array[Int], predCr: Array[Int]): PMbCoeffs = {
    val x0 = mbX * 16; val y0 = mbY * 16
    val qpc = chromaQp(qp)
    val mc = new PMbCoeffs
    val b = new Array[Int](16)
    var lumaBits = 0
    var blk = 0
    while (blk < 16) {
      val bx0 = blkX(blk) * 4; val by0 = blkY(blk) * 4
      var r = 0
      while (r < 4) {
        var c = 0
        while (c < 4) {
          b(r * 4 + c) = (srcY((y0 + by0 + r) * st.pw + x0 + bx0 + c) & 0xff) -
            predL((by0 + r) * 16 + bx0 + c)
          c += 1
        }
        r += 1
      }
      // keep the SPATIAL residual for the coded-vs-zero distortion test
      var ssdZero = 0L
      var i = 0
      val spatial = new Array[Int](16)
      while (i < 16) { spatial(i) = b(i); ssdZero += b(i).toLong * b(i); i += 1 }
      forward4x4(b)
      var any = false
      var zi = 0
      while (zi < 16) {
        val pos = zigzag4x4(zi)
        val z = st.scal.qAc(b(pos), qp, pos, LInterY)
        mc.lumaZig(blk)(zi) = z
        if (z != 0) any = true
        zi += 1
      }
      // Coefficient thresholding: drop a coded block whose reconstruction
      // is NOT strictly closer to the source than coding nothing. At the
      // quantizer deadzone a tiny residual can quantize to levels whose
      // reconstruction overshoots — coding it wastes bits AND makes the
      // next frame's residual nonzero again (a stable code/skip
      // oscillation on static content: measured 28-52 B/frame of
      // ping-pong before this gate). Zero-coding such a block converges
      // the closed loop to whole-picture skips.
      if (any) {
        val w = new Array[Int](16)
        zi = 0
        while (zi < 16) {
          val pos = zigzag4x4(zi)
          w(pos) = st.scal.deqAc(mc.lumaZig(blk)(zi), qp, pos, LInterY)
          zi += 1
        }
        inverse4x4(w)
        var ssdCoded = 0L
        i = 0
        while (i < 16) {
          val d = spatial(i) - w(i)
          ssdCoded += d.toLong * d
          i += 1
        }
        if (ssdCoded >= ssdZero) {
          java.util.Arrays.fill(mc.lumaZig(blk), 0)
          any = false
        }
      }
      if (any) lumaBits |= 1 << (blk / 4)
      blk += 1
    }
    var anyChromaAc = false
    var anyChromaDc = false
    def chroma(src: Array[Byte], predC: Array[Int], dcZig: Array[Int],
        acZig: Array[Array[Int]], list: Int): Unit = {
      val cx0 = mbX * 8; val cy0 = mbY * 8
      val dc = new Array[Int](4)
      var cb = 0
      while (cb < 4) {
        val bx = cb % 2; val by = cb / 2
        var r = 0
        while (r < 4) {
          var c = 0
          while (c < 4) {
            b(r * 4 + c) = (src((cy0 + by * 4 + r) * st.cw + cx0 + bx * 4 + c) & 0xff) -
              predC((by * 4 + r) * 8 + bx * 4 + c)
            c += 1
          }
          r += 1
        }
        forward4x4(b)
        dc(by * 2 + bx) = b(0)
        var zi = 1
        while (zi < 16) {
          val pos = zigzag4x4(zi)
          val z = st.scal.qAc(b(pos), qpc, pos, list)
          acZig(cb)(zi - 1) = z
          if (z != 0) anyChromaAc = true
          zi += 1
        }
        cb += 1
      }
      hadamard2x2(dc)
      var k = 0
      while (k < 4) {
        dcZig(k) = st.scal.qChromaDc(dc(k), qpc, list)
        if (dcZig(k) != 0) anyChromaDc = true
        k += 1
      }
    }
    chroma(srcCb, predCb, mc.cbDcZig, mc.cbAcZig, LInterCb)
    chroma(srcCr, predCr, mc.crDcZig, mc.crAcZig, LInterCr)
    val cbpChroma = if (anyChromaAc) 2 else if (anyChromaDc) 1 else 0
    mc.cbp = lumaBits | (cbpChroma << 4)
    if (mc.cbp == 0) null else mc
  }

  /** per-MB reference selection over the L0 list: full motion analysis
    * against each candidate reference, lowest luma SAD wins with a small
    * fixed penalty per ref_idx step (the ~1-2 extra header bits), ties
    * to the lower index so single-reference content still produces
    * all-refIdx-0 (and therefore skip-eligible) streams. Entropy-layer
    * independent, so CAVLC and CABAC multiRef stores stay pixel-equal.
    */
  private def choosePMb(st: PicState, refs: IndexedSeq[PicState],
      mbX: Int, mbY: Int, qp: Int, srcY: Array[Byte], srcCb: Array[Byte],
      srcCr: Array[Byte], range: Int, halfPel: Boolean,
      quarterPel: Boolean, wp: WpCtx = null): (Int, Int, Int, PMbCoeffs, Long) = {
    var bestRef = 0
    var bestRes: (Int, Int, PMbCoeffs, Long) = null
    var r = 0
    while (r < refs.length) {
      val cand = analysePMb(st, refs(r), mbX, mbY, qp, srcY, srcCb, srcCr,
        range, halfPel, quarterPel, wp, wpRef = r)
      if (bestRes == null || cand._4 + 16L * r < bestRes._4 + 16L * bestRef) {
        bestRes = cand; bestRef = r
      }
      r += 1
    }
    (bestRef, bestRes._1, bestRes._2, bestRes._3, bestRes._4)
  }

  /** Motion search for one w x h luma block at absolute pixel (px, py):
    * full integer search in [-range, range]^2 with early-exit SAD, then
    * half- and quarter-pel refinement over the interpolated prediction —
    * the block-size-generic core of analysePMb's search, for partition
    * candidates. Returns (mvx, mvy, sad) in quarter-pel units. */
  private def searchBlock(st: PicState, ref: PicState, px: Int, py: Int,
      w: Int, h: Int, srcY: Array[Byte], range: Int, halfPel: Boolean,
      quarterPel: Boolean): (Int, Int, Long) = {
    val refPlane = ref.reconY
    def sad(dx: Int, dy: Int, bound: Long): Long = {
      val rx0 = px + dx; val ry0 = py + dy
      var s = 0L
      if (rx0 >= 0 && ry0 >= 0 && rx0 + w <= ref.pw && ry0 + h <= ref.ph) {
        if (Simd.enabled && w == 16)
          return graft.simd.VectorKernels.sadByte16(srcY, py * st.pw + px,
            st.pw, refPlane, ry0 * ref.pw + rx0, ref.pw, h, bound)
        if (Simd.enabled && w == 8)
          return graft.simd.VectorKernels.sadByte8(srcY, py * st.pw + px,
            st.pw, refPlane, ry0 * ref.pw + rx0, ref.pw, h, bound)
        var r = 0
        while (r < h) {
          val sb = (py + r) * st.pw + px
          val rb = (ry0 + r) * ref.pw + rx0
          var c = 0
          while (c < w) {
            val d = (srcY(sb + c) & 0xff) - (refPlane(rb + c) & 0xff)
            s += (if (d < 0) -d else d)
            c += 1
          }
          if (s >= bound) return s
          r += 1
        }
      } else {
        var r = 0
        while (r < h) {
          val sb = (py + r) * st.pw + px
          var c = 0
          while (c < w) {
            val d = (srcY(sb + c) & 0xff) -
              refSample(refPlane, ref.pw, ref.ph, rx0 + c, ry0 + r)
            s += (if (d < 0) -d else d)
            c += 1
          }
          if (s >= bound) return s
          r += 1
        }
      }
      s
    }
    var bestDx = 0; var bestDy = 0
    var best = sad(0, 0, Long.MaxValue)
    var dy = -range
    while (dy <= range) {
      var dx = -range
      while (dx <= range) {
        if (dx != 0 || dy != 0) {
          val s = sad(dx, dy, best)
          if (s < best) { best = s; bestDx = dx; bestDy = dy }
        }
        dx += 1
      }
      dy += 1
    }
    var mvx = bestDx * 4; var mvy = bestDy * 4
    val predTmp = new Array[Int](256)
    def sadInterp(qx: Int, qy: Int, bound: Long): Long = {
      mcLumaBlk(ref, px, py, w, h, qx, qy, predTmp, 0, 0)
      if (Simd.enabled && w == 16)
        return graft.simd.VectorKernels.sadPred16(srcY, py * st.pw + px,
          st.pw, predTmp, 0, 16, h, bound)
      if (Simd.enabled && w == 8)
        return graft.simd.VectorKernels.sadPred8(srcY, py * st.pw + px,
          st.pw, predTmp, 0, 16, h, bound)
      var s = 0L
      var r = 0
      while (r < h) {
        val sb = (py + r) * st.pw + px
        val pb = r * 16
        var c = 0
        while (c < w) {
          val d = (srcY(sb + c) & 0xff) - predTmp(pb + c)
          s += (if (d < 0) -d else d)
          c += 1
        }
        if (s >= bound) return s
        r += 1
      }
      s
    }
    var hy = if (halfPel) -2 else 4
    while (hy <= 2) {
      var hx = -2
      while (hx <= 2) {
        if ((hx != 0 || hy != 0) && (hx % 4 != 0 || hy % 4 != 0)) {
          val s = sadInterp(bestDx * 4 + hx, bestDy * 4 + hy, best)
          if (s < best) { best = s; mvx = bestDx * 4 + hx; mvy = bestDy * 4 + hy }
        }
        hx += 2
      }
      hy += 2
    }
    if (halfPel && quarterPel) {
      val cx = mvx; val cy = mvy
      var qy = -1
      while (qy <= 1) {
        var qx = -1
        while (qx <= 1) {
          if (qx != 0 || qy != 0) {
            val s = sadInterp(cx + qx, cy + qy, best)
            if (s < best) { best = s; mvx = cx + qx; mvy = cy + qy }
          }
          qx += 1
        }
        qy += 1
      }
    }
    (mvx, mvy, best)
  }

  /** a partitioned P-MB candidate: Table 7-13 mb_type (1 16x8, 2 8x16,
    * 3 P_8x8 at sub-type 8x8), its partitions (refIdx 0), and the total
    * luma SAD + header-bit penalty it competes with */
  private final case class PPartsCand(mbType: Int, parts: IndexedSeq[InterPart],
      cost: Long)

  /** Partition-shape competition for one P MB against reference 0:
    * 16x8, 8x16, and 8x8 (sub-type 8x8 only — the emitted subset; the
    * decoder accepts 8x4/4x8/4x4 sub-partitions from external streams).
    * Costs carry a fixed per-extra-mvd-pair penalty (24 SAD units, the
    * same ballpark as the B-candidate header penalties) so flat motion
    * never fragments. */
  private def analysePParts(st: PicState, ref: PicState, mbX: Int, mbY: Int,
      srcY: Array[Byte], range: Int, halfPel: Boolean,
      quarterPel: Boolean): PPartsCand = {
    val x0 = mbX * 16; val y0 = mbY * 16
    def part(ox4: Int, oy4: Int, w4: Int, h4: Int): (InterPart, Long) = {
      val (mx, my, s) = searchBlock(st, ref, x0 + ox4 * 4, y0 + oy4 * 4,
        w4 * 4, h4 * 4, srcY, range, halfPel, quarterPel)
      (InterPart(ox4, oy4, w4, h4, 0, mx, my), s)
    }
    val h0 = part(0, 0, 4, 2); val h1 = part(0, 2, 4, 2)
    val v0 = part(0, 0, 2, 4); val v1 = part(2, 0, 2, 4)
    val q = IndexedSeq(part(0, 0, 2, 2), part(2, 0, 2, 2),
      part(0, 2, 2, 2), part(2, 2, 2, 2))
    val cands = Seq(
      PPartsCand(1, IndexedSeq(h0._1, h1._1), h0._2 + h1._2 + 24),
      PPartsCand(2, IndexedSeq(v0._1, v1._1), v0._2 + v1._2 + 24),
      PPartsCand(3, q.map(_._1), q.map(_._2).sum + 72))
    cands.minBy(_.cost)
  }

  /** a partitioned B-MB candidate: Table 7-14 type, the sub_mb_type
    * codes for B_8x8 (encoder subset: B_L0/L1/Bi_8x8 -> codes 1..3;
    * the decoder accepts every Table 7-18 shape from external streams),
    * parts in decode order with final MVs, and the comparable cost */
  private final case class BPartsCand(mbType: Int, subTypes: Array[Int],
      parts: IndexedSeq[InterPart], cost: Long)

  /** Partition-shape competition for one B MB: 16x8, 8x16, and B_8x8,
    * each partition independently picking L0 / L1 / Bi by luma SAD —
    * mixed pairs land on the full Table 7-14 two-partition space. The
    * bi candidate prices through the SAME assembled prediction
    * (implicit-WP included) reconstruction uses. Penalties mirror the
    * P competition (24 SAD units per mvd pair, 24/72 per shape). */
  private def analyseBParts(st: PicState, l0: IndexedSeq[PicState],
      l1: IndexedSeq[PicState], mbX: Int, mbY: Int, srcY: Array[Byte],
      range: Int, halfPel: Boolean, quarterPel: Boolean,
      wp: WpCtx): BPartsCand = {
    val x0 = mbX * 16; val y0 = mbY * 16
    def partSad(p: InterPart, pred: Array[Int]): Long = {
      var s = 0L
      var r = p.oy4 * 4
      while (r < (p.oy4 + p.h4) * 4) {
        var c = p.ox4 * 4
        while (c < (p.ox4 + p.w4) * 4) {
          s += math.abs((srcY((y0 + r) * st.pw + x0 + c) & 0xff) - pred(r * 16 + c))
          c += 1
        }
        r += 1
      }
      s
    }
    def best(ox4: Int, oy4: Int, w4: Int, h4: Int): (Int, InterPart, Long) = {
      val (m0x, m0y, s0) = searchBlock(st, l0(0), x0 + ox4 * 4, y0 + oy4 * 4,
        w4 * 4, h4 * 4, srcY, range, halfPel, quarterPel)
      val (m1x, m1y, s1) = searchBlock(st, l1(0), x0 + ox4 * 4, y0 + oy4 * 4,
        w4 * 4, h4 * 4, srcY, range, halfPel, quarterPel)
      val biPart = InterPart(ox4, oy4, w4, h4, 0, m0x, m0y, 0, m1x, m1y)
      val pL = new Array[Int](256)
      val pCb = new Array[Int](64); val pCr = new Array[Int](64)
      assembleInterPred(st, l0, l1, mbX, mbY, Seq(biPart), pL, pCb, pCr, wp)
      val sBi = partSad(biPart, pL)
      val c0 = s0 + 24; val c1 = s1 + 24; val cBi = sBi + 48
      if (c0 <= c1 && c0 <= cBi) (1, InterPart(ox4, oy4, w4, h4, 0, m0x, m0y), c0)
      else if (c1 <= cBi) (2, InterPart(ox4, oy4, w4, h4, -1, 0, 0, 0, m1x, m1y), c1)
      else (3, biPart, cBi)
    }
    val h = Seq(best(0, 0, 4, 2), best(0, 2, 4, 2))
    val v = Seq(best(0, 0, 2, 4), best(2, 0, 2, 4))
    val q = (0 until 4).map(i => best((i & 1) * 2, (i >> 1) * 2, 2, 2))
    val cands = Seq(
      BPartsCand(bTwoPartType(h(0)._1, h(1)._1, is16x8 = true), null,
        h.map(_._2).toIndexedSeq, h.map(_._3).sum + 24),
      BPartsCand(bTwoPartType(v(0)._1, v(1)._1, is16x8 = false), null,
        v.map(_._2).toIndexedSeq, v.map(_._3).sum + 24),
      BPartsCand(22, q.map(_._1).toArray, q.map(_._2).toIndexedSeq,
        q.map(_._3).sum + 72))
    cands.minBy(_.cost)
  }

  /** Luma SAD of an arbitrary 16x16 prediction buffer vs the source —
    * the comparable cost metric across B-MB candidates */
  private def predSad(st: PicState, mbX: Int, mbY: Int, srcY: Array[Byte],
      predL: Array[Int]): Long = {
    val x0 = mbX * 16; val y0 = mbY * 16
    if (Simd.enabled)
      return graft.simd.VectorKernels.sadPred16(srcY, y0 * st.pw + x0,
        st.pw, predL, 0, 16, 16, Long.MaxValue)
    var s = 0L
    var r = 0
    while (r < 16) {
      var c = 0
      while (c < 16) {
        s += math.abs((srcY((y0 + r) * st.pw + x0 + c) & 0xff) - predL(r * 16 + c))
        c += 1
      }
      r += 1
    }
    s
  }

  /** MC prediction buffers (luma + both chroma planes) for one list */
  private def mcPred(st: PicState, ref: PicState, mbX: Int, mbY: Int,
      mvx: Int, mvy: Int): (Array[Int], Array[Int], Array[Int]) = {
    val pL = new Array[Int](256)
    mcLuma(ref, mbX, mbY, mvx, mvy, pL)
    val pCb = new Array[Int](64)
    val pCr = new Array[Int](64)
    mcChroma(ref.reconCb, st.cw, st.ch, mbX, mbY, mvx, mvy, pCb)
    mcChroma(ref.reconCr, st.cw, st.ch, mbX, mbY, mvx, mvy, pCr)
    (pL, pCb, pCr)
  }

  @inline private def avgInPlace(a: Array[Int], b: Array[Int]): Unit = {
    var i = 0
    while (i < a.length) { a(i) = (a(i) + b(i) + 1) >> 1; i += 1 }
  }

  /** combine a (luma256, cb64, cr64) prediction pair into the first,
    * exactly as [[reconstructInterMb]] will: weighted bi (§8.4.2.3.2)
    * when the slice carries a WpCtx, the default rounded average
    * otherwise — the B analysis must price candidates with the SAME
    * combine or the closed loop breaks */
  private def biCombine(wp: WpCtx, ref0: Int, ref1: Int,
      p0: (Array[Int], Array[Int], Array[Int]),
      p1: (Array[Int], Array[Int], Array[Int])): Unit =
    if (wp == null) {
      avgInPlace(p0._1, p1._1); avgInPlace(p0._2, p1._2); avgInPlace(p0._3, p1._3)
    } else {
      wp.applyBi(ref0, ref1, luma = true, p0._1, p1._1, 0, 0, 16, 16, 16)
      wp.applyBi(ref0, ref1, luma = false, p0._2, p1._2, 0, 0, 8, 8, 8, plane = 0)
      wp.applyBi(ref0, ref1, luma = false, p0._3, p1._3, 0, 0, 8, 8, 8, plane = 1)
    }

  /** One chosen B macroblock: Table 7-14 mb_type (0 B_Direct_16x16,
    * 1 B_L0_16x16, 2 B_L1_16x16, 3 B_Bi_16x16), per-list refIdx/MV
    * (refIdx -1 = list unused; direct MBs carry their DERIVED motion so
    * reconstruction and deblocking state need no re-derivation), and the
    * residual (null = cbp 0 — a direct MB with null residual is B_Skip).
    */
  private final case class BMbChoice(mbType: Int, ref0: Int, ref1: Int,
      mv0x: Int, mv0y: Int, mv1x: Int, mv1y: Int, mc: PMbCoeffs,
      quad: Array[Int] = null, // non-null: per-quadrant direct motion
      parts: IndexedSeq[InterPart] = null, // non-null: sub-16x16 partitions
      subTypes: Array[Int] = null) // B_8x8 sub_mb_type codes

  /** BMbChoice for a direct/skip MB from the spatial-direct derivation:
    * uniform quadrants take the plain 16x16 path (bit-exact with the
    * pre-partition decoder); divergent quadrants (a partitioned
    * colocated picture) carry the per-quadrant motion */
  private def directBChoice(dm: DirectMv, mc: PMbCoeffs): BMbChoice =
    BMbChoice(0, dm.ref0, dm.ref1, dm.quad(0), dm.quad(1), dm.quad(2), dm.quad(3),
      mc, if (dm.uniform) null else dm.quad)

  /** B-MB mode decision: full motion analysis per list, the averaged
    * bi-candidate from the two winners, and the spatial-direct candidate
    * — lowest prediction SAD wins with fixed header-bit penalties
    * (direct 0, single-list 24, bi 48), ties to the cheaper header so
    * static content still collapses to B_Skip runs. Entropy-independent,
    * so CAVLC and CABAC B stores stay pixel-equal.
    */
  private def chooseBMb(st: PicState, l0: IndexedSeq[PicState],
      l1: IndexedSeq[PicState], mbX: Int, mbY: Int, qp: Int,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      range: Int, halfPel: Boolean, quarterPel: Boolean,
      spatialDirect: Boolean = true, wp: WpCtx = null,
      tryParts: Boolean = false): BMbChoice = {
    // direct candidate (its mc builds from the derived motion; the
    // slice header's direct flag picks the derivation)
    val dm = deriveDirect(st, l0, l1, mbX, mbY, spatialDirect)
    val (dr0, dr1) = (dm.ref0, dm.ref1)
    val (d0x, d0y, d1x, d1y) = (dm.quad(0), dm.quad(1), dm.quad(2), dm.quad(3))
    val (dL, dCb, dCr) = {
      if (!dm.uniform) {
        // partitioned colocated picture: assemble the per-quadrant
        // direct prediction exactly as reconstruction will
        val pL = new Array[Int](256)
        val pCb = new Array[Int](64); val pCr = new Array[Int](64)
        val parts = (0 until 4).map(q => InterPart((q & 1) * 2, (q >> 1) * 2, 2, 2,
          dr0, dm.quad(q * 4), dm.quad(q * 4 + 1),
          dr1, dm.quad(q * 4 + 2), dm.quad(q * 4 + 3)))
        assembleInterPred(st, l0, l1, mbX, mbY, parts, pL, pCb, pCr, wp)
        (pL, pCb, pCr)
      } else if (dr0 >= 0 && dr1 >= 0) {
        val p0 = mcPred(st, l0(dr0), mbX, mbY, d0x, d0y)
        val p1 = mcPred(st, l1(dr1), mbX, mbY, d1x, d1y)
        biCombine(wp, dr0, dr1, p0, p1)
        p0
      } else if (dr0 >= 0) mcPred(st, l0(dr0), mbX, mbY, d0x, d0y)
      else mcPred(st, l1(dr1), mbX, mbY, d1x, d1y)
    }
    val dSad = predSad(st, mbX, mbY, srcY, dL)
    // per-list motion analyses (refIdx fixed 0: B lists are 1-deep here)
    val (m0x, m0y, mc0, sad0) = analysePMb(st, l0(0), mbX, mbY, qp, srcY,
      srcCb, srcCr, range, halfPel, quarterPel)
    val (m1x, m1y, mc1, sad1) = analysePMb(st, l1(0), mbX, mbY, qp, srcY,
      srcCb, srcCr, range, halfPel, quarterPel)
    // bi candidate: the two single-list winners combined exactly as
    // reconstruction will (implicit weights when the slice carries them)
    val (bL, bCb, bCr) = {
      val p0 = mcPred(st, l0(0), mbX, mbY, m0x, m0y)
      val p1 = mcPred(st, l1(0), mbX, mbY, m1x, m1y)
      biCombine(wp, 0, 0, p0, p1)
      p0
    }
    val bSad = predSad(st, mbX, mbY, srcY, bL)
    // fixed header-bit penalties; evaluation order breaks ties cheapest-first
    val costs = Array(dSad, sad0 + 24, sad1 + 24, bSad + 48)
    var bestI = 0
    var i = 1
    while (i < 4) { if (costs(i) < costs(bestI)) bestI = i; i += 1 }
    if (tryParts) {
      // sub-16x16 competition: a partitioned candidate must beat the
      // best 16x16 candidate to fragment (same stance as the P tier)
      val pc = analyseBParts(st, l0, l1, mbX, mbY, srcY, range, halfPel,
        quarterPel, wp)
      if (pc.cost < costs(bestI))
        return BMbChoice(pc.mbType, -1, -1, 0, 0, 0, 0, null,
          parts = pc.parts, subTypes = pc.subTypes)
    }
    bestI match {
      case 0 =>
        val mc = interCoeffsFromPred(st, mbX, mbY, qp, srcY, srcCb, srcCr,
          dL, dCb, dCr)
        directBChoice(dm, mc)
      case 1 => BMbChoice(1, 0, -1, m0x, m0y, 0, 0, mc0)
      case 2 => BMbChoice(2, -1, 0, 0, 0, m1x, m1y, mc1)
      case _ =>
        val mc = interCoeffsFromPred(st, mbX, mbY, qp, srcY, srcCb, srcCr,
          bL, bCb, bCr)
        BMbChoice(3, 0, 0, m0x, m0y, m1x, m1y, mc)
    }
  }

  /** reconstruct one chosen/parsed B MB (shared by encoder and decoder);
    * per-quadrant direct motion (ch.quad != null — the colocated picture
    * was partitioned) takes the partitioned path */
  private def reconstructBMb(st: PicState, l0: IndexedSeq[PicState],
      l1: IndexedSeq[PicState], mbX: Int, mbY: Int, qp: Int,
      ch: BMbChoice, wp: WpCtx = null): Unit =
    if (ch.quad == null)
      reconstructInterMb(st, mbX, mbY, qp,
        if (ch.ref0 >= 0) l0(ch.ref0) else null, ch.ref0, ch.mv0x, ch.mv0y,
        if (ch.ref1 >= 0) l1(ch.ref1) else null, ch.ref1, ch.mv1x, ch.mv1y,
        ch.mc, wp)
    else {
      val parts = (0 until 4).map { q =>
        val p = InterPart((q & 1) * 2, (q >> 1) * 2, 2, 2,
          ch.ref0, ch.quad(q * 4), ch.quad(q * 4 + 1),
          ch.ref1, ch.quad(q * 4 + 2), ch.quad(q * 4 + 3))
        st.setMotion4(mbX * 4 + p.ox4, mbY * 4 + p.oy4, 2, 2,
          p.ref0, p.mv0x, p.mv0y, p.ref1, p.mv1x, p.mv1y,
          if (p.ref0 >= 0) l0(p.ref0).poc else 0)
        p
      }
      reconstructInterParts(st, l0, l1, mbX, mbY, qp, parts, ch.mc, wp)
    }

  /** the B-slice macroblock loop (CAVLC): B_Skip runs via mb_skip_run,
    * Table 7-14 16x16 types, per-list mvd against the per-list §8.4.1.3
    * predictor; list actives are 1/1 so no ref_idx bits appear (te(v)
    * with cMax 0 codes nothing)
    */
  private def encodeBRange(st: PicState, l0: IndexedSeq[PicState],
      l1: IndexedSeq[PicState], bw: H264Writer.BitWriter,
      qp: Int, srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      searchRange: Int, halfPel: Boolean, quarterPel: Boolean,
      startMb: Int, endMb: Int, spatialDirect: Boolean = true,
      wp: WpCtx = null, tryParts: Boolean = false): Unit = {
    val mbW = st.mbW
    var skipRun = 0
    var mb = startMb
    while (mb < endMb) {
      val mbX = mb % mbW; val mbY = mb / mbW
      st.sliceOfMb(mb) = st.curSlice
      val ch = chooseBMb(st, l0, l1, mbX, mbY, qp, srcY, srcCb, srcCr,
        searchRange, halfPel, quarterPel, spatialDirect, wp, tryParts)
      if (ch.mbType == 0) directBCount.incrementAndGet()
      if (ch.mbType == 0 && ch.mc == null) { // B_Skip
        skipRun += 1
        clearNz(st, mbX, mbY)
        reconstructBMb(st, l0, l1, mbX, mbY, qp, ch, wp)
      } else if (ch.parts != null) {
        bw.ue(skipRun); skipRun = 0
        writeBPartsMb(bw, st, l0, l1, mbX, mbY, qp, ch, srcY, srcCb, srcCr, wp)
      } else {
        bw.ue(skipRun); skipRun = 0
        bw.ue(ch.mbType)
        // ref_idx_lX: cMax 0 at 1-deep lists -> no bits
        if (ch.ref0 >= 0 && ch.mbType != 0) {
          val (px, py) = predictMv(st, mbX, mbY, ch.ref0, list = 0)
          bw.se(ch.mv0x - px); bw.se(ch.mv0y - py)
        }
        if (ch.ref1 >= 0 && ch.mbType != 0) {
          val (px, py) = predictMv(st, mbX, mbY, ch.ref1, list = 1)
          bw.se(ch.mv1x - px); bw.se(ch.mv1y - py)
        }
        val cbp = if (ch.mc == null) 0 else ch.mc.cbp
        bw.ue(cbpInterToCode(cbp))
        if (cbp != 0) {
          bw.se(0) // mb_qp_delta
          // reconstruct FIRST: writePResidual updates the nC grids the
          // next MB reads, while reconstruction only needs pixels + MVs
        }
        reconstructBMb(st, l0, l1, mbX, mbY, qp, ch, wp)
        if (cbp != 0) writePResidual(bw, st, mbX, mbY, ch.mc)
        else clearNz(st, mbX, mbY)
      }
      mb += 1
    }
    if (skipRun > 0) bw.ue(skipRun)
  }

  /** write one coded P MB (P_L0_16x16) + CAVLC residuals, with nC and MV
    * bookkeeping shared with the parser
    */
  private def writePMb(bw: H264Writer.BitWriter, st: PicState, mbX: Int, mbY: Int,
      mvx: Int, mvy: Int, mc: PMbCoeffs, numRefActive: Int = 1,
      refIdx: Int = 0, qpDelta: Int = 0): Unit = {
    bw.ue(0) // mb_type: P_L0_16x16
    // ref_idx_l0, te(v) with cMax = numRefActive - 1 (§9.1.1: a single
    // INVERTED bit at cMax 1, plain ue above)
    if (numRefActive > 1) {
      if (numRefActive == 2) bw.u1(1 - refIdx)
      else bw.ue(refIdx)
    }
    val (px, py) = predictMv(st, mbX, mbY, refIdx)
    bw.se(mvx - px)
    bw.se(mvy - py)
    val cbp = if (mc == null) 0 else mc.cbp
    bw.ue(cbpInterToCode(cbp))
    if (cbp != 0) {
      bw.se(qpDelta) // mb_qp_delta
      if (qpDelta != 0) aqpDeltaCount.incrementAndGet()
      writePResidual(bw, st, mbX, mbY, mc)
    } else clearNz(st, mbX, mbY)
  }

  /** write one partitioned P MB (CAVLC): mb_type, sub_mb_types (P_8x8 at
    * sub-type 8x8), te(0) ref bits when the slice codes >1 active ref,
    * per-partition mvd against the sequenced §8.4.1.3 predictor, then
    * cbp + residual from the assembled prediction; reconstructs in place.
    * State evolution (sentinel, motion, nz) mirrors the decoder exactly.
    */
  private def writePPartsMb(bw: H264Writer.BitWriter, st: PicState,
      refs: IndexedSeq[PicState], mbX: Int, mbY: Int, qp: Int,
      cand: PPartsCand, numRefActive: Int,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      wp: WpCtx = null): Unit = {
    partMbCount.incrementAndGet()
    bw.ue(cand.mbType)
    if (cand.mbType == 3) { var i = 0; while (i < 4) { bw.ue(0); i += 1 } }
    if (numRefActive > 1) {
      val nSlots = if (cand.mbType == 3) 4 else 2
      var k = 0
      // te(v) of refIdx 0: inverted single bit at cMax 1, ue(0) above
      while (k < nSlots) { if (numRefActive == 2) bw.u1(1) else bw.ue(0); k += 1 }
    }
    st.beginPartitionedMb(mbX, mbY)
    cand.parts.foreach { p =>
      val bx4 = mbX * 4 + p.ox4; val by4 = mbY * 4 + p.oy4
      val (px, py) = predictMvPart(st, bx4, by4, p.w4, p.h4, 0, 0)
      bw.se(p.mv0x - px); bw.se(p.mv0y - py)
      st.setMotion4(bx4, by4, p.w4, p.h4, 0, p.mv0x, p.mv0y, -1, 0, 0, refs(0).poc)
    }
    val predL = new Array[Int](256)
    val predCb = new Array[Int](64); val predCr = new Array[Int](64)
    assembleInterPred(st, refs, refs, mbX, mbY, cand.parts, predL, predCb,
      predCr, wp)
    val mc = interCoeffsFromPred(st, mbX, mbY, qp, srcY, srcCb, srcCr,
      predL, predCb, predCr)
    val cbp = if (mc == null) 0 else mc.cbp
    bw.ue(cbpInterToCode(cbp))
    if (cbp != 0) bw.se(0) // mb_qp_delta
    reconstructInterParts(st, refs, refs, mbX, mbY, qp, cand.parts, mc, wp)
    if (cbp != 0) writePResidual(bw, st, mbX, mbY, mc)
    else clearNz(st, mbX, mbY)
  }

  /** derive the mvds of a partitioned B MB in partition order (the
    * §8.4.1.3 predictors sample every earlier partition's FINAL motion,
    * both lists) and record the motion state — shared by both
    * entropy-layer writers, which then emit the mvds list-major */
  private def deriveBPartMvds(st: PicState, l0: IndexedSeq[PicState],
      mbX: Int, mbY: Int, parts: IndexedSeq[InterPart])
      : IndexedSeq[((Int, Int), (Int, Int))] = {
    st.beginPartitionedMb(mbX, mbY)
    parts.map { p =>
      val bx4 = mbX * 4 + p.ox4; val by4 = mbY * 4 + p.oy4
      var d0 = (0, 0); var d1 = (0, 0)
      if (p.ref0 >= 0) {
        val (px, py) = predictMvPart(st, bx4, by4, p.w4, p.h4, 0, 0)
        d0 = (p.mv0x - px, p.mv0y - py)
      }
      if (p.ref1 >= 0) {
        val (px, py) = predictMvPart(st, bx4, by4, p.w4, p.h4, 0, 1)
        d1 = (p.mv1x - px, p.mv1y - py)
      }
      st.setMotion4(bx4, by4, p.w4, p.h4, p.ref0, p.mv0x, p.mv0y,
        p.ref1, p.mv1x, p.mv1y, if (p.ref0 >= 0) l0(0).poc else 0)
      (d0, d1)
    }
  }

  /** write one partitioned B MB (CAVLC): mb_type, sub_mb_types (B_8x8),
    * mvds in §7.3.5.1 list-major order, then cbp + residual from the
    * assembled two-list prediction; reconstructs in place */
  private def writeBPartsMb(bw: H264Writer.BitWriter, st: PicState,
      l0: IndexedSeq[PicState], l1: IndexedSeq[PicState], mbX: Int, mbY: Int,
      qp: Int, ch: BMbChoice, srcY: Array[Byte], srcCb: Array[Byte],
      srcCr: Array[Byte], wp: WpCtx): Unit = {
    bPartMbCount.incrementAndGet()
    bw.ue(ch.mbType)
    if (ch.mbType == 22) ch.subTypes.foreach(t => bw.ue(t))
    // ref_idx_lX: te(v) cMax 0 at the 1-deep lists -> no bits
    val mvds = deriveBPartMvds(st, l0, mbX, mbY, ch.parts)
    ch.parts.zip(mvds).foreach { case (p, (d0, _)) =>
      if (p.ref0 >= 0) { bw.se(d0._1); bw.se(d0._2) }
    }
    ch.parts.zip(mvds).foreach { case (p, (_, d1)) =>
      if (p.ref1 >= 0) { bw.se(d1._1); bw.se(d1._2) }
    }
    val predL = new Array[Int](256)
    val predCb = new Array[Int](64); val predCr = new Array[Int](64)
    assembleInterPred(st, l0, l1, mbX, mbY, ch.parts, predL, predCb, predCr, wp)
    val mc = interCoeffsFromPred(st, mbX, mbY, qp, srcY, srcCb, srcCr,
      predL, predCb, predCr)
    val cbp = if (mc == null) 0 else mc.cbp
    bw.ue(cbpInterToCode(cbp))
    if (cbp != 0) bw.se(0) // mb_qp_delta
    reconstructInterParts(st, l0, l1, mbX, mbY, qp, ch.parts, mc, wp)
    if (cbp != 0) writePResidual(bw, st, mbX, mbY, mc)
    else clearNz(st, mbX, mbY)
  }

  private def writePResidual(bw: H264Writer.BitWriter, st: PicState,
      mbX: Int, mbY: Int, mc: PMbCoeffs): Unit = {
    val bX = mbX * 4; val bY = mbY * 4
    var blk = 0
    while (blk < 16) {
      val ax = bX + blkX(blk); val ay = bY + blkY(blk)
      val tc =
        if (((mc.cbpLuma >> (blk / 4)) & 1) != 0)
          H264Cavlc.writeBlock(bw, mc.lumaZig(blk), st.nC(st.nzY, st.bw4, ax, ay))
        else 0
      st.nzY(ay * st.bw4 + ax) = tc
      blk += 1
    }
    writeChromaResidual(bw, st, mbX, mbY, mc)
  }

  /** the chroma half of the CAVLC residual writer (DC always when
    * cbpChroma != 0, AC only at cbpChroma == 2) — shared by the P/I4
    * path and the Intra_8x8 luma writer
    */
  private def writeChromaResidual(bw: H264Writer.BitWriter, st: PicState,
      mbX: Int, mbY: Int, mc: PMbCoeffs): Unit = {
    if (mc.cbpChroma != 0) {
      H264Cavlc.writeBlock(bw, mc.cbDcZig, -1)
      H264Cavlc.writeBlock(bw, mc.crDcZig, -1)
    }
    val cX = mbX * 2; val cY = mbY * 2
    def chromaAc(nz: Array[Int], acZig: Array[Array[Int]]): Unit = {
      var cb = 0
      while (cb < 4) {
        val ax = cX + cb % 2; val ay = cY + cb / 2
        val tc =
          if (mc.cbpChroma == 2)
            H264Cavlc.writeBlock(bw, acZig(cb), st.nC(nz, st.cbw4, ax, ay))
          else 0
        nz(ay * st.cbw4 + ax) = tc
        cb += 1
      }
    }
    chromaAc(st.nzCb, mc.cbAcZig)
    chromaAc(st.nzCr, mc.crAcZig)
  }

  // ------------------------------------------------ CABAC slice coding
  //
  // The entropy-independent layers (analyse*, reconstruct*, deblocking)
  // are shared with CAVLC; only the bitstream read/write differs — which
  // is why CabacSpec can assert CABAC-decoded pixels equal CAVLC-decoded
  // pixels bit for bit. Context-increment derivations follow §9.3.3.1
  // (neighbor-driven), with two documented repo-local choices: uniform
  // context INIT (see [[H264Cabac]]'s scaladoc — the spec's (m, n)
  // tables were not available offline) and condTermFlag = 0 for
  // unavailable neighbors everywhere (the spec special-cases intra MBs
  // to 1 for some elements). Both choices are symmetric between this
  // encoder and decoder; both are marked by the stream's SEI.

  /** context-bank layout (one [[H264Cabac.Contexts]] per slice) */
  private object CabacCtx {
    val MbTypeI = 0 // + inc 0..2
    val MbTypeICbpLuma = 3
    val MbTypeICbpChroma0 = 4
    val MbTypeICbpChroma1 = 5
    val MbTypeIPred0 = 6
    val MbTypeIPred1 = 7
    val Skip = 8 // + inc 0..2
    val PMbType = 11 // bins 0..2
    val QpDelta = 14 // bin0 + 0/1, bin1 + 2, rest + 3
    val ChromaMode = 18 // bin0 + inc 0..2, bins > 0 at 21
    val CbpLuma = 22 // + inc 0..3
    val CbpChroma0 = 26 // + inc 0..3
    val CbpChroma1 = 30 // + inc 0..3
    val Mvd = 34 // x at 34 (bin0 +0..2, bins 1.. at 37..40), y at 41
    val Cbf = 48 // + cat*4 + inc 0..3
    val Sig = 68 // + sigBase(cat) + pos
    val Last = 134 // + sigBase(cat) + pos
    val AbsLevel = 200 // + cat*10 + inc 0..9
    val PrevI4x4 = 250 // prev_intra4x4_pred_mode_flag
    val RemI4x4 = 251  // rem_intra4x4_pred_mode (3 FL bins, one ctx)
    // ---- ctxBlockCat 5 (luma 8x8, High + CABAC) ----
    // transform_size_8x8_flag: inc 0..2 by neighbor flags (§9.3.3.1.1.10,
    // derivational). Sig/Last position->context BUCKETS are REPO-LOCAL
    // (min(pos>>2,14) / min(pos>>3,8)): the spec's Table 9-43 mapping is
    // published DATA this offline container has no copy of — same honesty
    // call as the 9.3.1.1 init tables, and the stream's SEI marks it. A
    // self-consistent bucketing round-trips exactly; only cross-decoder
    // interop (already void under uniform init) would notice.
    val Trans8 = 252    // + inc 0..2
    val Sig8 = 255      // + bucket 0..14 (63 coded positions)
    val Last8 = 270     // + bucket 0..8
    val AbsLevel8 = 279 // + inc 0..9 (same §9.3.3.1.3 derivation as cats 0-4)
    // ref_idx_l0 (Table 9-39 ctxIdxOffset 54 block): unary bins — bin 0
    // ctx by §9.3.3.1.1.6 neighbor derivation (inc 0..3), bin 1 at +4,
    // bins >= 2 at +5
    val RefIdx = 289    // + inc 0..5
    // B-slice blocks (Table 9-37 binarization): mb_type bin0 at +0..2
    // (condTermFlagN = neighbor coded and not B_Skip/B_Direct), bin1 at
    // +3, bin2 at +4 when the prior bin was 0 / +5 when 1 (§9.3.3.1.2),
    // bins >= 3 at +5; mb_skip_flag gets its own 3-slot block (the
    // spec's 24..26, distinct from P's 11..13)
    val BMbType = 295   // + 0..5
    val BSkip = 301     // + inc 0..2
    // P sub_mb_type (Table 9-38 binarization: 8x8 '1', 8x4 '00',
    // 4x8 '011', 4x4 '010'): bins 0/1/2 get one slot each (the spec's
    // ctxIdxOffset-21 block)
    val SubMbType = 304 // + bin 0..2
    // B sub_mb_type (Table 9-38 B column): bin0/1/2 one slot each, bins
    // >= 3 share the fourth (the spec's ctxIdxOffset-36 block shape)
    val BSubMbType = 307 // + 0..3
    val N = 311
    // block categories: 0 LumaDC(16) 1 LumaAC(15) 2 Luma4x4(16)
    // 3 ChromaDC(4) 4 ChromaAC(15); 5 Luma8x8(64) handled out-of-band
    val sigBase: Array[Int] = Array(0, 16, 31, 47, 51)
    val maxCoeff: Array[Int] = Array(16, 15, 16, 4, 15)
    @inline def sig8Bucket(p: Int): Int = math.min(p >> 2, 14)
    @inline def last8Bucket(p: Int): Int = math.min(p >> 3, 8)
  }

  /** context-bank size, for tests that build synthetic init tables (a
    * table must cover every slot — Contexts.init refuses partial ones) */
  private[graft] def cabacContextSlots: Int = CabacCtx.N

  /** test hook: every Table 9-37 B mb_type (0..22) and Table 9-38 B
    * sub_mb_type (0..12) through the CABAC binarization pair — the
    * encoder subset only emits a few of these, so the spec pins the
    * whole tree symmetric without hand-arithmetic-coding streams */
  private[graft] def cabacBTypeRoundtripForTest(): Boolean = {
    val bw = new H264Writer.BitWriter
    bw.alignOne()
    val e = new H264Cabac.Encoder(bw)
    val cx = new H264Cabac.Contexts(CabacCtx.N)
    (0 to 22).foreach(t => cabacWriteBMbType(e, cx, 0, t))
    (0 to 12).foreach(t => cabacWriteBSubType(e, cx, t))
    e.encodeTerminate(1)
    e.flush()
    bw.alignZero()
    val r = new H264.BitReader(bw.rbspBytes())
    r.align()
    val d = new H264Cabac.Decoder(r)
    val cx2 = new H264Cabac.Contexts(CabacCtx.N)
    (0 to 22).forall(t => cabacReadBMbType(d, cx2, 0) == t) &&
      (0 to 12).forall(t => cabacReadBSubType(d, cx2) == t)
  }

  /** Per-slice neighbor state for context increments — maintained
    * IDENTICALLY by the encoder and the decoder as macroblocks complete
    * (that symmetry is the whole correctness argument). Neighbor
    * availability rides [[PicState.mbAvail]], so cross-slice neighbors
    * are excluded exactly like the CAVLC nC contexts.
    */
  private final class CabacMbState(st: PicState) {
    private val n = st.mbW * st.mbH
    val skip = new Array[Boolean](n)
    val cbp = new Array[Int](n) // luma | chroma << 4 (0 for skip)
    val isIntra = new Array[Boolean](n)
    val chromaModeNz = new Array[Boolean](n)
    // per-4x4-block mvd accumulators (§9.3.3.1.1.7 sums the NEIGHBOUR
    // PARTITION's mvd per component — block granularity since round 14's
    // sub-16x16 partitions; a 16x16 MB fills its 16 cells uniformly so
    // pre-partition streams keep identical context increments)
    private val n4 = st.bw4 * st.mbH * 4
    val mvdX = new Array[Int](n4)
    val mvdY = new Array[Int](n4)
    // list-1 mvd accumulators (B slices): §9.3.3.1.1.7 sums the SAME
    // list's neighbor mvd per component
    val mvdXL1 = new Array[Int](n4)
    val mvdYL1 = new Array[Int](n4)
    /** record a partition's coded mvd into its 4x4 cells */
    def setMvd(bx4: Int, by4: Int, w4: Int, h4: Int, dx: Int, dy: Int,
        list: Int = 0): Unit = {
      val (ax, ay) = if (list == 0) (mvdX, mvdY) else (mvdXL1, mvdYL1)
      var y = by4
      while (y < by4 + h4) {
        var x = bx4
        while (x < bx4 + w4) {
          ax(y * st.bw4 + x) = dx; ay(y * st.bw4 + x) = dy
          x += 1
        }
        y += 1
      }
    }
    // B_Direct_16x16 marker (mb_type bin-0 condTerm excludes direct MBs)
    val directB = new Array[Boolean](n)
    val lumaDcNz = new Array[Boolean](n)
    val cbDcNz = new Array[Boolean](n)
    val crDcNz = new Array[Boolean](n)
    var lastQpDeltaNz = false
    // whether THIS MB coded an mb_qp_delta element (set by the qp-delta
    // coders); §9.3.3.1.1.5 conditions the next delta's bin-0 context on
    // the PREVIOUS MB's value, and an MB without the element (skip, cbp
    // 0) infers delta 0 — endMb() folds that inference into the state
    var qpDeltaCodedThisMb = false
    /** close one MB's qp-delta context state (call once per MB, after
      * its syntax elements, on BOTH coder sides) */
    def endMb(): Unit = {
      if (!qpDeltaCodedThisMb) lastQpDeltaNz = false
      qpDeltaCodedThisMb = false
    }

    @inline private def mi(x: Int, y: Int) = y * st.mbW + x
    @inline private def a(mbX: Int, mbY: Int): Int =
      if (st.mbAvail(mbX - 1, mbY)) mi(mbX - 1, mbY) else -1
    @inline private def b(mbX: Int, mbY: Int): Int =
      if (st.mbAvail(mbX, mbY - 1)) mi(mbX, mbY - 1) else -1

    def incMbTypeI(mbX: Int, mbY: Int): Int = {
      val ia = a(mbX, mbY); val ib = b(mbX, mbY)
      (if (ia >= 0 && isIntra(ia)) 1 else 0) + (if (ib >= 0 && isIntra(ib)) 1 else 0)
    }
    def incSkip(mbX: Int, mbY: Int): Int = {
      val ia = a(mbX, mbY); val ib = b(mbX, mbY)
      (if (ia >= 0 && !skip(ia)) 1 else 0) + (if (ib >= 0 && !skip(ib)) 1 else 0)
    }
    def incChromaMode(mbX: Int, mbY: Int): Int = {
      val ia = a(mbX, mbY); val ib = b(mbX, mbY)
      (if (ia >= 0 && isIntra(ia) && chromaModeNz(ia)) 1 else 0) +
        (if (ib >= 0 && isIntra(ib) && chromaModeNz(ib)) 1 else 0)
    }
    def incQpDelta: Int = if (lastQpDeltaNz) 1 else 0
    /** transform_size_8x8_flag inc: neighbor flags (§9.3.3.1.1.10) */
    def incTrans8(mbX: Int, mbY: Int): Int = {
      val ia = a(mbX, mbY); val ib = b(mbX, mbY)
      (if (ia >= 0 && st.trans8(ia)) 1 else 0) +
        (if (ib >= 0 && st.trans8(ib)) 1 else 0)
    }
    /** cbp-luma bin for 8x8 block b8 (z-order): condTerm = neighbor 8x8
      * cbp bit == 0 (skipped neighbors have cbp 0 → condTerm 1)
      */
    def incCbpLuma(mbX: Int, mbY: Int, b8: Int, curBits: Int): Int = {
      val bx = b8 & 1; val by = b8 >> 1
      val condA =
        if (bx == 1) (if ((curBits >> (b8 - 1) & 1) == 0) 1 else 0)
        else {
          val ia = a(mbX, mbY)
          if (ia < 0) 0 else if ((cbp(ia) >> (b8 + 1) & 1) == 0) 1 else 0
        }
      val condB =
        if (by == 1) (if ((curBits >> (b8 - 2) & 1) == 0) 1 else 0)
        else {
          val ib = b(mbX, mbY)
          if (ib < 0) 0 else if ((cbp(ib) >> (b8 + 2) & 1) == 0) 1 else 0
        }
      condA + 2 * condB
    }
    def incCbpChroma(mbX: Int, mbY: Int, bin: Int): Int = {
      val ia = a(mbX, mbY); val ib = b(mbX, mbY)
      def cond(i: Int): Int =
        if (i < 0) 0
        else {
          val cc = cbp(i) >> 4
          if (bin == 0) (if (cc != 0) 1 else 0) else (if (cc == 2) 1 else 0)
        }
      cond(ia) + 2 * cond(ib)
    }
    /** ref_idx_l0 bin-0 inc (§9.3.3.1.1.6): condTermFlagN = 1 iff the
      * neighbor is available, inter, and its refIdxL0 > 0 (skip MBs
      * carry refIdx 0, intra/uncoded -1 — both condTerm 0)
      */
    /** ref_idx_l0 bin-0 inc at PARTITION granularity (§9.3.3.1.1.6):
      * condTermFlagN = 1 iff the neighbour block (left of / above the
      * partition's top-left 4x4) is available, inter, and its refIdxL0
      * > 0 (skip blocks carry refIdx 0, intra/uncoded -1 — condTerm 0)
      */
    def incRefIdx(bx4: Int, by4: Int, list: Int = 0): Int = {
      val arr = if (list == 0) st.ref4 else st.ref4L1
      (if (st.avail4(bx4 - 1, by4) && arr(by4 * st.bw4 + bx4 - 1) > 0) 1 else 0) +
        (if (st.avail4(bx4, by4 - 1) && arr((by4 - 1) * st.bw4 + bx4) > 0) 2 else 0)
    }
    /** mvd component inc: |mvd| sum over the partition's A/B neighbour
      * blocks, same list (§9.3.3.1.1.7) */
    def incMvd(bx4: Int, by4: Int, yComp: Boolean, list: Int = 0): Int = {
      val arr =
        if (list == 0) { if (yComp) mvdY else mvdX }
        else { if (yComp) mvdYL1 else mvdXL1 }
      val s = (if (st.avail4(bx4 - 1, by4)) math.abs(arr(by4 * st.bw4 + bx4 - 1)) else 0) +
        (if (st.avail4(bx4, by4 - 1)) math.abs(arr((by4 - 1) * st.bw4 + bx4)) else 0)
      if (s < 3) 0 else if (s <= 32) 1 else 2
    }
    /** B mb_type bin-0 inc: condTermFlagN = 1 iff the neighbor is
      * available and coded as neither B_Skip nor B_Direct_16x16 */
    def incBMbType(mbX: Int, mbY: Int): Int = {
      val ia = a(mbX, mbY); val ib = b(mbX, mbY)
      (if (ia >= 0 && !skip(ia) && !directB(ia)) 1 else 0) +
        (if (ib >= 0 && !skip(ib) && !directB(ib)) 1 else 0)
    }
    /** coded_block_flag inc = condA + 2*condB over same-category
      * neighbor blocks; DC flags are per-MB, AC/4x4 flags read the nz
      * grids (count > 0) at block coordinates
      */
    def incCbfDc(mbX: Int, mbY: Int, flags: Array[Boolean]): Int = {
      val ia = a(mbX, mbY); val ib = b(mbX, mbY)
      (if (ia >= 0 && flags(ia)) 1 else 0) + (if (ib >= 0 && flags(ib)) 2 else 0)
    }
    def incCbf4x4(nz: Array[Int], rowW: Int, blkPerMb: Int, bx: Int, by: Int): Int = {
      val condA =
        if (bx > 0 && st.mbAvail((bx - 1) / blkPerMb, by / blkPerMb) &&
            nz(by * rowW + bx - 1) > 0) 1 else 0
      val condB =
        if (by > 0 && st.mbAvail(bx / blkPerMb, (by - 1) / blkPerMb) &&
            nz((by - 1) * rowW + bx) > 0) 1 else 0
      condA + 2 * condB
    }
  }

  /** §9.3.2.3-style residual block, encode side: coded_block_flag +
    * sig/last maps + reverse-order UEG0 levels. Returns the nonzero
    * count (the nz bookkeeping value, same semantics as CAVLC
    * TotalCoeff).
    */
  private def cabacWriteBlock(e: H264Cabac.Encoder, cx: H264Cabac.Contexts,
      cat: Int, cbfInc: Int, coeffs: Array[Int], maxN: Int): Int = {
    var total = 0
    var lastIdx = -1
    var i = 0
    while (i < maxN) {
      if (coeffs(i) != 0) { total += 1; lastIdx = i }
      i += 1
    }
    // cat 5 (luma 8x8, 4:2:0) carries NO coded_block_flag: the spec
    // infers it from the cbp bit (maxNumCoeff == 64), so the caller only
    // invokes the block coder for coded 8x8 blocks
    if (cat != 5) {
      e.encodeBin(cx, CabacCtx.Cbf + cat * 4 + cbfInc, if (total > 0) 1 else 0)
      if (total == 0) return 0
    } else require(total > 0,
      "cat-5 block with zero coefficients must be skipped via its cbp bit")
    @inline def sigPos(p: Int): Int = if (cat == 3) math.min(p, 2) else p
    @inline def sigCtx(p: Int): Int =
      if (cat == 5) CabacCtx.Sig8 + CabacCtx.sig8Bucket(p)
      else CabacCtx.Sig + CabacCtx.sigBase(cat) + sigPos(p)
    @inline def lastCtx(p: Int): Int =
      if (cat == 5) CabacCtx.Last8 + CabacCtx.last8Bucket(p)
      else CabacCtx.Last + CabacCtx.sigBase(cat) + sigPos(p)
    val lvlBase = if (cat == 5) CabacCtx.AbsLevel8 else CabacCtx.AbsLevel + cat * 10
    i = 0
    var done = false
    while (i < maxN - 1 && !done) {
      val sig = coeffs(i) != 0
      e.encodeBin(cx, sigCtx(i), if (sig) 1 else 0)
      if (sig) {
        e.encodeBin(cx, lastCtx(i), if (i == lastIdx) 1 else 0)
        if (i == lastIdx) done = true
      }
      i += 1
    }
    // if the loop ran out, position maxN-1 is the implied last significant
    var numGt1 = 0
    var numEq1 = 0
    i = lastIdx
    while (i >= 0) {
      val c = coeffs(i)
      if (c != 0) {
        val absM1 = math.abs(c) - 1
        val bin0Inc = if (numGt1 != 0) 0 else math.min(4, 1 + numEq1)
        H264Cabac.encodeTU(e, cx, math.min(absM1, 14), 14,
          b => lvlBase + (if (b == 0) bin0Inc else 5 + math.min(4, numGt1)))
        if (absM1 >= 14) H264Cabac.encodeEGkSuffix(e, absM1 - 14, 0)
        e.encodeBypass(if (c < 0) 1 else 0)
        if (math.abs(c) > 1) numGt1 += 1 else numEq1 += 1
      }
      i -= 1
    }
    total
  }

  /** residual block, decode side — fills `out` (zig order), returns the
    * nonzero count */
  private def cabacReadBlock(d: H264Cabac.Decoder, cx: H264Cabac.Contexts,
      cat: Int, cbfInc: Int, out: Array[Int], maxN: Int): Int = {
    java.util.Arrays.fill(out, 0, maxN, 0)
    // cat 5: no coded_block_flag (see the write side)
    if (cat != 5 && d.decodeBin(cx, CabacCtx.Cbf + cat * 4 + cbfInc) == 0) return 0
    @inline def sigPos(p: Int): Int = if (cat == 3) math.min(p, 2) else p
    @inline def sigCtx(p: Int): Int =
      if (cat == 5) CabacCtx.Sig8 + CabacCtx.sig8Bucket(p)
      else CabacCtx.Sig + CabacCtx.sigBase(cat) + sigPos(p)
    @inline def lastCtx(p: Int): Int =
      if (cat == 5) CabacCtx.Last8 + CabacCtx.last8Bucket(p)
      else CabacCtx.Last + CabacCtx.sigBase(cat) + sigPos(p)
    val lvlBase = if (cat == 5) CabacCtx.AbsLevel8 else CabacCtx.AbsLevel + cat * 10
    val sig = mcScratch.get().sig64
    java.util.Arrays.fill(sig, 0, maxN, false)
    var lastIdx = -1
    var i = 0
    var done = false
    while (i < maxN - 1 && !done) {
      if (d.decodeBin(cx, sigCtx(i)) == 1) {
        sig(i) = true
        if (d.decodeBin(cx, lastCtx(i)) == 1) {
          lastIdx = i
          done = true
        }
      }
      i += 1
    }
    if (!done) { sig(maxN - 1) = true; lastIdx = maxN - 1 }
    var total = 0
    var numGt1 = 0
    var numEq1 = 0
    i = lastIdx
    while (i >= 0) {
      if (sig(i)) {
        val bin0Inc = if (numGt1 != 0) 0 else math.min(4, 1 + numEq1)
        // TU prefix (cMax 14), inlined: bin 0 on the eq1-ladder context,
        // bins 1+ sharing the gt1-ladder context (closure-free hot loop)
        var absM1 = 0
        if (d.decodeBin(cx, lvlBase + bin0Inc) == 1) {
          val ctxRest = lvlBase + 5 + math.min(4, numGt1)
          absM1 = 1
          while (absM1 < 14 && d.decodeBin(cx, ctxRest) == 1) absM1 += 1
        }
        if (absM1 == 14) absM1 += H264Cabac.decodeEGkSuffix(d, 0)
        val mag = absM1 + 1
        out(i) = if (d.decodeBypass() == 1) -mag else mag
        total += 1
        if (mag > 1) numGt1 += 1 else numEq1 += 1
      }
      i -= 1
    }
    total
  }

  /** mvd component: UEG3, TU prefix cMax 9 (bin0 ctx by neighbor |mvd|
    * sum, bins 1..4 ladder, 5+ share), EG3 bypass suffix, bypass sign
    */
  private def cabacWriteMvd(e: H264Cabac.Encoder, cx: H264Cabac.Contexts,
      base: Int, inc0: Int, v: Int): Unit = {
    val mag = math.abs(v)
    H264Cabac.encodeTU(e, cx, math.min(mag, 9), 9,
      b => base + (if (b == 0) inc0 else 3 + math.min(b - 1, 3)))
    if (mag >= 9) H264Cabac.encodeEGkSuffix(e, mag - 9, 3)
    if (mag != 0) e.encodeBypass(if (v < 0) 1 else 0)
  }

  private def cabacReadMvd(d: H264Cabac.Decoder, cx: H264Cabac.Contexts,
      base: Int, inc0: Int): Int = {
    var mag = H264Cabac.decodeTU(d, cx, 9,
      b => base + (if (b == 0) inc0 else 3 + math.min(b - 1, 3)))
    if (mag == 9) mag += H264Cabac.decodeEGkSuffix(d, 3)
    if (mag == 0) 0
    else if (d.decodeBypass() == 1) -mag
    else mag
  }

  /** mb_qp_delta, CABAC decode side: unary binarization of the §9.3.2.7
    * signed mapping (k odd -> +(k+1)/2, k even -> -k/2), bin 0's context
    * conditioned on the previous MB's delta being nonzero
    * (§9.3.3.1.1.5), bin 1 at +2, bins >= 2 at +3. Updates the
    * lastQpDeltaNz context state symmetrically with the encoder.
    */
  private def cabacReadQpDelta(d: H264Cabac.Decoder, cx: H264Cabac.Contexts,
      cms: CabacMbState): Int = {
    var k = 0
    while (d.decodeBin(cx, CabacCtx.QpDelta +
        (if (k == 0) cms.incQpDelta else if (k == 1) 2 else 3)) == 1) {
      k += 1
      require(k <= 52, "mb_qp_delta unary code overruns the signed range")
    }
    cms.lastQpDeltaNz = k != 0
    cms.qpDeltaCodedThisMb = true
    if ((k & 1) == 1) (k + 1) / 2 else -(k / 2)
  }

  /** mb_qp_delta, CABAC encode side (mirror of [[cabacReadQpDelta]]) */
  private def cabacWriteQpDelta(e: H264Cabac.Encoder, cx: H264Cabac.Contexts,
      cms: CabacMbState, delta: Int): Unit = {
    val k = if (delta > 0) 2 * delta - 1 else -2 * delta
    var i = 0
    while (i < k) {
      e.encodeBin(cx, CabacCtx.QpDelta +
        (if (i == 0) cms.incQpDelta else if (i == 1) 2 else 3), 1)
      i += 1
    }
    e.encodeBin(cx, CabacCtx.QpDelta +
      (if (k == 0) cms.incQpDelta else if (k == 1) 2 else 3), 0)
    cms.lastQpDeltaNz = delta != 0
    cms.qpDeltaCodedThisMb = true
    if (delta != 0) aqpDeltaCount.incrementAndGet()
  }

  /** intra_chroma_pred_mode, CABAC decode side: TU cMax 3 — bin 0's
    * context from the §9.3.3.1.1.8 neighbour derivation, bins 1..2 share
    * the +3 slot. Records the per-MB nonzero-mode flag the neighbour
    * contexts read.
    */
  private def cabacReadChromaMode(d: H264Cabac.Decoder, cx: H264Cabac.Contexts,
      cms: CabacMbState, st: PicState, mbX: Int, mbY: Int): Int = {
    val mode =
      if (d.decodeBin(cx, CabacCtx.ChromaMode + cms.incChromaMode(mbX, mbY)) == 0) 0
      else if (d.decodeBin(cx, CabacCtx.ChromaMode + 3) == 0) 1
      else if (d.decodeBin(cx, CabacCtx.ChromaMode + 3) == 0) 2
      else 3
    cms.chromaModeNz(mbY * st.mbW + mbX) = mode != 0
    mode
  }

  /** intra_chroma_pred_mode, CABAC encode side (mirror of
    * [[cabacReadChromaMode]]) */
  private def cabacWriteChromaMode(e: H264Cabac.Encoder, cx: H264Cabac.Contexts,
      cms: CabacMbState, st: PicState, mbX: Int, mbY: Int, mode: Int): Unit = {
    e.encodeBin(cx, CabacCtx.ChromaMode + cms.incChromaMode(mbX, mbY),
      if (mode == 0) 0 else 1)
    if (mode > 0) {
      e.encodeBin(cx, CabacCtx.ChromaMode + 3, if (mode == 1) 0 else 1)
      if (mode > 1)
        e.encodeBin(cx, CabacCtx.ChromaMode + 3, if (mode == 2) 0 else 1)
    }
    cms.chromaModeNz(mbY * st.mbW + mbX) = mode != 0
  }

  /** the shared I16 residual order (luma DC, luma AC x16, chroma DC Cb/Cr,
    * chroma AC x8) for both CABAC directions — `rw` abstracts the block
    * coder so write and read cannot drift
    */
  private def cabacResidualI16(st: PicState, cms: CabacMbState, mbX: Int, mbY: Int,
      mc: MbCoeffs,
      rw: (Int, Int, Array[Int], Int) => Int): Unit = {
    val mi = mbY * st.mbW + mbX
    val bX = mbX * 4; val bY = mbY * 4
    val dcNz = rw(0, cms.incCbfDc(mbX, mbY, cms.lumaDcNz), mc.lumaDcZig, 16)
    cms.lumaDcNz(mi) = dcNz > 0
    var blk = 0
    while (blk < 16) {
      val ax = bX + blkX(blk); val ay = bY + blkY(blk)
      val tc =
        if (mc.cbpLuma != 0)
          rw(1, cms.incCbf4x4(st.nzY, st.bw4, 4, ax, ay), mc.lumaAcZig(blk), 15)
        else 0
      st.nzY(ay * st.bw4 + ax) = tc
      blk += 1
    }
    if (mc.cbpChroma != 0) {
      cms.cbDcNz(mi) = rw(3, cms.incCbfDc(mbX, mbY, cms.cbDcNz), mc.cbDcZig, 4) > 0
      cms.crDcNz(mi) = rw(3, cms.incCbfDc(mbX, mbY, cms.crDcNz), mc.crDcZig, 4) > 0
    }
    val cX = mbX * 2; val cY = mbY * 2
    def chromaAc(nz: Array[Int], acZig: Array[Array[Int]]): Unit = {
      var cb = 0
      while (cb < 4) {
        val ax = cX + cb % 2; val ay = cY + cb / 2
        val tc =
          if (mc.cbpChroma == 2)
            rw(4, cms.incCbf4x4(nz, st.cbw4, 2, ax, ay), acZig(cb), 15)
          else 0
        nz(ay * st.cbw4 + ax) = tc
        cb += 1
      }
    }
    chromaAc(st.nzCb, mc.cbAcZig)
    chromaAc(st.nzCr, mc.crAcZig)
  }

  /** P-MB residual order (luma 4x4 x16 gated by 8x8 cbp bits, chroma DC,
    * chroma AC), shared shape for both directions
    */
  private def cabacResidualP(st: PicState, cms: CabacMbState, mbX: Int, mbY: Int,
      mc: PMbCoeffs,
      rw: (Int, Int, Array[Int], Int) => Int): Unit = {
    val mi = mbY * st.mbW + mbX
    val bX = mbX * 4; val bY = mbY * 4
    var blk = 0
    while (blk < 16) {
      val ax = bX + blkX(blk); val ay = bY + blkY(blk)
      val tc =
        if (((mc.cbpLuma >> (blk / 4)) & 1) != 0)
          rw(2, cms.incCbf4x4(st.nzY, st.bw4, 4, ax, ay), mc.lumaZig(blk), 16)
        else 0
      st.nzY(ay * st.bw4 + ax) = tc
      blk += 1
    }
    if (mc.cbpChroma != 0) {
      cms.cbDcNz(mi) = rw(3, cms.incCbfDc(mbX, mbY, cms.cbDcNz), mc.cbDcZig, 4) > 0
      cms.crDcNz(mi) = rw(3, cms.incCbfDc(mbX, mbY, cms.crDcNz), mc.crDcZig, 4) > 0
    }
    val cX = mbX * 2; val cY = mbY * 2
    def chromaAc(nz: Array[Int], acZig: Array[Array[Int]]): Unit = {
      var cb = 0
      while (cb < 4) {
        val ax = cX + cb % 2; val ay = cY + cb / 2
        val tc =
          if (mc.cbpChroma == 2)
            rw(4, cms.incCbf4x4(nz, st.cbw4, 2, ax, ay), acZig(cb), 15)
          else 0
        nz(ay * st.cbw4 + ax) = tc
        cb += 1
      }
    }
    chromaAc(st.nzCb, mc.cbAcZig)
    chromaAc(st.nzCr, mc.crAcZig)
  }

  /** Intra_8x8 residual order under CABAC: four cbp-gated cat-5 64-coeff
    * luma blocks (no coded_block_flag — inferred from cbp at 4:2:0), then
    * chroma DC/AC identical to the P/I4 shape; shared by both directions.
    * nz bookkeeping mirrors the CAVLC interleaved sub-block counts
    * EXACTLY, so deblock strengths (and later MBs' cbf contexts) cannot
    * drift between entropy modes.
    */
  private def cabacResidualI8(st: PicState, cms: CabacMbState, mbX: Int, mbY: Int,
      zig8: Array[Array[Int]], mc: PMbCoeffs,
      rw: (Int, Int, Array[Int], Int) => Int): Unit = {
    val mi = mbY * st.mbW + mbX
    var b = 0
    while (b < 4) {
      if (((mc.cbpLuma >> b) & 1) != 0) rw(5, 0, zig8(b), 64)
      b += 1
    }
    i8NzCounts(st, mbX, mbY, mc.cbpLuma, zig8)
    if (mc.cbpChroma != 0) {
      cms.cbDcNz(mi) = rw(3, cms.incCbfDc(mbX, mbY, cms.cbDcNz), mc.cbDcZig, 4) > 0
      cms.crDcNz(mi) = rw(3, cms.incCbfDc(mbX, mbY, cms.crDcNz), mc.crDcZig, 4) > 0
    }
    val cX = mbX * 2; val cY = mbY * 2
    def chromaAc(nz: Array[Int], acZig: Array[Array[Int]]): Unit = {
      var cb = 0
      while (cb < 4) {
        val ax = cX + cb % 2; val ay = cY + cb / 2
        val tc =
          if (mc.cbpChroma == 2)
            rw(4, cms.incCbf4x4(nz, st.cbw4, 2, ax, ay), acZig(cb), 15)
          else 0
        nz(ay * st.cbw4 + ax) = tc
        cb += 1
      }
    }
    chromaAc(st.nzCb, mc.cbAcZig)
    chromaAc(st.nzCr, mc.crAcZig)
  }

  /** per-4x4-cell nonzero counts of an 8x8-transform MB via the same
    * interleaved decomposition the CAVLC I8 writer uses (sub-block i
    * carries zig positions 4k + i) — keeps nzY identical across entropy
    * modes */
  private def i8NzCounts(st: PicState, mbX: Int, mbY: Int, cbpLuma: Int,
      zig8: Array[Array[Int]]): Unit = {
    val bX = mbX * 4; val bY = mbY * 4
    var b = 0
    while (b < 4) {
      var i = 0
      while (i < 4) {
        val ax = bX + (b % 2) * 2 + i % 2
        val ay = bY + (b / 2) * 2 + i / 2
        var tc = 0
        if (((cbpLuma >> b) & 1) != 0) {
          var k = 0
          while (k < 16) { if (zig8(b)(4 * k + i) != 0) tc += 1; k += 1 }
        }
        st.nzY(ay * st.bw4 + ax) = tc
        i += 1
      }
      b += 1
    }
  }

  /** the CABAC I-slice macroblock loop over [startMb, endMb) */
  private def encodeIRangeCabac(st: PicState, bw: H264Writer.BitWriter, qp: Int,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      startMb: Int, endMb: Int, t8: Boolean = false,
      aqp: Boolean = false, chromaModes: Boolean = false): Unit = {
    bw.alignOne() // cabac_alignment_one_bit
    val e = new H264Cabac.Encoder(bw)
    val cx = new H264Cabac.Contexts(CabacCtx.N)
    H264Cabac.initTables.foreach(t => cx.init(t.i, qp))
    val cms = new CabacMbState(st)
    // running decoder-visible QP (§7.4.5): advances only where a delta is
    // actually coded — an I_NxN MB with cbp 0 carries no delta, so its
    // deblock QP stays at the running value, not the analysis target
    var qpCur = qp
    var mb = startMb
    while (mb < endMb) {
      val mbX = mb % st.mbW; val mbY = mb / st.mbW
      val mi = mbY * st.mbW + mbX
      st.sliceOfMb(mb) = st.curSlice
      val qpT = if (aqp) aqpTarget(qp, srcY, st.pw, mbX, mbY) else qp
      // shared cbp coder for the I_NxN branches (I4 and I8 use the same
      // contexts: cbp luma bits are per 8x8 group in both)
      def encodeCbp(cbp: Int): Unit = {
        var b8 = 0
        var bitsSoFar = 0
        while (b8 < 4) {
          val bit = (cbp >> b8) & 1
          e.encodeBin(cx, CabacCtx.CbpLuma + cms.incCbpLuma(mbX, mbY, b8, bitsSoFar), bit)
          bitsSoFar |= bit << b8
          b8 += 1
        }
        val cbpC = cbp >> 4
        e.encodeBin(cx, CabacCtx.CbpChroma0 + cms.incCbpChroma(mbX, mbY, 0),
          if (cbpC != 0) 1 else 0)
        if (cbpC != 0)
          e.encodeBin(cx, CabacCtx.CbpChroma1 + cms.incCbpChroma(mbX, mbY, 1),
            if (cbpC == 2) 1 else 0)
      }
      tryIntraNxN(st, mbX, mbY, qpT, srcY, srcCb, srcCr, allow8 = t8,
          chromaModes = chromaModes) match {
        case IntraSel.I4(modes, m4) =>
          // mb_type I_NxN: single bin 0
          e.encodeBin(cx, CabacCtx.MbTypeI + cms.incMbTypeI(mbX, mbY), 0)
          // transform_size_8x8_flag = 0 (present only under a t8 PPS)
          if (t8) e.encodeBin(cx, CabacCtx.Trans8 + cms.incTrans8(mbX, mbY), 0)
          var blk = 0
          while (blk < 16) {
            val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
            val pm = predI4Mode(st, bx, by)
            if (modes(blk) == pm) e.encodeBin(cx, CabacCtx.PrevI4x4, 1)
            else {
              e.encodeBin(cx, CabacCtx.PrevI4x4, 0)
              val rem = if (modes(blk) < pm) modes(blk) else modes(blk) - 1
              e.encodeBin(cx, CabacCtx.RemI4x4, (rem >> 2) & 1)
              e.encodeBin(cx, CabacCtx.RemI4x4, (rem >> 1) & 1)
              e.encodeBin(cx, CabacCtx.RemI4x4, rem & 1)
            }
            blk += 1
          }
          cabacWriteChromaMode(e, cx, cms, st, mbX, mbY, m4.chromaMode)
          encodeCbp(m4.cbp)
          cms.isIntra(mi) = true
          cms.cbp(mi) = m4.cbp
          if (m4.cbp != 0) {
            cabacWriteQpDelta(e, cx, cms, qpT - qpCur)
            qpCur = qpT
            cabacResidualP(st, cms, mbX, mbY, m4,
              (cat, inc, coeffs, maxN) => cabacWriteBlock(e, cx, cat, inc, coeffs, maxN))
          } else {
            clearNz(st, mbX, mbY)
            st.mbQp(mi) = qpCur // no delta coded: decoder stays at qpCur
          }
          // recon already in place (closed-loop analysis)
        case IntraSel.I8(modes8, zig8, m8) =>
          // mb_type I_NxN + transform_size_8x8_flag = 1 (Intra_8x8)
          e.encodeBin(cx, CabacCtx.MbTypeI + cms.incMbTypeI(mbX, mbY), 0)
          e.encodeBin(cx, CabacCtx.Trans8 + cms.incTrans8(mbX, mbY), 1)
          var b = 0
          while (b < 4) {
            val bx = mbX * 4 + (b % 2) * 2; val by = mbY * 4 + (b / 2) * 2
            val pm = predI4Mode(st, bx, by)
            if (modes8(b) == pm) e.encodeBin(cx, CabacCtx.PrevI4x4, 1)
            else {
              e.encodeBin(cx, CabacCtx.PrevI4x4, 0)
              val rem = if (modes8(b) < pm) modes8(b) else modes8(b) - 1
              e.encodeBin(cx, CabacCtx.RemI4x4, (rem >> 2) & 1)
              e.encodeBin(cx, CabacCtx.RemI4x4, (rem >> 1) & 1)
              e.encodeBin(cx, CabacCtx.RemI4x4, rem & 1)
            }
            b += 1
          }
          cabacWriteChromaMode(e, cx, cms, st, mbX, mbY, m8.chromaMode)
          encodeCbp(m8.cbp)
          cms.isIntra(mi) = true
          cms.cbp(mi) = m8.cbp
          if (m8.cbp != 0) {
            cabacWriteQpDelta(e, cx, cms, qpT - qpCur)
            qpCur = qpT
            cabacResidualI8(st, cms, mbX, mbY, zig8, m8,
              (cat, inc, coeffs, maxN) => cabacWriteBlock(e, cx, cat, inc, coeffs, maxN))
          } else {
            clearNz(st, mbX, mbY)
            st.mbQp(mi) = qpCur
          }
          // recon already in place; st.trans8 set by tryIntraNxN
        case IntraSel.I16 =>
          // I16 mb_type carries no transform_size_8x8_flag (§7.3.5: the
          // flag follows mb_type only for I_NxN); its mb_qp_delta is
          // unconditional, so the running QP always lands on the target
          encodeI16Cabac(st, cms, e, cx, mbX, mbY, qpT, srcY, srcCb, srcCr,
            qpDelta = qpT - qpCur, chromaModes = chromaModes)
          qpCur = qpT
      }
      cms.endMb()
      mb += 1
      e.encodeTerminate(if (mb == endMb) 1 else 0)
    }
    e.flush() // emits the rbsp stop bit
    bw.alignZero()
  }

  /** the I16 half of the CABAC I-MB loop (pulled out so the I4
    * competition branch above stays readable) */
  private def encodeI16Cabac(st: PicState, cms: CabacMbState,
      e: H264Cabac.Encoder, cx: H264Cabac.Contexts, mbX: Int, mbY: Int,
      qp: Int, srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      qpDelta: Int = 0, chromaModes: Boolean = false): Unit = {
      val mi = mbY * st.mbW + mbX
      val mc = analyseMbI16(st, mbX, mbY, qp, srcY, srcCb, srcCr, chromaModes)
      // mb_type I16x16: not-I_NxN, not-I_PCM (terminate), cbp + pred DC
      e.encodeBin(cx, CabacCtx.MbTypeI + cms.incMbTypeI(mbX, mbY), 1)
      e.encodeTerminate(0)
      e.encodeBin(cx, CabacCtx.MbTypeICbpLuma, if (mc.cbpLuma == 15) 1 else 0)
      e.encodeBin(cx, CabacCtx.MbTypeICbpChroma0, if (mc.cbpChroma != 0) 1 else 0)
      if (mc.cbpChroma != 0)
        e.encodeBin(cx, CabacCtx.MbTypeICbpChroma1, if (mc.cbpChroma == 2) 1 else 0)
      // Intra_16x16 prediction mode, 2 FL bins MSB-first
      e.encodeBin(cx, CabacCtx.MbTypeIPred0, (mc.predMode >> 1) & 1)
      e.encodeBin(cx, CabacCtx.MbTypeIPred1, mc.predMode & 1)
      cabacWriteChromaMode(e, cx, cms, st, mbX, mbY, mc.chromaMode)
      cabacWriteQpDelta(e, cx, cms, qpDelta)
      cabacResidualI16(st, cms, mbX, mbY, mc,
        (cat, inc, coeffs, maxN) => cabacWriteBlock(e, cx, cat, inc, coeffs, maxN))
      cms.isIntra(mi) = true
      cms.cbp(mi) = mc.cbpLuma | (mc.cbpChroma << 4)
      reconstructMb(st, mbX, mbY, qp, mc)
  }

  /** the CABAC P-slice macroblock loop over [startMb, endMb) */
  private def encodePRangeCabac(st: PicState, refs: IndexedSeq[PicState],
      bw: H264Writer.BitWriter,
      qp: Int, srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      searchRange: Int, halfPel: Boolean, quarterPel: Boolean,
      startMb: Int, endMb: Int, numRefActive: Int = 1,
      parts: Boolean = false, wp: WpCtx = null,
      aqp: Boolean = false): Unit = {
    bw.alignOne()
    val e = new H264Cabac.Encoder(bw)
    val cx = new H264Cabac.Contexts(CabacCtx.N)
    H264Cabac.initTables.foreach(t => cx.init(t.p(0), qp)) // emitted idc = 0
    val cms = new CabacMbState(st)
    // running decoder-visible QP: advances only where a delta is coded
    // (skip and cbp-0 MBs carry none and deblock at the running value)
    var qpCur = qp
    var mb = startMb
    while (mb < endMb) {
      val mbX = mb % st.mbW; val mbY = mb / st.mbW
      val mi = mbY * st.mbW + mbX
      st.sliceOfMb(mb) = st.curSlice
      val qpT = if (aqp) aqpTarget(qp, srcY, st.pw, mbX, mbY) else qp
      val (refIdx, mvx, mvy, mc, sad16) =
        choosePMb(st, refs.take(numRefActive), mbX, mbY, qpT, srcY, srcCb,
          srcCr, searchRange, halfPel, quarterPel, wp)
      val cand =
        if (!parts) null
        else analysePParts(st, refs(0), mbX, mbY, srcY, searchRange,
          halfPel, quarterPel)
      val usePart = cand != null && cand.cost < sad16
      val interBest = if (usePart) cand.cost else sad16
      // bounded early-exit gate, decision-identical (see encodePRange)
      val useIntra = interBest > 1500 &&
        i16Beats(st, mbX, mbY, srcY, interBest - 96)
      val (sx, sy) = skipMv(st, mbX, mbY)
      if (useIntra) {
        e.encodeBin(cx, CabacCtx.Skip + cms.incSkip(mbX, mbY), 0)
        e.encodeBin(cx, CabacCtx.PMbType, 1) // Table 9-37 prefix: intra
        intraInPCount.incrementAndGet()
        encodeI16Cabac(st, cms, e, cx, mbX, mbY, qpT, srcY, srcCb, srcCr,
          qpDelta = qpT - qpCur)
        qpCur = qpT
      } else if (!usePart && refIdx == 0 && mc == null && mvx == sx && mvy == sy) {
        e.encodeBin(cx, CabacCtx.Skip + cms.incSkip(mbX, mbY), 1)
        cms.skip(mi) = true
        clearNz(st, mbX, mbY)
        reconstructPMb(st, refs(0), mbX, mbY, qpCur, mvx, mvy, null, wp = wp)
      } else if (usePart) {
        e.encodeBin(cx, CabacCtx.Skip + cms.incSkip(mbX, mbY), 0)
        writePPartsMbCabac(e, cx, cms, st, refs, mbX, mbY, qp, cand,
          numRefActive, srcY, srcCb, srcCr, wp)
      } else {
        e.encodeBin(cx, CabacCtx.Skip + cms.incSkip(mbX, mbY), 0)
        // mb_type P_L0_16x16: '000'
        e.encodeBin(cx, CabacCtx.PMbType, 0)
        e.encodeBin(cx, CabacCtx.PMbType + 1, 0)
        e.encodeBin(cx, CabacCtx.PMbType + 2, 0)
        // ref_idx_l0: unary bins (value k = k ones then a zero), bin 0
        // context by neighbor derivation, bin 1 at +4, bins >= 2 at +5
        if (numRefActive > 1) {
          var bin = 0
          while (bin < refIdx) {
            e.encodeBin(cx, CabacCtx.RefIdx + (if (bin == 0)
              cms.incRefIdx(mbX * 4, mbY * 4) else if (bin == 1) 4 else 5), 1)
            bin += 1
          }
          e.encodeBin(cx, CabacCtx.RefIdx + (if (refIdx == 0)
            cms.incRefIdx(mbX * 4, mbY * 4) else if (refIdx == 1) 4 else 5), 0)
        }
        val (px, py) = predictMv(st, mbX, mbY, refIdx)
        val mvdX = mvx - px; val mvdY = mvy - py
        cabacWriteMvd(e, cx, CabacCtx.Mvd, cms.incMvd(mbX * 4, mbY * 4, yComp = false), mvdX)
        cabacWriteMvd(e, cx, CabacCtx.Mvd + 7, cms.incMvd(mbX * 4, mbY * 4, yComp = true), mvdY)
        cms.setMvd(mbX * 4, mbY * 4, 4, 4, mvdX, mvdY)
        val cbp = if (mc == null) 0 else mc.cbp
        var b8 = 0
        var bitsSoFar = 0
        while (b8 < 4) {
          val bit = (cbp >> b8) & 1
          e.encodeBin(cx, CabacCtx.CbpLuma + cms.incCbpLuma(mbX, mbY, b8, bitsSoFar), bit)
          bitsSoFar |= bit << b8
          b8 += 1
        }
        val cbpChroma = cbp >> 4
        e.encodeBin(cx, CabacCtx.CbpChroma0 + cms.incCbpChroma(mbX, mbY, 0),
          if (cbpChroma != 0) 1 else 0)
        if (cbpChroma != 0)
          e.encodeBin(cx, CabacCtx.CbpChroma1 + cms.incCbpChroma(mbX, mbY, 1),
            if (cbpChroma == 2) 1 else 0)
        cms.cbp(mi) = cbp
        if (cbp != 0) {
          cabacWriteQpDelta(e, cx, cms, qpT - qpCur)
          qpCur = qpT
          cabacResidualP(st, cms, mbX, mbY, mc,
            (cat, inc, coeffs, maxN) => cabacWriteBlock(e, cx, cat, inc, coeffs, maxN))
        } else clearNz(st, mbX, mbY)
        // cbp 0: no delta was coded, so the decoder's QP stays qpCur
        reconstructPMb(st, refs(refIdx), mbX, mbY,
          if (mc != null) qpT else qpCur, mvx, mvy, mc, refIdx, wp)
      }
      cms.endMb()
      mb += 1
      e.encodeTerminate(if (mb == endMb) 1 else 0)
    }
    e.flush()
    bw.alignZero()
  }

  /** write one partitioned P MB (CABAC): Table 9-34 mb_type bins
    * ('011' 16x8, '010' 8x16, '001' P_8x8), sub_mb_type '1' bins
    * (8x8), ref_idx-0 terminator bins when >1 active ref, per-partition
    * mvd with block-granular contexts, cbp + residual — state evolution
    * identical to the decoder's partitioned branch */
  private def writePPartsMbCabac(e: H264Cabac.Encoder, cx: H264Cabac.Contexts,
      cms: CabacMbState, st: PicState, refs: IndexedSeq[PicState],
      mbX: Int, mbY: Int, qp: Int, cand: PPartsCand, numRefActive: Int,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      wp: WpCtx = null): Unit = {
    val mi = mbY * st.mbW + mbX
    partMbCount.incrementAndGet()
    e.encodeBin(cx, CabacCtx.PMbType, 0)
    e.encodeBin(cx, CabacCtx.PMbType + 1, if (cand.mbType == 3) 0 else 1)
    e.encodeBin(cx, CabacCtx.PMbType + 2, if (cand.mbType == 2) 0 else 1)
    if (cand.mbType == 3) {
      var i = 0
      while (i < 4) { e.encodeBin(cx, CabacCtx.SubMbType, 1); i += 1 } // 8x8
    }
    if (numRefActive > 1) {
      val nSlots = if (cand.mbType == 3) 4 else 2
      var k = 0
      while (k < nSlots) {
        val (sx4, sy4) =
          if (cand.mbType == 1) (mbX * 4, mbY * 4 + k * 2)
          else if (cand.mbType == 2) (mbX * 4 + k * 2, mbY * 4)
          else (mbX * 4 + (k & 1) * 2, mbY * 4 + (k >> 1) * 2)
        e.encodeBin(cx, CabacCtx.RefIdx + cms.incRefIdx(sx4, sy4), 0)
        k += 1
      }
    }
    st.beginPartitionedMb(mbX, mbY)
    cand.parts.foreach { p =>
      val bx4 = mbX * 4 + p.ox4; val by4 = mbY * 4 + p.oy4
      val (px, py) = predictMvPart(st, bx4, by4, p.w4, p.h4, 0, 0)
      val dx = p.mv0x - px; val dy = p.mv0y - py
      cabacWriteMvd(e, cx, CabacCtx.Mvd, cms.incMvd(bx4, by4, yComp = false), dx)
      cabacWriteMvd(e, cx, CabacCtx.Mvd + 7, cms.incMvd(bx4, by4, yComp = true), dy)
      cms.setMvd(bx4, by4, p.w4, p.h4, dx, dy)
      st.setMotion4(bx4, by4, p.w4, p.h4, 0, p.mv0x, p.mv0y, -1, 0, 0, refs(0).poc)
    }
    val predL = new Array[Int](256)
    val predCb = new Array[Int](64); val predCr = new Array[Int](64)
    assembleInterPred(st, refs, refs, mbX, mbY, cand.parts, predL, predCb,
      predCr, wp)
    val mc = interCoeffsFromPred(st, mbX, mbY, qp, srcY, srcCb, srcCr,
      predL, predCb, predCr)
    val cbp = if (mc == null) 0 else mc.cbp
    var b8 = 0
    var bitsSoFar = 0
    while (b8 < 4) {
      val bit = (cbp >> b8) & 1
      e.encodeBin(cx, CabacCtx.CbpLuma + cms.incCbpLuma(mbX, mbY, b8, bitsSoFar), bit)
      bitsSoFar |= bit << b8
      b8 += 1
    }
    val cbpChroma = cbp >> 4
    e.encodeBin(cx, CabacCtx.CbpChroma0 + cms.incCbpChroma(mbX, mbY, 0),
      if (cbpChroma != 0) 1 else 0)
    if (cbpChroma != 0)
      e.encodeBin(cx, CabacCtx.CbpChroma1 + cms.incCbpChroma(mbX, mbY, 1),
        if (cbpChroma == 2) 1 else 0)
    cms.cbp(mi) = cbp
    if (cbp != 0) {
      cabacWriteQpDelta(e, cx, cms, 0) // parts tier stays constant-QP
      cabacResidualP(st, cms, mbX, mbY, mc,
        (cat, inc, coeffs, maxN) => cabacWriteBlock(e, cx, cat, inc, coeffs, maxN))
    } else clearNz(st, mbX, mbY)
    reconstructInterParts(st, refs, refs, mbX, mbY, qp, cand.parts, mc, wp)
  }

  /** B mb_type bins, the full Table 9-37 tree: 0 '0', 1 '100', 2 '101',
    * then '11' + a 4-bin suffix b — b<8 maps to mbType 3+b (the Bi_16x16
    * and 16x8/8x16 two-partition types), b=13 escapes to intra (the
    * I-slice binarization follows), b=14 is B_L1_L0_8x16, b=15 B_8x8,
    * and b in 8..12 takes one more bin for types 12..21. Bin0 ctx by
    * neighbor condTerm, bin1 at +3, the 16x16 selector bin at +4, every
    * suffix bin at +5 (repo-local ctx-inc assignment within the
    * documented CABAC envelope — symmetric encoder/decoder). */
  private def cabacWriteBMbType(e: H264Cabac.Encoder, cx: H264Cabac.Contexts,
      inc0: Int, mbType: Int): Unit = {
    if (mbType == 0) { e.encodeBin(cx, CabacCtx.BMbType + inc0, 0); return }
    e.encodeBin(cx, CabacCtx.BMbType + inc0, 1)
    if (mbType <= 2) {
      e.encodeBin(cx, CabacCtx.BMbType + 3, 0)
      e.encodeBin(cx, CabacCtx.BMbType + 4, mbType - 1)
      return
    }
    e.encodeBin(cx, CabacCtx.BMbType + 3, 1)
    def suffix(bits: Int, n: Int): Unit = {
      var k = n - 1
      while (k >= 0) { e.encodeBin(cx, CabacCtx.BMbType + 5, (bits >> k) & 1); k -= 1 }
    }
    if (mbType <= 10) suffix(mbType - 3, 4) // bits 0..7
    else if (mbType == 11) suffix(14, 4)
    else if (mbType == 22) suffix(15, 4)
    else suffix(mbType + 4, 5) // 12..21 -> 5-bin 16..25
  }

  /** decode mirror; returns -1 when the intra escape ('11'+'1101') was
    * consumed — the caller hands off to the I-slice mb_type decode */
  private def cabacReadBMbType(d: H264Cabac.Decoder, cx: H264Cabac.Contexts,
      inc0: Int): Int = {
    if (d.decodeBin(cx, CabacCtx.BMbType + inc0) == 0) return 0
    if (d.decodeBin(cx, CabacCtx.BMbType + 3) == 0)
      return 1 + d.decodeBin(cx, CabacCtx.BMbType + 4)
    var bits = 0
    var k = 0
    while (k < 4) { bits = (bits << 1) | d.decodeBin(cx, CabacCtx.BMbType + 5); k += 1 }
    if (bits < 8) 3 + bits
    else if (bits == 13) -1 // intra escape
    else if (bits == 14) 11
    else if (bits == 15) 22
    else ((bits << 1) | d.decodeBin(cx, CabacCtx.BMbType + 5)) - 4 // 12..21
  }

  /** B sub_mb_type bins (Table 9-38 B column): 0 '0', 1 '100', 2 '101',
    * 3..6 '110xx', 7..10 '1110xx', 11..12 '1111x'; bin0/1/2 at
    * +0/+1/+2, every later bin at +3 */
  private def cabacWriteBSubType(e: H264Cabac.Encoder, cx: H264Cabac.Contexts,
      t: Int): Unit = {
    val B = CabacCtx.BSubMbType
    if (t == 0) { e.encodeBin(cx, B, 0); return }
    e.encodeBin(cx, B, 1)
    if (t <= 2) {
      e.encodeBin(cx, B + 1, 0)
      e.encodeBin(cx, B + 3, t - 1)
      return
    }
    e.encodeBin(cx, B + 1, 1)
    if (t <= 6) {
      e.encodeBin(cx, B + 2, 0)
      e.encodeBin(cx, B + 3, (t - 3) >> 1)
      e.encodeBin(cx, B + 3, (t - 3) & 1)
    } else if (t <= 10) {
      e.encodeBin(cx, B + 2, 1)
      e.encodeBin(cx, B + 3, 0)
      e.encodeBin(cx, B + 3, (t - 7) >> 1)
      e.encodeBin(cx, B + 3, (t - 7) & 1)
    } else {
      e.encodeBin(cx, B + 2, 1)
      e.encodeBin(cx, B + 3, 1)
      e.encodeBin(cx, B + 3, t - 11)
    }
  }

  private def cabacReadBSubType(d: H264Cabac.Decoder, cx: H264Cabac.Contexts): Int = {
    val B = CabacCtx.BSubMbType
    if (d.decodeBin(cx, B) == 0) return 0
    if (d.decodeBin(cx, B + 1) == 0) return 1 + d.decodeBin(cx, B + 3)
    if (d.decodeBin(cx, B + 2) == 0)
      3 + (d.decodeBin(cx, B + 3) << 1) + d.decodeBin(cx, B + 3)
    else if (d.decodeBin(cx, B + 3) == 0)
      7 + (d.decodeBin(cx, B + 3) << 1) + d.decodeBin(cx, B + 3)
    else 11 + d.decodeBin(cx, B + 3)
  }

  /** write one partitioned B MB (CABAC): mb_type + sub_mb_type bins,
    * mvds list-major with live ctx-state updates in emission order
    * (mirroring the decode parse), then cbp bins + residual from the
    * assembled two-list prediction; reconstructs in place */
  private def cabacWriteBPartsMb(e: H264Cabac.Encoder, cx: H264Cabac.Contexts,
      cms: CabacMbState, st: PicState, l0: IndexedSeq[PicState],
      l1: IndexedSeq[PicState], mbX: Int, mbY: Int, qp: Int, ch: BMbChoice,
      srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      wp: WpCtx): Unit = {
    bPartMbCount.incrementAndGet()
    val mi = mbY * st.mbW + mbX
    cabacWriteBMbType(e, cx, cms.incBMbType(mbX, mbY), ch.mbType)
    cms.directB(mi) = false
    if (ch.mbType == 22) ch.subTypes.foreach(t => cabacWriteBSubType(e, cx, t))
    // ref_idx_lX: 1-deep lists code no bins
    val mvds = deriveBPartMvds(st, l0, mbX, mbY, ch.parts)
    ch.parts.zip(mvds).foreach { case (p, (d0, _)) =>
      if (p.ref0 >= 0) {
        val bx4 = mbX * 4 + p.ox4; val by4 = mbY * 4 + p.oy4
        cabacWriteMvd(e, cx, CabacCtx.Mvd, cms.incMvd(bx4, by4, yComp = false), d0._1)
        cabacWriteMvd(e, cx, CabacCtx.Mvd + 7, cms.incMvd(bx4, by4, yComp = true), d0._2)
        cms.setMvd(bx4, by4, p.w4, p.h4, d0._1, d0._2)
      }
    }
    ch.parts.zip(mvds).foreach { case (p, (_, d1)) =>
      if (p.ref1 >= 0) {
        val bx4 = mbX * 4 + p.ox4; val by4 = mbY * 4 + p.oy4
        cabacWriteMvd(e, cx, CabacCtx.Mvd,
          cms.incMvd(bx4, by4, yComp = false, list = 1), d1._1)
        cabacWriteMvd(e, cx, CabacCtx.Mvd + 7,
          cms.incMvd(bx4, by4, yComp = true, list = 1), d1._2)
        cms.setMvd(bx4, by4, p.w4, p.h4, d1._1, d1._2, list = 1)
      }
    }
    val predL = new Array[Int](256)
    val predCb = new Array[Int](64); val predCr = new Array[Int](64)
    assembleInterPred(st, l0, l1, mbX, mbY, ch.parts, predL, predCb, predCr, wp)
    val mc = interCoeffsFromPred(st, mbX, mbY, qp, srcY, srcCb, srcCr,
      predL, predCb, predCr)
    val cbp = if (mc == null) 0 else mc.cbp
    var b8 = 0
    var bitsSoFar = 0
    while (b8 < 4) {
      val bit = (cbp >> b8) & 1
      e.encodeBin(cx, CabacCtx.CbpLuma + cms.incCbpLuma(mbX, mbY, b8, bitsSoFar), bit)
      bitsSoFar |= bit << b8
      b8 += 1
    }
    val cbpChroma = cbp >> 4
    e.encodeBin(cx, CabacCtx.CbpChroma0 + cms.incCbpChroma(mbX, mbY, 0),
      if (cbpChroma != 0) 1 else 0)
    if (cbpChroma != 0)
      e.encodeBin(cx, CabacCtx.CbpChroma1 + cms.incCbpChroma(mbX, mbY, 1),
        if (cbpChroma == 2) 1 else 0)
    cms.cbp(mi) = cbp
    if (cbp != 0) {
      cabacWriteQpDelta(e, cx, cms, 0)
      cabacResidualP(st, cms, mbX, mbY, mc,
        (cat, inc, coeffs, maxN) => cabacWriteBlock(e, cx, cat, inc, coeffs, maxN))
    } else clearNz(st, mbX, mbY)
    reconstructInterParts(st, l0, l1, mbX, mbY, qp, ch.parts, mc, wp)
  }

  /** the B-slice CABAC macroblock loop (encode side) */
  private def encodeBRangeCabac(st: PicState, l0: IndexedSeq[PicState],
      l1: IndexedSeq[PicState], bw: H264Writer.BitWriter,
      qp: Int, srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      searchRange: Int, halfPel: Boolean, quarterPel: Boolean,
      startMb: Int, endMb: Int, spatialDirect: Boolean = true,
      wp: WpCtx = null, tryParts: Boolean = false): Unit = {
    bw.alignOne()
    val e = new H264Cabac.Encoder(bw)
    val cx = new H264Cabac.Contexts(CabacCtx.N)
    H264Cabac.initTables.foreach(t => cx.init(t.p(0), qp)) // emitted idc = 0
    val cms = new CabacMbState(st)
    var mb = startMb
    while (mb < endMb) {
      val mbX = mb % st.mbW; val mbY = mb / st.mbW
      val mi = mbY * st.mbW + mbX
      st.sliceOfMb(mb) = st.curSlice
      val ch = chooseBMb(st, l0, l1, mbX, mbY, qp, srcY, srcCb, srcCr,
        searchRange, halfPel, quarterPel, spatialDirect, wp, tryParts)
      if (ch.mbType == 0) directBCount.incrementAndGet()
      if (ch.mbType == 0 && ch.mc == null) { // B_Skip
        e.encodeBin(cx, CabacCtx.BSkip + cms.incSkip(mbX, mbY), 1)
        cms.skip(mi) = true
        clearNz(st, mbX, mbY)
        reconstructBMb(st, l0, l1, mbX, mbY, qp, ch, wp)
      } else if (ch.parts != null) {
        e.encodeBin(cx, CabacCtx.BSkip + cms.incSkip(mbX, mbY), 0)
        cabacWriteBPartsMb(e, cx, cms, st, l0, l1, mbX, mbY, qp, ch,
          srcY, srcCb, srcCr, wp)
      } else {
        e.encodeBin(cx, CabacCtx.BSkip + cms.incSkip(mbX, mbY), 0)
        cabacWriteBMbType(e, cx, cms.incBMbType(mbX, mbY), ch.mbType)
        cms.directB(mi) = ch.mbType == 0
        if (ch.mbType != 0) {
          // ref_idx_lX: 1-deep lists code no bins (cMax 0)
          if (ch.ref0 >= 0) {
            val (px, py) = predictMv(st, mbX, mbY, ch.ref0, list = 0)
            val dx = ch.mv0x - px; val dy = ch.mv0y - py
            cabacWriteMvd(e, cx, CabacCtx.Mvd, cms.incMvd(mbX * 4, mbY * 4, yComp = false), dx)
            cabacWriteMvd(e, cx, CabacCtx.Mvd + 7, cms.incMvd(mbX * 4, mbY * 4, yComp = true), dy)
            cms.setMvd(mbX * 4, mbY * 4, 4, 4, dx, dy)
          }
          if (ch.ref1 >= 0) {
            val (px, py) = predictMv(st, mbX, mbY, ch.ref1, list = 1)
            val dx = ch.mv1x - px; val dy = ch.mv1y - py
            cabacWriteMvd(e, cx, CabacCtx.Mvd,
              cms.incMvd(mbX * 4, mbY * 4, yComp = false, list = 1), dx)
            cabacWriteMvd(e, cx, CabacCtx.Mvd + 7,
              cms.incMvd(mbX * 4, mbY * 4, yComp = true, list = 1), dy)
            cms.setMvd(mbX * 4, mbY * 4, 4, 4, dx, dy, list = 1)
          }
        }
        val cbp = if (ch.mc == null) 0 else ch.mc.cbp
        var b8 = 0
        var bitsSoFar = 0
        while (b8 < 4) {
          val bit = (cbp >> b8) & 1
          e.encodeBin(cx, CabacCtx.CbpLuma + cms.incCbpLuma(mbX, mbY, b8, bitsSoFar), bit)
          bitsSoFar |= bit << b8
          b8 += 1
        }
        val cbpChroma = cbp >> 4
        e.encodeBin(cx, CabacCtx.CbpChroma0 + cms.incCbpChroma(mbX, mbY, 0),
          if (cbpChroma != 0) 1 else 0)
        if (cbpChroma != 0)
          e.encodeBin(cx, CabacCtx.CbpChroma1 + cms.incCbpChroma(mbX, mbY, 1),
            if (cbpChroma == 2) 1 else 0)
        cms.cbp(mi) = cbp
        if (cbp != 0) {
          cabacWriteQpDelta(e, cx, cms, 0) // B tier stays constant-QP
          cabacResidualP(st, cms, mbX, mbY, ch.mc,
            (cat, inc, coeffs, maxN) => cabacWriteBlock(e, cx, cat, inc, coeffs, maxN))
        } else clearNz(st, mbX, mbY)
        reconstructBMb(st, l0, l1, mbX, mbY, qp, ch, wp)
      }
      cms.endMb()
      mb += 1
      e.encodeTerminate(if (mb == endMb) 1 else 0)
    }
    e.flush()
    bw.alignZero()
  }

  /** CABAC slice-data decode (I, P, and B), mirror of the encode loops */
  private def decodeSliceDataCabac(r: H264.BitReader, st: PicState,
      refs: IndexedSeq[PicState],
      isP: Boolean, qp: Int, firstMb: Int, cabacInitIdc: Int = 0,
      t8pps: Boolean = false, numRefActive: Int = 1,
      numRefActiveL1: Int = 1,
      isB: Boolean = false, l1: IndexedSeq[PicState] = IndexedSeq.empty,
      wp: WpCtx = null, spatialDirect: Boolean = true): Unit = {
    r.align() // cabac_alignment_one_bit
    val d = new H264Cabac.Decoder(r)
    val cx = new H264Cabac.Contexts(CabacCtx.N)
    H264Cabac.initTables.foreach(t =>
      cx.init(if (isP || isB) t.p(cabacInitIdc) else t.i, qp))
    val cms = new CabacMbState(st)
    // per-slice residual scratch (see decodeSlice's pmPool): every field a
    // reconstruct reads is gated by the cbp the parser just set, and
    // cabacReadBlock pre-zeroes each parsed block
    val pmPool = new PMbCoeffs
    lazy val m16Pool = new MbCoeffs
    lazy val zig8Pool: Array[Array[Int]] = Array.fill(4)(new Array[Int](64))
    val nMb = st.mbW * st.mbH
    // running per-MB QP (§7.4.5): mb_qp_delta elements advance it; MBs
    // without one (skip, cbp 0) reconstruct/deblock at the running value
    var qpCur = qp
    var mb = firstMb
    var end = false
    while (!end) {
      require(mb < nMb, "CABAC slice ran past the picture (missing end_of_slice)")
      val mbX = mb % st.mbW; val mbY = mb / st.mbW
      val mi = mbY * st.mbW + mbX
      st.sliceOfMb(mb) = st.curSlice
      if (isB) {
        if (d.decodeBin(cx, CabacCtx.BSkip + cms.incSkip(mbX, mbY)) == 1) {
          cms.skip(mi) = true
          val dm = deriveDirect(st, refs, l1, mbX, mbY, spatialDirect)
          clearNz(st, mbX, mbY)
          reconstructBMb(st, refs, l1, mbX, mbY, qpCur, directBChoice(dm, null), wp)
        } else {
          val mbType = cabacReadBMbType(d, cx, cms.incBMbType(mbX, mbY))
          cms.directB(mi) = mbType == 0
          if (mbType == -1) {
            // intra-in-B via the '11'+'1101' escape (§9.3.3.1.2):
            // the I-slice mb_type binarization follows
            qpCur = decodeIntraMbCabac(d, cx, cms, st, mbX, mbY, qpCur,
              t8pps, pmPool, m16Pool, zig8Pool)
          } else if (mbType >= 4) {
            // partitioned B MB (round 15): sub types, then mvds in
            // bitstream (list-major) order with live ctx updates,
            // then §8.4.1.3 derivation in partition order
            val subTypes: Array[Int] =
              if (mbType == 22) Array.fill(4)(cabacReadBSubType(d, cx))
              else null
            val dm =
              if (mbType == 22 && subTypes.exists(_ == 0))
                deriveDirect(st, refs, l1, mbX, mbY, spatialDirect)
              else null
            val raw = readBRawParts(mbType, subTypes,
              (ox4, oy4, list) => {
                val n = if (list == 0) numRefActive else numRefActiveL1
                var refIdx = 0
                if (n > 1) {
                  val bx4 = mbX * 4 + ox4; val by4 = mbY * 4 + oy4
                  while (d.decodeBin(cx, CabacCtx.RefIdx + (if (refIdx == 0)
                      cms.incRefIdx(bx4, by4, list) else if (refIdx == 1) 4
                    else 5)) == 1) {
                    refIdx += 1
                    require(refIdx < n, s"B ref_idx $refIdx >= num_ref_idx_active $n")
                  }
                }
                refIdx
              },
              (ox4, oy4, w4, h4, list) => {
              val bx4 = mbX * 4 + ox4; val by4 = mbY * 4 + oy4
              val dx = cabacReadMvd(d, cx, CabacCtx.Mvd,
                cms.incMvd(bx4, by4, yComp = false, list = list))
              val dy = cabacReadMvd(d, cx, CabacCtx.Mvd + 7,
                cms.incMvd(bx4, by4, yComp = true, list = list))
              cms.setMvd(bx4, by4, w4, h4, dx, dy, list = list)
              (dx, dy)
            })
            val parts = deriveBParts(st, refs, l1, mbX, mbY, raw, dm)
            bPartMbCount.incrementAndGet()
            var cbpLuma = 0
            var b8 = 0
            while (b8 < 4) {
              cbpLuma |= d.decodeBin(cx,
                CabacCtx.CbpLuma + cms.incCbpLuma(mbX, mbY, b8, cbpLuma)) << b8
              b8 += 1
            }
            var cbpChroma = 0
            if (d.decodeBin(cx, CabacCtx.CbpChroma0 + cms.incCbpChroma(mbX, mbY, 0)) == 1)
              cbpChroma =
                if (d.decodeBin(cx, CabacCtx.CbpChroma1 + cms.incCbpChroma(mbX, mbY, 1)) == 1) 2
                else 1
            val cbp = cbpLuma | (cbpChroma << 4)
            cms.cbp(mi) = cbp
            val mc = if (cbp == 0) null else {
              val m = pmPool
              m.cbp = cbp
              qpCur = qpWrap(qpCur, cabacReadQpDelta(d, cx, cms))
              cabacResidualP(st, cms, mbX, mbY, m,
                (cat, inc, coeffs, maxN) => cabacReadBlock(d, cx, cat, inc, coeffs, maxN))
              m
            }
            if (mc == null) clearNz(st, mbX, mbY)
            reconstructInterParts(st, refs, l1, mbX, mbY, qpCur, parts, mc, wp)
          } else {
          var ref0 = -1; var ref1 = -1
          var mv0x = 0; var mv0y = 0; var mv1x = 0; var mv1y = 0
          var dmDirect: DirectMv = null
          if (mbType == 0) {
            val dm = deriveDirect(st, refs, l1, mbX, mbY, spatialDirect)
            dmDirect = dm
            ref0 = dm.ref0; ref1 = dm.ref1
            mv0x = dm.quad(0); mv0y = dm.quad(1); mv1x = dm.quad(2); mv1y = dm.quad(3)
          } else {
            // ref_idx_lX (unary, RefIdx ctxs — both slots precede any
            // mvd, §7.3.5.1; 1-deep lists code no bins at cMax 0)
            def readRefIdxB(list: Int, n: Int): Int = {
              var refIdx = 0
              if (n > 1) {
                while (d.decodeBin(cx, CabacCtx.RefIdx + (if (refIdx == 0)
                    cms.incRefIdx(mbX * 4, mbY * 4, list) else if (refIdx == 1) 4
                  else 5)) == 1) {
                  refIdx += 1
                  require(refIdx < n, s"B ref_idx $refIdx >= num_ref_idx_active $n")
                }
              }
              refIdx
            }
            if (mbType == 1 || mbType == 3) ref0 = readRefIdxB(0, numRefActive)
            if (mbType == 2 || mbType == 3) ref1 = readRefIdxB(1, numRefActiveL1)
            if (ref0 >= 0) {
              val dx = cabacReadMvd(d, cx, CabacCtx.Mvd,
                cms.incMvd(mbX * 4, mbY * 4, yComp = false))
              val dy = cabacReadMvd(d, cx, CabacCtx.Mvd + 7,
                cms.incMvd(mbX * 4, mbY * 4, yComp = true))
              cms.setMvd(mbX * 4, mbY * 4, 4, 4, dx, dy)
              val (px, py) = predictMv(st, mbX, mbY, ref0, list = 0)
              mv0x = px + dx; mv0y = py + dy
            }
            if (ref1 >= 0) {
              val dx = cabacReadMvd(d, cx, CabacCtx.Mvd,
                cms.incMvd(mbX * 4, mbY * 4, yComp = false, list = 1))
              val dy = cabacReadMvd(d, cx, CabacCtx.Mvd + 7,
                cms.incMvd(mbX * 4, mbY * 4, yComp = true, list = 1))
              cms.setMvd(mbX * 4, mbY * 4, 4, 4, dx, dy, list = 1)
              val (px, py) = predictMv(st, mbX, mbY, ref1, list = 1)
              mv1x = px + dx; mv1y = py + dy
            }
          }
          var cbpLuma = 0
          var b8 = 0
          while (b8 < 4) {
            cbpLuma |= d.decodeBin(cx,
              CabacCtx.CbpLuma + cms.incCbpLuma(mbX, mbY, b8, cbpLuma)) << b8
            b8 += 1
          }
          var cbpChroma = 0
          if (d.decodeBin(cx, CabacCtx.CbpChroma0 + cms.incCbpChroma(mbX, mbY, 0)) == 1)
            cbpChroma =
              if (d.decodeBin(cx, CabacCtx.CbpChroma1 + cms.incCbpChroma(mbX, mbY, 1)) == 1) 2
              else 1
          val cbp = cbpLuma | (cbpChroma << 4)
          cms.cbp(mi) = cbp
          val mc = if (cbp == 0) null else {
            val m = pmPool
            m.cbp = cbp
            qpCur = qpWrap(qpCur, cabacReadQpDelta(d, cx, cms))
            cabacResidualP(st, cms, mbX, mbY, m,
              (cat, inc, coeffs, maxN) => cabacReadBlock(d, cx, cat, inc, coeffs, maxN))
            m
          }
          if (mc == null) clearNz(st, mbX, mbY)
          reconstructBMb(st, refs, l1, mbX, mbY, qpCur,
            if (dmDirect != null) directBChoice(dmDirect, mc)
            else BMbChoice(mbType, ref0, ref1, mv0x, mv0y, mv1x, mv1y, mc), wp)
          }
        }
      } else if (isP && d.decodeBin(cx, CabacCtx.Skip + cms.incSkip(mbX, mbY)) == 1) {
        cms.skip(mi) = true
        val (sx, sy) = skipMv(st, mbX, mbY)
        clearNz(st, mbX, mbY)
        reconstructPMb(st, refs(0), mbX, mbY, qpCur, sx, sy, null, wp = wp)
      } else if (isP) {
        if (d.decodeBin(cx, CabacCtx.PMbType) == 1) {
          // intra-in-P: the Table 9-37 prefix bin selects the I-slice
          // mb_type suffix (scene cuts / uncovered regions); falls
          // through to the loop's shared mb/end_of_slice tail
          qpCur = decodeIntraMbCabac(d, cx, cms, st, mbX, mbY, qpCur, t8pps,
            pmPool, m16Pool, zig8Pool)
        } else {
        val b1 = d.decodeBin(cx, CabacCtx.PMbType + 1)
        val b2 = d.decodeBin(cx, CabacCtx.PMbType + 2)
        // Table 9-34 P prefix: '000' 16x16, '011' 16x8, '010' 8x16,
        // '001' P_8x8 (no P_8x8ref0 in CABAC)
        val mbType = (b1, b2) match {
          case (0, 0) => 0
          case (1, 1) => 1
          case (1, 0) => 2
          case _      => 3
        }
        // ref_idx_l0 for one partition slot: unary — 1-bins to the 0
        // terminator; bin-0 context from the partition's A/B neighbour
        // blocks (an in-MB neighbour slot whose motion is not yet
        // derived reads as unavailable — repo-local within the
        // documented CABAC envelope; the emitted subset keeps
        // partitioned MBs on refIdx 0 so no stream this encoder writes
        // exercises the difference)
        def readRefIdx(bx4: Int, by4: Int): Int = {
          var refIdx = 0
          if (numRefActive > 1) {
            while (d.decodeBin(cx, CabacCtx.RefIdx + (if (refIdx == 0)
                cms.incRefIdx(bx4, by4) else if (refIdx == 1) 4 else 5)) == 1) {
              refIdx += 1
              require(refIdx < numRefActive,
                s"ref_idx_l0 $refIdx >= num_ref_idx_l0_active $numRefActive")
            }
          }
          require(refIdx < refs.length,
            s"ref_idx_l0 $refIdx with only ${refs.length} reference(s) decoded")
          refIdx
        }
        if (mbType == 0) {
          val refIdx = readRefIdx(mbX * 4, mbY * 4)
          val mvdX = cabacReadMvd(d, cx, CabacCtx.Mvd, cms.incMvd(mbX * 4, mbY * 4, yComp = false))
          val mvdY = cabacReadMvd(d, cx, CabacCtx.Mvd + 7, cms.incMvd(mbX * 4, mbY * 4, yComp = true))
          cms.setMvd(mbX * 4, mbY * 4, 4, 4, mvdX, mvdY)
          val (px, py) = predictMv(st, mbX, mbY, refIdx)
          val mvx = px + mvdX; val mvy = py + mvdY
          var cbpLuma = 0
          var b8 = 0
          while (b8 < 4) {
            cbpLuma |= d.decodeBin(cx,
              CabacCtx.CbpLuma + cms.incCbpLuma(mbX, mbY, b8, cbpLuma)) << b8
            b8 += 1
          }
          var cbpChroma = 0
          if (d.decodeBin(cx, CabacCtx.CbpChroma0 + cms.incCbpChroma(mbX, mbY, 0)) == 1)
            cbpChroma =
              if (d.decodeBin(cx, CabacCtx.CbpChroma1 + cms.incCbpChroma(mbX, mbY, 1)) == 1) 2
              else 1
          val cbp = cbpLuma | (cbpChroma << 4)
          cms.cbp(mi) = cbp
          val mc = if (cbp == 0) null else {
            val m = pmPool
            m.cbp = cbp
            qpCur = qpWrap(qpCur, cabacReadQpDelta(d, cx, cms))
            cabacResidualP(st, cms, mbX, mbY, m,
              (cat, inc, coeffs, maxN) => cabacReadBlock(d, cx, cat, inc, coeffs, maxN))
            m
          }
          if (mc == null) clearNz(st, mbX, mbY)
          reconstructPMb(st, refs(refIdx), mbX, mbY, qpCur, mvx, mvy, mc, refIdx, wp)
        } else {
          // partitioned P MB: sub_mb_types (P_8x8), ref_idx per slot,
          // then mvd + MV derivation per partition in decode order
          val subTypes: Array[Int] =
            if (mbType == 3) Array.fill(4) {
              if (d.decodeBin(cx, CabacCtx.SubMbType) == 1) 0
              else if (d.decodeBin(cx, CabacCtx.SubMbType + 1) == 0) 1
              else if (d.decodeBin(cx, CabacCtx.SubMbType + 2) == 1) 2
              else 3
            } else null
          val geo = pPartGeometry(mbType, subTypes)
          val nRefSlots = if (mbType == 3) 4 else 2
          val refSlots = new Array[Int](nRefSlots)
          locally {
            var k = 0
            while (k < nRefSlots) {
              val (sx4, sy4) =
                if (mbType == 1) (mbX * 4, mbY * 4 + k * 2)
                else if (mbType == 2) (mbX * 4 + k * 2, mbY * 4)
                else (mbX * 4 + (k & 1) * 2, mbY * 4 + (k >> 1) * 2)
              refSlots(k) = readRefIdx(sx4, sy4)
              k += 1
            }
          }
          st.beginPartitionedMb(mbX, mbY)
          val parts = geo.map { case (ox4, oy4, w4, h4, slot) =>
            val refIdx = refSlots(slot)
            val bx4 = mbX * 4 + ox4; val by4 = mbY * 4 + oy4
            val dx = cabacReadMvd(d, cx, CabacCtx.Mvd, cms.incMvd(bx4, by4, yComp = false))
            val dy = cabacReadMvd(d, cx, CabacCtx.Mvd + 7, cms.incMvd(bx4, by4, yComp = true))
            cms.setMvd(bx4, by4, w4, h4, dx, dy)
            val (px, py) = predictMvPart(st, bx4, by4, w4, h4, refIdx, 0)
            val mvx = px + dx; val mvy = py + dy
            st.setMotion4(bx4, by4, w4, h4, refIdx, mvx, mvy, -1, 0, 0,
              refs(refIdx).poc)
            InterPart(ox4, oy4, w4, h4, refIdx, mvx, mvy)
          }
          var cbpLuma = 0
          var b8 = 0
          while (b8 < 4) {
            cbpLuma |= d.decodeBin(cx,
              CabacCtx.CbpLuma + cms.incCbpLuma(mbX, mbY, b8, cbpLuma)) << b8
            b8 += 1
          }
          var cbpChroma = 0
          if (d.decodeBin(cx, CabacCtx.CbpChroma0 + cms.incCbpChroma(mbX, mbY, 0)) == 1)
            cbpChroma =
              if (d.decodeBin(cx, CabacCtx.CbpChroma1 + cms.incCbpChroma(mbX, mbY, 1)) == 1) 2
              else 1
          val cbp = cbpLuma | (cbpChroma << 4)
          cms.cbp(mi) = cbp
          val mc = if (cbp == 0) null else {
            val m = pmPool
            m.cbp = cbp
            qpCur = qpWrap(qpCur, cabacReadQpDelta(d, cx, cms))
            cabacResidualP(st, cms, mbX, mbY, m,
              (cat, inc, coeffs, maxN) => cabacReadBlock(d, cx, cat, inc, coeffs, maxN))
            m
          }
          if (mc == null) clearNz(st, mbX, mbY)
          reconstructInterParts(st, refs, refs, mbX, mbY, qpCur, parts, mc, wp)
        }
        }
      } else qpCur = decodeIntraMbCabac(d, cx, cms, st, mbX, mbY, qpCur, t8pps,
        pmPool, m16Pool, zig8Pool)
      cms.endMb()
      mb += 1
      end = d.decodeTerminate() == 1
    }
  }

  /** decode one intra macroblock, CABAC — the I-slice mb_type
    * binarization from its first (I_NxN vs I_16x16) bin onward; shared
    * by I slices and intra-in-P (the P prefix bin 1 selects it,
    * §9.3.3.1.2 / Table 9-37 suffix — contexts repo-local within the
    * documented CABAC envelope, symmetric encoder/decoder) */
  private def decodeIntraMbCabac(d: H264Cabac.Decoder, cx: H264Cabac.Contexts,
      cms: CabacMbState, st: PicState, mbX: Int, mbY: Int, qpIn: Int,
      t8pps: Boolean, pmPool: PMbCoeffs, m16Pool: MbCoeffs,
      zig8Pool: Array[Array[Int]]): Int = {
    val mi = mbY * st.mbW + mbX
    var qp = qpIn
    locally {
      if (d.decodeBin(cx, CabacCtx.MbTypeI + cms.incMbTypeI(mbX, mbY)) == 0) {
        // I_NxN: transform_size_8x8_flag (present only under a t8 PPS)
        // picks Intra_8x8 vs Intra_4x4
        if (t8pps && d.decodeBin(cx, CabacCtx.Trans8 + cms.incTrans8(mbX, mbY)) == 1) {
          // Intra_8x8 (High): 4 mode codes, DC chroma, cbp, cat-5 residual
          val modes8 = new Array[Int](4)
          var b = 0
          while (b < 4) {
            val bx = mbX * 4 + (b % 2) * 2; val by = mbY * 4 + (b / 2) * 2
            val pm = predI4Mode(st, bx, by)
            modes8(b) =
              if (d.decodeBin(cx, CabacCtx.PrevI4x4) == 1) pm
              else {
                val rem = (d.decodeBin(cx, CabacCtx.RemI4x4) << 2) |
                  (d.decodeBin(cx, CabacCtx.RemI4x4) << 1) |
                  d.decodeBin(cx, CabacCtx.RemI4x4)
                if (rem < pm) rem else rem + 1
              }
            setI8ModeCells(st, mbX, mbY, b, modes8(b))
            b += 1
          }
          val chromaMode8 = cabacReadChromaMode(d, cx, cms, st, mbX, mbY)
          var cbpLuma8 = 0
          var b8 = 0
          while (b8 < 4) {
            cbpLuma8 |= d.decodeBin(cx,
              CabacCtx.CbpLuma + cms.incCbpLuma(mbX, mbY, b8, cbpLuma8)) << b8
            b8 += 1
          }
          var cbpChroma8 = 0
          if (d.decodeBin(cx, CabacCtx.CbpChroma0 + cms.incCbpChroma(mbX, mbY, 0)) == 1)
            cbpChroma8 =
              if (d.decodeBin(cx, CabacCtx.CbpChroma1 + cms.incCbpChroma(mbX, mbY, 1)) == 1) 2
              else 1
          val m8 = pmPool
          m8.cbp = cbpLuma8 | (cbpChroma8 << 4)
          cms.isIntra(mi) = true
          cms.cbp(mi) = m8.cbp
          val zig8 = zig8Pool
          if (m8.cbp != 0) {
            qp = qpWrap(qp, cabacReadQpDelta(d, cx, cms))
            cabacResidualI8(st, cms, mbX, mbY, zig8, m8,
              (cat, inc, coeffs, maxN) => cabacReadBlock(d, cx, cat, inc, coeffs, maxN))
          } else clearNz(st, mbX, mbY)
          st.mbQp(mi) = qp
          st.trans8(mi) = true
          reconstructLumaI8(st, mbX, mbY, qp, modes8, zig8, m8.cbpLuma)
          intraChromaRecon(st, mbX, mbY, chromaQp(qp + st.cqpOff), m8.cbpChroma,
            m8.cbDcZig, m8.cbAcZig, m8.crDcZig, m8.crAcZig, chromaMode8,
            qpcCrIn = chromaQp(qp + st.cqpOff2))
          // the shared mb += 1 / end_of_slice tail below closes this MB
        } else {
        // I_NxN (Intra_4x4)
        val modes = new Array[Int](16)
        var blk = 0
        while (blk < 16) {
          val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
          val pm = predI4Mode(st, bx, by)
          modes(blk) =
            if (d.decodeBin(cx, CabacCtx.PrevI4x4) == 1) pm
            else {
              val rem = (d.decodeBin(cx, CabacCtx.RemI4x4) << 2) |
                (d.decodeBin(cx, CabacCtx.RemI4x4) << 1) |
                d.decodeBin(cx, CabacCtx.RemI4x4)
              if (rem < pm) rem else rem + 1
            }
          st.i4Mode(by * st.bw4 + bx) = modes(blk)
          blk += 1
        }
        val chromaMode4 = cabacReadChromaMode(d, cx, cms, st, mbX, mbY)
        var cbpLuma4 = 0
        var b8 = 0
        while (b8 < 4) {
          cbpLuma4 |= d.decodeBin(cx,
            CabacCtx.CbpLuma + cms.incCbpLuma(mbX, mbY, b8, cbpLuma4)) << b8
          b8 += 1
        }
        var cbpChroma4 = 0
        if (d.decodeBin(cx, CabacCtx.CbpChroma0 + cms.incCbpChroma(mbX, mbY, 0)) == 1)
          cbpChroma4 =
            if (d.decodeBin(cx, CabacCtx.CbpChroma1 + cms.incCbpChroma(mbX, mbY, 1)) == 1) 2
            else 1
        val m4 = pmPool
        m4.cbp = cbpLuma4 | (cbpChroma4 << 4)
        cms.isIntra(mi) = true
        cms.cbp(mi) = m4.cbp
        if (m4.cbp != 0) {
          qp = qpWrap(qp, cabacReadQpDelta(d, cx, cms))
          cabacResidualP(st, cms, mbX, mbY, m4,
            (cat, inc, coeffs, maxN) => cabacReadBlock(d, cx, cat, inc, coeffs, maxN))
        } else clearNz(st, mbX, mbY)
        st.mbQp(mi) = qp
        reconstructLumaI4(st, mbX, mbY, qp, modes, m4.lumaZig, m4.cbpLuma)
        intraChromaRecon(st, mbX, mbY, chromaQp(qp + st.cqpOff), m4.cbpChroma,
          m4.cbDcZig, m4.cbAcZig, m4.crDcZig, m4.crAcZig, chromaMode4,
          qpcCrIn = chromaQp(qp + st.cqpOff2))
        } // end Intra_4x4 (the t8pps flag picked I8 above otherwise)
      } else {
        require(d.decodeTerminate() == 0, "I_PCM in CABAC slices unsupported")
        val mc = m16Pool
        mc.cbpLuma = if (d.decodeBin(cx, CabacCtx.MbTypeICbpLuma) == 1) 15 else 0
        mc.cbpChroma =
          if (d.decodeBin(cx, CabacCtx.MbTypeICbpChroma0) == 0) 0
          else if (d.decodeBin(cx, CabacCtx.MbTypeICbpChroma1) == 1) 2
          else 1
        mc.predMode = (d.decodeBin(cx, CabacCtx.MbTypeIPred0) << 1) |
          d.decodeBin(cx, CabacCtx.MbTypeIPred1)
        // same neighbor-availability validation as the CAVLC branch
        require(i16Modes(st, mbX, mbY).contains(mc.predMode),
          s"Intra_16x16 pred mode ${mc.predMode} unavailable at mb ($mbX,$mbY): " +
            s"required neighbor(s) missing (available: ${i16Modes(st, mbX, mbY).sorted.mkString(",")})")
        mc.chromaMode = cabacReadChromaMode(d, cx, cms, st, mbX, mbY)
        qp = qpWrap(qp, cabacReadQpDelta(d, cx, cms))
        cabacResidualI16(st, cms, mbX, mbY, mc,
          (cat, inc, coeffs, maxN) => cabacReadBlock(d, cx, cat, inc, coeffs, maxN))
        cms.isIntra(mi) = true
        cms.cbp(mi) = mc.cbpLuma | (mc.cbpChroma << 4)
        reconstructMb(st, mbX, mbY, qp, mc)
      }
    }
    qp
  }

  /** zero the nC bookkeeping of an MB with no coded residual (skip, or
    * coded with cbp 0)
    */
  // ------------------------------------------------- deblocking (§8.7)

  /** boundary strength for one luma 4-sample edge segment (§8.7.2.1):
    * 4/3 when a side is intra (MB edge / internal), 2 on coded
    * coefficients in an adjacent 4x4 block, 1 on different reference
    * pictures (distinct refIdx into the shared L0 list — every list
    * entry is a distinct short-term picture here) or an MV jump >= one
    * integer sample (quarter-pel units), else 0
    */
  private def boundaryStrength(st: PicState, mbEdge: Boolean,
      pMb: Int, qMb: Int, pBx: Int, pBy: Int, qBx: Int, qBy: Int): Int = {
    val pIntra = !st.inter(pMb)
    val qIntra = !st.inter(qMb)
    if (pIntra || qIntra) { if (mbEdge) 4 else 3 }
    else if (st.nzY(pBy * st.bw4 + pBx) > 0 || st.nzY(qBy * st.bw4 + qBx) > 0) 2
    else {
      // §8.7.2.1 motion test PER 4x4 EDGE SEGMENT, per prediction list:
      // bs = 1 when the two sides' blocks predict from different
      // reference pictures (within one picture every MB shares the
      // slice-header lists, so (list, refIdx) identifies the picture;
      // this subset never places the same picture in both lists) or any
      // same-list MV component jumps by >= one integer sample
      // (quarter-pel units). Partitioned MBs get genuine internal
      // bs-1 edges wherever partition MVs jump; single-list P blocks
      // carry ref4L1 = -1 on both sides, reducing to the P rule.
      val pi = pBy * st.bw4 + pBx
      val qi = qBy * st.bw4 + qBx
      val refsDiffer = st.ref4(pi) != st.ref4(qi) ||
        st.ref4L1(pi) != st.ref4L1(qi)
      val mvJump =
        (st.ref4(pi) >= 0 &&
          (math.abs(st.mv4X(pi) - st.mv4X(qi)) >= 4 ||
           math.abs(st.mv4Y(pi) - st.mv4Y(qi)) >= 4)) ||
        (st.ref4L1(pi) >= 0 &&
          (math.abs(st.mv4XL1(pi) - st.mv4XL1(qi)) >= 4 ||
           math.abs(st.mv4YL1(pi) - st.mv4YL1(qi)) >= 4))
      if (refsDiffer || mvJump) 1 else 0
    }
  }

  @inline private def clip3i(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** In-loop deblocking of one reconstructed picture (§8.7): per MB in
    * raster order, ALL vertical edges left→right then ALL horizontal
    * edges top→bottom; luma edges every 4 samples, chroma (4:2:0) every
    * 4 chroma samples mapping to luma edges 0 and 2. Runs identically
    * in the encoder's reconstruction loop and the decoder, AFTER the
    * frame's macroblocks reconstruct (intra prediction correctly saw
    * unfiltered neighbours). `aOff`/`bOff` are the slice header's
    * FilterOffsetA/B (2 × the coded div2 values).
    */
  private def deblockPicture(st: PicState, aOff: Int, bOff: Int): Unit = {
    @inline def qpOf(mi: Int): Int = if (st.pcmMb(mi)) 0 else st.mbQp(mi)
    var mb = 0
    val nMb = st.mbW * st.mbH
    while (mb < nMb) {
      val mbX = mb % st.mbW
      val mbY = mb / st.mbW

      // one direction over luma + chroma; vertical: step 1 across edge,
      // lines advance by row stride; horizontal: transposed
      def direction(vertical: Boolean): Unit = {
        var e = 0
        while (e < 4) {
          val atMbEdge = e == 0
          val exists = if (vertical) !atMbEdge || mbX > 0 else !atMbEdge || mbY > 0
          // an 8x8-transform MB has no 4x4-internal transform edges:
          // only e = 0 (MB edge) and e = 2 (8x8 grid) filter (§8.7);
          // chroma rides e 0/2 only, so skipping e 1/3 outright is exact
          if (exists && !(st.trans8(mb) && (e == 1 || e == 3))) {
            val qMb = mb
            val pMb = if (!atMbEdge) mb else if (vertical) mb - 1 else mb - st.mbW
            val qpavY = (qpOf(pMb) + qpOf(qMb) + 1) >> 1
            val idxA = clip3i(0, 51, qpavY + aOff)
            val idxB = clip3i(0, 51, qpavY + bOff)
            val alpha = H264Deblock.alphaTab(idxA)
            val beta = H264Deblock.betaTab(idxB)
            val qpavC = (chromaQp(qpOf(pMb) + st.cqpOff) +
              chromaQp(qpOf(qMb) + st.cqpOff) + 1) >> 1
            val cIdxA = clip3i(0, 51, qpavC + aOff)
            val cIdxB = clip3i(0, 51, qpavC + bOff)
            val cAlpha = H264Deblock.alphaTab(cIdxA)
            val cBeta = H264Deblock.betaTab(cIdxB)
            // Cr thresholds from the second offset (§8.7 computes QPc
            // per chroma component; identical offsets collapse)
            val qpavC2 = (chromaQp(qpOf(pMb) + st.cqpOff2) +
              chromaQp(qpOf(qMb) + st.cqpOff2) + 1) >> 1
            val cIdxA2 = clip3i(0, 51, qpavC2 + aOff)
            val cIdxB2 = clip3i(0, 51, qpavC2 + bOff)
            val cAlpha2 = H264Deblock.alphaTab(cIdxA2)
            val cBeta2 = H264Deblock.betaTab(cIdxB2)
            if (alpha > 0 || cAlpha > 0 || cAlpha2 > 0) {
              var seg = 0
              while (seg < 4) {
                // 4x4 blocks across this segment of the edge
                val (pBx, pBy, qBx, qBy) =
                  if (vertical) {
                    val by = mbY * 4 + seg
                    val qx = mbX * 4 + e
                    (qx - 1, by, qx, by)
                  } else {
                    val bx = mbX * 4 + seg
                    val qy = mbY * 4 + e
                    (bx, qy - 1, bx, qy)
                  }
                val bS = boundaryStrength(st, atMbEdge, pMb, qMb, pBx, pBy, qBx, qBy)
                if (bS > 0) {
                  if (alpha > 0) {
                    val tc0 = if (bS < 4) H264Deblock.tc0Tab(bS - 1)(idxA) else 0
                    var r = 0
                    while (r < 4) {
                      val q0Idx =
                        if (vertical)
                          (mbY * 16 + seg * 4 + r) * st.pw + mbX * 16 + e * 4
                        else
                          (mbY * 16 + e * 4) * st.pw + mbX * 16 + seg * 4 + r
                      H264Deblock.filterLumaLine(st.reconY, q0Idx,
                        if (vertical) 1 else st.pw, bS, alpha, beta, tc0)
                      r += 1
                    }
                  }
                  // chroma edges ride luma edges 0 and 2; two chroma
                  // lines per luma segment (4:2:0 subsampling)
                  if ((cAlpha > 0 || cAlpha2 > 0) && (e == 0 || e == 2)) {
                    val cTc0 = if (bS < 4) H264Deblock.tc0Tab(bS - 1)(cIdxA) else 0
                    val cTc02 = if (bS < 4) H264Deblock.tc0Tab(bS - 1)(cIdxA2) else 0
                    var r = 0
                    while (r < 2) {
                      val q0Idx =
                        if (vertical)
                          (mbY * 8 + seg * 2 + r) * st.cw + mbX * 8 + e * 2
                        else
                          (mbY * 8 + e * 2) * st.cw + mbX * 8 + seg * 2 + r
                      val step = if (vertical) 1 else st.cw
                      if (cAlpha > 0)
                        H264Deblock.filterChromaLine(st.reconCb, q0Idx, step, bS, cAlpha, cBeta, cTc0)
                      if (cAlpha2 > 0)
                        H264Deblock.filterChromaLine(st.reconCr, q0Idx, step, bS, cAlpha2, cBeta2, cTc02)
                      r += 1
                    }
                  }
                }
                seg += 1
              }
            }
          }
          e += 1
        }
      }

      direction(vertical = true)
      direction(vertical = false)
      mb += 1
    }
  }

  private def clearNz(st: PicState, mbX: Int, mbY: Int): Unit = {
    var i = 0
    while (i < 4) {
      var j = 0
      while (j < 4) { st.nzY((mbY * 4 + i) * st.bw4 + mbX * 4 + j) = 0; j += 1 }
      j = 0
      while (j < 2 && i < 2) {
        st.nzCb((mbY * 2 + i) * st.cbw4 + mbX * 2 + j) = 0
        st.nzCr((mbY * 2 + i) * st.cbw4 + mbX * 2 + j) = 0
        j += 1
      }
      i += 1
    }
  }

  /** encode one frame as a single slice: IDR for frame 0, P when a
    * reference is supplied (temporal prediction — motion search, skip
    * runs, inter residuals), I otherwise. Returns the NAL plus the
    * reconstructed picture state, which becomes the next frame's
    * reference (closed loop, same reconstruction the decoder computes).
    */
  /** encode one frame as `slices` slice NALs (MB-row-aligned split;
    * §7.4.4 neighbour availability stops at slice boundaries, so each
    * slice is independently decodable given SPS/PPS — the unit of
    * intra-frame parallel decode)
    */
  private def encodeFrame(yuv: Yuv, frameIdx: Int, qp: Int, pcm: Boolean,
      refs: IndexedSeq[PicState], searchRange: Int, halfPel: Boolean,
      quarterPel: Boolean,
      deblock: Boolean, slices: Int, cabac: Boolean = false,
      transform8x8: Boolean = false,
      numRefL0: Int = 1,
      bSlice: Boolean = false, l1: IndexedSeq[PicState] = IndexedSeq.empty,
      frameNum: Int = -1, pocLsb: Int = -1,
      parts: Boolean = false, wpEnabled: Boolean = false,
      spatialDirect: Boolean = true,
      aqp: Boolean = false, chromaModes: Boolean = false,
      wpImplicitB: Boolean = false,
      scal: ScalingMatrices = ScalingMatrices.Flat,
      reorderL0: Boolean = false): (Seq[Array[Byte]], PicState) = {
    val mbW = (yuv.w + 15) / 16; val mbH = (yuv.h + 15) / 16
    val st = new PicState(mbW, mbH)
    st.scal = scal
    st.frameNum = (if (frameNum >= 0) frameNum else frameIdx) % (1 << 12)
    // the reorder capability swaps the two most-recent references and
    // SIGNALS the swap via ref_pic_list_modification — analysis, coded
    // ref_idx, and the decoder's §8.2.4.3 reordering all see the same
    // list, so the closed loop stays exact
    val refsL0: IndexedSeq[PicState] =
      if (reorderL0 && refs.size >= 2) IndexedSeq(refs(1), refs(0)) ++ refs.drop(2)
      else refs
    // the picture's POC must be live DURING encoding, not set by the
    // caller afterwards: temporal direct's tb = poc_cur - poc_ref runs
    // inside the B-MB competition, and an encoder deriving with a stale
    // poc 0 would pick motion the decoder never reconstructs
    if (pocLsb >= 0) st.poc = pocLsb
    val srcY = pad(yuv.y, yuv.w, yuv.h, st.pw, st.ph)
    val srcCb = pad(yuv.cb, yuv.w / 2, yuv.h / 2, st.cw, st.ch)
    val srcCr = pad(yuv.cr, yuv.w / 2, yuv.h / 2, st.cw, st.ch)
    val idr = frameIdx == 0
    val pSlice = refs.nonEmpty && !idr && !bSlice
    require(!bSlice || (refs.nonEmpty && l1.nonEmpty), "B frame needs both lists")
    // a slice must not declare more active references than the DPB holds
    // (the first P frame after an IDR has one): override the PPS default
    // down when short
    val numRefActive = if (pSlice) math.min(numRefL0, refs.size) else 0
    // explicit WP (§8.4.2.3.2): one global (w, o) least-bias luma fit
    // per reference from the plane means — w = mean(src)/mean(ref) at
    // denom 32 catches fades/dissolves; chroma stays identity (flag 0).
    // logWD 5 keeps w inside the 8-bit spec range for any gain <= 4x.
    val wpCtx: WpCtx =
      if (bSlice && wpImplicitB)
        // §8.4.2.3.1 implicit bi weights from the three POCs (no table
        // in the slice header; the decoder re-derives the same pair)
        implicitWpCtx(st.poc, refs.map(_.poc), l1.map(_.poc))
      else if (!wpEnabled || !pSlice) null
      else {
        def mean(a: Array[Byte]): Double = {
          var t = 0L; var i = 0
          while (i < a.length) { t += a(i) & 0xff; i += 1 }
          t.toDouble / a.length
        }
        val ms = mean(srcY)
        val log2 = 5
        val lw = Array.ofDim[Int](2, math.max(numRefActive, 1))
        val lo = Array.ofDim[Int](2, math.max(numRefActive, 1))
        var i = 0
        while (i < numRefActive) {
          val mr = mean(refs(i).reconY)
          val w = math.max(-128, math.min(127,
            math.round(ms * (1 << log2) / math.max(mr, 1.0)).toInt))
          val o = math.max(-128, math.min(127,
            math.round(ms - w * mr / (1 << log2)).toInt))
          lw(0)(i) = w; lo(0)(i) = o
          i += 1
        }
        lw(1)(0) = 1 << log2
        val cw = Array.fill(2, math.max(numRefActive, 1), 2)(1 << log2)
        val co = Array.fill(2, math.max(numRefActive, 1), 2)(0)
        new WpCtx(log2, log2, lw, lo, cw, co)
      }
    // MB-row-aligned split while the picture has enough rows (the
    // historical emission, byte-pinned by the bench fixtures); a
    // single-MB-row picture falls back to MB-granular splits — §7.4.4
    // slices may start at any macroblock, and availability/deblocking
    // are slice-index-based on both sides, not row-based
    val totalMbs = mbW * mbH
    val nSlices = math.max(1, math.min(slices, totalMbs))
    val rowAligned = mbH >= nSlices
    val nals = Seq.newBuilder[Array[Byte]]
    var s = 0
    while (s < nSlices) {
      val startMb =
        if (rowAligned) ((mbH.toLong * s) / nSlices).toInt * mbW
        else ((totalMbs.toLong * s) / nSlices).toInt
      val endMb =
        if (rowAligned) ((mbH.toLong * (s + 1)) / nSlices).toInt * mbW
        else ((totalMbs.toLong * (s + 1)) / nSlices).toInt
      st.curSlice = s
      val bw = new H264Writer.BitWriter
      bw.ue(startMb)           // first_mb_in_slice
      // slice_type, the "all slices of this picture" variants (+5)
      bw.ue(if (bSlice) 6 else if (pSlice) 5 else 7)
      bw.ue(0)                 // pps_id
      bw.u(12, (if (frameNum >= 0) frameNum else frameIdx) % (1 << 12))
      if (idr) bw.ue(0)        // idr_pic_id
      if (pocLsb >= 0) bw.u(8, pocLsb % 256) // pic_order_cnt_lsb (poc type 0)
      if (bSlice) bw.u1(if (spatialDirect) 1 else 0) // direct_spatial_mv_pred_flag
      if (pSlice) {
        if (numRefActive != numRefL0) {
          bw.u1(1)             // num_ref_idx_active_override_flag
          bw.ue(numRefActive - 1)
        } else bw.u1(0)
        if (reorderL0 && refs.size >= 2) {
          // §7.3.3.1: one short-term op moves the older reference to
          // refIdx 0 (picNum = CurrPicNum - absDiff), then end
          bw.u1(1)             // ref_pic_list_modification_flag_l0
          val maxPic = 1 << 12
          val absDiff = ((st.frameNum - refs(1).frameNum) % maxPic + maxPic) % maxPic
          bw.ue(0); bw.ue(absDiff - 1)
          bw.ue(3)
        } else bw.u1(0)        // ref_pic_list_modification_flag_l0
        if (wpCtx != null) {   // pred_weight_table (§7.3.3.2)
          bw.ue(wpCtx.lumaLog2)
          bw.ue(wpCtx.chromaLog2)
          var i = 0
          while (i < numRefActive) {
            bw.u1(1)           // luma_weight_l0_flag
            bw.se(wpCtx.lw(0)(i)); bw.se(wpCtx.lo(0)(i))
            bw.u1(0)           // chroma_weight_l0_flag: identity
            i += 1
          }
        }
      } else if (bSlice) {
        bw.u1(0)               // no override: PPS defaults 1/1
        bw.u1(0)               // ref_pic_list_modification_flag_l0
        bw.u1(0)               // ref_pic_list_modification_flag_l1
      }
      // dec_ref_pic_marking only rides reference pictures (B is non-ref)
      if (!bSlice) {
        if (idr) { bw.u1(0); bw.u1(0) } // no_output_of_prior_pics, long_term_reference
        else bw.u1(0)          // adaptive_ref_pic_marking_mode_flag
      }
      if (cabac && (pSlice || bSlice)) bw.ue(0) // cabac_init_idc (repo-local uniform init)
      bw.se(qp - 26)           // slice_qp_delta
      if (deblock) {
        bw.ue(0)               // disable_deblocking_filter_idc: filter on
        bw.se(0)               // slice_alpha_c0_offset_div2
        bw.se(0)               // slice_beta_offset_div2
      } else
        bw.ue(1)               // disable_deblocking_filter_idc: off
      if (cabac) {
        if (bSlice)
          encodeBRangeCabac(st, refs, l1, bw, qp, srcY, srcCb, srcCr,
            searchRange, halfPel, quarterPel, startMb, endMb, spatialDirect,
            wpCtx, tryParts = parts)
        else if (pSlice)
          encodePRangeCabac(st, refsL0, bw, qp, srcY, srcCb, srcCr, searchRange,
            halfPel, quarterPel, startMb, endMb, numRefActive, parts, wpCtx,
            aqp)
        else
          encodeIRangeCabac(st, bw, qp, srcY, srcCb, srcCr, startMb, endMb,
            t8 = transform8x8, aqp = aqp, chromaModes = chromaModes)
      } else if (bSlice)
        encodeBRange(st, refs, l1, bw, qp, srcY, srcCb, srcCr, searchRange,
          halfPel, quarterPel, startMb, endMb, spatialDirect, wpCtx,
          tryParts = parts)
      else if (pSlice)
        encodePRange(st, refsL0, bw, qp, srcY, srcCb, srcCr, searchRange,
          halfPel, quarterPel, startMb, endMb, numRefActive, parts, wpCtx,
          aqp)
      else
        encodeIRange(st, bw, qp, pcm, srcY, srcCb, srcCr, startMb, endMb,
          transform8x8, aqp, chromaModes)
      val nalRefIdc = if (idr) 3 else if (bSlice) 0 else 2
      val nalType = if (idr) 5 else 1
      // the CABAC flush already emitted the stop bit and byte-aligned;
      // rbspTrailing would append a spurious trailing byte there
      nals += H264Writer.nal(nalRefIdc, nalType,
        if (cabac) bw.alignZero().rbspBytes() else bw.rbspTrailing())
      s += 1
    }
    // in-loop: the FILTERED picture is the next reference on both sides
    if (deblock) deblockPicture(st, 0, 0)
    (nals.result(), st)
  }

  /** the P-slice macroblock loop over [startMb, endMb); `refs` is the
    * L0 list (most recent first), `numRefActive` the slice header's
    * num_ref_idx_l0_active (ref_idx is coded per MB only above 1) */
  private def encodePRange(st: PicState, refs: IndexedSeq[PicState],
      bw: H264Writer.BitWriter,
      qp: Int, srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      searchRange: Int, halfPel: Boolean, quarterPel: Boolean,
      startMb: Int, endMb: Int, numRefActive: Int = 1,
      parts: Boolean = false, wp: WpCtx = null,
      aqp: Boolean = false): Unit = {
    val mbW = st.mbW
    // running decoder-visible QP — see encodePRangeCabac
    var qpCur = qp
    var skipRun = 0
    var mb = startMb
    while (mb < endMb) {
      val mbX = mb % mbW; val mbY = mb / mbW
      st.sliceOfMb(mb) = st.curSlice
      val qpT = if (aqp) aqpTarget(qp, srcY, st.pw, mbX, mbY) else qp
      val (refIdx, mvx, mvy, mc, sad16) =
        choosePMb(st, refs.take(numRefActive), mbX, mbY, qpT, srcY, srcCb,
          srcCr, searchRange, halfPel, quarterPel, wp)
      val cand =
        if (!parts) null
        else analysePParts(st, refs(0), mbX, mbY, srcY, searchRange,
          halfPel, quarterPel)
      val usePart = cand != null && cand.cost < sad16
      // intra-in-P competition (scene cuts / uncovered regions): only
      // evaluated when motion compensation failed badly — the SAD gate
      // keeps the extra intra analysis off the smooth-motion hot path,
      // and the bounded i16Beats early-exits the rejected evaluations
      // (decision-identical to the r14 "i16Sad + 96 < interBest" form)
      val interBest = if (usePart) cand.cost else sad16
      val useIntra = interBest > 1500 &&
        i16Beats(st, mbX, mbY, srcY, interBest - 96)
      val (sx, sy) = skipMv(st, mbX, mbY)
      if (useIntra) {
        bw.ue(skipRun); skipRun = 0
        intraInPCount.incrementAndGet()
        val imc = analyseMbI16(st, mbX, mbY, qpT, srcY, srcCb, srcCr)
        writeMbI16(bw, st, mbX, mbY, imc, typeOffset = 5, qpDelta = qpT - qpCur)
        qpCur = qpT
        reconstructMb(st, mbX, mbY, qpT, imc)
      } else if (!usePart && refIdx == 0 && mc == null && mvx == sx && mvy == sy) {
        skipRun += 1
        clearNz(st, mbX, mbY)
        reconstructPMb(st, refs(0), mbX, mbY, qpCur, mvx, mvy, null, wp = wp)
      } else if (usePart) {
        bw.ue(skipRun); skipRun = 0
        writePPartsMb(bw, st, refs, mbX, mbY, qp, cand, numRefActive,
          srcY, srcCb, srcCr, wp)
      } else {
        bw.ue(skipRun); skipRun = 0
        if (mc != null) {
          writePMb(bw, st, mbX, mbY, mvx, mvy, mc, numRefActive, refIdx,
            qpDelta = qpT - qpCur)
          qpCur = qpT
        } else writePMb(bw, st, mbX, mbY, mvx, mvy, mc, numRefActive, refIdx)
        // cbp 0 codes no delta: the decoder reconstructs at the running QP
        reconstructPMb(st, refs(refIdx), mbX, mbY,
          if (mc != null) qpT else qpCur, mvx, mvy, mc, refIdx, wp)
      }
      mb += 1
    }
    if (skipRun > 0) bw.ue(skipRun) // trailing skipped MBs
  }

  /** the I-slice macroblock loop over [startMb, endMb) */
  private def encodeIRange(st: PicState, bw: H264Writer.BitWriter, qp: Int,
      pcm: Boolean, srcY: Array[Byte], srcCb: Array[Byte], srcCr: Array[Byte],
      startMb: Int, endMb: Int, transform8x8: Boolean = false,
      aqp: Boolean = false, chromaModes: Boolean = false): Unit = {
    // running decoder-visible QP (§7.4.5) — see encodeIRangeCabac
    var qpCur = qp
    var mb = startMb
    while (mb < endMb) {
      val mbX = mb % st.mbW
      val mbY = mb / st.mbW
      st.sliceOfMb(mb) = st.curSlice
      if (pcm) {
          bw.ue(25) // I_PCM
          bw.alignZero()
          val x0 = mbX * 16; val y0 = mbY * 16
          var r = 0
          while (r < 16) {
            var c = 0
            while (c < 16) { bw.u(8, srcY((y0 + r) * st.pw + x0 + c) & 0xff); c += 1 }
            r += 1
          }
          def pcmChroma(src: Array[Byte]): Unit = {
            val cx0 = mbX * 8; val cy0 = mbY * 8
            var r = 0
            while (r < 8) {
              var c = 0
              while (c < 8) { bw.u(8, src((cy0 + r) * st.cw + cx0 + c) & 0xff); c += 1 }
              r += 1
            }
          }
          pcmChroma(srcCb)
          pcmChroma(srcCr)
          // PCM reconstructs to the raw samples; nC counts are 16 (§9.2.1)
          st.pcmMb(mbY * st.mbW + mbX) = true
          r = 0
          while (r < 16) {
            var c = 0
            while (c < 16) { st.reconY((y0 + r) * st.pw + x0 + c) = srcY((y0 + r) * st.pw + x0 + c); c += 1 }
            r += 1
          }
          val cx0 = mbX * 8; val cy0 = mbY * 8
          r = 0
          while (r < 8) {
            var c = 0
            while (c < 8) {
              st.reconCb((cy0 + r) * st.cw + cx0 + c) = srcCb((cy0 + r) * st.cw + cx0 + c)
              st.reconCr((cy0 + r) * st.cw + cx0 + c) = srcCr((cy0 + r) * st.cw + cx0 + c)
              c += 1
            }
            r += 1
          }
          var i = 0
          while (i < 4) {
            var j = 0
            while (j < 4) { st.nzY((mbY * 4 + i) * st.bw4 + mbX * 4 + j) = 16; j += 1 }
            j = 0
            while (j < 2 && i < 2) {
              st.nzCb((mbY * 2 + i) * st.cbw4 + mbX * 2 + j) = 16
              st.nzCr((mbY * 2 + i) * st.cbw4 + mbX * 2 + j) = 16
              j += 1
            }
            i += 1
          }
        } else {
        val qpT = if (aqp) aqpTarget(qp, srcY, st.pw, mbX, mbY) else qp
        tryIntraNxN(st, mbX, mbY, qpT, srcY, srcCb, srcCr, transform8x8,
            chromaModes) match {
          case IntraSel.I4(modes, m) => // recon already in place
            if (m.cbp != 0) {
              writeMbI4(bw, st, mbX, mbY, modes, m, t8pps = transform8x8,
                qpDelta = qpT - qpCur)
              qpCur = qpT
            } else {
              writeMbI4(bw, st, mbX, mbY, modes, m, t8pps = transform8x8)
              st.mbQp(mbY * st.mbW + mbX) = qpCur // no delta coded
            }
          case IntraSel.I8(modes, zig8, m) => // recon already in place
            if (m.cbp != 0) {
              writeMbI8(bw, st, mbX, mbY, modes, zig8, m, qpDelta = qpT - qpCur)
              qpCur = qpT
            } else {
              writeMbI8(bw, st, mbX, mbY, modes, zig8, m)
              st.mbQp(mbY * st.mbW + mbX) = qpCur
            }
          case IntraSel.I16 =>
            val mc = analyseMbI16(st, mbX, mbY, qpT, srcY, srcCb, srcCr,
              chromaModes)
            writeMbI16(bw, st, mbX, mbY, mc, qpDelta = qpT - qpCur)
            qpCur = qpT
            reconstructMb(st, mbX, mbY, qpT, mc)
        }
      }
      mb += 1
    }
  }

  /** Encode frames into one Annex-B stream: SPS + PPS, an IDR first
    * frame, then P frames predicting from the previous reconstruction
    * (`allIntra = true` forces I everywhere; `pcm = true` codes every MB
    * as I_PCM — bit-exact, implies all-intra). `searchRange` is the
    * integer-pel full-search motion radius. `slicesPerFrame > 1` splits
    * each picture into MB-row-aligned slices (independently decodable —
    * the intra-frame parallelism unit big frames decode with).
    */
  /** SEI user_data_unregistered (payload type 5): the LOUD in-stream
    * marker for this codec's documented non-conformances (reassigned
    * CAVLC Table 9-5 codewords; repo-local CABAC context init) — a
    * conforming decoder ignores SEI, a investigating human finds the
    * warning in the bytes themselves
    */
  private def seiUserData(msg: String): Array[Byte] = {
    val uuid = "graft-h264-codec".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val data = uuid ++ msg.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val bw = new H264Writer.BitWriter
    bw.u(8, 5) // user_data_unregistered
    var sz = data.length
    while (sz >= 255) { bw.u(8, 255); sz -= 255 }
    bw.u(8, sz)
    data.foreach(b => bw.u(8, b & 0xff))
    bw.rbspTrailing()
  }

  /** the conformance-envelope text for the stream's marker SEI (the
    * cabac-init-fp token is machine-checked at decode) */
  private def seiMsg(cabac: Boolean, transform8x8: Boolean): String =
    if (cabac && H264Cabac.initTables.isDefined)
      f"cabac-init-fp=${H264Cabac.initFingerprint}%016x; CABAC ctx init from provided 9.3.1.1 tables; condTermFlag simplification remains" +
        (if (transform8x8) "; cat-5 sig/last ctx buckets repo-local (not Table 9-43)" else "") +
        "; self-decode verified only"
    else if (cabac)
      f"cabac-init-fp=${H264Cabac.initFingerprint}%016x; NONCONFORMANT: CABAC context init is repo-local uniform (not Tables 9-12..9-33)" +
        (if (transform8x8) "; cat-5 sig/last ctx buckets repo-local (not Table 9-43)" else "") +
        "; self-decode only"
    else
      "NONCONFORMANT: 3 CAVLC Table 9-5 codewords reassigned (see graft README); self-decode verified only"

  /** B-frame GOP coding (IBPBP…): anchors (I then P) at even display
    * indices reference the previous anchor; one non-reference B between
    * consecutive anchors bi-predicts from both (an odd display tail
    * becomes a trailing P). POC type 0 carries display order (poc =
    * 2·display) so the decoder's output reorder restores input order;
    * frame_num increments per reference picture only, a non-ref B takes
    * PrevRefFrameNum + 1 (§7.4.3).
    */
  private def encodeBGop(frames: Seq[Yuv], qp: Int, searchRange: Int,
      halfPel: Boolean, quarterPel: Boolean, deblock: Boolean,
      slicesPerFrame: Int, cabac: Boolean, transform8x8: Boolean,
      parts: Boolean = false, spatialDirect: Boolean = true,
      wpImplicit: Boolean = false): Array[Byte] = {
    val head = frames.head
    val out = new java.io.ByteArrayOutputStream()
    // DPB must hold BOTH anchors around a B (sliding-window, 2 deep)
    out.write(H264Writer.nal(3, 7, codecSps(head.w, head.h,
      high = transform8x8, maxRefFrames = 2, pocType = 0)))
    out.write(H264Writer.nal(3, 8, codecPps(cabac, transform8x8, numRefL0 = 1,
      weightedBipredIdc = if (wpImplicit) 2 else 0)))
    out.write(H264Writer.nal(0, 6, seiUserData(seiMsg(cabac, transform8x8))))
    val n = frames.length
    // coding order over display indices. The default ladder is IBPBP
    // (one B centered between anchors: implicit weights degenerate to
    // the trivial 32/32 average); under wpImplicit the ladder places
    // TWO Bs per anchor gap (I B B P), so tb/td = 1/3 and 2/3 derive
    // the non-trivial (43,21)/(22,42) weight pairs the tier exists for
    val order = scala.collection.mutable.ArrayBuffer.empty[(Int, Char)]
    order += ((0, 'I'))
    if (wpImplicit) {
      var a = 3
      while (a < n) {
        order += ((a, 'P')); order += ((a - 2, 'B')); order += ((a - 1, 'B'))
        a += 3
      }
      val lastAnchor = a - 3
      if (lastAnchor + 1 < n) { // tail gap: anchor the last frame
        order += ((n - 1, 'P'))
        var d = lastAnchor + 1
        while (d < n - 1) { order += ((d, 'B')); d += 1 }
      }
    } else {
      var a = 2
      while (a < n) { order += ((a, 'P')); order += ((a - 1, 'B')); a += 2 }
      if (n % 2 == 0 && n > 1) order += ((n - 1, 'P'))
    }
    val dpb = ArrayBuffer.empty[PicState] // anchors, most recent first
    var refCount = 0
    var codingIdx = 0
    order.foreach { case (disp, kind) =>
      val poc = 2 * disp
      val (nals, st) = kind match {
        case 'I' =>
          encodeFrame(frames(disp), 0, qp, pcm = false, IndexedSeq.empty,
            searchRange, halfPel, quarterPel, deblock, slicesPerFrame,
            cabac, transform8x8, numRefL0 = 1, frameNum = 0, pocLsb = poc)
        case 'P' =>
          encodeFrame(frames(disp), codingIdx, qp, pcm = false,
            IndexedSeq(dpb.head), searchRange, halfPel, quarterPel, deblock,
            slicesPerFrame, cabac, transform8x8, numRefL0 = 1,
            frameNum = refCount, pocLsb = poc, parts = parts)
        case _ =>
          val past = dpb.filter(_.poc < poc).maxBy(_.poc)
          val fut = dpb.filter(_.poc > poc).minBy(_.poc)
          encodeFrame(frames(disp), codingIdx, qp, pcm = false,
            IndexedSeq(past), searchRange, halfPel, quarterPel, deblock,
            slicesPerFrame, cabac, transform8x8, numRefL0 = 1,
            bSlice = true, l1 = IndexedSeq(fut),
            frameNum = refCount, pocLsb = poc, spatialDirect = spatialDirect,
            wpImplicitB = wpImplicit, parts = parts)
      }
      st.poc = poc
      if (kind != 'B') { // B frames are non-reference: the DPB skips them
        dpb.prepend(st)
        while (dpb.size > 2) dpb.remove(dpb.size - 1)
        refCount += 1
      }
      nals.foreach(out.write)
      codingIdx += 1
    }
    out.toByteArray
  }

  def encode(frames: Seq[Yuv], qp: Int = 12, pcm: Boolean = false,
      allIntra: Boolean = false, searchRange: Int = 4,
      halfPel: Boolean = true, quarterPel: Boolean = true,
      deblock: Boolean = true, slicesPerFrame: Int = 1,
      cabac: Boolean = false, transform8x8: Boolean = false,
      multiRef: Boolean = false, bframes: Boolean = false,
      parts: Boolean = false, weightedPred: Boolean = false,
      tdirect: Boolean = false, aqp: Boolean = false,
      chromaModes: Boolean = false,
      wpImplicit: Boolean = false, cqm: Boolean = false,
      reorder: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "empty GOP")
    val head = frames.head
    require(head.w % 2 == 0 && head.h % 2 == 0, "4:2:0 requires even dimensions")
    require(qp >= 0 && qp <= 51, s"QP $qp out of [0,51]")
    require(searchRange >= 0 && searchRange <= 16, s"searchRange $searchRange out of [0,16]")
    require(slicesPerFrame >= 1, s"slicesPerFrame $slicesPerFrame must be >= 1")
    require(!(pcm && cabac), "I_PCM tier is CAVLC-only (pcm + cabac unsupported)")
    require(!(transform8x8 && pcm), "I_PCM tier never uses the 8x8 transform")
    require(!(multiRef && (pcm || allIntra)),
      "multiRef needs P slices (pcm/allIntra tiers have none)")
    require(!(bframes && (pcm || allIntra)),
      "bframes needs inter anchors (pcm/allIntra tiers have none)")
    require(!(bframes && multiRef),
      "bframes x multiRef untested combination (one tier per stream)")
    require(!(parts && (pcm || allIntra)),
      "parts needs P slices (pcm/allIntra tiers have none)")
    require(!(parts && multiRef),
      "parts x multiRef untested combination (one tier per stream)")
    require(!(weightedPred && (pcm || allIntra)),
      "weightedPred needs P slices (pcm/allIntra tiers have none)")
    require(!(weightedPred && (multiRef || bframes)),
      "weightedPred x multiRef/bframes untested combination (one tier per stream)")
    require(!tdirect || bframes, "tdirect modifies the bframes tier")
    require(!wpImplicit || bframes, "wpImplicit modifies the bframes tier")
    require(!(wpImplicit && weightedPred),
      "wpImplicit x weightedPred untested combination (one tier per stream)")
    require(!(wpImplicit && tdirect),
      "wpImplicit x tdirect untested combination (one tier per stream)")
    require(!(aqp && (pcm || multiRef || bframes || parts || weightedPred ||
        transform8x8)),
      "aqp rides the default I16/I4 + P-16x16 shape (one tier per stream)")
    require(!(chromaModes && (pcm || multiRef || bframes || parts ||
        weightedPred || transform8x8)),
      "chromaModes rides the default I16/I4 + P-16x16 shape (one tier per stream)")
    require(!(cqm && (pcm || multiRef || bframes || parts || weightedPred ||
        transform8x8 || aqp || chromaModes)),
      "cqm rides the default I16/I4 + P-16x16 shape (one tier per stream)")
    require(!reorder || multiRef,
      "reorder rides the multiRef tier (a 1-deep DPB has nothing to reorder)")
    frames.foreach(f => require(f.w == head.w && f.h == head.h, "frames must share dims"))
    if (bframes) return encodeBGop(frames, qp, searchRange, halfPel,
      quarterPel, deblock, slicesPerFrame, cabac, transform8x8, parts,
      spatialDirect = !tdirect, wpImplicit = wpImplicit)
    // a 2-deep DPB with num_ref_idx_l0_active 2: per-MB ref_idx selects
    // the previous or the previous-but-one reconstructed picture
    val numRefL0 = if (multiRef) 2 else 1
    val out = new java.io.ByteArrayOutputStream()
    out.write(H264Writer.nal(3, 7, codecSps(head.w, head.h,
      high = transform8x8 || cqm, maxRefFrames = numRefL0, cqm = cqm)))
    out.write(H264Writer.nal(3, 8, codecPps(cabac, transform8x8, numRefL0,
      weightedPred)))
    val scalM = if (cqm) cqmMatrices else ScalingMatrices.Flat
    // the cabac-init-fp token is MACHINE-CHECKABLE: decode() extracts it
    // and refuses a stream whose init-table fingerprint differs from the
    // decoding JVM's (ADVICE r12 — a table/JVM mismatch used to surface
    // as garbage pixels, not a diagnosable error)
    out.write(H264Writer.nal(0, 6, seiUserData(seiMsg(cabac, transform8x8))))
    val refs = ArrayBuffer.empty[PicState] // DPB, most recent first
    frames.zipWithIndex.foreach { case (f, i) =>
      // the PCM tier stays filter-free: deblocking raw macroblocks would
      // break the bit-exact lossless guarantee that tier exists for
      val (nals, state) = encodeFrame(f, i, qp, pcm,
        if (pcm || allIntra) IndexedSeq.empty else refs.toIndexedSeq,
        searchRange, halfPel, quarterPel,
        deblock && !pcm, slicesPerFrame, cabac, transform8x8, numRefL0,
        parts = parts, wpEnabled = weightedPred, aqp = aqp,
        chromaModes = chromaModes, scal = scalM, reorderL0 = reorder)
      nals.foreach(out.write)
      refs.prepend(state)
      while (refs.size > numRefL0) refs.remove(refs.size - 1)
    }
    out.toByteArray
  }

  // ------------------------------------------------------------- decode

  private final case class CodecPps(picInitQp: Int, deblockingPresent: Boolean,
      cabac: Boolean, transform8x8: Boolean = false, numRefL0: Int = 1,
      weightedPred: Boolean = false, weightedBipredIdc: Int = 0,
      cqpOff: Int = 0,
      // pic_scaling_matrix lists, already resolved through fall-back
      // rule B against the active SPS; None = the SPS lists (or flat)
      scaling: Option[H264.ScalingLists] = None,
      cqpOff2: Int = 0)

  /** §8.2.1.1 picture-order-count state (poc type 0): MSB wraparound
    * tracking against the previous REFERENCE picture. `compute` is
    * idempotent across the slices of one picture (same lsb → same msb →
    * same prev update), so multi-slice pictures call it per slice safely.
    */
  private final class PocCtx {
    private var prevMsb = 0
    private var prevLsb = 0
    def compute(lsb: Int, maxLsb: Int, idr: Boolean, isRef: Boolean): Int = {
      if (idr) { prevMsb = 0; prevLsb = 0 }
      val msb =
        if (lsb < prevLsb && (prevLsb - lsb) >= maxLsb / 2) prevMsb + maxLsb
        else if (lsb > prevLsb && (lsb - prevLsb) > maxLsb / 2) prevMsb - maxLsb
        else prevMsb
      if (isRef) { prevMsb = msb; prevLsb = lsb }
      msb + lsb
    }
  }

  /** per-slice deblocking request (§7.3.3): off, or on with α/β offsets
    * and whether filtering crosses slice boundaries (idc 0 vs 2)
    */
  private sealed trait DeblockReq
  private case object DeblockOff extends DeblockReq
  private final case class DeblockOn(aOff: Int, bOff: Int,
      acrossSlices: Boolean) extends DeblockReq

  /** the PPS fields the pixel decoder needs beyond [[H264.parsePps]];
    * `spsScaling` is the active SPS's resolved scaling lists (None =
    * flat), the fall-back target of a pic_scaling_matrix (rule B)
    */
  private def parseCodecPps(r: H264.BitReader,
      spsScaling: Option[H264.ScalingLists] = None): CodecPps = {
    r.ue; r.ue // pps_id, sps_id
    val cabac = r.u1 == 1 // entropy_coding_mode_flag
    r.u1       // pic_order_present
    require(r.ue == 0, "FMO not supported")
    val numRefL0 = r.ue + 1 // num_ref_idx_l0_active default
    r.ue // num_ref_idx_l1 default (B slices refused downstream)
    val weightedPred = r.u1 == 1
    // 0 default, 1 explicit (pred_weight_table in B slices), 2 implicit
    // (POC-derived bi weights, §8.4.2.3.1 — accepted since round 15)
    val weightedBipredIdc = r.u(2)
    require(weightedBipredIdc <= 2, s"weighted_bipred_idc $weightedBipredIdc invalid")
    val picInitQp = 26 + r.se
    r.se // pic_init_qs
    // §8.5: QPc = Table 8-15 at Clip3(0, 51, QPy + chroma_qp_index_offset)
    // — real encoders routinely shift chroma quantization; round 15 it
    // threads through dequant and the deblock chroma thresholds (it was
    // parsed-and-ignored before: a silent wrong decode on foreign streams)
    val cqpOff = r.se
    require(cqpOff >= -12 && cqpOff <= 12,
      s"chroma_qp_index_offset $cqpOff out of the spec range [-12,12]")
    val deblk = r.u1 == 1
    r.u1 // constrained_intra_pred
    r.u1 // redundant_pic_cnt_present
    // §7.3.2.2 extension (High profile): transform_8x8_mode_flag +
    // scaling-matrix flag + second chroma qp offset
    var ppsScaling: Option[H264.ScalingLists] = None
    var cqpOff2 = cqpOff // the Cr offset defaults to the shared one
    val t8 =
      if (!r.moreRbspData) false
      else {
        val t = r.u1 == 1
        if (r.u1 == 1) // pic_scaling_matrix_present_flag (§7.3.2.2)
          ppsScaling = Some(H264.readScalingLists(r, 6 + (if (t) 2 else 0),
            spsScaling.orNull))
        // distinct Cr offset (§7.3.2.2): per-plane chroma QP threading
        // through dequant and the deblock thresholds (round 15)
        val off2 = r.se
        require(off2 >= -12 && off2 <= 12,
          s"second_chroma_qp_index_offset $off2 out of the spec range [-12,12]")
        cqpOff2 = off2
        t
      }
    CodecPps(picInitQp, deblk, cabac, t8, numRefL0, weightedPred,
      weightedBipredIdc, cqpOff, ppsScaling, cqpOff2)
  }

  /** CAVLC residual parse of one coded MB (16 full 4x4 luma blocks gated
    * by the 8x8 cbp bits + chroma DC/AC) into `m`, with nC bookkeeping —
    * the mirror of [[writePResidual]], shared by the P and Intra_4x4
    * decode branches
    */
  private def readResidualCavlc(r: H264.BitReader, st: PicState,
      mbX: Int, mbY: Int, m: PMbCoeffs): Unit = {
    val bX = mbX * 4; val bY = mbY * 4
    var blk = 0
    while (blk < 16) {
      val ax = bX + blkX(blk); val ay = bY + blkY(blk)
      val tc =
        if (((m.cbpLuma >> (blk / 4)) & 1) != 0)
          H264Cavlc.readBlockInto(r, 16, st.nC(st.nzY, st.bw4, ax, ay), m.lumaZig(blk))
        else 0
      st.nzY(ay * st.bw4 + ax) = tc
      blk += 1
    }
    readChromaResidual(r, st, mbX, mbY, m)
  }

  /** the chroma half of the CAVLC residual parser — mirror of
    * [[writeChromaResidual]], shared by the P/I4, Intra_16x16, and
    * Intra_8x8 decode branches
    */
  private def readChromaResidual(r: H264.BitReader, st: PicState,
      mbX: Int, mbY: Int, m: PMbCoeffs): Unit = {
    if (m.cbpChroma != 0) {
      H264Cavlc.readBlockInto(r, 4, -1, m.cbDcZig)
      H264Cavlc.readBlockInto(r, 4, -1, m.crDcZig)
    }
    val cX = mbX * 2; val cY = mbY * 2
    def chromaAc(nz: Array[Int], acZig: Array[Array[Int]]): Unit = {
      var cb = 0
      while (cb < 4) {
        val ax = cX + cb % 2; val ay = cY + cb / 2
        val tc =
          if (m.cbpChroma == 2)
            H264Cavlc.readBlockInto(r, 15, st.nC(nz, st.cbw4, ax, ay), acZig(cb))
          else 0
        nz(ay * st.cbw4 + ax) = tc
        cb += 1
      }
    }
    chromaAc(st.nzCb, m.cbAcZig)
    chromaAc(st.nzCr, m.crAcZig)
  }

  /** decode one slice (I or P) into the picture state; returns the
    * slice's deblocking request (the caller collects one per slice and
    * arbitrates at picture completion)
    */
  /** §7.3.3.1 ref_pic_list_modification for one list + the §8.2.4.3
    * reordering process: short-term ops (idc 0/1) walk picNumPred by
    * abs_diff_pic_num over the MaxPicNum wrap, locate the target in the
    * DPB by picNum (frame coding: picNum = frame_num, wrapped below the
    * current), and insert it at the next refIdx with the later duplicate
    * removed (§8.2.4.3.2). Long-term ops (idc 2) are refused loudly —
    * this decoder marks no long-term references, so a conforming stream
    * can't address one. Returns the modified list truncated to
    * numRefActive. The flag itself has already been read by the caller.
    */
  private def parseRefListMod(r: H264.BitReader, init: IndexedSeq[PicState],
      dpb: IndexedSeq[PicState], numRefActive: Int, curPicNum: Int,
      maxPicNum: Int): IndexedSeq[PicState] = {
    val list = scala.collection.mutable.ArrayBuffer.from(init)
    var refIdx = 0
    var picNumPred = curPicNum
    var continue = true
    var ops = 0
    while (continue) {
      val idc = r.ue
      idc match {
        case 0 | 1 =>
          val absDiff = r.ue + 1
          require(absDiff <= maxPicNum / 2,
            s"abs_diff_pic_num $absDiff out of range (MaxPicNum $maxPicNum)")
          var noWrap = if (idc == 0) picNumPred - absDiff else picNumPred + absDiff
          if (noWrap < 0) noWrap += maxPicNum
          else if (noWrap >= maxPicNum) noWrap -= maxPicNum
          picNumPred = noWrap
          val picNum = if (noWrap > curPicNum) noWrap - maxPicNum else noWrap
          def pn(p: PicState): Int =
            if (p.frameNum > curPicNum) p.frameNum - maxPicNum else p.frameNum
          val pic = dpb.find(pn(_) == picNum).getOrElse(sys.error(
            s"ref_pic_list_modification targets picNum $picNum, not in the " +
              s"DPB (${dpb.map(pn).mkString(",")})"))
          list.insert(refIdx, pic)
          var i = refIdx + 1
          var removed = false
          while (i < list.length && !removed) {
            if (list(i) eq pic) { list.remove(i); removed = true } else i += 1
          }
          refIdx += 1
          ops += 1
        case 2 => sys.error("long-term ref_pic_list_modification unsupported " +
          "(no long-term references are ever marked)")
        case 3 => continue = false
        case other => sys.error(s"modification_of_pic_nums_idc $other invalid")
      }
      require(ops <= maxPicNum, "runaway ref_pic_list_modification")
    }
    refModCount.addAndGet(ops.toLong)
    require(list.length >= numRefActive,
      s"modified reference list (${list.length}) shorter than " +
        s"num_ref_idx_active $numRefActive")
    list.take(numRefActive).toIndexedSeq
  }

  /** modification ops applied per decoded slice — engagement counter for
    * the reorder tier specs */
  val refModCount = new java.util.concurrent.atomic.AtomicLong

  private def decodeSlice(rbsp: Array[Byte], sps: H264.Sps, pps: CodecPps,
      nalType: Int, refIdc: Int, st: PicState,
      refs: IndexedSeq[PicState], pocCtx: PocCtx): DeblockReq = {
    val r = new H264.BitReader(rbsp)
    st.cqpOff = pps.cqpOff // §8.5 chroma QP offsets, live for this picture
    st.cqpOff2 = pps.cqpOff2
    val firstMb = r.ue // slices start anywhere; caller sequences them into one picture
    require(firstMb < st.mbW * st.mbH, s"first_mb_in_slice $firstMb outside the picture")
    val sliceType = r.ue
    val isI = sliceType == 2 || sliceType == 7
    val isP = sliceType == 0 || sliceType == 5
    val isB = sliceType == 1 || sliceType == 6
    require(isI || isP || isB, s"slice_type $sliceType unsupported (I/P/B only)")
    r.ue // pps_id
    val frameNum = r.u(sps.log2MaxFrameNum)
    st.frameNum = frameNum // short-term picNum for list modification
    val idr = nalType == 5
    if (idr) r.ue // idr_pic_id
    sps.pocType match {
      case 0 =>
        val lsb = r.u(sps.log2MaxPocLsb)
        st.poc = pocCtx.compute(lsb, 1 << sps.log2MaxPocLsb, idr, refIdc != 0)
      case 2 =>
        // §8.2.1.3 without the wrap offset (decode order; never drives
        // reordering — type-2 streams are I/P-only by construction)
        st.poc = 2 * frameNum - (if (refIdc != 0) 0 else 1)
      case other => sys.error(s"poc type $other unsupported")
    }
    var spatialDirect = true
    if (isB) {
      require(sps.pocType == 0,
        "B slice with poc type 2 unsupported (display order needs explicit POC)")
      spatialDirect = r.u1 == 1 // 0 = temporal direct (§8.4.1.2.3)
    }
    // default B reference list order (§8.2.4.2.3): L0 = closer-past
    // first then future, L1 = closer-future first then past; the P list
    // (decode-order recency) stays as passed
    lazy val bL0Init: IndexedSeq[PicState] =
      refs.filter(_.poc < st.poc).sortBy(-_.poc) ++
        refs.filter(_.poc > st.poc).sortBy(_.poc)
    lazy val bL1Init: IndexedSeq[PicState] =
      refs.filter(_.poc > st.poc).sortBy(_.poc) ++
        refs.filter(_.poc < st.poc).sortBy(-_.poc)
    // num_ref_idx_lX_active: the PPS default unless the slice overrides
    var numRefActive = pps.numRefL0
    var numRefActiveL1 = 1
    // the lists the slice actually predicts from, after any §8.2.4.3
    // ref_pic_list_modification (round 15 — previously refused)
    var pL0: IndexedSeq[PicState] = refs
    var bL0: IndexedSeq[PicState] = null
    var bL1: IndexedSeq[PicState] = null
    val maxPicNum = 1 << sps.log2MaxFrameNum
    if (isP) {
      if (r.u1 == 1) numRefActive = r.ue + 1 // override -> l0_active_minus1
      require(numRefActive <= refs.length,
        s"num_ref_idx_l0_active $numRefActive exceeds the ${refs.length} " +
          "decoded reference(s)")
      if (r.u1 == 1) // ref_pic_list_modification_flag_l0
        pL0 = parseRefListMod(r, refs, refs, numRefActive, frameNum, maxPicNum)
    } else if (isB) {
      if (r.u1 == 1) { numRefActive = r.ue + 1; numRefActiveL1 = r.ue + 1 }
      else numRefActive = pps.numRefL0
      require(bL0Init.nonEmpty && bL1Init.nonEmpty,
        "B slice without both a past and a future reference picture")
      require(numRefActive <= bL0Init.length && numRefActiveL1 <= bL1Init.length,
        s"B list actives ($numRefActive,$numRefActiveL1) exceed the " +
          s"(${bL0Init.length},${bL1Init.length}) decoded references")
      bL0 = if (r.u1 == 1) // ref_pic_list_modification_flag_l0
        parseRefListMod(r, bL0Init, refs, numRefActive, frameNum, maxPicNum)
      else bL0Init
      bL1 = if (r.u1 == 1) // ref_pic_list_modification_flag_l1
        parseRefListMod(r, bL1Init, refs, numRefActiveL1, frameNum, maxPicNum)
      else bL1Init
    }
    // §7.3.3: pred_weight_table rides P slices under weighted_pred_flag
    // and B slices under weighted_bipred_idc == 1 (explicit); idc 2
    // derives the bi weights from POC distances with NO table in the
    // header (§8.4.2.3.1)
    val wp: WpCtx =
      if (isP && pps.weightedPred)
        parsePredWeightTable(r, numRefActive, 0)
      else if (isB && pps.weightedBipredIdc == 1)
        parsePredWeightTable(r, numRefActive, numRefActiveL1)
      else if (isB && pps.weightedBipredIdc == 2)
        implicitWpCtx(st.poc, bL0.map(_.poc), bL1.map(_.poc))
      else null
    if (refIdc != 0) {
      if (idr) { r.u1; r.u1 }
      else require(r.u1 == 0, "adaptive ref pic marking not supported")
    }
    // cabac_init_idc: selects the P-slice init set when §9.3.1.1 tables
    // are available ([[H264Cabac.initTables]]); no-op under uniform init
    val cabacInitIdc = if (pps.cabac && (isP || isB)) r.ue else 0
    require(cabacInitIdc <= 2, s"cabac_init_idc $cabacInitIdc out of range")
    var qp = pps.picInitQp + r.se
    // deblocking control (§7.3.3): idc 0 = filter across slice
    // boundaries, 1 = off, 2 = filter but NOT across slice boundaries
    // (distinct from 0 only in multi-slice pictures — the caller
    // refuses that combination loudly); offsets shift the α/β/t_C0
    // lookups
    val deblockReq: DeblockReq =
      if (!pps.deblockingPresent) DeblockOn(0, 0, acrossSlices = true)
      else {
        val idc = r.ue
        require(idc <= 2, s"disable_deblocking_filter_idc $idc out of range")
        if (idc == 1) DeblockOff
        else {
          val aOff = 2 * r.se
          val bOff = 2 * r.se
          require(aOff >= -12 && aOff <= 12 && bOff >= -12 && bOff <= 12,
            s"deblocking offsets ($aOff,$bOff) out of the spec range")
          DeblockOn(aOff, bOff, acrossSlices = idc == 0)
        }
      }
    val mbW = st.mbW; val mbH = st.mbH
    // reused per-MB residual scratch: every field a reconstruct reads is
    // gated by the cbp the parser just set, so cross-MB staleness can't
    // leak (allocation of the 28 zigzag arrays per coded MB profiled at
    // ~4% of decode)
    val pmPool = new PMbCoeffs
    lazy val m16Pool = new MbCoeffs
    lazy val zig8Pool: Array[Array[Int]] = Array.fill(4)(new Array[Int](64))
    if (pps.cabac) {
      if (isP) require(refs.nonEmpty,
        "P slice with no reference picture (stream must open with an IDR)")
      decodeSliceDataCabac(r, st, if (isB) bL0 else pL0, isP, qp, firstMb,
        cabacInitIdc, t8pps = pps.transform8x8, numRefActive = numRefActive,
        numRefActiveL1 = numRefActiveL1,
        isB = isB, l1 = if (isB) bL1 else IndexedSeq.empty, wp = wp,
        spatialDirect = spatialDirect)
      return deblockReq
    }
    if (isB) {
      val l0 = bL0; val l1 = bL1
      var mb = firstMb
      while (mb < mbW * mbH && r.moreRbspData) {
        var skipRun = r.ue
        require(skipRun <= mbW * mbH - mb, s"mb_skip_run $skipRun overruns the picture")
        while (skipRun > 0) { // B_Skip: spatial-direct motion, no residual
          val mbX = mb % mbW; val mbY = mb / mbW
          st.sliceOfMb(mb) = st.curSlice
          val dm = deriveDirect(st, l0, l1, mbX, mbY, spatialDirect)
          clearNz(st, mbX, mbY)
          reconstructBMb(st, l0, l1, mbX, mbY, qp, directBChoice(dm, null), wp)
          mb += 1
          skipRun -= 1
        }
        if (mb < mbW * mbH && r.moreRbspData) {
          val mbX = mb % mbW; val mbY = mb / mbW
          st.sliceOfMb(mb) = st.curSlice
          val mbType = r.ue
          require(mbType <= 48, s"B mb_type $mbType out of the Table 7-14 range")
          if (mbType >= 23) {
            // intra-in-B (§7.4.5: B mb_type 23..48 maps to the I-slice
            // space shifted by 23)
            qp = decodeIntraMbCavlc(r, st, pps, mbX, mbY, qp, mbType - 23,
              pmPool, m16Pool, zig8Pool)
            mb += 1
          } else if (mbType >= 4) {
            // partitioned B MB (round 15): Table 7-14 two-partition
            // types and B_8x8 with Table 7-18 sub-MB types
            val subTypes: Array[Int] =
              if (mbType == 22) Array.fill(4) {
                val t = r.ue
                require(t <= 12, s"B sub_mb_type $t out of the Table 7-18 range")
                t
              } else null
            val dm =
              if (mbType == 22 && subTypes.exists(_ == 0))
                deriveDirect(st, l0, l1, mbX, mbY, spatialDirect)
              else null
            val raw = readBRawParts(mbType, subTypes,
              (_, _, list) => {
                val n = if (list == 0) numRefActive else numRefActiveL1
                val v = if (n <= 1) 0 else if (n == 2) 1 - r.u1 else r.ue
                require(v < n, s"B ref_idx $v >= num_ref_idx_active $n")
                v
              },
              (_, _, _, _, _) => (r.se, r.se))
            val parts = deriveBParts(st, l0, l1, mbX, mbY, raw, dm)
            bPartMbCount.incrementAndGet()
            val cbpCode = r.ue
            require(cbpCode < 48, s"inter coded_block_pattern code $cbpCode out of range")
            val cbp = cbpInterFromCode(cbpCode)
            val mc = if (cbp == 0) null else {
              val m = pmPool
              m.cbp = cbp
              qp = qpWrap(qp, r.se) // mb_qp_delta
              readResidualCavlc(r, st, mbX, mbY, m)
              m
            }
            if (mc == null) clearNz(st, mbX, mbY)
            reconstructInterParts(st, l0, l1, mbX, mbY, qp, parts, mc, wp)
            mb += 1
          } else {
          var ref0 = -1; var ref1 = -1
          var mv0x = 0; var mv0y = 0; var mv1x = 0; var mv1y = 0
          var dmDirect: DirectMv = null
          if (mbType == 0) {
            val dm = deriveDirect(st, l0, l1, mbX, mbY, spatialDirect)
            dmDirect = dm
            ref0 = dm.ref0; ref1 = dm.ref1
            mv0x = dm.quad(0); mv0y = dm.quad(1); mv1x = dm.quad(2); mv1y = dm.quad(3)
          } else {
            // ref_idx_lX te(v) (both slots precede any mvd, §7.3.5.1)
            def readRefTeB(n: Int): Int = {
              val v = if (n <= 1) 0 else if (n == 2) 1 - r.u1 else r.ue
              require(v < n, s"B ref_idx $v >= num_ref_idx_active $n")
              v
            }
            if (mbType == 1 || mbType == 3) ref0 = readRefTeB(numRefActive)
            if (mbType == 2 || mbType == 3) ref1 = readRefTeB(numRefActiveL1)
            if (ref0 >= 0) {
              val dx = r.se; val dy = r.se
              val (px, py) = predictMv(st, mbX, mbY, ref0, list = 0)
              mv0x = px + dx; mv0y = py + dy
            }
            if (ref1 >= 0) {
              val dx = r.se; val dy = r.se
              val (px, py) = predictMv(st, mbX, mbY, ref1, list = 1)
              mv1x = px + dx; mv1y = py + dy
            }
          }
          val cbpCode = r.ue
          require(cbpCode < 48, s"inter coded_block_pattern code $cbpCode out of range")
          val cbp = cbpInterFromCode(cbpCode)
          val mc = if (cbp == 0) null else {
            val m = pmPool
            m.cbp = cbp
            qp = qpWrap(qp, r.se) // mb_qp_delta
            readResidualCavlc(r, st, mbX, mbY, m)
            m
          }
          if (mc == null) clearNz(st, mbX, mbY)
          reconstructBMb(st, l0, l1, mbX, mbY, qp,
            if (dmDirect != null) directBChoice(dmDirect, mc)
            else BMbChoice(mbType, ref0, ref1, mv0x, mv0y, mv1x, mv1y, mc), wp)
          mb += 1
          }
        }
      }
      return deblockReq
    }
    if (isP) {
      require(refs.nonEmpty, "P slice with no reference picture (stream must open with an IDR)")
      var mb = firstMb
      // slice end = rbsp exhaustion (more_rbsp_data), picture end = MB count
      while (mb < mbW * mbH && r.moreRbspData) {
        var skipRun = r.ue
        require(skipRun <= mbW * mbH - mb, s"mb_skip_run $skipRun overruns the picture")
        while (skipRun > 0) {
          val mbX = mb % mbW; val mbY = mb / mbW
          st.sliceOfMb(mb) = st.curSlice
          val (sx, sy) = skipMv(st, mbX, mbY)
          clearNz(st, mbX, mbY)
          reconstructPMb(st, pL0(0), mbX, mbY, qp, sx, sy, null, wp = wp)
          mb += 1
          skipRun -= 1
        }
        if (mb < mbW * mbH && r.moreRbspData) {
          val mbX = mb % mbW; val mbY = mb / mbW
          st.sliceOfMb(mb) = st.curSlice
          val mbType = r.ue
          require(mbType <= 30,
            s"P mb_type $mbType out of the Table 7-13 range")
          if (mbType >= 5) {
            // intra-in-P (§7.4.5: P mb_type 5..30 maps to the I-slice
            // space shifted by 5) — scene cuts / uncovered regions
            qp = decodeIntraMbCavlc(r, st, pps, mbX, mbY, qp, mbType - 5,
              pmPool, m16Pool, zig8Pool)
            mb += 1
          } else {
          // ref_idx_l0, te(v): one inverted bit when the range is [0,1],
          // plain ue above (§9.1.1)
          def readRefTe(): Int = {
            val v =
              if (numRefActive <= 1) 0
              else if (numRefActive == 2) 1 - r.u1
              else r.ue
            require(v < numRefActive,
              s"ref_idx_l0 $v >= num_ref_idx_l0_active $numRefActive")
            v
          }
          if (mbType == 0) {
            val refIdx = readRefTe()
            val mvdX = r.se; val mvdY = r.se
            val (px, py) = predictMv(st, mbX, mbY, refIdx)
            val mvx = px + mvdX; val mvy = py + mvdY
            val cbpCode = r.ue
            require(cbpCode < 48, s"inter coded_block_pattern code $cbpCode out of range")
            val cbp = cbpInterFromCode(cbpCode)
            val mc = if (cbp == 0) null else {
              val m = pmPool
              m.cbp = cbp
              qp = qpWrap(qp, r.se) // mb_qp_delta
              readResidualCavlc(r, st, mbX, mbY, m)
              m
            }
            if (mc == null) clearNz(st, mbX, mbY)
            reconstructPMb(st, pL0(refIdx), mbX, mbY, qp, mvx, mvy, mc, refIdx, wp)
          } else {
            // Sub-16x16 partitions (§7.3.5.1/.2 syntax order: sub_mb_type
            // x4, then ref_idx per MB partition, then mvd per partition
            // in decode order; P_8x8ref0 infers every ref_idx = 0)
            val subTypes: Array[Int] =
              if (mbType >= 3) Array.fill(4) {
                val t = r.ue
                require(t <= 3, s"P sub_mb_type $t out of range")
                t
              } else null
            val geo = pPartGeometry(mbType, subTypes)
            val nRefSlots = if (mbType >= 3) 4 else 2
            val refSlots = new Array[Int](nRefSlots)
            if (mbType != 4) {
              var k = 0
              while (k < nRefSlots) { refSlots(k) = readRefTe(); k += 1 }
            }
            val mvds = geo.map(_ => (r.se, r.se))
            // derive MVs in decode order: partition k's predictor reads
            // the final motion of partitions < k (recorded as we go)
            st.beginPartitionedMb(mbX, mbY)
            val parts = geo.zip(mvds).map { case ((ox4, oy4, w4, h4, slot), (dx, dy)) =>
              val refIdx = refSlots(slot)
              val bx4 = mbX * 4 + ox4; val by4 = mbY * 4 + oy4
              val (px, py) = predictMvPart(st, bx4, by4, w4, h4, refIdx, 0)
              val mvx = px + dx; val mvy = py + dy
              st.setMotion4(bx4, by4, w4, h4, refIdx, mvx, mvy, -1, 0, 0,
                pL0(refIdx).poc)
              InterPart(ox4, oy4, w4, h4, refIdx, mvx, mvy)
            }
            val cbpCode = r.ue
            require(cbpCode < 48, s"inter coded_block_pattern code $cbpCode out of range")
            val cbp = cbpInterFromCode(cbpCode)
            val mc = if (cbp == 0) null else {
              val m = pmPool
              m.cbp = cbp
              qp = qpWrap(qp, r.se) // mb_qp_delta
              readResidualCavlc(r, st, mbX, mbY, m)
              m
            }
            if (mc == null) clearNz(st, mbX, mbY)
            reconstructInterParts(st, pL0, pL0, mbX, mbY, qp, parts, mc, wp)
          }
          mb += 1
          }
        }
      }
      return deblockReq
    }
    var mb = firstMb
    while (mb < mbW * mbH && r.moreRbspData) {
      val mbX = mb % mbW; val mbY = mb / mbW
      st.sliceOfMb(mb) = st.curSlice
      val mbType = r.ue
      qp = decodeIntraMbCavlc(r, st, pps, mbX, mbY, qp, mbType,
        pmPool, m16Pool, zig8Pool)
      mb += 1
    }
    deblockReq
  }

  /** decode one intra macroblock body, CAVLC — `mbType` already mapped
    * into the I-slice space (I slices pass it through; intra-in-P
    * subtracts 5, intra-in-B 23). Returns the updated slice qp. */
  private def decodeIntraMbCavlc(r: H264.BitReader, st: PicState,
      pps: CodecPps, mbX: Int, mbY: Int, qpIn: Int, mbType: Int,
      pmPool: PMbCoeffs, m16Pool: MbCoeffs,
      zig8Pool: Array[Array[Int]]): Int = {
    var qp = qpIn
    locally {
      if (mbType == 25) { // I_PCM
        r.align()
        st.pcmMb(mbY * st.mbW + mbX) = true
        val x0 = mbX * 16; val y0 = mbY * 16
        var i = 0
        while (i < 256) {
          st.reconY((y0 + i / 16) * st.pw + x0 + i % 16) = r.u(8).toByte
          i += 1
        }
        val cx0 = mbX * 8; val cy0 = mbY * 8
        i = 0
        while (i < 64) {
          st.reconCb((cy0 + i / 8) * st.cw + cx0 + i % 8) = r.u(8).toByte
          i += 1
        }
        i = 0
        while (i < 64) {
          st.reconCr((cy0 + i / 8) * st.cw + cx0 + i % 8) = r.u(8).toByte
          i += 1
        }
        i = 0
        while (i < 4) {
          var j = 0
          while (j < 4) { st.nzY((mbY * 4 + i) * st.bw4 + mbX * 4 + j) = 16; j += 1 }
          j = 0
          while (j < 2 && i < 2) {
            st.nzCb((mbY * 2 + i) * st.cbw4 + mbX * 2 + j) = 16
            st.nzCr((mbY * 2 + i) * st.cbw4 + mbX * 2 + j) = 16
            j += 1
          }
          i += 1
        }
      } else if (mbType == 0 && pps.transform8x8 && r.u1 == 1) {
        // I_NxN with transform_size_8x8_flag = 1 (Intra_8x8, High)
        val modes = new Array[Int](4)
        var b = 0
        while (b < 4) {
          val bx = mbX * 4 + (b % 2) * 2; val by = mbY * 4 + (b / 2) * 2
          val pm = predI4Mode(st, bx, by)
          modes(b) =
            if (r.u1 == 1) pm
            else { val rem = r.u(3); if (rem < pm) rem else rem + 1 }
          setI8ModeCells(st, mbX, mbY, b, modes(b))
          b += 1
        }
        val chromaMode8 = r.ue // intra_chroma_pred_mode (§8.3.4)
        require(chromaMode8 <= 3, s"intra_chroma_pred_mode $chromaMode8 out of range")
        val cbpCode = r.ue
        require(cbpCode < 48, s"intra coded_block_pattern code $cbpCode out of range")
        val m = pmPool
        m.cbp = cbpIntraFromCode(cbpCode)
        val zig8 = zig8Pool
        if (m.cbp != 0) {
          qp = qpWrap(qp, r.se) // mb_qp_delta
          readI8LumaResidual(r, st, mbX, mbY, m.cbpLuma, zig8)
          readChromaResidual(r, st, mbX, mbY, m)
        } else clearNz(st, mbX, mbY)
        st.mbQp(mbY * st.mbW + mbX) = qp
        st.trans8(mbY * st.mbW + mbX) = true
        reconstructLumaI8(st, mbX, mbY, qp, modes, zig8, m.cbpLuma)
        intraChromaRecon(st, mbX, mbY, chromaQp(qp + st.cqpOff), m.cbpChroma,
          m.cbDcZig, m.cbAcZig, m.crDcZig, m.crAcZig, chromaMode8,
          qpcCrIn = chromaQp(qp + st.cqpOff2))
      } else if (mbType == 0) { // I_NxN (Intra_4x4, 4x4 transform)
        val modes = new Array[Int](16)
        var blk = 0
        while (blk < 16) {
          val bx = mbX * 4 + blkX(blk); val by = mbY * 4 + blkY(blk)
          val pm = predI4Mode(st, bx, by)
          modes(blk) =
            if (r.u1 == 1) pm
            else { val rem = r.u(3); if (rem < pm) rem else rem + 1 }
          st.i4Mode(by * st.bw4 + bx) = modes(blk)
          blk += 1
        }
        val chromaMode4 = r.ue // intra_chroma_pred_mode (§8.3.4)
        require(chromaMode4 <= 3, s"intra_chroma_pred_mode $chromaMode4 out of range")
        val cbpCode = r.ue
        require(cbpCode < 48, s"intra coded_block_pattern code $cbpCode out of range")
        val m = pmPool
        m.cbp = cbpIntraFromCode(cbpCode)
        if (m.cbp != 0) {
          qp = qpWrap(qp, r.se) // mb_qp_delta
          readResidualCavlc(r, st, mbX, mbY, m)
        } else clearNz(st, mbX, mbY)
        st.mbQp(mbY * st.mbW + mbX) = qp
        reconstructLumaI4(st, mbX, mbY, qp, modes, m.lumaZig, m.cbpLuma)
        intraChromaRecon(st, mbX, mbY, chromaQp(qp + st.cqpOff), m.cbpChroma,
          m.cbDcZig, m.cbAcZig, m.crDcZig, m.crAcZig, chromaMode4,
          qpcCrIn = chromaQp(qp + st.cqpOff2))
      } else {
        require(mbType >= 1 && mbType <= 24,
          s"mb_type $mbType unsupported (Intra_16x16, Intra_4x4, and I_PCM only)")
        val m = mbType - 1
        val lumaFlag = m / 12
        val rem = m % 12
        val cbpChroma = rem / 4
        val predMode = rem % 4
        // neighbor-availability validation (mirrors predLuma4's requires):
        // a corrupt/external stream claiming e.g. vertical in MB row 0
        // must fail as a parse error, not read out-of-bounds recon or
        // silently predict from wrong samples
        require(i16Modes(st, mbX, mbY).contains(predMode),
          s"Intra_16x16 pred mode $predMode unavailable at mb ($mbX,$mbY): " +
            s"required neighbor(s) missing (available: ${i16Modes(st, mbX, mbY).sorted.mkString(",")})")
        val mc = m16Pool
        mc.predMode = predMode
        mc.cbpLuma = if (lumaFlag == 1) 15 else 0
        mc.cbpChroma = cbpChroma
        mc.chromaMode = r.ue // intra_chroma_pred_mode (§8.3.4)
        require(mc.chromaMode <= 3,
          s"intra_chroma_pred_mode ${mc.chromaMode} out of range")
        qp = qpWrap(qp, r.se) // mb_qp_delta
        val bX = mbX * 4; val bY = mbY * 4
        H264Cavlc.readBlockInto(r, 16, st.nC(st.nzY, st.bw4, bX, bY), mc.lumaDcZig)
        var blk = 0
        while (blk < 16) {
          val ax = bX + blkX(blk); val ay = bY + blkY(blk)
          val tc =
            if (mc.cbpLuma != 0)
              H264Cavlc.readBlockInto(r, 15, st.nC(st.nzY, st.bw4, ax, ay),
                mc.lumaAcZig(blk))
            else 0
          st.nzY(ay * st.bw4 + ax) = tc
          blk += 1
        }
        if (mc.cbpChroma != 0) {
          H264Cavlc.readBlockInto(r, 4, -1, mc.cbDcZig)
          H264Cavlc.readBlockInto(r, 4, -1, mc.crDcZig)
        }
        val cX = mbX * 2; val cY = mbY * 2
        def chromaAc(nz: Array[Int], acZig: Array[Array[Int]]): Unit = {
          var cb = 0
          while (cb < 4) {
            val ax = cX + cb % 2; val ay = cY + cb / 2
            val tc =
              if (mc.cbpChroma == 2)
                H264Cavlc.readBlockInto(r, 15, st.nC(nz, st.cbw4, ax, ay), acZig(cb))
              else 0
            nz(ay * st.cbw4 + ax) = tc
            cb += 1
          }
        }
        chromaAc(st.nzCb, mc.cbAcZig)
        chromaAc(st.nzCr, mc.crAcZig)
        reconstructMb(st, mbX, mbY, qp, mc)
      }
    }
    qp
  }

  /** decode the first `maxFrames` frames of an Annex-B stream produced by
    * [[encode]] (or any stream within the documented subset)
    */
  def decode(stream: Array[Byte], maxFrames: Int = Int.MaxValue): Vector[Yuv] = {
    var sps: H264.Sps = null
    var pps: CodecPps = null
    // decoded-picture buffer, most recent first — §8.2.4.2.1's default
    // P-slice L0 order (descending PicNum) for the monotonic-frame_num
    // streams this subset accepts; sized by the SPS max_num_ref_frames
    // (sliding-window marking; adaptive marking is refused in the header)
    val refs = ArrayBuffer.empty[PicState]
    var cur: PicState = null // picture being assembled from its slices
    var curIsRef = true      // nal_ref_idc != 0 -> joins the DPB
    // CABAC init-table fingerprint from the stream's graft SEI (None for
    // foreign streams, which carry no such marker)
    var streamInitFp: Option[Long] = None
    val sliceDeblocks = ArrayBuffer.empty[DeblockReq] // one per decoded slice
    val out = ArrayBuffer.empty[Yuv]
    val pocCtx = new PocCtx
    // output reorder (§C.2-shaped, bounded): poc-type-0 streams hold one
    // picture back and emit in ascending POC (this encoder's B depth);
    // type-2 streams emit in decode order (depth 0, the pending buffer
    // drains immediately). A foreign stream needing deeper reorder trips
    // the monotone check below instead of emitting out of order.
    val pending = ArrayBuffer.empty[(Int, Yuv)] // (poc, picture)
    var lastOutPoc = Int.MinValue
    // PicState free list: non-reference pictures return after their crop,
    // evicted/IDR-cleared references after leaving the DPB
    val pool = ArrayBuffer.empty[PicState]
    def acquirePic(mbW: Int, mbH: Int): PicState = {
      var i = pool.size - 1
      while (i >= 0) {
        if (pool(i).mbW == mbW && pool(i).mbH == mbH) {
          val p = pool.remove(i)
          p.reset()
          return p
        }
        i -= 1
      }
      new PicState(mbW, mbH)
    }
    def reorderDepth: Int = if (sps != null && sps.pocType == 0) 1 else 0
    // §8.5.9 active scaling matrices: PPS lists over SPS lists over flat,
    // rebuilt (cheap: 6x6x16 + 2x6x64 multiplies) only when the resolved
    // list object changes — i.e. once per SPS/PPS activation, not per
    // picture
    var scalCacheKey: AnyRef = null
    var scalCache: ScalingMatrices = ScalingMatrices.Flat
    def activeScal(): ScalingMatrices = {
      val lists = pps.scaling.orElse(sps.scaling).orNull
      if (lists == null) ScalingMatrices.Flat
      else {
        if (!(lists eq scalCacheKey)) {
          scalCache = new ScalingMatrices(lists.s4, lists.s8)
          scalCacheKey = lists
        }
        scalCache
      }
    }
    def emitMin(): Unit = {
      var best = 0
      var i = 1
      while (i < pending.size) { if (pending(i)._1 < pending(best)._1) best = i; i += 1 }
      val (poc, yuv) = pending.remove(best)
      require(poc > lastOutPoc,
        s"output reorder depth exceeded: POC $poc after $lastOutPoc already " +
          "emitted (stream reorders deeper than this subset's 1-frame delay)")
      lastOutPoc = poc
      out += yuv
    }
    def flushPending(): Unit = while (pending.nonEmpty) emitMin()

    // a picture completes when the next one starts (first_mb_in_slice 0)
    // or the stream ends: filter in-loop, emit, and promote to reference.
    // Per the refuse-loudly subset contract, mixed per-slice deblocking
    // settings and idc=2 (no filtering across slice boundaries) in a
    // multi-slice picture are refused rather than decoded wrong — the
    // picture-wide filter below applies ONE setting and crosses slice
    // boundaries.
    def finishPicture(): Unit = if (cur != null) {
      require(!cur.sliceOfMb.contains(-1),
        "picture has macroblocks covered by no slice — truncated or torn stream")
      val reqs = sliceDeblocks.distinct
      require(reqs.size == 1,
        s"mixed per-slice deblocking settings $reqs unsupported " +
          "(picture-wide filter; refuse-loudly subset)")
      reqs.head match {
        case DeblockOff => ()
        case DeblockOn(aOff, bOff, acrossSlices) =>
          require(acrossSlices || sliceDeblocks.size == 1,
            "disable_deblocking_filter_idc=2 (no filtering across slice " +
              "boundaries) unsupported in multi-slice pictures " +
              "(refuse-loudly subset)")
          deblockPicture(cur, aOff, bOff)
      }
      pending += ((cur.poc, Yuv(sps.width, sps.height,
        crop(cur.reconY, cur.pw, sps.width, sps.height),
        crop(cur.reconCb, cur.cw, sps.width / 2, sps.height / 2),
        crop(cur.reconCr, cur.cw, sps.width / 2, sps.height / 2))))
      if (curIsRef) {
        refs.prepend(cur)
        val cap = math.max(1, sps.maxNumRefFrames)
        while (refs.size > cap) pool += refs.remove(refs.size - 1)
      } else pool += cur // emitted copy above; the state can be reused
      while (pending.size > reorderDepth) emitMin()
      cur = null
      sliceDeblocks.clear()
    }

    val nals = H264.nalUnits(stream).iterator
    var stop = false
    while (nals.hasNext && !stop) {
      val nal = nals.next()
      nal.nalType match {
        case 7 => sps = H264.parseSps(new H264.BitReader(H264.rbsp(nal.bytes, 1)))
        case 8 => pps = parseCodecPps(new H264.BitReader(H264.rbsp(nal.bytes, 1)),
          if (sps != null) sps.scaling else None)
        case 1 | 5 =>
          require(sps != null && pps != null, "VCL NAL before SPS/PPS")
          val rbsp = H264.rbsp(nal.bytes, 1)
          val firstMb = new H264.BitReader(rbsp).ue // peek the slice start
          if (firstMb == 0) {
            finishPicture()
            if (nal.nalType == 5) {
              // IDR: prior pictures all leave (no_output_of_prior_pics=0
              // semantics — emit, don't drop), POCs restart at 0
              flushPending()
              lastOutPoc = Int.MinValue
            }
            if (out.size >= maxFrames) stop = true
            else {
              if (nal.nalType == 5) { pool ++= refs; refs.clear() } // IDR resets the DPB
              val mbW = (sps.width + 15) / 16; val mbH = (sps.height + 15) / 16
              cur = acquirePic(mbW, mbH)
              cur.scal = activeScal()
              cur.curSlice = 0
              curIsRef = nal.refIdc != 0
            }
          } else {
            require(cur != null,
              s"continuation slice (first_mb $firstMb) with no open picture")
            cur.curSlice += 1
          }
          if (!stop) {
            // version gate BEFORE entropy decode: a CABAC stream encoded
            // under different init tables would desync the arithmetic
            // decoder into garbage — fail with the actual cause instead
            if (pps.cabac) streamInitFp.foreach { fp =>
              val here = H264Cabac.initFingerprint
              require(fp == here,
                f"CABAC init-table mismatch: stream encoded with fingerprint $fp%016x " +
                  f"but this JVM's tables fingerprint $here%016x " +
                  "(cabac-init.tsv present/absent/different at encode vs decode)")
            }
            sliceDeblocks += decodeSlice(rbsp, sps, pps, nal.nalType, nal.refIdc, cur,
              if (nal.nalType == 5) IndexedSeq.empty else refs.toIndexedSeq, pocCtx)
          }
        case 6 =>
          // graft's own user_data SEI: extract the machine-checkable
          // cabac-init-fp token (foreign SEI simply won't match)
          val txt = new String(H264.rbsp(nal.bytes, 1),
            java.nio.charset.StandardCharsets.ISO_8859_1)
          val m = "cabac-init-fp=([0-9a-f]{16})".r.findFirstMatchIn(txt)
          m.foreach(g => streamInitFp = Some(java.lang.Long.parseUnsignedLong(g.group(1), 16)))
        case _ => () // AUD / filler: ignored
      }
    }
    if (!stop) { finishPicture(); flushPending() }
    // a reordering stream can overshoot by the pictures the final flush
    // emitted past the request — trim to the contract
    if (out.size > maxFrames) out.take(maxFrames).toVector else out.toVector
  }
}
