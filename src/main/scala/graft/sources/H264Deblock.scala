package graft.sources

/** H.264 in-loop deblocking filter primitives (§8.7 of the public ITU-T
  * spec): the α/β edge-activity thresholds and the t_C0 clipping table
  * (Tables 8-16/8-17), plus the per-line luma and chroma edge filters.
  * The picture walk (edge order, boundary-strength derivation, qp
  * averaging) lives in [[H264Codec]], which owns the macroblock state;
  * this object is the stateless sample math, unit-testable directly.
  *
  * Both the encoder's reconstruction loop and the decoder run the SAME
  * filter after each frame's macroblocks reconstruct — the filter is
  * in-loop, so the filtered picture is the P-frame reference on both
  * sides (closed loop). Intra prediction correctly reads UNfiltered
  * neighbours: the whole-frame filter pass runs after reconstruction,
  * and filtering never feeds intra prediction or the current frame's
  * MC, so a raster-order frame-end pass is sample-exact with the
  * spec's filter-after-each-macroblock formulation.
  */
private[graft] object H264Deblock {

  /** Table 8-16: α threshold by indexA (0..51) */
  val alphaTab: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    4, 4, 5, 6, 7, 8, 9, 10, 12, 13, 15, 17, 20, 22, 25, 28,
    32, 36, 40, 45, 50, 56, 63, 71, 80, 90, 101, 113, 127, 144, 162, 182,
    203, 226, 255, 255)

  /** Table 8-16: β threshold by indexB (0..51) */
  val betaTab: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 6, 6, 7, 7, 8, 8,
    9, 9, 10, 10, 11, 11, 12, 12, 13, 13, 14, 14, 15, 15, 16, 16,
    17, 17, 18, 18)

  /** Table 8-17: t_C0 by (bS-1, indexA) for bS = 1..3 */
  val tc0Tab: Array[Array[Int]] = Array(
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1,
      1, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4, 5, 6, 6, 7, 8,
      9, 10, 11, 13),
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2,
      2, 2, 2, 3, 3, 3, 4, 4, 5, 5, 6, 7, 8, 8, 10, 11,
      12, 13, 15, 17),
    Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
      3, 3, 4, 4, 4, 5, 6, 6, 7, 8, 9, 10, 11, 13, 14, 16,
      18, 20, 23, 25))

  @inline private def clip255(v: Int): Int = if (v < 0) 0 else if (v > 255) 255 else v
  @inline private def clip3(lo: Int, hi: Int, v: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** Filter one perpendicular sample line of a LUMA edge in place.
    * `q0Idx` addresses sample q0; p-samples sit at `q0Idx - k*step`,
    * q-samples at `q0Idx + k*step` (step = 1 for vertical edges,
    * row-stride for horizontal). §8.7.2.3 (bS<4) / §8.7.2.4 (bS=4).
    */
  def filterLumaLine(pl: Array[Byte], q0Idx: Int, step: Int, bS: Int,
      alpha: Int, beta: Int, tc0: Int): Unit = {
    val p0 = pl(q0Idx - step) & 0xff
    val q0 = pl(q0Idx) & 0xff
    val p1 = pl(q0Idx - 2 * step) & 0xff
    val q1 = pl(q0Idx + step) & 0xff
    if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
        math.abs(q1 - q0) >= beta) return
    val p2 = pl(q0Idx - 3 * step) & 0xff
    val q2 = pl(q0Idx + 2 * step) & 0xff
    val ap = math.abs(p2 - p0) < beta
    val aq = math.abs(q2 - q0) < beta
    if (bS < 4) {
      val tc = tc0 + (if (ap) 1 else 0) + (if (aq) 1 else 0)
      val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
      pl(q0Idx - step) = clip255(p0 + delta).toByte
      pl(q0Idx) = clip255(q0 - delta).toByte
      if (ap)
        pl(q0Idx - 2 * step) =
          (p1 + clip3(-tc0, tc0, (p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1)).toByte
      if (aq)
        pl(q0Idx + step) =
          (q1 + clip3(-tc0, tc0, (q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1)).toByte
    } else {
      val smallGap = math.abs(p0 - q0) < ((alpha >> 2) + 2)
      if (ap && smallGap) {
        val p3 = pl(q0Idx - 4 * step) & 0xff
        pl(q0Idx - step) = ((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3).toByte
        pl(q0Idx - 2 * step) = ((p2 + p1 + p0 + q0 + 2) >> 2).toByte
        pl(q0Idx - 3 * step) = ((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3).toByte
      } else
        pl(q0Idx - step) = ((2 * p1 + p0 + q1 + 2) >> 2).toByte
      if (aq && smallGap) {
        val q3 = pl(q0Idx + 3 * step) & 0xff
        pl(q0Idx) = ((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3).toByte
        pl(q0Idx + step) = ((q2 + q1 + q0 + p0 + 2) >> 2).toByte
        pl(q0Idx + 2 * step) = ((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3).toByte
      } else
        pl(q0Idx) = ((2 * q1 + q0 + p1 + 2) >> 2).toByte
    }
  }

  /** Filter one perpendicular sample line of a CHROMA edge in place —
    * only p0/q0 move (§8.7.2.3/.4 chroma branches)
    */
  def filterChromaLine(pl: Array[Byte], q0Idx: Int, step: Int, bS: Int,
      alpha: Int, beta: Int, tc0: Int): Unit = {
    val p0 = pl(q0Idx - step) & 0xff
    val q0 = pl(q0Idx) & 0xff
    val p1 = pl(q0Idx - 2 * step) & 0xff
    val q1 = pl(q0Idx + step) & 0xff
    if (math.abs(p0 - q0) >= alpha || math.abs(p1 - p0) >= beta ||
        math.abs(q1 - q0) >= beta) return
    if (bS < 4) {
      val tc = tc0 + 1
      val delta = clip3(-tc, tc, (((q0 - p0) << 2) + (p1 - q1) + 4) >> 3)
      pl(q0Idx - step) = clip255(p0 + delta).toByte
      pl(q0Idx) = clip255(q0 - delta).toByte
    } else {
      pl(q0Idx - step) = ((2 * p1 + p0 + q1 + 2) >> 2).toByte
      pl(q0Idx) = ((2 * q1 + q0 + p1 + 2) >> 2).toByte
    }
  }
}
