package graft.sources

/** H.264 4x4 integer transform, Hadamard DC transforms, and the
  * quantisation tables (ITU-T H.264 §8.5; scaling in the well-documented
  * JM/Richardson formulation, where the dequant V tables absorb the
  * transform basis norms and the inverse transform ends in (x+32)>>6).
  * Encoder-side quantisation (MF tables, deadzone f = 2^qbits/3 for
  * intra) is not normative in the spec; the pair here is exactly
  * mutually inverse up to the quantisation error, which the codec specs
  * pin numerically (near-lossless reconstruction at QP 0).
  *
  * Everything operates on raster-order Int[16] blocks, in place.
  */
object H264Transform {

  /** zigzag index -> raster index, 4x4 (spec Figure 8-8) */
  val zigzag4x4: Array[Int] = Array(0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

  /** chroma QP mapping, spec Table 8-15 (identity below 30) */
  private val chromaQpTab: Array[Int] =
    (0 until 30).toArray ++ Array(29, 30, 31, 32, 32, 33, 34, 34, 35, 35,
      36, 36, 37, 37, 37, 38, 38, 38, 39, 39, 39, 39)
  def chromaQp(qp: Int): Int = chromaQpTab(math.max(0, math.min(51, qp)))

  // position class: 0 = (even,even), 1 = (odd,odd), 2 = mixed
  private val posClass: Array[Int] = Array.tabulate(16) { p =>
    val r = p / 4; val c = p % 4
    if (r % 2 == 0 && c % 2 == 0) 0 else if (r % 2 == 1 && c % 2 == 1) 1 else 2
  }
  // encoder multiplication factors MF (qp%6 x class) and decoder scales V
  private val mfTab: Array[Array[Int]] = Array(
    Array(13107, 5243, 8066), Array(11916, 4660, 7490), Array(10082, 4194, 6554),
    Array(9362, 3647, 5825), Array(8192, 3355, 5243), Array(7282, 2893, 4559))
  private val vTab: Array[Array[Int]] = Array(
    Array(10, 16, 13), Array(11, 18, 14), Array(13, 20, 16),
    Array(14, 23, 18), Array(16, 25, 20), Array(18, 29, 23))

  @inline def mf(qp: Int, pos: Int): Int = mfTab(qp % 6)(posClass(pos))
  @inline def v(qp: Int, pos: Int): Int = vTab(qp % 6)(posClass(pos))

  /** forward core transform C = T X T^t, T = [1 1 1 1; 2 1 -1 -2; 1 -1 -1 1; 1 -2 2 -1] */
  def forward4x4(b: Array[Int]): Unit = {
    var i = 0
    while (i < 4) { // rows
      val o = i * 4
      val s0 = b(o) + b(o + 3); val s1 = b(o + 1) + b(o + 2)
      val d0 = b(o) - b(o + 3); val d1 = b(o + 1) - b(o + 2)
      b(o) = s0 + s1; b(o + 2) = s0 - s1
      b(o + 1) = 2 * d0 + d1; b(o + 3) = d0 - 2 * d1
      i += 1
    }
    i = 0
    while (i < 4) { // columns
      val s0 = b(i) + b(i + 12); val s1 = b(i + 4) + b(i + 8)
      val d0 = b(i) - b(i + 12); val d1 = b(i + 4) - b(i + 8)
      b(i) = s0 + s1; b(i + 8) = s0 - s1
      b(i + 4) = 2 * d0 + d1; b(i + 12) = d0 - 2 * d1
      i += 1
    }
  }

  /** inverse core transform (§8.5.12.2 butterflies) incl. the final (x+32)>>6 */
  def inverse4x4(b: Array[Int]): Unit = {
    var i = 0
    while (i < 4) { // rows
      val o = i * 4
      val e0 = b(o) + b(o + 2); val e1 = b(o) - b(o + 2)
      val e2 = (b(o + 1) >> 1) - b(o + 3); val e3 = b(o + 1) + (b(o + 3) >> 1)
      b(o) = e0 + e3; b(o + 1) = e1 + e2; b(o + 2) = e1 - e2; b(o + 3) = e0 - e3
      i += 1
    }
    i = 0
    while (i < 4) { // columns
      val e0 = b(i) + b(i + 8); val e1 = b(i) - b(i + 8)
      val e2 = (b(i + 4) >> 1) - b(i + 12); val e3 = b(i + 4) + (b(i + 12) >> 1)
      b(i) = (e0 + e3 + 32) >> 6; b(i + 4) = (e1 + e2 + 32) >> 6
      b(i + 8) = (e1 - e2 + 32) >> 6; b(i + 12) = (e0 - e3 + 32) >> 6
      i += 1
    }
  }

  /** 4x4 Hadamard (self-inverse up to x16 gain), used for the luma DC array */
  def hadamard4x4(b: Array[Int]): Unit = {
    var i = 0
    while (i < 4) {
      val o = i * 4
      val s0 = b(o) + b(o + 3); val s1 = b(o + 1) + b(o + 2)
      val d0 = b(o) - b(o + 3); val d1 = b(o + 1) - b(o + 2)
      b(o) = s0 + s1; b(o + 1) = d0 + d1; b(o + 2) = s0 - s1; b(o + 3) = d0 - d1
      i += 1
    }
    i = 0
    while (i < 4) {
      val s0 = b(i) + b(i + 12); val s1 = b(i + 4) + b(i + 8)
      val d0 = b(i) - b(i + 12); val d1 = b(i + 4) - b(i + 8)
      b(i) = s0 + s1; b(i + 4) = d0 + d1; b(i + 8) = s0 - s1; b(i + 12) = d0 - d1
      i += 1
    }
  }

  /** 2x2 Hadamard for the chroma DC array [dc00, dc10, dc01, dc11] */
  def hadamard2x2(b: Array[Int]): Unit = {
    val a = b(0); val c = b(1); val d = b(2); val f = b(3)
    b(0) = a + c + d + f; b(1) = a - c + d - f
    b(2) = a + c - d - f; b(3) = a - c - d + f
  }

  /** encoder AC quantisation: z = sgn * ((|c| * MF + f) >> qbits), deadzone f = 2^qbits/3 */
  def quantAc(c: Int, qp: Int, pos: Int): Int = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val z = (math.abs(c) * mf(qp, pos) + f) >> qbits
    if (c < 0) -z else z
  }

  /** decoder AC dequantisation: W' = z * V << (qp/6) */
  @inline def dequantAc(z: Int, qp: Int, pos: Int): Int = (z * v(qp, pos)) << (qp / 6)

  /** encoder luma-DC quantisation of a Hadamard output (already halved) */
  def quantLumaDc(had2: Int, qp: Int): Int = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val z = (math.abs(had2) * mf(qp, 0) + 2 * f) >> (qbits + 1)
    if (had2 < 0) -z else z
  }

  /** decoder luma-DC scaling after the inverse Hadamard (Richardson eq. 7.19) */
  def dequantLumaDc(fv: Int, qp: Int): Int =
    if (qp >= 12) (fv * v(qp, 0)) << (qp / 6 - 2)
    else (fv * v(qp, 0) + (1 << (1 - qp / 6))) >> (2 - qp / 6)

  /** encoder chroma-DC quantisation of a 2x2 Hadamard output */
  def quantChromaDc(had: Int, qp: Int): Int = {
    val qbits = 15 + qp / 6
    val f = (1 << qbits) / 3
    val z = (math.abs(had) * mf(qp, 0) + 2 * f) >> (qbits + 1)
    if (had < 0) -z else z
  }

  /** decoder chroma-DC scaling after the inverse 2x2 Hadamard */
  def dequantChromaDc(fv: Int, qp: Int): Int = ((fv * v(qp, 0)) << (qp / 6)) >> 1
}
