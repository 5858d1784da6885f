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

  /** the V scale row expanded to raster positions, per qp%6 — the SIMD
    * batched dequant multiplies a whole position row by vRaster(qp%6)(p)
    */
  val vRaster: Array[Array[Int]] =
    Array.tabulate(6)(m => Array.tabulate(16)(p => vTab(m)(posClass(p))))

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

  // ------------------------------------------------- 8x8 transform (High)

  /** 8x8 frame zigzag (spec Table 8-8): generated by the standard
    * diagonal walk (the same generator reproduces [[zigzag4x4]] at n=4,
    * pinned by spec) — generation beats hand-typing 64 constants
    */
  val zigzag8x8: Array[Int] = diagonalZigzag(8)

  private[graft] def diagonalZigzag(n: Int): Array[Int] = {
    val out = new Array[Int](n * n)
    var i = 0; var r = 0; var c = 0; var up = true
    while (i < n * n) {
      out(i) = r * n + c
      i += 1
      if (up) {
        if (c == n - 1) { r += 1; up = false }
        else if (r == 0) { c += 1; up = false }
        else { r -= 1; c += 1 }
      } else {
        if (r == n - 1) { c += 1; up = true }
        else if (c == 0) { r += 1; up = true }
        else { r += 1; c -= 1 }
      }
    }
    out
  }

  /** 8x8 position class (6 classes — the (i%4, j%4) pattern the spec's
    * LevelScale8x8 table is built from)
    */
  private val posClass8: Array[Int] = Array.tabulate(64) { p =>
    val i = p / 8; val j = p % 8
    if (i % 4 == 0 && j % 4 == 0) 0
    else if (i % 2 == 1 && j % 2 == 1) 1
    else if (i % 4 == 2 && j % 4 == 2) 2
    else if ((i % 4 == 0 && j % 2 == 1) || (i % 2 == 1 && j % 4 == 0)) 3
    else if ((i % 4 == 0 && j % 4 == 2) || (i % 4 == 2 && j % 4 == 0)) 4
    else 5
  }

  /** decoder 8x8 scales V8 (spec 8x8 LevelScale, Richardson-style
    * formulation — transcribed from the published standard; like the
    * CABAC engine tables, unverifiable against a reference decoder in
    * this offline container, but the encoder MF8 below is DERIVED from
    * V8 (2^18 / V8), so encode->decode round-trips exactly regardless
    */
  private val v8Tab: Array[Array[Int]] = Array(
    Array(20, 18, 32, 19, 25, 24), Array(22, 19, 35, 21, 28, 26),
    Array(26, 23, 42, 24, 33, 31), Array(28, 25, 45, 26, 35, 33),
    Array(32, 28, 51, 30, 40, 38), Array(36, 32, 58, 34, 46, 43))
  /** encoder 8x8 multipliers, derived per class as
    * MF8 = round(2^24 / (d_i * d_j * V8)) where d_i are the inverse
    * basis norms^2 {8, 578/64, 5} (rows 0/4, odd, 2/6) — so that
    * forward gain (d_i d_j), quant (>> 16 + qp/6), dequant (x V8 / 4 at
    * qp%6) and the inverse's >> 6 compose to exactly 1. The derivation
    * reproduces the well-known 8x8 MF constants (13107, 11428, 20972,
    * 12222, 16777, 15481 at qp%6 = 0) — cross-validation of V8, the
    * class map, and the basis norms at once.
    */
  private val dProd: Array[Double] = {
    val d0 = 8.0; val d1 = 578.0 / 64.0; val d2 = 5.0
    Array(d0 * d0, d1 * d1, d2 * d2, d0 * d1, d0 * d2, d1 * d2)
  }
  private val mf8Tab: Array[Array[Int]] =
    v8Tab.map(_.zipWithIndex.map { case (v, c) =>
      math.round((1L << 24) / (dProd(c) * v)).toInt
    })

  @inline def mf8(qp: Int, pos: Int): Int = mf8Tab(qp % 6)(posClass8(pos))
  @inline def v8(qp: Int, pos: Int): Int = v8Tab(qp % 6)(posClass8(pos))

  /** encoder 8x8 quantisation (non-normative; deadzone f = 2^qbits/3) */
  def quantAc8(c: Int, qp: Int, pos: Int): Int = {
    val qbits = 16 + qp / 6
    val f = (1 << qbits) / 3
    val z = (math.abs(c).toLong * mf8(qp, pos) + f) >> qbits
    if (c < 0) -z.toInt else z.toInt
  }

  /** decoder 8x8 dequantisation (§8.5.13.1 structure: the scale carries
    * a /4 relative to the <<qp/6 pattern; exact-integer below qp 12 via
    * the rounding term, mirroring [[dequantLumaDc]])
    */
  @inline def dequantAc8(z: Int, qp: Int, pos: Int): Int =
    if (qp >= 12) (z * v8(qp, pos)) << (qp / 6 - 2)
    else (z * v8(qp, pos) + (1 << (1 - qp / 6))) >> (2 - qp / 6)

  /** forward 8x8 core transform (x264/JM butterfly formulation — the
    * encoder side is non-normative; the pair with [[inverse8x8]] is
    * mutually inverse up to quantisation, spec-pinned numerically)
    */
  def forward8x8(b: Array[Int]): Unit = {
    var pass = 0
    while (pass < 2) {
      var i = 0
      while (i < 8) {
        val (o, s) = if (pass == 0) (i * 8, 1) else (i, 8)
        val s0 = b(o); val s1 = b(o + s); val s2 = b(o + 2 * s); val s3 = b(o + 3 * s)
        val s4 = b(o + 4 * s); val s5 = b(o + 5 * s); val s6 = b(o + 6 * s); val s7 = b(o + 7 * s)
        val a0 = s0 + s7; val a1 = s1 + s6; val a2 = s2 + s5; val a3 = s3 + s4
        val a4 = s0 - s7; val a5 = s1 - s6; val a6 = s2 - s5; val a7 = s3 - s4
        val b0 = a0 + a3; val b1 = a1 + a2; val b2 = a0 - a3; val b3 = a1 - a2
        val b4 = a5 + a6 + ((a4 >> 1) + a4)
        val b5 = a4 - a7 - ((a6 >> 1) + a6)
        val b6 = a4 + a7 - ((a5 >> 1) + a5)
        val b7 = a5 - a6 + ((a7 >> 1) + a7)
        b(o) = b0 + b1
        b(o + 2 * s) = b2 + (b3 >> 1)
        b(o + 4 * s) = b0 - b1
        b(o + 6 * s) = (b2 >> 1) - b3
        b(o + s) = b4 + (b7 >> 2)
        b(o + 3 * s) = b5 + (b6 >> 2)
        b(o + 5 * s) = b6 - (b5 >> 2)
        b(o + 7 * s) = (b4 >> 2) - b7
        i += 1
      }
      pass += 1
    }
  }

  // --------------------------------------- scaling matrices (CQM, §8.5.9)

  /** default scaling lists, spec Tables 7-3/7-4, in ZIGZAG (scan) order —
    * like the 8x8 V table these are transcribed from the published
    * standard; the spec tests pin the parse fall-back rules and the
    * encoder derives its weighted quantisers from the same arrays, so
    * encode->decode round-trips exactly regardless
    */
  val default4Intra: Array[Int] =
    Array(6, 13, 13, 20, 20, 20, 28, 28, 28, 28, 32, 32, 32, 37, 37, 42)
  val default4Inter: Array[Int] =
    Array(10, 14, 14, 20, 20, 20, 24, 24, 24, 24, 27, 27, 27, 30, 30, 34)
  val default8Intra: Array[Int] = Array(
    6, 10, 10, 13, 11, 13, 16, 16, 16, 16, 18, 18, 18, 18, 18, 23,
    23, 23, 23, 23, 23, 25, 25, 25, 25, 25, 25, 25, 27, 27, 27, 27,
    27, 27, 27, 27, 29, 29, 29, 29, 29, 29, 29, 29, 31, 31, 31, 31,
    31, 31, 31, 33, 33, 33, 33, 33, 33, 36, 36, 36, 36, 38, 38, 40)
  val default8Inter: Array[Int] = Array(
    9, 13, 13, 15, 13, 15, 17, 17, 17, 17, 19, 19, 19, 19, 19, 21,
    21, 21, 21, 21, 21, 22, 22, 22, 22, 22, 22, 22, 24, 24, 24, 24,
    24, 24, 24, 24, 25, 25, 25, 25, 25, 25, 25, 25, 27, 27, 27, 27,
    27, 27, 27, 28, 28, 28, 28, 28, 28, 30, 30, 30, 30, 32, 32, 33)
  val flat16: Array[Int] = Array.fill(16)(16)
  val flat64: Array[Int] = Array.fill(64)(16)

  /** §8.5.12.1 4x4 AC dequant against a LevelScale raster row
    * (ls(pos) = weightScale(pos) * normAdjust(qp%6, pos)); with flat
    * weights (16) this equals [[dequantAc]] at every qp — the extra >>4
    * is exactly the 16 (spec-pinned by H264ScalingMatrixSpec)
    */
  @inline def dequantAcLs(z: Int, qp: Int, ls: Array[Int], pos: Int): Int =
    if (qp >= 24) (z * ls(pos)) << (qp / 6 - 4)
    else (z * ls(pos) + (1 << (3 - qp / 6))) >> (4 - qp / 6)

  /** §8.5.10 Intra_16x16 luma DC scaling against LevelScale(qp%6, 0, 0) */
  @inline def dequantLumaDcLs(fv: Int, qp: Int, ls00: Int): Int =
    if (qp >= 36) (fv * ls00) << (qp / 6 - 6)
    else (fv * ls00 + (1 << (5 - qp / 6))) >> (6 - qp / 6)

  /** §8.5.11 chroma DC scaling against LevelScale(qpc%6, 0, 0) */
  @inline def dequantChromaDcLs(fv: Int, qpc: Int, ls00: Int): Int =
    ((fv * ls00) << (qpc / 6)) >> 5

  /** §8.5.13.1 8x8 dequant against a 64-entry LevelScale raster row */
  @inline def dequantAc8Ls(z: Int, qp: Int, ls: Array[Int], pos: Int): Int =
    if (qp >= 36) (z * ls(pos)) << (qp / 6 - 6)
    else (z * ls(pos) + (1 << (5 - qp / 6))) >> (6 - qp / 6)

  /** build the six LevelScale4x4 raster rows (one per qp%6) for a
    * raster-order weight row */
  def ls4Rows(wRaster: Array[Int]): Array[Array[Int]] =
    Array.tabulate(6)(m => Array.tabulate(16)(p => wRaster(p) * vTab(m)(posClass(p))))

  def ls8Rows(wRaster: Array[Int]): Array[Array[Int]] =
    Array.tabulate(6)(m => Array.tabulate(64)(p => wRaster(p) * v8Tab(m)(posClass8(p))))

  /** weighted encoder multipliers: MF' = round(MF * 16 / weight), so the
    * non-normative quantiser tracks the normative weighted dequant (flat
    * weights reproduce the MF tables exactly); clamped >= 1 so huge
    * weights can't zero the quantiser
    */
  def mf4Rows(wRaster: Array[Int]): Array[Array[Int]] =
    Array.tabulate(6)(m => Array.tabulate(16)(p =>
      math.max(1, math.round(mfTab(m)(posClass(p)) * 16.0 / wRaster(p)).toInt)))

  def mf8Rows(wRaster: Array[Int]): Array[Array[Int]] =
    Array.tabulate(6)(m => Array.tabulate(64)(p =>
      math.max(1, math.round(mf8Tab(m)(posClass8(p)) * 16.0 / wRaster(p)).toInt)))

  /** zigzag-order scaling list -> raster-order weights */
  def zigToRaster(wZig: Array[Int]): Array[Int] =
    if (wZig.length == 16) Array.tabulate(16)(p => wZig(zigzag4x4.indexOf(p)))
    else Array.tabulate(64)(p => wZig(zigzag8x8.indexOf(p)))

  /** inverse 8x8 core transform (§8.5.13.2 butterflies) incl. the final
    * (x + 32) >> 6
    */
  def inverse8x8(b: Array[Int]): Unit = {
    var pass = 0
    while (pass < 2) {
      var i = 0
      while (i < 8) {
        val (o, s) = if (pass == 0) (i * 8, 1) else (i, 8)
        val w0 = b(o); val w1 = b(o + s); val w2 = b(o + 2 * s); val w3 = b(o + 3 * s)
        val w4 = b(o + 4 * s); val w5 = b(o + 5 * s); val w6 = b(o + 6 * s); val w7 = b(o + 7 * s)
        val a0 = w0 + w4
        val a4 = w0 - w4
        val a2 = (w2 >> 1) - w6
        val a6 = w2 + (w6 >> 1)
        val b0 = a0 + a6; val b2 = a4 + a2; val b4 = a4 - a2; val b6 = a0 - a6
        val a1 = -w3 + w5 - w7 - (w7 >> 1)
        val a3 = w1 + w7 - w3 - (w3 >> 1)
        val a5 = -w1 + w7 + w5 + (w5 >> 1)
        val a7 = w3 + w5 + w1 + (w1 >> 1)
        val b1 = a1 + (a7 >> 2)
        val b7 = a7 - (a1 >> 2)
        val b3 = a3 + (a5 >> 2)
        val b5 = (a3 >> 2) - a5
        if (pass == 0) {
          b(o) = b0 + b7; b(o + s) = b2 + b5; b(o + 2 * s) = b4 + b3
          b(o + 3 * s) = b6 + b1; b(o + 4 * s) = b6 - b1; b(o + 5 * s) = b4 - b3
          b(o + 6 * s) = b2 - b5; b(o + 7 * s) = b0 - b7
        } else {
          b(o) = (b0 + b7 + 32) >> 6; b(o + s) = (b2 + b5 + 32) >> 6
          b(o + 2 * s) = (b4 + b3 + 32) >> 6; b(o + 3 * s) = (b6 + b1 + 32) >> 6
          b(o + 4 * s) = (b6 - b1 + 32) >> 6; b(o + 5 * s) = (b4 - b3 + 32) >> 6
          b(o + 6 * s) = (b2 - b5 + 32) >> 6; b(o + 7 * s) = (b0 - b7 + 32) >> 6
        }
        i += 1
      }
      pass += 1
    }
  }
}

/** the active scaling matrices of one picture (§7.4.2.1.1 / §8.5.9):
  * six 4x4 lists (Intra Y/Cb/Cr, Inter Y/Cb/Cr) and two 8x8 lists
  * (Intra Y, Inter Y — 4:2:0), held as raster-order weight rows with the
  * derived LevelScale and weighted-MF rasters per qp%6. The [[flat]]
  * singleton (all 16s) delegates every call to the pre-CQM fast paths,
  * keeping non-CQM streams byte- and cycle-identical (incl. the SIMD
  * batched dequant, which the codec gates on `scal.flat`).
  *
  * List indexing follows the spec: 0 IntraY, 1 IntraCb, 2 IntraCr,
  * 3 InterY, 4 InterCb, 5 InterCr; 8x8: 0 intra, 1 inter.
  */
final class ScalingMatrices(w4Zig: Array[Array[Int]], w8Zig: Array[Array[Int]]) {
  import H264Transform._
  require(w4Zig.length == 6 && w4Zig.forall(_.length == 16),
    "need six 16-entry 4x4 scaling lists")
  require(w8Zig.length == 2 && w8Zig.forall(_.length == 64),
    "need two 64-entry 8x8 scaling lists")
  w4Zig.foreach(_.foreach(w => require(w >= 1 && w <= 255, s"weight $w out of [1,255]")))
  w8Zig.foreach(_.foreach(w => require(w >= 1 && w <= 255, s"weight $w out of [1,255]")))

  /** raster-order weights, exposed for the spec tests */
  private[sources] val w4: Array[Array[Int]] = w4Zig.map(zigToRaster)
  private[sources] val w8: Array[Array[Int]] = w8Zig.map(zigToRaster)

  val flat: Boolean =
    w4.forall(_.forall(_ == 16)) && w8.forall(_.forall(_ == 16))

  // LevelScale / weighted-MF rasters [list][qp%6][pos] — only built for
  // non-flat matrices (the flat singleton never reads them)
  private val ls4: Array[Array[Array[Int]]] = if (flat) null else w4.map(ls4Rows)
  private val ls8: Array[Array[Array[Int]]] = if (flat) null else w8.map(ls8Rows)
  private val mf4: Array[Array[Array[Int]]] = if (flat) null else w4.map(mf4Rows)
  private val mf8: Array[Array[Array[Int]]] = if (flat) null else w8.map(mf8Rows)

  @inline def deqAc(z: Int, qp: Int, pos: Int, list: Int): Int =
    if (flat) dequantAc(z, qp, pos)
    else dequantAcLs(z, qp, ls4(list)(qp % 6), pos)

  /** Intra_16x16 luma DC (always list 0 — I16 MBs are intra by definition) */
  @inline def deqLumaDc(fv: Int, qp: Int): Int =
    if (flat) dequantLumaDc(fv, qp)
    else dequantLumaDcLs(fv, qp, ls4(0)(qp % 6)(0))

  @inline def deqChromaDc(fv: Int, qpc: Int, list: Int): Int =
    if (flat) dequantChromaDc(fv, qpc)
    else dequantChromaDcLs(fv, qpc, ls4(list)(qpc % 6)(0))

  @inline def deqAc8(z: Int, qp: Int, pos: Int, list: Int): Int =
    if (flat) dequantAc8(z, qp, pos)
    else dequantAc8Ls(z, qp, ls8(list)(qp % 6), pos)

  // -- encoder side (non-normative; tracks the weighted dequant exactly
  //    the way the flat MF tables track the flat V tables)

  def qAc(c: Int, qp: Int, pos: Int, list: Int): Int =
    if (flat) quantAc(c, qp, pos)
    else {
      val qbits = 15 + qp / 6
      val f = (1 << qbits) / 3
      val z = ((math.abs(c).toLong * mf4(list)(qp % 6)(pos) + f) >> qbits).toInt
      if (c < 0) -z else z
    }

  def qLumaDc(had2: Int, qp: Int): Int =
    if (flat) quantLumaDc(had2, qp)
    else {
      val qbits = 15 + qp / 6
      val f = (1 << qbits) / 3
      val z = ((math.abs(had2).toLong * mf4(0)(qp % 6)(0) + 2 * f) >> (qbits + 1)).toInt
      if (had2 < 0) -z else z
    }

  def qChromaDc(had: Int, qpc: Int, list: Int): Int =
    if (flat) quantChromaDc(had, qpc)
    else {
      val qbits = 15 + qpc / 6
      val f = (1 << qbits) / 3
      val z = ((math.abs(had).toLong * mf4(list)(qpc % 6)(0) + 2 * f) >> (qbits + 1)).toInt
      if (had < 0) -z else z
    }

  def qAc8(c: Int, qp: Int, pos: Int, list: Int): Int =
    if (flat) quantAc8(c, qp, pos)
    else {
      val qbits = 16 + qp / 6
      val f = (1 << qbits) / 3
      val z = ((math.abs(c).toLong * mf8(list)(qp % 6)(pos) + f) >> qbits).toInt
      if (c < 0) -z else z
    }
}

object ScalingMatrices {
  /** the flat (all-16) matrices every pre-CQM stream decodes under */
  val Flat: ScalingMatrices = new ScalingMatrices(
    Array.fill(6)(H264Transform.flat16), Array.fill(2)(H264Transform.flat64))
}
