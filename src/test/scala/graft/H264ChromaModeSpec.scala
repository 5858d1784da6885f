package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264Cavlc, H264Codec, H264Writer => W}
import graft.sources.H264Codec.Yuv

/** Full §8.3.4 chroma intra prediction (round 15): the four
  * intra_chroma_pred_mode values — 0 DC (per 4x4 quadrant), 1
  * horizontal, 2 vertical, 3 plane — signalled in both entropy layers
  * (ue(v) in CAVLC, TU bins with the neighbour-conditioned context in
  * CABAC) and reconstructed per the spec's arithmetic. Until round 15
  * the decoder refused every non-DC mode — the second-most-common
  * real-stream refusal after adaptive QP (VERDICT r14 ask 2). The
  * conformance streams below are hand-built field-by-field and their
  * expected chroma planes computed independently in the test.
  */
class H264ChromaModeSpec extends AnyFunSuite {

  /** luma flat; chroma carries strong horizontal/vertical gradients that
    * make H/V/plane prediction win over quadrant DC */
  private def chromaGradFrame(w: Int, h: Int, t: Int): Yuv = {
    val cw = w / 2; val ch = h / 2
    Yuv(w, h,
      Array.tabulate(w * h)(i => (120 + ((i % w) / 16) + t).toByte),
      Array.tabulate(cw * ch)(i => (40 + 5 * (i % cw)).min(250).toByte), // H ramp
      Array.tabulate(cw * ch)(i => (40 + 5 * (i / cw)).min(250).toByte)) // V ramp
  }

  private def frames: Seq[Yuv] = (0 until 4).map(t => chromaGradFrame(64, 48, t))

  private def mse(a: Array[Byte], b: Array[Byte]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = (a(i) & 0xff) - (b(i) & 0xff); s += d * d; i += 1 }
    s / a.length
  }

  test("chroma-gradient content engages non-DC modes and round-trips (both layers)") {
    for (cabac <- Seq(false, true)) {
      H264Codec.chromaModeCount.set(0)
      val dec = H264Codec.decode(
        H264Codec.encode(frames, qp = 14, cabac = cabac, chromaModes = true))
      assert(H264Codec.chromaModeCount.get() > 0,
        s"cabac=$cabac: gradient chroma must pick directional/plane modes")
      dec.indices.foreach { i =>
        assert(mse(frames(i).cb, dec(i).cb) < 12.0, s"cabac=$cabac frame $i cb")
        assert(mse(frames(i).cr, dec(i).cr) < 12.0, s"cabac=$cabac frame $i cr")
      }
    }
  }

  test("CAVLC and CABAC chroma-mode streams decode to identical pixels") {
    val dA = H264Codec.decode(H264Codec.encode(frames, qp = 14, chromaModes = true))
    val dB = H264Codec.decode(
      H264Codec.encode(frames, qp = 14, cabac = true, chromaModes = true))
    frames.indices.foreach { i =>
      assert(java.util.Arrays.equals(dA(i).y, dB(i).y), s"frame $i luma")
      assert(java.util.Arrays.equals(dA(i).cb, dB(i).cb), s"frame $i cb")
      assert(java.util.Arrays.equals(dA(i).cr, dB(i).cr), s"frame $i cr")
    }
  }

  test("non-chromaModes streams stay byte-identical to the pre-round-15 encoder") {
    val a = H264Codec.encode(frames, qp = 12)
    val b = H264Codec.encode(frames, qp = 12, chromaModes = false)
    assert(java.util.Arrays.equals(a, b))
  }

  test("chroma modes compose with aqp in one stream") {
    H264Codec.chromaModeCount.set(0)
    val dec = H264Codec.decode(
      H264Codec.encode(frames, qp = 14, aqp = true, chromaModes = true))
    assert(H264Codec.chromaModeCount.get() > 0)
    dec.indices.foreach(i => assert(mse(frames(i).cb, dec(i).cb) < 12.0))
  }

  // ------------------------------------------------------- conformance

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"${x & 0xff}%02x").mkString

  /** 2x2-MB Baseline SPS (32x32), poc type 2 */
  private def handSps(): Array[Byte] = {
    val bw = new W.BitWriter
    bw.u(8, 66); bw.u(8, 0); bw.u(8, 10)
    bw.ue(0); bw.ue(0); bw.ue(2); bw.ue(1); bw.u1(0)
    bw.ue(1); bw.ue(1) // 2x2 MBs
    bw.u1(1); bw.u1(1); bw.u1(0); bw.u1(0)
    bw.rbspTrailing()
  }

  private def handPps(): Array[Byte] = {
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(0); bw.u1(0); bw.u1(0); bw.ue(0)
    bw.ue(0); bw.ue(0); bw.u1(0); bw.u(2, 0)
    bw.se(0); bw.se(0); bw.se(0)
    bw.u1(1); bw.u1(0); bw.u1(0)
    bw.rbspTrailing()
  }

  /** one residual-free I16 MB (DC luma) with the given chroma mode;
    * `nC` is the CAVLC context of its (all-zero) luma DC block */
  private def writeI16Flat(bw: W.BitWriter, chromaMode: Int, nC: Int): Unit = {
    bw.ue(3)            // I_16x16_2_0_0
    bw.ue(chromaMode)   // intra_chroma_pred_mode
    bw.se(0)            // mb_qp_delta
    H264Cavlc.writeBlock(bw, new Array[Int](16), nC)
  }

  /** The four modes in one hand-built picture: MB0 I_PCM plants exact
    * neighbour samples; MB1 (right) predicts chroma HORIZONTALLY from
    * MB0, MB2 (below) VERTICALLY from MB0, MB3 (diag) by the §8.3.4.4
    * PLANE fit from MB1/MB2/MB0 — every expected chroma sample computed
    * here from the spec's own arithmetic, never from the codec.
    */
  test("hand-built stream exercises H, V, and plane chroma prediction to exact pixels") {
    // PCM patterns: luma mid-gray; chroma = distinct smooth gradients
    val lumaP = Array.fill(256)(128.toByte)
    val cbP = Array.tabulate(64)(i => (60 + 3 * (i % 8) + 9 * (i / 8)).toByte)
    val crP = Array.tabulate(64)(i => (200 - 4 * (i % 8) - 7 * (i / 8)).toByte)
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(7); bw.ue(0)
    bw.u(4, 0); bw.ue(0)
    bw.u1(0); bw.u1(0)
    bw.se(0); bw.ue(1) // qp 26, deblocking OFF
    // MB0: I_PCM
    bw.ue(25); bw.alignZero()
    lumaP.foreach(b => bw.u(8, b & 0xff))
    cbP.foreach(b => bw.u(8, b & 0xff))
    crP.foreach(b => bw.u(8, b & 0xff))
    writeI16Flat(bw, chromaMode = 1, nC = 16) // MB1 (1,0): horizontal
    writeI16Flat(bw, chromaMode = 2, nC = 16) // MB2 (0,1): vertical
    writeI16Flat(bw, chromaMode = 3, nC = 0)  // MB3 (1,1): plane
    val stream = W.nal(3, 7, handSps()) ++ W.nal(3, 8, handPps()) ++
      W.nal(3, 5, bw.rbspTrailing())
    assert(md5hex(stream) == "3eb7695ce128f01e13797e17cfce979b") // golden bytes
    val out = H264Codec.decode(stream)
    assert(out.size == 1)
    val cw = 16 // chroma picture is 16x16 (2x2 MBs of 8x8)
    def expectPlane(plane: Array[Byte], pcm: Array[Byte], name: String): Unit = {
      // MB0: the PCM samples verbatim
      for (y <- 0 until 8; x <- 0 until 8)
        assert((plane(y * cw + x) & 0xff) == (pcm(y * 8 + x) & 0xff), s"$name MB0 ($x,$y)")
      // MB1 (8..15, 0..7): horizontal — each row replicates MB0's col 7
      for (y <- 0 until 8; x <- 8 until 16)
        assert((plane(y * cw + x) & 0xff) == (pcm(y * 8 + 7) & 0xff), s"$name MB1 ($x,$y)")
      // MB2 (0..7, 8..15): vertical — each column replicates MB0's row 7
      for (y <- 8 until 16; x <- 0 until 8)
        assert((plane(y * cw + x) & 0xff) == (pcm(7 * 8 + x) & 0xff), s"$name MB2 ($x,$y)")
      // MB3 (8..15, 8..15): §8.3.4.4 plane from the RECONSTRUCTED
      // neighbours (MB1's bottom row, MB2's right column, MB0's corner)
      def p(x: Int, y: Int): Int = plane((8 + y) * cw + 8 + x) & 0xff
      def nb(x: Int, y: Int): Int =
        if (x == -1 && y == -1) plane(7 * cw + 7) & 0xff
        else if (y == -1) plane(7 * cw + 8 + x) & 0xff
        else plane((8 + y) * cw + 7) & 0xff
      var hS = 0; var vS = 0
      for (i <- 0 until 4) {
        hS += (i + 1) * (nb(4 + i, -1) - nb(2 - i, -1))
        vS += (i + 1) * (nb(-1, 4 + i) - nb(-1, 2 - i))
      }
      val a = 16 * (nb(-1, 7) + nb(7, -1))
      val b = (34 * hS + 32) >> 6
      val c = (34 * vS + 32) >> 6
      for (y <- 0 until 8; x <- 0 until 8) {
        val e = math.max(0, math.min(255, (a + b * (x - 3) + c * (y - 3) + 16) >> 5))
        assert(p(x, y) == e, s"$name MB3 ($x,$y): got ${p(x, y)} want $e")
      }
    }
    expectPlane(out(0).cb, cbP, "cb")
    expectPlane(out(0).cr, crP, "cr")
  }

  test("a directional chroma mode without its neighbour is refused loudly") {
    val bw = new W.BitWriter
    bw.ue(0); bw.ue(7); bw.ue(0)
    bw.u(4, 0); bw.ue(0)
    bw.u1(0); bw.u1(0)
    bw.se(0); bw.ue(1)
    writeI16Flat(bw, chromaMode = 1, nC = 0) // MB0 has NO left neighbour
    val stream = W.nal(3, 7, handSps()) ++ W.nal(3, 8, handPps()) ++
      W.nal(3, 5, bw.rbspTrailing())
    val e = intercept[IllegalArgumentException](H264Codec.decode(stream))
    assert(e.getMessage.contains("intra_chroma_pred_mode"))
  }
}
