package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264Codec, Simd}
import graft.sources.H264Codec.Yuv

/** SIMD/scalar parity for the Vector-API decode kernels (round 14):
  * every tier's stream must decode to BYTE-IDENTICAL planes with the
  * kernels on and off — the kernels implement the same integer
  * arithmetic, and this spec is the proof that holds on this JVM/CPU.
  * Runs meaningfully only where the incubator module loaded (the
  * default build config enables it); otherwise the toggle is vacuous
  * and the spec says so.
  */
class H264SimdParitySpec extends AnyFunSuite {

  private def movingYuv(w: Int, h: Int, t: Int): Yuv = {
    def base(x: Int, y: Int): Int =
      (128 + 55 * math.sin(0.31 * x + 0.17 * y) * math.cos(0.23 * y - 0.11 * x)
        + 45 * math.sin(0.13 * x) * math.sin(0.19 * y)).round.toInt.max(0).min(255)
    val yb = Array.tabulate(w * h)(i => base(i % w + 2 * t, i / w + t).toByte)
    val cb = Array.tabulate(w / 2 * h / 2)(i => base(i % (w / 2), i / (w / 2) + 3 * t).toByte)
    val cr = Array.tabulate(w / 2 * h / 2)(i => base(i % (w / 2) + t, i / (w / 2)).toByte)
    Yuv(w, h, yb, cb, cr)
  }

  private def decodeBoth(stream: Array[Byte]): (Vector[Yuv], Vector[Yuv]) = {
    val was = Simd.disabled
    try {
      Simd.disabled = false
      val on = H264Codec.decode(stream)
      Simd.disabled = true
      val off = H264Codec.decode(stream)
      (on, off)
    } finally Simd.disabled = was
  }

  test("every tier decodes byte-identically with SIMD on and off") {
    assume(Simd.enabled, "vector module absent: scalar-only JVM, nothing to compare")
    val frames = (0 until 6).map(t => movingYuv(80, 48, t))
    val tiers: Seq[(String, Array[Byte])] = Seq(
      "default" -> H264Codec.encode(frames, qp = 12),
      "cabac" -> H264Codec.encode(frames, qp = 12, cabac = true),
      "high" -> H264Codec.encode(frames, qp = 12, cabac = true, transform8x8 = true),
      "multiref" -> H264Codec.encode(frames, qp = 12, multiRef = true),
      "bframes" -> H264Codec.encode(frames, qp = 12, bframes = true),
      "tdirect" -> H264Codec.encode(frames, qp = 12, bframes = true, tdirect = true),
      "parts" -> H264Codec.encode(frames, qp = 12, parts = true),
      "wp" -> H264Codec.encode(frames, qp = 12, weightedPred = true),
      "aqp" -> H264Codec.encode(frames, qp = 16, aqp = true),
      "chroma" -> H264Codec.encode(frames, qp = 12, chromaModes = true),
      "wpimplicit" -> H264Codec.encode(frames, qp = 12, bframes = true,
        wpImplicit = true))
    tiers.foreach { case (tier, stream) =>
      val (on, off) = decodeBoth(stream)
      assert(on.size == off.size, tier)
      on.indices.foreach { i =>
        assert(java.util.Arrays.equals(on(i).y, off(i).y), s"$tier frame $i luma")
        assert(java.util.Arrays.equals(on(i).cb, off(i).cb), s"$tier frame $i cb")
        assert(java.util.Arrays.equals(on(i).cr, off(i).cr), s"$tier frame $i cr")
      }
    }
  }

  test("the encoder closed loop is SIMD/scalar invariant (bitstreams identical)") {
    assume(Simd.enabled, "vector module absent")
    val frames = (0 until 5).map(t => movingYuv(80, 48, t))
    val was = Simd.disabled
    try {
      Simd.disabled = false
      val a = H264Codec.encode(frames, qp = 12)
      Simd.disabled = true
      val b = H264Codec.encode(frames, qp = 12)
      assert(java.util.Arrays.equals(a, b),
        "encode must be bitstream-identical under both kernel sets")
    } finally Simd.disabled = was
  }
}
