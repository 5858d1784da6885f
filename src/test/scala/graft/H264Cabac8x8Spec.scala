package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.H264Codec
import graft.sources.H264Codec.Yuv

/** Pins CABAC residual coding for the 8x8 transform (ctxBlockCat 5) —
  * the combination the High tier refused through round 12. The contract
  * under test:
  *
  *  - a High (transform8x8) + CABAC stream round-trips through the full
  *    decode path, with Intra_8x8 actually selected (not just allowed);
  *  - decoded pixels are BIT-IDENTICAL to the CAVLC High stream of the
  *    same frames: the entropy layer is probability-only, the encoder's
  *    mode decisions are entropy-independent, and the I8 nz bookkeeping
  *    mirrors the CAVLC interleaved sub-block counts, so deblocking
  *    strengths cannot drift between entropy modes — pixel equality with
  *    CAVLC is the cross-entropy oracle (VERDICT r12 ask 2);
  *  - both per-MB transform flag values coexist in one CABAC stream.
  *
  * The cat-5 sig/last position->context BUCKETS are repo-local (the
  * spec's Table 9-43 mapping is published data this offline container
  * has no copy of) and the stream's SEI says so; the §9.3.3.1.1.10
  * transform-flag context and the §9.3.3.1.3 level-context derivations
  * are spec-true. Reference decodes such streams via FFmpeg behind
  * scanner/video/decoder_automata.h:28-51.
  */
class H264Cabac8x8Spec extends AnyFunSuite {

  private def smooth(w: Int, h: Int, t: Int): Yuv =
    Yuv(w, h,
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (40 + (x + 2 * y + 3 * t) / 4).toByte
      },
      Array.fill(w / 2 * h / 2)(120.toByte), Array.fill(w / 2 * h / 2)(130.toByte))

  private def detailed(w: Int, h: Int, t: Int): Yuv =
    Yuv(w, h,
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        ((x * 3 + y * 2 + t * 5 + (if ((x / 4 + y / 4) % 2 == 0) 40 else 0)) % 256).toByte
      },
      Array.fill(w / 2 * h / 2)(110.toByte), Array.fill(w / 2 * h / 2)(140.toByte))

  private def maxErr(a: Array[Byte], b: Array[Byte]): Int =
    a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).max

  test("all-intra High + CABAC selects I8 and round-trips") {
    val frames = (0 until 3).map(t => smooth(64, 48, t))
    val before = H264Codec.i8MbCount.get()
    val stream = H264Codec.encode(frames, qp = 8, allIntra = true,
      cabac = true, transform8x8 = true)
    assert(H264Codec.i8MbCount.get() > before,
      "smooth content must select Intra_8x8 under CABAC too")
    val back = H264Codec.decode(stream)
    assert(back.size == 3)
    frames.zip(back).foreach { case (src, dec) =>
      assert(maxErr(src.y, dec.y) <= 6, "QP-8 all-intra error envelope")
    }
  }

  test("decoded pixels are bit-identical to the CAVLC High stream (all planes)") {
    // mixed content + IDR/P GOP: I8, I4, I16, skip and coded P MBs all in
    // play — if any entropy-mode asymmetry existed (nz bookkeeping,
    // deblock strength, mode decisions), some plane would differ
    val frames = Seq(smooth(64, 48, 0), detailed(64, 48, 1),
      smooth(64, 48, 2), detailed(64, 48, 3))
    val cavlc = H264Codec.decode(H264Codec.encode(frames, qp = 10, transform8x8 = true))
    val cabac = H264Codec.decode(H264Codec.encode(frames, qp = 10,
      cabac = true, transform8x8 = true))
    assert(cavlc.size == cabac.size)
    cavlc.zip(cabac).zipWithIndex.foreach { case ((a, b), i) =>
      assert(java.util.Arrays.equals(a.y, b.y), s"frame $i luma differs across entropy modes")
      assert(java.util.Arrays.equals(a.cb, b.cb), s"frame $i Cb differs across entropy modes")
      assert(java.util.Arrays.equals(a.cr, b.cr), s"frame $i Cr differs across entropy modes")
    }
  }

  test("IDR + P GOP round-trips (P frames predict from deblocked I8 recon)") {
    val frames = (0 until 6).map(t => smooth(64, 48, t))
    val stream = H264Codec.encode(frames, qp = 10, cabac = true, transform8x8 = true)
    val back = H264Codec.decode(stream)
    assert(back.size == 6)
    frames.zip(back).foreach { case (src, dec) =>
      assert(maxErr(src.y, dec.y) <= 10, "QP-10 IDR+P error envelope")
    }
  }

  test("both per-MB transform flag values coexist in one CABAC stream") {
    val frames = Seq(smooth(64, 48, 0), detailed(64, 48, 1))
    val b4 = H264Codec.i4MbCount.get(); val b8 = H264Codec.i8MbCount.get()
    val stream = H264Codec.encode(frames, qp = 8, allIntra = true,
      cabac = true, transform8x8 = true)
    assert(H264Codec.i8MbCount.get() > b8, "smooth frame must pick I8 somewhere")
    assert(H264Codec.i4MbCount.get() > b4, "detailed frame must pick I4 somewhere")
    val back = H264Codec.decode(stream)
    assert(back.size == 2)
    assert(maxErr(frames.head.y, back.head.y) <= 6)
    assert(maxErr(frames(1).y, back(1).y) <= 6)
  }

  test("SEI marks the repo-local cat-5 buckets") {
    val stream = H264Codec.encode(Seq(smooth(32, 32, 0)), qp = 12,
      cabac = true, transform8x8 = true)
    val txt = new String(stream, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(txt.contains("cat-5 sig/last ctx buckets repo-local"))
    assert(txt.contains("cabac-init-fp="))
  }
}
