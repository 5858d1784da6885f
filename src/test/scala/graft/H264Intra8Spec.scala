package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264, H264Codec}
import graft.sources.H264Codec.Yuv

/** Pins the Intra_8x8 / 8x8-transform tier (High-profile shape): the
  * three-way I16/I4/I8 encoder competition actually selects I8 on
  * smooth content, streams round-trip through the full decode path
  * (reference filtering, interleaved CAVLC sub-blocks, 8x8-grid
  * deblocking, P frames predicting from I8 recon), the emitted SPS/PPS
  * parse as High profile under the INDEPENDENT ingest indexer, and the
  * 4x4 tier still decodes under a transform8x8 PPS (per-MB flag = 0).
  */
class H264Intra8Spec extends AnyFunSuite {

  // smooth gradient: exactly the content 8x8 prediction + one big
  // transform should win on (low detail, long-range correlation)
  private def smooth(w: Int, h: Int, t: Int): Yuv =
    Yuv(w, h,
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (40 + (x + 2 * y + 3 * t) / 4).toByte
      },
      Array.fill(w / 2 * h / 2)(120.toByte), Array.fill(w / 2 * h / 2)(130.toByte))

  // detailed content: checker + gradient, gives a mix of MB choices
  private def detailed(w: Int, h: Int, t: Int): Yuv =
    Yuv(w, h,
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        ((x * 3 + y * 2 + t * 5 + (if ((x / 4 + y / 4) % 2 == 0) 40 else 0)) % 256).toByte
      },
      Array.fill(w / 2 * h / 2)(110.toByte), Array.fill(w / 2 * h / 2)(140.toByte))

  private def maxErr(a: Array[Byte], b: Array[Byte]): Int =
    a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).max

  test("I8 joins the competition and the all-intra stream round-trips") {
    val frames = (0 until 3).map(t => smooth(64, 48, t))
    val before = H264Codec.i8MbCount.get()
    val stream = H264Codec.encode(frames, qp = 8, allIntra = true, transform8x8 = true)
    assert(H264Codec.i8MbCount.get() > before,
      "smooth content must select Intra_8x8 for at least one MB")
    val back = H264Codec.decode(stream)
    assert(back.size == 3)
    frames.zip(back).foreach { case (src, dec) =>
      assert(maxErr(src.y, dec.y) <= 6, "QP-8 all-intra error envelope")
    }
  }

  test("IDR + P GOP: P frames predict from deblocked I8 reconstruction") {
    val frames = (0 until 6).map(t => smooth(64, 48, t))
    val stream = H264Codec.encode(frames, qp = 10, transform8x8 = true)
    val back = H264Codec.decode(stream)
    assert(back.size == 6)
    frames.zip(back).foreach { case (src, dec) =>
      assert(maxErr(src.y, dec.y) <= 10, "QP-10 IDR+P error envelope")
    }
  }

  test("mixed content exercises BOTH NxN tiers in one stream") {
    // frame 0 smooth (I8 territory per the first test), frame 1 detailed
    // (I4 territory) — one encode, one stream, both per-MB flag values
    val frames = Seq(smooth(64, 48, 0), detailed(64, 48, 1))
    val b4 = H264Codec.i4MbCount.get(); val b8 = H264Codec.i8MbCount.get()
    val stream = H264Codec.encode(frames, qp = 8, allIntra = true, transform8x8 = true)
    assert(H264Codec.i8MbCount.get() > b8, "smooth frame must pick I8 somewhere")
    assert(H264Codec.i4MbCount.get() > b4, "detailed frame must pick I4 somewhere")
    val back = H264Codec.decode(stream)
    assert(back.size == 2)
    assert(maxErr(frames.head.y, back.head.y) <= 6)
    assert(maxErr(frames(1).y, back(1).y) <= 6)
  }

  test("High stream parses under the independent ingest indexer (profile 100)") {
    val stream = H264Codec.encode((0 until 4).map(t => smooth(48, 32, t)),
      qp = 12, transform8x8 = true)
    val idx = H264.index(stream)
    assert(idx.frames.size == 4)
    assert(idx.profileIdc == 100)
    assert(idx.keyframes.contains(0L))
  }

  test("baseline 4x4/16x16 streams are byte-identical with and without the feature compiled in") {
    val frames = (0 until 3).map(t => detailed(48, 32, t))
    val a = H264Codec.encode(frames, qp = 12)
    val b = H264Codec.encode(frames, qp = 12, transform8x8 = false)
    assert(java.util.Arrays.equals(a, b))
    assert(new String(a, java.nio.charset.StandardCharsets.ISO_8859_1)
      .contains("NONCONFORMANT")) // CAVLC SEI marker unchanged
  }

  test("unsupported combinations refuse loudly") {
    val f = Seq(smooth(32, 32, 0))
    // cabac + transform8x8 is SUPPORTED since round 13 (cat-5 residual
    // coding) — see H264Cabac8x8Spec; only the PCM combination refuses
    intercept[IllegalArgumentException] {
      H264Codec.encode(f, pcm = true, transform8x8 = true)
    }
  }
}
