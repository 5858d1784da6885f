package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264, H264Cabac, H264Codec, H264Writer => W}
import graft.sources.H264Codec.Yuv

/** CABAC entropy layer pins: engine-level encode→decode identity over
  * randomized bin sequences (context, bypass, terminate interleavings),
  * structural sanity of the probability tables, full-codec roundtrips
  * with arithmetic slice data, and the load-bearing CROSS-ENTROPY
  * invariant — CABAC and CAVLC streams of the same source decode to
  * IDENTICAL pixels, because everything above the entropy layer is
  * shared. A flipped bin anywhere (engine renorm, context increments,
  * binarization) desynchronizes the decode and breaks these loudly.
  */
class H264CabacSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def grayFrame(w: Int, h: Int, t: Int): Array[Byte] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((x * 3 + y * 2 + t * 5 + (if ((x / 4 + y / 4) % 2 == 0) 40 else 0)) % 256).toByte
    }

  private def grayYuv(w: Int, h: Int, t: Int): Yuv =
    Yuv(w, h, grayFrame(w, h, t),
      Array.fill(w / 2 * h / 2)(128.toByte), Array.fill(w / 2 * h / 2)(128.toByte))

  test("probability tables are structurally sound") {
    assert(H264Cabac.rangeTabLPS.length == 64)
    H264Cabac.rangeTabLPS.foreach { row =>
      assert(row.length == 4)
      // LPS ranges grow with the quantized range index
      assert(row.sameElements(row.sorted))
      row.foreach(v => assert(v >= 2 && v <= 240))
    }
    // LPS probability decays monotonically down the state ladder
    // (column-wise non-increasing)
    for (q <- 0 until 4; s <- 1 until 64)
      assert(H264Cabac.rangeTabLPS(s)(q) <= H264Cabac.rangeTabLPS(s - 1)(q),
        s"rangeTabLPS not non-increasing at state $s col $q")
    assert(H264Cabac.transIdxLPS.length == 64)
    // an LPS never ADVANCES the state (except the 63 end-state hold)
    for (s <- 0 until 63) assert(H264Cabac.transIdxLPS(s) <= s)
    assert(H264Cabac.transIdxLPS(63) == 63)
  }

  test("engine roundtrip: randomized context/bypass bin sequences") {
    val r = rng(7)
    for (trial <- 0 until 40) {
      val nCtx = 8
      val bins = Vector.fill(200 + r.nextInt(400)) {
        val kind = r.nextInt(10)
        if (kind < 7) (0, r.nextInt(nCtx), r.nextInt(2)) // context-coded
        else (1, 0, r.nextInt(2)) // bypass
      }
      val bw = new W.BitWriter
      val e = new H264Cabac.Encoder(bw)
      val cxE = new H264Cabac.Contexts(nCtx)
      bins.foreach {
        case (0, c, b) => e.encodeBin(cxE, c, b)
        case (_, _, b) => e.encodeBypass(b)
      }
      e.encodeTerminate(1)
      e.flush()
      bw.alignZero()
      val bytes = bw.rbspBytes()
      val d = new H264Cabac.Decoder(new H264.BitReader(bytes))
      val cxD = new H264Cabac.Contexts(nCtx)
      bins.zipWithIndex.foreach {
        case ((0, c, b), i) =>
          assert(d.decodeBin(cxD, c) == b, s"trial $trial ctx-bin $i")
        case ((_, _, b), i) =>
          assert(d.decodeBypass() == b, s"trial $trial bypass-bin $i")
      }
      assert(d.decodeTerminate() == 1, s"trial $trial terminate")
    }
  }

  test("engine roundtrip: terminate(0) interleaved like end_of_slice") {
    val r = rng(11)
    val bw = new W.BitWriter
    val e = new H264Cabac.Encoder(bw)
    val cxE = new H264Cabac.Contexts(4)
    val groups = Vector.fill(30)(Vector.fill(1 + r.nextInt(20))(
      (r.nextInt(4), r.nextInt(2))))
    groups.zipWithIndex.foreach { case (g, i) =>
      g.foreach { case (c, b) => e.encodeBin(cxE, c, b) }
      e.encodeTerminate(if (i == groups.size - 1) 1 else 0)
    }
    e.flush()
    bw.alignZero()
    val d = new H264Cabac.Decoder(new H264.BitReader(bw.rbspBytes()))
    val cxD = new H264Cabac.Contexts(4)
    groups.zipWithIndex.foreach { case (g, i) =>
      g.foreach { case (c, b) => assert(d.decodeBin(cxD, c) == b) }
      assert(d.decodeTerminate() == (if (i == groups.size - 1) 1 else 0))
    }
  }

  test("UEGk suffix roundtrip across magnitudes") {
    for (k <- Seq(0, 3); v <- Seq(0, 1, 2, 5, 14, 15, 63, 200, 5000)) {
      val bw = new W.BitWriter
      val e = new H264Cabac.Encoder(bw)
      H264Cabac.encodeEGkSuffix(e, v, k)
      e.encodeTerminate(1); e.flush(); bw.alignZero()
      val d = new H264Cabac.Decoder(new H264.BitReader(bw.rbspBytes()))
      assert(H264Cabac.decodeEGkSuffix(d, k) == v, s"k=$k v=$v")
    }
  }

  test("CABAC all-intra roundtrip (I16x16 path) across QPs") {
    val frames = (0 until 3).map(t => grayYuv(32, 32, t))
    for (qp <- Seq(8, 16, 28)) {
      val stream = H264Codec.encode(frames, qp = qp, allIntra = true, cabac = true)
      val back = H264Codec.decode(stream)
      assert(back.size == frames.size)
      // decoded pixels equal the CAVLC decode of the same source: the
      // layers above entropy coding are shared, so any difference is a
      // CABAC bug
      val cavlc = H264Codec.decode(H264Codec.encode(frames, qp = qp, allIntra = true))
      back.zip(cavlc).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.y.sameElements(b.y), s"qp $qp frame $i luma diverges from CAVLC")
        assert(a.cb.sameElements(b.cb) && a.cr.sameElements(b.cr),
          s"qp $qp frame $i chroma diverges from CAVLC")
      }
    }
  }

  test("CABAC IDR+P roundtrip (skip/mvd/cbp path) matches CAVLC decode") {
    // frame 1 shifts by 2 px (motion + skips), frame 2 adds noise (cbp)
    val base = grayFrame(48, 32, 0)
    val shifted = Array.tabulate(48 * 32) { i =>
      val x = i % 48; val y = i / 48
      base(math.min(31, y) * 48 + math.max(0, x - 2))
    }
    val r = rng(3)
    val noisy = shifted.map(b => ((b & 0xff) + r.nextInt(9) - 4).max(0).min(255).toByte)
    val frames = Seq(base, shifted, noisy).map(d =>
      Yuv(48, 32, d, Array.fill(24 * 16)(128.toByte), Array.fill(24 * 16)(128.toByte)))
    for (qp <- Seq(12, 24)) {
      val cb = H264Codec.decode(H264Codec.encode(frames, qp = qp, cabac = true))
      val cv = H264Codec.decode(H264Codec.encode(frames, qp = qp))
      assert(cb.size == 3 && cv.size == 3)
      cb.zip(cv).zipWithIndex.foreach { case ((a, b), i) =>
        assert(a.y.sameElements(b.y), s"qp $qp frame $i P-path diverges from CAVLC")
      }
    }
  }

  test("CABAC multi-slice pictures roundtrip (fresh contexts per slice)") {
    val frames = (0 until 2).map(t => grayYuv(32, 48, t))
    val cb = H264Codec.decode(H264Codec.encode(frames, qp = 16, cabac = true,
      slicesPerFrame = 3))
    val cv = H264Codec.decode(H264Codec.encode(frames, qp = 16))
    cb.zip(cv).foreach { case (a, b) => assert(a.y.sameElements(b.y)) }
  }

  test("CABAC streams carry the nonconformance SEI marker") {
    val stream = H264Codec.encode(Seq(grayYuv(16, 16, 0)), qp = 16, cabac = true)
    val sei = H264.nalUnits(stream).find(_.nalType == 6)
    assert(sei.isDefined, "no SEI NAL in CABAC stream")
    val txt = new String(sei.get.bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(txt.contains("NONCONFORMANT"), "SEI marker text missing")
  }

  test("CAVLC streams carry the codeword-reassignment SEI marker") {
    val stream = H264Codec.encode(Seq(grayYuv(16, 16, 0)), qp = 16)
    val sei = H264.nalUnits(stream).find(_.nalType == 6)
    assert(sei.isDefined, "no SEI NAL in CAVLC stream")
    val txt = new String(sei.get.bytes, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(txt.contains("Table 9-5"), "SEI marker text missing")
  }

  test("pcm + cabac is refused loudly") {
    intercept[IllegalArgumentException] {
      H264Codec.encode(Seq(grayYuv(16, 16, 0)), pcm = true, cabac = true)
    }
  }

  test("the independent ingest indexer walks CABAC streams") {
    val frames = (0 until 4).map(t => grayYuv(32, 32, t))
    val stream = H264Codec.encode(frames, qp = 16, cabac = true)
    val idx = H264.index(stream)
    assert(idx.frames.size == 4, s"expected 4 access units, indexed ${idx.frames.size}")
    assert(idx.frames.head.keyframe && idx.frames.tail.forall(!_.keyframe))
  }
}
