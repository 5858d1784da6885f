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
    // compare against CAVLC at the SAME slice split: slice boundaries
    // change intra-prediction availability, so the slicing must match
    // for the cross-entropy pixel equality to hold
    val frames = (0 until 2).map(t => grayYuv(32, 48, t))
    val cb = H264Codec.decode(H264Codec.encode(frames, qp = 16, cabac = true,
      slicesPerFrame = 3))
    val cv = H264Codec.decode(H264Codec.encode(frames, qp = 16, slicesPerFrame = 3))
    assert(cb.size == 2)
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

  test("Intra_16x16 V/H/DC/plane predictions match the §8.3.3 formulas") {
    val top = Array.tabulate(16)(i => 40 + i * 7)
    val left = Array.tabulate(16)(i => 200 - i * 9)
    val corner = 99
    // vertical: each output row copies the top row
    val v = H264Codec.i16PredForTest(Some(top), Some(left), corner, mode = 0)
    for (y <- 0 until 16; x <- 0 until 16) assert(v(y * 16 + x) == top(x))
    // horizontal: each output column replicates the left column
    val h = H264Codec.i16PredForTest(Some(top), Some(left), corner, mode = 1)
    for (y <- 0 until 16; x <- 0 until 16) assert(h(y * 16 + x) == left(y))
    // DC with both neighbors: (sum + 16) >> 5
    val dcBoth = H264Codec.i16PredForTest(Some(top), Some(left), corner, mode = 2)
    val expDc = (top.sum + left.sum + 16) >> 5
    assert(dcBoth.forall(_ == expDc))
    // DC with no neighbors: 128
    assert(H264Codec.i16PredForTest(None, None, 0, mode = 2).forall(_ == 128))
    // plane: recompute §8.3.3.4 independently
    val pl = H264Codec.i16PredForTest(Some(top), Some(left), corner, mode = 3)
    def tAt(i: Int) = if (i == -1) corner else top(i)
    def lAt(i: Int) = if (i == -1) corner else left(i)
    val hG = (1 to 8).map(i => i * (tAt(7 + i) - tAt(7 - i))).sum
    val vG = (1 to 8).map(i => i * (lAt(7 + i) - lAt(7 - i))).sum
    val a = 16 * (left(15) + top(15))
    val b = (5 * hG + 32) >> 6
    val c = (5 * vG + 32) >> 6
    for (y <- 0 until 16; x <- 0 until 16) {
      val exp = math.max(0, math.min(255, (a + b * (x - 7) + c * (y - 7) + 16) >> 5))
      assert(pl(y * 16 + x) == exp, s"plane($x,$y)")
    }
    // availability: V refused without a top neighbor, plane without corner
    intercept[IllegalArgumentException] {
      H264Codec.i16PredForTest(None, Some(left), 0, mode = 0)
    }
    intercept[IllegalArgumentException] {
      H264Codec.i16PredForTest(Some(top), None, 0, mode = 3)
    }
  }

  test("I16 mode decision survives the full roundtrip on directional content") {
    // three content types that favor different modes: vertical stripes
    // (V from the row above is exact), horizontal bands (H exact from
    // the left column), and a smooth diagonal ramp (plane fits best) —
    // each must roundtrip decodable and match CAVLC pixels exactly
    def frame(gen: (Int, Int) => Int): Yuv = {
      val y = Array.tabulate(32 * 32)(i => gen(i % 32, i / 32).toByte)
      Yuv(32, 32, y, Array.fill(16 * 16)(128.toByte), Array.fill(16 * 16)(128.toByte))
    }
    val fs = Seq(
      frame((x, _) => 30 + (x % 8) * 25),        // vertical stripes
      frame((_, y) => 30 + (y % 8) * 25),        // horizontal bands
      frame((x, y) => (60 + x * 4 + y * 3).min(255))) // smooth ramp
    for (f <- fs; qp <- Seq(12, 30)) {
      val cavlc = H264Codec.decode(H264Codec.encode(Seq(f), qp = qp, allIntra = true))
      val cabac = H264Codec.decode(H264Codec.encode(Seq(f), qp = qp, allIntra = true,
        cabac = true))
      assert(cavlc.size == 1 && cabac.size == 1)
      assert(cavlc.head.y.sameElements(cabac.head.y))
    }
  }

  test("Table 9-5 arbitration: circulated values are self-inconsistent, reassignments active") {
    import graft.sources.H264Cavlc
    val d = H264Cavlc.disputed
    assert(d.size == 3)
    d.foreach { case (table, tc, t1, circulated, reassigned) =>
      // the table actually holds the reassignment...
      assert(H264Cavlc.tokenEntry(table, tc, t1) == reassigned,
        s"$table($tc,$t1) is not the documented reassignment")
      // ...the reassignment is structurally admissible...
      assert(H264Cavlc.substitutionViolations(table, tc, t1,
        reassigned._1, reassigned._2).isEmpty)
      // ...and the circulated value provably is NOT: putting it back
      // breaks prefix-freeness against the surrounding rows, so the
      // circulated table copy cannot be what the normative text says
      val viol = H264Cavlc.substitutionViolations(table, tc, t1,
        circulated._1, circulated._2)
      assert(viol.nonEmpty,
        s"circulated $table($tc,$t1)=$circulated is admissible — reassignment unjustified!")
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
