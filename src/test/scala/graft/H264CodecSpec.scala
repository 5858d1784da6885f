package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264, H264Cavlc, H264Codec, H264Transform, H264Writer => W}
import graft.sources.H264Codec.Yuv

/** Pins for the pure-JVM H.264 pixel codec: structural validity of every
  * CAVLC table (prefix-free), entropy-layer encode→decode identity,
  * transform/quant inversion bounds, lossless I_PCM round trips, and
  * cross-validation of the emitted streams under the INDEPENDENT
  * [[H264]] ingest indexer (the parser written rounds earlier for the
  * reference's ingest path — it never shares code with the codec's
  * slice writer beyond the spec itself).
  */
class H264CodecSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  // deterministic grayscale test frame: smooth gradient + structured detail
  private def grayFrame(w: Int, h: Int, t: Int): Array[Byte] =
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      ((x * 3 + y * 2 + t * 5 + (if ((x / 4 + y / 4) % 2 == 0) 40 else 0)) % 256).toByte
    }

  private def grayYuv(w: Int, h: Int, t: Int): Yuv =
    Yuv(w, h, grayFrame(w, h, t),
      Array.fill(w / 2 * h / 2)(128.toByte), Array.fill(w / 2 * h / 2)(128.toByte))

  test("every CAVLC table is prefix-free") {
    assert(H264Cavlc.prefixViolations.isEmpty,
      H264Cavlc.prefixViolations.mkString("; "))
  }

  test("CAVLC block coding round-trips over randomized blocks, all contexts") {
    val r = rng(42)
    for {
      maxCoeff <- Seq(16, 15, 4)
      nC <- if (maxCoeff == 4) Seq(-1) else Seq(0, 1, 2, 3, 4, 7, 8, 16)
      trial <- 0 until 200
    } {
      val zig = new Array[Int](maxCoeff)
      val density = r.nextInt(maxCoeff + 1)
      (0 until density).foreach { _ =>
        val mag = r.nextInt(3) match {
          case 0 => 1 + r.nextInt(2)            // trailing-one territory
          case 1 => 1 + r.nextInt(30)           // mid levels
          case 2 => 1 + r.nextInt(2000)         // escape-code territory
        }
        zig(r.nextInt(maxCoeff)) = if (r.nextBoolean()) mag else -mag
      }
      val bw = new W.BitWriter
      val tcW = H264Cavlc.writeBlock(bw, zig, nC)
      val reader = new H264.BitReader(bw.rbspTrailing())
      val (out, tcR) = H264Cavlc.readBlock(reader, maxCoeff, nC)
      assert(out.toSeq == zig.toSeq, s"maxCoeff=$maxCoeff nC=$nC trial=$trial")
      assert(tcW == tcR)
    }
  }

  test("forward/inverse 4x4 transform with quant at QP 0 reconstructs within 1") {
    val r = rng(7)
    (0 until 100).foreach { _ =>
      val src = Array.fill(16)(r.nextInt(511) - 255)
      val b = src.clone()
      H264Transform.forward4x4(b)
      // quant/dequant round trip at QP 0 (no DC special-casing here: pure AC path)
      val z = Array.tabulate(16)(i => H264Transform.quantAc(b(i), 0, i))
      val w = Array.tabulate(16)(i => H264Transform.dequantAc(z(i), 0, i))
      H264Transform.inverse4x4(w)
      (0 until 16).foreach(i => assert(math.abs(w(i) - src(i)) <= 1,
        s"pos $i: ${w(i)} vs ${src(i)}"))
    }
  }

  test("I_PCM round trip is bit-exact (grayscale, cropped dims)") {
    val frames = (0 until 3).map(t => grayYuv(36, 28, t)) // crops 48x32 MB grid
    val stream = H264Codec.encode(frames, pcm = true)
    val back = H264Codec.decode(stream)
    assert(back.size == 3)
    frames.zip(back).foreach { case (a, b) =>
      assert(b.w == 36 && b.h == 28)
      assert(a.y.toSeq == b.y.toSeq)
      assert(a.cb.toSeq == b.cb.toSeq)
      assert(a.cr.toSeq == b.cr.toSeq)
    }
  }

  test("CAVLC intra coding reconstructs near-losslessly at QP 0") {
    val frames = (0 until 2).map(t => grayYuv(48, 32, t))
    val stream = H264Codec.encode(frames, qp = 0)
    val back = H264Codec.decode(stream)
    assert(back.size == 2)
    frames.zip(back).foreach { case (a, b) =>
      val maxErr = a.y.indices.map(i => math.abs((a.y(i) & 0xff) - (b.y(i) & 0xff))).max
      assert(maxErr <= 2, s"luma max error $maxErr at QP 0")
      val maxErrC = a.cb.indices.map(i => math.abs((a.cb(i) & 0xff) - (b.cb(i) & 0xff))).max
      assert(maxErrC <= 2, s"chroma max error $maxErrC at QP 0")
    }
  }

  test("quality degrades monotonically-ish with QP but stays bounded at QP 30") {
    val f = grayYuv(64, 48, 1)
    def mse(qp: Int): Double = {
      val b = H264Codec.decode(H264Codec.encode(Seq(f), qp = qp)).head
      f.y.indices.map { i =>
        val d = (f.y(i) & 0xff) - (b.y(i) & 0xff); d.toDouble * d
      }.sum / f.y.length
    }
    val m0 = mse(0); val m12 = mse(12); val m30 = mse(30)
    assert(m0 <= m12 + 0.5 && m12 <= m30 + 0.5, s"mse: $m0 / $m12 / $m30")
    val psnr30 = 10 * math.log10(255.0 * 255.0 / math.max(m30, 1e-9))
    assert(psnr30 > 28, s"QP30 PSNR $psnr30 too low for smooth content")
  }

  test("CAVLC coding compresses smooth content vs PCM and is deterministic") {
    val frames = (0 until 4).map(t => grayYuv(64, 64, t))
    val cavlc = H264Codec.encode(frames, qp = 24)
    val pcm = H264Codec.encode(frames, pcm = true)
    assert(cavlc.length < pcm.length / 3,
      s"CAVLC ${cavlc.length} B vs PCM ${pcm.length} B: no compression")
    assert(cavlc.toSeq == H264Codec.encode(frames, qp = 24).toSeq)
  }

  test("emitted streams index under the independent Annex-B ingest parser") {
    val frames = (0 until 5).map(t => grayYuv(48, 32, t))
    for (stream <- Seq(H264Codec.encode(frames, qp = 12),
      H264Codec.encode(frames, pcm = true))) {
      val ix = H264.index(stream)
      assert(ix.frames.size == 5)
      assert(ix.frames.head.keyframe, "frame 0 must be the IDR")
      assert(ix.frames.tail.forall(!_.keyframe))
      assert(ix.width == 48 && ix.height == 32)
      // frame_num advances per frame (mod wrap), as the AU splitter requires
      assert(ix.frames.map(_.frameNum) == (0 until 5))
    }
  }

  test("non-gray content: chroma planes code and round-trip within QP bounds") {
    val r = rng(11)
    val w = 32; val h = 32
    val y = Array.tabulate(w * h)(i => ((i * 7) % 200 + 20).toByte)
    val cb = Array.tabulate(w / 2 * h / 2)(i => (100 + (i % 60)).toByte)
    val cr = Array.tabulate(w / 2 * h / 2)(i => (160 - (i % 60)).toByte)
    val f = Yuv(w, h, y, cb, cr)
    val back = H264Codec.decode(H264Codec.encode(Seq(f), qp = 4)).head
    def maxErr(a: Array[Byte], b: Array[Byte]): Int =
      a.indices.map(i => math.abs((a(i) & 0xff) - (b(i) & 0xff))).max
    assert(maxErr(f.y, back.y) <= 3)
    assert(maxErr(f.cb, back.cb) <= 3, "Cb drifted")
    assert(maxErr(f.cr, back.cr) <= 3, "Cr drifted")
    // PCM carries chroma bit-exactly
    val pcmBack = H264Codec.decode(H264Codec.encode(Seq(f), pcm = true)).head
    assert(maxErr(f.cb, pcmBack.cb) == 0 && maxErr(f.cr, pcmBack.cr) == 0)
  }

  test("decode honors maxFrames (sequential prefix stop)") {
    val frames = (0 until 6).map(t => grayYuv(32, 32, t))
    val stream = H264Codec.encode(frames, qp = 12)
    assert(H264Codec.decode(stream, maxFrames = 2).size == 2)
    assert(H264Codec.decode(stream, maxFrames = 0).isEmpty)
  }

  // translating scene: base texture shifted by (2t, t) px per frame —
  // interior MBs are perfectly predictable by motion compensation
  private def movingYuv(w: Int, h: Int, t: Int): Yuv = {
    def base(x: Int, y: Int): Int =
      ((x * 7 + y * 13) % 180 + (if ((x / 8 + y / 8) % 2 == 0) 50 else 0)) & 0xff
    val y = Array.tabulate(w * h)(i => base(i % w + 2 * t, i / w + t).toByte)
    Yuv(w, h, y, Array.fill(w / 2 * h / 2)(128.toByte), Array.fill(w / 2 * h / 2)(128.toByte))
  }

  test("P frames round-trip: IDR + temporal prediction reconstructs within QP bounds") {
    val frames = (0 until 6).map(t => movingYuv(64, 48, t))
    val stream = H264Codec.encode(frames, qp = 4)
    val back = H264Codec.decode(stream)
    assert(back.size == 6)
    frames.zip(back).zipWithIndex.foreach { case ((a, b), i) =>
      val maxErr = a.y.indices.map(j => math.abs((a.y(j) & 0xff) - (b.y(j) & 0xff))).max
      assert(maxErr <= 4, s"frame $i luma max error $maxErr at QP 4 (drift?)")
    }
    // deterministic bitstream
    assert(stream.toSeq == H264Codec.encode(frames, qp = 4).toSeq)
  }

  test("P frames exploit motion: translating content codes far smaller than all-intra") {
    val frames = (0 until 8).map(t => movingYuv(64, 64, t))
    val inter = H264Codec.encode(frames, qp = 12)
    val intra = H264Codec.encode(frames, qp = 12, allIntra = true)
    assert(inter.length * 2 < intra.length,
      s"P stream ${inter.length} B vs all-intra ${intra.length} B: motion buys nothing")
  }

  test("static content collapses to skip runs (near-zero P frame cost)") {
    val f = grayYuv(64, 64, 0)
    val frames = Seq.fill(10)(f)
    val stream = H264Codec.encode(frames, qp = 12)
    // early P frames legitimately re-code the IDR's quantisation residue
    // (closed-loop refinement); once recon converges the frame is one
    // whole-picture skip run — pin the STEADY-STATE cost via the delta
    // between a 10-frame and a 9-frame encode. The coefficient-threshold
    // gate in analysePMb (drop blocks whose coding doesn't beat zero-
    // coding) is what guarantees convergence: without it, deadzone
    // levels ping-pong forever (measured 28-52 B/frame of stable
    // oscillation); with it the steady state is 10 B (header + skip run)
    val lastP = stream.length - H264Codec.encode(frames.take(9), qp = 12).length
    assert(lastP < 25, s"steady-state static P frame costs $lastP B — skip runs not engaging")
    val back = H264Codec.decode(stream)
    assert(back.size == 10)
    // near-converged steady state: successive P reconstructions agree to
    // within one quantisation step (a few MBs legitimately oscillate at
    // the deadzone boundary — the cost bound above pins that it is only
    // a few); it need not equal the lossy IDR recon
    val drift = back(9).y.indices
      .map(i => math.abs((back(9).y(i) & 0xff) - (back(8).y(i) & 0xff))).max
    assert(drift <= 4, s"steady-state oscillation amplitude $drift > one quant step")
  }

  test("multi-reference P: alternating content codes far smaller with a 2-deep DPB") {
    // frames alternate between two unrelated textures: every frame
    // predicts PERFECTLY from two back and badly from one back — the
    // regime ref_idx exists for
    def tex(seed: Int): Yuv = {
      val y = Array.tabulate(64 * 48) { i =>
        ((((i + seed * 40503L) * 2654435761L) >>> 24) & 0xff).toByte
      }
      Yuv(64, 48, y, Array.fill(32 * 24)(128.toByte), Array.fill(32 * 24)(128.toByte))
    }
    val frames = (0 until 8).map(t => tex(t % 2))
    val single = H264Codec.encode(frames, qp = 12)
    val multi = H264Codec.encode(frames, qp = 12, multiRef = true)
    // measured: 5.1 kB vs 9.7 kB — ref-1 prediction is exact up to the
    // reference's own quantization residue, which noise content still
    // pays to code, so the honest bar is 1.5x, not "near-skip"
    assert(multi.length * 3 < single.length * 2,
      s"multiRef ${multi.length} B vs single-ref ${single.length} B: ref_idx buys nothing")
    // round trip within QP bounds on every frame
    val back = H264Codec.decode(multi)
    assert(back.size == 8)
    frames.zip(back).zipWithIndex.foreach { case ((a, b), i) =>
      val maxErr = a.y.indices.map(j => math.abs((a.y(j) & 0xff) - (b.y(j) & 0xff))).max
      assert(maxErr <= 10, s"frame $i luma max error $maxErr at QP 12")
    }
    // deterministic; SPS advertises the 2-deep DPB to the independent parser
    assert(multi.toSeq == H264Codec.encode(frames, qp = 12, multiRef = true).toSeq)
    val ix = H264.index(multi)
    assert(ix.frames.size == 8)
    val spsNal = H264.nalUnits(multi).find(_.nalType == 7).get
    val sps = H264.parseSps(new H264.BitReader(H264.rbsp(spsNal.bytes, 1)))
    assert(sps.maxNumRefFrames == 2)
  }

  test("multi-reference CABAC and CAVLC streams decode to identical pixels") {
    // the analysis (incl. per-MB reference choice) is entropy-independent,
    // so the two entropy layers must reconstruct the same pictures —
    // extends the CabacSpec cross-entropy invariant to ref_idx coding
    def tex(seed: Int): Yuv = {
      val y = Array.tabulate(48 * 32) { i =>
        ((((i + seed * 40503L) * 2654435761L) >>> 24) & 0xff).toByte
      }
      Yuv(48, 32, y, Array.fill(24 * 16)(128.toByte), Array.fill(24 * 16)(128.toByte))
    }
    val frames = (0 until 6).map(t => tex(t % 2))
    val cavlc = H264Codec.decode(H264Codec.encode(frames, qp = 12, multiRef = true))
    val cabac = H264Codec.decode(
      H264Codec.encode(frames, qp = 12, multiRef = true, cabac = true))
    assert(cavlc.size == 6 && cabac.size == 6)
    cavlc.zip(cabac).zipWithIndex.foreach { case ((a, b), i) =>
      assert(a.y.toSeq == b.y.toSeq, s"frame $i luma differs across entropy layers")
      assert(a.cb.toSeq == b.cb.toSeq && a.cr.toSeq == b.cr.toSeq,
        s"frame $i chroma differs across entropy layers")
    }
  }

  test("multiRef on single-texture content still picks ref 0 (skip runs intact)") {
    // static content: both references predict equally, the fixed ref_idx
    // penalty must tie-break to 0 so whole-picture skips still engage —
    // multiRef costs only the per-MB te bit on coded MBs and the
    // 2-frame DPB header fields
    val f = grayYuv(64, 64, 0)
    val frames = Seq.fill(10)(f)
    val single = H264Codec.encode(frames, qp = 12)
    val multi = H264Codec.encode(frames, qp = 12, multiRef = true)
    val lastP = multi.length - H264Codec.encode(frames.take(9), qp = 12,
      multiRef = true).length
    assert(lastP < 25, s"steady-state static P frame costs $lastP B under multiRef")
    assert(multi.length <= single.length + 64,
      s"multiRef ${multi.length} B vs ${single.length} B on static content")
    val back = H264Codec.decode(multi)
    assert(back.size == 10)
  }

  test("P streams index under the independent parser with correct slice types") {
    val frames = (0 until 5).map(t => movingYuv(48, 32, t))
    val ix = H264.index(H264Codec.encode(frames, qp = 12))
    assert(ix.frames.size == 5)
    assert(ix.frames.head.keyframe && ix.frames.head.sliceType % 5 == 2, "IDR I slice")
    assert(ix.frames.tail.forall(f => !f.keyframe && f.sliceType % 5 == 0), "P slices")
  }

  test("half-pel motion: sub-integer translation codes smaller and cleaner than integer-only ME") {
    // content translating 0.5 px/frame horizontally: frames sample a
    // smooth continuous pattern at x + t/2 via exact bilinear, so odd
    // frames sit BETWEEN integer positions of their predecessor — the
    // regime the 6-tap half-pel filter exists for
    def cont(x: Double, y: Double): Double = {
      val v = 96 + 60 * math.sin(x * 0.35) + 50 * math.cos(y * 0.3 + x * 0.1)
      math.max(0, math.min(255, v))
    }
    def frame(t: Int): Yuv = {
      val w = 64; val h = 48
      val y = Array.tabulate(w * h) { i =>
        val xx = (i % w) + t * 0.5
        val x0 = math.floor(xx).toInt
        val f = xx - x0
        math.round((1 - f) * cont(x0, i / w) + f * cont(x0 + 1, i / w)).toInt.toByte
      }
      Yuv(w, h, y, Array.fill(w / 2 * h / 2)(128.toByte), Array.fill(w / 2 * h / 2)(128.toByte))
    }
    val frames = (0 until 8).map(frame)
    val half = H264Codec.encode(frames, qp = 12)
    val intOnly = H264Codec.encode(frames, qp = 12, halfPel = false)
    assert(half.length < intOnly.length,
      s"half-pel ${half.length} B vs integer-only ${intOnly.length} B: filter buys nothing")
    // and the half-pel streams still round-trip within the QP bound
    val back = H264Codec.decode(half)
    frames.zip(back).foreach { case (a, b) =>
      val mae = a.y.indices.map(i => math.abs((a.y(i) & 0xff) - (b.y(i) & 0xff))).sum.toDouble / a.y.length
      assert(mae < 3.0, s"half-pel mean abs error $mae")
    }
  }

  test("corrupt slice data fails loudly, not silently wrong") {
    val stream = H264Codec.encode(Seq(grayYuv(32, 32, 0)), qp = 12)
    // flip bits in the middle of the slice payload
    val bad = stream.clone()
    bad(bad.length / 2) = (bad(bad.length / 2) ^ 0x5a).toByte
    val res = scala.util.Try(H264Codec.decode(bad))
    res match {
      case scala.util.Failure(_) => () // loud refusal: good
      case scala.util.Success(fs) =>
        // a flip that survives parsing must still change the output, never
        // silently reproduce the original
        val orig = H264Codec.decode(stream)
        assert(fs.isEmpty || fs.head.y.toSeq != orig.head.y.toSeq)
    }
  }

  test("quarter-pel motion: 0.25-sample translation codes tighter than half-pel-only ME") {
    // a smooth sinusoid sampled at x - 0.25t: each frame is the previous
    // one translated by exactly one QUARTER sample, so the best
    // prediction lives at an odd quarter-pel MV — content the half-pel
    // grid cannot align to
    val w = 64; val h = 32
    def f(t: Int) = Yuv(w, h,
      Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        (128 + 70 * math.sin((x - 0.25 * t) * 0.35) + 15 * math.cos(y * 0.4)).toInt.toByte
      },
      Array.fill(w / 2 * h / 2)(128.toByte), Array.fill(w / 2 * h / 2)(128.toByte))
    val frames = (0 until 6).map(f)
    val quarter = H264Codec.encode(frames, qp = 20)
    val halfOnly = H264Codec.encode(frames, qp = 20, quarterPel = false)
    assert(quarter.length < halfOnly.length,
      s"quarter ${quarter.length} B must undercut half-only ${halfOnly.length} B")
    // the decoder's quarter-pel interpolation path round-trips the stream
    val back = H264Codec.decode(quarter)
    assert(back.size == 6)
    val maxErr = back.last.y.zip(frames.last.y)
      .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
    assert(maxErr <= 24, s"QP 20 quarter-pel chain error $maxErr")
  }

  test("deblocking tables match the spec endpoints and structure") {
    import graft.sources.H264Deblock._
    assert(alphaTab.length == 52 && betaTab.length == 52)
    assert(tc0Tab.length == 3 && tc0Tab.forall(_.length == 52))
    // below index 16 all thresholds are zero — low-QP pictures never filter
    assert((0 until 16).forall(i => alphaTab(i) == 0 && betaTab(i) == 0 &&
      tc0Tab.forall(_(i) == 0)))
    // table 8-16/8-17 endpoints
    assert(alphaTab(16) == 4 && alphaTab(51) == 255)
    assert(betaTab(16) == 2 && betaTab(51) == 18)
    assert(tc0Tab(0)(51) == 13 && tc0Tab(1)(51) == 17 && tc0Tab(2)(51) == 25)
    // monotone non-decreasing in qp index, and in bS
    def mono(a: Array[Int]) = a.zip(a.tail).forall { case (x, y) => x <= y }
    assert(mono(alphaTab) && mono(betaTab) && tc0Tab.forall(mono))
    assert((0 until 52).forall(i => tc0Tab(0)(i) <= tc0Tab(1)(i) &&
      tc0Tab(1)(i) <= tc0Tab(2)(i)))
  }

  test("luma edge filter: hand-computed bS<4 step response") {
    import graft.sources.H264Deblock
    // an 8-sample step edge p3..q3 = 100,100,100,100,108,108,108,108
    val line = Array[Byte](100, 100, 100, 100, 108, 108, 108, 108)
    // indexA=indexB=30: alpha=25, beta=8, tc0(bS=2)=1
    H264Deblock.filterLumaLine(line, 4, 1, 2, 25, 8, 1)
    // tc = 1+ap+aq = 3; delta = clip(((8<<2)+0+4)>>3)=clip(4)=3 ->
    // wait: p1-q1 = 100-108 = -8 -> ((32-8+4)>>3)=3
    assert(line.toSeq.map(_ & 0xff) == Seq(100, 100, 101, 103, 105, 107, 108, 108))
  }

  test("luma edge filter: activity gate leaves real edges alone") {
    import graft.sources.H264Deblock
    // a genuine content edge (gap >= alpha) must NOT be smoothed
    val line = Array[Byte](100, 100, 100, 100, (200 & 0xff).toByte, (200 & 0xff).toByte,
      (200 & 0xff).toByte, (200 & 0xff).toByte)
    val before = line.toSeq
    H264Deblock.filterLumaLine(line, 4, 1, 3, 25, 8, 1)
    assert(line.toSeq == before)
  }

  test("in-loop deblocking reduces block-edge discontinuity at high QP") {
    // smooth diagonal gradient: blocking artifacts at 16-aligned edges
    // are pure quantization error, which the filter exists to remove
    val w = 64; val h = 64
    val y = Array.tabulate(w * h)(i => ((i % w) * 2 + (i / w) * 2).toByte)
    val f = Yuv(w, h, y, Array.fill(w / 2 * h / 2)(128.toByte),
      Array.fill(w / 2 * h / 2)(128.toByte))
    val on  = H264Codec.decode(H264Codec.encode(Seq(f), qp = 38)).head
    val off = H264Codec.decode(H264Codec.encode(Seq(f), qp = 38, deblock = false)).head
    assert(!on.y.sameElements(off.y), "filter must actually fire at QP 38")
    // total variation across vertical MB boundaries (columns 16,32,48)
    def edgeTv(img: Array[Byte]): Long = {
      var s = 0L
      for (row <- 0 until h; cx <- Seq(16, 32, 48))
        s += math.abs((img(row * w + cx) & 0xff) - (img(row * w + cx - 1) & 0xff))
      s
    }
    assert(edgeTv(on.y) < edgeTv(off.y),
      s"edge TV on=${edgeTv(on.y)} must undercut off=${edgeTv(off.y)}")
    // and the filtered picture is closer to the source
    def mse(a: Array[Byte], b: Array[Byte]): Double =
      a.zip(b).map { case (p, q) => val d = (p & 0xff) - (q & 0xff); d * d }.sum.toDouble / a.length
    assert(mse(on.y, y) <= mse(off.y, y) * 1.05,
      s"filtered MSE ${mse(on.y, y)} vs unfiltered ${mse(off.y, y)}")
  }

  test("deblocking is in-loop: P frames predict from the filtered reference") {
    // smooth gradient drifting over time: quantization blocking (the
    // filter's target) appears at MB edges, and P frames chain off the
    // filtered reconstruction
    val w = 48; val h = 32
    def grad(t: Int) = Yuv(w, h,
      Array.tabulate(w * h)(i => ((i % w) * 2 + (i / w) * 2 + t * 3).toByte),
      Array.fill(w / 2 * h / 2)(128.toByte), Array.fill(w / 2 * h / 2)(128.toByte))
    val frames = (0 until 4).map(grad)
    val on  = H264Codec.decode(H264Codec.encode(frames, qp = 38))
    val off = H264Codec.decode(H264Codec.encode(frames, qp = 38, deblock = false))
    assert(on.size == 4 && off.size == 4)
    // last P frame differs between the two loops (reference divergence
    // compounds), yet both decode losslessly vs their own encoder recon —
    // proven by the closed-loop round trip not asserting here; what we
    // pin is that the filter changed the P chain, not just the IDR
    assert(!on.last.y.sameElements(off.last.y))
  }

  test("multi-slice pictures: split, decode, and bounded round-trip error") {
    val frames = (0 until 3).map(t => grayYuv(64, 64, t))
    val stream = H264Codec.encode(frames, qp = 16, slicesPerFrame = 4)
    // 4 VCL NALs per picture
    val vcl = graft.sources.H264.nalUnits(stream).filter(_.isVcl)
    assert(vcl.size == 12, s"expected 3 pictures x 4 slices, got ${vcl.size} VCL NALs")
    val back = H264Codec.decode(stream)
    assert(back.size == 3)
    val maxErr = back.zip(frames).map { case (b, f) =>
      b.y.zip(f.y).map { case (p, q) => math.abs((p & 0xff) - (q & 0xff)) }.max
    }.max
    assert(maxErr <= 20, s"QP 16 multi-slice error $maxErr")
    // the independent ingest indexer sees ONE access unit of 4 slices
    val ix = graft.sources.H264.index(stream)
    assert(ix.frames.size == 3 && ix.frames.forall(_.nSlices == 4))
  }

  test("slices are independently decodable: arrival order within a picture is irrelevant") {
    val frames = (0 until 2).map(t => grayYuv(64, 64, t))
    val stream = H264Codec.encode(frames, qp = 16, slicesPerFrame = 3)
    val nals = graft.sources.H264.nalUnits(stream)
    def rebuild(order: Seq[graft.sources.H264.Nal]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      order.foreach { nal =>
        out.write(Array[Byte](0, 0, 0, 1)); out.write(nal.bytes)
      }
      out.toByteArray
    }
    // swap the 2nd and 3rd slices of the FIRST picture (located via
    // isVcl — the stream also carries non-VCL SPS/PPS/SEI NALs up front)
    val v = nals.indexWhere(_.isVcl)
    val swapped = nals.take(v + 1) ++ Seq(nals(v + 2), nals(v + 1)) ++ nals.drop(v + 3)
    val a = H264Codec.decode(stream)
    val b = H264Codec.decode(rebuild(swapped))
    assert(a.size == b.size)
    a.zip(b).foreach { case (x, y) =>
      assert(x.y.sameElements(y.y) && x.cb.sameElements(y.cb) && x.cr.sameElements(y.cr),
        "slice arrival order changed decoded samples — slices are not independent")
    }
  }

  test("a missing slice fails loudly, never silently partial") {
    val stream = H264Codec.encode(Seq(grayYuv(64, 64, 1)), qp = 16, slicesPerFrame = 4)
    val nals = graft.sources.H264.nalUnits(stream)
    val out = new java.io.ByteArrayOutputStream()
    // drop the 3rd slice NAL (keep parameter sets/SEI and slices 0,1,3)
    val thirdSlice = nals.indexWhere(_.isVcl) + 2
    nals.zipWithIndex.filterNot(_._2 == thirdSlice).map(_._1).foreach { nal =>
      out.write(Array[Byte](0, 0, 0, 1)); out.write(nal.bytes)
    }
    val e = intercept[IllegalArgumentException] {
      H264Codec.decode(out.toByteArray)
    }
    assert(e.getMessage.contains("covered by no slice"))
  }

  test("PCM tier stays bit-exact: deblocking never touches it") {
    val f = grayYuv(32, 32, 2)
    val stream = H264Codec.encode(Seq(f), pcm = true)
    val back = H264Codec.decode(stream).head
    assert(back.y.sameElements(f.y) && back.cb.sameElements(f.cb) &&
      back.cr.sameElements(f.cr))
  }
}
