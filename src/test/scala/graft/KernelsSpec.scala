package graft

import org.apache.spark.sql.DataFrame
import graft.model.{Elem, FrameElem, FrameType}
import graft.operators.{Kernels, SequenceOps, StdKernels}
import graft.operators.SequenceOps.Partitioner

/** Ports of the reference's stateful-kernel and concrete-kernel tests
  * (`tests/py_test.py:407-435`, `tests/test_ops.cpp`).
  */
class KernelsSpec extends SparkSpec {

  test("tileGrid places each frame's pixel block at its grid cell") {
    import graft.operators.StdKernels
    // 4 frames of 2x2x1, values = frame id -> 2x2 grid of cells
    val frames = (0 until 4).map { i =>
      graft.model.FrameElem(0L, i.toLong, 2, 2, 1, graft.model.FrameType.U8,
        Array.fill(4)(i.toByte))
    }
    val g = StdKernels.tileGrid(frames, cols = 2)
    assert((g.height, g.width, g.channels) == ((4, 4, 1)))
    // row-major cells: (0 0 1 1 / 0 0 1 1 / 2 2 3 3 / 2 2 3 3)
    val expect = Array[Byte](0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3)
    assert(java.util.Arrays.equals(g.data, expect))
    // ragged last row: 3 frames over 2 cols -> 2x2 grid with a blank cell
    val g3 = StdKernels.tileGrid(frames.take(3), cols = 2)
    assert((g3.height, g3.width) == ((4, 4)))
    assert(g3.data(8) == 2 && g3.data(10) == 0) // row 2: frame2 block, then blank
  }
  import spark.implicits._

  def elems(n: Int, streams: Int = 1): DataFrame =
    (for (s <- 0 until streams; i <- 0 until n)
      yield Elem(s.toLong, i.toLong, i.toString.getBytes)).toDF()

  test("stateful plan shuffles exactly once (BASELINE.md bench target 3)") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def shuffles(df: DataFrame): Int = {
      df.collect() // AQE finalizes stages only on execution
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      // count distinct shuffle stages: exchanges nest inside AQE query
      // stages, whose `plan` is not a child — walk the string form instead
      plan.toString.linesIterator.count(_.contains("Exchange hashpartitioning"))
    }
    assert(shuffles(Kernels.unboundedState(elems(100, streams = 4),
      StdKernels.TestIncrement)) == 1)
    val sliced = SequenceOps.slice(elems(100), Partitioner.All(25))
    assert(shuffles(Kernels.unboundedState(sliced, StdKernels.TestIncrement,
      sliced = true)) == 1)
  }

  test("resize args: preserve_aspect derives missing dim; min mode no-ops when smaller (test_ops.cpp:130-147)") {
    import StdKernels.{resolveResizeDims, ResizeArgs}
    assert(resolveResizeDims(ResizeArgs(0, 30, preserveAspect = true), 20, 40) == ((30, 60)))
    assert(resolveResizeDims(ResizeArgs(60, 0, preserveAspect = true), 20, 40) == ((30, 60)))
    assert(resolveResizeDims(ResizeArgs(100, 100, minOnly = true), 20, 40) == ((20, 40)))
    assert(resolveResizeDims(ResizeArgs(10, 10, minOnly = true), 20, 40) == ((10, 10)))
  }

  test("bilinear resize interpolates between neighbors (cv INTER_LINEAR sampling)") {
    val f = FrameElem(0L, 0L, 1, 2, 1, FrameType.U8, Array(0, 100).map(_.toByte))
    val r = StdKernels.resize(f, 1, 4)
    // src = (dst + 0.5) * 0.5 - 0.5 -> samples at 0, 0.25, 0.75, 1 (clamped)
    assert(r.data.map(_ & 0xff).toSeq == Seq(0, 25, 75, 100))
  }

  test("bounded state warmup=3 + Gather[0,10,25,26,27] -> [0,3,3,4,5] (py_test.py:407-423)") {
    val out = Kernels.boundedState(elems(30), StdKernels.TestIncrement, 3,
        Some(Seq(0L, 10L, 25L, 26L, 27L)))
      .orderBy("index").collect()
      .map(r => StdKernels.decodeI64(r.getAs[Array[Byte]]("payload")))
    assert(out.toSeq == Seq(0L, 3L, 3L, 4L, 5L))
  }

  test("bounded state over all rows counts monotonically") {
    val out = Kernels.boundedState(elems(10), StdKernels.TestIncrement, 3, None)
      .orderBy("index").collect()
      .map(r => StdKernels.decodeI64(r.getAs[Array[Byte]]("payload")))
    assert(out.toSeq == (0L until 10L))
  }

  test("bounded state inside Slice: warmup replay and cold starts scope per slice (dag_analysis.cpp:1607-1620)") {
    // 60 rows in 3 slices of 20; requested LOCALS {0, 5, 19} with warmup 3
    // -> per slice: 0 alone (counter 0), 5 at the end of run {2..5}
    // (counter 3), 19 at the end of run {16..19} (counter 3)
    val sliced = SequenceOps.slice(elems(60), Partitioner.All(20))
    val out = Kernels.boundedState(sliced, StdKernels.TestIncrement, 3,
        Some(Seq(0L, 5L, 19L)), sliced = true)
      .orderBy("sliceId", "index").collect()
      .map(r => (r.getAs[Long]("sliceId"), r.getAs[Long]("index"),
        StdKernels.decodeI64(r.getAs[Array[Byte]]("payload"))))
    assert(out.toSeq == (0L until 3L).flatMap(sl =>
      Seq((sl, 0L, 0L), (sl, 5L, 3L), (sl, 19L, 3L))))
  }

  test("unbounded state preserves length; resets per slice (py_test.py:426-435)") {
    val sliced = SequenceOps.slice(elems(100), Partitioner.All(50))
    val out = Kernels.unboundedState(sliced, StdKernels.TestIncrement, sliced = true)
    assert(out.count() == 100)
    val vals = SequenceOps.unslice(out)
      .orderBy("index").collect()
      .map(r => StdKernels.decodeI64(r.getAs[Array[Byte]]("payload")))
    assert(vals.toSeq == ((0L until 50L) ++ (0L until 50L))) // counter resets at slice 1
  }

  test("unbounded state resets per stream") {
    val out = Kernels.unboundedState(elems(20, streams = 2), StdKernels.TestIncrement)
      .orderBy("streamId", "index").collect()
      .map(r => StdKernels.decodeI64(r.getAs[Array[Byte]]("payload")))
    assert(out.toSeq == ((0L until 20L) ++ (0L until 20L)))
  }

  test("per-slice op args: config keyed by sliceId changes kernel behavior (py_test.py:393-404)") {
    import org.apache.spark.sql.functions._
    // slice into 3 groups of 10; per-slice multiplier bound by sliceId —
    // the reference's per-slice args rate, realized as a closure config
    // exactly like per-stream args
    val sliced = SequenceOps.slice(elems(30), Partitioner.All(10))
    val perSlice = Map(0L -> 1L, 1L -> 10L, 2L -> 100L)
    import spark.implicits._
    val out = sliced.select(col("streamId"), col("sliceId"), col("index"), col("payload"))
      .as[(Long, Long, Long, Array[Byte])]
      .map { case (s, g, i, p) => (s, g, i, new String(p).toLong * perSlice(g)) }
      .collect().sortBy(t => (t._2, t._3))
    assert(out.length == 30)
    assert(out.filter(_._2 == 0L).map(_._4).toSeq == (0L until 10L))
    assert(out.filter(_._2 == 1L).map(_._4).toSeq == (10L until 20L).map(_ * 10))
    assert(out.filter(_._2 == 2L).map(_._4).toSeq == (20L until 30L).map(_ * 100))
  }

  test("stencil wider than a partition assembles across partition boundaries (py_test.py:459-520)") {
    // 600 rows forced into many small partitions; stencil offsets span far
    // beyond any single partition — the hash-agg assembly is partition-
    // agnostic, unlike a sliding-window-in-partition approach
    val df  = elems(600).repartition(32)
    val out = SequenceOps.stencil(df, Seq(-60, 0, 60), "payload")
      .orderBy("index").collect()
      .map(r => (r.getAs[Long]("index"),
        r.getSeq[Array[Byte]](r.fieldIndex("window")).map(b => new String(b).toLong)))
    assert(out.length == 600)
    assert(out(100)._2 == Seq(40L, 100L, 160L))
    assert(out(0)._2 == Seq(0L, 0L, 60L))     // repeat-edge at front
    assert(out(599)._2 == Seq(539L, 599L, 599L)) // repeat-edge at back
  }

  test("histogram: 3x16 int32 LE bins summing to H*W per channel (test_ops.cpp:13-59)") {
    val f   = StdKernels.syntheticFrame(0, 0, 8, 8, 3)
    val out = StdKernels.histogram(f)
    assert(out.length == 192)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val bins = Array.fill(48)(bb.getInt)
    (0 until 3).foreach { ch =>
      assert(bins.slice(ch * 16, ch * 16 + 16).sum == 64, s"channel $ch must sum to H*W")
    }
    // determinism
    assert(StdKernels.histogram(StdKernels.syntheticFrame(0, 0, 8, 8, 3)).toSeq == out.toSeq)
  }

  test("histogram op runs distributed over synthetic frames") {
    val frames = (0 until 50).map(i => StdKernels.syntheticFrame(0, i, 16, 16, 3)).toDS()
    val out = StdKernels.histogramOp(frames).collect()
    assert(out.length == 50 && out.forall(_.payload.length == 192))
  }

  test("resize changes dims, preserves channels (test_ops.cpp:114-170)") {
    val frames = (0 until 4).map(i => StdKernels.syntheticFrame(1, i, 32, 48, 3)).toDS()
    val out = StdKernels.resizeOp(frames, Map(1L -> (24, 16))).collect()
    assert(out.forall(f => f.height == 16 && f.width == 24 && f.data.length == 16 * 24 * 3))
  }

  test("blur keeps dims; uniform frame is a fixed point (test_ops.cpp:239-310)") {
    val flat = FrameElem(0, 0, 10, 10, 3, FrameType.U8, Array.fill(300)(100.toByte))
    val out  = StdKernels.blur(flat, 1)
    assert(out.data.toSeq == flat.data.toSeq)
    val f2 = StdKernels.blur(StdKernels.syntheticFrame(0, 1, 10, 10, 3), 1)
    assert(f2.height == 10 && f2.width == 10 && f2.data.length == 300)
  }

  test("image encoder emits decodable PNG (image_encoder.cpp:112-117)") {
    val png = StdKernels.encodePng(StdKernels.syntheticFrame(0, 3, 20, 30, 3))
    assert(png.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 30 && img.getHeight == 20)
  }

  test("optical flow: F32 (H,W,2) over stencil {0,1} (test_ops.cpp:63-111)") {
    val prev = StdKernels.syntheticFrame(0, 0, 8, 8, 3)
    val cur  = StdKernels.syntheticFrame(0, 1, 8, 8, 3)
    val flow = StdKernels.opticalFlow(prev, cur)
    assert(flow.dtype == FrameType.F32 && flow.channels == 2)
    assert(flow.data.length == 8 * 8 * 2 * 4)
  }

  test("optical flow recovers a known translation (dense Lucas-Kanade)") {
    // smooth 2D texture (sum of incommensurate sinusoids — gradient
    // energy in BOTH directions everywhere, no aperture ambiguity),
    // translated by exactly (dx, dy) = (2, 1) px between the frames
    val h = 48; val w = 64
    def tex(x: Double, y: Double): Int =
      (127.5 + 55 * math.sin(0.31 * x + 0.17 * y) * math.cos(0.23 * y - 0.11 * x)
        + 45 * math.sin(0.13 * x) * math.sin(0.19 * y)).round.toInt.max(0).min(255)
    def frame(idx: Long, dx: Int, dy: Int) = {
      val data = new Array[Byte](h * w)
      for (y <- 0 until h; x <- 0 until w)
        data(y * w + x) = tex(x - dx, y - dy).toByte
      graft.model.FrameElem(0L, idx, h, w, 1, FrameType.U8, data)
    }
    val flow = StdKernels.opticalFlow(frame(0, 0, 0), frame(1, 2, 1), r = 6)
    val bb = java.nio.ByteBuffer.wrap(flow.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    // interior pixels (away from the clamped border + window radius):
    // mean estimate must land near (2, 1); single-level LK on a smooth
    // texture is biased low for multi-pixel shifts, hence the loose band
    var su = 0.0; var sv = 0.0; var n = 0
    for (y <- 10 until h - 10; x <- 10 until w - 10) {
      val i = (y * w + x) * 2
      su += bb.getFloat(i * 4); sv += bb.getFloat(i * 4 + 4); n += 1
    }
    val mu = su / n; val mv = sv / n
    assert(math.abs(mu - 2.0) < 0.8, s"mean u $mu should be near 2.0")
    assert(math.abs(mv - 1.0) < 0.5, s"mean v $mv should be near 1.0")
    assert(mu > 2 * mv * 0.7 && mu < 2 * mv * 1.5,
      s"flow direction (u/v ratio) should be near 2:1, got $mu/$mv")
  }

  test("Farneback flow recovers a known translation (polynomial expansion)") {
    // same fixture as the LK test: smooth incommensurate-sinusoid texture
    // translated by (1, 1) px — within the single-scale estimator's range
    val h = 48; val w = 64
    def tex(x: Double, y: Double): Int =
      (127.5 + 55 * math.sin(0.31 * x + 0.17 * y) * math.cos(0.23 * y - 0.11 * x)
        + 45 * math.sin(0.13 * x) * math.sin(0.19 * y)).round.toInt.max(0).min(255)
    def frame(idx: Long, dx: Int, dy: Int) = {
      val data = new Array[Byte](h * w)
      for (y <- 0 until h; x <- 0 until w)
        data(y * w + x) = tex(x - dx, y - dy).toByte
      graft.model.FrameElem(0L, idx, h, w, 1, FrameType.U8, data)
    }
    val flow = StdKernels.farnebackFlow(frame(0, 0, 0), frame(1, 1, 1))
    assert(flow.dtype == FrameType.F32 && flow.channels == 2)
    assert(flow.data.length == h * w * 2 * 4)
    val bb = java.nio.ByteBuffer.wrap(flow.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var su = 0.0; var sv = 0.0; var n = 0
    for (y <- 10 until h - 10; x <- 10 until w - 10) {
      val i = (y * w + x) * 2
      su += bb.getFloat(i * 4); sv += bb.getFloat(i * 4 + 4); n += 1
    }
    val mu = su / n; val mv = sv / n
    assert(math.abs(mu - 1.0) < 0.35, s"mean u $mu should be near 1.0")
    assert(math.abs(mv - 1.0) < 0.35, s"mean v $mv should be near 1.0")
  }

  test("Farneback flow is zero for identical frames") {
    val f = StdKernels.syntheticFrame(0, 0, 24, 32, 3)
    val flow = StdKernels.farnebackFlow(f, f.copy(index = 1))
    val bb = java.nio.ByteBuffer.wrap(flow.data)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    while (bb.hasRemaining)
      assert(math.abs(bb.getFloat) < 1e-6)
  }

  test("laplacianVariance: zero on flat images, monotone under blur, degenerate-safe") {
    import graft.model.{FrameElem, FrameType}
    val flat = FrameElem(0L, 0L, 16, 24, 3, FrameType.U8,
      Array.fill[Byte](16 * 24 * 3)(77))
    assert(StdKernels.laplacianVariance(flat) == 0.0)
    val tex = StdKernels.texturedFrame(0L, 0L, 16, 24, 3)
    val sharp = StdKernels.laplacianVariance(tex)
    val blur1 = StdKernels.laplacianVariance(StdKernels.blur(tex, 1))
    val blur2 = StdKernels.laplacianVariance(StdKernels.blur(StdKernels.blur(tex, 1), 1))
    assert(sharp > blur1 && blur1 > blur2) // more defocus, lower score
    val tiny = FrameElem(0L, 0L, 2, 2, 1, FrameType.U8, Array[Byte](1, 2, 3, 4))
    assert(StdKernels.laplacianVariance(tiny) == 0.0) // no interior pixels
  }

  test("averageHash is brightness-invariant (no clipping) and image-sensitive") {
    val f = StdKernels.syntheticFrame(3, 7, 16, 24, 3)
    // keep every byte below 250 so a +5 shift can't clip
    val capped  = f.copy(data = f.data.map(b => math.min(249, b & 0xff).toByte))
    val shifted = capped.copy(data = capped.data.map(b => ((b & 0xff) + 5).toByte))
    assert(StdKernels.averageHash(capped) == StdKernels.averageHash(shifted),
      "mean-relative thresholding must ignore a uniform brightness shift")
    val other = StdKernels.syntheticFrame(4, 9, 16, 24, 3)
    assert(StdKernels.averageHash(capped) != StdKernels.averageHash(other),
      "different images should not share an aHash (for this fixture)")
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("perceptualHash survives brightness shift AND contrast scale; differs across images") {
    // texture fixture, NOT the ramp: the ramp's periodic symmetry makes
    // DCT coefficients tie EXACTLY at the pHash median, where photometric
    // FP eps flips bits arbitrarily (see texturedFrame). On a generic
    // spectrum the invariances are exact.
    val f = StdKernels.texturedFrame(3, 7, 32, 32, 3)
    // photometric edits: +7 brightness (capped so nothing clips) and
    // x0.5 contrast (pixels forced even so integer halving is exact)
    val capped = f.copy(data = f.data.map(b => (math.min(244, b & 0xff) & 0xfe).toByte))
    val h0 = StdKernels.perceptualHash(capped)
    val bright = capped.copy(data = capped.data.map(b => ((b & 0xff) + 7).toByte))
    assert(hamming(h0, StdKernels.perceptualHash(bright)) == 0,
      "brightness moves only the excluded DC coefficient")
    val contrast = capped.copy(data = capped.data.map(b => ((b & 0xff) / 2).toByte))
    assert(hamming(h0, StdKernels.perceptualHash(contrast)) == 0,
      "contrast scales every coefficient and the median together")
    val other = StdKernels.texturedFrame(9, 1, 32, 32, 3)
    assert(hamming(h0, StdKernels.perceptualHash(other)) > 7,
      "different images must not fall inside the widest near-dup Hamming ball")
    // DC bit (MSB) is 0 by construction
    assert(h0 >= 0L, "bit 63 is the excluded DC term and must be 0")
  }

  test("detectBlobs: exact boxes for known rectangles; union-find merges a U shape") {
    import graft.model.{FrameElem, FrameType}
    // 9x9 single-channel frame, background 0: rectangle A (x1..3, y1..2,
    // area 6) and a U shape (columns 5 and 7 over y3..6 plus the (6,6)
    // bridge, area 9). Threshold mean+1sigma falls strictly between 0 and
    // 255, so exactly the lit pixels are foreground; the U's two arms get
    // distinct provisional labels that must union at the bridge row.
    val w = 9; val h = 9
    val data = new Array[Byte](w * h)
    def set(x: Int, y: Int): Unit = data(y * w + x) = 255.toByte
    for (x <- 1 to 3; y <- 1 to 2) set(x, y)
    for (y <- 3 to 6) { set(5, y); set(7, y) }
    set(6, 6)
    val f = FrameElem(0L, 0L, h, w, 1, FrameType.U8, data)
    val got = StdKernels.detectBlobs(f, sigma = 1.0, minArea = 4)
    assert(got == Seq(
      (5, 3, 7, 6, 9), // the merged U (largest)
      (1, 1, 3, 2, 6)))
  }

  test("ramp frames tie DCT coefficients at the median — the documented pHash blind spot") {
    // keep the pathological case visible: on the periodic ramp a pure
    // brightness shift CAN flip median-tied bits (this is why the query
    // fixtures are textures and the banding is 8x8 bits)
    val f = StdKernels.syntheticFrame(3, 7, 32, 32, 3)
    val capped = f.copy(data = f.data.map(b => (math.min(244, b & 0xff) & 0xfe).toByte))
    val bright = capped.copy(data = capped.data.map(b => ((b & 0xff) + 7).toByte))
    val d = hamming(StdKernels.perceptualHash(capped), StdKernels.perceptualHash(bright))
    assert(d <= 8, s"even on tie-heavy content the flip count stays small, got $d")
  }
}
