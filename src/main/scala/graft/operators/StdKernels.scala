package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import graft.model.{Elem, FrameElem, FrameType}

/** Ports of the concrete kernels the reference ships (SURVEY.md §2.4) —
  * these define the semantics our specs verify. All are pure Scala over the
  * `FrameElem`/`Elem` model; media codecs are JDK-only (javax.imageio).
  */
object StdKernels {

  private val frameEnc: Encoder[FrameElem] = Encoders.product[FrameElem]
  private val elemEnc: Encoder[Elem]       = Encoders.product[Elem]

  /** Deterministic synthetic frame generator (FIXTURES.md §4 `frames-synth`):
    * replaces the reference's GCS-downloaded test videos with reproducible
    * U8 HWC frames derived from (streamId, index, pixel).
    */
  def syntheticFrame(streamId: Long, index: Long, h: Int, w: Int, c: Int): FrameElem = {
    val data = new Array[Byte](h * w * c)
    var p = 0
    while (p < data.length) {
      data(p) = (((streamId * 31 + index * 7 + p) & 0xff)).toByte
      p += 1
    }
    FrameElem(streamId, index, h, w, c, FrameType.U8, data)
  }

  /** Hash-pixel texture frame — the DCT-generic fixture for the
    * perceptual-hash family. The plain [[syntheticFrame]] ramp is
    * pathological for spectral hashing: its periodic symmetry makes many
    * DCT coefficients EXACTLY tie at the pHash median (so photometric-
    * edit FP eps flips bits) and consecutive frames are genuine spectral
    * near-dups of each other. Knuth-hash pixels give every frame a
    * well-separated generic spectrum: variants land at Hamming ~0,
    * different frames at ~32.
    */
  def texturedFrame(streamId: Long, index: Long, h: Int, w: Int, c: Int): FrameElem = {
    val data = new Array[Byte](h * w * c)
    var p = 0
    while (p < data.length) {
      val x = (streamId * 1000003L + index * 40503L + p) * 2654435761L
      data(p) = ((x >>> 24) & 0xff).toByte
      p += 1
    }
    FrameElem(streamId, index, h, w, c, FrameType.U8, data)
  }

  /** Histogram: per-frame 16-bin histogram per channel, 3 channels → 48
    * little-endian int32s (192 bytes) — `tests/test_ops.cpp:13-59`,
    * deserializer `python/scannerpy/types.py:132`.
    */
  def histogram(frame: FrameElem): Array[Byte] = {
    require(frame.dtype == FrameType.U8 && frame.channels == 3,
      "Histogram expects U8 HWC3 frames (test_ops.cpp:22-47)")
    val bins = new Array[Int](48)
    val d    = frame.data
    var p    = 0
    while (p < d.length) {
      val ch = p % 3 // HWC interleaved: channel = p mod 3
      bins(ch * 16 + ((d(p) & 0xff) >> 4)) += 1
      p += 1
    }
    val bb = ByteBuffer.allocate(192).order(ByteOrder.LITTLE_ENDIAN)
    bins.foreach(bb.putInt)
    bb.array()
  }

  def histogramOp(ds: Dataset[FrameElem]): Dataset[Elem] =
    ds.map(f => Elem(f.streamId, f.index, histogram(f)))(elemEnc)

  /** parse a histogram payload (LE int32s) back to typed bins — the view
    * histogram-difference ops (shot detection) consume as an array column
    */
  def histogramBins(payload: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(payload.length / 4)(bb.getInt())
  }

  /** Stream-config args of the reference Resize op (`tests/test_ops.proto`
    * ResizeArgs; kernel `tests/test_ops.cpp:114-170`): target dims, aspect
    * preservation (one dim 0 → derived from the other), and min mode
    * (no-op when the frame already fits).
    */
  final case class ResizeArgs(
      width: Int, height: Int, preserveAspect: Boolean = false, minOnly: Boolean = false)

  /** Target-dimension derivation — exact port of the reference's
    * preserve_aspect / min logic (`test_ops.cpp:130-147`).
    */
  def resolveResizeDims(a: ResizeArgs, srcH: Int, srcW: Int): (Int, Int) = {
    var (tw, th) = (a.width, a.height)
    if (a.preserveAspect) {
      if (tw == 0) tw = srcW * th / srcH
      else th = srcH * tw / srcW
    }
    if (a.minOnly && srcW <= tw && srcH <= th) { tw = srcW; th = srcH }
    (th, tw)
  }

  /** Bilinear resize — the reference resizes via OpenCV `cv::resize`
    * default INTER_LINEAR (`test_ops.cpp:154`); this is the same sampling
    * (src = (dst + 0.5) * scale - 0.5, 4-neighbor blend, edge clamp) in
    * dependency-free double math. Not bit-identical to OpenCV's fixed-point
    * path (OpenCV is not in this container to compare against), but the
    * algorithm, dims logic, and plan shape are the reference's.
    */
  def resize(frame: FrameElem, outH: Int, outW: Int): FrameElem = {
    require(frame.dtype == FrameType.U8)
    val c  = frame.channels
    val h  = frame.height; val w = frame.width
    val out = new Array[Byte](outH * outW * c)
    val syS = h.toDouble / outH
    val sxS = w.toDouble / outW
    var y = 0
    while (y < outH) {
      val fy = math.max(0.0, (y + 0.5) * syS - 0.5)
      val y0 = math.min(h - 1, fy.toInt)
      val y1 = math.min(h - 1, y0 + 1)
      val wy = fy - y0
      var x = 0
      while (x < outW) {
        val fx = math.max(0.0, (x + 0.5) * sxS - 0.5)
        val x0 = math.min(w - 1, fx.toInt)
        val x1 = math.min(w - 1, x0 + 1)
        val wx = fx - x0
        val dst = (y * outW + x) * c
        var k = 0
        while (k < c) {
          val p00 = frame.data((y0 * w + x0) * c + k) & 0xff
          val p01 = frame.data((y0 * w + x1) * c + k) & 0xff
          val p10 = frame.data((y1 * w + x0) * c + k) & 0xff
          val p11 = frame.data((y1 * w + x1) * c + k) & 0xff
          val v = (p00 * (1 - wx) + p01 * wx) * (1 - wy) +
                  (p10 * (1 - wx) + p11 * wx) * wy
          out(dst + k) = math.round(v).toInt.min(255).max(0).toByte
          k += 1
        }
        x += 1
      }
      y += 1
    }
    frame.copy(height = outH, width = outW, data = out)
  }

  /** Average-hash perceptual fingerprint (aHash): grayscale -> bilinear
    * 8x8 downsample (the [[resize]] kernel on a 1-channel frame) ->
    * threshold each cell against the mean -> 64-bit hash, MSB = cell
    * (0,0). Brightness/contrast shifts preserve the bits (thresholding is
    * relative to the mean), so it pairs with a banded Hamming join for
    * image near-dup detection — the multimodal analog of SimHash on text.
    */
  /** Blur detection: variance of the 4-neighbor Laplacian over the
    * grayscale image — the classic variance-of-Laplacian sharpness score
    * (Pech-Pacheco et al. 2000, the OpenCV `CV_64F` Laplacian-variance
    * recipe): sharp edges carry large second derivatives, defocus
    * collapses them toward zero. Interior pixels only (no border-padding
    * bias); degenerate (<3px) images score 0.
    */
  def laplacianVariance(frame: FrameElem): Double = {
    val g = grayscale(frame)
    val h = g.height; val w = g.width
    if (h < 3 || w < 3) return 0.0
    var sum = 0.0; var sumSq = 0.0; var n = 0L
    var y = 1
    while (y < h - 1) {
      var x = 1
      while (x < w - 1) {
        val lap = 4 * (g.data(y * w + x) & 0xff) -
          (g.data((y - 1) * w + x) & 0xff) - (g.data((y + 1) * w + x) & 0xff) -
          (g.data(y * w + x - 1) & 0xff) - (g.data(y * w + x + 1) & 0xff)
        sum += lap
        sumSq += lap.toDouble * lap
        n += 1
        x += 1
      }
      y += 1
    }
    val mean = sum / n
    sumSq / n - mean * mean
  }

  /** channel-averaged 1-channel view — the shared prologue of both
    * perceptual hash families (one definition so their grayscale
    * conventions can't drift)
    */
  private def grayscale(frame: FrameElem): FrameElem = {
    require(frame.dtype == FrameType.U8)
    val c    = frame.channels
    val n    = frame.height * frame.width
    val gray = new Array[Byte](n)
    var i = 0
    while (i < n) {
      var s = 0
      var k = 0
      while (k < c) { s += frame.data(i * c + k) & 0xff; k += 1 }
      gray(i) = (s / c).toByte
      i += 1
    }
    frame.copy(channels = 1, data = gray)
  }

  def averageHash(frame: FrameElem): Long = {
    val small = resize(grayscale(frame), 8, 8)
    var sum = 0L
    var i = 0
    while (i < 64) { sum += small.data(i) & 0xff; i += 1 }
    val mean = sum / 64.0
    var hash = 0L
    i = 0
    while (i < 64) {
      if ((small.data(i) & 0xff) >= mean) hash |= 1L << (63 - i)
      i += 1
    }
    hash
  }

  /** DCT perceptual hash (pHash, Zauner 2010): grayscale -> bilinear
    * 32x32 downsample -> 2D DCT-II -> 8x8 low-frequency block -> each AC
    * coefficient thresholds against the MEDIAN of the 63 ACs (the DC term
    * is excluded and its bit is always 0; MSB = cell (0,0), row-major).
    * Invariant (up to FP eps) to uniform brightness shifts — only the DC
    * coefficient moves — AND to contrast scaling — every coefficient and
    * the median scale together — so it survives the classic photometric
    * edits that defeat pixel hashes; structural edits (crops, rotations)
    * still change it. Pairs with the same banded-Hamming join as
    * [[averageHash]] for image near-dup at corpus scale.
    */
  /** the constant 8x32 DCT-II basis (only the first 8 frequencies are
    * ever read). StrictMath.cos, not Math.cos: the pinned oracle asserts
    * exact Hamming values, and Math.cos is only 1-ulp-accurate with
    * platform/JIT-dependent intrinsics — a borderline AC-vs-median bit
    * must not flip across JVMs/architectures.
    */
  private val dctBasis: Array[Array[Double]] = Array.tabulate(8, 32)((k, m) =>
    StrictMath.cos(math.Pi * (2 * m + 1) * k / 64.0))

  def perceptualHash(frame: FrameElem): Long = {
    val small = resize(grayscale(frame), 32, 32)
    // separable DCT-II over the shared constant basis
    val cosT = dctBasis
    val rows = Array.ofDim[Double](32, 8)
    var i = 0
    var y = 0
    while (y < 32) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 32) { s += (small.data(y * 32 + x) & 0xff) * cosT(u)(x); x += 1 }
        rows(y)(u) = s
        u += 1
      }
      y += 1
    }
    val coef = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var yy = 0
        while (yy < 32) { s += rows(yy)(u) * cosT(v)(yy); yy += 1 }
        coef(v * 8 + u) = s
        u += 1
      }
      v += 1
    }
    val ac = java.util.Arrays.copyOfRange(coef, 1, 64)
    java.util.Arrays.sort(ac)
    val med = ac(31) // exact median of the 63 AC coefficients
    var hash = 0L
    i = 1
    while (i < 64) {
      if (coef(i) > med) hash |= 1L << (63 - i)
      i += 1
    }
    hash
  }

  /** Bright-blob detector — the detection-family kernel (the reference's
    * scannertools detection ops are model-backed — faces, objects, pose —
    * which this container can't run; this is the model-free CV equivalent
    * with the same op shape: frame in, box list out). Grayscale,
    * threshold at mean + sigma * stddev, 4-connected components via a
    * two-pass union-find labeling, per-blob bounding boxes
    * (x0, y0, x1, y1, area) with blobs under `minArea` dropped. Ordered
    * by area desc then (y0, x0) — deterministic for the pinned oracle.
    */
  def detectBlobs(frame: FrameElem, sigma: Double = 1.0,
      minArea: Int = 4): Seq[(Int, Int, Int, Int, Int)] = {
    val g = grayscale(frame)
    val h = g.height
    val w = g.width
    val n = h * w
    var sum = 0L
    var sq  = 0L
    var i = 0
    while (i < n) {
      val v = g.data(i) & 0xff
      sum += v; sq += v.toLong * v; i += 1
    }
    val mean = sum.toDouble / n
    val std  = math.sqrt(math.max(0.0, sq.toDouble / n - mean * mean))
    val thr  = mean + sigma * std
    // two-pass CCL with union-find over provisional labels
    val label  = new Array[Int](n)
    val parent = new Array[Int](n / 2 + 2) // <= n/2 provisional labels in 4-connectivity
    var nextL  = 1
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val p = parent(c); parent(c) = r; c = p }
      r
    }
    def union(a: Int, b: Int): Unit = {
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = y * w + x
        if ((g.data(p) & 0xff) > thr) {
          val up   = if (y > 0 && label(p - w) != 0) label(p - w) else 0
          val left = if (x > 0 && label(p - 1) != 0) label(p - 1) else 0
          if (up == 0 && left == 0) {
            label(p) = nextL; parent(nextL) = nextL; nextL += 1
          } else if (up != 0 && left != 0) {
            label(p) = math.min(up, left); union(up, left)
          } else label(p) = math.max(up, left)
        }
        x += 1
      }
      y += 1
    }
    // second pass: resolve roots, accumulate boxes
    val boxes = scala.collection.mutable.HashMap.empty[Int, Array[Int]]
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val p = y * w + x
        if (label(p) != 0) {
          val r = find(label(p))
          val b = boxes.getOrElseUpdate(r, Array(x, y, x, y, 0))
          if (x < b(0)) b(0) = x
          if (y < b(1)) b(1) = y
          if (x > b(2)) b(2) = x
          if (y > b(3)) b(3) = y
          b(4) += 1
        }
        x += 1
      }
      y += 1
    }
    boxes.values.toSeq
      .filter(_(4) >= minArea)
      .map(b => (b(0), b(1), b(2), b(3), b(4)))
      // total order: (area, y0, x0) alone can tie for disjoint blobs
      // (both touching row 0 / col 0 at different pixels), which would
      // leave HashMap iteration order deciding — (x1, y1) disambiguates
      // because two distinct blobs cannot share the full bounding box
      // AND area under 4-connectivity labeling of a deterministic mask
      .sortBy(b => (-b._5, b._2, b._1, b._4, b._3))
  }

  /** resize with the full reference arg surface */
  def resizeWithArgs(frame: FrameElem, args: ResizeArgs): FrameElem = {
    val (th, tw) = resolveResizeDims(args, frame.height, frame.width)
    if (th == frame.height && tw == frame.width) frame
    else resize(frame, th, tw)
  }

  /** resize with per-stream (width, height) config — the reference's
    * stream-config-args rate (`docs/guide/ops.rst:58-80`). Config map is
    * closed over (broadcast by the closure), keyed by streamId.
    */
  def resizeOp(ds: Dataset[FrameElem], perStream: Map[Long, (Int, Int)]): Dataset[FrameElem] =
    ds.map { f =>
      val (w, h) = perStream(f.streamId)
      resize(f, h, w)
    }(frameEnc)

  /** resize with full per-stream ResizeArgs (preserve_aspect / min) */
  def resizeArgsOp(ds: Dataset[FrameElem], perStream: Map[Long, ResizeArgs]): Dataset[FrameElem] =
    ds.map(f => resizeWithArgs(f, perStream(f.streamId)))(frameEnc)

  /** Box blur with radius `r`, op-args rate (`BlurArgs`) —
    * `tests/test_ops.cpp:239-310` (sum over the kernel window, edge rows
    * skipped like the reference's interior-only loop).
    */
  def blur(frame: FrameElem, r: Int): FrameElem = {
    require(frame.dtype == FrameType.U8)
    val h = frame.height; val w = frame.width; val c = frame.channels
    val out = frame.data.clone()
    val n   = (2 * r + 1) * (2 * r + 1)
    var y = r
    while (y < h - r) {
      var x = r
      while (x < w - r) {
        var k = 0
        while (k < c) {
          var acc = 0
          var dy = -r
          while (dy <= r) {
            var dx = -r
            while (dx <= r) {
              acc += frame.data(((y + dy) * w + (x + dx)) * c + k) & 0xff
              dx += 1
            }
            dy += 1
          }
          out((y * w + x) * c + k) = (acc / n).toByte
          k += 1
        }
        x += 1
      }
      y += 1
    }
    frame.copy(data = out)
  }

  def blurOp(ds: Dataset[FrameElem], radius: Int): Dataset[FrameElem] =
    ds.map(f => blur(f, radius))(frameEnc)

  /** OpticalFlow — real dense Lucas-Kanade (pure Scala/JVM; the reference
    * wraps OpenCV Farneback over stencil {0,1}, `tests/test_ops.cpp:63-111`;
    * OpenCV is not in this container, so the estimator is LK rather than
    * Farneback — same contract: F32 (H,W,2) per-pixel (u,v) such that
    * prev(x,y) moves to approximately cur(x+u, y+v)).
    *
    * Method: channel-mean grayscale in [0,1]; central-difference spatial
    * gradients on `prev` (border-clamped), forward temporal difference;
    * per pixel solve the 2x2 normal equations A d = -b over a (2r+1)^2
    * window. Window sums come from summed-area tables over the five
    * product images, so the whole frame is O(pixels), independent of r.
    * Windows whose structure tensor has min-eigenvalue below `minEig`
    * (flat / aperture-ambiguous regions) emit (0,0). Single level — valid
    * for small displacements (a pyramid is the standard extension; the
    * library's frames are decode-time, so callers can feed downsampled
    * frames through [[resize]] for large motion).
    *
    * Fully deterministic (fixed sequential FP order) — safe to pin.
    */
  def opticalFlow(prev: FrameElem, cur: FrameElem, r: Int = 4,
      minEig: Double = 1e-4): FrameElem = {
    require(prev.height == cur.height && prev.width == cur.width &&
      prev.channels == cur.channels, "optical flow needs same-shape frames")
    require(prev.dtype == FrameType.U8 && cur.dtype == FrameType.U8)
    val h = cur.height; val w = cur.width; val c = cur.channels
    val n = h * w
    val gp = new Array[Double](n); val gc = new Array[Double](n)
    var p = 0
    while (p < n) {
      var sp = 0; var sc = 0; var k = 0
      val base = p * c
      while (k < c) {
        sp += prev.data(base + k) & 0xff; sc += cur.data(base + k) & 0xff
        k += 1
      }
      gp(p) = sp / (255.0 * c); gc(p) = sc / (255.0 * c)
      p += 1
    }
    @inline def at(g: Array[Double], x: Int, y: Int): Double = {
      val xx = if (x < 0) 0 else if (x >= w) w - 1 else x
      val yy = if (y < 0) 0 else if (y >= h) h - 1 else y
      g(yy * w + xx)
    }
    // five product images, then (h+1)x(w+1) summed-area tables
    val prods = Array.fill(5)(new Array[Double](n))
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i  = y * w + x
        val ix = (at(gp, x + 1, y) - at(gp, x - 1, y)) / 2
        val iy = (at(gp, x, y + 1) - at(gp, x, y - 1)) / 2
        val it = gc(i) - gp(i)
        prods(0)(i) = ix * ix; prods(1)(i) = ix * iy; prods(2)(i) = iy * iy
        prods(3)(i) = ix * it; prods(4)(i) = iy * it
        x += 1
      }
      y += 1
    }
    val sw = w + 1
    val sats = prods.map { a =>
      val s = new Array[Double]((h + 1) * sw)
      var yy = 0
      while (yy < h) {
        var rowAcc = 0.0
        var xx = 0
        while (xx < w) {
          rowAcc += a(yy * w + xx)
          s((yy + 1) * sw + xx + 1) = s(yy * sw + xx + 1) + rowAcc
          xx += 1
        }
        yy += 1
      }
      s
    }
    @inline def winSum(s: Array[Double], x0: Int, y0: Int, x1: Int, y1: Int) =
      s((y1 + 1) * sw + x1 + 1) - s(y0 * sw + x1 + 1) -
        s((y1 + 1) * sw + x0) + s(y0 * sw + x0)
    val bb = ByteBuffer.allocate(n * 2 * 4).order(ByteOrder.LITTLE_ENDIAN)
    y = 0
    while (y < h) {
      val y0 = math.max(0, y - r); val y1 = math.min(h - 1, y + r)
      var x = 0
      while (x < w) {
        val x0 = math.max(0, x - r); val x1 = math.min(w - 1, x + r)
        val sxx = winSum(sats(0), x0, y0, x1, y1)
        val sxy = winSum(sats(1), x0, y0, x1, y1)
        val syy = winSum(sats(2), x0, y0, x1, y1)
        val sxt = winSum(sats(3), x0, y0, x1, y1)
        val syt = winSum(sats(4), x0, y0, x1, y1)
        val tr   = sxx + syy
        val det  = sxx * syy - sxy * sxy
        // smaller eigenvalue of the structure tensor: both gradient
        // directions must carry signal or the constraint is rank-deficient
        val lMin = (tr - math.sqrt(math.max(0.0, tr * tr - 4 * det))) / 2
        if (lMin > minEig) {
          bb.putFloat(((-sxt * syy + sxy * syt) / det).toFloat)
          bb.putFloat(((sxy * sxt - sxx * syt) / det).toFloat)
        } else { bb.putFloat(0f); bb.putFloat(0f) }
        x += 1
      }
      y += 1
    }
    FrameElem(cur.streamId, cur.index, h, w, 2, FrameType.F32, bb.array())
  }

  /** OpticalFlow, Farneback estimator — the reference's actual estimator
    * family (`tests/test_ops.cpp:63-111` wraps cv::calcOpticalFlowFarneback;
    * [[opticalFlow]] above is the Lucas-Kanade stand-in). Pure-Scala
    * single-scale single-iteration implementation of Farnebäck's two-frame
    * polynomial-expansion method (Farnebäck, SCIA 2003):
    *
    *  1. per-frame quadratic expansion f(x) ≈ xᵀAx + bᵀx + c over a
    *     Gaussian applicability (polyN, polySigma). The normal-equation
    *     matrix G = Σ w·basis·basisᵀ is position-independent, so it is
    *     built and inverted ONCE; per-pixel moments come from six
    *     separable correlations (kernels g, x·g, x²·g per axis) with
    *     replicate borders — O(pixels·polyN) per frame.
    *  2. displacement from the expansion pair: A = (A₁+A₂)/2,
    *     Δb = (b₁−b₂)/2 (so f₂(x) = f₁(x−d), i.e. prev(x) appears at
    *     cur(x+d) — the same u,v convention as [[opticalFlow]]), averaged
    *     over a (2·winRadius+1)² box window via summed-area tables:
    *     d = (Σ AᵀA)⁻¹ (Σ AᵀΔb) — O(pixels), independent of winRadius.
    *
    * Same contract as [[opticalFlow]]: stencil {-1,0} U8 pair → F32
    * (H,W,2); rank-deficient windows (det ≈ 0, textureless) emit (0,0).
    * Single level: valid for small displacements — the reference's
    * pyramid is this estimator composed over [[resize]]d frames.
    * Deterministic fixed FP order — safe to pin.
    */
  def farnebackFlow(prev: FrameElem, cur: FrameElem, polyN: Int = 5,
      polySigma: Double = 1.1, winRadius: Int = 4): FrameElem = {
    require(prev.height == cur.height && prev.width == cur.width &&
      prev.channels == cur.channels, "optical flow needs same-shape frames")
    require(prev.dtype == FrameType.U8 && cur.dtype == FrameType.U8)
    val h = cur.height; val w = cur.width; val c = cur.channels
    val n = h * w
    val gp = new Array[Double](n); val gc = new Array[Double](n)
    var p = 0
    while (p < n) {
      var sp = 0; var sc = 0; var k = 0
      val base = p * c
      while (k < c) {
        sp += prev.data(base + k) & 0xff; sc += cur.data(base + k) & 0xff
        k += 1
      }
      gp(p) = sp / (255.0 * c); gc(p) = sc / (255.0 * c)
      p += 1
    }
    val e1 = polyExpansion(gp, h, w, polyN, polySigma)
    val e2 = polyExpansion(gc, h, w, polyN, polySigma)
    // five window-accumulated images: AᵀA (3 unique entries) and AᵀΔb (2)
    val prods = Array.fill(5)(new Array[Double](n))
    var i = 0
    while (i < n) {
      val m11 = (e1.a11(i) + e2.a11(i)) / 2
      val m12 = (e1.a12(i) + e2.a12(i)) / 2
      val m22 = (e1.a22(i) + e2.a22(i)) / 2
      val db1 = (e1.bx(i) - e2.bx(i)) / 2
      val db2 = (e1.by(i) - e2.by(i)) / 2
      prods(0)(i) = m11 * m11 + m12 * m12
      prods(1)(i) = m11 * m12 + m12 * m22
      prods(2)(i) = m12 * m12 + m22 * m22
      prods(3)(i) = m11 * db1 + m12 * db2
      prods(4)(i) = m12 * db1 + m22 * db2
      i += 1
    }
    val sw = w + 1
    val sats = prods.map { a =>
      val s = new Array[Double]((h + 1) * sw)
      var yy = 0
      while (yy < h) {
        var rowAcc = 0.0
        var xx = 0
        while (xx < w) {
          rowAcc += a(yy * w + xx)
          s((yy + 1) * sw + xx + 1) = s(yy * sw + xx + 1) + rowAcc
          xx += 1
        }
        yy += 1
      }
      s
    }
    @inline def winSum(s: Array[Double], x0: Int, y0: Int, x1: Int, y1: Int) =
      s((y1 + 1) * sw + x1 + 1) - s(y0 * sw + x1 + 1) -
        s((y1 + 1) * sw + x0) + s(y0 * sw + x0)
    val bb = ByteBuffer.allocate(n * 2 * 4).order(ByteOrder.LITTLE_ENDIAN)
    var y = 0
    while (y < h) {
      val y0 = math.max(0, y - winRadius); val y1 = math.min(h - 1, y + winRadius)
      var x = 0
      while (x < w) {
        val x0 = math.max(0, x - winRadius); val x1 = math.min(w - 1, x + winRadius)
        val g11 = winSum(sats(0), x0, y0, x1, y1)
        val g12 = winSum(sats(1), x0, y0, x1, y1)
        val g22 = winSum(sats(2), x0, y0, x1, y1)
        val h1  = winSum(sats(3), x0, y0, x1, y1)
        val h2  = winSum(sats(4), x0, y0, x1, y1)
        val det = g11 * g22 - g12 * g12
        if (det > 1e-12) {
          bb.putFloat(((g22 * h1 - g12 * h2) / det).toFloat)
          bb.putFloat(((g11 * h2 - g12 * h1) / det).toFloat)
        } else { bb.putFloat(0f); bb.putFloat(0f) }
        x += 1
      }
      y += 1
    }
    FrameElem(cur.streamId, cur.index, h, w, 2, FrameType.F32, bb.array())
  }

  /** Per-pixel quadratic expansion coefficients: f ≈ xᵀAx + bᵀx + c with
    * A = [[a11, a12], [a12, a22]], b = (bx, by); x = (dx right, dy down).
    */
  private final case class PolyExp(
      bx: Array[Double], by: Array[Double],
      a11: Array[Double], a22: Array[Double], a12: Array[Double])

  /** Farnebäck polynomial expansion (paper §3): solve G·r = v per pixel
    * for basis (1, dx, dy, dx², dy², dx·dy) under a separable Gaussian
    * applicability. G is constant; v comes from separable correlations.
    */
  private def polyExpansion(g: Array[Double], h: Int, w: Int,
      n: Int, sigma: Double): PolyExp = {
    val size = 2 * n + 1
    val ker = Array.tabulate(size)(i =>
      math.exp(-((i - n) * (i - n)) / (2 * sigma * sigma)))
    val ksum = ker.sum
    var i = 0
    while (i < size) { ker(i) /= ksum; i += 1 }
    // 1D moments of the normalized kernel: t2 = Σ g·x², t4 = Σ g·x⁴
    var t2 = 0.0; var t4 = 0.0
    i = 0
    while (i < size) {
      val d = (i - n).toDouble
      t2 += ker(i) * d * d; t4 += ker(i) * d * d * d * d
      i += 1
    }
    // G decouples: (dx) and (dy) rows scale by t2; (dx·dy) by t2²; the
    // (1, dx², dy²) block M3 = [[1, t2, t2], [t2, t4, t2²], [t2, t2², t4]]
    // is inverted analytically (we need its 2nd/3rd rows for a11/a22)
    val m11 = 1.0; val m12 = t2; val m13 = t2
    val m22 = t4;  val m23 = t2 * t2; val m33 = t4
    val det3 = m11 * (m22 * m33 - m23 * m23) - m12 * (m12 * m33 - m23 * m13) +
      m13 * (m12 * m23 - m22 * m13)
    // inverse rows (cofactor/det): row2 = (i21, i22, i23), row3 = (i31, i32, i33)
    val i21 = -(m12 * m33 - m23 * m13) / det3
    val i22 = (m11 * m33 - m13 * m13) / det3
    val i23 = -(m11 * m23 - m12 * m13) / det3
    val i31 = (m12 * m23 - m22 * m13) / det3
    val i32 = -(m11 * m23 - m13 * m12) / det3
    val i33 = (m11 * m22 - m12 * m12) / det3
    val np = h * w
    // row pass: correlate each row with g, x·g, x²·g (replicate border)
    val tmp0 = new Array[Double](np)
    val tmp1 = new Array[Double](np)
    val tmp2 = new Array[Double](np)
    var y = 0
    while (y < h) {
      val row = y * w
      var x = 0
      while (x < w) {
        var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
        var k = -n
        while (k <= n) {
          val xx = if (x + k < 0) 0 else if (x + k >= w) w - 1 else x + k
          val v  = g(row + xx) * ker(k + n)
          s0 += v; s1 += v * k; s2 += v * k * k
          k += 1
        }
        tmp0(row + x) = s0; tmp1(row + x) = s1; tmp2(row + x) = s2
        x += 1
      }
      y += 1
    }
    // column pass: assemble the six moments and solve per pixel
    val bx  = new Array[Double](np); val by  = new Array[Double](np)
    val a11 = new Array[Double](np); val a22 = new Array[Double](np)
    val a12 = new Array[Double](np)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v1 = 0.0; var v2 = 0.0; var v3 = 0.0
        var v4 = 0.0; var v5 = 0.0; var v6 = 0.0
        var k = -n
        while (k <= n) {
          val yy = if (y + k < 0) 0 else if (y + k >= h) h - 1 else y + k
          val kw = ker(k + n)
          val r0 = tmp0(yy * w + x); val r1 = tmp1(yy * w + x); val r2 = tmp2(yy * w + x)
          v1 += kw * r0            // Σ w f
          v2 += kw * r1            // Σ w dx f
          v3 += kw * k * r0        // Σ w dy f
          v4 += kw * r2            // Σ w dx² f
          v5 += kw * k * k * r0    // Σ w dy² f
          v6 += kw * k * r1        // Σ w dx dy f
          k += 1
        }
        val idx = y * w + x
        bx(idx)  = v2 / t2
        by(idx)  = v3 / t2
        a12(idx) = v6 / (t2 * t2) / 2
        a11(idx) = i21 * v1 + i22 * v4 + i23 * v5
        a22(idx) = i31 * v1 + i32 * v4 + i33 * v5
        x += 1
      }
      y += 1
    }
    PolyExp(bx, by, a11, a22, a12)
  }

  /** ImageEncoder: frame → PNG bytes (`scanner/util/image_encoder.cpp:112-117`)
    * via JDK javax.imageio (headless-safe).
    */
  /** Tile same-shape frames into one grid image (`cols` across, row-major
    * in input order) — the preview/contact-sheet kernel every video
    * pipeline ships. Pure pixel-row copy; output index = first frame's.
    */
  def tileGrid(frames: Seq[FrameElem], cols: Int): FrameElem = {
    require(frames.nonEmpty && cols > 0, "tileGrid needs frames and a positive column count")
    val h0 = frames.head
    frames.foreach(f => require(f.height == h0.height && f.width == h0.width &&
      f.channels == h0.channels && f.dtype == h0.dtype, "tileGrid frames must share shape"))
    val rows   = (frames.size + cols - 1) / cols
    val gh     = rows * h0.height
    val gw     = cols * h0.width
    val stride = h0.width * h0.channels
    val out    = new Array[Byte](gh * gw * h0.channels)
    frames.zipWithIndex.foreach { case (f, i) =>
      val cellR = i / cols
      val cellC = i % cols
      var y = 0
      while (y < f.height) {
        System.arraycopy(f.data, y * stride, out,
          ((cellR * h0.height + y) * gw + cellC * h0.width) * h0.channels, stride)
        y += 1
      }
    }
    FrameElem(h0.streamId, h0.index, gh, gw, h0.channels, h0.dtype, out)
  }

  def encodePng(frame: FrameElem): Array[Byte] = {
    require(frame.dtype == FrameType.U8 && frame.channels == 3)
    val img = new java.awt.image.BufferedImage(
      frame.width, frame.height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < frame.height) {
      var x = 0
      while (x < frame.width) {
        val p = (y * frame.width + x) * 3
        val rgb = ((frame.data(p) & 0xff) << 16) |
                  ((frame.data(p + 1) & 0xff) << 8) |
                  (frame.data(p + 2) & 0xff)
        img.setRGB(x, y, rgb)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  def imageEncoderOp(ds: Dataset[FrameElem]): Dataset[Elem] =
    ds.map(f => Elem(f.streamId, f.index, encodePng(f)))(elemEnc)

  /** Inverse of [[encodePng]]: decode PNG/JPEG/BMP bytes into a U8 HWC3
    * frame — the reference's Image column type (`scanner/metadata.proto:
    * 30-47`: JPEG/PNG/BMP/RAW groups decoded into frames for kernels).
    */
  def decodeImage(streamId: Long, index: Long, bytes: Array[Byte]): FrameElem = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, s"undecodable image at stream=$streamId index=$index")
    val h = img.getHeight; val w = img.getWidth
    val data = new Array[Byte](h * w * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val p   = (y * w + x) * 3
        data(p) = ((rgb >> 16) & 0xff).toByte
        data(p + 1) = ((rgb >> 8) & 0xff).toByte
        data(p + 2) = (rgb & 0xff).toByte
        x += 1
      }
      y += 1
    }
    FrameElem(streamId, index, h, w, 3, FrameType.U8, data)
  }

  /** TestIncrement (bounded/unbounded): i64 LE counter, output = count of
    * rows processed before this one since the last (re)start —
    * `tests/test_ops.cpp:173-236`; expected bounded sequence [0,3,3,4,5]
    * for warmup=3 + Gather[0,10,25,26,27] (`py_test.py:407-423`).
    */
  object TestIncrement extends Kernels.StatefulKernel[Long] {
    def init: Long = 0L
    def update(state: Long, index: Long, payload: Array[Byte]): (Long, Array[Byte]) = {
      val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      bb.putLong(state)
      (state + 1, bb.array())
    }
  }

  def decodeI64(payload: Array[Byte]): Long =
    ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN).getLong

  def encodeI64(v: Long): Array[Byte] = {
    val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(v)
    bb.array()
  }

  /** RunningSum: unbounded-state kernel accumulating the i64 LE payload —
    * a non-trivial state oracle (unlike TestIncrement, the output depends
    * on every prior element's VALUE, not just the count), used by the
    * multi-stream query to prove per-stream state isolation.
    */
  object RunningSum extends Kernels.StatefulKernel[Long] {
    def init: Long = 0L
    def update(state: Long, index: Long, payload: Array[Byte]): (Long, Array[Byte]) = {
      val s2 = state + decodeI64(payload)
      (s2, encodeI64(s2))
    }
  }

  /** Sleep/SleepFrame — fixed-delay pass-through used by the reference's
    * fault-tolerance tests (`tests/test_ops.cpp:313-338`).
    */
  def sleepOp(ds: Dataset[Elem], millis: Long): Dataset[Elem] =
    ds.map { e => Thread.sleep(millis); e }(elemEnc)
}
