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
  def averageHash(frame: FrameElem): Long = {
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
    val small = resize(frame.copy(channels = 1, data = gray), 8, 8)
    var sum = 0L
    i = 0
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
