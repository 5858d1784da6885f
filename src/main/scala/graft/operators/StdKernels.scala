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

  /** OpticalFlow — the reference wraps OpenCV Farneback over stencil {0,1}
    * (`tests/test_ops.cpp:63-111`), emitting an F32 (H,W,2) frame. OpenCV is
    * not in this container, so the flow ESTIMATE is a clearly-marked
    * deterministic substitute (per-pixel temporal intensity delta in channel
    * 0, zeros in channel 1); the Spark-side contract — stencil fetch, F32
    * 2-channel output shape — is real and tested.
    */
  def opticalFlowStub(prev: FrameElem, cur: FrameElem): FrameElem = {
    val n   = cur.height * cur.width
    val bb  = ByteBuffer.allocate(n * 2 * 4).order(ByteOrder.LITTLE_ENDIAN)
    var p = 0
    while (p < n) {
      val base = p * cur.channels
      var dPrev = 0; var dCur = 0
      var k = 0
      while (k < cur.channels) {
        dPrev += prev.data(base + k) & 0xff
        dCur  += cur.data(base + k) & 0xff
        k += 1
      }
      bb.putFloat((dCur - dPrev).toFloat / 255f)
      bb.putFloat(0f)
      p += 1
    }
    FrameElem(cur.streamId, cur.index, cur.height, cur.width, 2, FrameType.F32, bb.array())
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
