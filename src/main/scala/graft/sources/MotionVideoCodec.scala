package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

import org.apache.spark.util.LongAccumulator

import graft.model.FrameElem

/** Lossless GOP codec with REAL motion compensation — the next rung of
  * the codec ladder after [[DeflateVideoCodec]]'s pure temporal
  * prediction, and the closest structural analog of the reference's
  * H264 path this container permits (`scanner/video/video_encoder.cpp`,
  * `decoder_automata.cpp` sequential P-frame dependency): each P-frame
  * is predicted per 16x16 block by a deterministic three-step motion
  * search (±7 px, all-channel SAD, ties broken toward the zero vector
  * then row-major order) against the RECONSTRUCTED previous frame, and
  * only the motion vectors + byte residuals are entropy-coded (per-frame
  * DEFLATE). On translating content the residual is ~zero wherever the
  * motion model fits — the property that separates a real video codec
  * from frame-wise compression, pinned by the contract spec's
  * motion-advantage case.
  *
  * Payload layout (little-endian), same prefix-decode discipline as the
  * sibling codecs (length-prefixed frame blocks — sparse reads inflate
  * only the needed prefix):
  * {{{
  *   int32 magic "GMV1" | int32 h | int32 w | int32 c | int8 dtype |
  *   int32 n | n * (int32 compLen | compLen deflate bytes)
  * }}}
  * An I block inflates to the raw frame; a P block inflates to
  * `nBlocks * 2` motion bytes (dx+8, dy+8) followed by the byte
  * residuals in block scan order.
  */
object MotionVideoCodec extends GopCodec {

  private val MAGIC = 0x474d5631 // "GMV1"
  private val LEVEL = 6
  private val B     = 16         // block size
  private val R     = 7          // max |mv| component (three-step: 4+2+1)

  // ----------------------------------------------------------------- encode

  override def encodeGop(frames: Seq[FrameElem]): Array[Byte] = {
    require(frames.nonEmpty, "empty GOP")
    val head = frames.head
    val sz = head.data.length
    frames.foreach { f =>
      require(f.height == head.height && f.width == head.width &&
        f.channels == head.channels && f.dtype == head.dtype && f.data.length == sz,
        "GOP frames must share shape/dtype")
    }
    val h = head.height; val w = head.width; val c = head.channels
    val deflater = new Deflater(LEVEL)
    val blocks = try {
      var prev: Array[Byte] = null
      frames.map { f =>
        val plain =
          if (prev == null) f.data
          else encodeP(prev, f.data, h, w, c)
        prev = f.data // lossless: reconstruction == original
        deflater.reset()
        deflater.setInput(plain)
        deflater.finish()
        val out = new java.io.ByteArrayOutputStream(sz / 2 + 64)
        val buf = new Array[Byte](8192)
        while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
        out.toByteArray
      }
    } finally deflater.end()
    val total = 21 + blocks.map(_.length + 4).sum
    val bb = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(MAGIC)
    bb.putInt(h).putInt(w).putInt(c)
    bb.put(head.dtype).putInt(frames.size)
    blocks.foreach { b => bb.putInt(b.length); bb.put(b) }
    bb.array()
  }

  /** motion bytes + residual for one P-frame */
  private def encodeP(ref: Array[Byte], cur: Array[Byte],
      h: Int, w: Int, c: Int): Array[Byte] = {
    val nbx = (w + B - 1) / B
    val nby = (h + B - 1) / B
    val out = new Array[Byte](nbx * nby * 2 + cur.length)
    var resOff = nbx * nby * 2
    var mvOff = 0
    var by = 0
    while (by < nby) {
      var bx = 0
      while (bx < nbx) {
        val y0 = by * B; val x0 = bx * B
        val bh = math.min(B, h - y0); val bw = math.min(B, w - x0)
        val (dx, dy) = searchMv(ref, cur, h, w, c, y0, x0, bh, bw)
        out(mvOff) = (dx + 8).toByte
        out(mvOff + 1) = (dy + 8).toByte
        mvOff += 2
        // residual = cur - shifted ref (byte arithmetic mod 256)
        var y = 0
        while (y < bh) {
          val sy = y0 + y + dy
          var x = 0
          while (x < bw) {
            val sx = x0 + x + dx
            val d = ((y0 + y) * w + (x0 + x)) * c
            val s = (sy * w + sx) * c
            var ch = 0
            while (ch < c) {
              out(resOff) = (cur(d + ch) - ref(s + ch)).toByte
              resOff += 1
              ch += 1
            }
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    out
  }

  /** deterministic three-step search: step 4, 2, 1 around the best-so-far;
    * candidates keeping the whole source block in bounds; ties keep the
    * incumbent (zero vector first), so the search is order-stable
    */
  private def searchMv(ref: Array[Byte], cur: Array[Byte], h: Int, w: Int,
      c: Int, y0: Int, x0: Int, bh: Int, bw: Int): (Int, Int) = {
    def sad(dx: Int, dy: Int): Long = {
      var acc = 0L
      var y = 0
      while (y < bh) {
        val d0 = ((y0 + y) * w + x0) * c
        val s0 = ((y0 + y + dy) * w + (x0 + dx)) * c
        var i = 0
        val n = bw * c
        while (i < n) {
          acc += math.abs((cur(d0 + i) & 0xff) - (ref(s0 + i) & 0xff))
          i += 1
        }
        y += 1
      }
      acc
    }
    def inBounds(dx: Int, dy: Int): Boolean =
      y0 + dy >= 0 && y0 + bh + dy <= h && x0 + dx >= 0 && x0 + bw + dx <= w
    var bestDx = 0; var bestDy = 0
    var bestSad = sad(0, 0)
    var step = 4
    while (step >= 1) {
      var improvedDx = bestDx; var improvedDy = bestDy
      var dyi = -1
      while (dyi <= 1) {
        var dxi = -1
        while (dxi <= 1) {
          if (dxi != 0 || dyi != 0) {
            val dx = bestDx + dxi * step
            val dy = bestDy + dyi * step
            if (math.abs(dx) <= R && math.abs(dy) <= R && inBounds(dx, dy)) {
              val s = sad(dx, dy)
              if (s < bestSad) { bestSad = s; improvedDx = dx; improvedDy = dy }
            }
          }
          dxi += 1
        }
        dyi += 1
      }
      bestDx = improvedDx; bestDy = improvedDy
      step /= 2
    }
    (bestDx, bestDy)
  }

  // ----------------------------------------------------------------- decode

  override def decodeGop(
      payload: Array[Byte],
      streamId: Long,
      startIndex: Long,
      upTo: Int = Int.MaxValue,
      decoded: Option[LongAccumulator] = None): Iterator[FrameElem] = {
    val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
    require(bb.getInt() == MAGIC, "not a GMV1 payload")
    val h = bb.getInt(); val w = bb.getInt(); val c = bb.getInt()
    val dtype = bb.get()
    val n = bb.getInt()
    val limit = math.min(n - 1, upTo)
    val sz = h * w * c
    val inflater = new Inflater()
    var prev: Array[Byte] = null
    new Iterator[FrameElem] {
      private var i = 0
      override def hasNext: Boolean = {
        val more = i <= limit
        if (!more) inflater.end()
        more
      }
      override def next(): FrameElem = {
        val compLen = bb.getInt()
        val comp = new Array[Byte](compLen)
        bb.get(comp)
        inflater.reset()
        inflater.setInput(comp)
        val plainLen = if (i == 0) sz else (((w + B - 1) / B) * ((h + B - 1) / B)) * 2 + sz
        val plain = new Array[Byte](plainLen)
        var got = 0
        var step = -1
        // stop on finished() OR a zero-progress inflate (exhausted input
        // with the stream unfinished = truncated block) — either way the
        // require turns corruption into a loud failure, never a spin
        while (got < plainLen && step != 0 && !inflater.finished()) {
          step = inflater.inflate(plain, got, plainLen - got)
          got += step
        }
        require(got == plainLen, s"truncated GMV1 frame block: $got of $plainLen")
        val data =
          if (i == 0) plain
          else reconstructP(prev, plain, h, w, c)
        prev = data
        decoded.foreach(_.add(1L))
        val f = FrameElem(streamId, startIndex + i, h, w, c, dtype, data)
        i += 1
        f
      }
    }
  }

  private def reconstructP(ref: Array[Byte], plain: Array[Byte],
      h: Int, w: Int, c: Int): Array[Byte] = {
    val nbx = (w + B - 1) / B
    val nby = (h + B - 1) / B
    val out = new Array[Byte](h * w * c)
    var resOff = nbx * nby * 2
    var mvOff = 0
    var by = 0
    while (by < nby) {
      var bx = 0
      while (bx < nbx) {
        val y0 = by * B; val x0 = bx * B
        val bh = math.min(B, h - y0); val bw = math.min(B, w - x0)
        val dx = (plain(mvOff) & 0xff) - 8
        val dy = (plain(mvOff + 1) & 0xff) - 8
        mvOff += 2
        var y = 0
        while (y < bh) {
          val sy = y0 + y + dy
          var x = 0
          while (x < bw) {
            val sx = x0 + x + dx
            val d = ((y0 + y) * w + (x0 + x)) * c
            val s = (sy * w + sx) * c
            var ch = 0
            while (ch < c) {
              out(d + ch) = (ref(s + ch) + plain(resOff)).toByte
              resOff += 1
              ch += 1
            }
            x += 1
          }
          y += 1
        }
        bx += 1
      }
      by += 1
    }
    out
  }
}
