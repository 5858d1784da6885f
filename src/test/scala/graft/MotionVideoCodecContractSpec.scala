package graft

import graft.model.{FrameElem, FrameType}
import graft.sources.{DeflateVideoCodec, MotionVideoCodec}

/** the motion-compensated codec honors the same seam contract — plus the
  * property only a real MOTION model has: translating content beats
  * frame-wise temporal prediction
  */
class MotionVideoCodecContractSpec
  extends GopCodecContract("MotionVideoCodec", MotionVideoCodec) {

  /** a textured pattern translating by (4, 4) px per frame — the camera-pan
    * case; content is deterministic in WORLD coordinates, so inter-frame
    * change is pure motion (plus the strip of newly-revealed pixels). The
    * texture is spatially incoherent (no SAD gradient), so the pan step is
    * chosen on the three-step search's step-4 probe ring — the honest way
    * to pin "exact-match motion yields zero residual" without pretending
    * TSS converges on white noise.
    */
  private def panningFrame(idx: Long, h: Int, w: Int): FrameElem = {
    val c = 3
    val data = new Array[Byte](h * w * c)
    val oy = 4 * idx.toInt; val ox = 4 * idx.toInt
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val wy = y + oy; val wx = x + ox // world coords
        val base = (y * w + x) * c
        data(base) = ((wy * 31 + wx * 17) % 251).toByte
        data(base + 1) = ((wy * 13 ^ wx * 29) % 251).toByte
        data(base + 2) = ((wy * wx + 7) % 251).toByte
        x += 1
      }
      y += 1
    }
    FrameElem(0L, idx, h, w, c, FrameType.U8, data)
  }

  test("MotionVideoCodec: motion search beats pure temporal prediction on a pan") {
    val frames = (0 until 8).map(i => panningFrame(i.toLong, 96, 128))
    val mc = MotionVideoCodec.encodeGop(frames).length
    val temporal = DeflateVideoCodec.encodeGop(frames).length
    // the (4,4) pan sits on the step-4 probe: MC residuals are zero away
    // from the revealed border strips, XOR deltas are dense noise
    assert(mc * 2 < temporal,
      s"motion compensation should at least halve the panning payload: mc=$mc temporal=$temporal")
  }

  test("MotionVideoCodec: static scenes cost near-zero residual per P-frame") {
    val still = panningFrame(0L, 48, 64)
    val frames = (0 until 8).map(i => still.copy(index = i.toLong))
    val payload = MotionVideoCodec.encodeGop(frames).length
    val oneFrame = MotionVideoCodec.encodeGop(Seq(still)).length
    assert(payload < oneFrame + 8 * 120,
      s"seven all-zero-residual P-frames should be ~free: gop=$payload iframe=$oneFrame")
  }
}
