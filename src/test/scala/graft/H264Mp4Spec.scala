package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264, H264Mp4, H264Writer => W}

/** The real-codec container loop: Annex-B -> avc1 MP4 -> Annex-B, all
  * three layers (NAL syntax, AVCC framing, ISO-BMFF walk) the repo's own
  * spec implementations.
  */
class H264Mp4Spec extends AnyFunSuite {

  /** 2 GOPs x (IDR + 2 P), one SPS/PPS pair at the head, SEI before the
    * second IDR, a two-slice P frame
    */
  private def fixture: Array[Byte] = {
    val s = new java.io.ByteArrayOutputStream()
    s.write(W.nal(3, 7, W.sps(0, 64, 48)))
    s.write(W.nal(3, 8, W.pps(0, 0)))
    s.write(W.nal(3, 5, W.slice(idr = true, 0, 0, 0, idrPicId = 0)))
    s.write(W.nal(2, 1, W.slice(idr = false, 0, 1, 2)))
    s.write(W.nal(2, 1, W.slice(idr = false, 0, 2, 4)))
    s.write(W.nal(2, 1, W.slice(idr = false, 0, 2, 4, firstMb = 5)))
    s.write(W.nal(0, 6, Array[Byte](1, 2, 3)))
    s.write(W.nal(3, 5, W.slice(idr = true, 0, 0, 0, idrPicId = 1)))
    s.write(W.nal(2, 1, W.slice(idr = false, 0, 1, 2)))
    s.toByteArray
  }

  test("avcC record round-trips through the container") {
    val ix = H264.index(fixture)
    val out = new java.io.ByteArrayOutputStream()
    H264Mp4.mux(ix, out)
    val cfg = H264Mp4.parseAvcConfig(out.toByteArray)
    assert(cfg.profileIdc == 66)         // Baseline, from the SPS bytes
    assert(cfg.nalLengthSize == 4)
    assert(cfg.sps.size == 1 && cfg.pps.size == 1)
    assert(cfg.width == 64 && cfg.height == 48)
    // the SPS in avcC parses to the same dimensions
    val sps = H264.parseSps(new H264.BitReader(H264.rbsp(cfg.sps.head, 1)))
    assert(sps.width == 64 && sps.height == 48)
  }

  test("mp4 -> Annex-B -> re-index reproduces the stream structure") {
    val ix = H264.index(fixture)
    val out = new java.io.ByteArrayOutputStream()
    H264Mp4.mux(ix, out)
    val back = H264Mp4.indexMp4(out.toByteArray)
    assert(back.frames.length == ix.frames.length)
    assert(back.keyframes == ix.keyframes)
    assert(back.frames.map(f => (f.frameNum, f.pocLsb, f.nSlices, f.keyframe)) ==
      ix.frames.map(f => (f.frameNum, f.pocLsb, f.nSlices, f.keyframe)))
    assert(back.width == 64 && back.height == 48)
  }

  test("sync-sample table lists exactly the IDR samples (1-based)") {
    val ix = H264.index(fixture)
    val out = new java.io.ByteArrayOutputStream()
    H264Mp4.mux(ix, out)
    val b = out.toByteArray
    // independent local box walk (the spec's own reader, not the library's)
    def be32(x: Array[Byte], o: Int): Int =
      ((x(o) & 0xff) << 24) | ((x(o + 1) & 0xff) << 16) |
        ((x(o + 2) & 0xff) << 8) | (x(o + 3) & 0xff)
    def boxType(x: Array[Byte], o: Int): String = new String(x, o + 4, 4, "US-ASCII")
    def findChild(x: Array[Byte], from: Int, end: Int, t: String): Int = {
      var o = from
      while (o < end && boxType(x, o) != t) o += be32(x, o)
      assert(o < end, s"missing $t")
      o
    }
    var off = 0
    while (boxType(b, off) != "moov") off += be32(b, off)
    val moovEnd = off + be32(b, off)
    val trak = findChild(b, off + 8, moovEnd, "trak")
    val mdia = findChild(b, trak + 8, trak + be32(b, trak), "mdia")
    val minf = findChild(b, mdia + 8, mdia + be32(b, mdia), "minf")
    val stbl = findChild(b, minf + 8, minf + be32(b, minf), "stbl")
    val stss = findChild(b, stbl + 8, stbl + be32(b, stbl), "stss")
    val n = be32(b, stss + 12)
    val syncs = (0 until n).map(i => be32(b, stss + 16 + 4 * i))
    assert(syncs == ix.keyframes.map(_.toInt + 1))
  }

  test("AVCC samples carry no in-band parameter sets; demux re-inlines them once") {
    val ix = H264.index(fixture)
    val out = new java.io.ByteArrayOutputStream()
    H264Mp4.mux(ix, out)
    val annexb = H264Mp4.demuxToAnnexB(out.toByteArray)
    val nals = H264.nalUnits(annexb)
    assert(nals.count(_.nalType == 7) == 1 && nals.count(_.nalType == 8) == 1)
    assert(nals.take(2).map(_.nalType) == Vector(7, 8)) // head, before slices
    assert(nals.count(_.nalType == 6) == 1)             // SEI preserved
  }
}
