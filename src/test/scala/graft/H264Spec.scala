package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264, H264Writer => W}

/** Parser-vs-writer conformance for the Annex-B layer: both sides
  * implement ITU-T H.264 §7.3 independently (reference semantics:
  * `scanner/util/h264.h`, `h264_byte_stream_index_creator.cpp`), so a
  * round trip checks the parser against the spec, not against itself.
  */
class H264Spec extends AnyFunSuite {

  test("exp-Golomb ue/se round-trips through BitWriter/BitReader") {
    val w = new W.BitWriter
    val ues = Seq(0, 1, 2, 3, 7, 8, 254, 255, 256, 70000)
    val ses = Seq(0, 1, -1, 2, -2, 63, -64)
    ues.foreach(w.ue)
    ses.foreach(w.se)
    val r = new H264.BitReader(w.rbspTrailing())
    ues.foreach(v => assert(r.ue == v))
    ses.foreach(v => assert(r.se == v))
  }

  test("emulation prevention: escape/unescape invert; 00 00 0x guarded") {
    val payloads = Seq(
      Array[Byte](0, 0, 0, 1, 5),       // would alias a start code raw
      Array[Byte](0, 0, 2, 0, 0, 3, 9), // 02 and a literal 03 case
      Array[Byte](1, 2, 3, 4),
      Array.fill[Byte](64)(0) :+ 1.toByte)
    payloads.foreach { p =>
      val esc = W.escapeRbsp(p)
      // escaped form never contains 00 00 {00,01,02}; 00 00 03 is the
      // escape marker itself and is legal
      esc.sliding(3).foreach { t =>
        if (t.length == 3 && t(0) == 0 && t(1) == 0) assert((t(2) & 0xff) >= 3)
      }
      assert(H264.rbsp(esc, 0).toSeq == p.toSeq)
    }
  }

  test("SPS round-trip: cropped dimensions, profile, poc fields") {
    val sps = H264.parseSps(new H264.BitReader(W.sps(2, 50, 30, levelIdc = 31,
      log2MaxFrameNum = 6, log2MaxPocLsb = 7)))
    assert(sps.spsId == 2)
    assert(sps.profileIdc == 66)
    assert(sps.levelIdc == 31)
    assert(sps.width == 50 && sps.height == 30) // 64x32 mb grid, cropped
    assert(sps.log2MaxFrameNum == 6 && sps.log2MaxPocLsb == 7)
    assert(sps.pocType == 0 && sps.frameMbsOnly)
    val uncropped = H264.parseSps(new H264.BitReader(W.sps(0, 64, 48)))
    assert(uncropped.width == 64 && uncropped.height == 48)
  }

  test("PPS round-trip") {
    val pps = H264.parsePps(new H264.BitReader(W.pps(3, 1)))
    assert(pps.ppsId == 3 && pps.spsId == 1)
    assert(!pps.picOrderPresent && !pps.redundantPicCntPresent)
    assert(pps.numRefIdxL0Default == 1 && pps.numRefIdxL1Default == 1)
  }

  test("nalUnits: 3- and 4-byte start codes, trailing zeros stripped") {
    val stream =
      Array[Byte](0, 0, 1, 0x67, 9, 9) ++     // 3-byte sc
        Array[Byte](0, 0, 0, 1, 0x68, 8) ++   // 4-byte sc
        Array[Byte](0, 0, 1, 0x65, 7, 0, 0)   // trailing_zero_8bits
    val nals = H264.nalUnits(stream)
    assert(nals.map(_.nalType) == Vector(7, 8, 5))
    assert(nals.map(_.bytes.length) == Vector(3, 2, 2)) // zeros stripped
  }

  test("indexer groups a two-slice picture into ONE access unit") {
    val s = new java.io.ByteArrayOutputStream()
    s.write(W.nal(3, 7, W.sps(0, 64, 48)))
    s.write(W.nal(3, 8, W.pps(0, 0)))
    s.write(W.nal(3, 5, W.slice(idr = true, 0, 0, 0)))
    s.write(W.nal(2, 1, W.slice(idr = false, 0, 1, 2)))
    s.write(W.nal(2, 1, W.slice(idr = false, 0, 1, 2, firstMb = 4)))
    s.write(W.nal(2, 1, W.slice(idr = false, 0, 2, 4)))
    val ix = H264.index(s.toByteArray)
    assert(ix.frames.map(_.nSlices) == Vector(1, 2, 1))
    assert(ix.keyframes == Vector(0L))
  }

  test("poc_lsb change alone (same frame_num) opens a new access unit") {
    val s = new java.io.ByteArrayOutputStream()
    s.write(W.nal(3, 7, W.sps(0, 64, 48)))
    s.write(W.nal(3, 8, W.pps(0, 0)))
    s.write(W.nal(3, 5, W.slice(idr = true, 0, 0, 0)))
    s.write(W.nal(2, 1, W.slice(idr = false, 0, 1, 2)))
    s.write(W.nal(2, 1, W.slice(idr = false, 0, 1, 4))) // new pic, same fn
    val ix = H264.index(s.toByteArray)
    assert(ix.frames.length == 3)
  }

  test("IDR without its own SPS gets cached parameter sets re-inserted") {
    val s = new java.io.ByteArrayOutputStream()
    s.write(W.nal(3, 7, W.sps(0, 64, 48)))
    s.write(W.nal(3, 8, W.pps(0, 0)))
    s.write(W.nal(3, 5, W.slice(idr = true, 0, 0, 0, idrPicId = 0)))
    s.write(W.nal(2, 1, W.slice(idr = false, 0, 1, 2)))
    s.write(W.nal(3, 5, W.slice(idr = true, 0, 0, 0, idrPicId = 1)))
    val ix = H264.index(s.toByteArray)
    assert(ix.keyframes == Vector(0L, 2L))
    val k0 = ix.frames(0)
    val k1 = ix.frames(2)
    // sample 2 carries IDR + re-inserted SPS+PPS; sample 0 carried its own
    assert(k1.byteSize > ix.frames(1).byteSize)
    // demuxed sample 2 begins with an SPS NAL (type 7)
    val at = k1.byteOffset.toInt
    assert(ix.demuxed(at) == 0 && ix.demuxed(at + 1) == 0 &&
      ix.demuxed(at + 2) == 1 && (ix.demuxed(at + 3) & 0x1f) == 7)
    assert(k0.keyframe && k1.keyframe)
  }

  test("IDR carrying its own SPS but no PPS still gets the cached PPS prepended") {
    // legal stream shape: SPS repeated per IDR, PPS only at the head
    val s = new java.io.ByteArrayOutputStream()
    s.write(W.nal(3, 7, W.sps(0, 64, 48)))
    s.write(W.nal(3, 8, W.pps(0, 0)))
    s.write(W.nal(3, 5, W.slice(idr = true, 0, 0, 0, idrPicId = 0)))
    s.write(W.nal(2, 1, W.slice(idr = false, 0, 1, 2)))
    s.write(W.nal(3, 7, W.sps(0, 64, 48))) // SPS again — but NOT PPS
    s.write(W.nal(3, 5, W.slice(idr = true, 0, 0, 0, idrPicId = 1)))
    s.write(W.nal(2, 1, W.slice(idr = false, 0, 1, 2)))
    val ix = H264.index(s.toByteArray)
    assert(ix.keyframes == Vector(0L, 2L))
    // the second GOP segment must re-index standalone — i.e. its payload
    // carries a PPS despite the source AU lacking one
    val (_, _, n, payload) = ix.gopSegments(1)
    val sub = H264.index(payload)
    assert(sub.frames.length == n)
    assert(H264.nalUnits(payload).count(_.nalType == 8) == 1)
  }

  test("gopSegments are independently decodable: each re-indexes standalone") {
    val s = new java.io.ByteArrayOutputStream()
    s.write(W.nal(3, 7, W.sps(0, 64, 48)))
    s.write(W.nal(3, 8, W.pps(0, 0)))
    (0 until 3).foreach { g =>
      s.write(W.nal(3, 5, W.slice(idr = true, 0, 0, 0, idrPicId = g)))
      (1 to 2).foreach(k => s.write(W.nal(2, 1, W.slice(idr = false, 0, k, 2 * k))))
    }
    val ix = H264.index(s.toByteArray)
    val gops = ix.gopSegments
    assert(gops.map { case (g, st, n, _) => (g, st, n) } ==
      Vector((0, 0L, 3), (1, 3L, 3), (2, 6L, 3)))
    gops.foreach { case (_, _, n, payload) =>
      val sub = H264.index(payload) // parses with NO external SPS/PPS state
      assert(sub.frames.length == n)
      assert(sub.keyframes == Vector(0L))
      assert(sub.width == 64 && sub.height == 48)
    }
  }

  test("corrupt input fails loudly, never silently wrong") {
    // truncated SPS: bit reads past the RBSP end must throw, not wrap
    val sps = W.sps(0, 64, 48)
    val cut = java.util.Arrays.copyOfRange(sps, 0, 4)
    intercept[IllegalArgumentException] {
      H264.parseSps(new H264.BitReader(cut))
    }
    // a slice arriving before any SPS/PPS: loud NoSuchElementException
    // (unparseable stream state), not a bogus frame row
    val s = new java.io.ByteArrayOutputStream()
    s.write(W.nal(3, 5, W.slice(idr = true, 0, 0, 0)))
    intercept[NoSuchElementException] { H264.index(s.toByteArray) }
    // an exp-Golomb run past 31 zeros (a zeroed buffer posing as RBSP)
    intercept[IllegalArgumentException] {
      new H264.BitReader(new Array[Byte](16)).ue
    }
    // garbage with no start codes: zero NALs, empty index
    val noise = Array.tabulate[Byte](64)(i => (i * 37 + 5).toByte)
    assert(H264.nalUnits(noise).isEmpty)
    assert(H264.index(noise).frames.isEmpty)
  }

  test("slice headers containing emulation-prevention bytes parse (RBSP path)") {
    // force a 00 00 00 run inside the slice-header bits: frame_num 0 with
    // a 16-bit field and pocLsb 0 with 16 bits yields >= 3 zero bytes
    val sps = W.sps(0, 64, 48, log2MaxFrameNum = 16, log2MaxPocLsb = 16)
    val raw = W.slice(idr = false, 0, 0, 0, log2MaxFrameNum = 16,
      log2MaxPocLsb = 16, filler = Array[Byte](0x5a))
    assert(W.escapeRbsp(raw).length > raw.length) // escaping actually fired
    val s = new java.io.ByteArrayOutputStream()
    s.write(W.nal(3, 7, sps))
    s.write(W.nal(3, 8, W.pps(0, 0)))
    s.write(W.nal(3, 5, W.slice(idr = true, 0, 0, 0, log2MaxFrameNum = 16,
      log2MaxPocLsb = 16)))
    s.write(W.nal(2, 1, raw))
    val ix = H264.index(s.toByteArray)
    assert(ix.frames.length == 2)
    assert(ix.frames(1).frameNum == 0 && ix.frames(1).pocLsb == 0)
  }
}
