package graft

import java.nio.file.Files

import graft.model.FrameElem
import graft.operators.StdKernels
import graft.sources.{FakeVideoCodec, VideoStore}

class VideoStoreSpec extends SparkSpec {

  private def freshRoot(): String =
    Files.createTempDirectory("graft-video").toString

  private def synthFrames(streamId: Long, n: Int): Seq[FrameElem] =
    (0 until n).map(i => StdKernels.syntheticFrame(streamId, i.toLong, 8, 12, 3))

  private def assertSameFrame(a: FrameElem, b: FrameElem): Unit = {
    assert((a.streamId, a.index, a.height, a.width, a.channels, a.dtype) ==
      (b.streamId, b.index, b.height, b.width, b.channels, b.dtype))
    assert(java.util.Arrays.equals(a.data, b.data))
  }

  test("codec round-trip: decode(encode(gop)) == gop") {
    val gop  = synthFrames(3L, 10)
    val back = FakeVideoCodec.decodeGop(FakeVideoCodec.encodeGop(gop), 3L, 0L).toSeq
    assert(back.size == 10)
    gop.zip(back).foreach { case (a, b) => assertSameFrame(a, b) }
  }

  test("partial decode stops at upTo (sequential-from-keyframe contract)") {
    val gop = synthFrames(1L, 10)
    val acc = spark.sparkContext.longAccumulator("dec")
    val got = FakeVideoCodec.decodeGop(
      FakeVideoCodec.encodeGop(gop), 1L, 0L, upTo = 3, decoded = Some(acc)).toSeq
    assert(got.size == 4)
    assert(acc.value == 4L)
    assertSameFrame(got.last, gop(3))
  }

  test("ingest + full decode round-trips across streams") {
    val root = freshRoot()
    import spark.implicits._
    val all = synthFrames(0L, 25) ++ synthFrames(1L, 13)
    VideoStore.ingest(all.toDS(), root, "v", gopSize = 8)
    val segs = VideoStore.segments(spark, root, "v").collect()
    // 25 frames / gop8 -> 4 segments; 13 -> 2
    assert(segs.count(_.streamId == 0L) == 4)
    assert(segs.count(_.streamId == 1L) == 2)
    val back = VideoStore.frames(spark, root, "v").collect()
      .sortBy(f => (f.streamId, f.index))
    assert(back.length == 38)
    all.sortBy(f => (f.streamId, f.index)).zip(back).foreach {
      case (a, b) => assertSameFrame(a, b)
    }
  }

  test("sparse gather decodes only containing segments, only up to last requested offset") {
    val root = freshRoot()
    import spark.implicits._
    // 10 GOPs of 100 frames
    VideoStore.ingest(synthFrames(0L, 1000).toDS(), root, "big", gopSize = 100)
    val acc  = spark.sparkContext.longAccumulator("decoded")
    val want = Seq(5L, 205L, 210L, 999L)
    val got = VideoStore.gatherFrames(spark, root, "big", 0L, want, Some(acc))
      .collect().sortBy(_.index)
    assert(got.map(_.index).toSeq == want.sorted)
    got.foreach(f => assertSameFrame(f, StdKernels.syntheticFrame(0L, f.index, 8, 12, 3)))
    // segments 0 (to off 5), 2 (to off 10), 9 (to off 99) -> 6 + 11 + 100 decodes
    assert(acc.value == 6L + 11L + 100L)
  }

  test("compression hints: storage codec reaches the parquet files; lossless is exact (op.py:57-102)") {
    val root = freshRoot()
    import spark.implicits._
    val frames = synthFrames(0L, 16)
    VideoStore.ingest(frames.toDS(), root, "z", gopSize = 8,
      hints = VideoStore.CompressionHints(storageCodec = "zstd"))
    // writer option really applied: parquet part files carry the codec name
    val parts = new java.io.File(s"$root/z/data").listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
    assert(parts.nonEmpty && parts.forall(_.contains("zstd")))
    // lossless default: exact round-trip
    val back = VideoStore.frames(spark, root, "z").collect().sortBy(_.index)
    frames.zip(back).foreach { case (a, b) => assertSameFrame(a, b) }
  }

  test("compression hints: lossy quality quantizes samples monotonically") {
    val root = freshRoot()
    import spark.implicits._
    val hints = VideoStore.CompressionHints(quality = 40, lossless = false)
    val step  = hints.step
    assert(step > 1)
    VideoStore.ingest(synthFrames(0L, 16).toDS(), root, "lossy", gopSize = 8, hints = hints)
    val back = VideoStore.frames(spark, root, "lossy").collect()
    assert(back.nonEmpty)
    // every decoded sample is a multiple of the quantization step, and
    // within step of the original
    back.foreach { f =>
      val orig = StdKernels.syntheticFrame(0L, f.index, 8, 12, 3)
      f.data.indices.foreach { i =>
        val v = f.data(i) & 0xff
        assert(v % step == 0)
        assert(math.abs(v - (orig.data(i) & 0xff)) < step)
      }
    }
  }

  test("export concatenates segments in order") {
    val root = freshRoot()
    import spark.implicits._
    VideoStore.ingest(synthFrames(0L, 20).toDS(), root, "exp", gopSize = 8)
    val out   = s"$root/out.fvc"
    val bytes = VideoStore.exportConcat(spark, root, "exp", 0L, out)
    val expected = VideoStore.segments(spark, root, "exp").collect()
      .map(_.payload.length.toLong).sum
    assert(bytes == expected)
    assert(new java.io.File(out).length() == expected)
  }

  test("mp4 round-trip: export -> demux ingest -> identical frames and segment index") {
    val root = freshRoot()
    import spark.implicits._
    val frames = synthFrames(0L, 20)
    VideoStore.ingest(frames.toDS(), root, "orig", gopSize = 8)
    val out = s"$root/rt.mp4"
    VideoStore.exportMp4(spark, root, "orig", 0L, out, fps = 24)
    // demux the container back into a second stored stream
    VideoStore.ingestMp4(spark, out, root, "fromMp4", streamId = 0L)
    val origSegs = VideoStore.segments(spark, root, "orig").collect().sortBy(_.segId)
    val backSegs = VideoStore.segments(spark, root, "fromMp4").collect().sortBy(_.segId)
    assert(backSegs.map(s => (s.segId, s.startIndex, s.numFrames)).toSeq ==
      origSegs.map(s => (s.segId, s.startIndex, s.numFrames)).toSeq)
    origSegs.zip(backSegs).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a.payload, b.payload))
    }
    val back = VideoStore.frames(spark, root, "fromMp4").collect()
      .sortBy(_.index)
    assert(back.length == 20)
    frames.zip(back).foreach { case (a, b) => assertSameFrame(a, b) }
  }

  test("save_mp4 writes a structurally valid ISO-BMFF container around the stored GOPs") {
    val root = freshRoot()
    import spark.implicits._
    VideoStore.ingest(synthFrames(0L, 20).toDS(), root, "mp4", gopSize = 8)
    val out   = s"$root/out.mp4"
    val total = VideoStore.exportMp4(spark, root, "mp4", 0L, out, fps = 24)
    val bytes = Files.readAllBytes(java.nio.file.Paths.get(out))
    assert(bytes.length.toLong == total)

    def be32(off: Int): Int =
      ((bytes(off) & 0xff) << 24) | ((bytes(off + 1) & 0xff) << 16) |
        ((bytes(off + 2) & 0xff) << 8) | (bytes(off + 3) & 0xff)
    def fourcc(off: Int): String = new String(bytes, off + 4, 4, "US-ASCII")
    // top-level box walk
    def topBoxes: Seq[(String, Int, Int)] = {
      var off = 0
      val b   = Seq.newBuilder[(String, Int, Int)]
      while (off < bytes.length) {
        val sz = be32(off); b += ((fourcc(off), off, sz)); off += sz
      }
      b.result()
    }
    assert(topBoxes.map(_._1) == Seq("ftyp", "mdat", "moov"),
      "exactly the classic three top-level boxes, in order")

    val segs = VideoStore.segments(spark, root, "mp4").collect().sortBy(_.segId)
    val (_, mdatOff, mdatSz) = topBoxes(1)
    // mdat payload == segments concatenated in segId order
    val mdatBody = bytes.slice(mdatOff + 8, mdatOff + mdatSz)
    assert(java.util.Arrays.equals(mdatBody, segs.flatMap(_.payload).toArray))

    // descend moov/trak/mdia/minf/stbl and check the sample tables
    def child(off: Int, end: Int, tpe: String): Int = {
      var o = off
      while (o < end && fourcc(o) != tpe) o += be32(o)
      assert(o < end, s"missing box $tpe"); o
    }
    val (_, moovOff, moovSz) = topBoxes(2)
    val trak = child(moovOff + 8, moovOff + moovSz, "trak")
    val mdia = child(trak + 8, trak + be32(trak), "mdia")
    val minf = child(mdia + 8, mdia + be32(mdia), "minf")
    val stbl = child(minf + 8, minf + be32(minf), "stbl")
    val stblEnd = stbl + be32(stbl)
    val stsz = child(stbl + 8, stblEnd, "stsz")
    assert(be32(stsz + 16) == segs.length, "stsz sample count == #GOPs")
    segs.indices.foreach { i =>
      assert(be32(stsz + 20 + 4 * i) == segs(i).payload.length, s"stsz[$i]")
    }
    val stco = child(stbl + 8, stblEnd, "stco")
    assert(be32(stco + 16) == mdatOff + 8, "chunk offset points at first payload byte")
    val stts = child(stbl + 8, stblEnd, "stts")
    val runs = be32(stts + 12)
    val framesTotal = (0 until runs)
      .map(r => be32(stts + 16 + 8 * r).toLong * be32(stts + 20 + 8 * r)).sum
    assert(framesTotal == 20L, "stts durations sum to total frames")
    val stsd = child(stbl + 8, stblEnd, "stsd")
    assert(fourcc(stsd + 16) == "gfvc", "sample entry carries the stand-in fourcc")
  }
}
