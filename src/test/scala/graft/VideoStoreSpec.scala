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
}
