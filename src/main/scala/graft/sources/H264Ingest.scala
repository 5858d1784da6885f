package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed ingest of real H.264 Annex-B byte streams: one executor
  * task per file runs [[H264.index]] (NAL walk → access-unit split →
  * keyframe index → SPS/PPS-self-contained demux), then either the
  * per-frame index rows or the keyframe-aligned GOP segments surface as
  * DataFrames. The reference's equivalent ingest path is
  * `scanner/engine/ingest.cpp:175-380` feeding
  * `h264_byte_stream_index_creator.cpp`; here the parallelism unit is
  * the FILE (Spark's binaryFile source distributes the directory; each
  * stream's index is sequential by construction — NAL n's slice header
  * needs SPS/PPS state from NALs before it), so a 100 TB corpus of
  * many videos scales horizontally exactly like the reference's
  * per-video ingest jobs.
  *
  * GOP segments pair with [[VideoStore]]'s keyframe-seek model: each
  * segment payload starts with an IDR plus its parameter sets, so a
  * sparse read decodes only the covering segments — decode itself stays
  * behind the [[GopCodec]] seam until a real decoder is available.
  */
object H264Ingest {

  private val frameSchema = Seq("path", "frame", "byte_offset", "byte_size",
    "keyframe", "frame_num", "poc_lsb", "slice_type", "n_slices",
    "width", "height", "profile_idc")

  /** per-frame index rows for every `.h264` file under `glob` */
  def indexFiles(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        val ix = H264.index(bytes)
        ix.frames.map(f => (path, f.frame, f.byteOffset, f.byteSize,
          f.keyframe, f.frameNum, f.pocLsb, f.sliceType, f.nSlices,
          ix.width, ix.height, ix.profileIdc))
      }
      .toDF(frameSchema: _*)
  }

  /** keyframe-aligned GOP segments: (path, gop, start_frame, n_frames,
    * payload) — each payload independently decodable
    */
  def gopSegments(spark: SparkSession, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(glob)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) =>
        H264.index(bytes).gopSegments.map { case (g, s, n, payload) =>
          (path, g, s, n, payload)
        }
      }
      .toDF("path", "gop", "start_frame", "n_frames", "payload")
  }
}
