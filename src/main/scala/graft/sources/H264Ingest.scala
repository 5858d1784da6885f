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

  /** Ingest a directory of `.h264` files into the SAME committed
    * segment-table format [[VideoStore.ingest]] writes — one row per
    * keyframe-aligned GOP, `(streamId, segId)` sorted so parquet
    * row-group stats prune on segId; streamId is the file's position in
    * the sorted listing (the `ingestMp4Dir` convention). The stored
    * payloads are REAL self-contained H264 (parameter sets present at
    * every leading IDR), so everything metadata-driven on the store —
    * sparse-read segment planning, pruned scans, ordered concatenation
    * back to one Annex-B stream — runs today; only pixel decode of these
    * segments waits on a real H264 [[GopCodec]] behind the seam.
    */
  def ingestH264Dir(spark: SparkSession, dirPath: String, root: String,
      name: String,
      mode: graft.model.CacheMode = graft.model.CacheMode.Error)
      : graft.model.StreamDescriptor =
    // Hadoop FS throughout (any backend), executor-side opens via a
    // broadcast conf — the ingestMp4Dir pattern (VideoStore.scala:300)
    ingestDirWith(spark, dirPath, root, name, mode, ".h264",
      bytes => H264.index(bytes))

  /** [[ingestH264Dir]] for directories of real `avc1` MP4 files — the
    * format users actually have. Each executor task demuxes its file
    * with the repo's own ISO-BMFF + AVCC walk ([[H264Mp4.indexMp4]]:
    * avcC parameter sets re-inlined, samples re-framed to Annex-B),
    * then indexes and GOP-segments it exactly like the raw path — so a
    * directory of MP4s and a directory of `.h264` streams produce the
    * SAME stored table.
    */
  def ingestMp4H264Dir(spark: SparkSession, dirPath: String, root: String,
      name: String,
      mode: graft.model.CacheMode = graft.model.CacheMode.Error)
      : graft.model.StreamDescriptor =
    ingestDirWith(spark, dirPath, root, name, mode, ".mp4",
      bytes => H264Mp4.indexMp4(bytes))

  /** Export one stored stream as a real `avc1` MP4 (AVCC samples, avcC
    * parameter sets, stss sync table). The stream's segments concatenate
    * to one Annex-B stream (each is self-contained), which re-indexes
    * and muxes; the driver holds ONE stream's bytes — the sample table
    * needs every access-unit size before the container header is known.
    * Returns bytes written.
    */
  def saveMp4(spark: SparkSession, root: String, name: String,
      streamId: Long, outPath: String, fps: Int = 30): Long = {
    val buf = new java.io.ByteArrayOutputStream()
    streamPayloads(spark, root, name, streamId).foreach(buf.write)
    val ix = H264.index(buf.toByteArray)
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try H264Mp4.mux(ix, out, fps) finally out.close()
  }

  /** one stream's GOP payloads in segId order, streamed through
    * `toLocalIterator` — the shared concatenation source of
    * [[saveAnnexB]] (writes as it goes) and [[saveMp4]] (must buffer:
    * the container header needs every sample size first)
    */
  private def streamPayloads(spark: SparkSession, root: String,
      name: String, streamId: Long): Iterator[Array[Byte]] = {
    import scala.jdk.CollectionConverters._
    VideoStore.segments(spark, root, name)
      .filter(col("streamId") === streamId)
      .orderBy("segId")
      .toLocalIterator().asScala.map(_.payload)
  }

  /** shared distributed walk of [[ingestH264Dir]]/[[ingestMp4H264Dir]]:
    * list, broadcast conf, per-file open + index + segment
    */
  private def ingestDirWith(spark: SparkSession, dirPath: String,
      root: String, name: String, mode: graft.model.CacheMode, ext: String,
      indexer: Array[Byte] => H264.StreamIndex)
      : graft.model.StreamDescriptor = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val dir = new org.apache.hadoop.fs.Path(dirPath)
    val fs0 = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs0.listStatus(dir).map(_.getPath)
      .filter(_.getName.toLowerCase.endsWith(ext))
      .map(_.toString).sorted
    require(files.nonEmpty, s"no $ext files under $dirPath")
    val confKV = spark.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val confB = spark.sparkContext.broadcast(confKV)
    val withIds = files.zipWithIndex.map { case (p, i) => (p, i.toLong) }.toSeq
    val nParts = math.max(1,
      math.min(spark.sparkContext.defaultParallelism, files.length))
    // the ingestMp4Dir ordering trick (VideoStore.scala:311): range-sort
    // the TINY (path, sid) relation, emit per-file segments in segId
    // order, and write with NO global sort — parquet comes out
    // (streamId, segId)-ordered without an exchange over the payloads
    val segs = withIds.toDF("path", "sid")
      .repartitionByRange(nParts, col("sid"))
      .sortWithinPartitions("sid")
      .as[(String, Long)]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val hc = new org.apache.hadoop.conf.Configuration(false)
          confB.value.foreach { case (k, v) => hc.set(k, v) }
          it.flatMap { case (pathStr, sid) =>
            val p = new org.apache.hadoop.fs.Path(pathStr)
            val fs = p.getFileSystem(hc)
            val len = fs.getFileStatus(p).getLen
            require(len <= Int.MaxValue,
              s"$pathStr is $len bytes; single-stream indexing is bounded " +
                "at 2 GiB — split the stream or extend to a streaming NAL walk")
            val bytes = new Array[Byte](len.toInt)
            val in = fs.open(p)
            try in.readFully(0L, bytes) finally in.close()
            indexer(bytes).gopSegments.map { case (g, start, n, payload) =>
              VideoStore.Segment(sid, g.toLong, start, n, payload)
            }
          }
        }
      }
      .toDF()
    NamedStorage.write(segs, root, name, mode)
  }

  /** Sparse access-unit gather over an H264 segment store: for the
    * requested (stream, frame) pairs, read ONLY the covering GOP
    * segments and return each wanted frame's index row (keyframe flag,
    * frame_num, slice count, byte size) by re-indexing just those
    * payloads. Same two-phase plan as [[VideoStore.gatherFramesMulti]]
    * (`decoder_automata` sparse-run semantics): a payload-pruned
    * metadata pass range-joins the broadcast want list down to one row
    * per covering segment, and only that `isin` set reaches the payload
    * scan — so a 10-frame request against a million-GOP store reads
    * ~10 segments, which is the whole point of keyframe alignment.
    * `scanned` (optional) counts segments actually opened, for pruning
    * pins. Decode-free: access-unit structure needs only the NAL walk.
    */
  def gatherAccessUnits(spark: SparkSession, root: String, name: String,
      wants: Map[Long, Seq[Long]],
      scanned: Option[org.apache.spark.util.LongAccumulator] = None)
      : DataFrame = {
    import spark.implicits._
    // one pruning plan, two payload consumers: the decode gather and this
    val (needed, pruned) = VideoStore.pruneSegments(spark, root, name, wants)
    val wantB = spark.sparkContext.broadcast(
      wants.map { case (k, v) => k -> v.toSet })
    val neededB = spark.sparkContext.broadcast(needed.keySet)
    pruned
      .flatMap { s =>
        if (!neededB.value((s.streamId, s.segId))) Iterator.empty
        else {
          scanned.foreach(_.add(1L))
          val wantSet = wantB.value(s.streamId)
          H264.index(s.payload).frames.iterator
            .map(f => (s.streamId, s.startIndex + f.frame, f.keyframe,
              f.frameNum, f.nSlices, f.byteSize))
            .filter(t => wantSet.contains(t._2))
        }
      }
      .toDF("streamId", "frame", "keyframe", "frame_num", "n_slices",
        "byte_size")
  }

  /** Export one stored stream back to a single Annex-B file — the
    * `save_mp4` twin for raw H264 stores
    * (`python/scannerpy/column.py:283-342` semantics: ordered segment
    * concatenation; valid here because every GOP payload is
    * self-contained). Segments stream through `toLocalIterator` in
    * segId order — driver memory stays one-GOP bounded however long
    * the stream. Returns the byte count written.
    */
  def saveAnnexB(spark: SparkSession, root: String, name: String,
      streamId: Long, outPath: String): Long = {
    val p = new org.apache.hadoop.fs.Path(outPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    var n = 0L
    try streamPayloads(spark, root, name, streamId).foreach { payload =>
      out.write(payload)
      n += payload.length
    } finally out.close()
    n
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
