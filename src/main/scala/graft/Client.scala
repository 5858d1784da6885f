package graft

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}

import graft.model.{CacheMode, FrameElem, StreamDescriptor}
import graft.sources.{NamedStorage, VideoStore}

/** Reference-client-shaped facade (`python/scannerpy/client.py`): the entry
  * point a Scanner user recognizes — ingest stored streams, build a graph
  * from sources through ops, `run` it into a committed sink, `load` results
  * back. Underneath it is nothing but the library's DataFrame operators, so
  * everything composes with arbitrary Spark code; the facade exists to make
  * the reference's workflow a one-import switch:
  *
  * {{{
  *   val cl = Client(spark, "/data/graftdb")
  *   cl.ingestFrames("vid", frames, gopSize = 50)          // ingest_videos
  *   val g = SequenceOps.range(cl.frames("vid").toDF(), 0, 30)
  *   val h = StdKernels.histogramOp(g.as[FrameElem])        // ops.Histogram
  *   cl.run(h.toDF(), "hists", CacheMode.Overwrite)         // cl.run(...)
  *   val rows = cl.load("hists")                            // stream.load()
  * }}}
  */
final case class Client(spark: SparkSession, storageRoot: String) {

  /** reference `ingest_videos` (auto-skip when already ingested) */
  def ingestFrames(name: String, frames: Dataset[FrameElem], gopSize: Int,
      mode: CacheMode = CacheMode.Ignore,
      hints: VideoStore.CompressionHints = VideoStore.CompressionHints()): StreamDescriptor =
    VideoStore.ingest(frames, storageRoot, name, gopSize, mode, hints)

  /** reference inplace ingest — register external parquet, no copy */
  def ingestInplace(name: String, dataPath: String,
      mode: CacheMode = CacheMode.Ignore): StreamDescriptor =
    NamedStorage.registerInplace(spark, storageRoot, name, dataPath, mode)

  /** reference NamedStream(...).as_frame() — lazy decoded frame source */
  def frames(name: String): Dataset[FrameElem] =
    VideoStore.frames(spark, storageRoot, name)

  /** sparse frame read of one stream through the keyframe index
    * (reference Gather + sparse decode)
    */
  def gatherFrames(name: String, streamId: Long, rows: Seq[Long]): Dataset[FrameElem] =
    VideoStore.gatherFrames(spark, storageRoot, name, streamId, rows)

  /** multi-stream sparse read: one planning + decode pass over every
    * requested stream (the reference's per-job stream loop without looping
    * the driver)
    */
  def gatherFrames(name: String, wants: Map[Long, Seq[Long]]): Dataset[FrameElem] =
    VideoStore.gatherFramesMulti(spark, storageRoot, name, wants)

  /** reference NamedStream table read */
  def stream(name: String): DataFrame =
    NamedStorage.read(spark, storageRoot, name)

  /** reference `cl.run(output_op, cache_mode)`: materialize a graph into a
    * committed named sink (the ONLY action in the workflow — everything
    * upstream stays lazy, exactly like the reference's deferred DAG)
    */
  def run(graph: DataFrame, sinkName: String,
      mode: CacheMode = CacheMode.Error): StreamDescriptor =
    NamedStorage.write(graph, storageRoot, sinkName, mode)

  /** reference `stream.load(rows)` — ordered client-side retrieval */
  def load(name: String, rows: Option[Seq[Long]] = None): Iterator[Row] =
    NamedStorage.load(spark, storageRoot, name, rows)

  def committed(name: String): Boolean = NamedStorage.committed(spark, storageRoot, name)
  def len(name: String): Long          = NamedStorage.len(spark, storageRoot, name)
  def delete(name: String): Unit       = NamedStorage.delete(spark, storageRoot, name)

  /** reference `save_mp4` — ordered segment export */
  def export(name: String, streamId: Long, outPath: String): Long =
    VideoStore.exportConcat(spark, storageRoot, name, streamId, outPath)

  /** reference `save_mp4` proper: segments wrapped in a real MP4 container */
  def saveMp4(name: String, streamId: Long, outPath: String, fps: Int = 30): Long =
    VideoStore.exportMp4(spark, storageRoot, name, streamId, outPath, fps)

  /** distributed multi-stream `save_mp4`: every stream to its own MP4,
    * one executor task per stream (the reference's client-side per-stream
    * export loop without the client bottleneck)
    */
  def saveMp4All(name: String, outDir: String, fps: Int = 30): Array[(Long, String, Long)] =
    VideoStore.exportMp4All(spark, storageRoot, name, outDir, fps)

  /** reference `ingest_videos` from an actual MP4 file (container demux) */
  def ingestMp4(name: String, mp4Path: String, streamId: Long = 0L,
      mode: CacheMode = CacheMode.Ignore): StreamDescriptor =
    VideoStore.ingestMp4(spark, mp4Path, storageRoot, name, streamId, mode)

  /** reference `ingest_videos` over a whole directory: one multi-stream
    * table in one job, one executor task per container file
    */
  def ingestMp4Dir(name: String, dirPath: String,
      mode: CacheMode = CacheMode.Ignore): StreamDescriptor =
    VideoStore.ingestMp4Dir(spark, dirPath, storageRoot, name, mode)
}
