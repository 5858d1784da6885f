package graft

/** Core data model of the rebuilt engine.
  *
  * The reference (scanner-research/scanner) models data as *sequences*: ordered
  * streams of byte-buffer elements indexed 0..N-1 (`scanner/api/kernel.h:27-57`,
  * `scanner/metadata.proto:120-128`). We re-express a sequence as a DataFrame
  * with a `(streamId, index)` key and arbitrary payload columns; a Scanner
  * *table* is a persisted Parquet dataset of such rows plus a small JSON
  * descriptor replacing `TableDescriptor`.
  *
  * Scale note: `streamId` is the natural partitioning key (one stream = one
  * video / one document shard). All sequence operators below preserve dense
  * per-stream indices with *arithmetic* re-indexing so no global sort or
  * window is needed on the hot path.
  */
object model {

  /** A Bytes-column element — reference `ColumnType.Bytes`
    * (`scanner/metadata.proto:43-47`). `payload == null` encodes Scanner's
    * NullElement (`python/scannerpy/storage.py:8-16`).
    */
  final case class Elem(streamId: Long, index: Long, payload: Array[Byte])

  /** A Frame element — dense 3-D tensor, reference `scanner/api/frame.h:26-82`.
    * dtype: 0=U8, 1=U16, 2=F32, 3=F64 (`FrameType`, frame.h:31-59).
    */
  final case class FrameElem(
      streamId: Long,
      index: Long,
      height: Int,
      width: Int,
      channels: Int,
      dtype: Byte,
      data: Array[Byte])

  object FrameType {
    val U8: Byte  = 0
    val U16: Byte = 1
    val F32: Byte = 2
    val F64: Byte = 3
  }

  /** Replacement for the reference `TableDescriptor`
    * (`scanner/metadata.proto:120-128`): name, commit flag, column list,
    * row count. Persisted as JSON next to the parquet data.
    * `location` set ⇒ inplace-registered stream: the data lives at an
    * external path and was never copied (reference inplace ingest,
    * `scanner/engine/ingest.cpp:382-546`).
    */
  final case class StreamDescriptor(
      name: String,
      committed: Boolean,
      columns: Seq[String],
      rows: Long,
      location: Option[String] = None)

  /** Reference CacheMode (`python/scannerpy/client.py:1386-1432`). */
  sealed trait CacheMode
  object CacheMode {
    case object Error     extends CacheMode
    case object Ignore    extends CacheMode
    case object Overwrite extends CacheMode
  }

  /** Stencil boundary conditions — reference `rpc.proto:254-259`. */
  sealed trait Boundary
  object Boundary {
    case object RepeatEdge extends Boundary
    case object NullFill   extends Boundary
    case object Error      extends Boundary
  }
}
