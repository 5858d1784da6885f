package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import graft.model.Elem

/** The reference kernel API (`scanner/api/kernel.h`, `scanner/api/op.h:36-136`,
  * `python/scannerpy/op.py:317-615`) re-expressed over Spark Datasets.
  *
  * Contract recap (SURVEY.md §2.3):
  *  - plain kernels are 1→1 per element            → `Dataset.map`
  *  - batch kernels amortize over row vectors       → `mapPartitions` (free)
  *  - stencil kernels read a window of rows         → SequenceOps.stencil
  *  - bounded state (warmup W): output r requires the kernel to have
  *    processed rows max(0, r-W)..r in order        → sorted flatMapGroups
  *  - unbounded state: output r requires ALL rows 0..r; reset per
  *    slice/stream                                  → sorted flatMapGroups
  *
  * Determinism note (SURVEY.md §7 hard part 2): stateful execution must be a
  * single ordered pass per (stream, slice). We use
  * `KeyValueGroupedDataset.flatMapSortedGroups(index)`, which sorts within
  * each group during the shuffle — never relies on partition order.
  * Parallelism = number of (stream, slice) groups, which is exactly the
  * reference's model (state cannot parallelize within a stream by
  * definition; Slice exists to create parallelism).
  */
object Kernels {

  /** Elem carrying a slice id — used when stateful kernels run inside
    * Slice/Unslice so state resets per slice group (`py_test.py:426-435`).
    */
  final case class SlicedElem(streamId: Long, sliceId: Long, index: Long, payload: Array[Byte])

  /** A stateful kernel instance — mirrors `scanner/api/kernel.h:171-191`
    * (`new_stream`/`reset`/`execute`). One instance per (stream, slice)
    * group; `reset` is implicit (a fresh instance per group).
    */
  trait StatefulKernel[S] extends Serializable {
    def init: S
    /** process one element, return (new state, output payload) */
    def update(state: S, index: Long, payload: Array[Byte]): (S, Array[Byte])
  }

  private val elemEnc: Encoder[Elem]        = Encoders.product[Elem]
  private val sElemEnc: Encoder[SlicedElem] = Encoders.product[SlicedElem]

  /** Plain 1→1 kernel (`docs/guide/graphs.rst:103-105`). */
  def map1to1(ds: Dataset[Elem])(f: Elem => Array[Byte]): Dataset[Elem] =
    ds.map(e => e.copy(payload = f(e)))(elemEnc)

  /** Batch kernel: the reference feeds row vectors to amortize per-call cost
    * (`kernel.h:59-66`, batching loop `evaluate_worker.cpp:897-904`). Spark's
    * iterator model gives this for free; exposed for kernels with expensive
    * per-batch setup (model load, codec open).
    */
  def mapBatched(ds: Dataset[Elem])(f: Iterator[Elem] => Iterator[Elem]): Dataset[Elem] =
    ds.mapPartitions(f)(elemEnc)

  /** Unbounded-state kernel: single ordered pass over each (stream[, slice])
    * group, state reset at group boundary (`op.h:95-103`, reset contract
    * `kernel.h:182-191`, oracle `tests/test_ops.cpp:173-236`).
    */
  def unboundedState[S](df: DataFrame, kernel: StatefulKernel[S], sliced: Boolean = false): DataFrame =
    if (!sliced) {
      val ds = df.selectExpr("streamId", "index", "payload").as[Elem](elemEnc)
      ds.groupByKey(_.streamId)(Encoders.scalaLong)
        .flatMapSortedGroups(col("index")) { (_: Long, it: Iterator[Elem]) =>
          var s = kernel.init
          it.map { e =>
            val (s2, out) = kernel.update(s, e.index, e.payload)
            s = s2
            e.copy(payload = out)
          }
        }(elemEnc)
        .toDF()
    } else {
      val ds = df.selectExpr("streamId", "sliceId", "index", "payload").as[SlicedElem](sElemEnc)
      ds.groupByKey(e => (e.streamId, e.sliceId))(
          Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
        .flatMapSortedGroups(col("index")) { (_: (Long, Long), it: Iterator[SlicedElem]) =>
          var s = kernel.init
          it.map { e =>
            val (s2, out) = kernel.update(s, e.index, e.payload)
            s = s2
            e.copy(payload = out)
          }
        }(sElemEnc)
        .toDF()
    }

  /** Bounded-state kernel with warmup W: output row r only requires rows
    * max(0, r-W)..r to have been processed (`op.h:84-93`; warmup row
    * derivation `dag_analysis.cpp:1607-1620`; oracle values
    * `py_test.py:407-423`).
    *
    * `requested`: the (possibly sparse, e.g. post-Gather) ORIGINAL indices
    * wanted, or None for all rows. This reproduces the reference's
    * `derive_stencil_requirements` backward walk (`dag_analysis.cpp:
    * 1328-1743`) statically: fetch the union of [r-W, r] windows (filter
    * pushed to the scan), run each group's fetched rows in order with a
    * state cold-start at fetch gaps (the reference also cold-starts there,
    * `evaluate_worker.cpp:578-707`), emit only requested rows.
    */
  def boundedState[S](
      df: DataFrame,
      kernel: StatefulKernel[S],
      warmup: Int,
      requested: Option[Seq[Long]] = None,
      sliced: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    val needed: DataFrame = requested match {
      case None => df
      case Some(rows) =>
        import spark.implicits._
        val want = rows.flatMap(r => math.max(0L, r - warmup) to r).distinct.toDF("index")
        df.join(broadcast(want), Seq("index"))
    }
    val reqSet = requested.map(_.toSet)
    // one ordered warmup-replay pass over a group's fetched rows
    def pass[E](it: Iterator[E], index: E => Long, payload: E => Array[Byte],
        rebuild: (E, Array[Byte]) => E): Iterator[E] = {
      var s       = kernel.init
      var lastIdx = Long.MinValue
      it.flatMap { e =>
        if (index(e) != lastIdx + 1) s = kernel.init // cold start at gap
        lastIdx = index(e)
        val (s2, out) = kernel.update(s, index(e), payload(e))
        s = s2
        if (reqSet.forall(_.contains(index(e)))) Some(rebuild(e, out)) else None
      }
    }
    if (!sliced) {
      val ds = needed.selectExpr("streamId", "index", "payload").as[Elem](elemEnc)
      ds.groupByKey(_.streamId)(Encoders.scalaLong)
        .flatMapSortedGroups(col("index")) { (_: Long, it: Iterator[Elem]) =>
          pass[Elem](it, _.index, _.payload, (e, out) => e.copy(payload = out))
        }(elemEnc)
        .toDF()
    } else {
      // per-slice variant: state (and the warmup replay window) scope to
      // (streamId, sliceId) over the slice-LOCAL dense index — the
      // reference derives warmup rows within slices
      // (`dag_analysis.cpp:1607-1620`; per-slice args `py_test.py:393-404`);
      // `requested` names local indices, applied uniformly to every slice
      val ds = needed.selectExpr("streamId", "sliceId", "index", "payload")
        .as[SlicedElem](sElemEnc)
      ds.groupByKey(e => (e.streamId, e.sliceId))(
          Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
        .flatMapSortedGroups(col("index")) { (_: (Long, Long), it: Iterator[SlicedElem]) =>
          pass[SlicedElem](it, _.index, _.payload, (e, out) => e.copy(payload = out))
        }(sElemEnc)
        .toDF()
    }
  }
}
