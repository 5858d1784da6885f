package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.Elem
import graft.operators.Kernels.StatefulKernel

/** Structured-Streaming realization of the reference's stateful-kernel
  * semantics (SURVEY.md §2.3): the same `StatefulKernel` that runs batch
  * via `flatMapSortedGroups` runs unbounded via `flatMapGroupsWithState`,
  * with kernel state carried in the Spark state store across micro-batches
  * — the reference's "unbounded state" contract (`scanner/api/op.h:95-103`)
  * extended to actually-unbounded inputs, which the reference itself never
  * supported (it is batch-only over stored streams, SURVEY.md §2.5).
  *
  * Scale notes: state is per-stream (keyed by streamId), checkpointed by
  * the engine; within a micro-batch elements are sorted by index before
  * replay, and a `nextIndex` cursor in the state makes replay idempotent
  * across retries (duplicates/out-of-order within the watermark are
  * dropped deterministically).
  */
object StreamingOps {

  /** (kernel state, next expected dense index) carried across micro-batches */
  final case class KernelState[S](s: S, nextIndex: Long)

  /** Apply an unbounded-state kernel to a streaming Dataset[Elem].
    * Elements must arrive with dense per-stream indices (the sequence
    * model); within each micro-batch they are sorted, and any element not
    * matching the `nextIndex` cursor is dropped (late duplicate) or held
    * implicitly (gap — will be processed when the gap fills in a later
    * batch it arrives in... the reference errors on gaps; we drop-forward).
    */
  def unboundedState[S: org.apache.spark.sql.Encoder](
      ds: Dataset[Elem], kernel: StatefulKernel[S]): Dataset[Elem] = {
    implicit val stateEnc = Encoders.product[KernelState[S]](
      scala.reflect.runtime.universe.typeTag[KernelState[S]].asInstanceOf[
        scala.reflect.runtime.universe.TypeTag[KernelState[S]]])
    ds.groupByKey(_.streamId)(Encoders.scalaLong)
      .flatMapGroupsWithState[KernelState[S], Elem](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[Elem], state: GroupState[KernelState[S]]) =>
          var st = state.getOption.getOrElse(KernelState(kernel.init, 0L))
          val out = it.toSeq.sortBy(_.index).iterator.flatMap { e =>
            if (e.index == st.nextIndex) {
              val (s2, payload) = kernel.update(st.s, e.index, e.payload)
              st = KernelState(s2, st.nextIndex + 1)
              Some(e.copy(payload = payload))
            } else None // duplicate or out-of-order beyond cursor
          }.toVector
          state.update(st)
          out.iterator
      }(Encoders.scalaLong, stateEnc, Encoders.product[Elem])
  }

  /** Watermarked tumbling-window event counts — the standard streaming
    * aggregation shape (readStream → withWatermark → groupBy(window) →
    * agg), over an events-like stream (ts: Timestamp, event_type: String).
    */
  def windowedEventCounts(events: DataFrame, watermark: String, windowLen: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("win_start"), col("event_type"), col("n"))

  /** Sessionization with session-gap timeout via flatMapGroupsWithState —
    * the streaming twin of the batch q_events_sessionize query: a session
    * closes when `gapMs` passes with no event for the user.
    */
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class ClosedSession(user_id: Long, start: Long, end: Long, n: Long)

  def sessionize(events: Dataset[(Long, Long)], gapMs: Long): Dataset[ClosedSession] = {
    implicit val ss  = Encoders.product[SessionState]
    implicit val cs  = Encoders.product[ClosedSession]
    events.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout()) {
        (user: Long, it: Iterator[(Long, Long)], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ClosedSession(user, s.start, s.last, s.n))
          } else {
            val ts = it.map(_._2).toSeq.sorted
            var closed = Vector.empty[ClosedSession]
            var cur    = state.getOption
            ts.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(s.copy(last = t, n = s.n + 1))
                case Some(s) =>
                  closed :+= ClosedSession(user, s.start, s.last, s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutDuration(gapMs)
            }
            closed.iterator
          }
      }(Encoders.scalaLong, ss, cs)
  }
}
