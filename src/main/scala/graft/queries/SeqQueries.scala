package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Elem
import graft.operators.{Kernels, SequenceOps, StdKernels}
import graft.operators.SequenceOps.Partitioner

/** Sequence-operator queries over the `events` table viewed as one dense
  * stream (index = event_id, dense 0..N-1) — each exercises one reference
  * stream op (SURVEY.md §2.2) and has an equivalent DuckDB oracle in
  * [[SeqQueries.oracles]].
  */
object SeqQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  /** events as a single dense stream: (streamId=0, index=event_id, payload cols). */
  def stream(s: SparkSession, dir: String): DataFrame =
    events(s, dir).select(
      lit(0L).as(SequenceOps.STREAM),
      col("event_id").as(SequenceOps.INDEX),
      col("event_type"),
      col("value"))

  /** block-sample `value` at rate n (stride then repeat) — shared by the
    * positional/variadic join queries so both stay in sync
    */
  private def blockSampled(base: DataFrame, n: Long, name: String): DataFrame =
    SequenceOps.repeat(SequenceOps.stride(base, n), n)
      .select(col(SequenceOps.STREAM), col(SequenceOps.INDEX), col("value").as(name))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "seq_stride" -> ((s, dir) =>
      SequenceOps.stride(stream(s, dir), 8)
        .select(col("index"), col("event_type"))
        .orderBy("index")),

    "seq_range" -> ((s, dir) =>
      SequenceOps.range(stream(s, dir), 100, 400)
        .select(col("index"), col("event_type"))
        .orderBy("index")),

    "seq_strided_ranges" -> ((s, dir) =>
      SequenceOps.stridedRanges(stream(s, dir), Seq((0L, 200L), (500L, 700L)), 10)
        .select(col("index"), col("event_type"))
        .orderBy("index")),

    // overlapping intervals duplicate rows (reference concatenation
    // semantics, sampler.cpp:140-264): events 100..140 step 10 appear in
    // both segments at different output indices
    "seq_overlapping_ranges" -> ((s, dir) =>
      SequenceOps.stridedRanges(stream(s, dir), Seq((0L, 150L), (100L, 250L)), 10)
        .select(col("index"), col("event_type"))
        .orderBy("index")),

    // ONE graph over 4 streams with per-stream sampling args (reference Job
    // bindings, client.py:1434-1527) + per-stream unbounded state: running
    // sum over len(event_type), proving state isolation across streams
    "seq_multistream" -> ((s, dir) => {
      val base = events(s, dir).select(
        (col("event_id") % 4).as(SequenceOps.STREAM),
        (col("event_id") / 4).cast("long").as(SequenceOps.INDEX),
        length(col("event_type")).cast("long").as("v"))
      val sampled = SequenceOps.stridedRangePerStream(base, Map(
        0L -> ((0L, 250L, 2L)),
        1L -> ((50L, 150L, 5L)),
        2L -> ((0L, 250L, 10L)),
        3L -> ((100L, 200L, 25L))))
      import s.implicits._
      val elems = sampled.as[(Long, Long, Long)]
        .map { case (sid, idx, v) => Elem(sid, idx, StdKernels.encodeI64(v)) }
        .toDF()
      val summed = Kernels.unboundedState(elems, StdKernels.RunningSum)
      summed.as[Elem]
        .map(e => (e.streamId, e.index, StdKernels.decodeI64(e.payload)))
        .toDF("stream_id", "index", "cumsum")
        .orderBy("stream_id", "index")
    }),

    // as-of alignment: dense 4-stream event sequence joined to its own
    // sparse (every-10th) snapshot — each row gets the latest snapshot
    // value at-or-before its index (DuckDB native ASOF JOIN as the oracle)
    "seq_asof" -> ((s, dir) => {
      val base = events(s, dir).select(
        (col("event_id") % 4).as(SequenceOps.STREAM),
        (col("event_id") / 4).cast("long").as(SequenceOps.INDEX),
        col("event_type"),
        col("value"))
      val left  = base.select(col(SequenceOps.STREAM), col(SequenceOps.INDEX), col("event_type"))
      val right = base.filter(col(SequenceOps.INDEX) % 10 === 0)
        .select(col(SequenceOps.STREAM), col(SequenceOps.INDEX), col("value").as("snap_value"))
      SequenceOps.asofJoin(left, right)
        .select(col(SequenceOps.STREAM).as("stream_id"), col(SequenceOps.INDEX).as("idx"),
          col("event_type"), col("snap_value"))
        .orderBy("stream_id", "idx")
    }),

    // the FORWARD direction (next snapshot at-or-after each row) over the
    // same streams — index reflection reuses the bucketed backward plan
    "seq_asof_forward" -> ((s, dir) => {
      val base = events(s, dir).select(
        (col("event_id") % 4).as(SequenceOps.STREAM),
        (col("event_id") / 4).cast("long").as(SequenceOps.INDEX),
        col("event_type"),
        col("value"))
      val left  = base.select(col(SequenceOps.STREAM), col(SequenceOps.INDEX), col("event_type"))
      val right = base.filter(col(SequenceOps.INDEX) % 10 === 0)
        .select(col(SequenceOps.STREAM), col(SequenceOps.INDEX), col("value").as("snap_value"))
      SequenceOps.asofJoinForward(left, right)
        .select(col(SequenceOps.STREAM).as("stream_id"), col(SequenceOps.INDEX).as("idx"),
          col("event_type"), col("snap_value"))
        .orderBy("stream_id", "idx")
    }),

    "seq_gather" -> ((s, dir) =>
      SequenceOps.gather(stream(s, dir), Seq(5L, 250L, 750L, 999L))
        .select(col("index"), col("event_type"))
        .orderBy("index")),

    "seq_repeat" -> ((s, dir) =>
      SequenceOps.repeat(SequenceOps.range(stream(s, dir), 0, 50), 3)
        .select(col("index"), col("event_type"))
        .orderBy("index")),

    "seq_repeat_null" -> ((s, dir) =>
      SequenceOps.repeatNull(SequenceOps.range(stream(s, dir), 0, 50), 3)
        .select(col("index"), col("event_type"))
        .orderBy("index")),

    "seq_slice_unslice" -> ((s, dir) => {
      val sliced = SequenceOps.slice(stream(s, dir), Partitioner.All(50))
      val ranged = sliced.filter(col(SequenceOps.INDEX) < 10) // per-slice Range(0,10)
      SequenceOps.unslice(ranged)
        .select(col("index"), col("event_type"))
        .orderBy("index")
    }),

    // window sum as explicit element adds (same left-to-right double order
    // as a fold, so oracle parity holds) — HOF aggregate() evaluates
    // interpreted, element_at stays in codegen
    "seq_stencil_sum" -> ((s, dir) =>
      SequenceOps.stencil(stream(s, dir), Seq(-1, 0, 1), "value")
        .select(col("index"),
          (lit(0.0) + element_at(col("window"), 1) + element_at(col("window"), 2)
            + element_at(col("window"), 3)).as("wsum"))
        .orderBy("index")),

    "seq_positional_join" -> ((s, dir) => {
      val base = stream(s, dir)
      SequenceOps.positionalJoin(Seq(base.drop("event_type"), blockSampled(base, 8, "v_block")))
        .select(col("index"), col("value").as("v"), col("v_block"))
        .orderBy("index")
    }),

    // variadic input binding (op.h:44-51, op.py:174-186): THREE aligned
    // sequences — the base stream plus two block-sampled derivations at
    // different rates — bound positionally into one relation
    "seq_variadic_join" -> ((s, dir) => {
      val base = stream(s, dir)
      SequenceOps.positionalJoin(Seq(base.drop("event_type"),
        blockSampled(base, 8, "v_b8"), blockSampled(base, 4, "v_b4")))
        .select(col("index"), col("value").as("v"), col("v_b8"), col("v_b4"))
        .orderBy("index")
    }),

    "seq_state_counter" -> ((s, dir) => {
      val withPayload = stream(s, dir)
        .withColumn("payload", encode(col("event_type"), "UTF-8"))
        .drop("event_type", "value")
      val sliced  = SequenceOps.slice(withPayload, Partitioner.All(100))
      val counted = Kernels.unboundedState(sliced, StdKernels.TestIncrement, sliced = true)
      val global  = SequenceOps.unslice(counted)
      import s.implicits._
      global.as[Elem]
        .map(e => (e.index, StdKernels.decodeI64(e.payload)))
        .toDF("index", "counter")
        .orderBy("index")
    }),

    "seq_bounded_state" -> ((s, dir) => {
      val withPayload = stream(s, dir)
        .withColumn("payload", encode(col("event_type"), "UTF-8"))
        .drop("event_type", "value")
      val out = Kernels.boundedState(withPayload, StdKernels.TestIncrement, 3,
        Some(Seq(0L, 10L, 25L, 26L, 27L, 500L, 501L)))
      import s.implicits._
      out.as[Elem]
        .map(e => (e.index, StdKernels.decodeI64(e.payload)))
        .toDF("index", "counter")
        .orderBy("index")
    }),

    // bounded state INSIDE Slice: warmup replay and state cold-starts scope
    // to each (stream, slice) group over slice-local indices (reference
    // per-slice warmup derivation `dag_analysis.cpp:1607-1620`). Requested
    // locals {0,5,100,101,249} with warmup 3 give the same counter vector
    // in every complete 250-row slice: fetch runs {0},{2..5},{97..101},
    // {246..249} cold-start at their gaps, so the counter at a requested
    // local is its position within its fetched run.
    "seq_bounded_state_sliced" -> ((s, dir) => {
      val withPayload = stream(s, dir)
        .withColumn("payload", encode(col("event_type"), "UTF-8"))
        .drop("event_type", "value")
      val sliced = SequenceOps.slice(withPayload, Partitioner.All(250))
      val out = Kernels.boundedState(sliced, StdKernels.TestIncrement, 3,
        Some(Seq(0L, 5L, 100L, 101L, 249L)), sliced = true)
      import s.implicits._
      out.as[Kernels.SlicedElem]
        .map(e => (e.sliceId, e.index, StdKernels.decodeI64(e.payload)))
        .toDF("slice_id", "idx", "counter")
        .orderBy("slice_id", "idx")
    })
  )

  val oracles: Map[String, String] = Map(
    "seq_stride" ->
      """SELECT event_id // 8 AS index, event_type FROM events
        |WHERE event_id % 8 = 0 ORDER BY index""".stripMargin,

    "seq_range" ->
      """SELECT event_id - 100 AS index, event_type FROM events
        |WHERE event_id >= 100 AND event_id < 400 ORDER BY index""".stripMargin,

    "seq_strided_ranges" ->
      """SELECT CASE WHEN event_id < 200 THEN event_id // 10
        |            ELSE 20 + (event_id - 500) // 10 END AS index, event_type
        |FROM events
        |WHERE (event_id >= 0 AND event_id < 200 AND event_id % 10 = 0)
        |   OR (event_id >= 500 AND event_id < 700 AND (event_id - 500) % 10 = 0)
        |ORDER BY index""".stripMargin,

    "seq_overlapping_ranges" ->
      """SELECT * FROM (
        |  SELECT event_id // 10 AS index, event_type FROM events
        |  WHERE event_id < 150 AND event_id % 10 = 0
        |  UNION ALL
        |  SELECT 15 + (event_id - 100) // 10 AS index, event_type FROM events
        |  WHERE event_id >= 100 AND event_id < 250 AND (event_id - 100) % 10 = 0)
        |ORDER BY index""".stripMargin,

    "seq_multistream" ->
      """WITH s AS (
        |  SELECT event_id % 4 AS sid, event_id // 4 AS idx,
        |         CAST(len(event_type) AS BIGINT) AS v
        |  FROM events),
        |f AS (
        |  SELECT sid, (idx - st) // stp AS nidx, v
        |  FROM s JOIN (VALUES (0, 0, 250, 2), (1, 50, 150, 5),
        |               (2, 0, 250, 10), (3, 100, 200, 25)) c(csid, st, en, stp)
        |    ON s.sid = c.csid
        |  WHERE idx >= st AND idx < en AND (idx - st) % stp = 0)
        |SELECT sid AS stream_id, nidx AS index,
        |       CAST(SUM(v) OVER (PARTITION BY sid ORDER BY nidx) AS BIGINT) AS cumsum
        |FROM f ORDER BY stream_id, index""".stripMargin,

    "seq_asof" ->
      """WITH s AS (
        |  SELECT event_id % 4 AS sid, event_id // 4 AS idx, event_type, value
        |  FROM events),
        |l AS (SELECT sid, idx, event_type FROM s),
        |r AS (SELECT sid, idx, value FROM s WHERE idx % 10 = 0)
        |SELECT l.sid AS stream_id, l.idx AS idx, l.event_type, r.value AS snap_value
        |FROM l ASOF LEFT JOIN r ON l.sid = r.sid AND l.idx >= r.idx
        |ORDER BY stream_id, idx""".stripMargin,

    // forward replay: the flipped inequality (earliest right at-or-after)
    "seq_asof_forward" ->
      """WITH s AS (
        |  SELECT event_id % 4 AS sid, event_id // 4 AS idx, event_type, value
        |  FROM events),
        |l AS (SELECT sid, idx, event_type FROM s),
        |r AS (SELECT sid, idx, value FROM s WHERE idx % 10 = 0)
        |SELECT l.sid AS stream_id, l.idx AS idx, l.event_type, r.value AS snap_value
        |FROM l ASOF LEFT JOIN r ON l.sid = r.sid AND l.idx <= r.idx
        |ORDER BY stream_id, idx""".stripMargin,

    "seq_gather" ->
      """SELECT CAST(t.pos AS BIGINT) AS index, e.event_type
        |FROM (VALUES (0, 5), (1, 250), (2, 750), (3, 999)) t(pos, src)
        |JOIN events e ON e.event_id = t.src
        |ORDER BY index""".stripMargin,

    "seq_repeat" ->
      """SELECT event_id * 3 + u AS index, event_type
        |FROM (SELECT event_id, event_type, unnest([0, 1, 2]) AS u
        |      FROM events WHERE event_id < 50)
        |ORDER BY index""".stripMargin,

    "seq_repeat_null" ->
      """SELECT event_id * 3 + u AS index,
        |       CASE WHEN u = 0 THEN event_type ELSE NULL END AS event_type
        |FROM (SELECT event_id, event_type, unnest([0, 1, 2]) AS u
        |      FROM events WHERE event_id < 50)
        |ORDER BY index""".stripMargin,

    "seq_slice_unslice" ->
      """SELECT (event_id // 50) * 10 + event_id % 50 AS index, event_type
        |FROM events WHERE event_id % 50 < 10 ORDER BY index""".stripMargin,

    "seq_stencil_sum" ->
      """SELECT event_id AS index,
        |       coalesce(lag(value) OVER w, value) + value
        |         + coalesce(lead(value) OVER w, value) AS wsum
        |FROM events WINDOW w AS (ORDER BY event_id) ORDER BY index""".stripMargin,

    "seq_positional_join" ->
      """SELECT e.event_id AS index, e.value AS v, b.value AS v_block
        |FROM events e JOIN events b ON b.event_id = (e.event_id // 8) * 8
        |ORDER BY index""".stripMargin,

    "seq_variadic_join" ->
      """SELECT e.event_id AS index, e.value AS v, b8.value AS v_b8, b4.value AS v_b4
        |FROM events e
        |JOIN events b8 ON b8.event_id = (e.event_id // 8) * 8
        |JOIN events b4 ON b4.event_id = (e.event_id // 4) * 4
        |ORDER BY index""".stripMargin,

    "seq_state_counter" ->
      """SELECT event_id AS index, event_id % 100 AS counter
        |FROM events ORDER BY index""".stripMargin,

    // the reference's own expected vector for warmup=3 cold-start replay
    // (py_test.py:407-423), extended with a second sparse run at 500
    "seq_bounded_state" ->
      """SELECT CAST(index AS BIGINT) AS index, CAST(counter AS BIGINT) AS counter
        |FROM (VALUES (0, 0), (10, 3), (25, 3), (26, 4), (27, 5), (500, 3), (501, 4))
        |  t(index, counter)
        |ORDER BY index""".stripMargin,

    // the per-slice counter vector is data-independent (TestIncrement reads
    // only the replay run shape), so the oracle derives it arithmetically
    // from the dense event_id domain: every slice that contains a requested
    // local yields the same counters {0:0, 5:3, 100:3, 101:4, 249:3}
    "seq_bounded_state_sliced" ->
      """SELECT event_id // 250 AS slice_id, event_id % 250 AS idx,
        |       CAST(CASE event_id % 250 WHEN 0 THEN 0 WHEN 5 THEN 3
        |            WHEN 100 THEN 3 WHEN 101 THEN 4 WHEN 249 THEN 3 END AS BIGINT)
        |         AS counter
        |FROM events
        |WHERE event_id % 250 IN (0, 5, 100, 101, 249)
        |ORDER BY slice_id, idx""".stripMargin
  )
}
