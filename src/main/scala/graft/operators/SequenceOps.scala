package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.Boundary

/** The reference engine's built-in stream operators (its entire "relational
  * algebra"): Sample (All/Strided/Range/Ranges/StridedRange/Gather), Space
  * (Repeat/RepeatNull), Slice, Unslice — `scanner/engine/sampler.cpp`,
  * `python/scannerpy/streams.py`, surveyed in SURVEY.md §2.2.
  *
  * Design for 100 TB: every sampler assumes (and preserves) a *dense* 0..N-1
  * per-stream `index`, which lets re-indexing after filtering be pure
  * arithmetic (`index/stride`, interval-offset sums) instead of a
  * `row_number()` window. All samplers are therefore narrow (no shuffle),
  * fully codegen'd projections/filters that Catalyst pushes into the scan.
  * Only `unslice` (which must discover runtime group lengths) and `stencil`
  * (which must gather neighbor rows) shuffle, each exactly once.
  */
object SequenceOps {
  val STREAM = "streamId"
  val INDEX  = "index"

  private def payloadCols(df: DataFrame): Seq[String] =
    df.columns.filter(c => c != STREAM && c != INDEX).toSeq

  /** Sample[All] — identity (`sampler.cpp:33-77`). */
  def all(df: DataFrame): DataFrame = df

  /** Sample[Strided]: keep every n-th element, re-densify indices
    * (`sampler.cpp:78-139`, `streams.py:90-120`).
    */
  def stride(df: DataFrame, n: Long): DataFrame = {
    require(n > 0, s"stride must be positive, got $n")
    df.filter(col(INDEX) % n === 0)
      .withColumn(INDEX, col(INDEX) / n cast "long")
  }

  /** Sample[Range]: keep [start, end), re-densify (`streams.py:122-178`). */
  def range(df: DataFrame, start: Long, end: Long): DataFrame =
    stridedRanges(df, Seq((start, end)), 1L)

  /** Sample[StridedRange] (`streams.py:180-238`). */
  def stridedRange(df: DataFrame, start: Long, end: Long, stride: Long): DataFrame =
    stridedRanges(df, Seq((start, end)), stride)

  /** Sample[Ranges] (`streams.py:240-286`). */
  def ranges(df: DataFrame, intervals: Seq[(Long, Long)]): DataFrame =
    stridedRanges(df, intervals, 1L)

  /** Sample[StridedRanges]: CONCATENATION of `[start, end)` intervals, each
    * strided; output re-indexed densely across the concatenation
    * (`sampler.cpp:140-264`). Concatenation, not union: the reference's
    * `get_upstream_rows` maps output segment j back through
    * `starts(j) + local*stride` independently per range, so a row covered
    * by two overlapping intervals appears TWICE in the output, at two
    * different output indices. Membership is therefore an (plan-time
    * constant) array that gets exploded — still a narrow, shuffle-free
    * projection; for disjoint intervals the array has at most one element.
    */
  def stridedRanges(df: DataFrame, intervals: Seq[(Long, Long)], stride: Long): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    require(intervals.nonEmpty, "at least one interval required")
    intervals.foreach { case (s, e) =>
      require(s >= 0 && e >= s, s"bad interval [$s,$e)")
    }
    // rows kept in interval j: ceil((e-s)/stride); offset_j = sum of earlier counts
    val counts  = intervals.map { case (s, e) => (e - s + stride - 1) / stride }
    val offsets = counts.scanLeft(0L)(_ + _)
    val idx     = col(INDEX)
    // overlap is decidable at plan time: when intervals are disjoint every
    // row has at most one membership, so skip the generator entirely and
    // emit a plain filter + CASE projection (fully codegen'd, no explode
    // operator in the plan)
    val disjoint = intervals.sortBy(_._1).sliding(2).forall {
      case Seq((_, e1), (s2, _)) => e1 <= s2
      case _                     => true
    }
    if (disjoint) {
      val keep = intervals.map { case (s, e) =>
        idx >= s && idx < e && (idx - s) % stride === 0
      }.reduce(_ || _)
      val newIdx = intervals.zip(offsets).foldRight(lit(-1L): Column) {
        case (((s, e), off), other) =>
          when(idx >= s && idx < e, lit(off) + (idx - s) / stride).otherwise(other)
      }
      df.filter(keep).withColumn(INDEX, newIdx.cast("long"))
    } else {
      val memberships = array(intervals.zip(offsets).map { case ((s, e), off) =>
        when(idx >= s && idx < e && (idx - s) % stride === 0,
          lit(off) + (idx - s) / stride).otherwise(lit(null))
      }: _*)
      df.withColumn("__ni", explode(filter(memberships, m => m.isNotNull)))
        .withColumn(INDEX, col("__ni").cast("long"))
        .drop("__ni")
    }
  }

  /** Per-stream sampler args — the reference's Job bindings run ONE graph
    * over N streams with per-stream sampling parameters
    * (`python/scannerpy/client.py:1434-1527`, `scanner/metadata.proto:182-187`,
    * stream-config test `py_test.py:339-348`). Spark-first realization: the
    * per-stream (start, end, stride) args are a broadcast config relation
    * joined on streamId — one narrow broadcast-hash-join, then the same
    * arithmetic filter/re-index as [[stridedRanges]]. Streams absent from
    * the config are dropped (a job binds only its listed streams).
    */
  def stridedRangePerStream(df: DataFrame, args: Map[Long, (Long, Long, Long)]): DataFrame = {
    require(args.nonEmpty, "at least one stream binding required")
    args.foreach { case (sid, (s, e, st)) =>
      require(s >= 0 && e >= s && st > 0, s"bad binding for stream $sid: [$s,$e) stride $st")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val cfg = args.toSeq.map { case (sid, (s, e, st)) => (sid, s, e, st) }
      .toDF(STREAM, "__s", "__e", "__st")
    df.join(broadcast(cfg), Seq(STREAM))
      .filter(col(INDEX) >= col("__s") && col(INDEX) < col("__e") &&
        (col(INDEX) - col("__s")) % col("__st") === 0)
      .withColumn(INDEX, ((col(INDEX) - col("__s")) / col("__st")).cast("long"))
      .drop("__s", "__e", "__st")
  }

  /** List sizes up to this run join-free through the native
    * `gather_lookup` expression (a primitive binary search per row inside
    * whole-stage codegen — O(log |list|), no boxing, no join operator), so
    * gather costs one scan like stride/range. The bound caps the constant
    * `long[]` tables embedded in the plan; past it a broadcast join
    * amortizes better anyway.
    */
  private val GatherLiteralMax = 100000

  /** Sample[Gather]: keep exactly the listed indices, in list order
    * (`sampler.cpp:265-336`, `streams.py:287-317`).
    *
    * The row list is a plan-time constant, so the common case (modest,
    * duplicate-free list) needs NO join operator at all: one
    * [[graft.plans.GatherLookup]] binary-search expression computes the
    * output position (null = not gathered), a null filter drops the rest —
    * scan-dominated at any stream size (BASELINE.md target 2). Duplicate
    * source indices (a row gathered to several output positions) or very
    * large lists fall back to the broadcast (position, index) join — still
    * no shuffle of the big side.
    */
  def gather(df: DataFrame, rows: Seq[Long]): DataFrame = {
    val distinct = rows.distinct
    if (rows.isEmpty) {
      // an empty (dynamically computed) list gathers nothing — same result
      // the join path always produced, without planning a join
      df.filter(lit(false))
    } else if (distinct.size == rows.size && rows.size <= GatherLiteralMax) {
      val sorted = rows.zipWithIndex.sortBy(_._1)
      val keys   = sorted.map(_._1).toArray
      val pos    = sorted.map(_._2.toLong).toArray
      // cast: gather_lookup binary-searches a long[]; int-typed indices
      // coerced here exactly as the join path's key equi-compare would
      df.withColumn("__ni", call_function("gather_lookup",
          col(INDEX).cast("long"), typedlit(keys), typedlit(pos)))
        .filter(col("__ni").isNotNull)
        .withColumn(INDEX, col("__ni"))
        .drop("__ni")
    } else {
      val spark = df.sparkSession
      import spark.implicits._
      val pick = rows.zipWithIndex
        .map { case (r, i) => (r, i.toLong) }
        .toDF(INDEX, "__newIndex")
      df.join(broadcast(pick), Seq(INDEX))
        .withColumn(INDEX, col("__newIndex"))
        .drop("__newIndex")
    }
  }

  /** Space[Repeat]: each element repeated k times, dense re-index
    * (`sampler.cpp:400-463`, behavior test `py_test.py:310-322`).
    */
  def repeat(df: DataFrame, k: Long): DataFrame = {
    require(k > 0, s"spacing must be positive, got $k")
    df.withColumn("__pos", explode(sequence(lit(0L), lit(k - 1))))
      .withColumn(INDEX, col(INDEX) * k + col("__pos"))
      .drop("__pos")
  }

  /** Space[RepeatNull]: expand ×k, output i maps to input i/k when i%k==0,
    * otherwise a null element (`sampler.cpp:337-399`, `py_test.py:324-336`).
    */
  def repeatNull(df: DataFrame, k: Long): DataFrame = {
    require(k > 0, s"spacing must be positive, got $k")
    val pays = payloadCols(df)
    val nulled = pays.foldLeft(
      df.withColumn("__pos", explode(sequence(lit(0L), lit(k - 1))))
        .withColumn(INDEX, col(INDEX) * k + col("__pos"))
    ) { (d, c) =>
      d.withColumn(c, when(col("__pos") === 0, col(c)).otherwise(lit(null)))
    }
    nulled.drop("__pos")
  }

  // ---------------------------------------------------------------- slices

  /** A slice partitioner maps a dense per-stream index to zero or more
    * (sliceId, localIndex) memberships — reference `DomainSampler`/
    * `Partitioner` (`sampler.cpp:505-741`, `python/scannerpy/partitioner.py`).
    * Groups may overlap (reference test `py_test.py:361-375`), so membership
    * is an array that gets exploded.
    */
  sealed trait Partitioner
  object Partitioner {
    /** partitioner.all(groupSize): contiguous chunks (`partitioner.py:15-25`,
      * default group 250). */
    final case class All(groupSize: Long) extends Partitioner
    /** strided domain chunked into groups (`sampler.cpp:505-741`). */
    final case class Strided(stride: Long, groupSize: Long) extends Partitioner
    /** explicit, possibly overlapping [start,end) groups. */
    final case class Ranges(intervals: Seq[(Long, Long)]) extends Partitioner
    /** explicit index lists per group. */
    final case class Gather(groups: Seq[Seq[Long]]) extends Partitioner
  }

  val SLICE = "sliceId"

  /** Slice: partition a sequence into independent substreams; downstream
    * stateful/stenciled ops key by (streamId, sliceId) and use the re-based
    * dense `index` within each slice (`scanner/engine/slice_op.cpp`,
    * `dag_analysis.cpp:168-182`). Narrow for All/Strided (pure arithmetic);
    * membership-explode for Ranges/Gather.
    */
  def slice(df: DataFrame, p: Partitioner): DataFrame = p match {
    case Partitioner.All(g) =>
      require(g > 0)
      df.withColumn(SLICE, (col(INDEX) / g).cast("long"))
        .withColumn(INDEX, col(INDEX) % g)
    case Partitioner.Strided(s, g) =>
      require(s > 0 && g > 0)
      df.filter(col(INDEX) % s === 0)
        .withColumn("__d", (col(INDEX) / s).cast("long"))
        .withColumn(SLICE, (col("__d") / g).cast("long"))
        .withColumn(INDEX, col("__d") % g)
        .drop("__d")
    case Partitioner.Ranges(intervals) =>
      val idx = col(INDEX)
      val memberships = array(intervals.zipWithIndex.map { case ((s, e), gid) =>
        when(idx >= s && idx < e,
          struct(lit(gid.toLong).as("g"), (idx - s).as("l")))
          .otherwise(lit(null))
      }: _*)
      df.withColumn("__m", explode(filter(memberships, m => m.isNotNull)))
        .withColumn(SLICE, col("__m.g"))
        .withColumn(INDEX, col("__m.l"))
        .drop("__m")
    case Partitioner.Gather(groups) =>
      val spark = df.sparkSession
      import spark.implicits._
      val members = for {
        (rows, gid) <- groups.zipWithIndex
        (r, l)      <- rows.zipWithIndex
      } yield (r, gid.toLong, l.toLong)
      val m = members.toDF(INDEX, SLICE, "__l")
      df.join(broadcast(m), Seq(INDEX))
        .withColumn(INDEX, col("__l"))
        .drop("__l")
  }

  /** Unslice: concatenate substreams back into one dense sequence — ordered
    * UNION ALL with offset re-indexing (`unslice_op.cpp`, row remap
    * `dag_analysis.cpp:1571-1597`). Group lengths are discovered at runtime
    * (downstream per-slice ops may have changed them): one aggregation on
    * (stream, slice) — tiny output, #groups rows — a cumulative-offset
    * window over that tiny side, then a broadcast-friendly equi-join back.
    */
  def unslice(df: DataFrame): DataFrame = {
    val lens = df.groupBy(col(STREAM), col(SLICE)).agg(count(lit(1)).as("__len"))
    val w = Window.partitionBy(col(STREAM)).orderBy(col(SLICE))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = lens.withColumn("__off", coalesce(sum(col("__len")).over(w), lit(0L)))
      .drop("__len")
    df.join(broadcast(offs), Seq(STREAM, SLICE))
      .withColumn(INDEX, col("__off") + col(INDEX))
      .drop("__off", SLICE)
  }

  // --------------------------------------------------------------- stencil

  /** the Error-mode message both stencil plans raise (kept in one place —
    * specs and operators match on this text)
    */
  private def boundaryRaise(idxCol: Column): Column =
    raise_error(concat(
      lit("stencil boundary violation (Error mode) at stream="),
      col(STREAM).cast("string"), lit(" index="), idxCol.cast("string")))

  /** Stencil: for each output row r, gather input rows {r+s | s ∈ offsets}
    * into an ordered array column `windowCol` (reference kernel attribute,
    * `scanner/api/op.h:78-82`; row derivation `dag_analysis.cpp:1634-1643`;
    * boundary conditions `dag_analysis.cpp:1446-1469`).
    *
    * Scale design: NOT a `Window.partitionBy(streamId)` (that serializes
    * each stream into one task — fatal for a single 100 TB stream). The
    * default plan is [[stencilHalo]] — one ~1× shuffle of bucketed rows
    * plus a bounded halo, independent of window width (measured 2-3×
    * faster than the explode plan even at width 3, and width-independent
    * beyond). [[stencilExplode]] remains for payloads too large for a
    * bucket of rows to sit in task memory.
    */
  def stencil(
      df: DataFrame,
      offsets: Seq[Int],
      payloadCol: String,
      boundary: Boundary = Boundary.RepeatEdge,
      windowCol: String = "window",
      bucketWidth: Long = 1 << 16): DataFrame = {
    require(offsets.nonEmpty, "stencil needs at least one offset")
    // auto-grow the bucket for extreme offsets so every offset set the
    // explode plan accepted still works through the default path
    val need = 2 * offsets.map(o => math.abs(o.toLong)).max + 1
    val bw   = if (bucketWidth > need) bucketWidth
               else java.lang.Long.highestOneBit(need) * 2
    stencilHalo(df, offsets, payloadCol, boundary, windowCol, bw)
  }

  /** Explode-plan stencil: each producer row explodes to the (few) target
    * indices that read it, then one hash aggregation on (streamId,
    * targetIndex) assembles the window. Shuffle volume is |offsets| × row
    * payload — worse than [[stencilHalo]] — but the aggregation streams
    * and spills, so per-task memory stays O(1) rows: the right variant
    * when a bucketWidth of payload rows cannot fit in task memory (e.g.
    * megapixel frames with a wide window).
    */
  def stencilExplode(
      df: DataFrame,
      offsets: Seq[Int],
      payloadCol: String,
      boundary: Boundary = Boundary.RepeatEdge,
      windowCol: String = "window"): DataFrame = {
    require(offsets.nonEmpty, "stencil needs at least one offset")
    val maxI = "__maxIdx"
    // per-stream max index: tiny aggregate (one row per stream), broadcast back
    val lens = df.groupBy(col(STREAM)).agg(max(col(INDEX)).as(maxI))
    val dfl  = df.join(broadcast(lens), Seq(STREAM))

    val idx = col(INDEX)
    val mx  = col(maxI)
    // Interior rows (the overwhelming majority) serve exactly one target
    // per slot — t = idx - s — so their membership array is a plain
    // constant-shape array(struct(...)): fully codegen'd, no per-row
    // ArrayData churn. Clamped (range) reads can only be served by the two
    // EDGE rows of a stream (source = clamp(t+s, 0, max) hits 0 or max
    // only there), so only those ≤2 rows per stream pay the
    // sequence/transform machinery (HOFs evaluate interpreted — routing
    // 10M interior rows through them dominated the stencil bench).
    val interior = array(offsets.zipWithIndex.map { case (s, slot) =>
      struct((idx - s).cast("long").as("t"), lit(slot).as("s"))
    }: _*)
    // for each slot s: contiguous target range [lo, hi] of rows that read
    // this producer row (clamped reads collapse onto edge rows)
    val slotTargets = offsets.zipWithIndex.map { case (s, slot) =>
      val (lo, hi) = boundary match {
        case Boundary.RepeatEdge =>
          (when(idx === 0, lit(0L)).otherwise(idx - s),
           when(idx === mx, mx).otherwise(idx - s))
        case _ => (idx - s, idx - s)
      }
      val loC = greatest(lo, lit(0L))
      val hiC = least(hi, mx)
      when(loC <= hiC,
        transform(sequence(loC, hiC), r => struct(r.as("t"), lit(slot).as("s"))))
        .otherwise(array().cast("array<struct<t:long,s:int>>"))
    }
    // the 1→1 contract: every input row is also ITS OWN target (sentinel
    // slot -1, matching no window slot) — producer membership alone drops
    // edge windows no producer serves (one-sided offset sets under
    // NullFill/Error lose the first/last rows; randomized-model pinned)
    val selfTarget = array(struct(idx.cast("long").as("t"), lit(-1).as("s")))
    val membership = concat(boundary match {
      case Boundary.RepeatEdge =>
        when(idx =!= 0 && idx =!= mx, interior)
          .otherwise(flatten(array(slotTargets: _*)))
      case _ => interior
    }, selfTarget)
    val exploded = dfl
      .withColumn("__tgt", explode(membership))
      // out-of-domain targets from near-edge interior rows (and NullFill/
      // Error everywhere) drop here; edge-row ranges arrive pre-clamped
      .filter(col("__tgt.t") >= 0 && col("__tgt.t") <= mx)
      .select(col(STREAM), col("__tgt.t").as("__t"), col("__tgt.s").as("__s"),
        col(payloadCol).as("__p"))

    // Window assembly as per-slot conditional aggregates, NOT
    // collect_list + map_from_entries: each (target, slot) receives at
    // most one source row, so `max(when(slot==k, payload))` reconstructs
    // slot k exactly — and for primitive payloads the whole aggregation
    // stays a codegen'd HashAggregate (the list/map route is an
    // object-based aggregate: boxed rows, GC pressure, ~5x slower at the
    // 10M-row bench scale). `__n` counts present slots for Error mode
    // (count(1), not count(payload): a legitimately-null payload is
    // still a present neighbor).
    val slotAggs = offsets.indices.map(k =>
      max(when(col("__s") === k, col("__p"))).as(s"__w$k")) :+
      count(when(col("__s") >= 0, lit(1))).as("__n") // sentinel rows don't count as neighbors
    val grouped = exploded
      .groupBy(col(STREAM), col("__t"))
      .agg(slotAggs.head, slotAggs.tail: _*)

    val windowArr = array(offsets.indices.map(k => col(s"__w$k")): _*)
    val checked = boundary match {
      case Boundary.Error =>
        when(col("__n") === offsets.size, windowArr).otherwise(boundaryRaise(col("__t")))
      case _ => windowArr
    }
    grouped
      .withColumn(windowCol, checked)
      .select(col(STREAM), col("__t").as(INDEX), col(windowCol))
  }

  /** Halo-exchange stencil — same semantics as [[stencil]], different
    * physical shape for WIDE windows: instead of exploding every producer
    * row to its |offsets| targets (shuffle volume |offsets| × payload),
    * rows bucket on `index div bucketWidth`, each row is copied into at
    * most TWO buckets (its own plus the neighbor its border targets live
    * in — the halo), and one sorted-group pass per (stream, bucket)
    * assembles windows from an in-memory index map. Shuffle volume is ~1×
    * payload regardless of window width, so a 65-frame optical-flow
    * stencil shuffles 65× less than the explode plan. Memory per task is
    * bounded by bucketWidth + span rows.
    *
    * This is [[stencil]]'s default plan (measured faster than the explode
    * plan at every width); [[stencilExplode]] is the spill-tolerant
    * variant for oversized payloads.
    */
  def stencilHalo(
      df: DataFrame,
      offsets: Seq[Int],
      payloadCol: String,
      boundary: Boundary = Boundary.RepeatEdge,
      windowCol: String = "window",
      bucketWidth: Long = 1 << 16): DataFrame = {
    require(offsets.nonEmpty, "stencil needs at least one offset")
    val maxOff = offsets.max.toLong
    val minOff = offsets.min.toLong
    require((bucketWidth & (bucketWidth - 1)) == 0,
      s"bucketWidth must be a power of two, got $bucketWidth")
    require(bucketWidth > 2 * offsets.map(o => math.abs(o.toLong)).max,
      "bucketWidth must exceed twice the largest offset")
    // the typed group pass reads these as primitives — fail with a clear
    // message instead of a mid-job ClassCastException
    require(df.schema(STREAM).dataType == org.apache.spark.sql.types.LongType &&
      df.schema(INDEX).dataType == org.apache.spark.sql.types.LongType,
      s"stencilHalo requires bigint $STREAM/$INDEX (the sequence model's key " +
        s"types); cast first or use stencilExplode for other key types")
    val bits = java.lang.Long.numberOfTrailingZeros(bucketWidth)

    val maxI = "__mx"
    val lens = df.groupBy(col(STREAM)).agg(max(col(INDEX)).as(maxI))
    val dfl  = df.join(broadcast(lens), Seq(STREAM))
    val idx  = col(INDEX)
    val mx   = col(maxI)
    // reach of a producer row = [lowest, highest] target it can serve
    // (edge rows widen to their clamped ranges); membership = the 1-2
    // buckets covering that reach. Over-approximation for non-contiguous
    // offset sets is harmless — it only copies a row into a bucket that
    // ignores it.
    val tLo = when(idx === 0, lit(0L)).otherwise(greatest(idx - maxOff, lit(0L)))
    val tHi = when(idx === mx, mx).otherwise(least(idx - minOff, mx))
    // a near-edge row can serve NO targets (tHi < tLo, e.g. idx=0 with
    // all-positive offsets under NullFill) — emit no membership rather
    // than let sequence() count downward into spurious negative buckets
    val buckets = when(tLo <= tHi,
      sequence(shiftright(tLo, bits), shiftright(tHi, bits)))
      .otherwise(array().cast("array<bigint>"))
    val keyed = dfl.withColumn("__b", explode(buckets))

    val iPos   = keyed.schema.fieldIndex(INDEX)
    val mxPos  = keyed.schema.fieldIndex(maxI)
    val pPos   = keyed.schema.fieldIndex(payloadCol)
    val sPos   = keyed.schema.fieldIndex(STREAM)
    val bPos   = keyed.schema.fieldIndex("__b")
    val nSlots = offsets.size
    val offs   = offsets.toArray
    val bnd    = boundary
    val bw     = bucketWidth
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      df.schema(STREAM),
      org.apache.spark.sql.types.StructField(INDEX,
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField(windowCol,
        org.apache.spark.sql.types.ArrayType(df.schema(payloadCol).dataType,
          containsNull = true)),
      org.apache.spark.sql.types.StructField("__n",
        org.apache.spark.sql.types.IntegerType, nullable = false)))

    val raw = keyed
      .groupByKey(r => (r.getLong(sPos), r.getLong(bPos)))(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .flatMapSortedGroups(col(INDEX)) { (key: (Long, Long), it: Iterator[Row]) =>
        val rows = it.toVector // bounded by bucketWidth + halo
        val mxv  = rows.head.getLong(mxPos)
        val byIdx = new java.util.HashMap[Long, AnyRef](rows.size * 2)
        rows.foreach(r => byIdx.put(r.getLong(iPos), r.get(pPos).asInstanceOf[AnyRef]))
        val bktLo = key._2 << bits
        val bktHi = math.min(bktLo + bw - 1, mxv)
        // exact served-target set (per slot, not per reach-range: offset
        // sets may be non-contiguous) — identical to the explode plan's
        // membership arrays
        val targets = new java.util.TreeSet[java.lang.Long]()
        rows.foreach { r =>
          val p = r.getLong(iPos)
          // the 1→1 contract: every input row IS a target — producer
          // reach alone drops edge windows no producer serves (one-sided
          // offset sets under NullFill/Error lose the first/last |min|/
          // |max| rows; caught by the randomized ground-truth model)
          if (p >= bktLo && p <= bktHi) targets.add(p)
          var k = 0
          while (k < nSlots) {
            val s = offs(k)
            var lo = if (bnd == Boundary.RepeatEdge && p == 0L) 0L else p - s
            var hi = if (bnd == Boundary.RepeatEdge && p == mxv) mxv else p - s
            lo = math.max(math.max(lo, 0L), bktLo)
            hi = math.min(math.min(hi, mxv), bktHi)
            var t = lo
            while (t <= hi) { targets.add(t); t += 1 }
            k += 1
          }
        }
        // lazy map over the target set: output rows stream out instead of
        // buffering a second bucket-sized collection next to the input
        import scala.jdk.CollectionConverters._
        targets.iterator().asScala.map { tBoxed =>
          val t   = tBoxed.longValue()
          val arr = new Array[Any](nSlots)
          var n   = 0
          var k   = 0
          while (k < nSlots) {
            val srcRaw = t + offs(k)
            val src = bnd match {
              case Boundary.RepeatEdge => math.min(math.max(srcRaw, 0L), mxv)
              case _                   => srcRaw
            }
            val hit = src >= 0 && src <= mxv && byIdx.containsKey(src)
            if (hit) n += 1
            arr(k) = if (hit) byIdx.get(src) else null
            k += 1
          }
          Row(key._1, t, arr.toSeq, n)
        }
      }(Encoders.row(outSchema))
      .toDF()

    // Error mode checks as a lazily-evaluated column, exactly like the
    // explode plan: downstream sampling (a filter on index) defines WHICH
    // targets are requested, and only requested targets may raise — the
    // reference derives the checked task set from downstream rows the same
    // way (dag_analysis.cpp:1446-1469)
    val checked = boundary match {
      case Boundary.Error =>
        when(col("__n") === offsets.size, col(windowCol)).otherwise(boundaryRaise(col(INDEX)))
      case _ => col(windowCol)
    }
    raw.withColumn(windowCol, checked).drop("__n")
  }

  // --------------------------------------------------- multi-input binding

  /** The reference binds several aligned input sequences positionally into a
    * multi-input kernel (`python/scannerpy/op.py:174-186`) — an implicit
    * equi-join on (streamId, index). Exposed explicitly.
    */
  def positionalJoin(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce((a, b) => a.join(b, Seq(STREAM, INDEX)))

  /** Dense re-index fallback for inputs whose `index` is not known dense
    * (after arbitrary filters). One shuffle per call; samplers above never
    * need it.
    */
  def reindexDense(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(STREAM)).orderBy(col(INDEX))
    df.withColumn(INDEX, row_number().over(w).cast("long") - 1)
  }

  /** As-of join: attach to each left row the LATEST right row of the same
    * stream with `right.index <= left.index` (null struct fields if none) —
    * sequence alignment for mixed-rate streams (sparse annotations, config
    * snapshots, embedding checkpoints joined to a dense event/frame
    * stream). The reference has no such operator (SURVEY.md §2.5 honest-gap
    * map: positional equi-join only); this is the training-data-pipeline
    * extension expressed Spark-first.
    *
    * Scale design — intra-stream parallel, never one-task-per-stream:
    *  1. Both sides bucket on `index div bucketWidth`; the fill window
    *     partitions on (stream, bucket), so a single multi-TB stream spreads
    *     over #buckets tasks instead of serializing into one.
    *  2. A TINY bucket-level pass computes each bucket's carry-in snapshot
    *     (the latest right row from strictly-earlier buckets): right rows
    *     aggregate to one row per non-empty bucket (`max_by`), and a
    *     per-stream window over those aggregates — data/bucketWidth rows,
    *     the only per-stream-serial step — carries the last snapshot
    *     forward. Carry-ins are injected as synthetic right rows at the
    *     bucket's first index, sorting before any real row of the bucket.
    *  3. One union + ONE sort-shuffle on (stream, bucket), a running
    *     `last(ignoreNulls)` fill ordered by (index, side) with
    *     carry-before-right-before-left at equal index, and a side filter.
    * No per-row probe join, no range explosion. Right values travel as one
    * struct so legitimately-null right fields survive the ignoreNulls fill.
    *
    * `bucketWidth <= 0` selects the single-window fallback (parallelism =
    * #streams) — only sensible for many-small-streams corpora.
    */
  def asofJoin(left: DataFrame, right: DataFrame, bucketWidth: Long = 1 << 20): DataFrame = {
    val keyCols   = Seq(STREAM, INDEX)
    val leftVals  = left.columns.filterNot(keyCols.contains).toSeq
    val rightVals = right.columns.filterNot(keyCols.contains).toSeq
    require(rightVals.nonEmpty, "right side needs at least one value column")
    require(leftVals.intersect(rightVals).isEmpty,
      s"overlapping value columns: ${leftVals.intersect(rightVals).mkString(",")}")
    val rStruct  = right.select(col(STREAM), col(INDEX),
      struct(rightVals.map(col): _*).as("__r"))
    val snapType = rStruct.schema("__r").dataType
    def out(filled: DataFrame): DataFrame = filled
      .filter(col("__side") === 1)
      .select((keyCols ++ leftVals).map(col) ++
        rightVals.map(v => col(s"__rf.$v").as(v)): _*)

    if (bucketWidth <= 0) {
      // fallback: one running fill per stream (reference stateful-op shape)
      val r = rStruct.withColumn("__side", lit(0))
      val l = left.withColumn("__r", lit(null).cast(snapType)).withColumn("__side", lit(1))
      val w = Window.partitionBy(col(STREAM)).orderBy(col(INDEX), col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      out(l.unionByName(r, allowMissingColumns = true)
        .withColumn("__rf", last(col("__r"), ignoreNulls = true).over(w)))
    } else {
      // `div` (not `/`): long division must stay integral past 2^53
      val bkt = expr(s"$INDEX div $bucketWidth")
      val lb  = left.withColumn("__bkt", bkt)
      val rb  = rStruct.withColumn("__bkt", bkt)
      // one row per non-empty right bucket: its latest snapshot
      val rAgg = rb.groupBy(col(STREAM), col("__bkt"))
        .agg(max_by(col("__r"), col(INDEX)).as("__snap"))
      // bucket-level as-of: for each LEFT bucket, the latest snapshot of any
      // strictly-earlier right bucket. Left markers sort before right
      // aggregates within a bucket, so the running last() at a marker sees
      // only earlier buckets. Tiny relation: one row per non-empty bucket.
      val marks = lb.select(col(STREAM), col("__bkt")).distinct()
        .withColumn("__snap", lit(null).cast(snapType))
        .withColumn("__m", lit(0))
      val wB = Window.partitionBy(col(STREAM)).orderBy(col("__bkt"), col("__m"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val carry = marks.unionByName(rAgg.withColumn("__m", lit(1)))
        .withColumn("__carry", last(col("__snap"), ignoreNulls = true).over(wB))
        .filter(col("__m") === 0 && col("__carry").isNotNull)
        .select(col(STREAM), col("__bkt"), col("__carry"))
      // synthetic carry rows at the bucket's first index, side -1 so a real
      // right row at that same index supersedes them in the fill order
      val carryRows = carry.select(col(STREAM),
        (col("__bkt") * bucketWidth).cast("long").as(INDEX), col("__bkt"),
        col("__carry").as("__r"), lit(-1).as("__side"))
      val rRows = rb.withColumn("__side", lit(0))
      val lRows = lb.withColumn("__r", lit(null).cast(snapType)).withColumn("__side", lit(1))
      val wF = Window.partitionBy(col(STREAM), col("__bkt"))
        .orderBy(col(INDEX), col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      out(lRows.unionByName(rRows.unionByName(carryRows), allowMissingColumns = true)
        .withColumn("__rf", last(col("__r"), ignoreNulls = true).over(wF)))
    }
  }

  /** FORWARD as-of join — each left row takes the EARLIEST right row
    * at-or-after its index (pandas merge_asof direction='forward'; the
    * next-snapshot attribution query). Implemented as [[asofJoin]] on
    * REFLECTED indices (idx' = 2^62 - idx): the whole bucketed-carry
    * machinery, its intra-stream parallelism, and the equal-index
    * inclusivity carry over unchanged, with zero duplicated window
    * logic. Requires 0 <= index < 2^62 (any real sequence).
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
      bucketWidth: Long = 1 << 20): DataFrame = {
    val pivot = 1L << 62
    def refl(df: DataFrame): DataFrame =
      df.withColumn(INDEX, (lit(pivot) - col(INDEX)).cast("long"))
    refl(asofJoin(refl(left), refl(right), bucketWidth))
  }
}
