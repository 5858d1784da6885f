package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
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
  * across retries. Elements that arrive ahead of the cursor are buffered
  * in state and drained in index order once the gap fills; duplicates
  * (index < cursor, or already buffered) are dropped deterministically.
  */
object StreamingOps {

  /** (kernel state, next expected dense index, out-of-order buffer)
    * carried across micro-batches. `pending` holds ahead-of-cursor
    * elements until the gap fills — bounded in practice by the source's
    * out-of-orderness, the analog of a watermark's lateness bound.
    */
  final case class KernelState[S](s: S, nextIndex: Long, pending: Map[Long, Array[Byte]])

  /** Apply an unbounded-state kernel to a streaming Dataset[Elem].
    * Elements carry dense per-stream indices (the sequence model); each
    * micro-batch is sorted, the cursor advances over contiguous indices,
    * and ahead-of-cursor arrivals wait in `pending`.
    *
    * `maxPending` bounds the out-of-order buffer per stream — the lateness
    * bound of this operator, in the same spirit as a watermark. A
    * permanently missing index would otherwise grow state without limit
    * while emission stalls silently; instead the query FAILS LOUDLY when a
    * stream accumulates more than `maxPending` ahead-of-cursor elements
    * (the batch engine's Error-boundary idiom: corrupt input is an error,
    * not a hang). Size it to the source's real out-of-orderness — e.g.
    * partition count × max in-flight per partition.
    */
  def unboundedState[S](ds: Dataset[Elem], kernel: StatefulKernel[S],
      maxPending: Int = 10000): Dataset[Elem] = {
    require(maxPending > 0, s"maxPending must be positive, got $maxPending")
    // Kryo for the generic state (no TypeTag for S at this call site);
    // state lives in the state store, never in a shuffled relation, so an
    // opaque binary encoder costs nothing in plan quality.
    implicit val stateEnc: Encoder[KernelState[S]] = Encoders.kryo[KernelState[S]]
    implicit val outEnc: Encoder[Elem]             = Encoders.product[Elem]
    ds.groupByKey(_.streamId)(Encoders.scalaLong)
      .flatMapGroupsWithState[KernelState[S], Elem](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (streamId: Long, it: Iterator[Elem], state: GroupState[KernelState[S]]) =>
          var st  = state.getOption.getOrElse(KernelState(kernel.init, 0L, Map.empty))
          val out = Vector.newBuilder[Elem]
          def emit(index: Long, payload: Array[Byte]): Unit = {
            val (s2, result) = kernel.update(st.s, index, payload)
            out += Elem(streamId, index, result)
            st = st.copy(s = s2, nextIndex = index + 1)
          }
          def drain(): Unit =
            while (st.pending.contains(st.nextIndex)) {
              val p = st.pending(st.nextIndex)
              st = st.copy(pending = st.pending - st.nextIndex)
              emit(st.nextIndex, p)
            }
          it.toSeq.sortBy(_.index).foreach { e =>
            if (e.index == st.nextIndex) { emit(e.index, e.payload); drain() }
            else if (e.index > st.nextIndex && !st.pending.contains(e.index)) {
              if (st.pending.size >= maxPending)
                throw new IllegalStateException(
                  s"stream $streamId: out-of-order buffer exceeded maxPending=" +
                    s"$maxPending waiting for index ${st.nextIndex} " +
                    s"(${st.pending.size} buffered, saw ${e.index}) — the gap " +
                    "never filled; raise maxPending or fix the source")
              st = st.copy(pending = st.pending + (e.index -> e.payload))
            }
            // else: duplicate behind the cursor — drop (idempotent replay)
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming exact dedup: the batch keeper-set semantics
    * ([[graft.functions.Dedup.dedupedIds]]) extended to unbounded arrival —
    * the FIRST document with a given normalized fingerprint passes, every
    * later duplicate drops, across micro-batches (fingerprint state lives
    * in the state store). Pass `tsCol`+`watermark` to bound that state:
    * `dropDuplicatesWithinWatermark` lets the engine expire fingerprints
    * older than the lateness bound, which is the 100 TB-stream shape —
    * unbounded distinct fingerprints otherwise grow state forever, the
    * same wall [[unboundedState]]'s `maxPending` guards against.
    */
  def streamingDedup(docs: DataFrame, textCol: String,
      tsCol: Option[String] = None, watermark: Option[String] = None): DataFrame = {
    val fp = docs.withColumn("fp", md5(col(textCol)))
    (tsCol, watermark) match {
      case (Some(ts), Some(wm)) =>
        fp.withWatermark(ts, wm).dropDuplicatesWithinWatermark("fp")
      case (None, None) => fp.dropDuplicates("fp")
      case _ => throw new IllegalArgumentException(
        "tsCol and watermark must be provided together")
    }
  }

  /** Streaming near-duplicate candidate pairs: the batch LSH band join
    * ([[graft.functions.Dedup]]) as a watermarked stream-stream self-join.
    * Each arriving document expands to its band keys (stateless, the same
    * minhash/band expressions as batch); the self-join on band key emits
    * (a, b) candidates whose event times lie within `joinWindow` of each
    * other — the horizon both sides' state is kept for, so the state store
    * holds only the banded rows of one window, not the whole stream. Pair
    * order (a < b) dedups the symmetric match; downstream either verifies
    * exactly (batch-side join) or keeps first-arrival per pair.
    *
    * This is the 100 TB streaming-dedup shape: band keys cut the join
    * space exactly as in batch, and the watermark bounds state where the
    * batch job's persist() would otherwise be unbounded arrival.
    */
  def streamingBandPairs(docs: DataFrame, idCol: String, bandCol: String,
      tsCol: String, watermark: String, joinWindow: String): DataFrame = {
    val l = docs.select(col(idCol).as("a"), col(bandCol).as("bk"),
      col(tsCol).as("ts_a")).withWatermark("ts_a", watermark)
    val r = docs.select(col(idCol).as("b"), col(bandCol).as("bk_r"),
      col(tsCol).as("ts_b")).withWatermark("ts_b", watermark)
    l.join(r,
      col("bk") === col("bk_r") && col("a") < col("b") &&
        col("ts_b") >= col("ts_a") - expr(s"INTERVAL $joinWindow") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $joinWindow"))
      .select(col("a"), col("b"), col("bk"))
  }

  /** The streaming half of INCREMENTAL dedup: arriving documents probe the
    * PERSISTED corpus band index
    * ([[graft.functions.Dedup.lshWriteBandIndex]]) through a
    * stream-static equi-join — each micro-batch bands its own rows (pure
    * row expressions, no aggregation state) and joins the static index;
    * corpus signatures are data, never recomputation, and the static side
    * holds NO stream state at all. Emits (id, dup_of) per
    * corpus collision — dedup-against-history with per-batch latency,
    * complementing [[streamingBandPairs]]'s within-window pairs. `k` and
    * `rows` must match the index build.
    */
  def streamingIndexProbe(docs: DataFrame, index: DataFrame, idCol: String,
      textCol: String, k: Int = 8, rows: Int = 4): DataFrame = {
    import graft.functions.Dedup
    // the index's per-id band array, built ONCE (static side — cache so
    // micro-batches reuse it); sort_array orders by band, aligning
    // positionally with the stream side's bandKeyStructs array
    val idxArr = graft.CacheScope.cache(index.groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("band"), col("bk")))).as("bands_i")))
    val idxFlat = idxArr
      .select(col("id").as("dup_of"), col("bands_i"), explode(col("bands_i")).as("bb"))
      .select(col("dup_of"), col("bands_i"),
        col("bb.band").as("band"), col("bb.bk").as("bk"))
    val banded = docs
      .withColumn("__sh", Dedup.shingleSet(col(textCol)))
      .filter(size(col("__sh")) >= 1)
      .withColumn("__bands", Dedup.bandKeyStructs(col("__sh"), k, rows))
      .select(col(idCol).as("id"), col("__bands"),
        explode(col("__bands")).as("bb"))
      .select(col("id"), col("__bands"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    // a pair colliding in SEVERAL bands emits once, from its first shared
    // band — the stateless dedup trick of [[streamingNearDupPairs]] (a
    // streaming dropDuplicates here would grow state without bound)
    val firstShared = array_min(zip_with(col("__bands"), col("bands_i"),
      (x, y) => when(x.getField("bk") === y.getField("bk"), x.getField("band"))))
    banded
      .join(idxFlat, Seq("band", "bk"))
      .filter(col("id") =!= col("dup_of"))
      .filter(col("band") === firstShared)
      .select(col("id"), col("dup_of"))
  }

  /** Streaming near-duplicate detection END-TO-END in one composed call:
    * text → minhash band keys → watermarked band self-join → exact
    * Jaccard verify — the full batch `dedup_lsh_pairs`+`dedup_jaccard`
    * pipeline over unbounded arrival. Returns verified
    * (a, b, inter, uni, jac) pairs whose event times lie within
    * `joinWindow` of each other and whose exact 2-gram Jaccard clears
    * `minJaccard`.
    *
    * Composition notes (the 100 TB streaming shape):
    *  - Banding is [[graft.functions.Dedup.bandKeyStructs]] — a pure row
    *    expression (no aggregation state), value-identical to batch.
    *  - The band self-join is the ONLY stateful operator: watermark +
    *    time-range condition bound both sides' state to one window.
    *  - The shingle set rides the banded row, so the verify is a column
    *    expression on the joined pair — no re-join to fetch text.
    *  - Cross-band duplicate pairs dedup STATELESSLY: both sides carry
    *    their full band-key array, and a pair emits only from its FIRST
    *    shared band (`array_min` over the zip of equal keys) — exactly
    *    one output per pair per window without a second stateful dedup
    *    operator stacked on the join.
    */
  /** Streaming benchmark decontamination — the arrival-time twin of
    * [[graft.functions.Dedup.ngramContamination]]: each arriving doc is
    * checked against a STATIC benchmark n-gram index and flagged the
    * moment any length-n token window matches, so an ingestion pipeline
    * decontaminates on arrival instead of re-scanning the corpus per
    * eval release. Output: one row per (arriving doc, witness benchmark
    * doc) — (idCol, contaminated_by, n_hits), n_hits = shared distinct
    * grams with THAT witness (finer than the batch op's min-witness
    * rollup; `min/sum` over a doc's rows reproduces it exactly).
    *
    * Scale shape: STATELESS — the benchmark side is cached once (small
    * by construction: an eval set); each micro-batch is a distinct-gram
    * equi-join against it. Multi-gram collisions dedup without a
    * stateful operator: both sides carry their gram arrays and a pair
    * emits only from its FIRST shared gram (the
    * [[streamingNearDupPairs]] first-shared-key device).
    */
  def streamingDecontaminate(docs: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    import graft.functions.TextFunctions
    val idxArr = graft.CacheScope.cache(bench
      .select(col(idCol).as("__bid"),
        explode(array_distinct(TextFunctions.shingles(col(textCol), n))).as("g"))
      .groupBy(col("__bid"))
      .agg(sort_array(collect_list(col("g"))).as("grams_i")))
    val idxFlat = idxArr
      .select(col("__bid"), col("grams_i"), explode(col("grams_i")).as("g"))
    val gs = docs
      .select(col(idCol),
        array_distinct(TextFunctions.shingles(col(textCol), n)).as("__grams"))
      .filter(size(col("__grams")) >= 1)
      .select(col(idCol), col("__grams"), explode(col("__grams")).as("g"))
    val shared = filter(col("__grams"),
      x => array_contains(col("grams_i"), x))
    gs.join(idxFlat, Seq("g"))
      .filter(col("g") === array_min(shared))
      .select(col(idCol), col("__bid").as("contaminated_by"),
        size(shared).cast("long").as("n_hits"))
  }

  def streamingNearDupPairs(docs: DataFrame, idCol: String, textCol: String,
      tsCol: String, watermark: String, joinWindow: String,
      k: Int = 8, rows: Int = 4, minJaccard: Double = 0.0): DataFrame = {
    import graft.functions.Dedup
    val banded = docs
      .withColumn("__sh", Dedup.shingleSet(col(textCol)))
      .filter(size(col("__sh")) >= 1) // sub-2-token docs have no shingles
      .withColumn("__bands", Dedup.bandKeyStructs(col("__sh"), k, rows))
      .select(col(idCol), col(tsCol), col("__sh"), col("__bands"),
        explode(col("__bands")).as("bb"))
      .select(col(idCol), col(tsCol), col("__sh"), col("__bands"),
        col("bb.band").as("band"), col("bb.bk").as("bk"))
    val l = banded.select(col(idCol).as("a"), col("__sh").as("sha"),
      col("__bands").as("bands_a"), col("band"), col("bk"),
      col(tsCol).as("ts_a")).withWatermark("ts_a", watermark)
    val r = banded.select(col(idCol).as("b"), col("__sh").as("shb"),
      col("__bands").as("bands_b"), col("band").as("band_r"), col("bk").as("bk_r"),
      col(tsCol).as("ts_b")).withWatermark("ts_b", watermark)
    val firstShared = array_min(zip_with(col("bands_a"), col("bands_b"),
      (x, y) => when(x.getField("bk") === y.getField("bk"), x.getField("band"))))
    l.join(r,
      col("band") === col("band_r") && col("bk") === col("bk_r") &&
        col("a") < col("b") &&
        col("ts_b") >= col("ts_a") - expr(s"INTERVAL $joinWindow") &&
        col("ts_b") <= col("ts_a") + expr(s"INTERVAL $joinWindow"))
      .filter(col("band") === firstShared)
      .select(col("a"), col("b"),
        size(array_intersect(col("sha"), col("shb"))).cast("long").as("inter"),
        size(array_union(col("sha"), col("shb"))).cast("long").as("uni"))
      .withColumn("jac", round(col("inter").cast("double") / col("uni").cast("double"), 6))
      .filter(col("jac") >= minJaccard)
  }

  /** INCREMENTAL clean-corpus: the batch `pipeline_clean_corpus` stages
    * 1 (exact dedup) → 2 (near-dup, against the persisted corpus band
    * index) → 4 (quality gate) composed over unbounded arrival — arriving
    * shards flow the whole pipeline end-to-end with per-window latency.
    *
    * Composition (all ingredients are the already-tested parts):
    *  - exact dedup = a DETERMINISTIC keeper aggregation: min(id) per
    *    (event-time window, text fingerprint). Unlike first-arrival
    *    state-store dedup, the keeper is a pure function of the window's
    *    contents — any feed partitioning or arrival order produces the
    *    same representative (the batch oracle's MIN(doc_id));
    *  - near-dup = the [[streamingIndexProbe]] banding against the static
    *    [[graft.functions.Dedup.lshWriteBandIndex]] relation, flipped to
    *    KEEP the misses: band rows left-anti-join the index, and a doc
    *    survives only if EVERY band missed (count == n_bands via the
    *    CHAINED window aggregate re-windowing the keeper's window
    *    column). Docs too short to shingle carry one sentinel band
    *    (band -1, null key) that can never match, so they ride the same
    *    path instead of a side union.
    *  - quality gate = the batch gate's pure row predicates (min token
    *    count + stopword-density band) on the aggregated survivor.
    *
    * State inventory at 100 TB: one window of per-fingerprint keeper
    * state, one window of per-doc band-miss counts, and nothing else —
    * the corpus index is static data, text crosses the aggregations as
    * min/first within its window, and every predicate is a row
    * expression. Output: (win_start, id, text, n_tokens, stop_ratio) per
    * surviving doc, emitted when its window closes (one watermark
    * advance later than the single-agg formulation — the price of the
    * deterministic keeper).
    */
  def streamingCleanCorpus(docs: DataFrame, index: DataFrame, idCol: String,
      textCol: String, tsCol: String, watermark: String, windowLen: String,
      k: Int = 8, rows: Int = 4, minTokens: Long = 20,
      stopwords: Seq[String] = Seq("the", "a", "of", "to", "and"),
      stopLo: Double = 0.02, stopHi: Double = 0.2): DataFrame = {
    import graft.functions.{Dedup, TextFunctions}
    // KEEPER: min(id) per (event-time window, exact fingerprint) — an
    // order- and partition-INDEPENDENT streaming aggregation, not a
    // first-arrival race. dropDuplicatesWithinWatermark keeps whichever
    // duplicate its state partition happens to see first, which under a
    // parallel multi-partition feed is shuffle-read order — two runs of
    // the same stream could keep different representatives. min(struct)
    // over the micro-batch/window set is associative and commutative, so
    // the keeper is a pure function of the window's CONTENTS: any
    // partitioning, any arrival order, same keeper (the batch oracle's
    // MIN(doc_id)). The trade vs the state-store dedup: keepers emit at
    // window close (watermark) instead of immediately, and duplicates in
    // DIFFERENT windows both survive — the same lateness horizon the
    // watermarked state expiry imposed anyway.
    val deduped = docs
      .withColumn("__fp", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen).as("__w"), col("__fp"))
      .agg(min(struct(col(idCol).as("id"), col(textCol).as("__text"))).as("__keep"))
      .select(col("__w"), col("__keep.id").as("id"), col("__keep.__text").as("__text"))
    val banded = deduped
      .withColumn("__sh", Dedup.shingleSet(col("__text")))
      .withColumn("__bands",
        when(size(col("__sh")) >= 1, Dedup.bandKeyStructs(col("__sh"), k, rows))
          .otherwise(array(struct(lit(-1).as("band"),
            lit(null).cast("string").as("bk")))))
      .select(col("__w"), col("id"), col("__text"),
        size(col("__bands")).as("__nb"), explode(col("__bands")).as("bb"))
      .select(col("__w"), col("id"), col("__text"), col("__nb"),
        col("bb.band").as("band"), col("bb.bk").as("bk"))
    // KEEP the band rows the corpus index does NOT contain (stream-static
    // left anti; a null sentinel key never equi-matches, so short docs
    // keep their one row) — a doc is new iff all its bands survive.
    // The static side is CACHED: a stream-static join re-executes the
    // static plan EVERY micro-batch, so an inline-built index would
    // re-band the whole corpus per batch (the [[streamingIndexProbe]]
    // static-side discipline applied here too).
    val idx = graft.CacheScope.cache(index.select(col("band"), col("bk")))
    val misses = banded.join(idx, Seq("band", "bk"), "left_anti")
    // CHAINED window aggregation (Spark >= 3.4 multiple-stateful-operator
    // support): re-windowing the keeper agg's window column is the
    // documented composition shape — same length, so the bins are
    // identity and the band-miss count groups per (window, id)
    val survivors = misses
      .groupBy(window(col("__w"), windowLen), col("id"))
      .agg(first(col("__text")).as("text"), count(lit(1)).as("__nm"),
        first(col("__nb")).as("__nb"))
      .filter(col("__nm") === col("__nb"))
    val toks = TextFunctions.tokenCount(col("text"))
    survivors
      .withColumn("n_tokens", toks)
      .withColumn("stop_ratio",
        round(TextFunctions.stopwordCount(col("text"), stopwords).cast("double") /
          greatest(col("n_tokens"), lit(1L)), 6))
      .filter(col("n_tokens") >= minTokens &&
        col("stop_ratio") >= stopLo && col("stop_ratio") <= stopHi)
      .select(col("window.start").as("win_start"), col("id"), col("text"),
        col("n_tokens"), col("stop_ratio"))
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

  /** The sessionize state-transition function, exposed for direct unit
    * testing with `TestGroupState` (processing-time timeouts keep a live
    * stream permanently busy, so the function — not a running query — is
    * the testable unit, which is exactly what TestGroupState exists for).
    */
  def sessionizeFunc(gapMs: Long)
      : (Long, Iterator[(Long, Long)], GroupState[SessionState]) => Iterator[ClosedSession] = {
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
  }

  def sessionize(events: Dataset[(Long, Long)], gapMs: Long): Dataset[ClosedSession] = {
    implicit val ss: Encoder[SessionState]  = Encoders.product[SessionState]
    implicit val cs: Encoder[ClosedSession] = Encoders.product[ClosedSession]
    events.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.ProcessingTimeTimeout())(sessionizeFunc(gapMs))
  }

  /** The EVENT-TIME sessionize state transition: same session algebra as
    * [[sessionizeFunc]] (nano timestamps, gap join/close, per-batch sorted
    * fold), but the open session's close is armed on the WATERMARK passing
    * last-event + gap instead of wall clock — deterministic under replay,
    * drains completely in a bounded (availableNow / sentinel-flushed) run,
    * and late data inside the watermark still joins its session. Values
    * are (user_id, ts_ns, event_time).
    */
  def sessionizeEventTimeFunc(gapMs: Long)
      : (Long, Iterator[(Long, Long, java.sql.Timestamp)],
         GroupState[SessionState]) => Iterator[ClosedSession] = {
    (user: Long, it: Iterator[(Long, Long, java.sql.Timestamp)],
        state: GroupState[SessionState]) =>
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        Iterator.single(ClosedSession(user, s.start, s.last, s.n))
      } else {
        val gapNs = gapMs * 1000000L
        val ts = it.map(_._2).toSeq.sorted
        var closed = Vector.empty[ClosedSession]
        var cur    = state.getOption
        // far-past stragglers (beyond the gap BEFORE the open session) are
        // folded among THEMSELVES with the same gap algebra: two
        // stragglers within gap of each other form ONE session, exactly
        // as the batch sorted-fold would. A later in-batch event can
        // BRIDGE the chain to the open session (within gap of both) —
        // then chain + event + session fold into one session (the in-gap
        // branch below); an unbridged chain is gap-disjoint from the open
        // session by construction and closes at batch end (in event-time
        // order its watermark has already passed).
        var strag: Option[SessionState] = None
        def flushStrag(): Unit = strag.foreach { ss =>
          closed :+= ClosedSession(user, ss.start, ss.last, ss.n)
          strag = None
        }
        ts.foreach { t =>
          cur match {
            // in-gap (including LATE, watermark-admitted) events join the
            // open session without ever moving `last` backward — a
            // rewound `last` would re-arm the timeout too early, emit
            // end < start, and let a later in-gap event spuriously close
            // the session (the session algebra must stay a superset of
            // the batch sorted-fold)
            case Some(s) if t >= s.start - gapNs && t - s.last <= gapNs =>
              strag match {
                case Some(ss) if t - ss.last <= gapNs =>
                  // BRIDGING event: within gap of both the straggler
                  // chain's last element and the open session — the batch
                  // sorted-fold merges chain + t + session into ONE
                  // session, so fold the chain in rather than closing it
                  strag = None
                  cur = Some(SessionState(
                    math.min(ss.start, math.min(s.start, t)),
                    math.max(s.last, t), s.n + ss.n + 1))
                case _ =>
                  flushStrag()
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1))
              }
            case Some(s) if t < s.start - gapNs =>
              strag match {
                case Some(ss) if t - ss.last <= gapNs =>
                  strag = Some(SessionState(ss.start,
                    math.max(ss.last, t), ss.n + 1))
                case _ =>
                  flushStrag()
                  strag = Some(SessionState(t, t, 1))
              }
            case Some(s) =>
              flushStrag()
              closed :+= ClosedSession(user, s.start, s.last, s.n)
              cur = Some(SessionState(t, t, 1))
            case None =>
              cur = Some(SessionState(t, t, 1))
          }
        }
        flushStrag()
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.last / 1000000L + gapMs)
        }
        closed.iterator
      }
  }

  /** Event-time sessionization over an events frame with columns
    * (user_id: long, ts_ns: long, ts: timestamp): watermark on `ts`,
    * sessions close when the watermark passes last + gap. Note the GAP is
    * compared in NANOS (gapMs * 1e6) against ts_ns, so boundaries agree
    * bit-for-bit with the batch q_events_sessionize arithmetic.
    */
  /** Streaming co-visitation edge counts: the live-updating weighted
    * interaction graph [[graft.functions.GraphRank.pageRankWeighted]] and
    * the co-occurrence ops consume — each micro-batch folds new (user,
    * item) interactions into the running per-edge multiplicity (Spark
    * keeps the agg state; Complete/Update mode exposes the current
    * graph). Item ids come from the `props` JSON key `k`, exactly like
    * the batch co-visitation derivation, so the batch weighted-edge
    * oracle gates the drained stream.
    */
  def streamingCoVisitation(events: DataFrame, userCol: String,
      propsCol: String): DataFrame =
    events.select(col(userCol).cast("long").as("u"),
        get_json_object(col(propsCol), "$.k").cast("long").as("k"))
      .where(col("k").isNotNull)
      .groupBy(col("u"), col("k"))
      .agg(count(lit(1)).as("w"))

  def sessionizeEventTime(events: DataFrame, gapMs: Long,
      watermark: String): Dataset[ClosedSession] = {
    implicit val ss: Encoder[SessionState]  = Encoders.product[SessionState]
    implicit val cs: Encoder[ClosedSession] = Encoders.product[ClosedSession]
    implicit val in: Encoder[(Long, Long, java.sql.Timestamp)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.TIMESTAMP)
    events.withWatermark("ts", watermark)
      .select(col("user_id"), col("ts_ns"), col("ts"))
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        sessionizeEventTimeFunc(gapMs))
  }
}
