package graft.functions

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.CacheScope

/** Embedding similarity search over an `array<float>` column.
  *
  * Two paths, per the scale playbook:
  *  - [[bruteForceTopK]]: broadcast the (small) query set against the full
  *    corpus — exact, one pass, no shuffle of the big side. The right
  *    baseline whenever |queries| * |corpus| dot products fit the cluster.
  *  - [[bucketedTopK]]: LSH-style sign-bit bucketing (IVF-like): corpus and
  *    queries hash to a bucket; search only within the bucket. Trades
  *    recall for a |corpus|/2^bits reduction in work; bucket key is a
  *    shuffle-friendly join column.
  *
  * Top-k selection is a bounded-heap [[Aggregator]] (k-sized buffer,
  * map-side partial aggregation, k-row merges) — NOT a
  * `Window.partitionBy(qid)` rank, which would materialize every scored
  * corpus row for a query in a single task and die at 100 TB. The plan
  * shows ObjectHashAggregate with partial_topk on the map side; per
  * (input partition, query) only k rows ever cross the shuffle.
  *
  * All arithmetic is double, computed as an ordered left-to-right fold so
  * results are bit-identical to the DuckDB oracle (`list_inner_product`).
  */
object Similarity {

  /** Dot product of two array<float> columns in double precision — the
    * native codegen'd expression ([[graft.plans.FloatVecDot]], registered
    * by GraftExtensions). Bit-identical to [[dotFold]]'s left-to-right
    * accumulation, one fused loop instead of the interpreted HOF pipeline.
    */
  def dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)

  /** Upstream-dtype shield for vector columns — the events-ts lesson
    * (round 7) applied to the embeddings table: the engine's canonical
    * vector type is `array<float>` (what the generator has always
    * produced, and what the native `vec_dot` expression binds to). If an
    * upstream regeneration ever widens the column to `array<double>`,
    * normalize AT THE LOADER so every downstream op — native dot, sign
    * buckets, PQ slices — sees the same float grid; the SQL oracles
    * replay the identical FLOAT-first quantization
    * (`embedding::FLOAT[]::DOUBLE[]`). No-op (schema untouched, same
    * plan) on canonical data.
    */
  def canonicalVectors(df: DataFrame, vecCol: String): DataFrame =
    df.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, _) => df
      case org.apache.spark.sql.types.ArrayType(_, _) =>
        df.withColumn(vecCol, col(vecCol).cast("array<float>"))
      case other =>
        sys.error(s"$vecCol: expected an array vector column, got ${other.simpleString}")
    }

  /** generic ordered-fold dot product for arbitrary numeric arrays (the
    * expression-only fallback when inputs aren't array<float>)
    */
  def dotFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** cosine = dot / (|a| * |b|), norms as sqrt of ordered-fold self-dot */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** per-row L2 norm sqrt(dot(v,v)) — hoisted ONCE per row ahead of the
    * pair joins below, so a quadratic candidate stage evaluates one
    * vec_dot per pair instead of three (the two self-dots were
    * recomputed per CANDIDATE when written inline in [[cosine]]).
    * `dot(a,b) / (na * nb)` with the hoisted norms multiplies the same
    * two sqrt results in the same order, so every rounded score is
    * bit-identical to the inline form.
    */
  private def norm(v: Column): Column = sqrt(dot(v, v))

  /** sign-bit bucket over `bits` dimensions starting at `from` (bit q set
    * iff dim from+q+1 >= 0) — the cheap IVF/LSH partition key
    */
  def signBucket(v: Column, bits: Int, from: Int = 0): Column =
    (0 until bits).map(q =>
      when(element_at(v, from + q + 1) >= 0f, lit(1L << (bits - 1 - q))).otherwise(lit(0L)))
      .reduce(_ + _)

  /** one candidate row in the top-k buffer */
  final case class ScoredId(id: Long, score: Double)
  /** encoder-friendly wrapper so buffer/output use Encoders.product
    * (collection.Seq: the working form inside the aggregate is a mutable
    * ArrayBuffer — see [[TopKAgg.reduce]])
    */
  final case class TopKBuf(hits: scala.collection.Seq[ScoredId])

  /** ordering: best first — score desc, id asc tiebreak (matches oracle) */
  private val best: Ordering[ScoredId] =
    Ordering.by((e: ScoredId) => (-e.score, e.id))

  /** Bounded top-k aggregate: buffer is a k-sized sorted vector; reduce is
    * O(k) insert with an O(1) reject for rows worse than the current k-th;
    * merge is a k-bounded sorted merge. Spark plans Aggregator UDAFs as
    * TypedImperativeAggregate with partial merge — map-side combine keeps
    * shuffle volume at k rows per (partition, group).
    */
  final class TopKAgg(k: Int) extends Aggregator[ScoredId, TopKBuf, TopKBuf] {
    override def zero: TopKBuf = TopKBuf(Vector.empty)

    /** working form of a buffer: a mutable ArrayBuffer (still a Seq, so
      * the product encoder serializes it unchanged). reduce runs once per
      * scored CANDIDATE in the quadratic sim_* paths — the old
      * immutable-Vector insert (`(le ++ (a +: gt)).take(k)`) allocated a
      * fresh k-element chain per accepted row (r16, guide §5 allocation
      * churn); the in-place insert below produces the identical sorted
      * k-prefix.
      */
    private def mut(b: TopKBuf)
        : (TopKBuf, scala.collection.mutable.ArrayBuffer[ScoredId]) =
      b.hits match {
        case ab: scala.collection.mutable.ArrayBuffer[ScoredId @unchecked] => (b, ab)
        case other =>
          val ab = new scala.collection.mutable.ArrayBuffer[ScoredId](k + 1)
          ab ++= other
          (TopKBuf(ab), ab)
      }

    override def reduce(b: TopKBuf, a: ScoredId): TopKBuf = {
      val h = b.hits
      if (h.size >= k && best.lteq(h.last, a)) b // O(1) reject: worse than the k-th
      else {
        val (nb, ab) = mut(b)
        // binary search for the first element ordered AFTER a — the same
        // split point the old span(lteq) computed (ties insert after, so
        // equal-compare stability is preserved)
        var lo = 0
        var hi = ab.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (best.lteq(ab(mid), a)) lo = mid + 1 else hi = mid
        }
        ab.insert(lo, a)
        if (ab.length > k) ab.remove(ab.length - 1)
        nb
      }
    }

    override def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf = {
      if (b2.hits.isEmpty) b1
      else if (b1.hits.isEmpty) b2
      else {
        val (x, y) = (b1.hits, b2.hits)
        val out = new scala.collection.mutable.ArrayBuffer[ScoredId](k)
        var (i, j) = (0, 0)
        while (out.length < k && (i < x.size || j < y.size)) {
          val takeX = j >= y.size || (i < x.size && best.lteq(x(i), y(j)))
          if (takeX) { out += x(i); i += 1 } else { out += y(j); j += 1 }
        }
        TopKBuf(out)
      }
    }

    override def finish(r: TopKBuf): TopKBuf = r
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  }

  /** (qid, id, rank, score) from a scored candidate relation via the
    * bounded top-k aggregate; rank = 1-based position in the final list.
    */
  private[graft] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k), Encoders.product[ScoredId])
    scored.groupBy(col("qid"))
      .agg(topk(col("id"), col("score")).as("res"))
      .select(col("qid"), posexplode(col("res.hits")))
      .select(col("qid"), col("col.id").as("id"),
        (col("pos") + 1).cast("long").as("rank"), col("col.score").as("score"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    * standard hybrid-retrieval combiner: given any number of (qid, id,
    * rank) rankings (lexical BM25, dense cosine, ...), fuse by
    * score(q, d) = Σ_rankers 1/(k0 + rank_r(q, d)), re-rank, keep top-k.
    * Ranker-agnostic by design — RRF needs only ranks, never the
    * incomparable raw scores. Scores round at 6 dp before ranking; ties
    * break toward the smaller id (same convention as every ranking op).
    *
    * Scale shape: each input is already top-k-bounded, so the fusion
    * union holds ≤ |rankers| × k rows PER QUERY — ids and ranks only, no
    * text or vectors. One hash agg sums the reciprocal ranks; the re-rank
    * is the bounded-heap aggregate. The fusion itself costs nothing at
    * any corpus size; the legs dominate.
    */
  def rrfFuse(rankings: Seq[DataFrame], k: Int, k0: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val scored = rankings
      .map(_.select(col("qid"), col("id"),
        (lit(1.0) / (lit(k0.toDouble) + col("rank"))).as("rr")))
      .reduce(_ unionByName _)
      .groupBy(col("qid"), col("id"))
      .agg(round(sum(col("rr")), 6).as("score"))
    rankTopK(scored, k)
  }

  /** Exact top-k neighbors for each query vector (brute force, broadcast
    * queries). Output: (qid, id, rank, score), score rounded to 6 dp for
    * cross-engine rank stability, self-matches excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("__nq")))
    val scored = corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"), norm(col(vecCol)).as("__nv"))
      .join(q, col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(dot(col("qv"), col("v")) / (col("__nq") * col("__nv")), 6).as("score"))
    rankTopK(scored, k)
  }

  /** Bucketed (approximate) top-k: only candidates in the query's sign
    * bucket are scored. Same output shape as [[bruteForceTopK]]. At scale,
    * choose `bits` ≈ log2(|corpus| / targetBucketSize).
    */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      norm(col(vecCol)).as("__nv"), signBucket(col(vecCol), bits).as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("__nq"), signBucket(col(vecCol), bits).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(dot(col("qv"), col("v")) / (col("__nq") * col("__nv")), 6).as("score"))
    rankTopK(scored, k)
  }

  /** Symmetric int8 quantization columns — the embedding-storage
    * compression step of a training pipeline (4x smaller than float32;
    * dequantize ≈ q * scale). `scaleCol` must hold maxAbs(v)/127 computed
    * ONCE per row (a lambda that recomputed the max per element would be
    * O(dim²)); rounding is half-away-from-zero in both engines, so the
    * DuckDB oracle reproduces the codes exactly.
    */
  def maxAbs(v: Column): Column =
    array_max(transform(v, x => abs(x.cast("double"))))

  def int8Quantize(v: Column, scaleCol: Column): Column =
    when(scaleCol === 0d, transform(v, _ => lit(0)))
      .otherwise(transform(v, x => round(x.cast("double") / scaleCol).cast("int")))

  /** IVF (inverted-file) approximate top-k — the FAISS-style scale path:
    * a small deterministic coarse-quantizer relation (`anchors`; at corpus
    * scale, k-means centroids — any small vector relation works) partitions
    * the corpus into cells, each vector assigned to its highest-cosine
    * anchor; a query exact-searches only its `nprobe` highest-cosine cells.
    *
    * Plan shape at 100 TB: assignment is one broadcast of the anchors +
    * a partial-aggregated argmax (`max(struct(score, -cid))` — no window,
    * no shuffle of the corpus beyond the one cell-key exchange); candidate
    * generation is an equi-join on cellId between the (tiny, broadcast)
    * query×probe list and the celled corpus — never all-pairs; selection
    * is the same bounded-heap aggregate as [[bruteForceTopK]]. Recall
    * dials with `nprobe`, cell size with |anchors|.
    */
  def ivfTopK(corpus: DataFrame, anchors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame =
    ivfProbe(ivfBuildCells(corpus, anchors, idCol, vecCol), anchors,
      queries, idCol, vecCol, k, nprobe)

  /** The IVF BUILD half: invert the corpus into (id, v, cell) — every
    * vector assigned to its highest-cosine anchor (argmax via
    * max(struct) — ties break to the smaller anchor id, like the oracle's
    * ORDER BY score DESC, cid). One anchor broadcast + one
    * partial-aggregated argmax; at corpus scale this runs ONCE and the
    * result persists ([[ivfWriteIndex]]) for every later query batch.
    */
  def ivfBuildCells(corpus: DataFrame, anchors: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    // norms hoisted: the anchor norm once per ANCHOR (broadcast side),
    // the vector norm once per ROW instead of once per (row, anchor) —
    // cosine(cv, v) = dot / (sqrt(cv·cv) * sqrt(v·v)), same multiply
    // order, bit-identical argmax input. Output schema unchanged.
    val a = broadcast(anchors.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("__ncv")))
    corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
        norm(col(vecCol)).as("__nv"))
      .join(a)
      .select(col("id"), col("v"),
        struct((dot(col("cv"), col("v")) / (col("__ncv") * col("__nv"))).as("s"),
          (-col("cid")).as("nc"), col("cid")).as("cand"))
      .groupBy(col("id"))
      .agg(max(col("cand")).as("best"), first(col("v")).as("v"))
      .select(col("id"), col("v"), col("best.cid").as("cell"))
  }

  /** Persist the built index as a cell-bucketed, cell-sorted table — the
    * build-once/query-many ANN shape: probes read only the matching
    * buckets' files and the assignment aggregation never reruns. Buckets
    * co-locate cells so a (rare) shuffle-based probe join is exchange-free
    * on the corpus side; the common broadcast-probe plan just benefits
    * from the one-time assignment.
    */
  /** true overwrite semantics for saveAsTable: an in-memory catalog
    * forgets tables across JVMs while the warehouse directory persists —
    * clear a stale location so a rebuild doesn't fail with
    * LOCATION_ALREADY_EXISTS (shared by every build-once index writer)
    */
  private[graft] def prepareTableOverwrite(s: org.apache.spark.sql.SparkSession,
      table: String): Unit = {
    // the stale-location computation below is warehouse.dir/<name> — only
    // valid for unqualified names in the default database ("db.tbl" would
    // map to a literal 'db.tbl' directory and miss/delete the wrong path)
    require(!table.contains('.'),
      s"prepareTableOverwrite needs an unqualified table name, got '$table'")
    if (!s.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        s.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
      val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
  }

  def ivfWriteIndex(corpus: DataFrame, anchors: DataFrame, idCol: String,
      vecCol: String, table: String, buckets: Int = 32): Unit = {
    val s = corpus.sparkSession
    prepareTableOverwrite(s, table)
    graft.Profiler.attributed(s, "ivf-build") {
      ivfBuildCells(corpus, anchors, idCol, vecCol)
        .write.mode("overwrite")
        .bucketBy(buckets, "cell").sortBy("cell")
        .format("parquet")
        .saveAsTable(table)
    }
  }

  /** Bulk kNN-graph construction: top-k neighbors for EVERY corpus
    * vector, restricted to its IVF cell — the build step for graph-based
    * semantic clustering (kNN + connected components), diversity
    * sampling, and HNSW-style index seeding. The distinguishing scale
    * shape vs [[ivfTopK]]: when queries = corpus, the broadcast-probe
    * plan is impossible (you cannot broadcast the corpus), so the
    * candidate join is a CELL-KEYED SELF-JOIN of the assigned relation —
    * co-partitioned on the cell key, candidate volume Σ_cells |cell|²
    * instead of n², bounded-heap top-k per vector. Same assignment, same
    * tie conventions (6-dp score grid, smaller id) as the probe path.
    *
    * @return (qid, id, rank, score) — k best same-cell neighbors per
    *         vector; vectors alone in their cell produce no rows
    */
  def knnGraph(corpus: DataFrame, anchors: DataFrame, idCol: String,
      vecCol: String, k: Int, maxCellSize: Int = 4096): DataFrame =
    rankTopK(cellScored(corpus, anchors, idCol, vecCol, maxCellSize), k)

  /** The shared candidate relation of the bulk ops: every within-cell
    * ordered pair scored on the 6-dp cosine grid (cell-keyed self-join of
    * the cached assignment — see [[knnGraph]] for the scale argument).
    *
    * GIANT-CELL CAP: the self-join is quadratic in cell size, so a
    * degenerate assignment (k-means collapse: one anchor claims most of
    * the corpus) would turn one hot cell into a near-cross-join no
    * partitioner can save. Cells above `maxCellSize` split
    * deterministically into ceil(|cell|/maxCellSize) SUBCELLS by id hash
    * (xxhash64 — reproducible across runs/partitionings), and candidates
    * stay within a subcell: per-key join volume is bounded by
    * ~maxCellSize² regardless of how badly the anchors fit, total
    * candidate volume by |corpus|·maxCellSize. The price is graceful —
    * within an oversized cell each vector sees a 1/nsub uniform sample
    * of its cellmates, the same recall trade IVF itself makes cell-wide —
    * and healthy assignments (every cell <= maxCellSize) are EXACTLY
    * unchanged (nsub = 1 → subcell 0 everywhere). Mirrors the
    * maxCtxDegree prune in [[graft.functions.GraphStructure]], except
    * splitting keeps the hot key's members queryable instead of dropping
    * them. The cell-size relation is one |anchors|-row broadcast.
    */
  private def cellScored(corpus: DataFrame, anchors: DataFrame,
      idCol: String, vecCol: String, maxCellSize: Int = 4096): DataFrame = {
    require(maxCellSize >= 1, s"maxCellSize $maxCellSize must be >= 1")
    // the per-row norm rides the cached assignment so the quadratic
    // within-cell self-join below computes one vec_dot per candidate
    // pair, not three (see [[norm]])
    val cells = graft.CacheScope.cache(
      ivfBuildCells(corpus, anchors, idCol, vecCol)
        .withColumn("__nrm", norm(col("v"))))
    // degraded-recall mode must be OBSERVABLE, not silent: a udf over the
    // |anchors|-row aggregate (tiny, broadcast side — never the corpus)
    // logs each cell that actually sub-splits. Callers who want exactness
    // regardless of assignment health pass maxCellSize = Int.MaxValue.
    val warnSplit = udf { (cell: Long, n: Long) =>
      if (n > 1L) org.slf4j.LoggerFactory.getLogger("graft.Similarity").warn(
        s"IVF cell $cell exceeds maxCellSize=$maxCellSize; splitting into " +
          s"$n subcells — within-cell neighbors are a 1/$n sample (bounded " +
          "recall loss). Re-train anchors or raise maxCellSize for exactness.")
      n
    }.asNondeterministic()
    val nsub = broadcast(cells.groupBy(col("cell"))
      .agg(ceil(count(lit(1)) / lit(maxCellSize.toDouble)).as("__n0"))
      .select(col("cell"), warnSplit(col("cell"), col("__n0")).as("__nsub")))
    val sub = cells.join(nsub, Seq("cell"))
      .withColumn("__sc", when(col("__nsub") <= 1L, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), col("__nsub"))))
    sub.as("q").join(sub.as("c"), Seq("cell", "__sc"))
      .where(col("q.id") =!= col("c.id"))
      .select(col("q.id").as("qid"), col("c.id").as("id"),
        round(dot(col("q.v"), col("c.v")) / (col("q.__nrm") * col("c.__nrm")), 6)
          .as("score"))
  }

  /** Hard-negative mining for contrastive/embedding training: for every
    * vector, the k MOST similar same-cell vectors that are NOT positives
    * (score < `posThreshold`, the same near-dup cut SemDeDup uses) — the
    * "close but wrong" examples a contrastive loss learns the most from
    * (easy negatives are random; too-similar ones are near-dup label
    * noise). Identical candidate relation and tie conventions as
    * [[knnGraph]]; the threshold filter runs BEFORE the bounded-heap
    * top-k, so every vector still yields up to k negatives.
    *
    * @return (qid, id, rank, score) — score < posThreshold, rank 1..k
    */
  def hardNegatives(corpus: DataFrame, anchors: DataFrame, idCol: String,
      vecCol: String, k: Int, posThreshold: Double,
      maxCellSize: Int = 4096): DataFrame =
    rankTopK(cellScored(corpus, anchors, idCol, vecCol, maxCellSize)
      .where(col("score") < posThreshold), k)

  /** kNN-majority classification over the bulk graph: every vector takes
    * the majority label of its k nearest same-cell neighbors (ties break
    * to the smaller label; neighbors tie-ranked exactly like
    * [[knnGraph]]) — embedding-space label transfer for weakly-labeled
    * corpora (spread curator verdicts from a labeled seed set to the
    * whole corpus by semantic proximity). The vote is one hash agg over
    * the k-bounded edge relation — nothing beyond the knn build.
    *
    * @param labeled (idCol, labelCol) relation — typically a subset;
    *                unlabeled neighbors simply don't vote
    * @return (idCol, pred_label, n_votes) for vectors with >= 1 labeled
    *         neighbor
    */
  def knnClassify(corpus: DataFrame, anchors: DataFrame, labeled: DataFrame,
      idCol: String, vecCol: String, labelCol: String, k: Int): DataFrame = {
    val votes = knnGraph(corpus, anchors, idCol, vecCol, k)
      .join(labeled.select(col(idCol).as("id"),
        col(labelCol).cast("long").as("__lbl")), Seq("id"))
      .groupBy(col("qid"), col("__lbl"))
      .agg(count(lit(1)).as("n"))
    votes
      .select(col("qid"),
        struct(col("n"), (-col("__lbl")).as("nl"), col("__lbl")).as("cand"))
      .groupBy(col("qid"))
      .agg(max(col("cand")).as("best"))
      .select(col("qid").as(idCol), col("best.__lbl").as("pred_label"),
        col("best.n").as("n_votes"))
  }

  /** The INCREMENTAL half of the persisted index: assign an arriving
    * shard with the SAME anchors and APPEND its celled rows to the
    * bucketed table — no rebuild, no touch of the existing cells (the
    * incremental-dedup band index's shard economics applied to ANN; cost
    * is O(shard), not O(corpus)). The probe plan is unchanged, and the
    * final celled relation is identical whether built in one pass or
    * many appends — exactly what the sim_ivf_incremental gate asserts by
    * reusing the one-shot build's oracle verbatim.
    */
  def ivfAppendIndex(shard: DataFrame, anchors: DataFrame, idCol: String,
      vecCol: String, table: String, buckets: Int = 32): Unit = {
    val s = shard.sparkSession
    graft.Profiler.attributed(s, "ivf-append") {
      ivfBuildCells(shard, anchors, idCol, vecCol)
        .write.mode("append")
        .bucketBy(buckets, "cell").sortBy("cell")
        .format("parquet")
        .saveAsTable(table)
    }
  }

  /** The IVF PROBE half over a prebuilt celled relation (id, v, cell) —
    * per-query probe list from the broadcast anchors, candidate equi-join
    * on cell, bounded-heap top-k. NO assignment aggregation anywhere in
    * this plan: the index is an input, not a computation.
    */
  def ivfProbe(celled: DataFrame, anchors: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    // query/anchor norms hoisted once per row (broadcast side included);
    // the corpus-side norm computes once per celled row instead of once
    // per (row, probing query) — bit-identical scores, see [[norm]]
    val a = broadcast(anchors.select(col(idCol).as("cid"), col(vecCol).as("cv"),
      norm(col(vecCol)).as("__ncv")))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      norm(col(vecCol)).as("__nq"))
    // per-query probe list: nprobe highest-cosine cells (bounded heap over
    // the broadcast anchor relation — |queries| * |anchors| rows, k rows out)
    val probes = rankTopK(
      q.join(a).select(col("qid"), col("cid").as("id"),
        round(dot(col("cv"), col("qv")) / (col("__ncv") * col("__nq")), 6)
          .as("score")), nprobe)
      .select(col("qid"), col("id").as("cell"))
    val qp = broadcast(probes.join(q, Seq("qid")))
    val scored = celled.select(col("id"), col("v"), col("cell"),
        norm(col("v")).as("__nv"))
      .join(qp, Seq("cell"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"),
        round(dot(col("qv"), col("v")) / (col("__nq") * col("__nv")), 6).as("score"))
    rankTopK(scored, k)
  }

  /** Squared L2 distance in double precision over `array<double>` inputs —
    * the native codegen'd [[graft.plans.DoubleVecSqDist]] (one fused loop;
    * the interpreted fold was ~10x the cost of a whole Lloyd round at
    * 100k x 16 centroids). Bit-identical to the left-to-right fold and to
    * the DuckDB oracle's `list_reduce` with a prepended 0.0 seed.
    */
  def sqDist(a: Column, b: Column): Column = call_function("vec_sqdist", a, b)

  /** generic fold fallback for non-double arrays (casts per element) */
  def sqDistFold(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => {
      val d = x.cast("double") - y.cast("double"); d * d
    }), lit(0.0), (acc, v) => acc + v)

  /** Exact vector-mean state: signed-128-bit limb sums of each position's
    * decimal(30,8) HALF_UP element image, plus per-position row and
    * non-null counts — the one-pass replacement (r16, the Pca.ScatterAgg
    * technique per guide §5) for the kmeans/pq means chain
    * `posexplode → sum(cast(decimal(30,8)))/count per (group, pos) →
    * collect_list/array_sort reassembly`, which paid an exploded row +
    * two hash-agg probes per element per Lloyd round.
    */
  final case class MeanBuf(hi: Array[Long], lo: Array[Long],
      rows: Array[Long], nn: Array[Long])
  /** finished vector mean: n = rows at position 0 (the old chain's
    * `first(n)`, identical whenever vectors are equal-length), cv = the
    * per-position means rounded at 6 dp (null where every element was
    * null/non-finite, as the decimal sum yielded null)
    */
  final case class MeanOut(n: Long, cv: Seq[java.lang.Double])

  /** Replicates the decimal chain bit for bit on its whole envelope:
    * element → decimal(30,8) is HALF_UP on the shortest decimal string
    * (java BigDecimal.valueOf), NaN/±Inf cast to null (summed as absent,
    * still counted), sums are exact integers, sum → double is BigDecimal
    * rounding, the division is IEEE double by the row count, and the
    * final round(·, 6) is the same valueOf/setScale(HALF_UP) Spark's
    * Round runs. Elements beyond ±2^63 at scale 8 (|x| > ~9.2e10) refuse
    * loudly — far outside any embedding range; the old chain kept exact
    * sums to 1e22 — and a sum past decimal(38,8) returns null exactly as
    * the non-ANSI decimal sum overflow did.
    */
  final class VecMeanAgg extends Aggregator[Seq[java.lang.Double], MeanBuf, MeanOut] {
    @inline private def add128(hi: Array[Long], lo: Array[Long], i: Int,
        pHi: Long, pLo: Long): Unit = {
      val x = lo(i)
      val nl = x + pLo
      val carry = if (java.lang.Long.compareUnsigned(nl, x) < 0) 1L else 0L
      lo(i) = nl
      hi(i) = try math.addExact(math.addExact(hi(i), pHi), carry)
      catch {
        case _: ArithmeticException => throw new IllegalStateException(
          "vector-mean sum overflowed 128 bits")
      }
    }

    override def zero: MeanBuf =
      MeanBuf(Array.emptyLongArray, Array.emptyLongArray,
        Array.emptyLongArray, Array.emptyLongArray)

    private def grown(b: MeanBuf, d: Int): MeanBuf =
      if (b.hi.length >= d) b
      else MeanBuf(java.util.Arrays.copyOf(b.hi, d),
        java.util.Arrays.copyOf(b.lo, d),
        java.util.Arrays.copyOf(b.rows, d),
        java.util.Arrays.copyOf(b.nn, d))

    override def reduce(b0: MeanBuf, v: Seq[java.lang.Double]): MeanBuf = {
      // a null vector explodes to zero rows in the old chain — skip whole
      if (v == null) return b0
      val d = v.length
      val b = grown(b0, d)
      var p = 0
      while (p < d) {
        b.rows(p) += 1
        val x = v(p)
        if (x != null) {
          val xd = x.doubleValue()
          if (!java.lang.Double.isNaN(xd) && !java.lang.Double.isInfinite(xd)) {
            val dec = new java.math.BigDecimal(java.lang.Double.toString(xd))
              .setScale(8, java.math.RoundingMode.HALF_UP)
            val u = dec.unscaledValue()
            if (u.bitLength() > 63) throw new IllegalStateException(
              s"vector element $xd exceeds the exact-mean envelope (|x| <= ~9.2e10)")
            val l = u.longValue()
            add128(b.hi, b.lo, p, l >> 63, l)
            b.nn(p) += 1
          }
        }
        p += 1
      }
      b
    }

    override def merge(x0: MeanBuf, y: MeanBuf): MeanBuf = {
      val x = grown(x0, y.hi.length)
      var p = 0
      while (p < y.hi.length) {
        add128(x.hi, x.lo, p, y.hi(p), y.lo(p))
        x.rows(p) += y.rows(p)
        x.nn(p) += y.nn(p)
        p += 1
      }
      x
    }

    private val decimal38Max = (BigInt(10).pow(38)) - 1

    override def finish(r: MeanBuf): MeanOut = {
      val d = r.hi.length
      if (d == 0) return MeanOut(0L, Seq.empty)
      val cv = new Array[java.lang.Double](d)
      var p = 0
      while (p < d) {
        cv(p) =
          if (r.nn(p) == 0L) null // all-null position: decimal sum = null
          else {
            val s = (BigInt(r.hi(p)) << 64) +
              (BigInt(r.lo(p)) & ((BigInt(1) << 64) - 1))
            if (s.abs > decimal38Max) null // decimal(38,8) sum overflow → null (non-ANSI)
            else {
              val sumD = new java.math.BigDecimal(s.bigInteger, 8).doubleValue()
              val m = sumD / r.rows(p)
              if (java.lang.Double.isNaN(m) || java.lang.Double.isInfinite(m)) m
              else java.math.BigDecimal.valueOf(m)
                .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
            }
          }
        p += 1
      }
      MeanOut(r.rows(0), scala.collection.immutable.ArraySeq.unsafeWrapArray(cv))
    }

    override def bufferEncoder: Encoder[MeanBuf] = Encoders.product[MeanBuf]
    override def outputEncoder: Encoder[MeanOut] = Encoders.product[MeanOut]
  }

  /** the [[VecMeanAgg]] as a DataFrame aggregate expression */
  private[graft] def vecMeanUdaf: Column => Column = {
    val agg = udaf(new VecMeanAgg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[java.lang.Double]]())
    c => agg(c)
  }

  /** Lloyd's k-means — the IVF coarse-quantizer trainer (reference's
    * anchors in [[ivfTopK]] are exactly these centroids at corpus scale).
    * Deterministic: init = the k lowest-id vectors; assignment argmin via
    * `min(struct(dist, cid))` (partial-aggregated, ties to the smaller
    * cid); means via exact DECIMAL(30,8) sums so the result is independent
    * of partition/merge order (the [[SimQueries]] `emb_centroids` parity
    * technique), rounded to 6 dp before the next round. A centroid that
    * draws zero points in a round is carried forward unchanged with n=0 —
    * the trainer ALWAYS returns exactly k centroids, never a silently
    * shrunken quantizer.
    *
    * Plan shape per iteration at 100 TB: ONE broadcast of the (tiny)
    * centroid relation, one hash-agg argmin over the points (map-side
    * partial — no window, no shuffle of the corpus beyond the (id) agg),
    * one (cid, pos) hash-agg for the means (dims explode narrowly, then
    * combine map-side). The driver loop iterates only the centroid
    * relation — points are persisted once and scanned per round, never
    * collected.
    */
  def kmeansCentroids(points: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame =
    kmeansCentroidVectors(points, idCol, vecCol, k, iters)
      .select(col("cid"), col("n"), posexplode(col("cv")))
      .select(col("cid"), col("pos").cast("long").as("pos"),
        col("col").as("cval"), col("n"))

  /** [[kmeansCentroids]] in vector form: (cid, n, cv: array<double>) —
    * the shape [[ivfTopK]] consumes as its coarse-quantizer anchors.
    */
  def kmeansCentroidVectors(points: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"need at least one Lloyd round, got $iters")
    val pts = CacheScope.cache(points.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      ) // cached: scanned once per Lloyd round; caller releases via CacheScope
    // init = the k lowest ids, whatever the id domain (a filter on id < k
    // would silently seed fewer — or zero — centroids for non-dense or
    // non-zero-based ids); TakeOrderedAndProject keeps this one tiny job
    var cent = pts.orderBy(col("id")).limit(k)
      .select(col("id").as("cid"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      val assigned = pts.join(broadcast(cent))
        .select(col("id"), col("v"),
          struct(sqDist(col("v"), col("cv")).as("d"), col("cid")).as("cand"))
        // a null distance (ragged dims, null elements) would sort FIRST in
        // Spark's struct ordering but LAST under the oracle's ORDER BY —
        // drop such candidates; a vector null against EVERY centroid drops
        // out of the round entirely (malformed input never steers a mean)
        .filter(col("cand.d").isNotNull)
        .groupBy(col("id"))
        .agg(min(col("cand")).as("best"), first(col("v")).as("v"))
        .select(col("best.cid").as("cid"), col("v"))
      // exact per-position means in ONE imperative aggregate ([[VecMeanAgg]],
      // r16): same decimal(30,8) HALF_UP sums and 6-dp rounding as the old
      // posexplode → (cid,pos) decimal agg → collect_list chain, minus the
      // dim× exploded rows and two hash-agg probes per element per round.
      // The size filter replicates the old chain's ABSENCE of a means row
      // for cids whose every vector was null/empty (carry-forward applies).
      val vecMean = vecMeanUdaf
      val means = assigned
        .groupBy(col("cid"))
        .agg(vecMean(col("v")).as("mo"))
        .filter(size(col("mo.cv")) > 0)
        .select(col("cid"), col("mo.n").as("n"), col("mo.cv").as("cv"))
      // a centroid assigned zero points this round has no means row; carry
      // it forward (n=0) instead of silently returning < k centroids — a
      // shrunken quantizer would quietly search fewer IVF cells downstream.
      // The carry-forward makes cent(r-1) referenced TWICE per round
      // (assignment broadcast + prev join) — cache each round's k-row
      // centroid relation so the second reference is a cache read, not a
      // re-evaluation of the whole prior-round corpus aggregation (the
      // uncached form doubled lineage per round: 2.1x on bt_100k_kmeans)
      cent = CacheScope.cache(
        cent.select(col("cid"), col("cv").as("__prev"))
          .join(means, Seq("cid"), "left")
          .select(col("cid"), coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("cv"), col("__prev")).as("cv")))
    }
    cent
  }

  /** the m disjoint subvector slices of `v` (double-cast), indexed by
    * subspace — the PQ decomposition column
    */
  private def pqSubs(v: Column, m: Int, subDim: Int): Column =
    array((0 until m).map(j =>
      transform(slice(v, j * subDim + 1, subDim), x => x.cast("double"))): _*)

  /** Product-quantization codebooks (Jégou et al. 2011, "Product
    * Quantization for Nearest Neighbor Search"): split every vector into
    * `m` disjoint `subDim`-dim subvectors and train an independent
    * `ksub`-centroid Lloyd quantizer per subspace — the compression that
    * stores a 100 TB float corpus as m bytes/vector plus a tiny codebook.
    * Output: (sub, cid, cv: array<double>) — m × ksub rows, broadcastable
    * everywhere downstream.
    *
    * Scale: ONE keyed Lloyd loop trains all m sub-quantizers together —
    * `sub` joins the group keys, so each round is one corpus-scan +
    * two aggregations covering every subspace (the previous formulation
    * ran m independent [[kmeansCentroidVectors]] chains: m× the
    * driver-synchronous rounds and m separate cached corpus slices; at
    * sf1 the chains also under-filled the cores — pq_encode 13.6 →
    * 4.0 s, pq_codebooks 2.6 s min). Per-(sub) math is identical to the independent
    * chains (same init ids, same argmin/means/carry-forward expressions),
    * so results are bit-equal and the SQL oracle replay is unchanged. At
    * corpus scale codebooks are trained on a sample anyway — the codebook
    * is the small side; [[pqEncode]] is the full-corpus pass.
    */
  def pqTrainCodebooks(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int, ksub: Int, iters: Int): DataFrame = {
    require(iters >= 1, s"need at least one Lloyd round, got $iters")
    // (id, sub, v): every vector's m disjoint subvectors, cached once —
    // scanned by each of the `iters` rounds
    val pts = CacheScope.cache(corpus
      .select(col(idCol).cast("long").as("id"),
        posexplode(pqSubs(col(vecCol), m, subDim)).as(Seq("sub", "v"))))
    // init: the ksub lowest ids seed every subspace — ordered on the
    // CAST-long id, exactly the ordering each independent chain's
    // pts.orderBy(id).limit(ksub) used (raw-column order would differ
    // for e.g. string-typed numeric ids)
    var cent = corpus
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("__v"))
      .orderBy(col("cid")).limit(ksub)
      .select(col("cid"), posexplode(pqSubs(col("__v"), m, subDim)).as(Seq("sub", "cv")))
      .select(col("sub"), col("cid"), col("cv"))
    for (_ <- 1 to iters) {
      val assigned = pts.join(broadcast(cent), Seq("sub"))
        .select(col("id"), col("sub"), col("v"),
          struct(sqDist(col("v"), col("cv")).as("d"), col("cid")).as("cand"))
        // null-distance candidates drop, as in kmeansCentroidVectors
        .filter(col("cand.d").isNotNull)
        .groupBy(col("id"), col("sub"))
        .agg(min(col("cand")).as("best"), first(col("v")).as("v"))
        .select(col("sub"), col("best.cid").as("cid"), col("v"))
      // the same one-pass exact mean aggregate as kmeansCentroidVectors'
      // (see [[VecMeanAgg]]), keyed by (sub, cid)
      val vecMean = vecMeanUdaf
      val means = assigned
        .groupBy(col("sub"), col("cid"))
        .agg(vecMean(col("v")).as("mo"))
        .filter(size(col("mo.cv")) > 0)
        .select(col("sub"), col("cid"), col("mo.n").as("n"), col("mo.cv").as("cv"))
      // empty-cell carry-forward per (sub, cid), same as the single-space
      // trainer; cache each round's m×ksub relation (referenced twice)
      cent = CacheScope.cache(
        cent.select(col("sub"), col("cid"), col("cv").as("__prev"))
          .join(means, Seq("sub", "cid"), "left")
          .select(col("sub"), col("cid"),
            coalesce(col("n"), lit(0L)).as("n"),
            coalesce(col("cv"), col("__prev")).as("cv")))
    }
    cent
  }

  /** PQ ENCODE — the full-corpus compression pass: each vector becomes m
    * small codes, one per subspace (argmin centroid by squared L2, ties to
    * the smaller cid — `min(struct)`, partial-aggregated, no window).
    * Output: (id, sub, code). Plan at 100 TB: ONE broadcast of the m×ksub
    * codebook against the exploded slices, one hash-agg argmin — the
    * corpus shuffles only by (id, sub) group keys, never pairwise.
    */
  def pqEncode(corpus: DataFrame, codebooks: DataFrame, idCol: String,
      vecCol: String, m: Int, subDim: Int): DataFrame = {
    val cb = broadcast(codebooks.select(col("sub"), col("cid"), col("cv")))
    corpus.select(col(idCol).cast("long").as("id"),
        posexplode(pqSubs(col(vecCol), m, subDim)).as(Seq("sub", "sv")))
      .join(cb, Seq("sub"))
      .select(col("id"), col("sub"),
        struct(sqDist(col("sv"), col("cv")).as("d"), col("cid")).as("cand"))
      .filter(col("cand.d").isNotNull)
      .groupBy(col("id"), col("sub"))
      .agg(min(col("cand")).as("best"))
      .select(col("id"), col("sub"), col("best.cid").as("code"))
  }

  /** PQ asymmetric-distance top-k (ADC): score compressed codes against
    * UNcompressed queries through a per-query lookup table
    * LUT(qid, sub, cid) = ||q_sub − centroid||², so the corpus-side work
    * per row is m table lookups + a sum — never a dim-wide float scan.
    *
    * Plan at 100 TB: the LUT is |queries| × m × ksub rows (tiny,
    * broadcast); codes join it on (sub, code) with no corpus-side
    * pre-shuffle; per-(qid, id) distance is an exact DECIMAL sum of the
    * 6-dp-rounded per-subspace entries (partition-order independent, so
    * results are reproducible under AQE re-planning and match the SQL
    * replay bit-for-bit); selection is the bounded-heap top-k — k rows per
    * partition×query cross the shuffle. Output: (qid, id, rank, dist),
    * nearest first, ties to the smaller id.
    */
  def pqAdcTopK(codes: DataFrame, codebooks: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, m: Int, subDim: Int): DataFrame = {
    val lut = broadcast(
      queries.select(col(idCol).cast("long").as("qid"),
          posexplode(pqSubs(col(vecCol), m, subDim)).as(Seq("sub", "qsv")))
        .join(codebooks, Seq("sub"))
        .select(col("qid"), col("sub"), col("cid").as("code"),
          round(sqDist(col("qsv"), col("cv")), 6).cast("decimal(20,8)").as("d")))
    val summed = codes.join(lut, Seq("sub", "code"))
      .filter(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d")).cast("double").as("dist"))
    // bounded-heap selection wants "best = highest score": negate the
    // distance going in, restore it coming out
    rankTopK(summed.select(col("qid"), col("id"), (-col("dist")).as("score")), k)
      .select(col("qid"), col("id"), col("rank"), (-col("score")).as("dist"))
  }

  /** Near-duplicate pairs by embedding cosine, banded sign-LSH candidates:
    * `bands` independent sign buckets over disjoint dimension ranges; a
    * pair is a candidate iff it collides in ANY band (union + distinct —
    * the classic LSH OR-construction). Per-band bucket count is
    * 2^bitsPerBand, so within-band work is |corpus|²/2^bitsPerBand spread
    * over buckets; more bands raise recall, more bits cut bucket size —
    * both dialable to corpus scale, unlike a single fixed bucketing.
    */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      bands: Int, bitsPerBand: Int, threshold: Double): DataFrame = {
    val keyed = CacheScope.cache(corpus.select(
      col(idCol).as("id") +: col(vecCol).as("v") +: norm(col(vecCol)).as("__nrm") +:
        (0 until bands).map(b =>
          signBucket(col(vecCol), bitsPerBand, b * bitsPerBand).as(s"band$b")): _*)
      ) // cached: both sides of every band join AND the post-dedup vector fetch
        // (the hoisted per-row norm rides it — one vec_dot per surviving pair)
    // candidates carry ONLY (a, b): at dim=1024 the pair-dedup exchange
    // moves 16 bytes per candidate instead of ~8 KB of rider vectors —
    // the vectors re-join from the cached keyed relation AFTER the
    // distinct shrinks the candidate set (the simhashPairs ride-along-
    // only-what-scores discipline)
    val perBand = (0 until bands).map { b =>
      val l = keyed.select(col(s"band$b").as("bk"), col("id").as("a"))
      val r = keyed.select(col(s"band$b").as("bk"), col("id").as("b"))
      l.join(r, Seq("bk")).filter(col("a") < col("b"))
        .select(col("a"), col("b"))
    }
    perBand.reduce(_ unionByName _)
      .dropDuplicates("a", "b")
      .join(keyed.select(col("id").as("a"), col("v").as("va"), col("__nrm").as("na")), Seq("a"))
      .join(keyed.select(col("id").as("b"), col("v").as("vb"), col("__nrm").as("nb")), Seq("b"))
      .select(col("a"), col("b"),
        round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6).as("score"))
      .filter(col("score") >= threshold)
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): drop semantic
    * near-duplicates by clustering the embedding space and comparing only
    * WITHIN clusters. Train the coarse k-means quantizer, assign every
    * vector to its highest-cosine centroid (the [[ivfBuildCells]] argmax,
    * ties to the smaller cid), pair within cells above `threshold`, keep
    * the min-id representative of each duplicate group. Output:
    * (idCol, cell, keep).
    *
    * Scale: within-cell pairing is |cell|² work, so k is the dial — the
    * paper runs ~100k clusters at corpus scale precisely so cells stay
    * O(corpus/k) small; nothing here is all-pairs across cells. Against
    * k-means COLLAPSE (one centroid claiming most of the corpus — k stops
    * helping), cells above `maxCellSize` sub-split by id hash exactly
    * like [[cellScored]]: join volume stays bounded by |corpus|·
    * maxCellSize; a near-dup pair split across subcells of a degenerate
    * cell survives dedup — the same recall trade the cell boundary itself
    * makes, and healthy assignments are unchanged. The pair dedup carries
    * bare (a, b) ids only; the threshold compares the ROUNDED cosine so
    * the oracle's grid matches bit-for-bit.
    */
  def semDedup(embs: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, threshold: Double,
      maxCellSize: Int = 4096): DataFrame = {
    require(maxCellSize >= 1, s"maxCellSize $maxCellSize must be >= 1")
    val anchors = kmeansCentroidVectors(embs, idCol, vecCol, k, iters)
      .select(col("cid").as(idCol),
        transform(col("cv"), x => x.cast("float")).as(vecCol))
    val celled0 = CacheScope.cache(ivfBuildCells(embs, anchors, idCol, vecCol)
      .withColumn("__nrm", norm(col("v")))) // hoisted per-row norm (see [[norm]])
    val nsub = broadcast(celled0.groupBy(col("cell"))
      .agg(ceil(count(lit(1)) / lit(maxCellSize.toDouble)).as("__nsub")))
    val celled = celled0.join(nsub, Seq("cell"))
      .withColumn("__sc", when(col("__nsub") <= 1L, lit(0L))
        .otherwise(pmod(xxhash64(col("id")), col("__nsub"))))
    val l = celled.select(col("cell"), col("__sc"), col("id").as("a"), col("v").as("va"),
      col("__nrm").as("na"))
    val r = celled.select(col("cell"), col("__sc"), col("id").as("b"), col("v").as("vb"),
      col("__nrm").as("nb"))
    val drops = l.join(r, Seq("cell", "__sc"))
      .filter(col("a") < col("b"))
      .filter(round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6) >= threshold)
      .select(col("b").as("id"))
      .distinct()
    celled.select(col("id"), col("cell"))
      .join(drops.withColumn("__d", lit(true)), Seq("id"), "left")
      .select(col("id").as(idCol), col("cell"),
        not(coalesce(col("__d"), lit(false))).as("keep"))
  }

  /** Deterministic sparse random projection (Achlioptas-style ±1 signs,
    * Johnson-Lindenstrauss): out_j = (Σ_i v_i · w_ij) / sqrt(dim),
    * rounded at 6 dp — the dimensionality-reduction front of the ANN
    * scale path (project 64 → 16 before IVF/bucketing and the index
    * shrinks 4× with JL-bounded distortion). Output is EXPLODED to
    * (idCol, j, pv) scalar rows (1-based j) so the gate hashes scalars.
    *
    * The sign matrix w is keyed by md5 of the "(i,j)" coordinate — no RNG
    * state, bit-reproducible on any engine that has md5 — and is built
    * DRIVER-side (dim·outDim hashes, microseconds) into a plan LITERAL:
    * zero per-row hashing, the projection is one ordered zip_with fold
    * per output dim, no shuffle, no UDF. Floats widen exactly to double;
    * both engines fold left-to-right so the 6-dp grid agrees.
    */
  def randomProject(embs: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int): DataFrame =
    embs
      .select(col(idCol),
        posexplode(projectedArray(col(vecCol), dim, outDim)))
      .select(col(idCol), (col("pos") + 1).cast("long").as("j"),
        col("col").as("pv"))

  /** The non-exploded projection: (idCol, `as` array<float>) — rounded
    * double coordinates narrowed to the engine's CANONICAL vector dtype,
    * so every downstream ANN op (native `vec_dot`, sign buckets, IVF,
    * [[bruteForceTopK]]) composes on the projected space unchanged. The
    * float narrowing is replayed by the oracle (`CAST(... AS FLOAT)` then
    * `::DOUBLE[]`), the same FLOAT-first quantization convention as
    * [[canonicalVectors]].
    */
  def randomProjectVec(embs: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int, as: String = "pvec"): DataFrame =
    embs.select(col(idCol),
      transform(projectedArray(col(vecCol), dim, outDim),
        x => x.cast("float")).as(as))

  /** Embedding outlier pruning — the embedding-space quality filter
    * (CLIP-score-filtering analogue with the corpus itself as the
    * reference model): each vector's distance to its GROUP centroid,
    * flagged when beyond the group's q-quantile. Training pipelines drop
    * the flagged tail (mislabeled / off-distribution samples sit far
    * from their group's center).
    *
    * Output: (idCol, groupCol, dist, is_outlier); dist is the euclidean
    * distance to the group mean, rounded at 6 dp. Exact-parity means via
    * the house DECIMAL(30,8)-sum convention (partition-order-independent,
    * same as the Lloyd trainer); the quantile compare is ulp-robust
    * cross-engine for the same reason the perplexity terciles are — dists
    * live on the 6-dp grid, thresholds interpolate on or strictly
    * between grid values.
    *
    * Scale shape: one narrow (group, pos) decimal agg for the means
    * (|groups|·dim rows out, broadcast back), one scan pass for
    * distances, one (group, dist) agg for thresholds (exact percentile —
    * swap in approx_percentile at the 100 TB tier if the per-group value
    * lists outgrow executors), one broadcast compare. Nothing pairwise.
    */
  def centroidOutliers(embs: DataFrame, idCol: String, vecCol: String,
      groupCol: String, q: Double): DataFrame = {
    val e = CacheScope.cache(embs.select(col(idCol), col(groupCol),
      transform(col(vecCol), x => x.cast("double")).as("__v")))
    val cents = e.select(col(groupCol), posexplode(col("__v")))
      .groupBy(col(groupCol), col("pos"))
      .agg((sum(col("col").cast("decimal(30,8)")).cast("double") /
        count(lit(1))).as("m"))
      .groupBy(col(groupCol))
      .agg(array_sort(collect_list(struct(col("pos"), round(col("m"), 6).as("m"))))
        .as("pm"))
      .select(col(groupCol), transform(col("pm"), p => p.getField("m")).as("__cv"))
    val d = CacheScope.cache(e.join(broadcast(cents), Seq(groupCol))
      .select(col(idCol), col(groupCol),
        round(sqrt(aggregate(
          zip_with(col("__v"), col("__cv"), (a, b) => (a - b) * (a - b)),
          lit(0d), (acc, x) => acc + x)), 6).as("dist")))
    val thr = d.groupBy(col(groupCol))
      .agg(percentile(col("dist"), lit(q)).as("__thr"))
    d.join(broadcast(thr), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("dist"),
        (col("dist") > col("__thr")).as("is_outlier"))
  }

  /** the rounded-double projected coordinates (1..outDim) of one vector;
    * fails loudly on a dim mismatch — zip_with would otherwise null-pad
    * the shorter side and every projection would silently come out null */
  private def projectedArray(vec0: Column, dim: Int, outDim: Int): Column = {
    val vec = when(size(vec0) === dim, vec0).otherwise(raise_error(concat(
      lit(s"randomProject: expected $dim-dim vectors, got "),
      size(vec0).cast("string"))))
    // +1 when the first md5 hex char of "i,j" is even — mirrored by the
    // oracle's substr(md5(i||','||j),1,1) IN ('0','2',...,'e')
    def sign(i: Int, j: Int): Double = {
      val b0 = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i,$j".getBytes("UTF-8"))(0)
      if (((b0 >> 4) & 1) == 0) 1.0 else -1.0
    }
    val w = array((1 to outDim).map(j =>
      array((1 to dim).map(i => lit(sign(i, j))): _*)): _*)
    transform(sequence(lit(1), lit(outDim)), j =>
      round(
        aggregate(
          zip_with(vec, element_at(w, j), (v, s) => v * s),
          lit(0d), (acc, x) => acc + x) / math.sqrt(dim.toDouble),
        6))
  }
}
