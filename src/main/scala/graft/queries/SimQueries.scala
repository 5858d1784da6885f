package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.{Pca, Similarity}

/** Embedding similarity-search queries over `embeddings` (64-dim float
  * vectors): exact brute-force top-k, sign-bucketed approximate top-k (the
  * IVF/LSH scale path), cosine near-dup pairs, and exact per-label
  * centroids. Cosine is computed as an ordered double fold on both engines
  * (DuckDB `list_inner_product` ≡ Spark `aggregate(zip_with(...))`), rounded
  * to 6 dp for rank stability.
  */
object SimQueries {

  /** loader with the vector-dtype shield (see Similarity.canonicalVectors:
    * an upstream regeneration widening `embedding` to array<double> must
    * not break the native-float paths; ids/labels stay native — both
    * engines read those directly, so they drift together harmlessly)
    */
  private def emb(s: SparkSession, dir: String): DataFrame =
    Similarity.canonicalVectors(
      s.read.parquet(s"$dir/embeddings.parquet"), "embedding")

  /** shared IVF search oracle: sim_ivf_persisted is the same search as
    * sim_ivf_topk by construction (the index table holds the identical
    * celled relation) — one SQL, two query keys
    */
  private lazy val ivfTopkSql: String =
    s"""WITH e AS (SELECT vec_id, embedding::FLOAT[]::DOUBLE[] AS v FROM embeddings),
         |a AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
         |asg AS (SELECT e.vec_id AS id, cid,
         |          row_number() OVER (PARTITION BY e.vec_id
         |            ORDER BY list_inner_product(cv, v)
         |              / (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product(v, v))) DESC,
         |              cid) AS ark
         |        FROM e CROSS JOIN a),
         |cells AS (SELECT id, cid AS cell FROM asg WHERE ark = 1),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id >= 8 AND vec_id < 13),
         |pr AS (SELECT qid, cid AS cell,
         |         row_number() OVER (PARTITION BY qid ORDER BY
         |           round(list_inner_product(cv, qv)
         |             / (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product(qv, qv))), 6) DESC,
         |           cid) AS prk
         |       FROM q CROSS JOIN a),
         |probe AS (SELECT qid, cell FROM pr WHERE prk <= 2),
         |s AS (SELECT qid, e.vec_id AS vec_id, $cosSql AS score
         |      FROM probe JOIN cells ON probe.cell = cells.cell
         |      JOIN e ON e.vec_id = cells.id
         |      JOIN q USING (qid)
         |      WHERE e.vec_id <> qid),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rk
         |      FROM s)
         |SELECT qid, vec_id, CAST(rk AS BIGINT) AS rnk, score FROM r WHERE rk <= 3
         |ORDER BY qid, rnk""".stripMargin

  private val cosSql =
    """round(list_inner_product(qv, v)
      |      / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v, v))), 6)""".stripMargin

  private def bucketSql(bits: Int, from: Int = 0, src: String = "embedding"): String =
    (0 until bits).map(q =>
      // FLOAT-first like every other oracle read of the embedding column
      // (sign is quantization-stable, but the grid should match anyway)
      s"(CASE WHEN CAST($src[${from + q + 1}] AS FLOAT) >= 0 THEN ${1L << (bits - 1 - q)} ELSE 0 END)")
      .mkString(" + ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sim_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 5), "vec_id", "embedding", 5)
        .select(col("qid"), col("id").as("vec_id"), col("rank").as("rnk"), col("score"))
        .orderBy("qid", "rnk")
    }),

    "sim_ann_bucketed" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.bucketedTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 3, 4)
        .select(col("qid"), col("id").as("vec_id"), col("rank").as("rnk"), col("score"))
        .orderBy("qid", "rnk")
    }),

    // IVF: anchors vec_id<8 are the coarse cells, queries 8..12 probe their
    // 2 best cells and exact-search only those inverted lists
    "sim_ivf_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 8),
        e.filter(col("vec_id") >= 8 && col("vec_id") < 13),
        "vec_id", "embedding", k = 3, nprobe = 2)
        .select(col("qid"), col("id").as("vec_id"), col("rank").as("rnk"), col("score"))
        .orderBy("qid", "rnk")
    }),

    // the build-once/query-many ANN shape: the celled corpus persists as a
    // cell-bucketed table (written once per session+SF), probes run
    // against the TABLE — no assignment aggregation in the probe plan
    // (PlanSpec-pinned). Same results as sim_ivf_topk by construction.
    "sim_ivf_persisted" -> ((s, dir) => {
      val e = emb(s, dir)
      val anchors = e.filter(col("vec_id") < 8)
      // one deterministic table per SF dir; rewrite only when absent so
      // repeated reps measure the PROBE, not the build
      val table = "graft_ivf_idx_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      if (!s.catalog.tableExists(table))
        Similarity.ivfWriteIndex(e, anchors, "vec_id", "embedding", table)
      Similarity.ivfProbe(s.table(table), anchors,
        e.filter(col("vec_id") >= 8 && col("vec_id") < 13),
        "vec_id", "embedding", k = 3, nprobe = 2)
        .select(col("qid"), col("id").as("vec_id"), col("rank").as("rnk"), col("score"))
        .orderBy("qid", "rnk")
    }),

    // the INCREMENTAL index lifecycle: build from the even half, APPEND
    // the odd half as an arriving shard (same anchors, O(shard) cost, no
    // rebuild), probe the table — results must equal the one-shot build,
    // so this row reuses sim_ivf_topk's oracle verbatim
    "sim_ivf_incremental" -> ((s, dir) => {
      val e = emb(s, dir)
      val anchors = e.filter(col("vec_id") < 8)
      val table = "graft_ivf_inc_" + dir.replaceAll("[^a-zA-Z0-9]", "_")
      if (!s.catalog.tableExists(table)) {
        Similarity.ivfWriteIndex(e.filter(col("vec_id") % 2 === 0), anchors,
          "vec_id", "embedding", table)
        Similarity.ivfAppendIndex(e.filter(col("vec_id") % 2 =!= 0), anchors,
          "vec_id", "embedding", table)
      }
      Similarity.ivfProbe(s.table(table), anchors,
        e.filter(col("vec_id") >= 8 && col("vec_id") < 13),
        "vec_id", "embedding", k = 3, nprobe = 2)
        .select(col("qid"), col("id").as("vec_id"), col("rank").as("rnk"), col("score"))
        .orderBy("qid", "rnk")
    }),

    // banded sign-LSH candidates (3 bands x 6 bits over disjoint dims),
    // threshold 0.4 so the candidate union is exercised at this SF
    "sim_neardup_cos" -> ((s, dir) =>
      Similarity.cosineNearDupPairs(emb(s, dir), "vec_id", "embedding",
        bands = 3, bitsPerBand = 6, threshold = 0.4)
        .orderBy("a", "b")),

    // assignment: every corpus vector labeled with its highest-cosine
    // anchor (vec_id < 5, broadcast). argmax via partial-aggregated
    // max(struct(score, -qid)) — no window, ties break to the smaller qid
    "sim_assign" -> ((s, dir) => {
      val e = emb(s, dir)
      // norms hoisted per row/per anchor ahead of the corpus x anchors
      // join — cosine(qv, v) = dot/(sqrt(qv·qv)*sqrt(v·v)) with the same
      // multiply order, so the argmax input is bit-identical
      val q = broadcast(e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qv"),
          sqrt(Similarity.dot(col("embedding"), col("embedding"))).as("__nq")))
      e.select(col("vec_id"), col("embedding").as("v"),
          sqrt(Similarity.dot(col("embedding"), col("embedding"))).as("__nv"))
        .join(q, col("vec_id") =!= col("qid"))
        .select(col("vec_id"),
          struct(
            (Similarity.dot(col("qv"), col("v")) / (col("__nq") * col("__nv"))).as("score"),
            (-col("qid")).as("nq"), col("qid")).as("cand"))
        .groupBy(col("vec_id"))
        .agg(max(col("cand")).as("best"))
        .select(col("vec_id"), col("best.qid").as("best_qid"),
          round(col("best.score"), 6).as("score"))
        .orderBy("vec_id")
    }),

    // int8 storage quantization: per-vector scale + code digest — the
    // oracle recomputes the exact codes (round half-away-from-zero in both
    // engines), so any drift in the quantizer turns the row red
    "emb_quantize" -> ((s, dir) => {
      val e = emb(s, dir)
        .withColumn("__s", Similarity.maxAbs(col("embedding")) / 127.0)
        .withColumn("__q", Similarity.int8Quantize(col("embedding"), col("__s")))
      e.select(
        col("vec_id"),
        round(col("__s"), 6).as("scale"),
        aggregate(col("__q"), lit(0L), (a, x) => a + x).as("qsum"),
        array_min(col("__q")).as("qmin"),
        array_max(col("__q")).as("qmax"))
        .orderBy("vec_id")
    }),

    "emb_centroids" -> ((s, dir) =>
      emb(s, dir).groupBy(col("label"))
        .agg(
          count(lit(1)).as("n"),
          sum(element_at(col("embedding"), 1).cast("decimal(20,8)")).cast("double").as("c1"))
        .orderBy("label")),

    // Lloyd's k-means (3 rounds, k=8, init = lowest vec_ids) — the IVF
    // coarse-quantizer trainer. Output: final centroids flattened to
    // (cid, pos, cval) + cluster size n. Exact-parity means via
    // DECIMAL(20,8) sums, 6-dp rounding between rounds.
    "emb_kmeans" -> ((s, dir) =>
      Similarity.kmeansCentroids(emb(s, dir), "vec_id", "embedding",
        k = 8, iters = 3)
        .orderBy("cid", "pos")),

    // Johnson-Lindenstrauss front of the ANN path: deterministic ±1
    // random projection 64 -> 16 (md5-keyed signs, driver-built literal
    // matrix, ordered folds — Similarity.randomProject's scaladoc has
    // the cross-engine argument); exploded to scalar rows for the gate
    "emb_rand_proj" -> ((s, dir) =>
      Similarity.randomProject(emb(s, dir), "vec_id", "embedding",
        dim = 64, outDim = 16)
        .orderBy("vec_id", "j")),

    // Bulk kNN graph: top-3 same-cell neighbors for EVERY vector — the
    // cell-keyed self-join shape (queries = corpus, so no broadcast probe
    // is possible); feeds graph-based semantic clustering
    "sim_knn_graph" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.knnGraph(e, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 3)
        .select(col("qid"), col("id").as("vec_id"), col("rank").as("rnk"), col("score"))
        .orderBy("qid", "rnk")
    }),

    // kNN-majority label transfer: spread labels from the seeded subset
    // (vec_id % 3 == 0 plays the labeled seed) to every vector by
    // 3-NN majority vote — embedding-space weak labeling
    "sim_knn_classify" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.knnClassify(e, e.filter(col("vec_id") < 8),
          e.filter(col("vec_id") % 3 === 0).select(col("vec_id"), col("label")),
          "vec_id", "embedding", "label", k = 3)
        .orderBy("vec_id")
    }),

    // hard negatives for contrastive training: per vector, the 3 most
    // similar same-cell vectors BELOW the near-dup threshold — close
    // enough to be informative, far enough to be true negatives
    "sim_hard_negatives" -> ((s, dir) => {
      val e = emb(s, dir)
      Similarity.hardNegatives(e, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 3, posThreshold = 0.2)
        .select(col("qid"), col("id").as("vec_id"), col("rank").as("rnk"), col("score"))
        .orderBy("qid", "rnk")
    }),

    // semantic clusters: connected components over the MUTUAL-kNN graph
    // (mutual filter = the standard hubness guard in graph clustering) —
    // the grouping SemDeDup-style curation acts on, built from the same
    // cell-keyed self-join
    "sim_knn_clusters" -> ((s, dir) => {
      val e = emb(s, dir)
      val g = graft.CacheScope.cache(
        Similarity.knnGraph(e, e.filter(col("vec_id") < 8),
          "vec_id", "embedding", k = 3).select(col("qid"), col("id")))
      val mutual = g.as("x").join(g.as("y"),
          col("x.qid") === col("y.id") && col("x.id") === col("y.qid"), "left_semi")
        .where(col("qid") < col("id"))
        .select(col("qid").as("a"), col("id").as("b"))
      graft.functions.Dedup.connectedComponents(
          e.select(col("vec_id")), mutual, "vec_id")
        .select(col("id").as("vec_id"), col("cluster"))
        .orderBy("vec_id")
    }),

    // Data-adaptive reduction next to the JL one: principal axis of the
    // corpus scatter in EXACT fixed-point integer algebra (quantized
    // grid, mean-free scatter, scaled-integer power iteration) — the
    // oracle replays all 12 rounds in HUGEINT to the same bits
    "emb_pca" -> ((s, dir) =>
      Pca.principalAxis(emb(s, dir), "embedding", dim = 64)
        .orderBy("pos")),

    // leading TWO axes via truncating-integer deflation (whitening needs
    // a basis, not one direction) — comp 1 orthogonalizes against comp 0
    // every round with exact dots and truncating division, so the oracle
    // replays both components to the bit
    "emb_pca2" -> ((s, dir) =>
      Pca.principalAxes(emb(s, dir), "embedding", dim = 64, m = 2)
        .orderBy("comp", "pos")),

    // whitening coordinates in the leading-2 deflated basis — the
    // data-adaptive reduced representation (JL's adaptive sibling)
    "emb_whiten" -> ((s, dir) =>
      Pca.projectAxes(emb(s, dir), "vec_id", "embedding", dim = 64, m = 2)
        .orderBy("vec_id")),

    // per-vector projection onto that axis (whitening/ranking scores):
    // the axis solve is driver-side on the constant-size scatter; the
    // scoring pass is a pure scan expression, zero exchanges
    "emb_pca_scores" -> ((s, dir) =>
      Pca.projectPrincipal(emb(s, dir), "vec_id", "embedding", dim = 64)
        .orderBy("vec_id")),

    // Embedding outlier pruning: distance to the label centroid, flagged
    // beyond the label's 0.9-quantile — the embedding-space quality
    // filter (drop the off-distribution tail before training)
    "emb_outliers" -> ((s, dir) =>
      Similarity.centroidOutliers(emb(s, dir), "vec_id", "embedding",
        "label", q = 0.9)
        .orderBy("vec_id")),

    // ANN quality eval: recall@5 of the PROJECTED-space search against
    // the exact top-k, per query — the measurement that justifies (or
    // rejects) an approximate index before it ships; both legs are the
    // same ops the sim_topk / sim_rand_proj_topk gates pin. On THIS
    // fixture recall is ~0 by construction (near-random unit vectors:
    // every cosine is ~0±noise, so the exact top-5 is a noise ordering
    // any 16-dim projection scrambles) — the eval correctly reporting
    // "don't ship this index for this data" is the point of the op
    "sim_recall_at_k" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 5)
      val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
        .select(col("qid"), col("id"))
      val p = Similarity.randomProjectVec(e, "vec_id", "embedding",
        dim = 64, outDim = 16)
      val approx = Similarity.bruteForceTopK(p,
        p.filter(col("vec_id") < 5), "vec_id", "pvec", 5)
        .select(col("qid"), col("id"))
      val hits = exact.join(approx, Seq("qid", "id"))
        .groupBy(col("qid")).agg(count(lit(1)).as("n_hits"))
      q.select(col("vec_id").as("qid")).join(hits, Seq("qid"), "left")
        .select(col("qid").as("vec_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)) / 5.0, 6).as("recall"))
        .orderBy("vec_id")
    }),

    // search IN the projected space: JL projection 64 -> 16 feeds the
    // SAME brute-force top-k op (canonical float dtype, native vec_dot)
    // — the reduced-dimension index path end-to-end; ranks differ from
    // sim_topk exactly by the JL distortion, and the oracle replays the
    // full project -> float-narrow -> cosine -> rank chain
    "sim_rand_proj_topk" -> ((s, dir) => {
      val p = Similarity.randomProjectVec(emb(s, dir), "vec_id", "embedding",
        dim = 64, outDim = 16)
      Similarity.bruteForceTopK(p, p.filter(col("vec_id") < 5), "vec_id", "pvec", 5)
        .select(col("qid"), col("id").as("vec_id"), col("rank").as("rnk"), col("score"))
        .orderBy("qid", "rnk")
    }),

    // SemDeDup: cluster the embedding space (2 Lloyd rounds), compare
    // cosines WITHIN cells only, keep the min-id representative of every
    // near-duplicate group — the semantic layer of the dedup suite (k is
    // the cell-size dial; nothing crosses cells)
    "sem_dedup" -> ((s, dir) =>
      Similarity.semDedup(emb(s, dir), "vec_id", "embedding",
        k = 8, iters = 2, threshold = 0.35)
        .orderBy("vec_id")),

    // Product quantization (Jégou et al. 2011) — train m=4 independent
    // 16-dim sub-quantizers (8 centroids, 2 Lloyd rounds each): the
    // codebook that compresses a float corpus to m codes/vector
    "pq_codebooks" -> ((s, dir) =>
      Similarity.pqTrainCodebooks(emb(s, dir), "vec_id", "embedding",
        m = 4, subDim = 16, ksub = 8, iters = 2)
        .select(col("sub"), col("cid"), col("n"), posexplode(col("cv")))
        .select(col("sub"), col("cid"), col("pos").cast("long").as("pos"),
          col("col").as("cval"), col("n"))
        .orderBy("sub", "cid", "pos")),

    // the full-corpus compression pass: every vector -> m argmin codes
    // (one codebook broadcast + one partial-aggregated argmin)
    "pq_encode" -> ((s, dir) => {
      val e = emb(s, dir)
      val cb = Similarity.pqTrainCodebooks(e, "vec_id", "embedding",
        m = 4, subDim = 16, ksub = 8, iters = 2)
      Similarity.pqEncode(e, cb, "vec_id", "embedding", m = 4, subDim = 16)
        .select(col("id").as("vec_id"), col("sub"), col("code"))
        .orderBy("vec_id", "sub")
    }),

    // ADC search: queries 8..12 score the COMPRESSED corpus through a
    // broadcast per-query lookup table — m lookups + an exact DECIMAL sum
    // per candidate, bounded-heap top-3 by asymmetric distance
    "pq_adc_topk" -> ((s, dir) => {
      val e = emb(s, dir)
      val cb = Similarity.pqTrainCodebooks(e, "vec_id", "embedding",
        m = 4, subDim = 16, ksub = 8, iters = 2)
      val codes = Similarity.pqEncode(e, cb, "vec_id", "embedding",
        m = 4, subDim = 16)
      Similarity.pqAdcTopK(codes, cb,
        e.filter(col("vec_id") >= 8 && col("vec_id") < 13),
        "vec_id", "embedding", k = 3, m = 4, subDim = 16)
        .select(col("qid"), col("id").as("vec_id"),
          col("rank").as("rnk"), col("dist"))
        .orderBy("qid", "rnk")
    }),

    // the FULL FAISS-style pipeline in one plan: TRAIN the coarse
    // quantizer (2 Lloyd rounds) then build the inverted file and search
    // it — cells are the learned centroids instead of raw corpus rows.
    // Centroids are float-cast on both engines so the cosine inputs match
    // bit-for-bit.
    "sim_ivf_kmeans" -> ((s, dir) => {
      val e = emb(s, dir)
      val anchors = Similarity
        .kmeansCentroidVectors(e, "vec_id", "embedding", k = 8, iters = 2)
        .select(col("cid").as("vec_id"),
          transform(col("cv"), x => x.cast("float")).as("embedding"))
      Similarity.ivfTopK(e, anchors,
        e.filter(col("vec_id") >= 8 && col("vec_id") < 13),
        "vec_id", "embedding", k = 3, nprobe = 2)
        .select(col("qid"), col("id").as("vec_id"),
          col("rank").as("rnk"), col("score"))
        .orderBy("qid", "rnk")
    })
  )

  val oracles: Map[String, String] = Map(
    "sim_topk" ->
      s"""WITH e AS (SELECT vec_id, embedding::FLOAT[]::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         |s AS (SELECT qid, e.vec_id AS vec_id, $cosSql AS score
         |      FROM q, e WHERE e.vec_id <> qid),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rk
         |      FROM s)
         |SELECT qid, vec_id, CAST(rk AS BIGINT) AS rnk, score FROM r WHERE rk <= 5
         |ORDER BY qid, rnk""".stripMargin,

    "sim_ann_bucketed" ->
      s"""WITH e AS (SELECT vec_id, embedding::FLOAT[]::DOUBLE[] AS v,
         |             ${bucketSql(4)} AS bucket FROM embeddings),
         |q AS (SELECT vec_id AS qid, v AS qv, bucket FROM e WHERE vec_id < 10),
         |s AS (SELECT qid, e.vec_id AS vec_id, $cosSql AS score
         |      FROM q JOIN e USING (bucket) WHERE e.vec_id <> qid),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rk
         |      FROM s)
         |SELECT qid, vec_id, CAST(rk AS BIGINT) AS rnk, score FROM r WHERE rk <= 3
         |ORDER BY qid, rnk""".stripMargin,

    "sim_ivf_topk" -> ivfTopkSql,

    "sim_ivf_persisted" -> ivfTopkSql,

    // build+append must be indistinguishable from the one-shot build
    "sim_ivf_incremental" -> ivfTopkSql,

    "sim_neardup_cos" ->
      s"""WITH e AS (SELECT vec_id, embedding::FLOAT[]::DOUBLE[] AS v,
         |             ${bucketSql(6, 0)} AS b0, ${bucketSql(6, 6)} AS b1,
         |             ${bucketSql(6, 12)} AS b2 FROM embeddings),
         |cand AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b FROM e x JOIN e y ON x.b0 = y.b0 AND x.vec_id < y.vec_id
         |  UNION
         |  SELECT x.vec_id AS a, y.vec_id AS b FROM e x JOIN e y ON x.b1 = y.b1 AND x.vec_id < y.vec_id
         |  UNION
         |  SELECT x.vec_id AS a, y.vec_id AS b FROM e x JOIN e y ON x.b2 = y.b2 AND x.vec_id < y.vec_id),
         |s AS (SELECT a, b,
         |        round(list_inner_product(x.v, y.v)
         |          / (sqrt(list_inner_product(x.v, x.v)) * sqrt(list_inner_product(y.v, y.v))), 6) AS score
         |      FROM cand JOIN e x ON x.vec_id = a JOIN e y ON y.vec_id = b)
         |SELECT a, b, score FROM s WHERE score >= 0.4 ORDER BY a, b""".stripMargin,

    "sim_assign" ->
      """WITH e AS (SELECT vec_id, embedding::FLOAT[]::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
        |s AS (SELECT e.vec_id, qid,
        |        list_inner_product(qv, v)
        |          / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v, v))) AS score
        |      FROM e JOIN q ON e.vec_id <> qid),
        |r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
        |                                   ORDER BY score DESC, qid) AS rk FROM s)
        |SELECT vec_id, qid AS best_qid, round(score, 6) AS score
        |FROM r WHERE rk = 1 ORDER BY vec_id""".stripMargin,

    "emb_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::FLOAT[]::DOUBLE[] AS v FROM embeddings),
        |sc AS (SELECT vec_id, v,
        |         list_max(list_transform(v, x -> abs(x))) / 127.0 AS s FROM e),
        |q AS (SELECT vec_id, s,
        |        CASE WHEN s = 0 THEN list_transform(v, x -> 0)
        |             ELSE list_transform(v, x -> CAST(round(x / s) AS INTEGER)) END AS qv
        |      FROM sc)
        |SELECT vec_id, round(s, 6) AS scale,
        |  CAST(list_sum(qv) AS BIGINT) AS qsum,
        |  CAST(list_min(qv) AS INTEGER) AS qmin,
        |  CAST(list_max(qv) AS INTEGER) AS qmax
        |FROM q ORDER BY vec_id""".stripMargin,

    "emb_centroids" ->
      """SELECT label, COUNT(*) AS n,
        |  CAST(SUM(CAST(CAST(CAST(embedding[1] AS FLOAT) AS DOUBLE) AS DECIMAL(20,8))) AS DOUBLE) AS c1
        |FROM embeddings GROUP BY label ORDER BY label""".stripMargin,

    "emb_kmeans" -> kmeansSql(k = 8, iters = 3, dim = 64),

    // outlier replay: DECIMAL(30,8)-sum label means (cast to DOUBLE
    // before dividing — decimal-division scale rules differ between
    // engines), ordered squared-distance fold, per-label type-7 quantile
    "emb_outliers" ->
      """WITH e AS (SELECT vec_id, label, embedding::FLOAT[]::DOUBLE[] AS v FROM embeddings),
        |cm AS (SELECT label, j,
        |         ROUND(CAST(SUM(CAST(v[j] AS DECIMAL(30,8))) AS DOUBLE)
        |               / COUNT(*), 6) AS cv
        |       FROM e CROSS JOIN generate_series(1, 64) AS g(j)
        |       GROUP BY label, j),
        |c AS (SELECT label, list(cv ORDER BY j) AS cvs FROM cm GROUP BY label),
        |d AS (SELECT vec_id, e.label,
        |        ROUND(sqrt(list_reduce(
        |          list_transform(generate_series(1, 64),
        |            j -> (v[j] - cvs[j]) * (v[j] - cvs[j])),
        |          (a, b) -> a + b)), 6) AS dist
        |      FROM e JOIN c USING (label)),
        |t AS (SELECT label, quantile_cont(dist, 0.9) AS thr FROM d GROUP BY label)
        |SELECT vec_id, label, dist, dist > thr AS is_outlier
        |FROM d JOIN t USING (label) ORDER BY vec_id""".stripMargin,

    // recall replay: both legs' CTEs composed, hit counts per query with
    // zero-recall queries preserved
    "sim_recall_at_k" ->
      s"""WITH e0 AS (SELECT vec_id, embedding::FLOAT[]::DOUBLE[] AS v0 FROM embeddings),
         |xq AS (SELECT vec_id AS qid, v0 AS qv FROM e0 WHERE vec_id < 5),
         |xs AS (SELECT qid, e0.vec_id AS id,
         |         round(list_inner_product(qv, v0)
         |           / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v0, v0))), 6) AS score
         |       FROM xq, e0 WHERE e0.vec_id <> qid),
         |xr AS (SELECT qid, id FROM (
         |         SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk
         |         FROM xs) WHERE rk <= 5),
         |e AS (SELECT vec_id, (list_transform(generate_series(1, 16), j ->
         |        CAST(ROUND(list_reduce(
         |          list_transform(generate_series(1, 64), i -> v0[i] *
         |            (CASE WHEN substr(md5(i || ',' || j), 1, 1)
         |                  IN ('0','2','4','6','8','a','c','e')
         |             THEN 1.0 ELSE -1.0 END)),
         |          (a, b) -> a + b) / sqrt(64.0), 6) AS FLOAT)))::DOUBLE[] AS v
         |      FROM e0),
         |pq AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         |ps AS (SELECT qid, e.vec_id AS id,
         |         round(list_inner_product(qv, v)
         |           / (sqrt(list_inner_product(qv, qv)) * sqrt(list_inner_product(v, v))), 6) AS score
         |       FROM pq, e WHERE e.vec_id <> qid),
         |pr AS (SELECT qid, id FROM (
         |         SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk
         |         FROM ps) WHERE rk <= 5),
         |h AS (SELECT qid, COUNT(*) AS n_hits FROM xr JOIN pr USING (qid, id) GROUP BY qid)
         |SELECT xq.qid AS vec_id, COALESCE(n_hits, 0) AS n_hits,
         |       ROUND(COALESCE(n_hits, 0) / 5.0, 6) AS recall
         |FROM xq LEFT JOIN h ON h.qid = xq.qid ORDER BY vec_id""".stripMargin,

    "sim_rand_proj_topk" ->
      s"""WITH e0 AS (SELECT vec_id, embedding::FLOAT[]::DOUBLE[] AS v0 FROM embeddings),
         |e AS (SELECT vec_id, (list_transform(generate_series(1, 16), j ->
         |        CAST(ROUND(list_reduce(
         |          list_transform(generate_series(1, 64), i -> v0[i] *
         |            (CASE WHEN substr(md5(i || ',' || j), 1, 1)
         |                  IN ('0','2','4','6','8','a','c','e')
         |             THEN 1.0 ELSE -1.0 END)),
         |          (a, b) -> a + b) / sqrt(64.0), 6) AS FLOAT)))::DOUBLE[] AS v
         |      FROM e0),
         |q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id < 5),
         |s AS (SELECT qid, e.vec_id AS vec_id, $cosSql AS score
         |      FROM q, e WHERE e.vec_id <> qid),
         |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rk
         |      FROM s)
         |SELECT qid, vec_id, CAST(rk AS BIGINT) AS rnk, score FROM r WHERE rk <= 5
         |ORDER BY qid, rnk""".stripMargin,

    // random-projection replay: same md5 sign rule (first hex char even
    // -> +1), same left-to-right fold, /sqrt(64), 6-dp grid
    "emb_rand_proj" ->
      """WITH e AS (SELECT vec_id, embedding::FLOAT[]::DOUBLE[] AS v FROM embeddings)
        |SELECT vec_id, j, ROUND(list_reduce(
        |    list_transform(generate_series(1, 64), i -> v[i] *
        |      (CASE WHEN substr(md5(i || ',' || j), 1, 1)
        |            IN ('0','2','4','6','8','a','c','e')
        |       THEN 1.0 ELSE -1.0 END)),
        |    (a, b) -> a + b) / sqrt(64.0), 6) AS pv
        |FROM e CROSS JOIN generate_series(1, 16) AS g(j)
        |ORDER BY vec_id, j""".stripMargin,

    // same assignment CTEs as the IVF probe path; candidates are the
    // within-cell pairs, ranked on the 6-dp grid with smaller-id ties
    "sim_knn_graph" -> ("WITH " + knnGraphChain +
      """fin AS (SELECT qid, vec_id, CAST(rk AS BIGINT) AS rnk, score FROM r WHERE rk <= 3)
        |SELECT qid, vec_id, rnk, score FROM fin ORDER BY qid, rnk""".stripMargin),

    // knn chain + labeled-seed join + majority vote (count desc, smaller
    // label on ties — the max(struct) replay)
    "sim_knn_classify" -> ("WITH " + knnGraphChain +
      """knn AS (SELECT qid, vec_id FROM r WHERE rk <= 3),
        |votes AS (SELECT k.qid, CAST(emb.label AS BIGINT) AS lbl, COUNT(*) AS n
        |  FROM knn k JOIN embeddings emb ON emb.vec_id = k.vec_id
        |  WHERE emb.vec_id % 3 = 0 GROUP BY 1, 2),
        |best AS (SELECT qid, lbl, n,
        |    row_number() OVER (PARTITION BY qid ORDER BY n DESC, lbl) AS rk2
        |  FROM votes)
        |SELECT qid AS vec_id, lbl AS pred_label, n AS n_votes
        |FROM best WHERE rk2 = 1 ORDER BY vec_id""".stripMargin),

    // knn chain + positive-threshold filter BEFORE the rank
    "sim_hard_negatives" -> ("WITH " + knnGraphChain +
      """neg AS (SELECT qid, vec_id, score,
        |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS nrk
        |  FROM s WHERE score < 0.2)
        |SELECT qid, vec_id, CAST(nrk AS BIGINT) AS rnk, score FROM neg WHERE nrk <= 3
        |ORDER BY qid, rnk""".stripMargin),

    // the knn chain + mutual filter + the house recursive-CTE CC replay
    "sim_knn_clusters" -> ("WITH RECURSIVE " + knnGraphChain +
      """knn AS (SELECT qid, vec_id FROM r WHERE rk <= 3),
        |mut AS (SELECT x.qid AS a, x.vec_id AS b FROM knn x
        |  JOIN knn y ON y.qid = x.vec_id AND y.vec_id = x.qid
        |  WHERE x.qid < x.vec_id),
        |uedges AS (SELECT a, b FROM mut UNION ALL SELECT b AS a, a AS b FROM mut),
        |reach(id, rt) AS (
        |  SELECT vec_id, vec_id FROM embeddings
        |  UNION
        |  SELECT ue.a, reach.rt FROM uedges ue JOIN reach ON ue.b = reach.id)
        |SELECT id AS vec_id, MIN(rt) AS cluster FROM reach
        |GROUP BY id ORDER BY vec_id""".stripMargin),

    // full fixed-point PCA replay: quantized grid, HUGEINT mean-free
    // scatter, capped entries, 12 unrolled matvec rounds, sign fix —
    // every step integer algebra, zero FP tolerance
    "emb_pca" -> (pcaCtes(dim = 64, iters = 12) +
      """fin AS (SELECT CAST(pos AS BIGINT) AS pos, CAST(av AS BIGINT) AS loading FROM axis)
        |SELECT pos, loading FROM fin ORDER BY pos""".stripMargin),

    "emb_pca2" -> (pca2Ctes(dim = 64, iters = 12) +
      """fin AS (SELECT CAST(0 AS BIGINT) AS comp, CAST(pos AS BIGINT) AS pos,
        |    CAST(av AS BIGINT) AS loading FROM axis
        |  UNION ALL
        |  SELECT CAST(1 AS BIGINT), CAST(pos AS BIGINT), CAST(av AS BIGINT) FROM ax1)
        |SELECT comp, pos, loading FROM fin ORDER BY comp, pos""".stripMargin),

    "emb_whiten" -> (pca2Ctes(dim = 64, iters = 12) +
      s"""el AS MATERIALIZED (SELECT id, u.t.pos AS pos, u.t.qe AS qe FROM (
         |    SELECT id, UNNEST(list_transform(range(0, 64),
         |      p -> {'pos': p, 'qe': qv[p+1]})) AS t FROM q) u)
         |SELECT e.id AS vec_id,
         |       CAST(SUM(CAST(e.qe AS HUGEINT) * x0.av) AS BIGINT) AS score0,
         |       CAST(SUM(CAST(e.qe AS HUGEINT) * x1.av) AS BIGINT) AS score1
         |FROM el e JOIN axis x0 ON x0.pos = e.pos JOIN ax1 x1 ON x1.pos = e.pos
         |GROUP BY 1 ORDER BY vec_id""".stripMargin),

    "emb_pca_scores" -> (pcaCtes(dim = 64, iters = 12) +
      s"""el AS MATERIALIZED (SELECT id, u.t.pos AS pos, u.t.qe AS qe FROM (
         |    SELECT id, UNNEST(list_transform(range(0, 64),
         |      p -> {'pos': p, 'qe': qv[p+1]})) AS t FROM q) u)
         |SELECT e.id AS vec_id, CAST(SUM(CAST(e.qe AS HUGEINT) * x.av) AS BIGINT) AS score
         |FROM el e JOIN axis x ON x.pos = e.pos
         |GROUP BY 1 ORDER BY vec_id""".stripMargin),

    "pq_codebooks" -> pqCodebooksSql,

    "pq_encode" -> pqEncodeSql,

    "pq_adc_topk" -> pqAdcSql,

    "sim_ivf_kmeans" -> ivfKmeansSql(k = 8, iters = 2, dim = 64),

    "sem_dedup" -> semDedupSql(k = 8, iters = 2, dim = 64, threshold = 0.35)
  )

  /** the [[graft.functions.Similarity.knnGraph]] chain as DuckDB CTEs
    * through the ranked relation `r` (trailing comma; prepend WITH or
    * WITH RECURSIVE) — anchors vec_id < 8, same assignment/tie
    * conventions as the IVF probe oracles
    */
  private def knnGraphChain: String =
    s"""e AS MATERIALIZED (SELECT vec_id, embedding::FLOAT[]::DOUBLE[] AS v FROM embeddings),
       |a AS MATERIALIZED (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < 8),
       |asg AS MATERIALIZED (SELECT e.vec_id AS id, cid,
       |          row_number() OVER (PARTITION BY e.vec_id
       |            ORDER BY list_inner_product(cv, v)
       |              / (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product(v, v))) DESC,
       |              cid) AS ark
       |        FROM e CROSS JOIN a),
       |cells AS MATERIALIZED (SELECT id, cid AS cell FROM asg WHERE ark = 1),
       |s AS MATERIALIZED (SELECT cq.id AS qid, cc.id AS vec_id,
       |        round(list_inner_product(eq.v, ec.v)
       |          / (sqrt(list_inner_product(eq.v, eq.v))
       |             * sqrt(list_inner_product(ec.v, ec.v))), 6) AS score
       |      FROM cells cq JOIN cells cc ON cc.cell = cq.cell AND cc.id <> cq.id
       |      JOIN e eq ON eq.vec_id = cq.id JOIN e ec ON ec.vec_id = cc.id),
       |r AS MATERIALIZED (SELECT *,
       |        row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rk
       |      FROM s),
       |""".stripMargin

  /** comp-1 extension of [[pcaCtes]]: the deflated power iteration —
    * each round matvec (x), scalar Gram-Schmidt coefficient against the
    * comp-0 `axis` (truncating HUGEINT division, exactly BigInt `/`),
    * orthogonalized residual (o), max-normalisation (u) — ending with the
    * sign-fixed `ax1` relation + trailing comma
    */
  private def pca2Ctes(dim: Int, iters: Int): String = {
    val sb = new StringBuilder(pcaCtes(dim, iters))
    sb.append(
      s"""dvv AS MATERIALIZED (SELECT SUM(av * av) AS pp FROM axis),
         |u0 AS MATERIALIZED (SELECT UNNEST(range(0, $dim)) AS pos,
         |    CAST(${Pca.VScale} AS HUGEINT) AS av),
         |""".stripMargin)
    for (r <- 0 until iters) {
      sb.append(
        s"""x$r AS MATERIALIZED (SELECT f.i AS pos, SUM(f.s * v.av) AS w
           |  FROM sm f JOIN u$r v ON v.pos = f.j GROUP BY 1),
           |c$r AS MATERIALIZED (SELECT CASE WHEN (SELECT pp FROM dvv) = 0
           |    THEN CAST(0 AS HUGEINT)
           |    ELSE (SELECT SUM(x.w * a.av) FROM x$r x JOIN axis a ON a.pos = x.pos)
           |         // (SELECT pp FROM dvv) END AS c),
           |o$r AS MATERIALIZED (SELECT x.pos, x.w - (SELECT c FROM c$r) * a.av AS w
           |  FROM x$r x JOIN axis a ON a.pos = x.pos),
           |n$r AS MATERIALIZED (SELECT MAX(ABS(w)) AS m FROM o$r),
           |u${r + 1} AS MATERIALIZED (SELECT pos,
           |    CASE WHEN (SELECT m FROM n$r) = 0 THEN CAST(0 AS HUGEINT)
           |         ELSE w * ${Pca.VScale} // (SELECT m FROM n$r) END AS av
           |  FROM o$r),
           |""".stripMargin)
    }
    sb.append(
      s"""sgn1 AS (SELECT CASE WHEN (SELECT av FROM u$iters WHERE av <> 0
         |    ORDER BY pos LIMIT 1) < 0 THEN -1 ELSE 1 END AS g),
         |ax1 AS MATERIALIZED (SELECT pos, av * (SELECT g FROM sgn1) AS av FROM u$iters),
         |""".stripMargin)
    sb.toString
  }

  /** the [[graft.functions.Pca]] pipeline as DuckDB CTEs, through the
    * sign-fixed `axis` relation: quantize (identical FLOOR grid), pair-
    * product + per-position HUGEINT sums, mean-free scatter
    * S = n·Σqq − (Σq)(Σq)ᵀ, magnitude cap by truncating division
    * (DuckDB `//` truncates toward zero exactly like BigInt `/`), then
    * `iters` unrolled scaled-integer matvec rounds. All CTEs
    * MATERIALIZED — each round references the previous twice.
    */
  private def pcaCtes(dim: Int, iters: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH q AS MATERIALIZED (
         |  SELECT vec_id AS id, list_transform(embedding::FLOAT[],
         |    x -> CAST(FLOOR(CAST(x AS DOUBLE) * ${Pca.QuantScale}) AS BIGINT)) AS qv
         |  FROM embeddings),
         |ps AS MATERIALIZED (SELECT u.e.i AS i, u.e.j AS j, SUM(u.e.p) AS spp FROM (
         |    SELECT UNNEST(flatten(list_transform(range(0, $dim), i ->
         |      list_transform(range(i, $dim), j ->
         |        {'i': i, 'j': j, 'p': CAST(qv[i+1] AS HUGEINT) * qv[j+1]})))) AS e
         |    FROM q) u GROUP BY 1, 2),
         |cs AS MATERIALIZED (SELECT u.t.pos AS pos, SUM(CAST(u.t.qe AS HUGEINT)) AS sq FROM (
         |    SELECT UNNEST(list_transform(range(0, $dim),
         |      p -> {'pos': p, 'qe': qv[p+1]})) AS t FROM q) u GROUP BY 1),
         |nn AS MATERIALIZED (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM q),
         |s0 AS MATERIALIZED (SELECT p.i, p.j,
         |    (SELECT n FROM nn) * p.spp - a.sq * b.sq AS s
         |  FROM ps p JOIN cs a ON a.pos = p.i JOIN cs b ON b.pos = p.j),
         |sd AS MATERIALIZED (SELECT GREATEST(CAST(1 AS HUGEINT),
         |    (SELECT MAX(ABS(s)) FROM s0) // ${Pca.SCap}) AS d),
         |sm AS MATERIALIZED (
         |  SELECT i, j, s // (SELECT d FROM sd) AS s FROM s0
         |  UNION ALL
         |  SELECT j AS i, i AS j, s // (SELECT d FROM sd) AS s FROM s0 WHERE i <> j),
         |v0 AS MATERIALIZED (SELECT UNNEST(range(0, $dim)) AS pos,
         |    CAST(${Pca.VScale} AS HUGEINT) AS av),
         |""".stripMargin)
    for (r <- 0 until iters) {
      sb.append(
        s"""w$r AS MATERIALIZED (SELECT f.i AS pos, SUM(f.s * v.av) AS w
           |  FROM sm f JOIN v$r v ON v.pos = f.j GROUP BY 1),
           |m$r AS MATERIALIZED (SELECT MAX(ABS(w)) AS m FROM w$r),
           |v${r + 1} AS MATERIALIZED (SELECT pos,
           |    CASE WHEN (SELECT m FROM m$r) = 0 THEN CAST(0 AS HUGEINT)
           |         ELSE w * ${Pca.VScale} // (SELECT m FROM m$r) END AS av
           |  FROM w$r),
           |""".stripMargin)
    }
    sb.append(
      s"""sgn AS (SELECT CASE WHEN (SELECT av FROM v$iters WHERE av <> 0
         |    ORDER BY pos LIMIT 1) < 0 THEN -1 ELSE 1 END AS g),
         |axis AS MATERIALIZED (SELECT pos, av * (SELECT g FROM sgn) AS av FROM v$iters),
         |""".stripMargin)
    sb.toString
  }

  /** composite oracle: k-means chain -> cosine-argmax cells -> within-cell
    * pair threshold on the ROUNDED cosine grid -> min-id keeper
    */
  private def semDedupSql(k: Int, iters: Int, dim: Int, threshold: Double): String = {
    val anchorCos =
      """list_inner_product(cv, v)
        |              / (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product(v, v)))""".stripMargin
    val pairCos =
      """round(list_inner_product(ea.v, eb.v)
        |        / (sqrt(list_inner_product(ea.v, ea.v)) * sqrt(list_inner_product(eb.v, eb.v))), 6)""".stripMargin
    s"""WITH ${kmeansCtes(k, iters, dim)},
       |anch AS (SELECT cid, list_transform(cv, y -> CAST(CAST(y AS FLOAT) AS DOUBLE)) AS cv
       |  FROM c$iters),
       |asg AS (SELECT e.id, cid,
       |          row_number() OVER (PARTITION BY e.id
       |            ORDER BY $anchorCos DESC, cid) AS ark
       |        FROM e CROSS JOIN anch),
       |cells AS (SELECT id, cid AS cell FROM asg WHERE ark = 1),
       |prs AS (SELECT x.id AS a, y.id AS b
       |        FROM cells x JOIN cells y ON x.cell = y.cell AND x.id < y.id
       |        JOIN e ea ON ea.id = x.id JOIN e eb ON eb.id = y.id
       |        WHERE $pairCos >= $threshold),
       |drops AS (SELECT DISTINCT b AS id FROM prs)
       |SELECT cells.id AS vec_id, cell, (drops.id IS NULL) AS keep
       |FROM cells LEFT JOIN drops ON drops.id = cells.id
       |ORDER BY vec_id""".stripMargin
  }

  /** PQ oracle params — mirror the query-side m/subDim/ksub/iters.
    * `final` without type ascription = compile-time constants, so the
    * `oracles` map (initialized earlier in declaration order) sees the
    * real values, not the pre-init 0 default.
    */
  private final val pqM = 4
  private final val pqSubDim = 16
  private final val pqKsub = 8
  private final val pqIters = 2

  /** m independent namespaced Lloyd chains, one per 16-dim subspace slice */
  private def pqChains: String =
    (0 until pqM).map { j =>
      kmeansCtesNs(s"s$j", pqKsub, pqIters, pqSubDim,
        s"embedding[${j * pqSubDim + 1}:${(j + 1) * pqSubDim}]")
    }.mkString(",\n")

  /** squared-L2 between a sliced vector (alias e) and a centroid (alias
    * c) — the same prepended-seed left fold the Spark side computes
    */
  private def pqSubDist: String =
    s"""list_reduce(list_prepend(0.0, list_transform(generate_series(1, $pqSubDim),
       |        i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), (a, b) -> a + b)""".stripMargin

  /** per-subspace argmin code assignment (ties to the smaller cid) */
  private def pqEncodeBranches: String =
    (0 until pqM).map { j =>
      s"""SELECT id, $j AS sub, cid AS code FROM (
         |    SELECT e.id, c.cid, $pqSubDist AS d
         |    FROM s${j}e e, s${j}c$pqIters c)
         |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY d, cid) = 1""".stripMargin
    }.mkString("\n  UNION ALL ")

  private def pqCodebooksSql: String = {
    val branches = (0 until pqM).map { j =>
      s"""SELECT $j AS sub, cid, n, unnest(cv) AS cval, unnest(range(0, $pqSubDim)) AS pos
         |  FROM s${j}c$pqIters""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH $pqChains
       |SELECT sub, cid, pos, cval, n FROM (
       |  $branches)
       |ORDER BY sub, cid, pos""".stripMargin
  }

  private def pqEncodeSql: String =
    s"""WITH $pqChains,
       |enc AS (
       |  $pqEncodeBranches)
       |SELECT id AS vec_id, sub, code FROM enc ORDER BY vec_id, sub""".stripMargin

  /** ADC: per-query LUT of 6-dp-rounded per-subspace distances as exact
    * DECIMAL(20,8), summed per (qid, id) — bit-identical to the Spark
    * side's decimal sum regardless of partition/merge order
    */
  private def pqAdcSql: String = {
    val luts = (0 until pqM).map { j =>
      s"""SELECT e.id AS qid, $j AS sub, c.cid AS code,
         |    CAST(round($pqSubDist, 6) AS DECIMAL(20,8)) AS d
         |  FROM s${j}e e, s${j}c$pqIters c WHERE e.id >= 8 AND e.id < 13""".stripMargin
    }.mkString("\n  UNION ALL ")
    s"""WITH $pqChains,
       |enc AS (
       |  $pqEncodeBranches),
       |lut AS (
       |  $luts),
       |sums AS (SELECT qid, id, CAST(SUM(d) AS DOUBLE) AS dist
       |  FROM enc JOIN lut USING (sub, code) WHERE id <> qid
       |  GROUP BY qid, id)
       |SELECT qid, id AS vec_id,
       |  CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS BIGINT) AS rnk,
       |  dist
       |FROM sums
       |QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dist, id) <= 3
       |ORDER BY qid, rnk""".stripMargin
  }

  /** composite oracle: the [[kmeansCtes]] chain trains the anchors, then
    * the sim_ivf_topk CTE shape searches with them (float-cast parity on
    * the centroid vectors)
    */
  private def ivfKmeansSql(k: Int, iters: Int, dim: Int): String = {
    val anchorCos =
      """list_inner_product(cv, v)
        |              / (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product(v, v)))""".stripMargin
    val queryCos =
      """round(list_inner_product(cv, qv)
        |             / (sqrt(list_inner_product(cv, cv)) * sqrt(list_inner_product(qv, qv))), 6)""".stripMargin
    s"""WITH ${kmeansCtes(k, iters, dim)},
       |anch AS (SELECT cid, list_transform(cv, y -> CAST(CAST(y AS FLOAT) AS DOUBLE)) AS cv
       |  FROM c$iters),
       |asg AS (SELECT e.id, cid,
       |          row_number() OVER (PARTITION BY e.id
       |            ORDER BY $anchorCos DESC, cid) AS ark
       |        FROM e CROSS JOIN anch),
       |cells AS (SELECT id, cid AS cell FROM asg WHERE ark = 1),
       |q AS (SELECT id AS qid, v AS qv FROM e WHERE id >= $k AND id < ${k + 5}),
       |pr AS (SELECT qid, cid AS cell,
       |         row_number() OVER (PARTITION BY qid ORDER BY $queryCos DESC, cid) AS prk
       |       FROM q CROSS JOIN anch),
       |probe AS (SELECT qid, cell FROM pr WHERE prk <= 2),
       |s AS (SELECT qid, e.id AS vec_id, $cosSql AS score
       |      FROM probe JOIN cells ON probe.cell = cells.cell
       |      JOIN e ON e.id = cells.id
       |      JOIN q USING (qid)
       |      WHERE e.id <> qid),
       |r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rk
       |      FROM s)
       |SELECT qid, vec_id, CAST(rk AS BIGINT) AS rnk, score FROM r WHERE rk <= 3
       |ORDER BY qid, rnk""".stripMargin
  }

  /** Unrolled Lloyd rounds as DuckDB CTEs: assignment = QUALIFY row_number
    * over (dist, cid) (≡ Spark's min(struct(d, cid))); distance = the same
    * prepended-seed left fold as Spark's `aggregate(zip_with(...))`; means
    * = exact DECIMAL(20,8) sums / COUNT, rounded to 6 dp between rounds.
    */
  /** the Lloyd CTE chain alone (e, c0, a1..c$iters) for composition */
  private def kmeansCtes(k: Int, iters: Int, dim: Int): String =
    kmeansCtesNs("", k, iters, dim, "embedding")

  /** namespaced Lloyd chain (${p}e, ${p}c0 .. ${p}c$iters) over an
    * arbitrary list-expression source — lets one statement train several
    * independent quantizers (the PQ per-subspace oracles train m of them)
    */
  private def kmeansCtesNs(p: String, k: Int, iters: Int, dim: Int,
      src: String): String = {
    val rounds = (1 to iters).map { i =>
      s"""${p}a$i AS (SELECT e.id, e.v, c.cid,
         |    list_reduce(list_prepend(0.0, list_transform(generate_series(1, $dim),
         |      i -> (e.v[i] - c.cv[i]) * (e.v[i] - c.cv[i]))), (a, b) -> a + b) AS d
         |  FROM ${p}e e, ${p}c${i - 1} c),
         |${p}b$i AS (SELECT id, v, cid FROM ${p}a$i
         |  QUALIFY row_number() OVER (PARTITION BY id ORDER BY d, cid) = 1),
         |${p}m$i AS (SELECT cid, pos, COUNT(*) AS n,
         |    CAST(SUM(CAST(val AS DECIMAL(20,8))) AS DOUBLE) / COUNT(*) AS m
         |  FROM (SELECT cid, unnest(v) AS val, unnest(range(0, $dim)) AS pos FROM ${p}b$i)
         |  GROUP BY cid, pos),
         |${p}g$i AS (SELECT cid, max(n) AS n, list(round(m, 6) ORDER BY pos) AS cv
         |  FROM ${p}m$i GROUP BY cid),
         |${p}c$i AS (SELECT prev.cid, COALESCE(g.n, 0) AS n,
         |    COALESCE(g.cv, prev.cv) AS cv
         |  FROM ${p}c${i - 1} prev LEFT JOIN ${p}g$i g ON g.cid = prev.cid)""".stripMargin
    }.mkString(",\n")
    s"""${p}e AS (SELECT vec_id AS id,
       |    list_transform($src, x -> CAST(CAST(x AS FLOAT) AS DOUBLE)) AS v FROM embeddings),
       |${p}c0 AS (SELECT id AS cid, v AS cv FROM ${p}e ORDER BY id LIMIT $k),
       |$rounds""".stripMargin
  }

  private def kmeansSql(k: Int, iters: Int, dim: Int): String =
    s"""WITH ${kmeansCtes(k, iters, dim)}
       |SELECT cid, pos, cval, n FROM (
       |  SELECT cid, n, unnest(cv) AS cval, unnest(range(0, $dim)) AS pos FROM c$iters)
       |ORDER BY cid, pos""".stripMargin
}
