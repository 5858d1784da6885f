package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{GraphRank, GraphStructure}

/** Link-graph centrality queries over the events co-visitation graph.
  *
  * The graph: users and `props.k` items as nodes (items offset to
  * 1000000+k so the id spaces stay disjoint), one edge per distinct
  * (user, item) interaction IN BOTH DIRECTIONS — the undirected
  * co-visitation graph random-walk ranking operates on. Because
  * [[GraphRank]] is exact fixed-point integer arithmetic, the DuckDB
  * oracles replay the full power iteration (unrolled CTE per round,
  * generated below) to the SAME BITS — no FP tolerance anywhere.
  */
object GraphQueries {

  private val Iters = 8
  private val Scale = 1000000000000L // pagerank fixed-point unit
  private val HScale = 1000000000L   // hits fixed-point unit (HUGEINT-normalised)
  private val ItemBase = 1000000L

  private def edges(s: SparkSession, dir: String): DataFrame = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    val uk = ev.select(col("user_id").cast("long").as("u"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .where(col("k").isNotNull).distinct()
    uk.select(col("u").as("src"), (col("k") + ItemBase).as("dst"))
      .unionByName(uk.select((col("k") + ItemBase).as("src"), col("u").as("dst")))
  }

  /** shared oracle prelude: the same edge derivation in DuckDB. Every CTE
    * in these unrolled recurrences is AS MATERIALIZED — the round-i
    * relations are each referenced twice by round i+1, so the default
    * inline expansion is EXPONENTIAL in `iters` (4^8 scans of the events
    * parquet for hits — it exhausts file descriptors before it finishes).
    */
  private def graphCtes: String =
    s"""WITH uk AS MATERIALIZED (
       |  SELECT DISTINCT user_id AS u, CAST(json_extract(props, '$$.k') AS BIGINT) AS k
       |  FROM events WHERE json_extract(props, '$$.k') IS NOT NULL),
       |edges AS MATERIALIZED (
       |  SELECT u AS src, $ItemBase + k AS dst FROM uk
       |  UNION
       |  SELECT $ItemBase + k AS src, u AS dst FROM uk),
       |nodes AS MATERIALIZED (
       |  SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
       |""".stripMargin

  /** the [[GraphRank.pageRank]] recurrence, unrolled one CTE trio per
    * round — integer `//` throughout, so DuckDB lands on identical longs
    */
  private def pageRankSql(iters: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(
      s"""deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS outdeg FROM edges GROUP BY 1),
         |c AS MATERIALIZED (SELECT COUNT(*) AS n, $Scale // COUNT(*) AS base FROM nodes),
         |r0 AS MATERIALIZED (SELECT id, (SELECT base FROM c) AS rank FROM nodes),
         |""".stripMargin)
    for (i <- 0 until iters) {
      sb.append(
        s"""d$i AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0) AS dm
           |  FROM r$i r LEFT JOIN deg g ON g.id = r.id WHERE g.id IS NULL),
           |m$i AS MATERIALIZED (SELECT e.dst AS id, SUM(r.rank // g.outdeg) AS inc
           |  FROM edges e JOIN r$i r ON r.id = e.src JOIN deg g ON g.id = e.src
           |  GROUP BY 1),
           |r${i + 1} AS MATERIALIZED (SELECT n.id,
           |    (15 * (SELECT base FROM c)
           |     + 85 * (COALESCE(m.inc, 0) + (SELECT dm FROM d$i) // (SELECT n FROM c)))
           |    // 100 AS rank
           |  FROM nodes n LEFT JOIN m$i m ON m.id = n.id),
           |""".stripMargin)
    }
    sb.append(
      s"""fin AS (SELECT id AS node, CAST(rank AS BIGINT) AS rank FROM r$iters)
         |SELECT node, rank FROM fin ORDER BY rank DESC, node""".stripMargin)
    sb.toString
  }

  private val NSeedItems = 5 // PPR teleport set: items 0..4

  /** the [[GraphRank.personalizedPageRank]] recurrence, unrolled — same
    * integer algebra as [[pageRankSql]] but teleport (restart + dangling)
    * mass lands only on the seed set
    */
  private def pprSql(iters: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(
      s"""seeds AS MATERIALIZED (SELECT id FROM nodes
         |  WHERE id >= $ItemBase AND id < $ItemBase + $NSeedItems),
         |deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS outdeg FROM edges GROUP BY 1),
         |c AS MATERIALIZED (SELECT COUNT(*) AS ns, $Scale // COUNT(*) AS base FROM seeds),
         |r0 AS MATERIALIZED (SELECT n.id,
         |    CASE WHEN s.id IS NULL THEN 0 ELSE (SELECT base FROM c) END AS rank
         |  FROM nodes n LEFT JOIN seeds s ON s.id = n.id),
         |""".stripMargin)
    for (i <- 0 until iters) {
      sb.append(
        s"""d$i AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0) AS dm
           |  FROM r$i r LEFT JOIN deg g ON g.id = r.id WHERE g.id IS NULL),
           |m$i AS MATERIALIZED (SELECT e.dst AS id, SUM(r.rank // g.outdeg) AS inc
           |  FROM edges e JOIN r$i r ON r.id = e.src JOIN deg g ON g.id = e.src
           |  GROUP BY 1),
           |r${i + 1} AS MATERIALIZED (SELECT n.id,
           |    (CASE WHEN s.id IS NULL THEN 0
           |          ELSE 15 * (SELECT base FROM c)
           |               + 85 * ((SELECT dm FROM d$i) // (SELECT ns FROM c)) END
           |     + 85 * COALESCE(m.inc, 0)) // 100 AS rank
           |  FROM nodes n LEFT JOIN m$i m ON m.id = n.id
           |             LEFT JOIN seeds s ON s.id = n.id),
           |""".stripMargin)
    }
    sb.append(
      s"""fin AS (SELECT id AS node, CAST(rank AS BIGINT) AS rank FROM r$iters)
         |SELECT node, rank FROM fin ORDER BY rank DESC, node""".stripMargin)
    sb.toString
  }

  /** the [[GraphRank.hits]] recurrence, unrolled; the L1 normalisation
    * multiply runs as HUGEINT exactly like the operator's BigInt
    */
  private def hitsSql(iters: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append("h0 AS MATERIALIZED (SELECT id, CAST(" + HScale + " AS BIGINT) AS v FROM nodes),\n")
    def norm(outName: String, rawName: String): String =
      s"""$outName AS MATERIALIZED (SELECT n.id,
         |    CAST(CAST(COALESCE(r.raw, 0) AS HUGEINT) * $HScale
         |         // (SELECT SUM(raw) FROM $rawName) AS BIGINT) AS v
         |  FROM nodes n LEFT JOIN $rawName r ON r.id = n.id),
         |""".stripMargin
    for (i <- 0 until iters) {
      sb.append(
        s"""ar$i AS MATERIALIZED (SELECT e.dst AS id, SUM(h.v) AS raw
           |  FROM edges e JOIN h$i h ON h.id = e.src GROUP BY 1),
           |""".stripMargin)
      sb.append(norm(s"a${i + 1}", s"ar$i"))
      sb.append(
        s"""hr$i AS MATERIALIZED (SELECT e.src AS id, SUM(a.v) AS raw
           |  FROM edges e JOIN a${i + 1} a ON a.id = e.dst GROUP BY 1),
           |""".stripMargin)
      sb.append(norm(s"h${i + 1}", s"hr$i"))
    }
    sb.append(
      s"""fin AS (SELECT h.id AS node, h.v AS hub, a.v AS auth
         |  FROM h$iters h JOIN a$iters a ON a.id = h.id)
         |SELECT node, hub, auth FROM fin ORDER BY hub DESC, node""".stripMargin)
    sb.toString
  }

  private val Cap = 64      // promiscuous-user prune for the co-occurrence ops
  private val MinShared = 40L // item-graph edge threshold (shared users)
  private val TopK = 5

  /** the raw bipartite (user, item) interaction relation the structural
    * ops consume — unlike [[edges]], items keep their own id space */
  private def interactions(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")
      .select(col("user_id").cast("long").as("ctx"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .where(col("item").isNotNull)

  /** same derivation + promiscuous-context prune in DuckDB */
  private val structCtes: String =
    s"""WITH uk AS MATERIALIZED (
       |  SELECT DISTINCT user_id AS ctx, CAST(json_extract(props, '$$.k') AS BIGINT) AS item
       |  FROM events WHERE json_extract(props, '$$.k') IS NOT NULL),
       |kept AS MATERIALIZED (SELECT ctx FROM uk GROUP BY ctx HAVING COUNT(*) <= $Cap),
       |p AS MATERIALIZED (SELECT uk.ctx, uk.item FROM uk JOIN kept ON kept.ctx = uk.ctx),
       |""".stripMargin

  private val WalkSteps = 4
  private val WalkMaxDeg = 64

  /** the co-visitation graph with interaction-count weights (NOT the
    * distinct relation [[edges]] uses: multiplicity IS the weight) */
  private def weightedEdges(s: SparkSession, dir: String): DataFrame = {
    val ev = s.read.parquet(s"$dir/events.parquet")
    val uk = ev.select(col("user_id").cast("long").as("u"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .where(col("k").isNotNull)
      .groupBy(col("u"), col("k")).agg(count(lit(1)).as("w"))
    uk.select(col("u").as("src"), (col("k") + ItemBase).as("dst"), col("w"))
      .unionByName(uk.select((col("k") + ItemBase).as("src"), col("u").as("dst"), col("w")))
  }

  /** the [[GraphRank.pageRankWeighted]] recurrence, unrolled — same
    * skeleton as [[pageRankSql]] with per-edge `rank·w // W(src)` shares
    */
  private def wPageRankSql(iters: Int): String = {
    val sb = new StringBuilder(
      s"""WITH wuk AS MATERIALIZED (
         |  SELECT user_id AS u, CAST(json_extract(props, '$$.k') AS BIGINT) AS k,
         |         COUNT(*) AS c
         |  FROM events WHERE json_extract(props, '$$.k') IS NOT NULL GROUP BY 1, 2),
         |edges AS MATERIALIZED (
         |  SELECT u AS src, $ItemBase + k AS dst, c AS w FROM wuk
         |  UNION ALL
         |  SELECT $ItemBase + k AS src, u AS dst, c AS w FROM wuk),
         |nodes AS MATERIALIZED (
         |  SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
         |deg AS MATERIALIZED (SELECT src AS id, SUM(w) AS outw FROM edges GROUP BY 1),
         |c AS MATERIALIZED (SELECT COUNT(*) AS n, $Scale // COUNT(*) AS base FROM nodes),
         |r0 AS MATERIALIZED (SELECT id, (SELECT base FROM c) AS rank FROM nodes),
         |""".stripMargin)
    for (i <- 0 until iters) {
      sb.append(
        s"""d$i AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0) AS dm
           |  FROM r$i r LEFT JOIN deg g ON g.id = r.id WHERE g.id IS NULL),
           |m$i AS MATERIALIZED (SELECT e.dst AS id, SUM(r.rank * e.w // g.outw) AS inc
           |  FROM edges e JOIN r$i r ON r.id = e.src JOIN deg g ON g.id = e.src
           |  GROUP BY 1),
           |r${i + 1} AS MATERIALIZED (SELECT n.id,
           |    (15 * (SELECT base FROM c)
           |     + 85 * (COALESCE(m.inc, 0) + (SELECT dm FROM d$i) // (SELECT n FROM c)))
           |    // 100 AS rank
           |  FROM nodes n LEFT JOIN m$i m ON m.id = n.id),
           |""".stripMargin)
    }
    sb.append(
      s"""fin AS (SELECT id AS node, CAST(rank AS BIGINT) AS rank FROM r$iters)
         |SELECT node, rank FROM fin ORDER BY rank DESC, node""".stripMargin)
    sb.toString
  }

  /** the [[GraphStructure.randomWalks]] recurrence, unrolled — sorted
    * capped adjacency, md5-indexed neighbor choice per (start, step, cur);
    * ends with the `fin` CTE (start, step, node) + trailing comma so
    * callers append their own final selection
    */
  private def walksCtes(steps: Int, maxDeg: Int): String = {
    val sb = new StringBuilder(graphCtes)
    sb.append(
      s"""adj AS MATERIALIZED (SELECT src AS cur,
         |    list_sort(list(DISTINCT dst))[1:$maxDeg] AS nbrs
         |  FROM edges GROUP BY 1),
         |w0 AS MATERIALIZED (SELECT id AS start, id AS cur FROM nodes),
         |""".stripMargin)
    for (t <- 1 to steps) {
      sb.append(
        s"""w$t AS MATERIALIZED (SELECT w.start, a.nbrs[CAST(
           |    CAST(('0x' || substr(md5(w.start || ',' || $t || ',' || w.cur), 1, 8)) AS BIGINT)
           |    % len(a.nbrs) AS INT) + 1] AS cur
           |  FROM w${t - 1} w JOIN adj a ON a.cur = w.cur),
           |""".stripMargin)
    }
    sb.append((0 to steps).map(t =>
        s"SELECT start, CAST($t AS BIGINT) AS step, cur AS node FROM w$t")
      .mkString("fin AS MATERIALIZED (", " UNION ALL ", "),\n"))
    sb.toString
  }

  private def walksSql(steps: Int, maxDeg: Int): String =
    walksCtes(steps, maxDeg) +
      """res AS (SELECT start, step, node FROM fin)
        |SELECT start, step, node FROM res ORDER BY start, step, node""".stripMargin

  private def walkPairsSql(steps: Int, maxDeg: Int, window: Int): String =
    walksCtes(steps, maxDeg) +
      s"""pr AS (SELECT a.node AS center, b.node AS context, COUNT(*) AS n
         |  FROM fin a JOIN fin b ON b.start = a.start AND b.step <> a.step
         |    AND ABS(b.step - a.step) <= $window
         |  GROUP BY 1, 2)
         |SELECT center, context, n FROM pr ORDER BY center, context""".stripMargin

  /** weighted prelude + seeded rounds: the full-combination recurrence */
  private def wPprSql(iters: Int): String = {
    val sb = new StringBuilder(
      s"""WITH wuk AS MATERIALIZED (
         |  SELECT user_id AS u, CAST(json_extract(props, '$$.k') AS BIGINT) AS k,
         |         COUNT(*) AS c
         |  FROM events WHERE json_extract(props, '$$.k') IS NOT NULL GROUP BY 1, 2),
         |edges AS MATERIALIZED (
         |  SELECT u AS src, $ItemBase + k AS dst, c AS w FROM wuk
         |  UNION ALL
         |  SELECT $ItemBase + k AS src, u AS dst, c AS w FROM wuk),
         |nodes AS MATERIALIZED (
         |  SELECT src AS id FROM edges UNION SELECT dst AS id FROM edges),
         |seeds AS MATERIALIZED (SELECT id FROM nodes
         |  WHERE id >= $ItemBase AND id < $ItemBase + $NSeedItems),
         |deg AS MATERIALIZED (SELECT src AS id, SUM(w) AS outw FROM edges GROUP BY 1),
         |c AS MATERIALIZED (SELECT COUNT(*) AS ns, $Scale // COUNT(*) AS base FROM seeds),
         |r0 AS MATERIALIZED (SELECT n.id,
         |    CASE WHEN s.id IS NULL THEN 0 ELSE (SELECT base FROM c) END AS rank
         |  FROM nodes n LEFT JOIN seeds s ON s.id = n.id),
         |""".stripMargin)
    for (i <- 0 until iters) {
      sb.append(
        s"""d$i AS MATERIALIZED (SELECT COALESCE(SUM(r.rank), 0) AS dm
           |  FROM r$i r LEFT JOIN deg g ON g.id = r.id WHERE g.id IS NULL),
           |m$i AS MATERIALIZED (SELECT e.dst AS id, SUM(r.rank * e.w // g.outw) AS inc
           |  FROM edges e JOIN r$i r ON r.id = e.src JOIN deg g ON g.id = e.src
           |  GROUP BY 1),
           |r${i + 1} AS MATERIALIZED (SELECT n.id,
           |    (CASE WHEN s.id IS NULL THEN 0
           |          ELSE 15 * (SELECT base FROM c)
           |               + 85 * ((SELECT dm FROM d$i) // (SELECT ns FROM c)) END
           |     + 85 * COALESCE(m.inc, 0)) // 100 AS rank
           |  FROM nodes n LEFT JOIN m$i m ON m.id = n.id
           |             LEFT JOIN seeds s ON s.id = n.id),
           |""".stripMargin)
    }
    sb.append(
      s"""fin AS (SELECT id AS node, CAST(rank AS BIGINT) AS rank FROM r$iters)
         |SELECT node, rank FROM fin ORDER BY rank DESC, node""".stripMargin)
    sb.toString
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the full centrality combination: seeded restart over
    // multiplicity-weighted hops ("related to THESE items, weighted by
    // how often people actually co-interact")
    "graph_ppr_weighted" -> ((s, dir) =>
      GraphRank.personalizedPageRankWeighted(weightedEdges(s, dir), "w",
          s.range(0, NSeedItems).select((col("id") + ItemBase).as("id")),
          iters = Iters, scale = Scale)
        .orderBy(col("rank").desc, col("node"))),

    // deterministic DeepWalk-style corpus: one 4-hop walk per node over
    // the co-visitation graph, neighbor choice by content hash — the
    // graph-embedding training-data generator, reproducible to the bit
    // across engines and re-runs (regenerating one shard never perturbs
    // another)
    "graph_walks" -> ((s, dir) =>
      GraphStructure.randomWalks(edges(s, dir), steps = WalkSteps,
          maxDegree = WalkMaxDeg)
        .orderBy(col("start"), col("step"), col("node"))),

    // skip-gram pairs from the walk corpus (window 2) — the exact rows a
    // word2vec-style embedding trainer consumes, multiplicity-counted
    "graph_walk_pairs" -> ((s, dir) =>
      GraphStructure.walkSkipGrams(
          GraphStructure.randomWalks(edges(s, dir), steps = WalkSteps,
            maxDegree = WalkMaxDeg), window = 2)
        .orderBy(col("center"), col("context"))),

    // item-item co-visitation neighbors: top-k other items by shared-user
    // count — the "related items / related documents" curation signal.
    // The promiscuous-context cap bounds pair fan-out (the one superlinear
    // risk); ranking is the bounded sorted-slice, no window.
    "graph_covisit_topk" -> ((s, dir) =>
      GraphStructure.coOccurrenceTopK(interactions(s, dir), "ctx", "item",
          k = TopK, maxCtxDegree = Cap)
        .orderBy(col("item"), col("rank"))),

    // per-item triangle counts over the >=MinShared-shared-users item
    // projection: local clustering mass, the organic-community-vs-link-farm
    // signal. Degree-ordered orientation bounds the wedge join at m^1.5.
    "graph_triangles" -> ((s, dir) =>
      GraphStructure.triangleCounts(
          GraphStructure.projectItemGraph(interactions(s, dir), "ctx", "item",
            minShared = MinShared, maxCtxDegree = Cap), "a", "b")
        .orderBy(col("node"))),

    // random-walk mass over the co-visitation graph: the host-rank signal
    // crawl curation keeps "reputable" sources with. Exact fixed-point —
    // every rank long lands bit-identical across engines, executors, and
    // re-runs (reproducible curation), per-round cost = one compact
    // (long,long) shuffle, one driver job.
    "graph_pagerank" -> ((s, dir) =>
      GraphRank.pageRank(edges(s, dir), iters = Iters, scale = Scale)
        .orderBy(col("rank").desc, col("node"))),

    // SESSION-scoped co-visitation: the context is one 30-minute-gap
    // session, not the user's whole history — items co-rank only when
    // interacted with in the same sitting (the recsys-standard temporal
    // scoping; whole-history co-visitation conflates months-apart
    // interests). Session ids via the same lag + running-sum derivation
    // q_events_sessionize pins; then the identical capped pair machinery.
    "graph_covisit_session" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = graft.GraftSession.tsToNanos(s.read.parquet(s"$dir/events.parquet"))
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val withSid = ev
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            col("ts") - col("prev_ts") > lit(1800L * 1000000000L), 1L).otherwise(0L))
        .withColumn("ctx",
          col("user_id") * 100000L + sum(col("new_session")).over(
            byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select(col("ctx"),
          get_json_object(col("props"), "$.k").cast("long").as("item"))
        .where(col("item").isNotNull)
      GraphStructure.coOccurrenceTopK(withSid, "ctx", "item",
          k = TopK, maxCtxDegree = Cap)
        .orderBy(col("item"), col("rank"))
    }),

    // PMI-normalized co-visitation: association strength with popularity
    // divided out (raw counts rank popular-x-popular first; PMI finds the
    // genuinely-related pairs) — exact counts, one 6-dp-rounded ln
    "graph_covisit_pmi" -> ((s, dir) =>
      GraphStructure.covisitPmi(interactions(s, dir), "ctx", "item",
          minShared = MinShared, maxCtxDegree = Cap)
        .orderBy(col("item_a"), col("item_b"))),

    // graph data card (the txt_corpus_report analogue for the interaction
    // graph): node/edge/degree/projection/triangle rollup in ONE row —
    // every measure an exact integer aggregate with map-side combine
    // (max degrees, not medians: nothing here collects a per-node list)
    "graph_report" -> ((s, dir) => {
      // cached: five rollup legs (base counts, both degree maxes, the
      // projection, triangles) each re-evaluated the events scan + JSON
      // parse + distinct without it (the profile showed the subtree
      // twice per exchange pair)
      val ia = graft.CacheScope.cache(interactions(s, dir).distinct())
      val base = ia.agg(
        countDistinct(col("ctx")).as("n_users"),
        countDistinct(col("item")).as("n_items"),
        count(lit(1)).as("n_pairs"))
      val maxU = ia.groupBy(col("ctx")).agg(count(lit(1)).as("d"))
        .agg(max(col("d")).as("max_user_deg"))
      val maxI = ia.groupBy(col("item")).agg(count(lit(1)).as("d"))
        .agg(max(col("d")).as("max_item_deg"))
      val proj = GraphStructure.projectItemGraph(ia, "ctx", "item",
        minShared = MinShared, maxCtxDegree = Cap)
      val nEdges = proj.agg(count(lit(1)).as("proj_edges"))
      val nTri = GraphStructure.triangleCounts(proj, "a", "b")
        .agg(coalesce(sum(col("triangles")), lit(0L)).as("tri_incidences"))
      // all five relations are single-row: chain of trivial cross joins
      base.crossJoin(maxU).crossJoin(maxI).crossJoin(nEdges).crossJoin(nTri)
        .withColumn("n_triangles", expr("tri_incidences div 3"))
        .drop("tri_incidences")
    }),

    // multiplicity-weighted PageRank: repeat interactions count — the
    // production host/item ranker splits out-mass by edge weight, not
    // uniformly (all-ones weights reproduce graph_pagerank exactly)
    "graph_pagerank_weighted" -> ((s, dir) =>
      GraphRank.pageRankWeighted(weightedEdges(s, dir), "w",
          iters = Iters, scale = Scale)
        .orderBy(col("rank").desc, col("node"))),

    // personalized PageRank from a 5-item seed set: random-walk-with-
    // restart proximity — the "related to THESE items/hosts" ranker
    // (teleport and dangling mass land only on seeds). Same loop, same
    // exactness, same per-round cost as graph_pagerank.
    "graph_ppr" -> ((s, dir) =>
      GraphRank.personalizedPageRank(edges(s, dir),
          s.range(0, NSeedItems).select((col("id") + ItemBase).as("id")),
          iters = Iters, scale = Scale)
        .orderBy(col("rank").desc, col("node"))),

    // hubs-and-authorities on the same graph: on the bipartite
    // co-visitation graph hub mass concentrates on promiscuous users,
    // authority mass on widely-shared items — the two curation signals a
    // single PageRank blends together.
    "graph_hits" -> ((s, dir) =>
      GraphRank.hits(edges(s, dir), iters = Iters, scale = HScale)
        .orderBy(col("hub").desc, col("node"))))

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> pageRankSql(Iters),
    "graph_ppr" -> pprSql(Iters),
    "graph_pagerank_weighted" -> wPageRankSql(Iters),
    "graph_ppr_weighted" -> wPprSql(Iters),
    "graph_walks" -> walksSql(WalkSteps, WalkMaxDeg),
    "graph_walk_pairs" -> walkPairsSql(WalkSteps, WalkMaxDeg, window = 2),
    "graph_hits" -> hitsSql(Iters),

    "graph_covisit_topk" -> (structCtes +
      s"""co AS MATERIALIZED (SELECT a.item AS item, b.item AS other, COUNT(*) AS n_shared
         |  FROM p a JOIN p b ON a.ctx = b.ctx AND a.item <> b.item GROUP BY 1, 2),
         |rk AS (SELECT item, other, n_shared,
         |  ROW_NUMBER() OVER (PARTITION BY item ORDER BY n_shared DESC, other) AS rnk FROM co)
         |SELECT item, CAST(rnk AS BIGINT) AS rank, other, n_shared
         |FROM rk WHERE rnk <= $TopK ORDER BY item, rank""".stripMargin),

    // session-id derivation identical to q_events_sessionize's, then the
    // graph_covisit_topk replay with ctx = user*100000 + session_seq
    "graph_covisit_session" ->
      s"""WITH se AS MATERIALIZED (SELECT user_id, event_id, epoch_ns(ts) AS ts_ns,
         |    CAST(json_extract(props, '$$.k') AS BIGINT) AS k FROM events),
         |flg AS MATERIALIZED (SELECT *, CASE WHEN prev IS NULL
         |      OR ts_ns - prev > 1800000000000 THEN 1 ELSE 0 END AS ns
         |  FROM (SELECT *, lag(ts_ns) OVER (PARTITION BY user_id
         |          ORDER BY ts_ns, event_id) AS prev FROM se)),
         |uk AS MATERIALIZED (SELECT DISTINCT
         |    user_id * 100000 + SUM(ns) OVER (PARTITION BY user_id
         |      ORDER BY ts_ns, event_id ROWS UNBOUNDED PRECEDING) AS ctx,
         |    k AS item
         |  FROM flg WHERE k IS NOT NULL),
         |kept AS MATERIALIZED (SELECT ctx FROM uk GROUP BY ctx HAVING COUNT(*) <= $Cap),
         |p AS MATERIALIZED (SELECT uk.ctx, uk.item FROM uk JOIN kept ON kept.ctx = uk.ctx),
         |co AS MATERIALIZED (SELECT a.item AS item, b.item AS other, COUNT(*) AS n_shared
         |  FROM p a JOIN p b ON a.ctx = b.ctx AND a.item <> b.item GROUP BY 1, 2),
         |rk AS (SELECT item, other, n_shared,
         |  ROW_NUMBER() OVER (PARTITION BY item ORDER BY n_shared DESC, other) AS rnk FROM co)
         |SELECT item, CAST(rnk AS BIGINT) AS rank, other, n_shared
         |FROM rk WHERE rnk <= $TopK ORDER BY item, rank""".stripMargin,

    "graph_covisit_pmi" -> (structCtes +
      s"""nn AS MATERIALIZED (SELECT COUNT(DISTINCT ctx) AS n_ctx FROM p),
         |ci AS MATERIALIZED (SELECT item, COUNT(*) AS c FROM p GROUP BY 1),
         |cab AS MATERIALIZED (SELECT x.item AS item_a, y.item AS item_b, COUNT(*) AS n_shared
         |  FROM p x JOIN p y ON x.ctx = y.ctx AND x.item < y.item
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinShared)
         |SELECT cab.item_a, cab.item_b, cab.n_shared,
         |       ROUND(LN((CAST(cab.n_shared AS DOUBLE) * (SELECT n_ctx FROM nn))
         |                / (CAST(a.c AS DOUBLE) * CAST(b.c AS DOUBLE))), 6) AS pmi
         |FROM cab JOIN ci a ON a.item = cab.item_a JOIN ci b ON b.item = cab.item_b
         |ORDER BY item_a, item_b""".stripMargin),

    "graph_report" -> (structCtes +
      s"""e AS MATERIALIZED (SELECT x.item AS a, y.item AS b
         |  FROM p x JOIN p y ON x.ctx = y.ctx AND x.item < y.item
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinShared),
         |t AS MATERIALIZED (SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
         |  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
         |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
         |SELECT (SELECT COUNT(DISTINCT ctx) FROM uk) AS n_users,
         |       (SELECT COUNT(DISTINCT item) FROM uk) AS n_items,
         |       (SELECT COUNT(*) FROM uk) AS n_pairs,
         |       (SELECT MAX(d) FROM (SELECT COUNT(*) AS d FROM uk GROUP BY ctx)) AS max_user_deg,
         |       (SELECT MAX(d) FROM (SELECT COUNT(*) AS d FROM uk GROUP BY item)) AS max_item_deg,
         |       (SELECT COUNT(*) FROM e) AS proj_edges,
         |       (SELECT COUNT(*) FROM t) AS n_triangles""".stripMargin),

    // triangle counts are orientation-independent, so the oracle uses the
    // simplest canonical enumeration (a < b < c over a<b edges) — the
    // engine's degree-ordered plan must land on the identical multiset
    "graph_triangles" -> (structCtes +
      s"""e AS MATERIALIZED (SELECT x.item AS a, y.item AS b
         |  FROM p x JOIN p y ON x.ctx = y.ctx AND x.item < y.item
         |  GROUP BY 1, 2 HAVING COUNT(*) >= $MinShared),
         |t AS MATERIALIZED (SELECT e1.a AS ta, e1.b AS tb, e2.b AS tc
         |  FROM e e1 JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
         |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
         |n AS (SELECT ta AS node FROM t UNION ALL SELECT tb FROM t UNION ALL SELECT tc FROM t)
         |SELECT node, COUNT(*) AS triangles FROM n GROUP BY 1 ORDER BY node""".stripMargin))
}
