package graft

import org.apache.spark.sql.DataFrame

/** Plan-shape regression pins for the scale properties the engine claims
  * (SURVEY.md §4): these are the properties a reviewer checks with
  * .explain — pinned here so a refactor can't silently reintroduce a
  * scale-killer (global window rank, lost pushdown, missed broadcast).
  */
class PlanSpec extends SparkSpec {

  // fixed SF: these pins encode the sf0.001 plan shapes (broadcast
  // thresholds and AQE decisions are size-dependent, so honoring
  // SPARK_GRAFT_SF_DIR would make the suite fail spuriously after a
  // perf run exported sf0.1)
  private val sfDir = "/root/testdata/sf0.001"

  private def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  test("similarity top-k plans as partial aggregation, never a per-query window") {
    val p = plan(queries.SimQueries.queries("sim_topk")(spark, sfDir))
    assert(!p.contains("Window"), "top-k must not rank via a global window")
    assert(p.contains("ObjectHashAggregate"), "bounded-heap aggregate expected")
    assert(p.contains("partial"), "map-side partial aggregation expected")
  }

  test("star-join query broadcasts its dimension tables") {
    val p = plan(queries.RelQueries.queries("q5_nation_revenue")(spark, sfDir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      "customer/supplier/nation should broadcast")
  }

  test("star-join FACT side goes sort-merge when it outgrows the broadcast threshold (100x-representative)") {
    // At fixture scale every relation fits the 10 MB broadcast threshold,
    // so the frozen plan can't demonstrate the big-fact shape. Model the
    // production fact/dimension divide by pinning the threshold to 256 KB at
    // sf0.1 (lineitem 10.8 MB, orders 2.7 MB above it; every dimension
    // below): lineitem⋈orders must plan sort-merge, dimensions must still
    // broadcast — the same ratio a 1000-executor cluster sees at 100 TB.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (256L << 10).toString)
      val p = plan(queries.RelQueries.queries("q5_nation_revenue")(spark, "/root/testdata/sf0.1"))
      assert(p.contains("SortMergeJoin"),
        "lineitem⋈orders must be a shuffle join once the fact side exceeds the threshold")
      assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
        "dimensions must still broadcast at the representative threshold")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sampler predicates push into the parquet scan; columns prune") {
    val p = plan(queries.SeqQueries.queries("seq_stride")(spark, sfDir))
    // the filter must appear ON the FileScan line (its DataFilters), not
    // merely in some Filter operator above an unpruned scan
    val scanLines = p.linesIterator.filter(_.contains("FileScan parquet")).toSeq
    assert(scanLines.nonEmpty)
    assert(scanLines.exists(l => l.contains("% 8")),
      "stride filter should reach the scan's DataFilters")
    assert(scanLines.exists(_.contains("[event_id")) && !p.contains("value#"),
      "scan should read only event_id/event_type")
  }

  test("IVF top-k plans with heap aggregates and broadcasts, never a window") {
    val p = plan(queries.SimQueries.queries("sim_ivf_topk")(spark, sfDir))
    assert(!p.contains("Window"),
      "assignment argmax and top-k selection must not rank via windows")
    assert(p.contains("ObjectHashAggregate"), "bounded-heap aggregate expected")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "anchors and probe lists should broadcast")
  }

  test("sequence packing is ONE shuffle into (group, shard) groups") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = queries.TextQueries.queries("txt_pack")(spark, sfDir)
    df.collect() // AQE finalizes stages only on execution
    val finalPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p                        => p.toString
    }
    // one hash exchange for the (group, shard) pass; the trailing range
    // exchange is the oracle query's display orderBy, not the operator
    assert(finalPlan.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1,
      "the ordered pack pass must cost exactly one hash-partition shuffle")
    assert(!finalPlan.contains("Window "), "packing must not serialize through a global window")
  }

  test("vec_dot appears as the native expression in the similarity plan") {
    val p = plan(queries.SimQueries.queries("sim_topk")(spark, sfDir))
    assert(p.contains("vec_dot"), "native expression should replace the HOF fold")
  }

  test("bloom semi-join filters the fact scan BEFORE the join exchange, UDF-free") {
    val p = plan(queries.RelQueries.queries("q_bloom_semi_join")(spark, sfDir))
    // the probe is the native codegen expression, not a Scala UDF (a UDF
    // here would break the whole-stage span on every fact row), and it
    // must sit in a Filter on the fact branch (pre-shuffle), not after
    // the join
    val joinAt  = p.indexOf("Join")
    val probeAt = p.indexOf("bloom_might_contain")
    assert(!p.contains("ScalaUDF") && !p.contains("UDF("),
      "bloom probe must be the native expression, not a Scala UDF")
    assert(probeAt >= 0, "native bloom_might_contain probe missing from the plan")
    assert(joinAt >= 0 && probeAt > joinAt,
      "bloom prefilter should appear below (after) the join operator in the tree printout")
  }

  test("persisted-IVF probe plan has no assignment aggregation — the index is an input") {
    val p = plan(queries.SimQueries.queries("sim_ivf_persisted")(spark, sfDir))
    assert(p.contains("graft_ivf_idx"),
      "probe should scan the persisted bucketed index table")
    // the build half's argmax (max(cand) + first(v)) must NOT rerun at
    // probe time; the only aggregate left is the bounded-heap top-k
    assert(!p.contains("max(cand"), "assignment argmax reran in the probe plan")
    assert(!p.contains("first(v"), "assignment vector carry reran in the probe plan")
    assert(p.contains("Broadcast"), "anchors/probe list must broadcast")
  }

  test("incremental-dedup probe plan never recomputes corpus signatures") {
    val p = plan(queries.TextQueries.queries("dedup_incremental")(spark, sfDir))
    assert(p.contains("graft_lsh_idx"),
      "probe should scan the persisted bucketed band index")
    // only the NEW shard reads raw text: exactly one documents.parquet scan
    assert("documents\\.parquet".r.findAllIn(p).size == 1,
      "corpus side must come from the index table, not a re-banding of raw docs")
  }

  test("NB classifier plan: model join + broadcast constants, no window anywhere") {
    val p = plan(queries.TextQueries.queries("txt_nb_classify")(spark, sfDir))
    assert(!p.contains("Window"), "priors/argmax must not plant a window")
    assert(p.contains("Broadcast"), "the |C|-row class-stats relation should broadcast")
  }

  test("kmeans round broadcasts the centroid relation; corpus side stays hash-aggregated") {
    val p = plan(queries.SimQueries.queries("emb_kmeans")(spark, sfDir))
    assert(p.contains("Broadcast"), "centroid relation must broadcast")
    assert(!p.contains("Window"), "no window in the Lloyd round")
  }
}
