package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over token counts — the classic trained
  * domain/quality classifier of a pretraining pipeline (the CCNet-style
  * "does this page look like the target domain" filter, with NB standing
  * in for fastText so training is pure counting and therefore exactly
  * replayable by a SQL oracle).
  *
  * Training IS aggregation: P(t|c) comes from one (class, token) count,
  * priors from one class count, smoothing from the vocab size. Scoring is
  * an inverted-index equi-join on token — the model relation is
  * vocab-bounded (|V| x |C| worst case, far smaller than the corpus at
  * 100 TB), so the join shuffles the model's key space, never corpus x
  * corpus, and absent (token, class) pairs cost nothing because add-one
  * smoothing makes their contribution ln(0+1) = 0. The per-class
  * constants (prior, total-token mass) ride a broadcast of |C| rows.
  *
  * Reference analogue: scanner's per-element scoring kernels
  * (scanner/kernels) are arbitrary user ops; a trained filter like this is
  * what those kernels run in a data-curation deployment.
  */
object NaiveBayes {

  /** Fit a multinomial NB model on `docs` (class = `classCol`) and score
    * every doc against every class, returning the argmax class per doc:
    * (idCol, pred, score) with score = ln P(c) + sum_t n_t ln P~(t|c),
    * rounded at 6 dp AFTER the argmax (cross-engine double noise sits at
    * ~1e-12, far below both the rounding grid and real class margins).
    *
    * Ties break toward the lexicographically smallest class in BOTH
    * engines (min over (-score, class) structs here; ORDER BY score DESC,
    * class in the oracle).
    *
    * Plan: one cached explode feeds the doc-token counts AND the model
    * counts (one corpus scan, two map-side-combining aggs); |V| is one
    * driver scalar off the model relation; scoring is docTok ⋈ tokClass
    * on token + a |C|-row broadcast for the constants. Caller releases
    * the explode cache via [[graft.CacheScope.release]].
    *
    * Scoring-join shape, gated on the measured model size: when
    * |V| x |C| fits a broadcast, the doc side repartitions by id ONCE and
    * every downstream agg/join (doc-token counts, doc lengths, the
    * (id, class) score agg, the argmax) rides that partitioning with zero
    * further exchanges — the sf0.1 -> sf1 telemetry showed the shuffled
    * join's (id, class) partial agg saturating its map-side combine
    * (every partition holds nearly every (doc, class) group: 42x shuffle
    * growth for 10x data). With a vocabulary too large to broadcast, the
    * posting join shuffles by token exactly as before — the bounded-model
    * broadcast is an optimization, not a scale requirement.
    */
  def trainScorePredict(docs: DataFrame, idCol: String, textCol: String,
      classCol: String): DataFrame = {
    val ex0 = graft.CacheScope.cache(
      docs.select(col(idCol).as("id"), col(classCol).as("c"),
        explode(TextFunctions.tokens(col(textCol))).as("t")))
    val tokClass = ex0.groupBy(col("c"), col("t")).agg(count(lit(1)).as("cnt"))
    val vocab    = tokClass.select(col("t")).distinct().count()

    // |C| rows: token mass + doc count per class. The corpus doc total is
    // one driver scalar off the CACHED class relation (|C| rows — bounded
    // like the vocab count; a window-over-all here would plant a Window in
    // an otherwise window-free plan), and priors divide doubles
    // identically in both engines (ndocs / total, then ln)
    val classTok  = tokClass.groupBy(col("c")).agg(sum(col("cnt")).as("totc"))
    val classDocs = graft.CacheScope.cache(
      docs.groupBy(col(classCol).as("c")).agg(count(lit(1)).as("ndocs")))
    val docStats  = classDocs.agg(sum(col("ndocs")), count(lit(1))).collect()(0)
    val nDocsAll  = docStats.getLong(0)
    val smallModel = vocab * docStats.getLong(1) <= 2000000L
    val ex = if (smallModel) ex0.repartition(col("id")) else ex0
    val docTok = ex.groupBy(col("id"), col("t")).agg(count(lit(1)).as("n"))
    val classStats = classDocs
      .select(col("c"),
        (col("ndocs").cast("double") / lit(nDocsAll).cast("double")).as("prior"))
      .join(classTok, Seq("c"))

    val docLen = docTok.groupBy(col("id")).agg(sum(col("n")).as("nd"))
    // inverted index: only (token, class) pairs that EXIST contribute;
    // smoothing's ln(1) = 0 covers every absent pair for free
    val model = if (smallModel) broadcast(tokClass) else tokClass
    val matched = docTok.join(model, Seq("t"))
      .groupBy(col("id"), col("c"))
      .agg(sum(col("n").cast("double") * log(col("cnt").cast("double") + 1d)).as("m"))

    val scored = docLen
      .join(broadcast(classStats))
      .join(matched, Seq("id", "c"), "left")
      .select(col("id"), col("c"),
        (log(col("prior"))
          - col("nd").cast("double") * log((col("totc") + vocab).cast("double"))
          + coalesce(col("m"), lit(0d))).as("score"))

    scored
      .groupBy(col("id"))
      .agg(min(struct(negate(col("score")).as("ns"), col("c").as("pc"))).as("best"))
      .select(col("id").as(idCol), col("best.pc").as("pred"),
        round(negate(col("best.ns")), 6).as("score"))
  }
}
