package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained n-gram language-model scoring — the LM-perplexity
  * quality filter of CCNet-class pipelines (docs are scored by a language
  * model and binned head/middle/tail by perplexity; training keeps the
  * low-perplexity bins). The reference has no text ops at all; this
  * extends the training-data-pipeline suite alongside the quality/DSIR
  * family.
  *
  * Model: bigram LM with add-one smoothing trained on the corpus ITSELF
  * (self-scoring — the degenerate but fully-deterministic case of CCNet's
  * wiki-trained KenLM; the estimator pipeline is identical, only the
  * training corpus differs). p(cur|prev) = (c2(prev,cur) + 1) /
  * (c1(prev) + V), V = |distinct context tokens|. Per-doc score is the
  * mean negative log-prob over bigram positions (cross-entropy, nats),
  * rounded at 6 dp — the 6-dp grid is the house cross-engine convention.
  *
  * Relation to `txt_lm_score` (TextQueries): that query is the KenLM-ish
  * per-doc fluency SCORE with the unigram-count denominator
  * p ≈ (c2+1)/(cuni(prev)+|unigram vocab|) — cheap because the unigram
  * relation is shared with other queries. This op is (a) the textbook
  * conditional-MLE estimator — the denominator counts CONTEXT-position
  * occurrences, so Σ_cur p(cur|prev) is properly normalized — and (b)
  * the CCNet SELECTION step on top: corpus-wide tercile thresholds and
  * the head/middle/tail verdict a pipeline actually filters on.
  *
  * Scale shape: ONE corpus scan explodes bigram occurrences (reused for
  * c2, c1, and the per-position scoring via [[graft.CacheScope]]); counts
  * are map-side-combined hash aggs on term keys; scoring is two linear
  * equi-joins (bigram→c2, context→c1) + one per-doc hash agg — nothing
  * corpus×corpus, no windows. The head/middle/tail split uses two exact
  * tercile thresholds from a 1-row aggregate broadcast to the scan; a
  * doc's bucket never depends on other docs beyond that scalar.
  */
object LangModel {

  /** Per-document bigram cross-entropy + CCNet-style tercile bucket:
    * (idCol, n_bigrams, entropy, bucket) for every doc with >= 2 tokens.
    * bucket ∈ head|middle|tail by entropy terciles (head = most fluent).
    *
    * Tercile comparisons are ulp-robust cross-engine: entropies live on
    * the 6-dp grid, and an interpolated threshold either lands exactly ON
    * a grid value (both engines compute the identical endpoint) or
    * strictly BETWEEN two adjacent grid values (where no doc can sit), so
    * a last-ulp difference in the interpolation arithmetic cannot flip
    * any `<=` outcome.
    */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // cached: the entropy relation feeds BOTH the threshold aggregate and
    // the final bucket scan — without the cache the whole count/join/agg
    // chain runs twice
    val ent = graft.CacheScope.cache(crossEntropy(docs, idCol, textCol))
    // the tercile points are the Scala doubles 1.0/3 and 2.0/3 — the
    // same bits DuckDB's 1.0/3 division produces (a 16-digit decimal
    // literal would risk one-ulp drift between the engines)
    val thr = ent.agg(
      percentile(col("entropy"), lit(1.0 / 3)).as("t1"),
      percentile(col("entropy"), lit(2.0 / 3)).as("t2"))
    ent.crossJoin(broadcast(thr))
      .select(col(idCol), col("n_bigrams"), col("entropy"),
        when(col("entropy") <= col("t1"), lit("head"))
          .when(col("entropy") <= col("t2"), lit("middle"))
          .otherwise(lit("tail")).as("bucket"))
  }

  /** The cross-entropy chain without the bucket split: (idCol, n_bigrams,
    * entropy). Public so callers can apply their own thresholding.
    */
  def crossEntropy(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    // every bigram OCCURRENCE (not distinct): the count relations and the
    // per-position scoring all derive from this one cached explode
    val ex2 = graft.CacheScope.cache(
      docs.select(col(idCol).as("id"),
        explode(TextFunctions.shingles(col(textCol), 2)).as("t")))
    val c2 = ex2.groupBy(col("t")).agg(count(lit(1)).as("n2"))
    val c1 = ex2.groupBy(ctx(col("t")).as("p")).agg(count(lit(1)).as("n1"))
    // V = |distinct contexts| (the add-one smoothing denominator); a
    // 1-row agg off the small context-count relation, not a corpus scan
    val v = c1.agg(count(lit(1)).as("v"))
    ex2
      .join(c2, Seq("t"))
      .select(col("id"), col("t"), col("n2"), ctx(col("t")).as("p"))
      .join(c1, Seq("p"))
      .crossJoin(broadcast(v))
      .select(col("id"),
        (-log((col("n2") + 1d) / (col("n1") + col("v")))).as("nll"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nll")) / count(lit(1)), 6).as("entropy"))
      .withColumnRenamed("id", idCol)
  }

  /** context (first) token of a "prev cur" bigram string */
  private def ctx(bigram: Column): Column = substring_index(bigram, " ", 1)
}
