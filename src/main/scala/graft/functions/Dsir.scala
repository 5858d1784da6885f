package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.CacheScope

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169): pick pretraining documents from a huge raw pool so
  * the selection is distributed like a small clean TARGET corpus.
  *
  *  1. FEATURES: hashed bag-of-n-grams (unigrams + word bigrams, one md5
  *     per feature, bucketed mod `b`) — the fixed-width feature space that
  *     makes the density ratio estimable at any corpus size.
  *  2. FIT: two bucket-count distributions from one grouped pass over the
  *     feature stream (target vs raw), add-one smoothed.
  *  3. WEIGH: per raw doc, log importance weight
  *     `Σ_f c_f · (ln p_target(f) − ln p_raw(f))` — a sum over the doc's
  *     OWN features only, so weighing is one join against the tiny (≤ b
  *     rows, broadcast) log-ratio relation plus one per-doc aggregation.
  *  4. RESAMPLE: Gumbel-top-k — `key = logw + g`, `g = −ln(−ln(u))` with
  *     `u` a deterministic md5-derived uniform per doc (the paper samples
  *     without replacement ∝ exp(logw); Gumbel keys make that a stateless
  *     ORDER BY, reproducible across engines and retries).
  *
  * Plan shape at 100 TB: the corpus shuffles only for the (doc, bucket)
  * count and final per-doc sum; the fitted model is `b` rows however big
  * the corpus is; no window functions, no driver loops. Double log-sums
  * are rounded to 6 dp at the end — cross-engine libm noise sits at
  * ~1e-12, far below the grid (the NaiveBayes discipline).
  *
  * Reference analogue: scanner's per-element scoring kernels
  * (`scanner/api/kernel.h:136-143`) — the 1→1 score-then-select shape,
  * here as pure relational passes.
  */
object Dsir {

  /** md5-bucket of one feature string: leading 60 bits mod `b` (the
    * [[Dedup]] strong-hash residue pattern — identical in DuckDB as
    * `('0x' || substr(md5(f), 1, 15))::BIGINT % b`)
    */
  private def bucketOf(f: Column, b: Int): Column =
    conv(substring(md5(f), 1, 15), 16, 10).cast("long") % b

  /** (id, ride-along cols, bucket) — one row per feature OCCURRENCE
    * (unigrams + bigrams). Tokens are let-bound through a real column so
    * the split runs once per row, not once per HOF reference; `extra`
    * columns ride the scan-side explode so no join ever touches the
    * feature stream.
    */
  def featureBuckets(docs: DataFrame, idCol: String, textCol: String,
      b: Int, extra: Column*): DataFrame =
    docs.select(col(idCol) +: extra :+
        TextFunctions.tokens(col(textCol)).as("__t"): _*)
      // guard: Spark's sequence(1, 0) counts DOWN (unlike DuckDB's empty
      // generate_series) — a 1-token doc must yield zero bigrams, not a
      // descending index walk into element_at(.., 0)
      .withColumn("__f",
        explode(concat(col("__t"),
          when(size(col("__t")) >= 2,
            transform(sequence(lit(1), size(col("__t")) - 1),
              i => concat(element_at(col("__t"), i), lit(" "),
                element_at(col("__t"), i + 1))))
            .otherwise(array().cast("array<string>")))))
      .withColumn("bucket", bucketOf(col("__f"), b))
      .drop("__t", "__f")

  /** Log importance weight for every RAW (non-target) doc:
    * (idCol, logw) — logw rounded to 6 dp. `isTarget` marks the clean
    * exemplar set; everything else is the pool being scored.
    */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, b: Int): DataFrame = {
    val feat = CacheScope.cache(
      featureBuckets(docs, idCol, textCol, b, isTarget.as("__tgt")))
    // one grouped pass fits BOTH distributions; ≤ b rows out
    val counts = feat.groupBy(col("bucket"))
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("tc"),
        sum(when(col("__tgt"), 0L).otherwise(1L)).as("rc"))
    val totals = counts.agg(sum(col("tc")).as("tt"), sum(col("rc")).as("rt"))
    val ratio = counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        (log((col("tc") + 1d) / (col("tt") + b))
          - log((col("rc") + 1d) / (col("rt") + b))).as("lr"))
    feat.filter(!col("__tgt"))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .join(broadcast(ratio), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(round(sum(col("c") * col("lr")), 6).as("logw"))
  }

  /** Gumbel-top-n resampling over [[importanceWeights]] output: the n
    * docs with the largest `round(logw + gumbel(md5(id)), 6)` keys —
    * equivalent to sampling without replacement with probability
    * ∝ exp(logw), but deterministic and engine-reproducible. Selection is
    * a global ORDER BY LIMIT n (TakeOrderedAndProject — n rows per
    * partition cross to the driver merge, never the pool).
    */
  def gumbelTopN(weights: DataFrame, idCol: String, n: Int): DataFrame = {
    val u = (bucketOf(col(idCol).cast("string"), 1000000).cast("double") + 0.5d) /
      1000000d
    weights
      .select(col(idCol), col("logw"),
        round(col("logw") - log(-log(u)), 6).as("key"))
      .orderBy(col("key").desc, col(idCol))
      .limit(n)
  }
}
