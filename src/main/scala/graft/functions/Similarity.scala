package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

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
  * All arithmetic is double, computed as an ordered left-to-right fold so
  * results are bit-identical to the DuckDB oracle (`list_inner_product`).
  */
object Similarity {

  /** ordered-fold dot product of two array<double|float> columns */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** cosine = dot / (|a| * |b|), norms as sqrt of ordered-fold self-dot */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** sign-bit bucket over the first `bits` dimensions (bit q set iff
    * dim q+1 >= 0) — the cheap IVF/LSH partition key
    */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits).map(q =>
      when(element_at(v, q + 1) >= 0f, lit(1L << (bits - 1 - q))).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Exact top-k neighbors for each query vector (brute force, broadcast
    * queries). Output: (qid, id, rank, score), score rounded to 6 dp for
    * cross-engine rank stability, self-matches excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv")))
    val scored = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .join(q, col("id") =!= col("qid"))
      .select(col("qid"), col("id"), round(cosine(col("qv"), col("v")), 6).as("score"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Bucketed (approximate) top-k: only candidates in the query's sign
    * bucket are scored. Same output shape as [[bruteForceTopK]].
    */
  def bucketedTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, bits: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits).as("bucket"))
    val q = broadcast(queries.select(col(idCol).as("qid"), col(vecCol).as("qv"),
      signBucket(col(vecCol), bits).as("bucket")))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("id") =!= col("qid"))
      .select(col("qid"), col("id"), round(cosine(col("qv"), col("v")), 6).as("score"))
    val w = Window.partitionBy(col("qid")).orderBy(col("score").desc, col("id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** near-duplicate pairs by embedding cosine within sign buckets */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      bits: Int, threshold: Double): DataFrame = {
    val keyed = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits).as("bucket"))
    val l = keyed.select(col("bucket"), col("id").as("a"), col("v").as("va"))
    val r = keyed.select(col("bucket"), col("id").as("b"), col("v").as("vb"))
    l.join(r, Seq("bucket"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"), round(cosine(col("va"), col("vb")), 6).as("score"))
      .filter(col("score") >= threshold)
  }
}
