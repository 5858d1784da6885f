package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Sequence packing — the last mile of a pretraining pipeline: assign
  * documents to fixed token-budget training sequences ("packs") so batches
  * waste minimal padding. Greedy first-fit in document order, the standard
  * production choice (optimal bin packing is NP-hard and irrelevant at this
  * payoff).
  *
  * Packing is inherently an ordered scan, so it cannot be a pure
  * shuffle-free expression; the scale shape is the same one the engine uses
  * for bounded/unbounded kernels: ONE hash-partition shuffle into
  * (groupCols..., shard) groups, then an ordered single pass per group
  * (`flatMapSortedGroups`). Sharding is what makes it 100 TB-viable —
  * packing order only matters WITHIN a shard (training sequences are
  * shuffled downstream anyway), so parallelism = #groups x #shards, and a
  * deterministic shard key (orderCol % shards) keeps results reproducible
  * across runs and engines.
  */
object Packing {

  /** Pack rows into budget-bounded sequences.
    *
    * @param df        input with `orderCol` (long, the within-shard packing
    *                  order), `weightCol` (long, e.g. token count), and
    *                  `groupCol` (string, e.g. source corpus)
    * @param budget    max total weight per pack; an oversized single row
    *                  still gets its own pack (never dropped silently)
    * @param shards    parallelism per group; shard = orderCol % shards
    * @return input columns (orderCol, groupCol, shard, weightCol) plus
    *         `pack_id` (long, dense per (group, shard) starting at 0)
    */
  def packSequences(df: DataFrame, orderCol: String, weightCol: String,
      groupCol: String, budget: Long, shards: Int = 8): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    require(shards > 0, s"shards must be positive, got $shards")
    val d = df.select(
      col(orderCol).cast("long"), col(groupCol),
      (col(orderCol) % shards).cast("long").as("shard"),
      col(weightCol).cast("long"))
      .as[(Long, String, Long, Long)](
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
          Encoders.scalaLong, Encoders.scalaLong))
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong, Encoders.STRING,
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    d.groupByKey(r => (r._2, r._3))(
        Encoders.tuple(Encoders.STRING, Encoders.scalaLong))
      .flatMapSortedGroups(col(orderCol)) {
        (_: (String, Long), it: Iterator[(Long, String, Long, Long)]) =>
          var pack  = 0L
          var fill  = 0L
          var first = true
          it.map { case (ord, group, shard, w) =>
            if (!first && fill + w > budget) { pack += 1; fill = w }
            else fill += w
            first = false
            (ord, group, shard, w, pack)
          }
      }
      .toDF(orderCol, groupCol, "shard", weightCol, "pack_id")
  }

  /** Eval-set contamination: rows of `train` sharing at least one value of
    * `keyCol` (e.g. an n-gram) with `eval`. The eval key set is small by
    * construction (a benchmark suite), so it broadcasts and the check is a
    * broadcast join over the exploded corpus — never corpus x corpus.
    * Returns (idCol, n_overlap); n_overlap counts matching train rows, so
    * pass (idCol, keyCol)-distinct rows (e.g. exploded from
    * `array_distinct` n-grams) to read it as #distinct shared keys.
    */
  def contamination(train: DataFrame, eval: DataFrame,
      idCol: String, keyCol: String): DataFrame = {
    val evalKeys = eval.select(col(keyCol)).distinct()
    train.join(broadcast(evalKeys), Seq(keyCol))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_overlap"))
  }
}
