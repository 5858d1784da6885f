package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-versioning provenance: which documents appeared, vanished, or
  * changed between two snapshots of a growing crawl — the bookkeeping a
  * periodically-refreshed pretraining corpus needs before incremental
  * dedup/cleaning can process "only what's new" (the batch twin of the
  * incremental band-index probe, [[Dedup]]'s `lshProbeIndex` family).
  */
object Provenance {

  /** Diff two snapshots keyed on `idCol`, comparing content by md5 of
    * `textCol`: per id, status ∈ added | removed | changed | unchanged.
    *
    * Scale shape: each side reduces to (id, md5) IN THE SCAN — text
    * never crosses the exchange; the diff is one full-outer hash join
    * on the id. At 100 TB both sides shuffle 48-byte rows; pre-bucketed
    * snapshot tables (the [[Similarity]] persisted-index pattern) would
    * make even that join co-located.
    */
  def snapshotDiff(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    def keyed(df: DataFrame, h: String) =
      df.select(col(idCol), md5(col(textCol)).as(h))
    keyed(a, "__ha").join(keyed(b, "__hb"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__ha").isNull, lit("added"))
          .when(col("__hb").isNull, lit("removed"))
          .when(col("__ha") === col("__hb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** [[snapshotDiff]] rolled up per group (e.g. source): the corpus
    * churn report — how much of each slice is new/gone/rewritten.
    */
  def snapshotChurn(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String, groupOf: DataFrame): DataFrame =
    snapshotDiff(a, b, idCol, textCol)
      .join(groupOf, Seq(idCol))
      .groupBy(col("grp"), col("status"))
      .agg(count(lit(1)).as("n"))
}
