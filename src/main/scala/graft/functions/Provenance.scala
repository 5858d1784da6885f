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
    // presence flags, NOT hash-nullness: md5(NULL) is NULL, so a doc with
    // NULL text present in both snapshots would otherwise read as
    // "added" (and one present only in A as "added" too — inverted).
    // The hash compare is null-safe for the same reason: two NULL texts
    // are the same content.
    def keyed(df: DataFrame, h: String, p: String) =
      df.select(col(idCol), md5(col(textCol)).as(h), lit(true).as(p))
    keyed(a, "__ha", "__pa")
      .join(keyed(b, "__hb", "__pb"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__pa").isNull, lit("added"))
          .when(col("__pb").isNull, lit("removed"))
          .when(col("__ha") <=> col("__hb"), lit("unchanged"))
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
