package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch: point-frequency estimates out of d x w fixed memory.
  *
  * The third member of the sketch family (HLL count-distinct, GK
  * quantiles — both in RelQueries): cells merge by SUM, so the build is
  * one map-side-combining aggregation into at most d*w rows no matter the
  * corpus size, and a probe answers "how often does item X occur" without
  * the vocab-sized shuffle an exact count pays. Estimates over-count
  * (collisions only add), within eps*N at w = ceil(e/eps), delta = e^-d.
  *
  * The hash family is the minhash universal family ([[Dedup.slotA]]/
  * [[Dedup.slotB]]) over a PER-ROW md5 residue (row index salted into the
  * digest input), so the d rows are genuinely independent: two items that
  * collide in row 0's residue get fresh digests in every other row, and
  * delta = e^-d holds without a shared-residue collision floor. The DuckDB
  * oracle replays the same salted digests bit-for-bit — same cells, same
  * collisions, same estimates.
  */
object CountMin {

  /** cell index of `item` in hash row r: universal slot hash over the
    * row-salted md5 residue, mod w
    */
  private def cell(item: Column, r: Int, w: Int): Column = {
    val xm = conv(substring(md5(concat(lit(r + "#"), item)), 1, 15), 16, 10)
      .cast("long") % Dedup.minhashP
    (lit(Dedup.slotA(r)) * xm + lit(Dedup.slotB(r))) % Dedup.minhashP % w
  }

  /** Build the sketch over one item per input row: (r, c, cnt), at most
    * d*w rows. Explode-then-one-agg: map-side combine collapses each
    * partition to its own d*w cells before the (tiny) shuffle.
    */
  def sketch(items: DataFrame, itemCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && w >= 2, s"need d >= 1 hash rows and w >= 2 cells, got d=$d w=$w")
    items
      .select(explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cell(col(itemCol), r, w).as("c"))): _*)).as("rc"))
      .groupBy(col("rc.r").as("r"), col("rc.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes` against a prebuilt sketch: min over the
    * d cells, absent cells = 0 (the sketch is the broadcast side — d*w
    * rows; the probe relation never shuffles the corpus).
    */
  def estimate(sk: DataFrame, probes: DataFrame, itemCol: String,
      d: Int, w: Int): DataFrame =
    probes
      .select(col(itemCol), explode(array((0 until d).map(r =>
        struct(lit(r).as("r"), cell(col(itemCol), r, w).as("c"))): _*)).as("rc"))
      .join(broadcast(sk),
        col("rc.r") === sk("r") && col("rc.c") === sk("c"), "left")
      .groupBy(col(itemCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
