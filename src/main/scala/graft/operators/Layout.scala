package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Write-time data layout: z-order (Morton) clustering, the lakehouse
  * technique for multi-column data skipping. A scan with predicates on ANY
  * of the z-ordered columns prunes most files by their min/max stats,
  * because interleaving the key bits makes every file's row range a small
  * hyper-rectangle in key space — single-column sorting gives perfect
  * pruning on one column and none on the others.
  *
  * The key is a pure integer expression (unrolled shifts/masks — codegen'd,
  * no UDF); the layout pass is one range repartition + an in-partition
  * sort, exactly the shuffle a sorted write costs anyway.
  */
object Layout {

  /** Morton (z-order) key: interleave the low `bits` of each column,
    * column i owning bit positions i, i+n, i+2n, ... (n = #cols). Columns
    * must be non-negative after casting to long (callers with signed /
    * non-integer domains map them into rank space first — at production
    * scale, range-bucket rank, same as every lakehouse z-order).
    */
  def zorderKey(cols: Seq[Column], bits: Int): Column = {
    require(cols.nonEmpty, "zorderKey needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"interleaved width must fit a long: bits=$bits cols=${cols.size}")
    val n = cols.size
    val terms = for {
      (c, i) <- cols.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
      b * n + i)
    terms.reduce(_ + _)
  }

  /** Cluster `df` by the z-order of `colNames`: range-partition on the
    * Morton key (contiguous key ranges per output partition), sort within
    * partitions, drop the key. Writing the result gives each file a tight
    * min/max envelope on every clustered column.
    */
  def zorderLayout(df: DataFrame, colNames: Seq[String], bits: Int,
      partitions: Int): DataFrame = {
    val keyed = df.withColumn("__z",
      zorderKey(colNames.map(df.col), bits))
    keyed.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
