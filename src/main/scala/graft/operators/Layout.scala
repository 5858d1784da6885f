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
    * min/max envelope on every clustered column. Columns must already be
    * non-negative integers (the [[zorderKey]] contract) — for signed,
    * double, string, date or timestamp columns use [[zorderLayoutRanked]].
    */
  def zorderLayout(df: DataFrame, colNames: Seq[String], bits: Int,
      partitions: Int): DataFrame = {
    val keyed = df.withColumn("__z",
      zorderKey(colNames.map(df.col), bits))
    keyed.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** Order-preserving numeric projection for rank bucketing: numerics and
    * booleans cast; dates/timestamps to their epoch counters; strings map
    * through their first 7 UTF-8 bytes big-endian (zero-padded — preserves
    * lexicographic order of the prefix; longer shared prefixes collapse to
    * one rank, which only loosens bucketing, never mis-orders it).
    */
  private def ordProjection(c: Column, t: org.apache.spark.sql.types.DataType): Column = {
    import org.apache.spark.sql.types._
    t match {
      case StringType =>
        conv(rpad(hex(substring(encode(c, "UTF-8"), 1, 7)), 14, "0"), 16, 10)
          .cast("double")
      case DateType      => unix_date(c).cast("double")
      case TimestampType => unix_micros(c).cast("double")
      case BooleanType   => c.cast("int").cast("double")
      case _: NumericType => c.cast("double")
      case other => throw new IllegalArgumentException(
        s"zorderLayoutRanked cannot rank-bucket a ${other.simpleString} column")
    }
  }

  /** Per-column rank-bucket expressions mapping ARBITRARY orderable
    * domains (signed, double, string, date/timestamp) into [0, 2^bits)
    * for [[zorderKey]] — the range-bucket rank every lakehouse z-order
    * uses. Boundaries are the 2^bits-1 sampled quantiles of each column
    * (ONE approxQuantile pass over all columns together — a bounded
    * driver-side boundary list, never a sort or window over the data);
    * the per-row bucket is the count of boundaries <= value, an O(2^bits)
    * scan-pass fold over the boundary literal. Skewed domains get
    * equal-POPULATION buckets by construction, so the Morton tiles stay
    * balanced where a linear (min/max) split would put all rows in one
    * cell. Nulls rank into bucket 0 (they carry no envelope information).
    */
  def rankBuckets(df: DataFrame, colNames: Seq[String], bits: Int,
      relativeError: Double = 0.001): Seq[Column] = {
    require(colNames.nonEmpty, "rankBuckets needs at least one column")
    val buckets = 1 << bits
    val projected = colNames.map(n => ordProjection(df.col(n), df.schema(n).dataType))
    val ordNames  = colNames.indices.map(i => s"__ord$i")
    val tmp = df.select(projected.zip(ordNames).map { case (c, n) => c.as(n) }: _*)
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val bndAll = tmp.stat.approxQuantile(ordNames.toArray, probs, relativeError)
    projected.zip(bndAll).map { case (p, bnds) =>
      val b = bnds.distinct.sorted
      aggregate(lit(b), lit(0L), (acc, bd) => acc + when(p >= bd, 1L).otherwise(0L))
    }
  }

  /** [[zorderLayout]] for arbitrary orderable columns: rank-bucket each
    * column ([[rankBuckets]] — one extra sampling pass at write time),
    * then the usual Morton key + range repartition + in-partition sort.
    */
  def zorderLayoutRanked(df: DataFrame, colNames: Seq[String], bits: Int,
      partitions: Int): DataFrame = {
    val keyed = df.withColumn("__z",
      zorderKey(rankBuckets(df, colNames, bits), bits))
    keyed.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
