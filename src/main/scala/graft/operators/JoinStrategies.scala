package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The two join-layout techniques of the 100 TB playbook that aren't a
  * single built-in call — bucketed co-location and key salting — exposed
  * as library operators so pipelines use the vetted shape instead of
  * re-deriving it.
  *
  *  - Co-location: the reference reads N ALIGNED columns of a table
  *    per-row without any join machinery (`python/scannerpy/op.py:174-186`
  *    positional binding; storage layout `scanner/engine/ingest.cpp`).
  *    Spark's equivalent alignment guarantee is a bucketed+sorted table:
  *    two streams bucketed identically on (streamId, index) positional-join
  *    WITHOUT an exchange — the sort-merge join reads co-located buckets.
  *  - Salting: a skewed build key (one stream id holding half the corpus)
  *    overwhelms one task in a plain equi-join. Salting splits each key
  *    into `salt` sub-keys: the big side hashes each row into one sub-key,
  *    the small side replicates into all of them — parallelism × salt on
  *    the hot key for a small-side blowup of × salt. AQE's skew-join
  *    handles sort-merge cases adaptively; salting is the deterministic
  *    variant that also covers aggregations and broadcast-ineligible
  *    smalls.
  */
object JoinStrategies {

  /** Write a sequence relation as a bucketed, sorted table co-located on
    * (streamId, index). Tables written with the same `buckets` count
    * positional-join exchange-free.
    */
  def writeAligned(df: DataFrame, table: String, buckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, SequenceOps.STREAM, SequenceOps.INDEX)
      .sortBy(SequenceOps.STREAM, SequenceOps.INDEX)
      .format("parquet")
      .saveAsTable(table)

  /** Positional join of aligned bucketed tables (by name, written via
    * [[writeAligned]]) — the reference's multi-column read, shuffle-free.
    * Sequence relations usually all carry a column named `payload`, so
    * colliding value columns are disambiguated with a table-name prefix;
    * unique names pass through untouched.
    */
  def positionalJoinAligned(spark: SparkSession, tables: Seq[String]): DataFrame = {
    val keys = Seq(SequenceOps.STREAM, SequenceOps.INDEX)
    val valueNames = tables.flatMap(t =>
      spark.table(t).columns.filterNot(keys.contains).map(c => (t, c)))
    val dup = valueNames.groupBy(_._2).filter(_._2.size > 1).keySet
    val dfs = tables.map { t =>
      val df = spark.table(t)
      df.columns.filterNot(keys.contains).filter(dup.contains)
        .foldLeft(df)((d, c) => d.withColumnRenamed(c, s"${t}_$c"))
    }
    SequenceOps.positionalJoin(dfs)
  }

  /** Salted equi-join for skewed keys: deterministic per-row salt on the
    * big side (hash of its hashable columns — no RNG state, retry-stable),
    * small side replicated across all `salt` sub-keys.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive, got $salt")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedJoin reserves the column name __salt")
    // hash() rejects MapType; skip maps — any remaining column mix still
    // spreads rows of one hot key across sub-keys
    val hashable = big.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toSeq
    require(hashable.nonEmpty, "big side needs at least one non-map column to salt on")
    val b = big.withColumn("__salt", pmod(hash(hashable: _*), lit(salt)))
    val s = small.withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }

  /** Bloom-filter pre-filtered semi-join — the runtime-filter pattern for
    * fact⋈filter at 100 TB when the filtering side's key set is too big to
    * broadcast as an exact hash relation but fits a few MB of bloom bits:
    * build the filter with ONE distributed aggregate over the keys
    * (`DataFrameStatFunctions.bloomFilter`, merged tree-style), broadcast
    * it to every scan task, drop non-matching fact rows BEFORE the
    * shuffle, then run the exact semi-join on the survivors to clear the
    * ~fpp false positives. Bit-identical to the plain semi-join — the
    * bloom pass only cuts the fact side's shuffle volume by ~selectivity.
    * (Spark's own AQE runtime bloom injects the same shape when stats
    * line up; this operator makes it explicit and unconditional.)
    */
  /** The ONE audited bloom build+probe: construct the filter over
    * `keyed`'s key column and return the codegen probe predicate for an
    * equally-typed column. The probe must match how stat.bloomFilter
    * inserted the keys — integral types as longs, strings as UTF-8 bytes;
    * a mismatched probe (e.g. casting a string key to long) would
    * silently drop every row instead of erroring (spec-pinned). The
    * filter ships as serialized bytes in a foldable literal so the
    * native probe (plans.BloomMightContain) deserializes once per
    * expression instance and the gated scan stays inside one
    * whole-stage-codegen span (a Scala-UDF probe would break it per row).
    * Shared by [[bloomSemiJoin]] and the bloom-gated decontamination
    * ([[graft.functions.Dedup.ngramContaminationBloom]]).
    */
  private[graft] def bloomProbe(keyed: DataFrame, key: String,
      expectedKeys: Long, fpp: Double): Column => Column = {
    import org.apache.spark.sql.types._
    val integral = keyed.schema(key).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case StringType => false
      case t => throw new IllegalArgumentException(
        s"bloom probe supports integral or string keys, got ${t.simpleString}")
    }
    val bf = keyed.stat.bloomFilter(key, expectedKeys, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    probe => call_function("bloom_might_contain", lit(bytes),
      if (integral) probe.cast("long") else probe)
  }

  def bloomSemiJoin(big: DataFrame, keyed: DataFrame, bigKey: String,
      smallKey: String, expectedKeys: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val keyType = big.schema(bigKey).dataType
    require(keyType == keyed.schema(smallKey).dataType,
      s"bloomSemiJoin key types differ: $keyType vs ${keyed.schema(smallKey).dataType}")
    val prefiltered =
      big.filter(bloomProbe(keyed, smallKey, expectedKeys, fpp)(col(bigKey)))
    // dataframe-qualified key refs: with an unqualified `col(k) === col(k)`
    // a shared key NAME across both sides is ambiguous (AnalysisException)
    prefiltered.join(keyed, prefiltered.col(bigKey) === keyed.col(smallKey), "left_semi")
  }

  /** exact floor(x / w) on longs without the double-precision trap
    * (ts ~ 1.7e18 ns > 2^53: a double `/` can misplace boundary points):
    * subtract the non-negative `pmod` remainder, then the integral `div`
    * of an exactly-divisible value — floor for ANY sign of x.
    */
  private def floorBucket(c: org.apache.spark.sql.Column, w: Long) =
    ((c - pmod(c, lit(w))).cast("decimal(38,0)") / lit(w)).cast("long")

  /** Bucketed interval (range) join — the equi-join rewrite of the
    * point-in-interval theta join that Spark would otherwise plan as a
    * broadcast-nested-loop (or a cartesian when neither side fits) at
    * scale: quantize the range dimension into fixed-width buckets,
    * explode each interval across every bucket it overlaps, equi-join
    * points to intervals on the bucket key, and apply the exact
    * containment as a cheap post-filter. A (point, interval) match meets
    * in exactly ONE bucket — the point's — so no pair dedup is needed.
    * Shuffle is hash-partitioned on the bucket; per-interval fan-out is
    * bounded by ceil(len / bucketWidth) + 1, so set `bucketWidth` near
    * the typical interval length to keep the blow-up ≤ 2x (skewed hot
    * buckets then fall to AQE skew-split or [[saltedJoin]]).
    * Half-open [start, end) semantics — the time-window convention;
    * empty/negative intervals contribute nothing.
    */
  def bucketedRangeJoin(points: DataFrame, intervals: DataFrame,
      ptCol: String, startCol: String, endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    // loud failure over silent ambiguity (mirrors asofJoin's overlap
    // check): a shared column name — or a pre-existing __bk — would
    // produce duplicate/ambiguous columns downstream of the equi-join
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"bucketedRangeJoin requires disjoint column sets; shared: ${overlap.mkString(", ")}")
    require(!points.columns.contains("__bk") && !intervals.columns.contains("__bk"),
      "bucketedRangeJoin reserves the column name __bk")
    val pb = points.withColumn("__bk", floorBucket(col(ptCol), bucketWidth))
    val ib = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__bk", explode(sequence(
        floorBucket(col(startCol), bucketWidth),
        floorBucket(col(endCol) - 1, bucketWidth))))
    pb.join(ib, Seq("__bk"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bk")
  }
}
