package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.CacheScope

/** Exact fixed-point principal-component analysis for embedding columns —
  * the whitening/reduction step ahead of semantic dedup and ANN indexing
  * (where [[Similarity.randomProjectVec]] is the data-oblivious reduction,
  * this is the data-adaptive one: project onto the direction of maximum
  * corpus variance).
  *
  * Exactness design (the same cross-engine discipline as [[GraphRank]]):
  * embedding entries quantize to longs on a fixed grid
  * (`floor(x * quantScale)` — floor of an IEEE double product is
  * bit-deterministic in both engines), the scatter matrix is computed in
  * the mean-free integer form `S = n·Σqqᵀ − (Σq)(Σq)ᵀ` (no rational mean,
  * exact decimal sums), and the power iteration runs in scaled-integer
  * arithmetic (per-round max-normalisation by truncating division). Every
  * step is integer algebra, so loadings and scores land bit-identical
  * across partitionings, re-runs, and engines; the DuckDB oracle replays
  * the full pipeline (HUGEINT) to the same bits — no FP tolerance.
  *
  * Scale shape: the ONLY data-sized work is the one-pass scatter
  * aggregation — d(d+1)/2 products per row feeding a map-side-combined
  * sum onto d(d+1)/2 keys (d=64 → 2080 rows; constant in corpus size).
  * The d×d eigen-iteration is driver-side BigInt on that constant-size
  * matrix (the standard tall-skinny split: executors reduce over rows,
  * the driver solves the tiny spectral problem). The projection pass is
  * a pure scan expression, zero exchanges.
  */
object Pca {

  /** default input quantization grid: 1e6 steps per unit */
  val QuantScale: Long = 1000000L
  /** fixed-point unit of the returned axis loadings (max |loading|) */
  val VScale: Long = 1000000000L
  /** scatter entries are floor-divided down to <= ~1e12 before the
    * iteration so a matvec term stays far inside 128-bit range at any
    * corpus size */
  val SCap: Long = 1000000000000L

  /** quantized per-row vectors (canonical float grid first — see
    * [[Similarity.canonicalVectors]]) */
  private def quantize(emb: DataFrame, vecCol: String, quantScale: Long) =
    Similarity.canonicalVectors(emb, vecCol).withColumn("__q",
      transform(col(vecCol), x => floor(x.cast("double") * quantScale).cast(LongType)))

  /** driver-side principal axis as scaled-integer loadings.
    *
    * @return (dim, loadings) — `loadings(p)` is the axis component at
    *         position p, max magnitude = `vScale`, sign fixed so the
    *         first nonzero component is positive
    */
  def principalAxisLocal(emb: DataFrame, vecCol: String, dim: Int,
      iters: Int = 12, quantScale: Long = QuantScale,
      vScale: Long = VScale): Array[Long] =
    principalAxesLocal(emb, vecCol, dim, m = 1, iters, quantScale, vScale).head

  /** The leading `m` principal axes by power iteration with
    * TRUNCATING-INTEGER deflation: component c's every round first
    * orthogonalizes the matvec result against each already-found axis
    * (`w -= (w·aₚ / aₚ·aₚ)·aₚ`, both dots exact, the division truncating —
    * bit-replayable in HUGEINT) before the max-normalisation. The
    * truncation leaves a sub-ulp residual along the previous axes, so
    * components are orthogonal on the fixed-point grid, not in exact
    * rationals — the point is cross-engine bit identity, same as the
    * rest of the pipeline. m = 1 is exactly [[principalAxisLocal]].
    */
  def principalAxesLocal(emb: DataFrame, vecCol: String, dim: Int, m: Int,
      iters: Int = 12, quantScale: Long = QuantScale,
      vScale: Long = VScale): Seq[Array[Long]] = {
    require(dim >= 1 && dim <= 4096, s"dim $dim out of [1, 4096]")
    require(iters >= 1, s"iters $iters must be >= 1")
    require(m >= 1 && m <= dim && m <= 8, s"m $m out of [1, min(dim, 8)]")
    val q = CacheScope.cache(quantize(emb, vecCol, quantScale).select(col("__q")))

    // one distributed pass: upper-triangle pair-product sums (exact
    // decimal), plus per-position sums and the row count
    val pairIdx = (0 until dim).flatMap(i => (i until dim).map(j => (i, j)))
    // decimal BEFORE the multiply: exact at any quant magnitude (a
    // long*long product could wrap silently)
    val pairSums = q.select(explode(flatten(transform(
        sequence(lit(0), lit(dim - 1)),
        i => transform(sequence(i, lit(dim - 1)),
          j => struct(i.cast("int").as("i"), j.cast("int").as("j"),
            (element_at(col("__q"), i.cast("int") + 1).cast("decimal(18,0)") *
             element_at(col("__q"), j.cast("int") + 1).cast("decimal(18,0)")).as("p"))))))
        .as("e"))
      .groupBy(col("e.i").as("i"), col("e.j").as("j"))
      .agg(sum(col("e.p")).as("spp"))
      .collect()
    val colStats = q.select(posexplode(col("__q")).as(Seq("pos", "qv")))
      .groupBy(col("pos"))
      .agg(sum(col("qv").cast("decimal(38,0)")).as("sq"), count(lit(1)).as("n"),
        max(abs(col("qv"))).as("mx"))
      .collect()
    require(colStats.length == dim,
      s"expected $dim vector positions, found ${colStats.length} (ragged or empty input)")
    val n = BigInt(colStats.head.getLong(2))
    val sq = Array.ofDim[BigInt](dim)
    colStats.foreach { r =>
      require(r.getLong(2) == n.toLong, s"ragged vectors: position ${r.getInt(0)} count differs")
      require(r.getDecimal(1) != null, "per-position sum overflowed decimal(38,0)")
      // the decimal(18,0) pair-product cast would NULL (and the sum then
      // silently skip rows) past this magnitude — refuse loudly instead
      require(r.getLong(3) <= 999999999999999999L,
        s"quantized magnitude ${r.getLong(3)} at position ${r.getInt(0)} exceeds the " +
          s"exact-product grid; lower quantScale ($quantScale) for this value range")
      sq(r.getInt(0)) = BigInt(r.getDecimal(1).toBigInteger)
    }
    val spp = collection.mutable.Map.empty[(Int, Int), BigInt]
    pairSums.foreach { r =>
      require(r.getDecimal(2) != null, "pair-product sum overflowed decimal(38,0)")
      spp((r.getInt(0), r.getInt(1))) = BigInt(r.getDecimal(2).toBigInteger)
    }
    require(spp.size == pairIdx.size, s"scatter agg returned ${spp.size} of ${pairIdx.size} cells")

    // S = n*Σqq − (Σq)(Σq)ᵀ, capped by truncating division (exact algebra
    // both engines replay); BigInt `/` truncates toward zero = DuckDB `//`
    val s0 = pairIdx.map { case (i, j) => (i, j) -> (n * spp((i, j)) - sq(i) * sq(j)) }.toMap
    val maxAbs = s0.values.map(_.abs).max
    val sDiv = (maxAbs / SCap).max(BigInt(1))
    def sAt(i: Int, j: Int): BigInt =
      (if (i <= j) s0((i, j)) else s0((j, i))) / sDiv

    val axes = collection.mutable.Buffer.empty[Array[BigInt]]
    for (_ <- 0 until m) {
      var v = Array.fill(dim)(BigInt(vScale))
      for (_ <- 0 until iters) {
        var w = Array.tabulate(dim)(i =>
          (0 until dim).foldLeft(BigInt(0))((acc, j) => acc + sAt(i, j) * v(j)))
        for (prev <- axes) {
          val pp = prev.map(x => x * x).sum
          if (pp != 0) {
            val c = w.iterator.zip(prev.iterator).map { case (a, b) => a * b }
              .foldLeft(BigInt(0))(_ + _) / pp
            w = w.iterator.zip(prev.iterator).map { case (a, b) => a - c * b }.toArray
          }
        }
        val mx = w.map(_.abs).max
        v = if (mx == 0) Array.fill(dim)(BigInt(0))
            else w.map(x => x * vScale / mx)
      }
      val sign = v.find(_ != 0).map(_.signum).getOrElse(1)
      axes += (if (sign < 0) v.map(x => -x) else v)
    }
    axes.map(_.map(_.toLong)).toSeq
  }

  /** the leading axes as a relation: (comp LONG, pos LONG, loading LONG) */
  def principalAxes(emb: DataFrame, vecCol: String, dim: Int, m: Int,
      iters: Int = 12, quantScale: Long = QuantScale,
      vScale: Long = VScale): DataFrame = {
    val axes = principalAxesLocal(emb, vecCol, dim, m, iters, quantScale, vScale)
    val rows = for ((ax, c) <- axes.zipWithIndex; (l, p) <- ax.zipWithIndex)
      yield Row(c.toLong, p.toLong, l)
    emb.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*),
      StructType(Seq(StructField("comp", LongType, nullable = false),
        StructField("pos", LongType, nullable = false),
        StructField("loading", LongType, nullable = false))))
  }

  /** the principal axis as a relation: (pos LONG, loading LONG) */
  def principalAxis(emb: DataFrame, vecCol: String, dim: Int,
      iters: Int = 12, quantScale: Long = QuantScale,
      vScale: Long = VScale): DataFrame = {
    val axis = principalAxisLocal(emb, vecCol, dim, iters, quantScale, vScale)
    emb.sparkSession.createDataFrame(
      java.util.Arrays.asList(axis.zipWithIndex.map {
        case (l, p) => Row(p.toLong, l) }: _*),
      StructType(Seq(StructField("pos", LongType, nullable = false),
        StructField("loading", LongType, nullable = false))))
  }

  /** per-row projection onto the principal axis: score = Σ q_p·axis_p.
    * The sum accumulates in EXACT decimal (a long accumulator would wrap
    * silently once |q|·vScale·dim passes 2^63 — e.g. entries ~10 at the
    * default grid) and range-checks loudly before narrowing to long, the
    * same failure mode as the oracle's HUGEINT→BIGINT cast. The axis
    * solve is driver-side; the scoring pass is a pure scan expression —
    * ZERO exchanges before any output ordering.
    *
    * @return (idCol, score LONG)
    */
  def projectPrincipal(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      iters: Int = 12, quantScale: Long = QuantScale,
      vScale: Long = VScale): DataFrame = {
    val axis = principalAxisLocal(emb, vecCol, dim, iters, quantScale, vScale)
    quantize(emb, vecCol, quantScale)
      .select(col(idCol), axisScore(axis).as("score"))
  }

  /** exact decimal dot of the quantized `__q` column with a driver-side
    * axis, range-checked loudly before narrowing to long */
  private def axisScore(axis: Array[Long]): org.apache.spark.sql.Column = {
    val s = aggregate(
      zip_with(col("__q"), typedLit(axis),
        (a, b) => a.cast("decimal(18,0)") * b.cast("decimal(18,0)")),
      lit(java.math.BigDecimal.ZERO).cast("decimal(38,0)"), (acc, x) => acc + x)
    when(s.isNull || abs(s) > lit(Long.MaxValue),
      raise_error(lit("projection score exceeds long range — " +
        "lower quantScale for this value range")))
      .otherwise(s.cast("long"))
  }

  /** whitening coordinates: every vector projected onto the leading-m
    * deflated basis — the reduced representation downstream dedup/ANN
    * consume (the data-adaptive analogue of
    * [[Similarity.randomProjectVec]]). One scan pass emitting m exact
    * scores per row, zero exchanges.
    *
    * @return (idCol, score0 .. score{m-1})
    */
  def projectAxes(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      m: Int, iters: Int = 12, quantScale: Long = QuantScale,
      vScale: Long = VScale): DataFrame = {
    val axes = principalAxesLocal(emb, vecCol, dim, m, iters, quantScale, vScale)
    val cols = col(idCol) +: axes.zipWithIndex.map { case (ax, c) =>
      axisScore(ax).as(s"score$c") }
    quantize(emb, vecCol, quantScale).select(cols: _*)
  }
}
