package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}


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

  /** One-pass scatter state: exact signed-128-bit sums (hi:lo limbs, lo
    * unsigned) of every upper-triangle pair product, the per-position
    * value sums, the row count, and the per-position max |q|. Replaces
    * the explode-2080-decimal-structs-per-row formulation (which paid a
    * struct allocation + a decimal multiply + a hash-agg probe per cell
    * per row — ~10M interpreted rows at d=64 over 5k vectors) with one
    * tight primitive-long loop per row. Every sum is exact integer
    * algebra, so [[principalAxesLocal]] reads back the identical BigInt
    * values the decimal aggregation produced; a signed-128 overflow is
    * detected and refused loudly, the same failure class as the old
    * decimal(38,0) null check.
    */
  final case class ScatterBuf(hi: Array[Long], lo: Array[Long],
      sqHi: Array[Long], sqLo: Array[Long], n: Long, mx: Array[Long])

  private final class ScatterAgg(dim: Int)
      extends Aggregator[Seq[Long], ScatterBuf, ScatterBuf] {
    private val cells = dim * (dim + 1) / 2

    override def zero: ScatterBuf = ScatterBuf(
      new Array[Long](cells), new Array[Long](cells),
      new Array[Long](dim), new Array[Long](dim), 0L, new Array[Long](dim))

    /** b(i) += (pHi:pLo), signed 128-bit with loud overflow */
    @inline private def add128(hi: Array[Long], lo: Array[Long], i: Int,
        pHi: Long, pLo: Long): Unit = {
      val x = lo(i)
      val nl = x + pLo
      // unsigned carry out of the low limb: nl wrapped iff nl <u x
      val carry = if (java.lang.Long.compareUnsigned(nl, x) < 0) 1L else 0L
      lo(i) = nl
      hi(i) = try math.addExact(math.addExact(hi(i), pHi), carry)
      catch {
        case _: ArithmeticException => throw new IllegalStateException(
          "scatter sum overflowed 128 bits — lower quantScale for this value range")
      }
    }

    override def reduce(b: ScatterBuf, q: Seq[Long]): ScatterBuf = {
      require(q != null && q.length == dim,
        s"ragged vectors: expected $dim positions, found ${if (q == null) 0 else q.length}")
      val a = q.toArray
      var c = 0
      var i = 0
      while (i < dim) {
        val ai = a(i)
        add128(b.sqHi, b.sqLo, i, ai >> 63, ai)
        val absAi = math.abs(ai)
        if (absAi > b.mx(i)) b.mx(i) = absAi
        var j = i
        while (j < dim) {
          val p = ai * a(j)
          add128(b.hi, b.lo, c, Math.multiplyHigh(ai, a(j)), p)
          c += 1
          j += 1
        }
        i += 1
      }
      ScatterBuf(b.hi, b.lo, b.sqHi, b.sqLo, b.n + 1, b.mx)
    }

    override def merge(x: ScatterBuf, y: ScatterBuf): ScatterBuf = {
      var c = 0
      while (c < cells) { add128(x.hi, x.lo, c, y.hi(c), y.lo(c)); c += 1 }
      var i = 0
      while (i < dim) {
        add128(x.sqHi, x.sqLo, i, y.sqHi(i), y.sqLo(i))
        if (y.mx(i) > x.mx(i)) x.mx(i) = y.mx(i)
        i += 1
      }
      ScatterBuf(x.hi, x.lo, x.sqHi, x.sqLo, x.n + y.n, x.mx)
    }

    override def finish(r: ScatterBuf): ScatterBuf = r
    override def bufferEncoder: Encoder[ScatterBuf] = Encoders.product[ScatterBuf]
    override def outputEncoder: Encoder[ScatterBuf] = Encoders.product[ScatterBuf]
  }

  /** (hi:lo) signed-128 limbs -> BigInt */
  private def big128(hi: Long, lo: Long): BigInt =
    (BigInt(hi) << 64) + (BigInt(lo) & ((BigInt(1) << 64) - 1))

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
    // null embedding rows are SKIPPED, matching the historical explode-
    // based aggregation (which never emitted cells for a null vector);
    // rows with the wrong number of positions still fail loudly in the
    // aggregate's ragged check below
    val q = quantize(emb, vecCol, quantScale).select(col("__q"))
      .where(col("__q").isNotNull)

    // ONE distributed pass + ONE driver job: the [[ScatterAgg]] imperative
    // aggregate folds every row's d(d+1)/2 pair products, the per-position
    // sums, the row count, and the per-position max |q| into a single
    // exact-128-bit buffer (was: an explode of 2080 decimal structs per
    // row into a 2080-key hash agg, plus a second posexplode job — same
    // BigInt sums, ~10M fewer intermediate rows at the gate SF, and the
    // input relation no longer needs a cache because it is scanned once)
    val pairIdx = (0 until dim).flatMap(i => (i until dim).map(j => (i, j)))
    val scatter = udaf(new ScatterAgg(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
    val buf = q.agg(scatter(col("__q")).as("sc")).head().getStruct(0)
    val hi   = buf.getAs[scala.collection.Seq[Long]]("hi")
    val lo   = buf.getAs[scala.collection.Seq[Long]]("lo")
    val sqHi = buf.getAs[scala.collection.Seq[Long]]("sqHi")
    val sqLo = buf.getAs[scala.collection.Seq[Long]]("sqLo")
    val mx   = buf.getAs[scala.collection.Seq[Long]]("mx")
    val nRows = buf.getAs[Long]("n")
    require(nRows > 0, s"expected $dim vector positions, found 0 (ragged or empty input)")
    val n = BigInt(nRows)
    val sq = Array.tabulate[BigInt](dim)(i => big128(sqHi(i), sqLo(i)))
    (0 until dim).foreach { p =>
      // the historical exact-product grid bound (the old decimal(18,0)
      // cast refused past it); kept so the envelope and the error text
      // stay identical for out-of-range inputs
      require(mx(p) <= 999999999999999999L,
        s"quantized magnitude ${mx(p)} at position $p exceeds the " +
          s"exact-product grid; lower quantScale ($quantScale) for this value range")
    }
    require(hi.size == pairIdx.size && lo.size == pairIdx.size,
      s"scatter agg returned ${hi.size}/${lo.size} limb cells, expected ${pairIdx.size}")
    val spp = pairIdx.zipWithIndex.map { case ((i, j), c) =>
      (i, j) -> big128(hi(c), lo(c)) }.toMap

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
