package graft

import graft.functions.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** in-test BigInt replay of the exact fixed-point pipeline — the
    * operator must match it bit-for-bit on any input (same algebra the
    * DuckDB oracle unrolls)
    */
  private def refAxis(rows: Seq[Seq[Double]], iters: Int = 12,
      quantScale: Long = Pca.QuantScale, vScale: Long = Pca.VScale): Seq[Long] = {
    val d = rows.head.size
    val q = rows.map(_.map(x => BigInt(math.floor(x.toFloat.toDouble * quantScale).toLong)))
    val n = BigInt(rows.size)
    val sq = (0 until d).map(p => q.map(_(p)).sum)
    def s0(i: Int, j: Int) = n * q.map(r => r(i) * r(j)).sum - sq(i) * sq(j)
    val maxAbs = (for (i <- 0 until d; j <- i until d) yield s0(i, j).abs).max
    val sDiv = (maxAbs / Pca.SCap).max(BigInt(1))
    def s(i: Int, j: Int) = s0(math.min(i, j), math.max(i, j)) / sDiv
    var v = Seq.fill(d)(BigInt(vScale))
    for (_ <- 0 until iters) {
      val w = (0 until d).map(i => (0 until d).map(j => s(i, j) * v(j)).sum)
      val m = w.map(_.abs).max
      v = if (m == 0) Seq.fill(d)(BigInt(0)) else w.map(_ * vScale / m)
    }
    val sign = v.find(_ != 0).map(_.signum).getOrElse(1)
    (if (sign < 0) v.map(-_) else v).map(_.toLong)
  }

  private def axisOf(rows: Seq[Seq[Double]]): Seq[Long] =
    Pca.principalAxis(rows.map(r => r.map(_.toFloat)).zipWithIndex
        .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding"),
        "embedding", dim = rows.head.size)
      .orderBy("pos").collect().map(_.getLong(1)).toSeq

  test("principalAxis matches the BigInt replay bit-for-bit") {
    val rows = (0 until 10).map(i => Seq(
      math.sin(i * 1.7) * 0.8, math.cos(i * 0.9) * 0.3,
      math.sin(i * 2.3 + 1) * 0.5, (i % 3 - 1) * 0.25))
    assert(axisOf(rows) == refAxis(rows))
  }

  test("principalAxis finds the stretch direction; sign convention fixed") {
    // points on the line t*(0.6, 0.8) plus small orthogonal noise
    val rows = (-5 to 5).map { t =>
      val noise = (t % 2) * 0.01
      Seq(0.6 * t * 0.1 - 0.8 * noise, 0.8 * t * 0.1 + 0.6 * noise)
    }
    val a = axisOf(rows)
    assert(a == refAxis(rows))
    assert(a.head > 0, s"first nonzero loading must be positive, got $a")
    // direction ~ (0.6, 0.8): ratio a(1)/a(0) ~ 4/3 within the noise
    val ratio = a(1).toDouble / a(0).toDouble
    assert(math.abs(ratio - 4.0 / 3.0) < 0.05, s"ratio $ratio")
    assert(a.map(math.abs).max == Pca.VScale)
  }

  test("principalAxis is deterministic across runs and partitionings") {
    val rows = (0 until 50).map(i => (0 until 8).map(j =>
      math.sin(i * 0.37 + j * 1.1) * (1.0 + j * 0.1)))
    val df = spark.createDataFrame(rows.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat)) }).toDF("vec_id", "embedding")
    val a = Pca.principalAxis(df, "embedding", dim = 8).orderBy("pos")
      .collect().map(_.getLong(1)).toSeq
    val b = Pca.principalAxis(df.repartition(13), "embedding", dim = 8).orderBy("pos")
      .collect().map(_.getLong(1)).toSeq
    assert(a == b)
    assert(a == refAxis(rows))
  }

  test("projectPrincipal scores are the exact quantized dot with the axis") {
    val rows = (0 until 12).map(i => Seq(
      math.cos(i * 0.8) * 0.7, math.sin(i * 1.3) * 0.4, (i % 5 - 2) * 0.2))
    val axis = refAxis(rows)
    val df = rows.map(r => r.map(_.toFloat)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val got = Pca.projectPrincipal(df, "vec_id", "embedding", dim = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.zipWithIndex.map { case (r, i) =>
      i.toLong -> r.zip(axis).map { case (x, a) =>
        math.floor(x.toFloat.toDouble * Pca.QuantScale).toLong * a }.sum
    }.toMap
    assert(got == want)
  }

  /** BigInt replay of the m-component deflation */
  private def refAxes(rows: Seq[Seq[Double]], m: Int, iters: Int = 12,
      quantScale: Long = Pca.QuantScale, vScale: Long = Pca.VScale): Seq[Seq[Long]] = {
    val d = rows.head.size
    val q = rows.map(_.map(x => BigInt(math.floor(x.toFloat.toDouble * quantScale).toLong)))
    val n = BigInt(rows.size)
    val sq = (0 until d).map(p => q.map(_(p)).sum)
    def s0(i: Int, j: Int) = n * q.map(r => r(i) * r(j)).sum - sq(i) * sq(j)
    val maxAbs = (for (i <- 0 until d; j <- i until d) yield s0(i, j).abs).max
    val sDiv = (maxAbs / Pca.SCap).max(BigInt(1))
    def s(i: Int, j: Int) = s0(math.min(i, j), math.max(i, j)) / sDiv
    val axes = collection.mutable.Buffer.empty[Seq[BigInt]]
    for (_ <- 0 until m) {
      var v = Seq.fill(d)(BigInt(vScale))
      for (_ <- 0 until iters) {
        var w = (0 until d).map(i => (0 until d).map(j => s(i, j) * v(j)).sum)
        for (prev <- axes) {
          val pp = prev.map(x => x * x).sum
          if (pp != 0) {
            val c = w.zip(prev).map { case (a, b) => a * b }.sum / pp
            w = w.zip(prev).map { case (a, b) => a - c * b }
          }
        }
        val mx = w.map(_.abs).max
        v = if (mx == 0) Seq.fill(d)(BigInt(0)) else w.map(_ * vScale / mx)
      }
      val sign = v.find(_ != 0).map(_.signum).getOrElse(1)
      axes += (if (sign < 0) v.map(-_) else v)
    }
    axes.map(_.map(_.toLong)).toSeq
  }

  test("principalAxes(m=2): deflated replay parity; second axis finds the second stretch") {
    // variance mostly along e0, secondary along e1, tiny noise on e2
    val rows = (0 until 24).map { i =>
      Seq(math.sin(i * 0.7) * 1.0, math.cos(i * 1.3) * 0.4, (i % 2) * 0.01)
    }
    val df = rows.map(r => r.map(_.toFloat)).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toDF("vec_id", "embedding")
    val got = Pca.principalAxes(df, "embedding", dim = 3, m = 2)
      .orderBy("comp", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    val want = refAxes(rows, 2)
    assert(got == want.zipWithIndex.flatMap { case (ax, c) => ax.map((c.toLong, _)) })
    val a0 = want(0); val a1 = want(1)
    // dominant loadings land on the two stretch directions
    assert(math.abs(a0(0)) == Pca.VScale, s"comp0 should peak on e0: $a0")
    assert(math.abs(a1(1)) == Pca.VScale, s"comp1 should peak on e1: $a1")
    // near-orthogonal on the fixed-point grid
    val cos = a0.zip(a1).map { case (x, y) => x.toDouble * y }.sum /
      (math.sqrt(a0.map(x => x.toDouble * x).sum) * math.sqrt(a1.map(x => x.toDouble * x).sum))
    assert(math.abs(cos) < 1e-3, s"axes not orthogonal: cos=$cos")
    // m=1 is exactly principalAxisLocal
    assert(refAxes(rows, 1).head == refAxis(rows))
  }

  test("degenerate input: zero-variance corpus yields the zero axis") {
    val rows = Seq.fill(4)(Seq(0.5, 0.5))
    assert(axisOf(rows) == Seq(0L, 0L))
  }
}
