package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.H264Transform._

/** Pins the 8x8 transform/quant layer: the zigzag generator against the
  * spec's 4x4 scan (Figure 8-8) and the canonical 8x8 head/tail, DC
  * consistency (forward 2-D gain 64, inverse gain 1/64), and the full
  * quant round trip — decode(encode(residual)) within the quantisation
  * error bound at several QPs (exactness at QP 0 cannot hold for 8x8:
  * V8 entries are not all divisible by 4, so the spec's own low-QP
  * rounding term admits ±1; the bound here is the measured envelope).
  */
class H264Transform8Spec extends AnyFunSuite {

  test("diagonal zigzag generator reproduces the spec 4x4 scan") {
    assert(diagonalZigzag(4).toSeq == zigzag4x4.toSeq)
  }

  test("8x8 zigzag head and tail match the spec Table 8-8 frame scan") {
    assert(zigzag8x8.take(10).toSeq == Seq(0, 1, 8, 16, 9, 2, 3, 10, 17, 24))
    assert(zigzag8x8.takeRight(4).toSeq == Seq(47, 55, 62, 63))
    assert(zigzag8x8.sorted.toSeq == (0 until 64))
  }

  test("DC path: forward gain 64, inverse gain 1/64") {
    val b = Array.fill(64)(5)
    forward8x8(b)
    assert(b(0) == 5 * 64)
    assert(b.tail.forall(_ == 0))
    val w = new Array[Int](64)
    w(0) = 320
    inverse8x8(w)
    assert(w.forall(_ == 5))
  }

  test("derived MF8 reproduces the canonical 8x8 quant constants") {
    // positions picked per class: (0,0) (1,1) (2,2) (0,1) (0,2) (1,2)
    assert(mf8(0, 0) == 13107)
    assert(mf8(0, 9) == 11428)
    assert(mf8(0, 18) == 20972)
    assert(mf8(0, 1) == 12222)
    assert(mf8(0, 2) == 16777)
    assert(mf8(0, 10) == 15481)
  }

  test("quant round trip: residuals reconstruct within the QP error bound") {
    val rnd = new scala.util.Random(7)
    for (qp <- Seq(0, 6, 12, 16, 24); trial <- 0 until 20) {
      val src = Array.fill(64)(rnd.nextInt(511) - 255)
      val b = src.clone()
      forward8x8(b)
      val zig = new Array[Int](64)
      var zi = 0
      while (zi < 64) {
        val pos = zigzag8x8(zi)
        zig(zi) = quantAc8(b(pos), qp, pos)
        zi += 1
      }
      val w = new Array[Int](64)
      zi = 0
      while (zi < 64) {
        val pos = zigzag8x8(zi)
        w(pos) = dequantAc8(zig(zi), qp, pos)
        zi += 1
      }
      inverse8x8(w)
      // error envelope ~ Qstep: Qstep(0) ~ 0.625 -> |err| <= 2;
      // doubles every 6 QP
      val bound = 2 + (1 << (qp / 6))
      src.indices.foreach { i =>
        assert(math.abs(w(i) - src(i)) <= bound,
          s"qp=$qp pos=$i src=${src(i)} got=${w(i)} bound=$bound")
      }
    }
  }
}
