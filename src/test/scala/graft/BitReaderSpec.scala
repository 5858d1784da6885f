package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.H264

/** Randomized model check of the 64-bit-cached [[H264.BitReader]] against
  * a naive bit-at-a-time reference: identical values for every mixed
  * sequence of u1/u(n)/ue/se/peek/skip/align, identical past-end failure,
  * and peek's zero-padding beyond the buffer.
  */
class BitReaderSpec extends AnyFunSuite {

  /** the obviously-correct model: one bit per read, no cache */
  private final class NaiveReader(buf: Array[Byte]) {
    var pos = 0
    def u1: Int = {
      require(pos < buf.length * 8, "past end")
      val v = (buf(pos >> 3) >> (7 - (pos & 7))) & 1
      pos += 1
      v
    }
    def u(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | u1; i += 1 }; v }
    def ue: Int = {
      var z = 0
      while (u1 == 0) { z += 1; require(z <= 31, "overrun") }
      (1 << z) - 1 + u(z)
    }
    def se: Int = { val k = ue; if ((k & 1) == 1) (k + 1) / 2 else -(k / 2) }
    def peek(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val p = pos + i
        v = (v << 1) | (if (p < buf.length * 8) (buf(p >> 3) >> (7 - (p & 7))) & 1 else 0)
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = { pos += n; require(pos <= buf.length * 8, "past end") }
    def align(): Unit = pos = (pos + 7) & ~7
  }

  test("random op streams: values and positions match the naive model exactly") {
    val rnd = new scala.util.Random(7L)
    for (round <- 0 until 500) {
      val buf = new Array[Byte](1 + rnd.nextInt(40))
      rnd.nextBytes(buf)
      if (round % 2 == 0) buf.indices.foreach(i => buf(i) = (buf(i) | 0x55).toByte)
      val fast = new H264.BitReader(buf)
      val naive = new NaiveReader(buf)
      var dead = false
      var steps = 0
      while (!dead && steps < 300) {
        val op = rnd.nextInt(7)
        val arg = op match {
          case 1 => 1 + rnd.nextInt(24)
          case 4 => 1 + rnd.nextInt(32)
          case 5 => rnd.nextInt(9)
          case _ => 0
        }
        def runFast(): Int = op match {
          case 0 => fast.u1
          case 1 => fast.u(arg)
          case 2 => fast.ue
          case 3 => fast.se
          case 4 => fast.peek(arg)
          case 5 => { fast.skip(arg); -1 }
          case 6 => { fast.align(); -1 }
        }
        def runNaive(): Int = op match {
          case 0 => naive.u1
          case 1 => naive.u(arg)
          case 2 => naive.ue
          case 3 => naive.se
          case 4 => naive.peek(arg)
          case 5 => { naive.skip(arg); -1 }
          case 6 => { naive.align(); -1 }
        }
        val fr = scala.util.Try(runFast())
        val nr = scala.util.Try(runNaive())
        assert(fr.isSuccess === nr.isSuccess,
          s"success mismatch at step $steps op $op arg $arg (round $round): fast=$fr naive=$nr")
        if (fr.isSuccess) {
          assert(fr.get === nr.get,
            s"value mismatch at step $steps op $op arg $arg (round $round)")
          assert(fast.bitsLeft === buf.length * 8 - naive.pos,
            s"position mismatch at step $steps op $op arg $arg (round $round)")
        } else dead = true
        steps += 1
      }
    }
  }

  test("peek zero-pads past the buffer end without advancing") {
    val r = new H264.BitReader(Array(0xff.toByte))
    assert(r.peek(32) === 0xff000000)
    assert(r.u(8) === 0xff)
    assert(r.peek(16) === 0) // nothing left: all padding
    assert(r.bitsLeft === 0)
    intercept[IllegalArgumentException](r.u1)
  }
}
