package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{H264Cabac, H264Codec}
import graft.sources.H264Codec.Yuv

/** Pins the §9.3.1.1 CABAC context-initialization machinery: the
  * (m, n, QP) -> (pStateIdx, valMPS) derivation against hand-computed
  * spec arithmetic, and that TABLE-DRIVEN init is live end-to-end —
  * it changes the emitted bits (contexts really start from the derived
  * states) while decoded pixels stay identical to the uniform-init
  * stream (the entropy layer is probability-only; pixels must never
  * depend on it). The spec's actual Tables 9-12..9-33 DATA is not
  * available in this offline container — [[H264Cabac.InitTables]] is
  * the documented seam it plugs into (resource
  * `/graft/h264/cabac-init.tsv`).
  */
class H264CabacInitSpec extends AnyFunSuite {

  test("9.3.1.1 derivation: hand-computed (m, n, qp) -> packed state") {
    // preCtxState = Clip3(1, 126, ((m * Clip3(0,51,qp)) >> 4) + n)
    // pre <= 63 -> (63 - pre, mps 0); else (pre - 64, mps 1)
    assert(H264Cabac.initState(20, -15, 26) == ((63 - 17) << 1)) // 520>>4=32; 32-15=17
    assert(H264Cabac.initState(2, 54, 30) == ((63 - 57) << 1))   // 60>>4=3; 3+54=57
    assert(H264Cabac.initState(0, 100, 40) == (((100 - 64) << 1) | 1))
    // arithmetic (floor) shift on a negative product, then low clip to 1
    assert(H264Cabac.initState(-30, 0, 51) == ((63 - 1) << 1))   // -1530>>4=-96 -> clip 1
    // high clip to 126
    assert(H264Cabac.initState(50, 60, 51) == (((126 - 64) << 1) | 1))
    // qp clipped into [0, 51] before the product
    assert(H264Cabac.initState(20, 30, 99) == H264Cabac.initState(20, 30, 51))
    // boundary between the two MPS branches: pre 63 vs 64
    assert(H264Cabac.initState(0, 63, 26) == 0)            // pState 0, mps 0
    assert(H264Cabac.initState(0, 64, 26) == 1)            // pState 0, mps 1
  }

  test("Contexts.init applies the derivation to every slot") {
    val mn = Array.tabulate(8)(i => Array(i * 3 - 10, 40 + i))
    val cx = new H264Cabac.Contexts(8)
    cx.init(mn, qp = 28)
    (0 until 8).foreach { i =>
      assert(cx.s(i) == H264Cabac.initState(mn(i)(0), mn(i)(1), 28))
    }
  }

  private def frames(n: Int): Seq[Yuv] = (0 until n).map { t =>
    Yuv(48, 32,
      Array.tabulate(48 * 32) { i =>
        val x = i % 48; val y = i / 48
        ((x * 3 + y * 2 + t * 7 + (if ((x / 4 + y / 4) % 2 == 0) 40 else 0)) % 256).toByte
      },
      Array.fill(24 * 16)(110.toByte), Array.fill(24 * 16)(140.toByte))
  }

  test("table-driven init is LIVE: bits change, pixels do not (I + P slices)") {
    val fs = frames(4) // IDR + 3 P
    val uniform = H264Codec.encode(fs, qp = 16, cabac = true)
    val uniformPx = H264Codec.decode(uniform).map(_.y.toSeq)
    // synthetic but non-trivial (m, n) rows — every slot starts somewhere
    // off the uniform state for at least one of the I/P sets
    val slots = H264Codec.cabacContextSlots
    val tables = H264Cabac.InitTables(
      i = Array.tabulate(slots)(k => Array((k * 7) % 61 - 30, 20 + (k * 13) % 80)),
      p = Array.tabulate(3, slots)((idc, k) =>
        Array((k * 5 + idc * 11) % 51 - 25, 35 + (k * 3 + idc) % 60)))
    H264Cabac.tablesForTest = Some(tables)
    try {
      val seeded   = H264Codec.encode(fs, qp = 16, cabac = true)
      val seededPx = H264Codec.decode(seeded).map(_.y.toSeq)
      assert(seededPx == uniformPx,
        "decoded pixels must be independent of context initialization")
      assert(!java.util.Arrays.equals(seeded, uniform),
        "table init must actually change the arithmetic-coded bits")
      // cross-wiring guard: a stream coded with table init must NOT
      // decode under uniform init (contexts desync immediately) — this
      // is exactly the failure mode external CABAC streams hit against
      // the uniform default, reproduced in-repo
      H264Cabac.tablesForTest = None
      val crossed =
        try Some(H264Codec.decode(seeded).map(_.y.toSeq))
        catch { case _: Throwable => None }
      assert(crossed != Some(uniformPx),
        "cross-init decode must not silently reproduce the true pixels")
    } finally H264Cabac.tablesForTest = None
  }

  test("SEI marker reflects init mode") {
    def seiText(stream: Array[Byte]): String =
      new String(stream, java.nio.charset.StandardCharsets.ISO_8859_1)
    val fs = frames(2)
    val uniform = H264Codec.encode(fs, qp = 16, cabac = true)
    assert(seiText(uniform).contains("NONCONFORMANT: CABAC context init is repo-local uniform"))
    H264Cabac.tablesForTest = Some(H264Cabac.InitTables(
      i = Array.fill(H264Codec.cabacContextSlots)(Array(0, 64)),
      p = Array.fill(3, H264Codec.cabacContextSlots)(Array(0, 64))))
    try {
      val seeded = H264Codec.encode(fs, qp = 16, cabac = true)
      assert(seiText(seeded).contains("CABAC ctx init from provided 9.3.1.1 tables"))
      assert(!seiText(seeded).contains("NONCONFORMANT: CABAC context init"))
    } finally H264Cabac.tablesForTest = None
  }
}
