package graft.sources

/** CABAC entropy layer (ITU-T H.264 §9.3) for the pure-JVM codec: the
  * binary arithmetic coding ENGINE (M-coder) with the spec's probability
  * state machine, plus the binarization helpers the slice coders in
  * [[H264Codec]] build on (truncated unary, UEGk, terminate).
  *
  * What is spec-true here: the arithmetic coder itself — 9-bit
  * range/10-bit low, the 64-state LPS probability table
  * (`rangeTabLPS`, Table 9-44), the state transitions
  * (`transIdxLPS`/MPS, Table 9-45), bypass and terminate coding, the
  * encoder flush (§9.3.4.6), and the §9.3.2 binarizations. The engine
  * tables were transcribed from the published ITU-T H.264 spec; this
  * container is offline, so the transcription could not be re-checked
  * against a reference decoder — any slip there keeps every
  * encode/decode ROUNDTRIP in this repo bit-exact (both sides share the
  * table) but would break interop with external decoders at exactly the
  * slipped state.
  *
  * CONTEXT INITIALIZATION (round 12): the §9.3.1.1 derivation —
  * (m, n, QP) -> (pStateIdx, valMPS) via [[initState]] — is implemented,
  * spec-pinned (H264CabacInitSpec), and wired through the encoder and
  * decoder including `cabac_init_idc` selection for P slices. What
  * remains missing is the spec's (m, n) DATA: Tables 9-12..9-33 are
  * several hundred published constants this offline container has no
  * copy of, and transcribing them from memory would be indistinguishable
  * from correct in self-decode while silently claiming interop — worse
  * than the honest default. [[InitTables]] / `/graft/h264/cabac-init.tsv`
  * is the documented seam the real constants plug into. ABSENT that
  * resource, all contexts initialize to (pStateIdx = 0, valMPS = 0) —
  * the maximum-entropy state the adaptive engine converges away from
  * within a few bins. Cost: a few bits per context of adaptation
  * overhead; effect on correctness: none for self-decode, fatal for
  * external decoders (which start from the spec's states) — hence the
  * loud in-stream SEI marker (see [[H264Codec]]) and the README note.
  *
  * Reference context: scanner decodes CABAC via FFmpeg/NVDEC behind
  * `scanner/video/decoder_automata.h:28-51`; this layer is the pure-JVM
  * equivalent surface for the repo's own streams.
  */
object H264Cabac {

  /** Table 9-44: rangeTabLPS[pStateIdx][qCodIRangeIdx] */
  private[graft] val rangeTabLPS: Array[Array[Int]] = Array(
    Array(128, 176, 208, 240), Array(128, 167, 197, 227),
    Array(128, 158, 187, 216), Array(123, 150, 178, 205),
    Array(116, 142, 169, 195), Array(111, 135, 160, 185),
    Array(105, 128, 152, 175), Array(100, 122, 144, 166),
    Array(95, 116, 137, 158), Array(90, 110, 130, 150),
    Array(85, 104, 123, 142), Array(81, 99, 117, 135),
    Array(77, 94, 111, 128), Array(73, 89, 105, 122),
    Array(69, 85, 100, 116), Array(66, 80, 95, 110),
    Array(62, 76, 90, 104), Array(59, 72, 86, 99),
    Array(56, 69, 81, 94), Array(53, 65, 77, 89),
    Array(51, 62, 73, 85), Array(48, 59, 69, 80),
    Array(46, 56, 66, 76), Array(43, 53, 63, 72),
    Array(41, 50, 59, 69), Array(39, 48, 56, 65),
    Array(37, 45, 54, 62), Array(35, 43, 51, 59),
    Array(33, 41, 48, 56), Array(32, 39, 46, 53),
    Array(30, 37, 43, 50), Array(29, 35, 41, 48),
    Array(27, 33, 39, 45), Array(26, 31, 37, 43),
    Array(24, 30, 35, 41), Array(23, 28, 33, 39),
    Array(22, 27, 32, 37), Array(21, 26, 30, 35),
    Array(20, 24, 29, 33), Array(19, 23, 27, 31),
    Array(18, 22, 26, 30), Array(17, 21, 25, 28),
    Array(16, 20, 23, 27), Array(15, 19, 22, 25),
    Array(14, 18, 21, 24), Array(14, 17, 20, 23),
    Array(13, 16, 19, 22), Array(12, 15, 18, 21),
    Array(12, 14, 17, 20), Array(11, 14, 16, 19),
    Array(11, 13, 15, 18), Array(10, 12, 15, 17),
    Array(10, 12, 14, 16), Array(9, 11, 13, 15),
    Array(9, 11, 12, 14), Array(8, 10, 12, 14),
    Array(8, 9, 11, 13), Array(7, 9, 11, 12),
    Array(7, 9, 10, 12), Array(7, 8, 10, 11),
    Array(6, 8, 9, 11), Array(6, 7, 9, 10),
    Array(6, 7, 8, 9), Array(2, 2, 2, 2))

  /** Table 9-45: transIdxLPS[pStateIdx] (MPS transition is min(s+1, 62)) */
  private[graft] val transIdxLPS: Array[Int] = Array(
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 23, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63)

  @inline private def transIdxMPS(s: Int): Int = if (s < 62) s + 1 else s

  /** §9.3.1.1 context-variable initialization from one (m, n) pair at
    * slice QP: preCtxState = Clip3(1, 126, ((m * Clip3(0, 51, qp)) >> 4)
    * + n); preCtxState <= 63 -> (pStateIdx = 63 - preCtxState, valMPS =
    * 0), else (pStateIdx = preCtxState - 64, valMPS = 1). Returns the
    * packed (pStateIdx << 1) | valMPS the engine uses. The DERIVATION is
    * spec-exact and spec-pinned (H264CabacInitSpec); what this repo
    * cannot supply offline is the spec's (m, n) DATA — see [[InitTables]].
    */
  def initState(m: Int, n: Int, qp: Int): Int = {
    val q   = math.max(0, math.min(51, qp))
    val pre = math.max(1, math.min(126, ((m * q) >> 4) + n))
    if (pre <= 63) (63 - pre) << 1 else ((pre - 64) << 1) | 1
  }

  /** (m, n) rows for every slot of [[graft.sources.H264Codec]]'s context
    * bank: one set for I slices, three (cabac_init_idc 0..2) for P.
    * Loaded from the optional classpath resource
    * `/graft/h264/cabac-init.tsv` (one line per slot:
    * `slot mI nI mP0 nP0 mP1 nP1 mP2 nP2`, '#' comments) — the seam
    * where the spec's Tables 9-12..9-33 constants plug in once
    * transcribed from the published standard (they are pure data; this
    * offline container has no copy, and guessing them would be
    * indistinguishable from correct in self-decode while silently
    * claiming interop). Absent the resource, contexts stay uniform
    * (pStateIdx 0, valMPS 0) and the stream carries the SEI marker.
    */
  final case class InitTables(i: Array[Array[Int]], p: Array[Array[Array[Int]]]) {
    require(p.length == 3, "three P-slice init sets (cabac_init_idc 0..2)")
  }

  /** test hook: lets a spec inject synthetic tables without a resource */
  @volatile private[graft] var tablesForTest: Option[InitTables] = None

  private lazy val resourceTables: Option[InitTables] =
    Option(getClass.getResourceAsStream("/graft/h264/cabac-init.tsv")).map { in =>
      val lines =
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toVector
        finally in.close()
      val rows = lines.map(_.split("\\s+").map(_.toInt))
      val n = rows.map(_.head).max + 1
      val i = Array.fill(n)(Array(0, 0))
      val p = Array.fill(3, n)(Array(0, 0))
      rows.foreach { r =>
        require(r.length == 9, s"cabac-init.tsv row needs 9 ints, got ${r.length}")
        i(r(0)) = Array(r(1), r(2))
        var k = 0
        while (k < 3) { p(k)(r(0)) = Array(r(3 + 2 * k), r(4 + 2 * k)); k += 1 }
      }
      InitTables(i, p)
    }

  def initTables: Option[InitTables] = tablesForTest.orElse(resourceTables)

  /** FNV-1a fingerprint of an init-table set; 0L = uniform init (tables
    * absent). Embedded in the stream SEI at encode and REQUIRED to match
    * at decode: decodability of persisted CABAC segments depends on the
    * ambient init tables, and without this check a table/JVM mismatch
    * surfaced as garbage pixels or an opaque require instead of a
    * diagnosable version error (ADVICE r12).
    */
  def initFingerprintOf(t: Option[InitTables]): Long = t match {
    case None => 0L
    case Some(tab) =>
      var h = 0xcbf29ce484222325L
      def mix(v: Int): Unit = { h ^= (v & 0xffffffffL); h *= 0x100000001b3L }
      tab.i.foreach { r => mix(r(0)); mix(r(1)) }
      tab.p.foreach(_.foreach { r => mix(r(0)); mix(r(1)) })
      // 0 is reserved for "uniform": a (vanishingly unlikely) real hash
      // of 0 must not masquerade as it
      if (h == 0L) 1L else h
  }

  /** fingerprint of the ACTIVE tables (what encode embeds / decode has) */
  def initFingerprint: Long = initFingerprintOf(initTables)

  /** context bank: packed (pStateIdx << 1) | valMPS. Default state is the
    * repo-local uniform init (see the object scaladoc); [[init]] applies
    * a §9.3.1.1 table when one is available.
    */
  final class Contexts(n: Int) {
    val s = new Array[Int](n)
    /** §9.3.1.1 init of every slot from (m, n) rows at slice QP. A table
      * covering FEWER slots than the bank is a loud error (ADVICE r12: a
      * truncated cabac-init.tsv used to yield a silent mixed init that
      * only round-tripped against the exact same partial file). */
    def init(mn: Array[Array[Int]], qp: Int): Unit = {
      require(mn.length >= s.length,
        s"CABAC init table covers ${mn.length} slots but the context bank " +
          s"has ${s.length} — truncated/partial cabac-init.tsv?")
      var i = 0
      while (i < s.length) {
        s(i) = initState(mn(i)(0), mn(i)(1), qp)
        i += 1
      }
    }
  }

  /** §9.3.4 arithmetic ENCODER over the shared MSB-first BitWriter.
    * Call pattern: bins via encodeBin/Bypass/Terminate; after the final
    * terminate(1) (end_of_slice), `flush()` emits the tail INCLUDING the
    * rbsp_stop_one_bit, then the caller byte-aligns with zeros.
    */
  final class Encoder(bw: H264Writer.BitWriter) {
    private var low = 0L
    private var range = 510
    private var outstanding = 0
    private var first = true

    private def putBit(b: Int): Unit = {
      if (first) first = false else bw.u1(b)
      while (outstanding > 0) { bw.u1(1 - b); outstanding -= 1 }
    }

    private def renorm(): Unit = {
      while (range < 256) {
        if (low >= 512) { putBit(1); low -= 512 }
        else if (low < 256) putBit(0)
        else { outstanding += 1; low -= 256 }
        range <<= 1
        low <<= 1
      }
    }

    def encodeBin(cx: Contexts, idx: Int, bin: Int): Unit = {
      val packed = cx.s(idx)
      val pState = packed >> 1
      val valMps = packed & 1
      val rLps = rangeTabLPS(pState)((range >> 6) & 3)
      range -= rLps
      if (bin != valMps) {
        low += range
        range = rLps
        val nextMps = if (pState == 0) 1 - valMps else valMps
        cx.s(idx) = (transIdxLPS(pState) << 1) | nextMps
      } else
        cx.s(idx) = (transIdxMPS(pState) << 1) | valMps
      renorm()
    }

    def encodeBypass(bin: Int): Unit = {
      low <<= 1
      if (bin != 0) low += range
      if (low >= 1024) { putBit(1); low -= 1024 }
      else if (low < 512) putBit(0)
      else { outstanding += 1; low -= 512 }
    }

    def encodeTerminate(bin: Int): Unit = {
      range -= 2
      if (bin != 0) {
        low += range
        range = 2
      }
      renorm()
    }

    /** §9.3.4.6 EncodeFlush — run AFTER encodeTerminate(1); the final
      * written bits carry the rbsp stop bit
      */
    def flush(): Unit = {
      // terminate(1) already set range = 2 and renormalized
      putBit(((low >> 9) & 1).toInt)
      bw.u(2, (((low >> 7) & 3) | 1).toInt)
    }
  }

  /** §9.3.3.2 arithmetic DECODER over the shared BitReader (the reader
    * must be byte-aligned by the caller — cabac_alignment_one_bit —
    * before construction)
    */
  final class Decoder(r: H264.BitReader) {
    // reads past the RBSP end resolve to 0 — the spec's decoder never
    // needs bits beyond the flush, but renormalization may LOOK ahead a
    // few bits past the aligned tail of a tiny slice
    @inline private def bit(): Int = if (r.bitsLeft > 0) r.u1 else 0
    /** n zero-padded bits past the flush (renormalization look-ahead) */
    private def bits(n: Int): Int = {
      val avail = r.bitsLeft
      if (avail >= n) r.u(n)
      else if (avail <= 0) 0
      else r.u(avail) << (n - avail)
    }
    private var range = 510
    private var offset = bits(9)

    def decodeBin(cx: Contexts, idx: Int): Int = {
      val packed = cx.s(idx)
      val pState = packed >> 1
      val valMps = packed & 1
      val rLps = lpsFlat((pState << 2) | ((range >> 6) & 3))
      range -= rLps
      val bin =
        if (offset >= range) {
          offset -= range
          range = rLps
          val nextMps = if (pState == 0) 1 - valMps else valMps
          cx.s(idx) = (transIdxLPS(pState) << 1) | nextMps
          1 - valMps
        } else {
          cx.s(idx) = (transIdxMPS(pState) << 1) | valMps
          valMps
        }
      if (range < 256) { // batched renorm: one shift + one multi-bit read
        val sh = Integer.numberOfLeadingZeros(range) - 23
        range <<= sh
        offset = (offset << sh) | bits(sh)
      }
      bin
    }

    def decodeBypass(): Int = {
      offset = (offset << 1) | bit()
      if (offset >= range) { offset -= range; 1 } else 0
    }

    /** `n` bypass bins in one reader access (MSB first — equivalent to
      * n chained [[decodeBypass]] calls): absorb the bits into `offset`
      * and run the per-bin compare against shifted `range`. `offset`
      * stays < range << n <= 2^9 << 20, so chunks of 20 fit an Int.
      */
    def decodeBypassN(n: Int): Int = {
      var v = 0
      var left = n
      while (left > 0) {
        val take = if (left > 20) 20 else left
        offset = (offset << take) | bits(take)
        var t = take - 1
        var acc = 0
        while (t >= 0) {
          val th = range << t
          if (offset >= th) { offset -= th; acc |= 1 << t }
          t -= 1
        }
        v = (v << take) | acc
        left -= take
      }
      v
    }

    /** returns 1 at slice end (no renorm — decoding stops) */
    def decodeTerminate(): Int = {
      range -= 2
      if (offset >= range) 1
      else {
        if (range < 256) {
          val sh = Integer.numberOfLeadingZeros(range) - 23
          range <<= sh
          offset = (offset << sh) | bits(sh)
        }
        0
      }
    }
  }

  /** Table 9-44 flattened to (pState << 2) | qCodIRangeIdx for the bin
    * decode hot path (one load instead of two dependent ones)
    */
  private val lpsFlat: Array[Int] = {
    val f = new Array[Int](64 * 4)
    var s = 0
    while (s < 64) {
      var q = 0
      while (q < 4) { f((s << 2) | q) = rangeTabLPS(s)(q); q += 1 }
      s += 1
    }
    f
  }

  // ------------------------------------------------- binarization helpers

  /** truncated unary: for v < cMax emit v ones + a zero; v == cMax emits
    * cMax ones. `ctxOf(binIdx)` maps each bin to its context slot.
    */
  def encodeTU(e: Encoder, cx: Contexts, v: Int, cMax: Int, ctxOf: Int => Int): Unit = {
    var i = 0
    while (i < v) { e.encodeBin(cx, ctxOf(i), 1); i += 1 }
    if (v < cMax) e.encodeBin(cx, ctxOf(v), 0)
  }

  def decodeTU(d: Decoder, cx: Contexts, cMax: Int, ctxOf: Int => Int): Int = {
    var v = 0
    while (v < cMax && d.decodeBin(cx, ctxOf(v)) == 1) v += 1
    v
  }

  /** UEGk suffix (§9.3.2.3), bypass-coded; call when the TU prefix hit
    * cMax. Encodes `sufS = v - cMax`.
    */
  def encodeEGkSuffix(e: Encoder, sufS0: Int, k0: Int): Unit = {
    var sufS = sufS0
    var k = k0
    var stop = false
    while (!stop) {
      if (sufS >= (1 << k)) {
        e.encodeBypass(1)
        sufS -= 1 << k
        k += 1
      } else {
        e.encodeBypass(0)
        var i = k - 1
        while (i >= 0) { e.encodeBypass((sufS >> i) & 1); i -= 1 }
        stop = true
      }
    }
  }

  def decodeEGkSuffix(d: Decoder, k0: Int): Int = {
    var v = 0
    var k = k0
    while (d.decodeBypass() == 1) { v += 1 << k; k += 1 }
    if (k > 0) v += d.decodeBypassN(k)
    v
  }
}
