package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Dataset, Encoder, Encoders}

/** Audio as a first-class modality over the same element model as video
  * (SURVEY.md §1.4): a stream is chunks of interleaved PCM16-LE samples,
  * `(streamId, index)`-keyed, so every sequence operator (stride, range,
  * gather, slice) and the NamedStorage commit protocol apply unchanged.
  *
  * No audio codec library exists in this container (same constraint as
  * video, see README) — the "decode" of a compressed format is therefore
  * out of scope; these kernels define the POST-decode surface: waveform
  * stats, downsampling (the frame-sample analog), and band-energy
  * fingerprinting, all in deterministic integer math so specs pin exact
  * values.
  */
object AudioKernels {

  /** one chunk of PCM16-LE audio — the audio analog of FrameElem */
  final case class AudioChunk(
      streamId: Long, index: Long, sampleRate: Int, channels: Int, pcm: Array[Byte])

  private val chunkEnc: Encoder[AudioChunk] = Encoders.product[AudioChunk]

  /** deterministic synthetic chunk: triangle-ish wave whose phase/amplitude
    * derive from (streamId, index, position) — the audio twin of
    * StdKernels.syntheticFrame
    */
  def syntheticChunk(streamId: Long, index: Long, sampleRate: Int = 16000,
      channels: Int = 1, samplesPerChunk: Int = 1600): AudioChunk = {
    val bb = ByteBuffer.allocate(samplesPerChunk * channels * 2)
      .order(ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < samplesPerChunk * channels) {
      val period = 50 + ((streamId * 17 + index * 5) % 50).toInt
      val phase  = (i + index.toInt * 7) % period
      val tri    = math.abs(phase * 2 - period) - period / 2
      bb.putShort((tri * 300).toShort)
      i += 1
    }
    AudioChunk(streamId, index, sampleRate, channels, bb.array())
  }

  private def samples(c: AudioChunk): Iterator[Int] = {
    val bb = ByteBuffer.wrap(c.pcm).order(ByteOrder.LITTLE_ENDIAN)
    Iterator.continually(bb).takeWhile(_.remaining() >= 2).map(_.getShort.toInt)
  }

  /** peak absolute amplitude */
  def peak(c: AudioChunk): Int =
    samples(c).foldLeft(0)((m, s) => math.max(m, math.abs(s)))

  /** sum of squared samples (exact integer) — RMS = sqrt(sse / n) */
  def sumSquares(c: AudioChunk): Long =
    samples(c).foldLeft(0L)((a, s) => a + s.toLong * s)

  /** zero-crossing count (sign changes between consecutive samples) */
  def zeroCrossings(c: AudioChunk): Int =
    samples(c).sliding(2).count(w => w.size == 2 && (w.head < 0) != (w.last < 0))

  /** keep every `factor`-th sample FRAME (one frame = `channels`
    * interleaved samples, so multi-channel audio keeps all channels of the
    * retained instants) — the audio frame-sample analog; sampleRate scales
    * down with the data
    */
  def downsample(c: AudioChunk, factor: Int): AudioChunk = {
    require(factor > 0)
    val kept = samples(c).grouped(c.channels).grouped(factor).map(_.head).flatten.toArray
    val bb   = ByteBuffer.allocate(kept.length * 2).order(ByteOrder.LITTLE_ENDIAN)
    kept.foreach(s => bb.putShort(s.toShort))
    c.copy(sampleRate = c.sampleRate / factor, pcm = bb.array())
  }

  /** Linear-interpolation resample to `toRate` Hz — the sample-rate
    * normalisation every audio training corpus needs (8k telephony /
    * 44.1k music sources onto one model rate), for ARBITRARY rate
    * ratios (vs [[downsample]]'s integer decimation). Exact integer
    * arithmetic (position numerators kept as longs, truncating interp),
    * so output is bit-deterministic and pinnable cross-engine. Output
    * frames = floor((n-1) * toRate / fromRate) + 1; multi-channel
    * interleaving preserved per frame.
    */
  def resample(c: AudioChunk, toRate: Int): AudioChunk = {
    require(toRate > 0, s"toRate $toRate")
    if (toRate == c.sampleRate) return c
    val frames = samples(c).grouped(c.channels).map(_.toArray).toArray
    val n = frames.length
    require(n > 0, "empty chunk")
    val outN = ((n - 1).toLong * toRate / c.sampleRate).toInt + 1
    val bb = ByteBuffer.allocate(outN * c.channels * 2).order(ByteOrder.LITTLE_ENDIAN)
    var j = 0
    while (j < outN) {
      val num = j.toLong * c.sampleRate // fractional source index = num / toRate
      val i0 = (num / toRate).toInt
      val frac = num % toRate
      var ch = 0
      while (ch < c.channels) {
        val a = frames(math.min(i0, n - 1))(ch)
        val b = frames(math.min(i0 + 1, n - 1))(ch)
        bb.putShort((a + ((b - a).toLong * frac) / toRate).toShort)
        ch += 1
      }
      j += 1
    }
    AudioChunk(c.streamId, c.index, toRate, c.channels, bb.array())
  }

  /** integer gain `num/den` on the PCM samples with int16 clamping — the
    * volume-change transform the energy fingerprint should shrug off
    */
  def gain(c: AudioChunk, num: Int, den: Int): AudioChunk = {
    // int16 PCM invariant — an odd trailing byte would otherwise silently
    // come back as 0 (the pair loop never consumes it), a shape-dependent
    // mutation instead of a loud error
    require(c.pcm.length % 2 == 0,
      s"gain expects int16 PCM (even byte length), got ${c.pcm.length}")
    val bb  = ByteBuffer.wrap(c.pcm).order(ByteOrder.LITTLE_ENDIAN)
    val out = ByteBuffer.allocate(c.pcm.length).order(ByteOrder.LITTLE_ENDIAN)
    while (bb.remaining() >= 2) {
      // long arithmetic: a full-scale sample times a large num overflows
      // Int and would clamp to the WRONG rail
      val v = bb.getShort.toLong * num / den
      out.putShort(v.max(Short.MinValue).min(Short.MaxValue).toShort)
    }
    c.copy(pcm = out.array())
  }

  /** 8-band energy fingerprint: split the chunk into 8 equal windows, sum
    * |sample| per window, quantize each to 8 bits by ranking against the
    * chunk mean — packed into one long. Deterministic, comparable via
    * xor/bit_count like SimHash.
    */
  def energyFingerprint(c: AudioChunk): Long = {
    val xs = samples(c).toArray
    if (xs.isEmpty) return 0L
    val win   = math.max(1, xs.length / 8)
    val energies = (0 until 8).map { b =>
      val from = b * win
      val to   = math.min(xs.length, from + win)
      if (from >= xs.length) 0L
      else (from until to).foldLeft(0L)((a, i) => a + math.abs(xs(i)))
    }
    val mean = energies.sum / 8
    energies.zipWithIndex.foldLeft(0L) { case (acc, (e, b)) =>
      acc | ((if (e > mean) 1L else 0L) << b)
    }
  }

  // ---- spectral analysis: FFT → mel filterbank → MFCC (pure JVM)

  /** in-place iterative radix-2 Cooley-Tukey FFT (decimation in time);
    * length must be a power of two. No dependency — ~30 lines of the
    * textbook algorithm, O(n log n), allocation-free per call.
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of two, got $n")
    require(im.length == n, "re/im length mismatch")
    // bit-reversal permutation
    var i = 1
    var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterflies
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = base + k
          val b = a + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr; im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Hamming-windowed frames of the chunk's (first-channel) samples,
    * normalized to [-1,1]; the last partial frame is zero-padded
    */
  def windowedFrames(c: AudioChunk, frameLen: Int, hop: Int): Iterator[Array[Double]] = {
    require(frameLen > 0 && (frameLen & (frameLen - 1)) == 0, "frameLen must be 2^k")
    require(hop > 0, "hop must be positive")
    val mono = samples(c).grouped(c.channels).map(_.head / 32768.0).toArray
    val window = Array.tabulate(frameLen)(i =>
      0.54 - 0.46 * math.cos(2.0 * math.Pi * i / (frameLen - 1)))
    // frames start every `hop` samples until the data is exhausted; the
    // tail zero-pads, so every sample lands in at least one frame
    val nFrames = if (mono.isEmpty) 0 else (mono.length + hop - 1) / hop
    (0 until nFrames).iterator.map { f =>
      val out = new Array[Double](frameLen)
      var i = 0
      while (i < frameLen) {
        val s = f * hop + i
        out(i) = if (s < mono.length) mono(s) * window(i) else 0.0
        i += 1
      }
      out
    }
  }

  /** one-sided power spectrum |X[k]|² for k = 0..n/2 */
  def powerSpectrum(frame: Array[Double]): Array[Double] = {
    val re = frame.clone()
    val im = new Array[Double](frame.length)
    fft(re, im)
    Array.tabulate(frame.length / 2 + 1)(k => re(k) * re(k) + im(k) * im(k))
  }

  private def hzToMel(f: Double): Double = 2595.0 * math.log10(1.0 + f / 700.0)
  private def melToHz(m: Double): Double = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)

  /** triangular mel filterbank over the one-sided spectrum: nMels rows of
    * (bin, weight); standard HTK-style center spacing on the mel scale
    */
  def melFilterbank(nMels: Int, nFft: Int, sampleRate: Int): Array[Array[(Int, Double)]] = {
    val maxMel = hzToMel(sampleRate / 2.0)
    val centers = Array.tabulate(nMels + 2)(i => melToHz(maxMel * i / (nMels + 1)))
    val binHz = sampleRate.toDouble / nFft
    Array.tabulate(nMels) { m =>
      val (lo, mid, hi) = (centers(m), centers(m + 1), centers(m + 2))
      (0 to nFft / 2).flatMap { k =>
        val f = k * binHz
        val w = if (f > lo && f < mid) (f - lo) / (mid - lo)
          else if (f >= mid && f < hi) (hi - f) / (hi - mid)
          else 0.0
        if (w > 0) Some((k, w)) else None
      }.toArray
    }
  }

  /** per-frame MFCCs: power spectrum → mel energies → log → DCT-II
    * (orthonormal), first `nCoef` coefficients — the standard speech/
    * audio-quality feature vector
    */
  def mfcc(c: AudioChunk, frameLen: Int = 512, hop: Int = 256,
      nMels: Int = 26, nCoef: Int = 13): Array[Array[Double]] = {
    val bank = melFilterbank(nMels, frameLen, c.sampleRate)
    windowedFrames(c, frameLen, hop).map { fr =>
      val ps = powerSpectrum(fr)
      val mel = bank.map(filt => {
        var s = 0.0
        var i = 0
        while (i < filt.length) { s += ps(filt(i)._1) * filt(i)._2; i += 1 }
        math.log(math.max(s, 1e-10))
      })
      Array.tabulate(nCoef) { k =>
        var s = 0.0
        var m = 0
        while (m < nMels) { s += mel(m) * math.cos(math.Pi * k * (m + 0.5) / nMels); m += 1 }
        s * math.sqrt(2.0 / nMels) * (if (k == 0) math.sqrt(0.5) else 1.0)
      }
    }.toArray
  }

  /** per-chunk spectral shape features averaged over frames:
    * centroid (Hz), bandwidth (Hz, spread around the centroid),
    * rolloff (Hz below which 85% of energy sits), flatness
    * (geometric/arithmetic mean of the spectrum, 1.0 = white noise) —
    * the audio-quality gates (hum/tone/noise detection) of a corpus
    * cleaning pipeline
    */
  def spectralFeatures(c: AudioChunk, frameLen: Int = 512, hop: Int = 256)
      : (Double, Double, Double, Double) = {
    val binHz = c.sampleRate.toDouble / frameLen
    var n = 0
    var sc = 0.0; var sb = 0.0; var sr = 0.0; var sfl = 0.0
    windowedFrames(c, frameLen, hop).foreach { fr =>
      val ps = powerSpectrum(fr)
      val total = ps.sum
      if (total > 1e-12) {
        var num = 0.0
        var k = 0
        while (k < ps.length) { num += k * binHz * ps(k); k += 1 }
        val centroid = num / total
        var vsum = 0.0
        k = 0
        while (k < ps.length) {
          val d = k * binHz - centroid
          vsum += d * d * ps(k); k += 1
        }
        val bandwidth = math.sqrt(vsum / total)
        var acc = 0.0
        var roll = (ps.length - 1) * binHz
        k = 0
        var found = false
        while (k < ps.length && !found) {
          acc += ps(k)
          if (acc >= 0.85 * total) { roll = k * binHz; found = true }
          k += 1
        }
        var logSum = 0.0
        k = 0
        while (k < ps.length) { logSum += math.log(ps(k) + 1e-12); k += 1 }
        val flat = math.exp(logSum / ps.length) / (total / ps.length + 1e-12)
        sc += centroid; sb += bandwidth; sr += roll; sfl += flat
        n += 1
      }
    }
    if (n == 0) (0.0, 0.0, 0.0, 0.0)
    else (sc / n, sb / n, sr / n, sfl / n)
  }

  // ---- Dataset-level ops (the Spark-side plumbing: schema + batch shape)

  /** per-(chunk, coefficient) mean MFCC over the chunk's frames, rounded
    * to 6 dp — a flat relation so the correctness pin needs no array
    * column support
    */
  def mfccOp(ds: Dataset[AudioChunk], nCoef: Int = 13)
      : Dataset[(Long, Long, Int, Double)] =
    ds.flatMap { c =>
      val fs = mfcc(c, nCoef = nCoef)
      (0 until nCoef).map { k =>
        val mean = if (fs.isEmpty) 0.0 else fs.map(_(k)).sum / fs.length
        (c.streamId, c.index, k, math.rint(mean * 1e6) / 1e6)
      }
    }(Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaInt, Encoders.scalaDouble))

  def spectralOp(ds: Dataset[AudioChunk])
      : Dataset[(Long, Long, Double, Double, Double, Double)] =
    ds.map { c =>
      val (ce, bw, ro, fl) = spectralFeatures(c)
      def r6(x: Double) = math.rint(x * 1e6) / 1e6
      (c.streamId, c.index, r6(ce), r6(bw), r6(ro), r6(fl))
    }(Encoders.product[(Long, Long, Double, Double, Double, Double)])


  def statsOp(ds: Dataset[AudioChunk]): Dataset[(Long, Long, Int, Long, Int)] =
    ds.map(c => (c.streamId, c.index, peak(c), sumSquares(c), zeroCrossings(c)))(
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaInt,
        Encoders.scalaLong, Encoders.scalaInt))

  def downsampleOp(ds: Dataset[AudioChunk], factor: Int): Dataset[AudioChunk] =
    ds.map(downsample(_, factor))(chunkEnc)

  def fingerprintOp(ds: Dataset[AudioChunk]): Dataset[(Long, Long, Long)] =
    ds.map(c => (c.streamId, c.index, energyFingerprint(c)))(
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong))

  /** VAD-style activity segmentation over any (streamId, index, energy)
    * relation: chunks STRICTLY above their stream's median energy are
    * "speech", maximal runs of consecutive active chunks collapse to
    * (streamId, seg_start, seg_end, n_chunks) via gaps-and-islands
    * (island key = index - row_number over the active chunks in index
    * order). The window is per-STREAM — partitions bounded by stream
    * length, the running-window shape; the adaptive median threshold is a
    * |streams|-row broadcast, no tuned constant.
    */
  def vadSegments(stats: org.apache.spark.sql.DataFrame,
      energyCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val med = stats.groupBy(col("streamId"))
      .agg(percentile(col(energyCol), lit(0.5)).as("__med"))
    val active = stats.join(broadcast(med), Seq("streamId"))
      .filter(col(energyCol) > col("__med"))
    val w = Window.partitionBy(col("streamId")).orderBy(col("index"))
    active
      .withColumn("__grp", col("index") - row_number().over(w))
      .groupBy(col("streamId"), col("__grp"))
      .agg(min(col("index")).as("seg_start"),
        max(col("index")).as("seg_end"),
        count(lit(1)).as("n_chunks"))
      .select(col("streamId"), col("seg_start"), col("seg_end"), col("n_chunks"))
  }
}
