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

  // ---- Dataset-level ops (the Spark-side plumbing: schema + batch shape)

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
