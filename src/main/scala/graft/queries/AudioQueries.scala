package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AudioKernels, SequenceOps}
import graft.operators.AudioKernels.AudioChunk

/** Audio-modality queries: PCM chunk streams through the shared sequence
  * operators and waveform kernels. Inputs are deterministic synthetic
  * chunks (no audio corpus in the shared parquet, same as video), so these
  * are rows-only checks; exact kernel values are pinned by
  * AudioKernelsSpec.
  */
object AudioQueries {

  private val chunkEnc = Encoders.product[AudioChunk]

  /** 2 streams x 60 chunks of deterministic PCM */
  private def chunks(s: SparkSession) = {
    import s.implicits._
    (for (sid <- 0L until 2L; i <- 0 until 60)
      yield AudioKernels.syntheticChunk(sid, i.toLong)).toDS()
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // sample-rate normalisation (16 kHz sources onto 22.05 kHz AND 8 kHz
    // model rates in one pass): arbitrary-ratio linear-interp resampling
    // with exact integer arithmetic — per-chunk scan-local work, the
    // embarrassingly parallel shape of every per-element audio kernel
    "audio_resample" -> ((s, _) => {
      import s.implicits._
      val ranged = SequenceOps.range(chunks(s).toDF(), 0L, 20L).as[AudioChunk](chunkEnc)
      ranged.flatMap { c =>
        Seq(22050, 8000).map { rate =>
          val r = AudioKernels.resample(c, rate)
          val md5 = java.security.MessageDigest.getInstance("MD5").digest(r.pcm)
            .map(x => f"${x & 0xff}%02x").mkString
          (c.streamId, c.index, rate, r.pcm.length / 2, md5)
        }
      }.toDF("streamId", "index", "rate", "n_samples", "pcm_md5")
        .orderBy("streamId", "index", "rate")
    }),

    // waveform stats over a Range-sampled window of both streams
    "audio_stats" -> ((s, _) => {
      val ranged = SequenceOps.range(chunks(s).toDF(), 0L, 40L).as[AudioChunk](chunkEnc)
      AudioKernels.statsOp(ranged)
        .toDF("streamId", "index", "peak", "sum_sq", "zero_crossings")
        .orderBy("streamId", "index")
    }),

    // stride-sample chunks, downsample 4x in-chunk, fingerprint — the
    // audio twin of the video decode->resize->hash pipeline
    "audio_fingerprint" -> ((s, _) => {
      val strided = SequenceOps.stride(chunks(s).toDF(), 3L).as[AudioChunk](chunkEnc)
      val down    = AudioKernels.downsampleOp(strided, 4)
      AudioKernels.fingerprintOp(down)
        .toDF("streamId", "index", "fp")
        .orderBy("streamId", "index")
    }),

    // near-dup for AUDIO: gain-scaled copies (volume x5/4, clamped) share
    // the band-energy fingerprint because the bits rank band energies
    // against the chunk mean — pairs on fp equality across the combined
    // relation (original ids, variants offset +1000). One hash equi-join,
    // the same candidate shape as every other modality's dedup.
    "audio_dup_pairs" -> ((s, _) => {
      val base = chunks(s)
      val variants = base.map(c =>
        AudioKernels.gain(c, 5, 4).copy(index = c.index + 1000))(chunkEnc)
      val fps = graft.CacheScope.cache(AudioKernels.fingerprintOp(base.union(variants))
        .toDF("streamId", "index", "fp")
        .select((col("streamId") * 10000 + col("index")).as("cid"), col("fp"))
        ) // cached: both sides of the candidate join
      fps.select(col("fp"), col("cid").as("a"))
        .join(fps.select(col("fp"), col("cid").as("b")), Seq("fp"))
        .filter(col("a") < col("b"))
        // keep only original-vs-variant matches: same chunk family
        .filter(col("b") - col("a") === 1000)
        .select(col("a"), col("b"), col("fp"))
        .orderBy("a")
    }),

    // VAD-style activity segmentation: chunks above the per-stream median
    // energy are "speech", maximal runs of consecutive active chunks
    // become segments (classic gaps-and-islands: island key = index -
    // row_number over the active chunks in index order; the window is
    // per-STREAM — bounded partitions, the q_running_spend shape). The
    // adaptive median threshold makes activity value-diverse on the
    // synthetic PCM without a tuned constant.
    "audio_vad_segments" -> ((s, _) =>
      AudioKernels.vadSegments(
        AudioKernels.statsOp(chunks(s))
          .toDF("streamId", "index", "peak", "sum_sq", "zero_crossings"),
        "sum_sq")
        .orderBy("streamId", "seg_start")),

    // MFCC feature extraction (FFT -> mel filterbank -> log -> DCT-II):
    // the standard audio feature vector, flattened to one row per
    // (chunk, coefficient) with the per-chunk frame mean — per-element
    // scan work, embarrassingly parallel like every audio kernel
    "audio_mfcc" -> ((s, _) => {
      val ranged = SequenceOps.range(chunks(s).toDF(), 0L, 8L).as[AudioChunk](chunkEnc)
      AudioKernels.mfccOp(ranged)
        .toDF("streamId", "index", "coef", "mean_val")
        .orderBy("streamId", "index", "coef")
    }),

    // spectral-shape quality gates: centroid/bandwidth/rolloff/flatness
    // per chunk — the hum/tone/noise detectors of an audio corpus
    // cleaning pipeline
    "audio_spectral" -> ((s, _) => {
      val ranged = SequenceOps.range(chunks(s).toDF(), 0L, 12L).as[AudioChunk](chunkEnc)
      AudioKernels.spectralOp(ranged)
        .toDF("streamId", "index", "centroid_hz", "bandwidth_hz",
          "rolloff_hz", "flatness")
        .orderBy("streamId", "index")
    })
  )

  /** synthetic inputs, not shared parquet — rows-only checks */
  val oracles: Map[String, String] = Map.empty
}
