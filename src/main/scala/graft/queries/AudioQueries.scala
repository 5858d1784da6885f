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
    // emitted as PER-SAMPLE rows (not a pcm digest): the DuckDB oracle
    // INDEPENDENTLY recomputes every resampled sample from the synthetic
    // chunk definition (triangle wave) + the exact-integer interp formula
    // — a real recomputation gate, not a frozen pin
    "audio_resample" -> ((s, _) => {
      import s.implicits._
      val ranged = SequenceOps.range(chunks(s).toDF(), 0L, 20L).as[AudioChunk](chunkEnc)
      ranged.flatMap { c =>
        Seq(22050, 8000).flatMap { rate =>
          val r = AudioKernels.resample(c, rate)
          val bb = java.nio.ByteBuffer.wrap(r.pcm)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          (0 until r.pcm.length / 2).map(pos =>
            (c.streamId, c.index, rate, pos.toLong, bb.getShort(pos * 2).toInt))
        }
      }.toDF("streamId", "index", "rate", "pos", "sample")
        .orderBy("streamId", "index", "rate", "pos")
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

  /** REAL DuckDB recomputation oracles: the synthetic chunk is closed-form
    * (triangle wave from (streamId, index, position) — [[AudioKernels
    * .syntheticChunk]]), so the oracle REGENERATES the PCM with
    * generate_series and replays the kernel arithmetic in SQL — fully
    * independent recomputation, no frozen pins. DuckDB's `//` truncates
    * toward zero like JVM long division, which every formula below leans
    * on. The remaining audio queries (mfcc/spectral: double FFT;
    * dup_pairs: gain clamping) stay pinned — their FP accumulation order
    * isn't replayable in SQL.
    */
  private val sampCte =
    """  samp AS (
      |    SELECT sid, idx, i,
      |      (ABS(((i + idx*7) % per) * 2 - per) - per // 2) * 300 AS s
      |    FROM (
      |      SELECT a.range AS sid, b.range AS idx, c.range AS i,
      |             50 + ((a.range*17 + b.range*5) % 50) AS per
      |      FROM range(0,2) a, range(0,{N}) b, range(0,1600) c))
      |""".stripMargin

  val oracles: Map[String, String] = Map(
    "audio_stats" -> ("WITH" + sampCte.replace("{N}", "40") + """
SELECT sid AS "streamId", idx AS "index",
  CAST(MAX(ABS(s)) AS INT) AS peak,
  CAST(SUM(s*s) AS BIGINT) AS sum_sq,
  CAST(SUM(CASE WHEN prev IS NOT NULL AND ((prev < 0) != (s < 0)) THEN 1 ELSE 0 END) AS INT) AS zero_crossings
FROM (SELECT *, lag(s) OVER (PARTITION BY sid, idx ORDER BY i) AS prev FROM samp)
GROUP BY sid, idx ORDER BY 1, 2"""),

    // linear-interp resample replay: i0 = (j*16000) // rate, frac = mod;
    // the CASE emulates JVM truncating division for negative numerators
    "audio_resample" -> ("WITH" + sampCte.replace("{N}", "20") + """,
res AS (
  SELECT sid, idx, r.rate, j.range AS pos,
    (j.range * 16000) // r.rate AS i0, (j.range * 16000) % r.rate AS frac
  FROM (SELECT DISTINCT sid, idx FROM samp) k,
       (SELECT UNNEST([22050, 8000]) AS rate) r,
       range(0, 2206) j
  WHERE j.range < ((1600-1) * r.rate) // 16000 + 1)
SELECT res.sid AS "streamId", res.idx AS "index", res.rate AS rate, res.pos AS pos,
  CAST(sa.s + CASE WHEN (sb.s - sa.s) * res.frac >= 0
       THEN ((sb.s - sa.s) * res.frac) // res.rate
       ELSE -((-(sb.s - sa.s) * res.frac) // res.rate) END AS INT) AS sample
FROM res
JOIN samp sa ON sa.sid = res.sid AND sa.idx = res.idx AND sa.i = LEAST(res.i0, 1599)
JOIN samp sb ON sb.sid = res.sid AND sb.idx = res.idx AND sb.i = LEAST(res.i0 + 1, 1599)
ORDER BY 1, 2, 3, 4"""),

    // stride(3) reindexes idx -> idx/3; downsample(4) keeps every 4th
    // sample; 8 abs-energy bands of 50 kept samples; bit b set iff
    // band energy > integer mean
    "audio_fingerprint" -> ("WITH" + sampCte.replace("{N}", "60") + """,
ds AS (SELECT sid, idx, i // 4 AS di, s FROM samp WHERE idx % 3 = 0 AND i % 4 = 0),
en AS (
  SELECT sid, idx, di // 50 AS band, SUM(ABS(s)) AS e
  FROM ds GROUP BY sid, idx, di // 50),
fp AS (
  SELECT sid, idx,
    SUM(CASE WHEN e > (SELECT SUM(e2.e) // 8 FROM en e2 WHERE e2.sid = en.sid AND e2.idx = en.idx)
        THEN (1::BIGINT << band) ELSE 0 END) AS f
  FROM en GROUP BY sid, idx)
SELECT sid AS "streamId", idx // 3 AS "index", CAST(f AS BIGINT) AS fp
FROM fp ORDER BY 1, 2"""),

    // energy = sum of squares, per-stream interpolated median threshold,
    // strictly-above chunks collapse to maximal runs (gaps-and-islands)
    "audio_vad_segments" -> ("WITH" + sampCte.replace("{N}", "60") + """,
st AS (SELECT sid, idx, SUM(s*s) AS sum_sq FROM samp GROUP BY sid, idx),
med AS (SELECT sid, median(sum_sq) AS m FROM st GROUP BY sid),
act AS (
  SELECT st.sid, st.idx,
    st.idx - row_number() OVER (PARTITION BY st.sid ORDER BY st.idx) AS grp
  FROM st JOIN med ON med.sid = st.sid WHERE st.sum_sq > med.m)
SELECT sid AS "streamId", MIN(idx) AS seg_start, MAX(idx) AS seg_end,
  COUNT(*) AS n_chunks
FROM act GROUP BY sid, grp ORDER BY 1, 2"""))
}
