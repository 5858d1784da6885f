package graft.queries

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{AudioKernels, SequenceOps}
import graft.operators.AudioKernels.AudioChunk

/** Audio-modality queries: PCM chunk streams through the shared sequence
  * operators and waveform kernels. Inputs are deterministic synthetic
  * chunks (no audio corpus in the shared parquet, same as video), but the
  * chunk definition is closed-form, so EVERY query here carries a real
  * DuckDB recomputation oracle ([[oracles]]) — the gate regenerates the
  * PCM independently and replays the kernel arithmetic in SQL.
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
    * on.
    *
    * Since round 13 this covers the WHOLE audio family, including the
    * FP-heavy spectral chain: the kernel's radix-2 FFT is replayed as a
    * direct DFT (O(n²) cos/sin sums over the 512-sample Hamming frames).
    * The two summation orders differ only at ~1e-12 absolute, while the
    * decision points sit far wider: the closest any rounded-to-6dp value
    * lands to a .5e-6 rounding boundary is 2.9e-9 (mfcc) / 1.2e-8
    * (spectral) absolute, and the closest any rolloff prefix-sum gets to
    * the 0.85·total threshold is 5.7e-5 relative — 3-7 orders above the
    * replay noise, so the cross-engine comparison is robust. dup_pairs is
    * exact integer end-to-end (gain 5/4 never clamps at the triangle
    * amplitudes: max |s| = 14700 → 18375 < 32767).
    */
  /** Hamming-frame → direct-DFT power-spectrum CTE chain shared by the
    * mfcc and spectral replays: 7 frames of 512 per chunk (hop 256; the
    * zero-padded tail contributes nothing to the DFT sums, so only real
    * samples appear), one-sided bins k = 0..256.
    */
  private def dftCtes: String =
    """fr AS (
      |  SELECT samp.sid, samp.idx, f.range AS fi, samp.i - f.range*256 AS wi,
      |    (samp.s / 32768.0) * (0.54 - 0.46*cos(2*pi()*(samp.i - f.range*256)/511)) AS x
      |  FROM samp, range(0,7) f
      |  WHERE samp.i >= f.range*256 AND samp.i < f.range*256 + 512),
      |ps AS (
      |  SELECT sid, idx, fi, k.range AS k,
      |    POWER(SUM(x * cos(2*pi()*wi*k.range/512)), 2) +
      |    POWER(SUM(x * sin(2*pi()*wi*k.range/512)), 2) AS p
      |  FROM fr, range(0,257) k
      |  GROUP BY sid, idx, fi, k.range)""".stripMargin

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
FROM act GROUP BY sid, grp ORDER BY 1, 2"""),

    // near-dup replay, exact integer end-to-end: variant PCM = s*5//4
    // (trunc toward zero — DuckDB // matches JVM; int16 clamping never
    // fires at triangle amplitudes), 8 bands of 200 samples, bit b iff
    // band |s|-sum > integer mean, pairs on fp equality at offset 1000
    "audio_dup_pairs" -> ("WITH" + sampCte.replace("{N}", "60") + """,
allsamp AS (
  SELECT sid, idx, v.range AS var, i,
    CASE WHEN v.range = 0 THEN s ELSE (s*5) // 4 END AS s
  FROM samp, range(0,2) v),
en AS (
  SELECT sid, idx, var, i // 200 AS band, SUM(ABS(s)) AS e
  FROM allsamp GROUP BY 1, 2, 3, i // 200),
fp AS (
  SELECT sid, idx, var,
    SUM(CASE WHEN e > (SELECT SUM(e2.e) // 8 FROM en e2
          WHERE e2.sid = en.sid AND e2.idx = en.idx AND e2.var = en.var)
        THEN (1::BIGINT << band) ELSE 0 END) AS f
  FROM en GROUP BY sid, idx, var),
cid AS (
  SELECT sid*10000 + idx + CASE WHEN var = 1 THEN 1000 ELSE 0 END AS cid, f
  FROM fp)
SELECT x.cid AS "a", y.cid AS "b", CAST(x.f AS BIGINT) AS "fp"
FROM cid x JOIN cid y ON x.f = y.f AND x.cid < y.cid AND y.cid - x.cid = 1000
ORDER BY 1"""),

    // MFCC replay: direct DFT (dftCtes) -> 26-triangle HTK mel filterbank
    // (centers closed-form on the mel scale) -> ln -> DCT-II -> frame
    // mean, rounded to the kernel's 6 dp (min boundary margin 2.9e-9 vs
    // ~1e-12 FFT-vs-DFT noise — see the oracles scaladoc)
    "audio_mfcc" -> ("WITH" + sampCte.replace("{N}", "8") + "," + dftCtes + """,
ctr AS (
  SELECT m.range AS m,
    700.0*(POWER(10.0, (2595.0*log10(1.0 + 8000.0/700.0)) * m.range/27.0 / 2595.0) - 1.0) AS hz
  FROM range(0,28) m),
flt AS (
  SELECT m.m AS mel, k.range AS k,
    CASE WHEN k.range*31.25 > lo.hz AND k.range*31.25 < m.hz
           THEN (k.range*31.25 - lo.hz)/(m.hz - lo.hz)
         WHEN k.range*31.25 >= m.hz AND k.range*31.25 < hi.hz
           THEN (hi.hz - k.range*31.25)/(hi.hz - m.hz)
         ELSE 0.0 END AS w
  FROM ctr m JOIN ctr lo ON lo.m = m.m - 1 JOIN ctr hi ON hi.m = m.m + 1,
       range(0,257) k
  WHERE m.m BETWEEN 1 AND 26),
mel AS (
  SELECT ps.sid, ps.idx, ps.fi, flt.mel - 1 AS m,
    ln(GREATEST(SUM(ps.p * flt.w), 1e-10)) AS e
  FROM ps JOIN flt ON flt.k = ps.k AND flt.w > 0
  GROUP BY 1, 2, 3, 4),
dct AS (
  SELECT sid, idx, fi, k.range AS coef,
    SUM(e * cos(pi()*k.range*(m + 0.5)/26)) * sqrt(2.0/26)
      * CASE WHEN k.range = 0 THEN sqrt(0.5) ELSE 1.0 END AS c
  FROM mel, range(0,13) k
  GROUP BY sid, idx, fi, k.range)
SELECT CAST(sid AS BIGINT) AS "streamId", CAST(idx AS BIGINT) AS "index",
  CAST(coef AS INT) AS coef,
  ROUND(AVG(c), 6) AS mean_val
FROM dct GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),

    // spectral-shape replay over the same DFT: centroid / bandwidth /
    // 0.85-energy rolloff (prefix-sum threshold margin 5.7e-5 relative)
    // / flatness, frame means rounded to the kernel's 6 dp
    "audio_spectral" -> ("WITH" + sampCte.replace("{N}", "12") + "," + dftCtes + """,
pre AS (
  SELECT sid, idx, fi, k, p,
    SUM(p) OVER (PARTITION BY sid, idx, fi ORDER BY k) AS acc,
    SUM(p) OVER (PARTITION BY sid, idx, fi) AS tot
  FROM ps),
feat AS (
  SELECT sid, idx, fi,
    SUM(k*31.25*p)/ANY_VALUE(tot) AS centroid,
    ANY_VALUE(tot) AS tot,
    SUM(ln(p + 1e-12))/257 AS logmean,
    COALESCE(MIN(k) FILTER (WHERE acc >= 0.85*tot), 256) * 31.25 AS roll
  FROM pre GROUP BY sid, idx, fi),
feat2 AS (
  SELECT f.sid, f.idx, f.fi, f.centroid, f.roll,
    sqrt(SUM((pre.k*31.25 - f.centroid)*(pre.k*31.25 - f.centroid)*pre.p)/f.tot) AS bandwidth,
    exp(f.logmean) / (f.tot/257 + 1e-12) AS flat
  FROM feat f JOIN pre ON pre.sid = f.sid AND pre.idx = f.idx AND pre.fi = f.fi
  WHERE f.tot > 1e-12
  GROUP BY 1, 2, 3, 4, 5, f.tot, f.logmean)
SELECT CAST(sid AS BIGINT) AS "streamId", CAST(idx AS BIGINT) AS "index",
  ROUND(AVG(centroid), 6) AS centroid_hz,
  ROUND(AVG(bandwidth), 6) AS bandwidth_hz,
  ROUND(AVG(roll), 6) AS rolloff_hz,
  ROUND(AVG(flat), 6) AS flatness
FROM feat2 GROUP BY 1, 2 ORDER BY 1, 2"""))
}
