package graft.multimodal

import org.apache.spark.sql.Dataset
import Multimodal.MediaRow

/** Audio SPECTRAL feature extraction, pure JDK: an in-place radix-2
  * Cooley-Tukey FFT over Hann-windowed PCM frames → dominant frequency,
  * spectral centroid, 85% rolloff, and spectral flatness per clip.
  *
  * This is the feature-extraction stage a multimodal curation pipeline
  * runs after [[Multimodal.WavCodec]]'s sample-domain stats (peak/RMS/
  * ZCR): time-domain stats catch clipping and silence, spectral stats
  * catch tone/noise character (flatness ≈ 1 is white noise, ≈ 0 a pure
  * tone) and frequency content for dedup/clustering features.
  *
  * Scale shape: `mapPartitions` over the media rows — embarrassingly
  * parallel, one FFT per clip (O(N log N) on a bounded 4096-sample
  * analysis frame), no shuffle. The JVM analogue of the reference's
  * Python feature-extract UDFs, with the decode real instead of stubbed.
  *
  * Correctness is differential, not hoped:
  * [[graft.multimodal.SpectralSpec]] checks the FFT against a naive
  * O(N²) DFT, Parseval's identity, and known pure/mixed tones landing in
  * the right bins end-to-end through the WAV payload path.
  */
object Spectral {

  /** In-place iterative radix-2 FFT (n must be a power of two). */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length && (n & (n - 1)) == 0, s"fft size $n not a power of 2")
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
          val ar = re(base + k); val ai = im(base + k)
          val br = re(base + k + len / 2); val bi = im(base + k + len / 2)
          val tr = br * cr - bi * ci
          val ti = br * ci + bi * cr
          re(base + k) = ar + tr; im(base + k) = ai + ti
          re(base + k + len / 2) = ar - tr; im(base + k + len / 2) = ai - ti
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  final case class Features(dominant_hz: Double, centroid_hz: Double,
      rolloff85_hz: Double, flatness: Double)

  /** Features from a PCM frame (≤ [[FrameSize]] samples used, Hann
    * windowed, zero-padded to the power-of-two frame). DC (bin 0) is
    * excluded from every statistic — the window's own offset would
    * otherwise dominate quiet clips.
    */
  val FrameSize = 4096

  def features(samples: Array[Double], sampleRate: Int): Features = {
    val n = math.min(samples.length, FrameSize)
    var size = 1
    while (size < n) size <<= 1
    val re = new Array[Double](size)
    val im = new Array[Double](size)
    var i = 0
    while (i < n) {
      val w = 0.5 * (1.0 - math.cos(2.0 * math.Pi * i / math.max(1, n - 1)))
      re(i) = samples(i) * w
      i += 1
    }
    fft(re, im)
    val bins = size / 2
    val hzPerBin = sampleRate.toDouble / size
    var total = 0.0
    var weighted = 0.0
    var logSum = 0.0
    var nonZero = 0
    var maxMag = 0.0
    var maxBin = 0
    val mags = new Array[Double](bins)
    i = 1 // skip DC
    while (i < bins) {
      val m = math.sqrt(re(i) * re(i) + im(i) * im(i))
      mags(i) = m
      total += m
      weighted += m * i * hzPerBin
      if (m > 0) { logSum += math.log(m * m); nonZero += 1 }
      if (m > maxMag) { maxMag = m; maxBin = i }
      i += 1
    }
    // silence: no spectral content at all — report 0 flatness like the
    // any-zero-bin path below, NOT 1.0 (which the doc defines as white
    // noise; classifying silence as maximal noise would invert a
    // flatness-based quality filter)
    if (total == 0.0) return Features(0.0, 0.0, 0.0, 0.0)
    // 85% spectral rolloff: lowest frequency below which 85% of magnitude
    var cum = 0.0
    var roll = 0
    i = 1
    while (i < bins && cum < 0.85 * total) { cum += mags(i); roll = i; i += 1 }
    // flatness on POWER spectrum: geometric / arithmetic mean
    val power = {
      var s = 0.0; var k = 1
      while (k < bins) { s += mags(k) * mags(k); k += 1 }
      s / (bins - 1)
    }
    val flat =
      if (nonZero < bins - 1 || power == 0.0) 0.0
      else math.exp(logSum / (bins - 1)) / power
    Features(maxBin * hzPerBin, weighted / total, roll * hzPerBin,
      math.min(1.0, flat))
  }

  final case class AudioSpectral(media_id: Long, ok: Boolean, error: String,
      dominant_hz: Double, centroid_hz: Double, rolloff85_hz: Double,
      flatness: Double)

  /** The distributed pass: WAV payload → PCM (first channel) → frame →
    * FFT features. One `mapPartitions`, no shuffle.
    */
  def audioSpectral(media: Dataset[MediaRow]): Dataset[AudioSpectral] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(r => r.meta != null && r.meta.media_type == "audio").map { r =>
        Multimodal.WavCodec.decodePcm(r.payload, maxFrames = FrameSize) match {
          case Right((samples, sampleRate)) =>
            val f = features(samples, sampleRate)
            AudioSpectral(r.media_id, ok = true, "", f.dominant_hz,
              f.centroid_hz, f.rolloff85_hz, f.flatness)
          case Left(err) =>
            AudioSpectral(r.media_id, ok = false, err, 0.0, 0.0, 0.0, 0.0)
        }
      }
    }
  }
}
