package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Audio fingerprinting — the constellation/landmark-hash scheme of
  * Wang 2003 ("An Industrial-Strength Audio Search Algorithm", the
  * Shazam paper), as the audio member of the dedup/search family:
  * [[Multimodal.aHash]]/[[Multimodal.pHash]] fingerprint images, this
  * fingerprints audio clips so re-encoded / time-shifted / partially
  * overlapping recordings can be matched without comparing waveforms.
  *
  * Pipeline per clip (pure JDK, deterministic):
  *  1. spectrogram: 1024-sample frames on a 512 hop, Hann window,
  *     [[Spectral.fft]] per frame;
  *  2. constellation: the peak bin of each of 4 log-spaced bands per
  *     frame (band-wise peaks resist band-limited noise — a single
  *     global peak would let one loud tone mask everything);
  *  3. landmarks: each peak (anchor) pairs with every peak of the next
  *     [[FanoutFrames]] frames → hash `f1<<20 | f2<<8 | dt` — the pair
  *     survives time shift because BOTH points shift together.
  *
  * Matching is the LSH-blocking discipline yet again: candidate pairs
  * come from an equi-join on the hash (inverted index, never all-pairs
  * of clips), and a true match is a pair with MANY shared hashes at a
  * CONSISTENT time offset — the offset histogram's max bucket, which
  * kills coincidental single-hash collisions. At 100 TB the hash join
  * shuffles fingerprints (≤ ~32/frame), never audio payloads.
  */
object AudioFingerprint {

  val FrameSize = 1024
  val Hop = 512
  val FanoutFrames = 2

  /** Band edges over the 512 magnitude bins (log-spaced, DC excluded). */
  private val bands = Array((1, 8), (8, 32), (32, 128), (128, 512))

  /** Constellation points of one clip: (frameIdx, peakBin) per band per
    * frame; silent bands (zero magnitude) yield no point.
    */
  private[multimodal] def constellation(samples: Array[Double]): Array[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val nFrames = math.max(0, (samples.length - FrameSize) / Hop + 1)
    var t = 0
    while (t < nFrames) {
      val re = new Array[Double](FrameSize)
      val im = new Array[Double](FrameSize)
      var i = 0
      while (i < FrameSize) {
        val w = 0.5 * (1.0 - math.cos(2.0 * math.Pi * i / (FrameSize - 1)))
        re(i) = samples(t * Hop + i) * w
        i += 1
      }
      Spectral.fft(re, im)
      // band peaks, gated at 40 dB below the frame's strongest peak: a
      // pure tone leaks deterministic low-level energy into EVERY band
      // (Hann sidelobes), and an ungated per-band argmax turns that
      // leakage into constant junk points — identical (f1,f2,dt) hashes
      // in every frame of every clip, which align any two clips at
      // offset 0 (measured: 164 spurious alignments between unrelated
      // melodies). The relative floor keeps only genuinely energetic
      // peaks while still surfacing real multi-tone content.
      val peaks = bands.map { case (lo, hi) =>
        var maxM = 0.0
        var maxB = -1
        var b = lo
        while (b < hi) {
          val m = re(b) * re(b) + im(b) * im(b)
          if (m > maxM) { maxM = m; maxB = b }
          b += 1
        }
        (maxB, maxM)
      }
      val frameMax = peaks.map(_._2).max
      for ((maxB, maxM) <- peaks)
        if (maxB >= 0 && maxM > 1e-12 && maxM >= frameMax * 1e-4)
          out += ((t, maxB))
      t += 1
    }
    out.toArray
  }

  /** Landmark hashes of one clip: (hash, anchorFrame). */
  def fingerprints(samples: Array[Double]): Array[(Long, Int)] = {
    val pts = constellation(samples)
    val byFrame = pts.groupBy(_._1)
    pts.flatMap { case (t, f1) =>
      (1 to FanoutFrames).flatMap { dt =>
        byFrame.getOrElse(t + dt, Array.empty[(Int, Int)]).map { case (_, f2) =>
          ((f1.toLong << 20) | (f2.toLong << 8) | dt.toLong, t)
        }
      }
    }
  }

  final case class AudioFp(media_id: Long, hash: Long, t: Int)

  /** Distributed fingerprint extraction: WAV payload → PCM → landmarks.
    * One `mapPartitions`, no shuffle; undecodable rows drop (DLQ-able
    * upstream via [[Multimodal.extractFeatures]]).
    */
  def fingerprintAudio(media: Dataset[Multimodal.MediaRow]): Dataset[AudioFp] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.filter(r => r.meta != null && r.meta.media_type == "audio")
      .flatMap { r =>
        Multimodal.WavCodec.decodePcm(r.payload) match {
          case Right((samples, _)) =>
            fingerprints(samples).iterator.map { case (h, t) =>
              AudioFp(r.media_id, h, t)
            }
          case Left(_) => Iterator.empty
        }
      })
  }

  /** Clip-pair matches: hash-join the fingerprint tables, histogram the
    * frame offsets per pair, keep pairs whose best consistent offset has
    * at least `minMatches` aligned landmarks. Returns
    * (id_a, id_b, offset_frames, n_aligned).
    */
  def matchPairs(fps: DataFrame, minMatches: Int = 8): DataFrame = {
    val a = fps.select(col("media_id").as("id_a"), col("hash"), col("t").as("ta"))
    val b = fps.select(col("media_id").as("id_b"), col("hash"), col("t").as("tb"))
    a.join(b, Seq("hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), (col("ta") - col("tb")).as("offset_frames"))
      .agg(count(lit(1)).as("n_aligned"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("id_a", "id_b")
          .orderBy(col("n_aligned").desc, col("offset_frames"))))
      .filter(col("rn") === 1 && col("n_aligned") >= minMatches)
      .drop("rn")
  }
}
