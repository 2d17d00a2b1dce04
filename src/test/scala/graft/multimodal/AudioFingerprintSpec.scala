package graft.multimodal

import graft.SparkSpec

/** Audio fingerprinting: landmarks are deterministic, a time-shifted
  * copy of a clip matches at exactly the shift offset, and an unrelated
  * melody does not match.
  */
class AudioFingerprintSpec extends SparkSpec {

  private val sr = 16000

  /** A deterministic "melody": tone frequency changes every hop, walked
    * pseudo-randomly from the seed. The walk's STRIDE depends on the
    * seed — a seed-independent stride (`(seed·a + k·b) % m`) makes any
    * two seeds time-SHIFTED copies of the same cyclic sequence, which
    * the detector then correctly matches (it cost this spec a debugging
    * round); different strides give structurally different melodies.
    */
  private def melody(seed: Int, hops: Int): Array[Double] = {
    val n = AudioFingerprint.FrameSize + (hops - 1) * AudioFingerprint.Hop
    val out = new Array[Double](n)
    for (i <- 0 until n) {
      val k = i / AudioFingerprint.Hop
      val f = 300.0 + ((seed * 31 + k * (137 + seed)) % 29) * 150.0
      out(i) = 0.8 * math.sin(2.0 * math.Pi * f * i / sr)
    }
    out
  }

  private def wav(samples: Array[Double]): Array[Byte] =
    Multimodal.WavCodec.encodePcm16(
      samples.map(s => (s * 32767).toShort), sr)

  test("fingerprints are deterministic and shift-covariant") {
    val m = melody(1, 20)
    val fp1 = AudioFingerprint.fingerprints(m)
    val fp2 = AudioFingerprint.fingerprints(m)
    assert(fp1.nonEmpty && fp1.toSeq === fp2.toSeq)
    // prepend exactly 2 hops of a filler tone: every landmark hash
    // reappears 2 frames later (the pair shifts as a unit)
    val filler = Array.tabulate(2 * AudioFingerprint.Hop)(i =>
      0.8 * math.sin(2.0 * math.Pi * 250.0 * i / sr))
    val shifted = AudioFingerprint.fingerprints(filler ++ m)
    val orig = fp1.map { case (h, t) => (h, t + 2) }.toSet
    val inter = orig.intersect(shifted.toSet)
    assert(inter.size >= fp1.length / 2,
      s"shifted clip kept only ${inter.size}/${fp1.length} landmarks")
  }

  test("matchPairs finds the shifted copy at its offset, not the stranger") {
    import spark.implicits._
    val m = melody(1, 20)
    val filler = Array.tabulate(2 * AudioFingerprint.Hop)(i =>
      0.8 * math.sin(2.0 * math.Pi * 250.0 * i / sr))
    def row(id: Long, s: Array[Double]) = {
      val b = wav(s)
      Multimodal.MediaRow(id, b,
        Multimodal.MediaMeta("audio", "wav", None, None, Some(1000L),
          b.length.toLong))
    }
    val media = spark.createDataset(Seq(
      row(1, m), row(2, filler ++ m), row(3, melody(99, 20))))
    val fps = AudioFingerprint.fingerprintAudio(media).toDF()
    // minMatches is corpus-tuned (it scales with clip length × landmark
    // density): these dense 20-frame tone clips yield ~260 aligned
    // landmarks for a true copy while the per-hop tone-switch CLICKS
    // (broadband transients shared by construction) give unrelated
    // clips ~28 — 50 sits in the 9× gap
    val pairs = AudioFingerprint.matchPairs(fps, minMatches = 50).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getLong(3)))).toMap
    assert(pairs.contains((1L, 2L)), s"shifted copy must match: ${pairs.keySet}")
    val (off, n) = pairs((1L, 2L))
    assert(off === -2 && n >= 50,
      s"clip 2 is clip 1 delayed 2 frames: offset $off, aligned $n")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"unrelated melody must not match: ${pairs.keySet}")
  }
}
