package graft.multimodal

import graft.SparkSpec
import Multimodal.{MediaRow, MediaMeta, WavCodec}

/** FFT correctness is differential (vs a naive DFT) and physical (known
  * tones land in the right bins through the real WAV payload path).
  */
class SpectralSpec extends SparkSpec {

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(ang)
      im(k) += x(t) * math.sin(ang)
    }
    (re, im)
  }

  test("fft equals the naive DFT on seeded random inputs") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(2, 4, 8, 16, 32, 64, 128, 256, 512, 1024); _ <- 1 to 3) {
      val x = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val (er, ei) = naiveDft(x)
      val re = x.clone(); val im = new Array[Double](n)
      Spectral.fft(re, im)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - er(k)) < 1e-8, s"re mismatch at $k (n=$n)")
        assert(math.abs(im(k) - ei(k)) < 1e-8, s"im mismatch at $k (n=$n)")
      }
    }
  }

  test("Parseval: time-domain energy equals spectrum energy / N") {
    val rnd = new scala.util.Random(7)
    val n = 512
    val x = Array.fill(n)(rnd.nextDouble() * 2 - 1)
    val re = x.clone(); val im = new Array[Double](n)
    Spectral.fft(re, im)
    val timeE = x.map(v => v * v).sum
    val freqE = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum / n
    assert(math.abs(timeE - freqE) < 1e-8 * n, s"$timeE vs $freqE")
  }

  test("a pure tone's dominant bin and centroid sit at the tone frequency") {
    val sr = 8000
    val freq = 440.0
    val samples = Array.tabulate(4096)(i =>
      0.5 * math.sin(2.0 * math.Pi * freq * i / sr))
    val f = Spectral.features(samples, sr)
    val binHz = sr.toDouble / 4096
    assert(math.abs(f.dominant_hz - freq) <= binHz,
      s"dominant ${f.dominant_hz} not at $freq")
    // Hann leakage spreads symmetrically: centroid stays within a few bins
    assert(math.abs(f.centroid_hz - freq) <= 4 * binHz,
      s"centroid ${f.centroid_hz} not near $freq")
    assert(f.flatness < 0.05, s"pure tone should not be flat: ${f.flatness}")
  }

  test("the stronger of two tones dominates; white noise is flat") {
    val sr = 8000
    val two = Array.tabulate(4096)(i =>
      0.6 * math.sin(2.0 * math.Pi * 1000.0 * i / sr) +
        0.2 * math.sin(2.0 * math.Pi * 300.0 * i / sr))
    val f2 = Spectral.features(two, sr)
    assert(math.abs(f2.dominant_hz - 1000.0) <= sr.toDouble / 4096)
    val rnd = new scala.util.Random(9)
    val noise = Array.fill(4096)(rnd.nextDouble() * 2 - 1)
    val fn = Spectral.features(noise, sr)
    assert(fn.flatness > 0.3, s"white noise should be flat-ish: ${fn.flatness}")
  }

  test("end-to-end: synthetic WAV tones recover their generator frequency") {
    import spark.implicits._
    // audio rows are media_id % 3 == 1 with tone freq = 200 + id % 200
    val media = Multimodal.syntheticMedia(spark, 60)
    val out = Spectral.audioSpectral(media).collect()
    assert(out.nonEmpty && out.forall(_.ok), s"decode failures: ${out.toSeq}")
    out.foreach { a =>
      val expected = 200.0 + (a.media_id % 200)
      // clip length varies (>= 50 ms at 8 kHz = >= 400 samples); frame is
      // zero-padded to a power of two, so resolution is sr / frameSize
      val n = math.min((((a.media_id % 1000) + 50) * 8).toInt, Spectral.FrameSize)
      var size = 1; while (size < n) size <<= 1
      val binHz = 8000.0 / size
      assert(math.abs(a.dominant_hz - expected) <= binHz + 1e-9,
        s"id=${a.media_id}: dominant ${a.dominant_hz} vs tone $expected (bin $binHz)")
    }
  }

  test("silence reports zero flatness (not white-noise-like)") {
    val f = Spectral.features(new Array[Double](2048), 8000)
    assert(f.flatness === 0.0 && f.dominant_hz === 0.0)
  }

  test("decodePcm caps at maxFrames (bounded allocation per clip)") {
    val samples = Array.tabulate[Short](50000)(i => (i % 1000).toShort)
    val payload = WavCodec.encodePcm16(samples, 8000)
    val Right((capped, _)) = WavCodec.decodePcm(payload, maxFrames = 4096)
    assert(capped.length === 4096)
    val Right((full, _)) = WavCodec.decodePcm(payload)
    assert(full.length === 50000)
    for (i <- 0 until 4096) assert(capped(i) === full(i))
  }

  test("decodePcm mirrors the encoder (round-trip samples)") {
    val samples = Array.tabulate[Short](1000)(i =>
      (math.sin(i * 0.05) * 20000).toShort)
    val payload = WavCodec.encodePcm16(samples, 8000)
    val Right((decoded, sr)) = WavCodec.decodePcm(payload)
    assert(sr === 8000 && decoded.length === 1000)
    for (i <- samples.indices)
      assert(math.abs(decoded(i) - samples(i) / 32768.0) < 1e-12)
  }
}
