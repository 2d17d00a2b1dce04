package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.syntheticMedia(spark, 300)

  test("synthetic media: typed binary payloads with metadata struct") {
    val df = media.toDF()
    assert(df.count() === 300)
    val r = media.filter(_.media_id == 0).head()
    assert(r.meta.media_type === "image")
    // image payloads are REAL PNGs (8-byte signature)
    assert(r.payload.take(8).toSeq ===
      Seq(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val types = media.map(_.meta.media_type)(org.apache.spark.sql.Encoders.STRING)
      .distinct().collect().sorted
    assert(types.toSeq === Seq("audio", "image", "video"))
  }

  test("image decode is real: pixel dims and stats match the encoded PNG") {
    val images = media.filter(_.meta.media_type == "image")
    val metaById = images.collect().map(r => r.media_id -> r.meta).toMap
    val decoded = Multimodal.extractFeatures(images).collect()
    assert(decoded.nonEmpty && decoded.forall(_.ok))
    decoded.foreach { d =>
      val m = metaById(d.media_id)
      assert(d.feature(0) === m.width.get.toFloat,
        s"decoded width mismatch for ${d.media_id}")
      assert(d.feature(1) === m.height.get.toFloat,
        s"decoded height mismatch for ${d.media_id}")
      // channel means and luminance are true pixel statistics in [0,1]
      assert(d.feature.drop(2).forall(f => f >= 0f && f <= 1f))
      assert(d.feature(6) <= d.feature(5) && d.feature(5) <= d.feature(7),
        "lumMin <= lumMean <= lumMax must hold")
    }
  }

  test("audio decode is real: WAV header and sample stats match generation") {
    val audio = media.filter(_.meta.media_type == "audio")
    val metaById = audio.collect().map(r => r.media_id -> r.meta).toMap
    val decoded = Multimodal.extractFeatures(audio).collect()
    assert(decoded.nonEmpty && decoded.forall(_.ok))
    decoded.foreach { d =>
      val m = metaById(d.media_id)
      assert(d.feature(0) === 8000f, s"sample rate mismatch for ${d.media_id}")
      assert(d.feature(1) === 1f, s"channel count mismatch for ${d.media_id}")
      // decoded duration comes from the data chunk, not the metadata struct
      assert(d.feature(3) === m.duration_ms.get.toFloat,
        s"decoded duration mismatch for ${d.media_id}")
      // the generated tone's amplitude is 0.1 + (id % 9) * 0.1
      val amp = (0.1 + (d.media_id % 9) * 0.1).toFloat
      assert(d.feature(4) <= amp + 0.01f && d.feature(4) >= amp * 0.8f,
        s"peak ${d.feature(4)} vs amplitude $amp for ${d.media_id}")
      val rms = (amp / math.sqrt(2.0)).toFloat
      assert(math.abs(d.feature(5) - rms) <= rms * 0.15f,
        s"rms ${d.feature(5)} vs sine expectation $rms for ${d.media_id}")
      // a fractional final cycle leaves a little DC; ~zero is all a sine owes us
      assert(math.abs(d.feature(7)) < 0.05f, "sine tone must have ~zero DC offset")
    }
  }

  test("wav codec round-trips an encoded buffer exactly") {
    val samples = Array.tabulate[Short](1600)(i =>
      (math.sin(i / 20.0) * 12000).toShort)
    val wav = Multimodal.WavCodec.encodePcm16(samples, 16000)
    val f = Multimodal.WavCodec.decodeFeatures(wav).toOption.get
    assert(f(0) === 16000f && f(1) === 1f && f(2) === 1600f)
    assert(f(3) === 100f) // 1600 frames @ 16 kHz = 100 ms
    val peak = samples.map(s => math.abs(s / 32768.0)).max.toFloat
    assert(math.abs(f(4) - peak) < 1e-4f)
  }

  test("wav chunk walk handles data-before-fmt ordering") {
    // RIFF does not order chunks; rebuild a valid file with the data
    // chunk FIRST and assert it decodes identically to the canonical one
    val samples = Array.tabulate[Short](800)(i => (math.sin(i / 9.0) * 9000).toShort)
    val canonical = Multimodal.WavCodec.encodePcm16(samples, 8000)
    val fmt = java.util.Arrays.copyOfRange(canonical, 12, 36)  // "fmt " + 16b
    val data = java.util.Arrays.copyOfRange(canonical, 36, canonical.length)
    val reordered = java.nio.ByteBuffer
      .allocate(canonical.length).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .put("RIFF".getBytes("US-ASCII")).putInt(canonical.length - 8)
      .put("WAVE".getBytes("US-ASCII")).put(data).put(fmt).array()
    val a = Multimodal.WavCodec.decodeFeatures(canonical).toOption.get
    val b = Multimodal.WavCodec.decodeFeatures(reordered).toOption.get
    assert(a.toSeq === b.toSeq)
  }

  test("stereo zero-crossing rate follows each channel, not the interleave") {
    // L = +k (never crosses), R = alternating sign (crosses every frame).
    // Interleaved sign flips would be ~1.0; the per-channel truth is ~0.5.
    val frames = 1000
    val samples = new Array[Short](frames * 2)
    var i = 0
    while (i < frames) {
      samples(2 * i) = 1000
      samples(2 * i + 1) = (if (i % 2 == 0) 2000 else -2000).toShort
      i += 1
    }
    val f = Multimodal.WavCodec
      .decodeFeatures(Multimodal.WavCodec.encodePcm16(samples, 16000, 2))
      .toOption.get
    assert(f(1) === 2f && f(2) === frames.toFloat)
    assert(math.abs(f(6) - 0.5f) < 0.01f,
      s"stereo zcr must be ~0.5 (per-channel), got ${f(6)}")
  }

  test("corrupt wav bytes are flagged, not thrown") {
    import spark.implicits._
    val bad = Seq(
      Multimodal.MediaRow(20, Array[Byte](1, 2, 3, 4),
        Multimodal.MediaMeta("audio", "wav", None, None, Some(10), 4)),
      Multimodal.MediaRow(21, "RIFFxxxxWAVEnochunkshere padded to 44 bytes!!"
        .getBytes("US-ASCII"),
        Multimodal.MediaMeta("audio", "wav", None, None, Some(10), 44))).toDS()
    val out = Multimodal.extractFeatures(bad).collect().sortBy(_.media_id)
    assert(out.forall(!_.ok))
    assert(out(0).error === "truncated wav")
    assert(out(1).error === "missing fmt/data chunk")
  }

  test("corrupt image bytes are flagged, not thrown") {
    import spark.implicits._
    val bad = Seq(Multimodal.MediaRow(9, Array[Byte](1, 2, 3, 4),
      Multimodal.MediaMeta("image", "png", Some(8), Some(8), None, 4))).toDS()
    val out = Multimodal.extractFeatures(bad).head()
    assert(!out.ok && out.error.contains("undecodable image"))
  }

  test("feature extraction: fixed-width features, deterministic, partition-parallel") {
    val f = Multimodal.extractFeatures(media).cache()
    assert(f.count() === 300)
    assert(f.filter(_.ok).count() === 300)
    val v = f.filter(_.media_id == 5).head().feature
    assert(v.length === Multimodal.StubCodec.FEATURE_DIM)
    // deterministic across runs and partitionings
    val v2 = Multimodal.extractFeatures(media.repartition(13))
      .filter(_.media_id == 5).head().feature
    assert(v.toSeq === v2.toSeq)
  }

  test("corrupt rows are flagged, not thrown") {
    import spark.implicits._
    val bad = Seq(
      Multimodal.MediaRow(1, Array.empty[Byte],
        Multimodal.MediaMeta("image", "jpeg", Some(8), Some(8), None, 0)),
      Multimodal.MediaRow(2, Array[Byte](1, 2, 3), null)).toDS()
    val out = Multimodal.extractFeatures(bad).collect().sortBy(_.media_id)
    assert(out.forall(!_.ok))
    assert(out(0).error === "empty payload")
    assert(out(1).error === "missing metadata")
  }

  test("resize plan computes scale factors and keeps only visual media") {
    val plan = Multimodal.resizePlan(media.toDF(), 32, 32).cache()
    val kinds = plan.select("meta.media_type").distinct()
      .collect().map(_.getString(0)).sorted
    assert(kinds.toSeq === Seq("image", "video"))
    val r = plan.filter(col("media_id") === 3).head() // image, w=19,h=19
    assert(math.abs(r.getAs[Double]("scale_x") - 19.0 / 32) < 1e-9)
  }

  test("frameSample/resizeImages flag null-meta and unsupported rows, not the task") {
    import spark.implicits._
    val mixed = spark.createDataset(Seq(
      Multimodal.MediaRow(50, Array[Byte](1, 2, 3), null),
      Multimodal.MediaRow(51, Array[Byte](1, 2, 3),
        Multimodal.MediaMeta("video", "mp4", Some(16), Some(16), Some(100), 3L))))
    val sampled = Multimodal.frameSample(mixed, 1).collect().sortBy(_.media_id)
    assert(sampled.length === 2 && sampled.forall(!_.ok))
    assert(sampled(0).error === "missing metadata")
    assert(sampled(1).error.contains("unsupported container format mp4"))
    val resized = Multimodal.resizeImages(
      spark.createDataset(Seq(Multimodal.MediaRow(52, Array[Byte](9), null))), 8).collect()
    assert(resized.length === 1 && !resized(0).ok &&
      resized(0).error === "missing metadata")
  }

  test("resize composites transparency over white, not black") {
    import spark.implicits._
    // a fully-transparent 32x32 ARGB PNG
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val row = Multimodal.MediaRow(60, bos.toByteArray,
      Multimodal.MediaMeta("image", "png", Some(32), Some(32), None, bos.size().toLong))
    val out = Multimodal.resizeImages(spark.createDataset(Seq(row)), 16).collect()
    assert(out.length === 1 && out(0).ok)
    val dec = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(0).payload))
    // transparent source must come out white (0xFFFFFF), not black
    assert((dec.getRGB(8, 8) & 0xFFFFFF) === 0xFFFFFF)
  }

  test("frame sampling is real: every k-th MJPEG frame decodes with true stats") {
    val avis = Multimodal.syntheticMjpegAvi(spark, 6)
    val metas = avis.collect().map { r =>
      val Right((m, _)) = Multimodal.AviCodec.parseRaw(r.payload)
      r.media_id -> m
    }.toMap
    val out = Multimodal.frameSample(avis, everyK = 2).collect()
    assert(out.nonEmpty && out.forall(_.ok), s"failures: ${out.filter(!_.ok).toSeq}")
    out.groupBy(_.media_id).foreach { case (id, frames) =>
      val m = metas(id)
      // exactly the even frame indices, each with the container geometry
      assert(frames.map(_.frame_idx).sorted.toSeq
        === (0 until m.nFrames by 2).toSeq)
      assert(frames.forall(f => f.width === m.width && f.height === m.height))
      assert(frames.forall(f => f.mean_luma >= 0.0 && f.mean_luma <= 1.0))
      // timestamps follow the container fps
      frames.sortBy(_.frame_idx).foreach(f =>
        assert(f.ts_ms === math.round(f.frame_idx * 1000.0 / m.fps)))
    }
  }

  test("image resize is real: bilinear shrink to the max edge, no upscaling") {
    val images = media.filter(_.meta.media_type == "image")
    val origDims = images.collect()
      .map(r => r.media_id -> (r.meta.width.get, r.meta.height.get)).toMap
    val maxDim = origDims.values.map(d => math.max(d._1, d._2)).max / 2
    val out = Multimodal.resizeImages(images, maxDim).collect()
    assert(out.nonEmpty && out.forall(_.ok), s"failures: ${out.filter(!_.ok).toSeq}")
    out.foreach { r =>
      val (w, h) = origDims(r.media_id)
      if (math.max(w, h) <= maxDim) {
        // inside budget: byte-identical passthrough, original dims
        assert((r.width, r.height) === ((w, h)))
      } else {
        assert(math.max(r.width, r.height) === maxDim,
          s"longer edge must land on $maxDim: ${(r.width, r.height)}")
        // aspect preserved within rounding
        assert(math.abs(r.width.toDouble / r.height - w.toDouble / h) < 0.15,
          s"aspect drifted: ${(w, h)} -> ${(r.width, r.height)}")
      }
      // the payload is a real decodable PNG with the claimed geometry
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(r.payload))
      assert(img.getWidth === r.width && img.getHeight === r.height)
    }
  }

  test("mp4 container walk recovers the generated metadata exactly") {
    val videos = media.filter(_.meta.media_type == "video")
    val metaById = videos.collect().map(r => r.media_id -> r.meta).toMap
    val walked = Multimodal.containerMeta(videos).collect()
    assert(walked.nonEmpty && walked.forall(_.ok))
    walked.foreach { c =>
      val m = metaById(c.media_id)
      assert(c.brand === "isom")
      // mvhd timescale is 1000, so walked duration IS the generated ms
      assert(c.duration_ms === m.duration_ms.get,
        s"container duration mismatch for ${c.media_id}")
      assert(c.n_tracks === 2)
      assert(c.video_width === m.width && c.video_height === m.height,
        s"tkhd resolution mismatch for ${c.media_id}")
      assert(c.handlers.sorted === Seq("soun", "vide"))
    }
  }

  test("mp4 codec round-trips track durations through mdhd timescales") {
    val payload = Multimodal.Mp4Codec.encode(12345L, 640, 360,
      Array.tabulate[Byte](64)(_.toByte))
    val m = Multimodal.Mp4Codec.parseMeta(payload).toOption.get
    assert(m.brand === "isom" && m.duration_ms === 12345L)
    val vide = m.tracks.find(_.handler == "vide").get
    val soun = m.tracks.find(_.handler == "soun").get
    // per-track durations come from each track's own mdhd timescale
    // (90 kHz video, 48 kHz audio), not the movie header
    assert(vide.duration_ms === Some(12345L) && soun.duration_ms === Some(12345L))
    assert(vide.width === Some(640) && vide.height === Some(360))
    assert(soun.width === None && soun.height === None)
  }

  test("corrupt mp4 bytes are flagged, not thrown") {
    import spark.implicits._
    val good = Multimodal.Mp4Codec.encode(1000L, 64, 48, Array[Byte](1, 2, 3))
    val bad = Seq(
      Multimodal.MediaRow(30, Array[Byte](1, 2, 3, 4),
        Multimodal.MediaMeta("video", "mp4", None, None, Some(10), 4)),
      // ftyp present but moov truncated away
      Multimodal.MediaRow(31, java.util.Arrays.copyOfRange(good, 0, 24),
        Multimodal.MediaMeta("video", "mp4", None, None, Some(10), 24)),
      // wrong container format routed here
      Multimodal.MediaRow(32, good,
        Multimodal.MediaMeta("video", "webm", None, None, Some(10), good.length.toLong)))
      .toDS()
    val out = Multimodal.containerMeta(bad).collect().sortBy(_.media_id)
    assert(out.forall(!_.ok))
    assert(out(0).error === "truncated container")
    assert(out(1).error === "missing moov box")
    assert(out(2).error === "unsupported container format")
  }

  test("frame sampling explodes a deterministic grid per video") {
    val frames = Multimodal.frameSamplePlan(media.toDF(), 10000)
    val perVideo = frames.groupBy("media_id").count()
    val r = perVideo.filter(col("media_id") === 2).head() // duration 2%60000+1000
    assert(r.getLong(1) === (2 % 60000 + 1000) / 10000 + 1)
    assert(frames.filter(col("frame_ts_ms") % 10000 =!= 0).count() === 0)
  }
}
