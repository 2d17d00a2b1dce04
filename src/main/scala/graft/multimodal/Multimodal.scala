package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video payloads as opaque `binary`
  * columns with a typed metadata struct, plus the decode / feature-extract
  * / resize / frame-sample operator plumbing.
  *
  * IMAGE decoding is REAL: `javax.imageio.ImageIO` ships with the JDK, so
  * PNG/JPEG payloads decode to actual pixels ([[ImageCodec]]) and the
  * extracted features are true pixel statistics. AUDIO decoding is REAL
  * for WAV: [[WavCodec]] parses the RIFF/fmt/data chunk layout and PCM16
  * samples with plain `ByteBuffer` arithmetic (no codec libs needed) and
  * emits true sample statistics. VIDEO container metadata is REAL:
  * [[Mp4Codec]] walks the ISO-BMFF box tree (ftyp/moov/mvhd/tkhd/mdhd/hdlr)
  * for brand, duration, track handlers, and resolution without touching
  * frame data — and VIDEO FRAME decoding is REAL for MJPEG-in-AVI
  * ([[AviCodec]]): RIFF chunk walk + per-frame JPEG decode through
  * ImageIO yields true frame counts and pixel statistics. Only
  * inter-frame coded video (h264 etc.) is not decodable in this
  * environment, so that kernel remains a clearly-marked deterministic stub
  * ([[StubCodec]]); everything Spark-owned is real and tested — schema,
  * batch iteration shape, partition-parallel execution, null/corrupt-row
  * routing. Swapping in a real video codec changes one function, not the
  * plan.
  *
  * Scale posture: media work is per-row CPU-bound, so the operators use
  * `mapPartitions` over an iterator (the JVM analogue of `mapInPandas`
  * batch processing — one codec init per partition, streaming through rows
  * without materializing the partition). Binary payloads never shuffle:
  * all operators are narrow transforms; only extracted features (small
  * fixed-width vectors) flow into joins/aggregations downstream.
  */
object Multimodal {

  /** Typed metadata carried alongside every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType), // image | audio | video
    StructField("format", StringType), // jpeg | png | wav | mp4 ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType),
    StructField("size_bytes", LongType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaSchema)))

  final case class MediaMeta(media_type: String, format: String,
      width: Option[Int], height: Option[Int], duration_ms: Option[Long],
      size_bytes: Long)
  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class DecodedFeatures(media_id: Long, ok: Boolean,
      error: String, feature: Array[Float])

  /** Deterministic synthetic media table, generated distributed via
    * spark.range. Image rows carry REAL PNG bytes (encoded per-row with
    * ImageIO from a seeded pixel pattern); audio/video rows carry seeded
    * pseudo-bytes for the stubbed codecs.
    */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).map { id =>
      (id % 3) match {
        case 0 =>
          val w = (id % 64 + 16).toInt
          val h = (id % 48 + 16).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val r = ((id * 31 + x * 7 + y * 13) % 256).toInt
              val g = ((id * 17 + x * 3 + y * 5) % 256).toInt
              val b = ((id * 11 + x * 11 + y * 2) % 256).toInt
              img.setRGB(x, y, (r << 16) | (g << 8) | b)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val payload = bos.toByteArray
          MediaRow(id, payload,
            MediaMeta("image", "png", Some(w), Some(h), None, payload.length.toLong))
        case 1 =>
          // real PCM16 WAV: a seeded sine tone, 8 kHz mono
          val durMs = id % 1000 + 50
          val sr = 8000
          val frames = (durMs * sr / 1000).toInt
          val amp = 0.1 + (id % 9) * 0.1
          val freq = 200.0 + (id % 200)
          val samples = Array.tabulate[Short](frames) { i =>
            math.round(amp * 32767.0 *
              math.sin(2.0 * math.Pi * freq * i / sr)).toShort
          }
          val payload = WavCodec.encodePcm16(samples, sr)
          MediaRow(id, payload,
            MediaMeta("audio", "wav", None, None, Some(durMs), payload.length.toLong))
        case _ =>
          // real ISO-BMFF container (ftyp/moov/mdat box structure with true
          // mvhd/tkhd/mdhd/hdlr metadata); only the mdat SAMPLES are seeded
          // noise, standing in for coded frames
          val w = (id % 8 + 1).toInt * 16
          val h = (id % 6 + 1).toInt * 16
          val durMs = id % 60000 + 1000
          val mdat = Array.tabulate[Byte]((id % 96 + 32).toInt)(i =>
            ((id * 31 + i * 7) % 251).toByte)
          val payload = Mp4Codec.encode(durMs, w, h, mdat)
          MediaRow(id, payload,
            MediaMeta("video", "mp4", Some(w), Some(h),
              Some(durMs), payload.length.toLong))
      }
    }
  }

  /** Deterministic synthetic MJPEG-AVI table: every row is a REAL playable
    * AVI whose frames are seeded-gradient JPEGs — the fixture for the
    * true-frame-decode path ([[AviCodec]]). Generated distributed, like
    * [[syntheticMedia]].
    */
  def syntheticMjpegAvi(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n).map { id =>
      val w = (id % 4 + 2).toInt * 16
      val h = (id % 3 + 2).toInt * 16
      val fps = (id % 24 + 2).toInt
      val nFrames = (id % 6 + 2).toInt
      val frames = (0 until nFrames).map { f =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        // per-frame brightness ramp so frame stats are distinguishable
        val base = ((id * 13 + f * 40) % 200).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = math.min(255, base + (x + y) % 56)
            img.setRGB(x, y, (v << 16) | (v << 8) | v)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      val payload = AviCodec.encodeMjpeg(frames, w, h, fps)
      val durMs = math.round(nFrames * 1000.0 / fps)
      MediaRow(id, payload,
        MediaMeta("video", "avi", Some(w), Some(h), Some(durMs),
          payload.length.toLong))
    }
  }

  val FEATURE_DIM = 8

  /** REAL image codec: JDK ImageIO pixel decode. Features are true pixel
    * statistics: [width, height, mean R, mean G, mean B (0..1),
    * mean/min/max luminance (0..1)].
    */
  object ImageCodec {
    def decodeFeatures(payload: Array[Byte]): Either[String, Array[Float]] =
      try {
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) Left("undecodable image")
        else {
          val w = img.getWidth
          val h = img.getHeight
          var sr, sg, sb, slum = 0.0
          var lumMin = 1.0
          var lumMax = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val r = ((rgb >> 16) & 0xff) / 255.0
              val g = ((rgb >> 8) & 0xff) / 255.0
              val b = (rgb & 0xff) / 255.0
              val lum = 0.2126 * r + 0.7152 * g + 0.0722 * b
              sr += r; sg += g; sb += b; slum += lum
              if (lum < lumMin) lumMin = lum
              if (lum > lumMax) lumMax = lum
              x += 1
            }
            y += 1
          }
          val np = (w * h).toDouble
          Right(Array(w.toFloat, h.toFloat, (sr / np).toFloat, (sg / np).toFloat,
            (sb / np).toFloat, (slum / np).toFloat, lumMin.toFloat, lumMax.toFloat))
        }
      } catch {
        case e: Exception => Left(s"image decode failed: ${e.getMessage}")
      }
  }

  /** 64-bit average hash (aHash) — the classic perceptual image
    * fingerprint: average-pool the decoded pixels into an 8×8 luminance
    * grid, threshold each cell against the grid mean, pack the 64 bits.
    * Pooling is computed directly from pixel sums per block (no
    * Graphics2D resampling — interpolation differs across JDKs; integer
    * block sums are deterministic everywhere). Near-duplicate images
    * (re-encodes, small edits, minor noise) land within a few bits;
    * unrelated images differ in ~32.
    */
  def aHash(payload: Array[Byte]): Either[String, Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) Left("undecodable image")
      else if (img.getWidth < 8 || img.getHeight < 8)
        Left(s"image too small for aHash: ${img.getWidth}x${img.getHeight}")
      else Right(aHashImage(img))
    } catch {
      case e: Exception => Left(s"image decode failed: ${e.getMessage}")
    }

  /** [[aHash]]'s pooling/threshold core on an already-decoded image
    * (≥ 8×8) — shared with the video scene detector, which hashes
    * decoded AVI frames directly instead of re-encoding them.
    */
  private[multimodal] def aHashImage(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val cell = new Array[Double](64)
    var by = 0
    while (by < 8) {
      val y0 = by * h / 8; val y1 = (by + 1) * h / 8
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8; val x1 = (bx + 1) * w / 8
        var s = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            s += 0.2126 * ((rgb >> 16) & 0xff) +
              0.7152 * ((rgb >> 8) & 0xff) + 0.0722 * (rgb & 0xff)
            x += 1
          }
          y += 1
        }
        cell(by * 8 + bx) = s / ((y1 - y0).toLong * (x1 - x0))
        bx += 1
      }
      by += 1
    }
    val mean = cell.sum / 64
    var hash = 0L
    var i = 0
    while (i < 64) {
      if (cell(i) > mean) hash |= (1L << i)
      i += 1
    }
    hash
  }

  /** DCT-II basis for the 32-point transform, `basis(u)(x) =
    * cos(π/32 · (x + ½) · u)`. `StrictMath.cos` (fdlibm, bit-identical
    * on every JVM) so a hash computed on one executor image equals the
    * same hash on any other — `Math.cos` is allowed to differ per
    * platform and would make the fingerprint column machine-dependent.
    */
  private lazy val dctBasis32: Array[Array[Double]] =
    Array.tabulate(32, 32)((u, x) =>
      StrictMath.cos(StrictMath.PI / 32.0 * (x + 0.5) * u))

  /** 64-bit DCT hash (pHash) — the frequency-domain perceptual
    * fingerprint: average-pool the luminance to a 32×32 grid (same
    * deterministic integer-block pooling as [[aHash]], no Graphics2D
    * resampling), take the 2D DCT-II, keep the 63 lowest-frequency
    * coefficients (top-left 8×8 minus the DC term, which only encodes
    * global brightness), and set each bit by comparing against their
    * median. Captures image STRUCTURE rather than local intensity, so
    * rescaled/blurred/re-encoded variants stay within a few bits where
    * aHash can drift; the DCT is computed partially (only the 8
    * low-frequency rows/cols) so the per-image cost is 32·32·8 + 32·8·8
    * multiplies, not a full 32×32 transform.
    */
  def pHash(payload: Array[Byte]): Either[String, Long] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) Left("undecodable image")
      else if (img.getWidth < 32 || img.getHeight < 32)
        Left(s"image too small for pHash: ${img.getWidth}x${img.getHeight}")
      else {
        val w = img.getWidth
        val h = img.getHeight
        val cell = new Array[Double](32 * 32)
        var by = 0
        while (by < 32) {
          val y0 = by * h / 32; val y1 = (by + 1) * h / 32
          var bx = 0
          while (bx < 32) {
            val x0 = bx * w / 32; val x1 = (bx + 1) * w / 32
            var s = 0.0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                s += 0.2126 * ((rgb >> 16) & 0xff) +
                  0.7152 * ((rgb >> 8) & 0xff) + 0.0722 * (rgb & 0xff)
                x += 1
              }
              y += 1
            }
            cell(by * 32 + bx) = s / ((y1 - y0).toLong * (x1 - x0))
            bx += 1
          }
          by += 1
        }
        // separable partial DCT: rows (32×8), then columns (8×8)
        val rows = Array.ofDim[Double](32, 8)
        var y = 0
        while (y < 32) {
          var v = 0
          while (v < 8) {
            var s = 0.0
            var x = 0
            while (x < 32) { s += cell(y * 32 + x) * dctBasis32(v)(x); x += 1 }
            rows(y)(v) = s
            v += 1
          }
          y += 1
        }
        val coef = new Array[Double](63)
        var u = 0
        var i = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            if (u != 0 || v != 0) {
              var s = 0.0
              var yy = 0
              while (yy < 32) { s += rows(yy)(v) * dctBasis32(u)(yy); yy += 1 }
              coef(i) = s
              i += 1
            }
            v += 1
          }
          u += 1
        }
        val sorted = coef.clone()
        java.util.Arrays.sort(sorted)
        val median = sorted(31)
        var hash = 0L
        i = 0
        while (i < 63) {
          if (coef(i) > median) hash |= (1L << i)
          i += 1
        }
        Right(hash)
      }
    } catch {
      case e: Exception => Left(s"image decode failed: ${e.getMessage}")
    }

  final case class ImageHash(media_id: Long, ahash: Long)

  /** Near-duplicate IMAGE pairs via aHash band blocking — the multimodal
    * analogue of the x3 SimHash text dedup, with the same scale posture:
    * candidate pairs come from a 4×16-bit band equi-join (never an
    * all-pairs comparison), verified with an exact `bit_count(a ^ b)`
    * Hamming distance. Undecodable rows drop out (DLQ-able upstream via
    * [[extractFeatures]]).
    */
  def nearDupImagePairs(media: Dataset[MediaRow],
      maxHamming: Int = 6): DataFrame =
    mineHashPairs(hashImages(media, aHash), maxHamming)

  /** [[nearDupImagePairs]] with the DCT hash ([[pHash]]) — same band
    * blocking and exact Hamming verify, but the candidate signature is
    * frequency-domain, so rescaled/blurred re-encodes of the same image
    * still collide.
    */
  def nearDupImagePairsDct(media: Dataset[MediaRow],
      maxHamming: Int = 6): DataFrame =
    mineHashPairs(hashImages(media, pHash), maxHamming)

  private def hashImages(media: Dataset[MediaRow],
      hashFn: Array[Byte] => Either[String, Long]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .filter(r => r.meta != null && r.meta.media_type == "image")
      .mapPartitions(_.flatMap(r =>
        hashFn(r.payload).toOption.map(ImageHash(r.media_id, _))))
      .toDF()
  }

  /** Image near-dup CLUSTERS: the x15 canonicalization carried to the
    * image modality — DCT-pHash pair mining → connected components →
    * per-cluster census with the min-media_id canonical (the same
    * survivorship rule text dedup uses, so a mixed-modality pipeline
    * keeps ONE convention). Output: (canonical_id, n_members, members).
    *
    * Scale posture: pair mining is band-blocked (never all-pairs of
    * images), components are the x15 O(log D) label propagation, and
    * the per-cluster member list is bounded by near-dup cluster size —
    * the same contract as the text-side clusters.
    */
  def imageDupClusters(media: Dataset[MediaRow],
      maxHamming: Int = 6): DataFrame = {
    val edges = nearDupImagePairsDct(media, maxHamming)
      .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
    graft.dedup.ClusterQueries.connectedComponents(edges)
      .groupBy("lbl").agg(count(lit(1)).as("n_members"),
        sort_array(collect_list(col("node"))).as("members"))
      .select(col("lbl").as("canonical_id"), col("n_members"), col("members"))
      .orderBy("canonical_id")
  }

  private def mineHashPairs(hashed: DataFrame, maxHamming: Int): DataFrame = {
    val bands = hashed.select(col("media_id"), col("ahash"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bits", expr("shiftright(ahash, band * 16) & 65535"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** REAL audio codec for WAV: RIFF/fmt/data chunk walk + PCM16 sample
    * statistics, pure JDK (`ByteBuffer`, little-endian). Features:
    * [sample rate Hz, channels, frames, duration ms, peak |s| (0..1),
    * RMS (0..1), zero-crossing rate (0..1), mean (DC offset, −1..1)].
    */
  object WavCodec {

    /** Encode mono/interleaved PCM16 samples as a canonical 44-byte-header
      * WAV file (the generator and tests use this; round-trips through
      * [[decodeFeatures]]).
      */
    def encodePcm16(samples: Array[Short], sampleRate: Int,
        channels: Int = 1): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      bb.put("WAVE".getBytes("US-ASCII"))
      bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      bb.putShort(1) // PCM
      bb.putShort(channels.toShort)
      bb.putInt(sampleRate)
      bb.putInt(sampleRate * channels * 2) // byte rate
      bb.putShort((channels * 2).toShort) // block align
      bb.putShort(16) // bits per sample
      bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
      var i = 0
      while (i < samples.length) { bb.putShort(samples(i)); i += 1 }
      bb.array()
    }

    private def ascii(bb: java.nio.ByteBuffer): String = {
      val b = new Array[Byte](4)
      bb.get(b)
      new String(b, "US-ASCII")
    }

    private final case class Header(fmtCode: Int, channels: Int, bits: Int,
        sampleRate: Int, dataOff: Int, dataLen: Int)

    /** RIFF/fmt/data chunk walk shared by [[decodeFeatures]] and
      * [[decodePcm]]; validates PCM16.
      */
    private def header(payload: Array[Byte],
        bb: java.nio.ByteBuffer): Either[String, Header] =
      if (payload.length < 44) Left("truncated wav")
      else if (ascii(bb) != "RIFF") Left("not a RIFF payload")
      else {
        bb.getInt // riff size (unreliable in the wild; chunk walk below)
        if (ascii(bb) != "WAVE") Left("not a WAVE payload")
        else {
          var sampleRate = -1
          var channels = -1
          var bits = -1
          var fmtCode = -1
          var dataOff = -1
          var dataLen = -1
          // chunk-skip clamp: the RIFF pad byte after an odd-sized final
          // chunk may be absent in the wild; skipping past limit would
          // throw and fail an otherwise-decodable file
          def skipTo(pos: Int): Unit = bb.position(math.min(bb.limit(), pos))
          // walk until BOTH fmt and data have been seen — the spec does
          // not order them, and data-before-fmt files exist in the wild
          while (bb.remaining() >= 8 && (dataOff < 0 || sampleRate < 0)) {
            val id = ascii(bb)
            val size = bb.getInt
            if (size < 0 || size > bb.remaining()) {
              bb.position(bb.limit()) // malformed size: stop the walk
            } else id match {
              case "fmt " =>
                val end = bb.position() + size
                fmtCode = bb.getShort & 0xffff
                channels = bb.getShort & 0xffff
                sampleRate = bb.getInt
                bb.getInt // byte rate
                bb.getShort // block align
                bits = bb.getShort & 0xffff
                skipTo(end + (size & 1))
              case "data" =>
                dataOff = bb.position()
                dataLen = size
                skipTo(dataOff + size + (size & 1))
              case _ =>
                skipTo(bb.position() + size + (size & 1))
            }
          }
          if (sampleRate <= 0 || channels <= 0 || dataOff < 0)
            Left("missing fmt/data chunk")
          else if (fmtCode != 1 || bits != 16)
            Left(s"unsupported wav encoding (fmt=$fmtCode bits=$bits)")
          else Right(Header(fmtCode, channels, bits, sampleRate, dataOff, dataLen))
        }
      }

    /** First-channel PCM as doubles in [-1, 1) plus the sample rate — the
      * sample source for [[graft.multimodal.Spectral]]. `maxFrames` caps
      * decoding at a frame budget: the spectral path analyzes one bounded
      * frame, and materializing a whole 10-minute clip (hundreds of MB as
      * doubles) per record to read 4096 samples would be pure executor
      * GC pressure.
      */
    def decodePcm(payload: Array[Byte],
        maxFrames: Int = Int.MaxValue): Either[String, (Array[Double], Int)] =
      try {
        val bb = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        header(payload, bb).map { h =>
          val n = h.dataLen / 2
          val frames = math.min(n / h.channels, maxFrames)
          val out = new Array[Double](frames)
          var f = 0
          while (f < frames) {
            out(f) = bb.getShort(h.dataOff + 2 * f * h.channels) / 32768.0
            f += 1
          }
          (out, h.sampleRate)
        }
      } catch {
        case e: Exception => Left(s"wav decode failed: ${e.getMessage}")
      }

    def decodeFeatures(payload: Array[Byte]): Either[String, Array[Float]] =
      try {
        val bb = java.nio.ByteBuffer.wrap(payload)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        header(payload, bb) match {
          case Left(err) => Left(err)
          case Right(Header(_, channels, _, sampleRate, dataOff, dataLen)) =>
            {
              val n = dataLen / 2
              // peak/RMS/mean are sample-wise and channel-agnostic (the
              // overall mean IS the mean of the channel means), but
              // zero-crossings must follow each channel's own waveform —
              // counting sign flips across interleaved samples would mix
              // channels. One pass per channel with stride `channels`.
              var peak = 0.0
              var sum = 0.0
              var sumSq = 0.0
              var crossings = 0L
              var ch = 0
              while (ch < channels) {
                var prevSign = 0
                var i = ch
                while (i < n) {
                  val s = bb.getShort(dataOff + 2 * i) / 32768.0
                  val a = math.abs(s)
                  if (a > peak) peak = a
                  sum += s
                  sumSq += s * s
                  val sign = java.lang.Double.compare(s, 0.0)
                  if (sign != 0) {
                    if (prevSign != 0 && sign != prevSign) crossings += 1
                    prevSign = sign
                  }
                  i += channels
                }
                ch += 1
              }
              val frames = n / channels
              val durMs = frames.toDouble * 1000.0 / sampleRate
              val rms = if (n == 0) 0.0 else math.sqrt(sumSq / n)
              // crossings normalized by the transitions actually inspected:
              // frames-1 per channel
              val transitions = channels.toLong * math.max(0L, frames - 1L)
              val zcr = if (transitions == 0) 0.0
                else crossings.toDouble / transitions
              val mean = if (n == 0) 0.0 else sum / n
              Right(Array(sampleRate.toFloat, channels.toFloat, frames.toFloat,
                durMs.toFloat, peak.toFloat, rms.toFloat, zcr.toFloat,
                mean.toFloat))
            }
        }
      } catch {
        case e: Exception => Left(s"wav decode failed: ${e.getMessage}")
      }
  }

  /** REAL MP4/ISO-BMFF CONTAINER walk, pure JDK: boxes are length-prefixed
    * (`[u32 size]["ftyp"/"moov"/…]` big-endian), so duration, track count,
    * handler types, and video resolution come straight out of the
    * `moov/mvhd`, `trak/tkhd`, and `trak/mdia/{mdhd,hdlr}` boxes with no
    * frame decode. This closes the video METADATA path honestly — only
    * coded-frame decoding (h264 etc.) stays stubbed ([[StubCodec]]), since
    * no codec libs exist in this environment.
    *
    * The encoder writes the same canonical structure (fixtures + the
    * synthetic generator use it; round-trips through [[parseMeta]]).
    */
  object Mp4Codec {

    final case class Track(handler: String, width: Option[Int],
        height: Option[Int], duration_ms: Option[Long])
    final case class ContainerMeta(brand: String, duration_ms: Long,
        tracks: Seq[Track])

    private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val len = 8 + payload.map(_.length).sum
      val bb = java.nio.ByteBuffer.allocate(len) // ISO-BMFF is big-endian
      bb.putInt(len)
      bb.put(tpe.getBytes("US-ASCII"))
      payload.foreach(bb.put)
      bb.array()
    }

    private val unityMatrix: Array[Int] = Array(
      0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)

    private def mvhd(timescale: Int, duration: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(100)
      bb.putInt(0) // version 0 + flags
      bb.putInt(0).putInt(0) // creation / modification time
      bb.putInt(timescale)
      bb.putInt(duration.toInt)
      bb.putInt(0x00010000) // rate 1.0
      bb.putShort(0x0100.toShort) // volume 1.0
      bb.position(bb.position() + 10) // reserved
      unityMatrix.foreach(bb.putInt)
      bb.position(bb.position() + 24) // pre_defined
      bb.putInt(3) // next_track_ID
      bb.array()
    }

    private def tkhd(trackId: Int, duration: Long, w: Int, h: Int): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(84)
      bb.putInt(0x000007) // version 0, flags: enabled|in_movie|in_preview
      bb.putInt(0).putInt(0) // creation / modification
      bb.putInt(trackId)
      bb.putInt(0) // reserved
      bb.putInt(duration.toInt)
      bb.position(bb.position() + 8) // reserved
      bb.putShort(0).putShort(0) // layer, alternate_group
      bb.putShort(if (w == 0) 0x0100.toShort else 0) // volume (audio only)
      bb.putShort(0) // reserved
      unityMatrix.foreach(bb.putInt)
      bb.putInt(w << 16).putInt(h << 16) // 16.16 fixed point
      bb.array()
    }

    private def mdhd(timescale: Int, duration: Long): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(24)
      bb.putInt(0)
      bb.putInt(0).putInt(0)
      bb.putInt(timescale)
      bb.putInt(duration.toInt)
      bb.putShort(0x55c4.toShort) // language "und"
      bb.putShort(0)
      bb.array()
    }

    private def hdlr(handler: String, name: String): Array[Byte] = {
      // ISO 14496-12: `name` is NUL-terminated
      val nameBytes = name.getBytes("US-ASCII") :+ 0.toByte
      val bb = java.nio.ByteBuffer.allocate(24 + nameBytes.length)
      bb.putInt(0)
      bb.putInt(0) // pre_defined
      bb.put(handler.getBytes("US-ASCII"))
      bb.position(bb.position() + 12) // reserved
      bb.put(nameBytes)
      bb.array()
    }

    /** Canonical two-track (video + audio) MP4 container: movie timescale
      * 1000 (so mvhd duration IS milliseconds), 90 kHz video track, 48 kHz
      * audio track, `mdat` carrying the given (coded-frame stand-in) bytes.
      */
    def encode(durationMs: Long, width: Int, height: Int,
        mdat: Array[Byte]): Array[Byte] = {
      // version-0 boxes carry u32 time fields; the 90 kHz video mdhd is
      // the tightest (durationMs * 90 must fit) — refuse instead of
      // silently wrapping the tick count for ≥ ~13h inputs
      require(durationMs >= 0 && durationMs * 90 <= 0xFFFFFFFFL,
        s"duration ${durationMs}ms overflows version-0 box time fields")
      val ftyp = box("ftyp",
        "isom".getBytes("US-ASCII"),
        Array[Byte](0, 0, 2, 0),
        "isommp41".getBytes("US-ASCII"))
      val videoTrak = box("trak",
        box("tkhd", tkhd(1, durationMs, width, height)),
        box("mdia",
          box("mdhd", mdhd(90000, durationMs * 90)),
          box("hdlr", hdlr("vide", "VideoHandler"))))
      val audioTrak = box("trak",
        box("tkhd", tkhd(2, durationMs, 0, 0)),
        box("mdia",
          box("mdhd", mdhd(48000, durationMs * 48)),
          box("hdlr", hdlr("soun", "SoundHandler"))))
      val moov = box("moov", box("mvhd", mvhd(1000, durationMs)), videoTrak, audioTrak)
      ftyp ++ moov ++ box("mdat", mdat)
    }

    private def boxType(bb: java.nio.ByteBuffer, pos: Int): String = {
      val b = new Array[Byte](4)
      var i = 0
      while (i < 4) { b(i) = bb.get(pos + 4 + i); i += 1 }
      new String(b, "US-ASCII")
    }

    /** Child boxes inside [start, end): (type, payloadStart, payloadEnd).
      * A malformed size stops the walk (everything parsed so far stands) —
      * absolute reads, no buffer position state.
      *
      * All three ISO 14496-12 §4.2 size encodings are handled: the plain
      * u32 (read unsigned — a 2-4 GiB box must not alias to a negative
      * signed int), `size==1` (64-bit largesize follows the type; a big
      * `mdat` before `moov` is the common real-world case), and `size==0`
      * (box extends to the end of the enclosing container). Payloads live
      * in one byte array, so offsets stay under 2 GiB by construction —
      * within that, any legal size encoding walks.
      */
    private def children(bb: java.nio.ByteBuffer, start: Int,
        end: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var pos = start
      var bad = false
      while (!bad && end - pos >= 8) {
        val size32 = bb.getInt(pos).toLong & 0xffffffffL
        val (size, hdr): (Long, Int) =
          if (size32 == 1L) {
            if (end - pos < 16) (-1L, 16) else (bb.getLong(pos + 8), 16)
          } else if (size32 == 0L) ((end - pos).toLong, 8)
          else (size32, 8)
        if (size < hdr || pos.toLong + size > end) bad = true
        else {
          out += ((boxType(bb, pos), pos + hdr, (pos + size).toInt))
          pos = (pos + size).toInt
        }
      }
      out.result()
    }

    /** Version-aware (timescale, duration) out of an mvhd/mdhd payload:
      * version 1 widens the three time fields to 64 bits.
      */
    private def timescaleDuration(bb: java.nio.ByteBuffer, start: Int,
        end: Int): Option[(Long, Long)] = {
      val v = bb.get(start) & 0xff
      val (tsOff, need) = if (v == 1) (start + 4 + 16, 32) else (start + 4 + 8, 20)
      if (end - start < need) None
      else {
        val ts = bb.getInt(tsOff).toLong & 0xffffffffL
        val dur = if (v == 1) bb.getLong(tsOff + 4) else bb.getInt(tsOff + 4).toLong & 0xffffffffL
        if (ts == 0) None else Some((ts, dur))
      }
    }

    /** 16.16 fixed-point width/height out of a tkhd payload. */
    private def tkhdDims(bb: java.nio.ByteBuffer, start: Int,
        end: Int): (Option[Int], Option[Int]) = {
      val v = bb.get(start) & 0xff
      val len = if (v == 1) 96 else 84
      if (end - start < len) (None, None)
      else {
        val w = bb.getInt(start + len - 8) >>> 16
        val h = bb.getInt(start + len - 4) >>> 16
        (if (w > 0) Some(w) else None, if (h > 0) Some(h) else None)
      }
    }

    /** Walk the container and return brand, movie duration, and per-track
      * handler/dims/duration. No frame data is touched (`mdat` is skipped
      * whole) — at 100 TB this reads a few hundred header bytes per file.
      */
    def parseMeta(payload: Array[Byte]): Either[String, ContainerMeta] =
      try {
        if (payload == null || payload.length < 16) Left("truncated container")
        else {
          val bb = java.nio.ByteBuffer.wrap(payload) // big-endian default
          val top = children(bb, 0, payload.length)
          val brand = top.collectFirst { case ("ftyp", s, e) if e - s >= 4 =>
            boxType(bb, s - 4) // brand is the first 4 payload bytes
          }
          val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
          (brand, moov) match {
            case (None, _) => Left("missing ftyp box")
            case (_, None) => Left("missing moov box")
            case (Some(b), Some((ms, me))) =>
              val moovKids = children(bb, ms, me)
              val durMs = moovKids.collectFirst { case ("mvhd", s, e) =>
                timescaleDuration(bb, s, e).map { case (ts, d) => d * 1000L / ts }
              }.flatten
              val tracks = moovKids.collect { case ("trak", s, e) =>
                val kids = children(bb, s, e)
                val (w, h) = kids.collectFirst { case ("tkhd", ts, te) =>
                  tkhdDims(bb, ts, te)
                }.getOrElse((None, None))
                val mdia = kids.collectFirst { case ("mdia", ms2, me2) =>
                  children(bb, ms2, me2)
                }.getOrElse(Seq.empty)
                val handler = mdia.collectFirst {
                  case ("hdlr", hs, he) if he - hs >= 12 => boxType(bb, hs + 4)
                }.getOrElse("unkn")
                val trackDur = mdia.collectFirst { case ("mdhd", ds, de) =>
                  timescaleDuration(bb, ds, de).map { case (ts, d) => d * 1000L / ts }
                }.flatten
                Track(handler, w, h, trackDur)
              }
              durMs match {
                case None => Left("missing/invalid mvhd box")
                case Some(d) => Right(ContainerMeta(b, d, tracks))
              }
          }
        }
      } catch {
        case e: Exception => Left(s"container parse failed: ${e.getMessage}")
      }
  }

  /** Per-row container metadata, flattened for the relational side. */
  final case class ContainerInfo(media_id: Long, ok: Boolean, error: String,
      brand: String, duration_ms: Long, n_tracks: Int,
      video_width: Option[Int], video_height: Option[Int],
      handlers: Seq[String])

  /** Container-metadata extraction over media rows — the video analogue of
    * [[extractFeatures]]: header-only reads (no frame decode), corrupt rows
    * flagged not thrown. Narrow transform; payloads never shuffle.
    */
  def containerMeta(media: Dataset[MediaRow]): Dataset[ContainerInfo] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val fmt = if (r.meta == null) null else r.meta.format
        val parsed: Either[String, ContainerInfo] = fmt match {
          case "mp4" => Mp4Codec.parseMeta(r.payload).map { m =>
            val video = m.tracks.find(_.handler == "vide")
            ContainerInfo(r.media_id, ok = true, null, m.brand, m.duration_ms,
              m.tracks.size, video.flatMap(_.width), video.flatMap(_.height),
              m.tracks.map(_.handler))
          }
          case "avi" => AviCodec.parseRaw(r.payload).map { case (m, _) =>
            ContainerInfo(r.media_id, ok = true, null, "AVI ", m.durationMs,
              1, Some(m.width), Some(m.height), Seq("vids"))
          }
          case _ => Left("unsupported container format")
        }
        parsed.fold(
          err => ContainerInfo(r.media_id, ok = false, err, null, -1L, 0,
            None, None, Seq.empty),
          identity)
      }
    }
  }

  /** REAL VIDEO FRAME decode for MJPEG-in-AVI, pure JDK: the AVI container
    * is RIFF (same little-endian chunk grammar as [[WavCodec]]'s WAV), and
    * Motion-JPEG frames are plain JPEGs `ImageIO` decodes to true pixels.
    * This closes the video FRAME path for the one codec the JDK can
    * actually decode; h264-style coded frames remain [[StubCodec]]'s
    * documented stub (no codec libs in this environment).
    *
    * Layout written/walked (`RIFF('AVI ' LIST('hdrl' avih LIST('strl'
    * strh strf)) LIST('movi' 00dc...))`, all sizes little-endian):
    * `avih` carries dims + frame timing, `strh` the vids/MJPG stream
    * header with rate/scale, `movi` the per-frame JPEG chunks.
    */
  object AviCodec {

    final case class AviMeta(width: Int, height: Int, fps: Double,
        nFrames: Int, durationMs: Long)

    private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
      val pad = payload.length & 1 // RIFF chunks are word-aligned
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(id.getBytes("US-ASCII")).putInt(payload.length).put(payload)
      bb.array()
    }

    private def list(listType: String, children: Array[Byte]*): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ children.flatten)

    /** Encode pre-compressed JPEG frames as a canonical MJPEG AVI. */
    def encodeMjpeg(jpegFrames: Seq[Array[Byte]], width: Int, height: Int,
        fps: Int): Array[Byte] = {
      require(fps > 0, s"fps must be positive, got $fps")
      require(jpegFrames.nonEmpty, "at least one frame required")
      val maxFrame = jpegFrames.map(_.length).max
      val avih = {
        val bb = java.nio.ByteBuffer.allocate(56)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(1000000 / fps) // dwMicroSecPerFrame
        bb.putInt(0).putInt(0).putInt(0) // maxBytesPerSec, padding, flags
        bb.putInt(jpegFrames.size) // dwTotalFrames
        bb.putInt(0) // dwInitialFrames
        bb.putInt(1) // dwStreams
        bb.putInt(maxFrame) // dwSuggestedBufferSize
        bb.putInt(width).putInt(height)
        bb.array() // 16 reserved bytes stay zero
      }
      val strh = {
        val bb = java.nio.ByteBuffer.allocate(56)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.put("vids".getBytes("US-ASCII")).put("MJPG".getBytes("US-ASCII"))
        bb.putInt(0) // dwFlags
        bb.putShort(0).putShort(0) // priority, language
        bb.putInt(0) // dwInitialFrames
        bb.putInt(1) // dwScale
        bb.putInt(fps) // dwRate (fps = rate/scale)
        bb.putInt(0) // dwStart
        bb.putInt(jpegFrames.size) // dwLength in frames
        bb.putInt(maxFrame) // dwSuggestedBufferSize
        bb.putInt(-1) // dwQuality (default)
        bb.putInt(0) // dwSampleSize
        bb.putShort(0).putShort(0) // rcFrame left, top
        bb.putShort(width.toShort).putShort(height.toShort)
        bb.array()
      }
      val strf = {
        val bb = java.nio.ByteBuffer.allocate(40)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bb.putInt(40).putInt(width).putInt(height)
        bb.putShort(1).putShort(24) // planes, bit count
        bb.put("MJPG".getBytes("US-ASCII")) // biCompression
        bb.putInt(width * height * 3) // biSizeImage
        bb.array() // pels-per-meter / clr fields stay zero
      }
      val hdrl = list("hdrl", chunk("avih", avih),
        list("strl", chunk("strh", strh), chunk("strf", strf)))
      val movi = list("movi", jpegFrames.map(chunk("00dc", _)): _*)
      chunk("RIFF", "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi)
    }

    /** RIFF child chunks inside [start, end): (id, payloadStart,
      * payloadEnd); pad-aware advance, malformed size stops the walk.
      */
    private def chunks(bb: java.nio.ByteBuffer, start: Int,
        end: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var pos = start
      var bad = false
      while (!bad && end - pos >= 8) {
        val b = new Array[Byte](4)
        var i = 0
        while (i < 4) { b(i) = bb.get(pos + i); i += 1 }
        val size = bb.getInt(pos + 4).toLong & 0xffffffffL
        if (pos + 8 + size > end) bad = true
        else {
          out += ((new String(b, "US-ASCII"), pos + 8, (pos + 8 + size).toInt))
          pos = (pos + 8 + size + (size & 1)).toInt
        }
      }
      out.result()
    }

    private def listsOf(bb: java.nio.ByteBuffer, cs: Seq[(String, Int, Int)],
        listType: String): Seq[(Int, Int)] =
      cs.collect { case ("LIST", s, e) if e - s >= 4 &&
        boxId(bb, s) == listType => (s + 4, e) }

    private def boxId(bb: java.nio.ByteBuffer, pos: Int): String = {
      val b = new Array[Byte](4)
      var i = 0
      while (i < 4) { b(i) = bb.get(pos + i); i += 1 }
      new String(b, "US-ASCII")
    }

    /** Container walk: header metadata + the JPEG frame slices. */
    def parseRaw(payload: Array[Byte]): Either[String, (AviMeta, Seq[(Int, Int)])] =
      try {
        if (payload == null || payload.length < 24) Left("truncated container")
        else {
          val bb = java.nio.ByteBuffer.wrap(payload)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val top = chunks(bb, 0, payload.length)
          top.collectFirst { case ("RIFF", s, e) if e - s >= 4 &&
              boxId(bb, s) == "AVI " => (s + 4, e) } match {
            case None => Left("not an AVI RIFF payload")
            case Some((rs, re)) =>
              val kids = chunks(bb, rs, re)
              val hdrl = listsOf(bb, kids, "hdrl")
              val avih = hdrl.flatMap { case (s, e) =>
                chunks(bb, s, e).collectFirst {
                  case ("avih", as, ae) if ae - as >= 40 => (as, ae) }
              }.headOption
              avih match {
                case None => Left("missing avih header")
                case Some((as, _)) =>
                  val w = bb.getInt(as + 32)
                  val h = bb.getInt(as + 36)
                  // fps from the vids strh (rate/scale); fall back to
                  // avih's micro-seconds-per-frame
                  val strhFps = hdrl.flatMap { case (s, e) =>
                    val hk = chunks(bb, s, e)
                    listsOf(bb, hk, "strl").flatMap { case (ls, le) =>
                      chunks(bb, ls, le).collect {
                        case ("strh", ss, se) if se - ss >= 32 &&
                            boxId(bb, ss) == "vids" =>
                          val scale = bb.getInt(ss + 20)
                          val rate = bb.getInt(ss + 24)
                          if (scale > 0 && rate > 0) Some(rate.toDouble / scale)
                          else None
                      }.flatten
                    }
                  }.headOption
                  val uspf = bb.getInt(as)
                  val fps = strhFps.getOrElse(
                    if (uspf > 0) 1000000.0 / uspf else 0.0)
                  if (w <= 0 || h <= 0) Left(s"invalid dimensions ${w}x$h")
                  else if (fps <= 0) Left("invalid frame timing")
                  else {
                    val frames = listsOf(bb, kids, "movi").flatMap {
                      case (s, e) => chunks(bb, s, e).collect {
                        case (id, fs, fe) if id == "00dc" || id == "00db" =>
                          (fs, fe)
                      }
                    }
                    if (frames.isEmpty) Left("no frame chunks")
                    else {
                      val durMs = math.round(frames.size * 1000.0 / fps)
                      Right((AviMeta(w, h, fps, frames.size, durMs), frames))
                    }
                  }
              }
          }
        }
      } catch {
        case e: Exception => Left(s"avi parse failed: ${e.getMessage}")
      }

    /** True frame decode: every MJPEG frame through ImageIO. Features:
      * [width, height, nFrames, duration ms, fps, mean frame luminance,
      * min frame luminance, max frame luminance] — the last three are real
      * pixel statistics averaged per frame.
      */
    /** Decode one frame slice in place (no byte copy). ImageIO throws
      * (not null) on e.g. corrupt Huffman tables — either way the caller
      * gets null and flags the row, never the task.
      */
    private[multimodal] def decodeFrame(payload: Array[Byte], s: Int,
        e: Int): java.awt.image.BufferedImage =
      try javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload, s, e - s))
      catch { case _: Exception => null }

    def decodeFeatures(payload: Array[Byte]): Either[String, Array[Float]] =
      parseRaw(payload).flatMap { case (meta, slices) =>
        var sumLum = 0.0
        var minLum = Double.MaxValue
        var maxLum = Double.MinValue
        var badFrame = -1
        var i = 0
        while (badFrame < 0 && i < slices.size) {
          val (s, e) = slices(i)
          val img = decodeFrame(payload, s, e)
          if (img == null) badFrame = i
          else {
            val frameLum = Multimodal.meanLuma(img)
            sumLum += frameLum
            if (frameLum < minLum) minLum = frameLum
            if (frameLum > maxLum) maxLum = frameLum
            i += 1
          }
        }
        if (badFrame >= 0) Left(s"frame $badFrame undecodable")
        else Right(Array(meta.width.toFloat, meta.height.toFloat,
          meta.nFrames.toFloat, meta.durationMs.toFloat, meta.fps.toFloat,
          (sumLum / meta.nFrames).toFloat, minLum.toFloat, maxLum.toFloat))
      }
  }

  /** STUB CODEC — deterministic fake standing in for VIDEO decoding (and
    * compressed audio like opus; no such codec libs in this container —
    * images decode for real via [[ImageCodec]], WAV audio via
    * [[WavCodec]]). Produces an 8-dim feature from payload bytes; a real
    * implementation would decode frames here. The contract (bytes + meta
    * in → fixed-width float features out, corrupt rows flagged not thrown)
    * is the real one.
    */
  object StubCodec {
    val FEATURE_DIM: Int = Multimodal.FEATURE_DIM

    def decodeFeatures(payload: Array[Byte]): Either[String, Array[Float]] =
      Right {
        // a real sample/frame decoder goes here — stub: banded byte stats
        val f = new Array[Float](FEATURE_DIM)
        var i = 0
        while (i < payload.length) {
          f(i % FEATURE_DIM) += (payload(i) & 0xff) / 255.0f
          i += 1
        }
        val n = math.max(1, payload.length / FEATURE_DIM)
        f.map(_ / n)
      }
  }

  /** Decode dispatch: validation, then the per-modality kernel. */
  def decodeFeatures(payload: Array[Byte], meta: MediaMeta): Either[String, Array[Float]] =
    if (payload == null || payload.isEmpty) Left("empty payload")
    else if (meta == null || meta.media_type == null) Left("missing metadata")
    else meta.media_type match {
      case "image" => ImageCodec.decodeFeatures(payload)
      case "audio" if meta.format == "wav" => WavCodec.decodeFeatures(payload)
      case "video" if meta.format == "avi" => AviCodec.decodeFeatures(payload)
      case _ => StubCodec.decodeFeatures(payload)
    }

  /** Feature extraction over media rows: one codec "session" per partition,
    * rows streamed through it (mapInPandas batch shape on the JVM).
    * Corrupt/null rows become flagged rows, not task failures (DLQ-able
    * downstream, S12 pattern).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[DecodedFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would happen here (expensive in real life)
      rows.map { r =>
        decodeFeatures(r.payload, r.meta) match {
          case Right(f) => DecodedFeatures(r.media_id, ok = true, null, f)
          case Left(err) => DecodedFeatures(r.media_id, ok = false, err, Array.empty)
        }
      }
    }
  }

  /** Resize planner: partitions media by target bucket so one partition
    * handles one output geometry (codec state reuse); the resize kernel is
    * stubbed as a metadata rewrite.
    */
  def resizePlan(media: DataFrame, targetW: Int, targetH: Int): DataFrame =
    media
      .withColumn("target_width", lit(targetW))
      .withColumn("target_height", lit(targetH))
      .withColumn("scale_x",
        col("meta.width").cast("double") / targetW)
      .withColumn("scale_y",
        col("meta.height").cast("double") / targetH)
      .filter(col("meta.media_type").isin("image", "video"))

  /** Frame sampling for video: explode a deterministic frame index grid
    * (every `everyMs` ms of duration) — the Spark-side plumbing of frame
    * extraction; the grab itself is the stub codec's job.
    */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media
      .filter(col("meta.media_type") === "video")
      .withColumn("frame_ts_ms",
        explode(sequence(lit(0L), col("meta.duration_ms"), lit(everyMs))))
      .select(col("media_id"), col("frame_ts_ms"), col("meta.format").as("format"))

  /** Rec.709 mean luminance of a decoded frame, normalized to [0, 1].
    * Double pixel-count math: a max-size JPEG (65535²) overflows an Int
    * pixel product.
    */
  private[multimodal] def meanLuma(img: java.awt.image.BufferedImage): Double = {
    var s = 0.0
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = img.getRGB(x, y)
        s += (0.2126 * ((rgb >> 16) & 0xff) +
          0.7152 * ((rgb >> 8) & 0xff) +
          0.0722 * (rgb & 0xff)) / 255.0
        x += 1
      }
      y += 1
    }
    s / (img.getWidth.toDouble * img.getHeight)
  }

  final case class SampledFrame(media_id: Long, ok: Boolean, error: String,
      frame_idx: Int, ts_ms: Long, width: Int, height: Int, mean_luma: Double)

  /** REAL frame sampling for MJPEG-in-AVI: walk the container's frame
    * index ([[AviCodec.parseRaw]]), decode only every `everyK`-th frame
    * through ImageIO, and emit per-frame geometry + mean luminance — the
    * executed counterpart of [[frameSamplePlan]]'s grid staging.
    * Sampling at the INDEX level is the point at scale: a 1-in-30 sample
    * pays 1/30th of the JPEG decode, because frame boundaries come from
    * the chunk walk, not from decoding. Non-AVI video (coded-frame
    * containers like mp4/h264 — no codec libs in this environment) and
    * null-metadata rows emit one `ok = false` row each, mirroring
    * [[containerMeta]]'s flag-don't-drop contract. One shuffle-free
    * `mapPartitions` pass.
    */
  def frameSample(media: Dataset[MediaRow], everyK: Int): Dataset[SampledFrame] = {
    require(everyK >= 1, s"everyK must be >= 1, got $everyK")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(r => r.meta == null || r.meta.media_type == "video")
        .flatMap { r =>
          if (r.meta == null)
            Iterator.single(SampledFrame(r.media_id, ok = false,
              "missing metadata", -1, -1L, 0, 0, 0.0))
          else if (r.meta.format != "avi")
            Iterator.single(SampledFrame(r.media_id, ok = false,
              s"unsupported container format ${r.meta.format} (no codec libs)",
              -1, -1L, 0, 0, 0.0))
          else AviCodec.parseRaw(r.payload) match {
            case Left(err) =>
              Iterator.single(SampledFrame(r.media_id, ok = false, err,
                -1, -1L, 0, 0, 0.0))
            case Right((meta, frames)) =>
              frames.iterator.zipWithIndex
                .filter { case (_, i) => i % everyK == 0 }
                .map { case ((off, end), i) =>
                  val img = AviCodec.decodeFrame(r.payload, off, end)
                  if (img == null)
                    SampledFrame(r.media_id, ok = false,
                      s"undecodable frame $i", i, -1L, 0, 0, 0.0)
                  else
                    SampledFrame(r.media_id, ok = true, "", i,
                      math.round(i * 1000.0 / meta.fps),
                      img.getWidth, img.getHeight, meanLuma(img))
                }
          }
        }
    }
  }

  final case class ResizedImage(media_id: Long, ok: Boolean, error: String,
      payload: Array[Byte], width: Int, height: Int)

  /** REAL image resize, pure JDK: aspect-preserving scale so the longer
    * edge lands on `maxDim` (the standard training-data normalization —
    * CLIP-style preprocessing scales then crops; the scale half is
    * what's expressible without a model contract), bilinear
    * interpolation via `Graphics2D`, re-encoded PNG. Upscaling is
    * refused (a dataset normalizer shrinks; inventing pixels is a
    * training-data bug), so images already inside the budget pass
    * through byte-identical.
    *
    * Scale shape: one `mapPartitions` over the media rows — per-image
    * O(pixels) work, no shuffle, the partition-parallel kernel
    * [[resizePlan]] stages geometry for.
    */
  def resizeImages(media: Dataset[MediaRow], maxDim: Int): Dataset[ResizedImage] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.filter(r => r.meta == null || r.meta.media_type == "image").map { r =>
        if (r.meta == null)
          ResizedImage(r.media_id, ok = false, "missing metadata",
            Array.emptyByteArray, 0, 0)
        else try {
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          if (img == null) ResizedImage(r.media_id, ok = false,
            "undecodable image", Array.emptyByteArray, 0, 0)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val longer = math.max(w, h)
            if (longer <= maxDim)
              ResizedImage(r.media_id, ok = true, "", r.payload, w, h)
            else {
              val scale = maxDim.toDouble / longer
              val (nw, nh) = (math.max(1, math.round(w * scale).toInt),
                math.max(1, math.round(h * scale).toInt))
              val out = new java.awt.image.BufferedImage(nw, nh,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              try {
                g.setRenderingHint(
                  java.awt.RenderingHints.KEY_INTERPOLATION,
                  java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
                // source may carry alpha (ARGB PNG); the RGB canvas is
                // all-zero, so composite over an explicit white fill or
                // transparent regions silently become black pixels
                g.setColor(java.awt.Color.WHITE)
                g.fillRect(0, 0, nw, nh)
                g.drawImage(img, 0, 0, nw, nh, null)
              } finally g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              ResizedImage(r.media_id, ok = true, "", bos.toByteArray, nw, nh)
            }
          }
        } catch {
          case e: Exception => ResizedImage(r.media_id, ok = false,
            s"resize failed: ${e.getMessage}", Array.emptyByteArray, 0, 0)
        }
      }
    }
  }
}
