package graft.multimodal

import graft.SparkSpec
import scala.util.Random

/** MJPEG-in-AVI: the one video format whose FRAMES the JDK can truly
  * decode (RIFF container walk + ImageIO per frame). Same discipline as
  * the MP4 codec's fuzz: seeded round-trips must recover the real frame
  * pixels, and arbitrary corruption is always a `Left`, never a throw.
  */
class AviPropertySpec extends SparkSpec {

  private val rng = new Random(0xA71)

  private def grayFrame(w: Int, h: Int, level: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (level << 16) | (level << 8) | level); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  test("100-case encode/decode round trip: container meta and true pixel stats") {
    (1 to 100).foreach { i =>
      val w = 16 * (1 + rng.nextInt(6))
      val h = 16 * (1 + rng.nextInt(4))
      val fps = 1 + rng.nextInt(30)
      val levels = (0 until 1 + rng.nextInt(8)).map(_ => rng.nextInt(256))
      val avi = Multimodal.AviCodec.encodeMjpeg(
        levels.map(grayFrame(w, h, _)), w, h, fps)
      val f = Multimodal.AviCodec.decodeFeatures(avi) match {
        case Right(v) => v
        case Left(err) => fail(s"case $i (${w}x$h fps=$fps): $err")
      }
      assert(f(0) === w.toFloat && f(1) === h.toFloat, s"case $i dims")
      assert(f(2) === levels.size.toFloat, s"case $i frame count")
      assert(f(3) === math.round(levels.size * 1000.0 / fps).toFloat, s"case $i duration")
      assert(f(4) === fps.toFloat, s"case $i fps")
      // true pixel statistics: a flat gray frame's luminance is its level;
      // JPEG is lossy, so allow a small quantization tolerance
      val exp = levels.map(_ / 255.0)
      assert(math.abs(f(5) - exp.sum / exp.size) < 0.02, s"case $i mean lum")
      assert(math.abs(f(6) - exp.min) < 0.02, s"case $i min lum")
      assert(math.abs(f(7) - exp.max) < 0.02, s"case $i max lum")
    }
  }

  test("300-case truncation/corruption fuzz: always Left or valid, never a throw") {
    val good = Multimodal.AviCodec.encodeMjpeg(
      (0 until 4).map(f => grayFrame(48, 32, 40 + f * 50)), 48, 32, 10)
    (1 to 300).foreach { i =>
      val mutated: Array[Byte] = rng.nextInt(3) match {
        case 0 => java.util.Arrays.copyOfRange(good, 0, rng.nextInt(good.length))
        case 1 =>
          val b = good.clone()
          (1 to 4).foreach(_ => b(rng.nextInt(b.length)) = rng.nextInt().toByte)
          b
        case _ => Array.fill[Byte](rng.nextInt(128))(rng.nextInt().toByte)
      }
      Multimodal.AviCodec.decodeFeatures(mutated) match {
        case Right(f) => assert(f.length === Multimodal.FEATURE_DIM, s"case $i")
        case Left(err) => assert(err.nonEmpty, s"case $i")
      }
    }
  }

  test("avi frames flow through the Spark decode path with real stats") {
    val media = Multimodal.syntheticMjpegAvi(spark, 60)
    val metaById = media.collect().map(r => r.media_id -> r.meta).toMap
    val decoded = Multimodal.extractFeatures(media).collect()
    assert(decoded.length === 60 && decoded.forall(_.ok))
    decoded.foreach { d =>
      val m = metaById(d.media_id)
      assert(d.feature(0) === m.width.get.toFloat, s"width of ${d.media_id}")
      assert(d.feature(1) === m.height.get.toFloat, s"height of ${d.media_id}")
      assert(d.feature(2) === (d.media_id % 6 + 2).toFloat, s"frames of ${d.media_id}")
      assert(d.feature(3) === m.duration_ms.get.toFloat, s"duration of ${d.media_id}")
      // luminance stats are true pixel reads in [0,1], min <= mean <= max
      assert(d.feature(6) <= d.feature(5) && d.feature(5) <= d.feature(7))
      assert(d.feature(5) > 0f && d.feature(5) < 1f)
    }
    // determinism across partitionings (JPEG decode of fixed bytes)
    val a = Multimodal.extractFeatures(media).filter(_.media_id == 7).head().feature
    val b = Multimodal.extractFeatures(media.repartition(7))
      .filter(_.media_id == 7).head().feature
    assert(a.toSeq === b.toSeq)

    // container walk reports the AVI geometry through containerMeta too
    val walked = Multimodal.containerMeta(media).collect()
    assert(walked.forall(_.ok))
    walked.foreach { c =>
      val m = metaById(c.media_id)
      assert(c.brand === "AVI " && c.handlers === Seq("vids"))
      assert(c.video_width === m.width && c.video_height === m.height)
      assert(c.duration_ms === m.duration_ms.get)
    }
  }
}
