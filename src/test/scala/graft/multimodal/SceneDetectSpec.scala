package graft.multimodal

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

/** Scene detection over a synthesized two-shot MJPEG AVI: exactly one
  * boundary at the cut, and the segment table splits the video there.
  */
class SceneDetectSpec extends SparkSpec {

  private def jpg(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  private def gradientImg: BufferedImage = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val v = x * 4 % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def checkerImg: BufferedImage = {
    val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val on = ((x / 8) + (y / 8)) % 2 == 0
      img.setRGB(x, y, if (on) 0xffffff else 0x000000)
    }
    img
  }

  private def twoShotAvi: Array[Byte] = {
    val a = jpg(gradientImg)
    val b = jpg(checkerImg)
    Multimodal.AviCodec.encodeMjpeg(
      Seq(a, a, a, a, a, b, b, b, b, b), 64, 64, fps = 10)
  }

  test("one cut yields one boundary and two segments") {
    import spark.implicits._
    val payload = twoShotAvi
    val media = spark.createDataset(Seq(Multimodal.MediaRow(7L, payload,
      Multimodal.MediaMeta("video", "avi", Some(64), Some(64), Some(1000L),
        payload.length.toLong))))
    val bounds = SceneDetect.sceneChanges(media).collect()
    assert(bounds.length === 1, s"expected one cut, got ${bounds.toSeq}")
    assert(bounds(0).getLong(0) === 7L && bounds(0).getInt(1) === 5,
      s"cut must land at frame 5: ${bounds(0)}")
    assert(bounds(0).getInt(2) >= 16)
    val segs = SceneDetect.segments(media).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(segs.toSeq === Seq((0L, 0L, 4L), (1L, 5L, 9L)),
      s"two shots must split at the cut: ${segs.toSeq}")
  }

  test("a single-shot video has no boundaries and one full segment") {
    import spark.implicits._
    val a = jpg(gradientImg)
    val payload = Multimodal.AviCodec.encodeMjpeg(Seq(a, a, a, a), 64, 64, 10)
    val media = spark.createDataset(Seq(Multimodal.MediaRow(8L, payload,
      Multimodal.MediaMeta("video", "avi", Some(64), Some(64), Some(400L),
        payload.length.toLong))))
    assert(SceneDetect.sceneChanges(media).collect().isEmpty)
    val segs = SceneDetect.segments(media).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(segs.toSeq === Seq((0L, 0L, 3L)))
  }
}
