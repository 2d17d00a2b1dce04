package graft.multimodal

import graft.SparkSpec
import scala.util.Random

/** Seeded generative fuzz for the MP4 container codec (same discipline as
  * the Avro codec's 500-case fuzz): every encodable (duration, w, h,
  * mdat) round-trips exactly, and arbitrary truncation/corruption of a
  * valid container is always a `Left`, never a throw — the corrupt-row
  * routing the Spark operator relies on.
  */
class Mp4PropertySpec extends SparkSpec {

  private val rng = new Random(0xC0DEC)

  test("200-case encode/parse round trip over random metadata") {
    (1 to 200).foreach { i =>
      val durMs = 1L + rng.nextInt(47721858) // v0 ceiling: durMs*90 < 2^32
      val w = 16 + rng.nextInt(4080)
      val h = 16 + rng.nextInt(2160)
      val mdat = Array.fill[Byte](rng.nextInt(256))(rng.nextInt().toByte)
      val m = Multimodal.Mp4Codec.parseMeta(
        Multimodal.Mp4Codec.encode(durMs, w, h, mdat)) match {
        case Right(v) => v
        case Left(err) => fail(s"case $i (dur=$durMs w=$w h=$h): $err")
      }
      assert(m.brand === "isom" && m.duration_ms === durMs, s"case $i")
      val vide = m.tracks.find(_.handler == "vide").get
      assert(vide.width === Some(w) && vide.height === Some(h), s"case $i")
      assert(vide.duration_ms === Some(durMs), s"case $i")
      assert(m.tracks.map(_.handler).sorted === Seq("soun", "vide"), s"case $i")
    }
  }

  test("encode refuses durations that would wrap version-0 time fields") {
    intercept[IllegalArgumentException] {
      Multimodal.Mp4Codec.encode(48000000L, 64, 48, Array[Byte](1)) // ~13.3h
    }
    intercept[IllegalArgumentException] {
      Multimodal.Mp4Codec.encode(-1L, 64, 48, Array[Byte](1))
    }
  }

  test("300-case truncation/corruption fuzz: always Left, never a throw") {
    val good = Multimodal.Mp4Codec.encode(5000L, 320, 240,
      Array.tabulate[Byte](64)(_.toByte))
    (1 to 300).foreach { i =>
      val mutated: Array[Byte] = rng.nextInt(3) match {
        case 0 => // truncate at a random point
          java.util.Arrays.copyOfRange(good, 0, rng.nextInt(good.length))
        case 1 => // flip bytes in the box structure region
          val b = good.clone()
          (1 to 4).foreach(_ => b(rng.nextInt(b.length)) = rng.nextInt().toByte)
          b
        case _ => // random garbage of plausible length
          Array.fill[Byte](rng.nextInt(128))(rng.nextInt().toByte)
      }
      // must not throw; Right is acceptable when the mutation missed the
      // metadata boxes (mdat flips), Left with a reason otherwise
      Multimodal.Mp4Codec.parseMeta(mutated) match {
        case Right(m) => assert(m.brand != null, s"case $i")
        case Left(err) => assert(err.nonEmpty, s"case $i")
      }
    }
  }
}
