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

  test("size==1 largesize and size==0 extends-to-end boxes parse") {
    // Rebuild a valid container so its mdat sits BEFORE moov and uses the
    // 64-bit largesize encoding ([u32 1][type][u64 size]) — the standard
    // layout of a real capture where mdat can exceed 4 GiB (ISO 14496-12
    // §4.2). Earlier rounds stopped the walk at size==1 and reported
    // "missing moov" despite intact metadata.
    val good = Multimodal.Mp4Codec.encode(5000L, 320, 240,
      Array.tabulate[Byte](64)(_.toByte))
    def boxes(payload: Array[Byte]): Seq[(String, Array[Byte])] = {
      var pos = 0
      val out = Seq.newBuilder[(String, Array[Byte])]
      while (pos < payload.length) {
        val size = java.nio.ByteBuffer.wrap(payload, pos, 4).getInt
        out += ((new String(payload, pos + 4, 4, "US-ASCII"),
          java.util.Arrays.copyOfRange(payload, pos + 8, pos + size)))
        pos += size
      }
      out.result()
    }
    val parts = boxes(good).toMap
    def large(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(16 + payload.length)
      bb.putInt(1).put(tpe.getBytes("US-ASCII")).putLong(16L + payload.length)
      bb.put(payload).array()
    }
    def plain(tpe: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(tpe.getBytes("US-ASCII"))
      bb.put(payload).array()
    }
    val rearranged = plain("ftyp", parts("ftyp")) ++
      large("mdat", parts("mdat")) ++ plain("moov", parts("moov"))
    val m = Multimodal.Mp4Codec.parseMeta(rearranged)
      .getOrElse(fail("largesize mdat before moov must parse"))
    assert(m.brand === "isom" && m.duration_ms === 5000L)
    assert(m.tracks.map(_.handler).sorted === Seq("soun", "vide"))

    // size==0: the final box extends to the end of the file
    val zeroTail = plain("ftyp", parts("ftyp")) ++
      plain("moov", parts("moov")) ++ {
        val bb = java.nio.ByteBuffer.allocate(8 + parts("mdat").length)
        bb.putInt(0).put("mdat".getBytes("US-ASCII")).put(parts("mdat")).array()
      }
    val m0 = Multimodal.Mp4Codec.parseMeta(zeroTail)
      .getOrElse(fail("size==0 trailing mdat must parse"))
    assert(m0.duration_ms === 5000L)
    // a size==0 box that is NOT last swallows everything after it — the
    // spec-mandated reading; moov inside the swallowed range is not seen
    val zeroFirst = plain("ftyp", parts("ftyp")) ++ {
      val bb = java.nio.ByteBuffer.allocate(8 + parts("mdat").length)
      bb.putInt(0).put("mdat".getBytes("US-ASCII")).put(parts("mdat")).array()
    } ++ plain("moov", parts("moov"))
    assert(Multimodal.Mp4Codec.parseMeta(zeroFirst) ===
      Left("missing moov box"))
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
