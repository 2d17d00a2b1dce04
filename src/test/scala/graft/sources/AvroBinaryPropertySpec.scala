package graft.sources

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.{Arbitrary, Gen}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Generative round-trip coverage for the Avro binary codec: random flat
  * schemas over the envelope-subset types, random values (including
  * nulls, empty strings/arrays, extreme numerics), and random framed ids
  * — pure JVM, no Spark session, hundreds of cases per run. Sampled from
  * scalacheck Gens under a FIXED seed so failures reproduce exactly.
  */
class AvroBinaryPropertySpec extends AnyFunSuite {

  /** n deterministic samples from a Gen (seed-chained). */
  private def samples[T](gen: Gen[T], n: Int, seed0: Long): Seq[T] = {
    var seed = Seed(seed0)
    (0 until n).flatMap { _ =>
      val v = gen.apply(Gen.Parameters.default, seed)
      seed = seed.next
      v
    }
  }

  private val fieldTypes: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, StringType, DoubleType, FloatType, BooleanType, BinaryType)

  private val schemaGen: Gen[StructType] = for {
    n <- Gen.choose(1, 10)
    types <- Gen.listOfN(n, fieldTypes)
    nullable <- Gen.listOfN(n, Arbitrary.arbitrary[Boolean])
  } yield StructType(types.zip(nullable).zipWithIndex.map {
    case ((t, nl), i) => StructField(s"f$i", t, nl)
  })

  private def valueGen(dt: DataType): Gen[Any] = dt match {
    case LongType => Gen.oneOf(Arbitrary.arbitrary[Long],
      Gen.oneOf(0L, -1L, Long.MinValue, Long.MaxValue))
    case IntegerType => Arbitrary.arbitrary[Int]
    case StringType => Gen.oneOf(
      Gen.const(""), Arbitrary.arbitrary[String], Gen.alphaNumStr)
    case DoubleType => Gen.oneOf(
      Arbitrary.arbitrary[Double],
      Gen.oneOf(Double.NaN, Double.PositiveInfinity, Double.MinValue, -0.0))
    case FloatType => Arbitrary.arbitrary[Float]
    case BooleanType => Arbitrary.arbitrary[Boolean]
    case BinaryType => Gen.listOf(Arbitrary.arbitrary[Byte]).map(_.toArray)
    case other => throw new IllegalArgumentException(s"unhandled $other")
  }

  private def rowGen(schema: StructType): Gen[Row] =
    Gen.sequence[Seq[Any], Any](schema.fields.toSeq.map { f =>
      if (f.nullable) Gen.frequency(1 -> Gen.const(null), 4 -> valueGen(f.dataType))
      else valueGen(f.dataType)
    }).map(Row.fromSeq)

  // Array[Byte] equality is reference-based; NaN needs bit comparison
  private def sameRow(a: Row, b: Row, schema: StructType): Boolean =
    schema.fields.indices.forall { i =>
      (a.get(i), b.get(i)) match {
        case (null, null) => true
        case (x: Array[Byte], y: Array[Byte]) => java.util.Arrays.equals(x, y)
        case (x: Double, y: Double) => java.lang.Double.compare(x, y) == 0
        case (x: Float, y: Float) => java.lang.Float.compare(x, y) == 0
        case (x, y) => x == y
      }
    }

  test("200 random schema+row cases round-trip bit-exactly") {
    samples(schemaGen.flatMap(s => rowGen(s).map(s -> _)), 200, 42L)
      .foreach { case (schema, row) =>
        val back = AvroBinary.decodeRow(
          AvroBinary.encodeRow(row, schema), schema, schema)
        assert(sameRow(row, back, schema),
          s"round-trip mismatch\nschema: ${schema.simpleString}\nin:  $row\nout: $back")
      }
  }

  test("150 random OCF container cases round-trip through both codecs") {
    // whole-file fuzz: random schema, random row multiset, random block
    // size and codec — the container framing (metadata map, sync markers,
    // block boundaries) must round-trip whatever the record codec does
    val gen = for {
      schema <- schemaGen
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, rowGen(schema))
      blockRecords <- Gen.choose(1, 25)
      codec <- Gen.oneOf("null", "deflate")
    } yield (schema, rows, blockRecords, codec)
    samples(gen, 150, 1234L).foreach { case (schema, rows, blockRecords, codec) =>
      val payload = AvroOcf.write(rows, schema, codec, blockRecords)
      val (writer, back) = AvroOcf.read(payload, schema)
      assert(writer.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq
        === schema.fields.map(f => (f.name, f.dataType, f.nullable)).toSeq)
      assert(back.length === rows.length,
        s"row count mismatch (codec=$codec blocks=$blockRecords)")
      rows.zip(back).foreach { case (a, b) =>
        assert(sameRow(a, b, schema),
          s"OCF round-trip mismatch (codec=$codec)\nschema: ${schema.simpleString}\nin:  $a\nout: $b")
      }
    }
  }

  test("random framed messages preserve the schema id and body") {
    val gen = for {
      id <- Gen.choose(Int.MinValue, Int.MaxValue)
      body <- Gen.listOf(Arbitrary.arbitrary[Byte]).map(_.toArray)
    } yield (id, body)
    samples(gen, 200, 7L).foreach { case (id, body) =>
      val (backId, backBody) = AvroBinary.unframe(AvroBinary.frame(id, body))
      assert(backId === id && java.util.Arrays.equals(backBody, body))
    }
  }

  test("BACKWARD resolution holds for droppers/wideners on random rows") {
    val base = StructType(Seq(
      StructField("a", IntegerType, nullable = false),
      StructField("b", FloatType, nullable = true),
      StructField("c", StringType, nullable = true)))
    val readers = Seq(
      StructType(base.fields.map(f =>
        if (f.name == "a") f.copy(dataType = LongType) else f)), // widen int->long
      StructType(base.fields.filter(_.name != "c")), // drop a field
      StructType(base.fields :+ StructField("d", DoubleType, nullable = true))) // add nullable
    samples(rowGen(base), 100, 99L).foreach { row =>
      readers.foreach { r =>
        val out = AvroBinary.decodeRow(AvroBinary.encodeRow(row, base), base, r)
        r.fields.zipWithIndex.foreach { case (f, i) =>
          (f.name, f.dataType) match {
            case ("a", LongType) => assert(out.getLong(i) === row.getInt(0).toLong)
            case ("a", _) => assert(out.getInt(i) === row.getInt(0))
            case ("d", _) => assert(out.isNullAt(i))
            case _ => ()
          }
        }
      }
    }
  }
}
