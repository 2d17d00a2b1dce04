package graft.sources

import graft.SparkSpec
import graft.cdc.Cdc
import org.apache.spark.sql.{Encoders, Row}
import org.apache.spark.sql.types._

/** S3 wire coverage: Avro binary round-trips for all four CDC envelope
  * schemas, BACKWARD schema-resolution across registry versions, and the
  * Confluent-style framed produce→consume path through a registry —
  * mirroring the reference's evolution validation
  * (`task9-validate-cdc.sh:295-420`).
  */
class AvroBinarySpec extends SparkSpec {

  private def sampleRow(schema: StructType, seed: Long): Row =
    Row.fromSeq(schema.fields.toSeq.zipWithIndex.map { case (f, i) =>
      f.dataType match {
        case LongType => seed + i
        case IntegerType => (seed + i).toInt
        case StringType => s"s$seed-$i"
        case DoubleType => seed * 1.5 + i
        case FloatType => (seed * 0.5 + i).toFloat
        case BooleanType => (seed + i) % 2 == 0
        case BinaryType => Array[Byte](seed.toByte, i.toByte)
        case other => fail(s"unhandled $other")
      }
    })

  test("encode/decode round-trips every envelope schema bit-exactly") {
    Cdc.envelopeSchemas.foreach { case (subject, schema) =>
      (0 until 5).foreach { i =>
        val row = sampleRow(schema, i.toLong * 97)
        val back = AvroBinary.decodeRow(
          AvroBinary.encodeRow(row, schema), schema, schema)
        assert(back === row, s"round-trip mismatch for $subject")
      }
    }
  }

  test("nullable fields encode as unions; null survives the round-trip") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("email", StringType, nullable = true),
      StructField("balance", DoubleType, nullable = true)))
    val row = Row(7L, null, 12.5)
    val back = AvroBinary.decodeRow(AvroBinary.encodeRow(row, schema), schema, schema)
    assert(back === row)
  }

  test("BACKWARD resolution: added nullable field, dropped field, widening") {
    val v1 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("qty", IntegerType, nullable = true),
      StructField("legacy_code", StringType, nullable = true)))
    val v2 = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("qty", LongType, nullable = true), // int -> long widening
      StructField("note", StringType, nullable = true))) // added nullable
    // legacy_code dropped
    assert(SchemaRegistry.isBackwardCompatible(v1, v2))
    val oldBytes = AvroBinary.encodeRow(Row(3L, 9, "old"), v1)
    val asV2 = AvroBinary.decodeRow(oldBytes, writer = v1, reader = v2)
    assert(asV2 === Row(3L, 9L, null))
  }

  test("framed produce -> registry lookup -> consume, across two versions") {
    import Cdc.usersEnvelopeSchema
    val reg = new SchemaRegistry.Registry
    assert(reg.register("users-value", usersEnvelopeSchema) === Right(1))
    val v2 = StructType(usersEnvelopeSchema.fields :+
      StructField("loyalty_tier", StringType, nullable = true))
    assert(reg.register("users-value", v2) === Right(2))
    val id1 = reg.globalId("users-value", 1).get
    val id2 = reg.globalId("users-value", 2).get

    // a topic carrying a mix of writer versions
    val rowsV1 = (0 until 3).map(i => sampleRow(usersEnvelopeSchema, i.toLong))
    val rowsV2 = (0 until 2).map { i =>
      Row.fromSeq(sampleRow(usersEnvelopeSchema, 100L + i).toSeq :+ s"tier$i")
    }
    val messages =
      rowsV1.map(r => AvroBinary.frame(id1, AvroBinary.encodeRow(r, usersEnvelopeSchema))) ++
        rowsV2.map(r => AvroBinary.frame(id2, AvroBinary.encodeRow(r, v2)))

    // consumer reads EVERYTHING under the latest schema via registry lookup
    val ds = spark.createDataset(messages)(Encoders.BINARY)
    val decoded = AvroBinary.decode(ds, v2, id => reg.schemaById(id).get)
      .orderBy("id").collect()
    assert(decoded.length === 5)
    assert(decoded.take(3).forall(_.isNullAt(v2.length - 1)),
      "v1-written rows must surface null loyalty_tier")
    assert(decoded.drop(3).map(_.getString(v2.length - 1)).toSeq ===
      Seq("tier0", "tier1"))
    // schema ids resolve to what was registered
    assert(reg.schemaById(id1).get === usersEnvelopeSchema)
    assert(reg.schemaById(id2).get === v2)
  }

  test("wire framing is magic byte + big-endian id + body") {
    val body = Array[Byte](1, 2, 3)
    val framed = AvroBinary.frame(0x01020304, body)
    assert(framed.take(5).toSeq === Seq[Byte](0, 1, 2, 3, 4))
    val (id, back) = AvroBinary.unframe(framed)
    assert(id === 0x01020304 && back.toSeq === body.toSeq)
  }

  test("zigzag varints match the Avro reference encodings") {
    // spec examples: 0->00, -1->01, 1->02, -2->03, 2->04, -64->7f, 64->80 01
    def enc(n: Long): Seq[Int] = {
      val s = StructType(Seq(StructField("x", LongType, nullable = false)))
      AvroBinary.encodeRow(Row(n), s).map(_ & 0xff).toSeq
    }
    assert(enc(0L) === Seq(0x00))
    assert(enc(-1L) === Seq(0x01))
    assert(enc(1L) === Seq(0x02))
    assert(enc(-2L) === Seq(0x03))
    assert(enc(2L) === Seq(0x04))
    assert(enc(-64L) === Seq(0x7f))
    assert(enc(64L) === Seq(0x80, 0x01))
    assert(enc(Long.MaxValue).length === 10)
    // and they decode back
    Seq(0L, -1L, 1L, Long.MaxValue, Long.MinValue, 123456789L).foreach { n =>
      val s = StructType(Seq(StructField("x", LongType, nullable = false)))
      assert(AvroBinary.decodeRow(AvroBinary.encodeRow(Row(n), s), s, s) === Row(n))
    }
  }
}
