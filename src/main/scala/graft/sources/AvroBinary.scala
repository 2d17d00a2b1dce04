package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.types._

/** Minimal Avro BINARY codec for flat record schemas — the wire half of
  * the engine's Schema Registry surface (S3). The reference's CDC stream
  * is Avro with Confluent Schema Registry
  * (`users-debezium-connector.json:18-25`;
  * `.kiro/specs/data-ingestion-pipeline/design.md:345-360`); no Avro jar
  * ships in this environment, but the Avro 1.x binary spec for the
  * envelope subset is small and public: zigzag-varint ints/longs,
  * little-endian IEEE floats/doubles, length-prefixed UTF-8
  * strings/bytes, one-byte booleans, and nullable fields as the 2-branch
  * union `["null", T]` whose branch index is a varint.
  *
  * A Spark StructType maps to the Avro record implicitly: fields in
  * declaration order; a nullable field is the union (branch 0 = null,
  * branch 1 = value). `decodeRow` performs Avro schema RESOLUTION for
  * BACKWARD evolution: bytes are read with the WRITER schema; reader
  * fields missing from the writer default to null (they must be nullable
  * — [[SchemaRegistry]] enforces it), writer fields missing from the
  * reader are skipped, and int→long / float→double / int→double widen.
  *
  * Framing follows the public Confluent wire format: magic byte 0x0 +
  * 4-byte big-endian schema id + Avro binary body — so a consumer can
  * resolve the writer schema from a [[SchemaRegistry.Registry]] lookup.
  *
  * Everything is per-row and allocation-light; the Dataset helpers run it
  * inside `Dataset.map` with binary/row encoders (narrow, no shuffle —
  * the 100 TB shape of a serialization stage).
  */
object AvroBinary {

  // ---- primitive writers ------------------------------------------------

  private[sources] def writeVarLong(n: Long, out: ByteArrayOutputStream): Unit = {
    var z = (n << 1) ^ (n >> 63) // zigzag
    while ((z & ~0x7fL) != 0L) {
      out.write(((z & 0x7f) | 0x80).toInt)
      z >>>= 7
    }
    out.write(z.toInt)
  }

  private def writeBytes(b: Array[Byte], out: ByteArrayOutputStream): Unit = {
    writeVarLong(b.length.toLong, out)
    out.write(b, 0, b.length)
  }

  // ---- primitive readers ------------------------------------------------

  private[sources] def readVarLong(in: ByteArrayInputStream): Long = {
    var shift = 0
    var acc = 0L
    var b = in.read()
    while (b >= 0x80) {
      acc |= (b & 0x7fL) << shift
      shift += 7
      b = in.read()
    }
    if (b < 0) throw new EOFException("truncated Avro varint")
    acc |= b.toLong << shift
    (acc >>> 1) ^ -(acc & 1) // un-zigzag
  }

  private[sources] def readNBytes(in: ByteArrayInputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException("truncated Avro bytes")
      off += r
    }
    buf
  }

  // ---- values -----------------------------------------------------------

  private def writeValue(v: Any, dt: DataType, out: ByteArrayOutputStream): Unit =
    dt match {
      case LongType => writeVarLong(v.asInstanceOf[Long], out)
      case IntegerType => writeVarLong(v.asInstanceOf[Int].toLong, out)
      case StringType =>
        writeBytes(v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8), out)
      case BinaryType => writeBytes(v.asInstanceOf[Array[Byte]], out)
      case DoubleType =>
        val bb = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
        bb.putDouble(v.asInstanceOf[Double])
        out.write(bb.array(), 0, 8)
      case FloatType =>
        val bb = ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN)
        bb.putFloat(v.asInstanceOf[Float])
        out.write(bb.array(), 0, 4)
      case BooleanType => out.write(if (v.asInstanceOf[Boolean]) 1 else 0)
      case other =>
        throw new IllegalArgumentException(
          s"AvroBinary does not support ${other.simpleString} (envelope subset only)")
    }

  private def readValue(dt: DataType, in: ByteArrayInputStream): Any = dt match {
    case LongType => readVarLong(in)
    case IntegerType => readVarLong(in).toInt
    case StringType =>
      new String(readNBytes(in, readVarLong(in).toInt), StandardCharsets.UTF_8)
    case BinaryType => readNBytes(in, readVarLong(in).toInt)
    case DoubleType =>
      ByteBuffer.wrap(readNBytes(in, 8)).order(ByteOrder.LITTLE_ENDIAN).getDouble
    case FloatType =>
      ByteBuffer.wrap(readNBytes(in, 4)).order(ByteOrder.LITTLE_ENDIAN).getFloat
    case BooleanType => in.read() match {
      case 1 => true
      case 0 => false
      case -1 => throw new EOFException("truncated Avro boolean")
      case b => throw new IllegalArgumentException(s"invalid Avro boolean byte $b")
    }
    case other =>
      throw new IllegalArgumentException(
        s"AvroBinary does not support ${other.simpleString} (envelope subset only)")
  }

  /** Widenings permitted during schema resolution (mirror of
    * [[SchemaRegistry.safeWidenings]]).
    */
  private def widen(v: Any, from: DataType, to: DataType): Any = (from, to) match {
    case (f, t) if f == t => v
    case (IntegerType, LongType) => v.asInstanceOf[Int].toLong
    case (IntegerType, DoubleType) => v.asInstanceOf[Int].toDouble
    case (FloatType, DoubleType) => v.asInstanceOf[Float].toDouble
    case (f, t) => throw new IllegalArgumentException(
      s"cannot resolve ${f.simpleString} into ${t.simpleString}")
  }

  // ---- records ----------------------------------------------------------

  /** Encode one Row with `schema` as an Avro binary record body. */
  def encodeRow(row: Row, schema: StructType): Array[Byte] = {
    val out = new ByteArrayOutputStream(64)
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (f.nullable) {
        if (row.isNullAt(i)) writeVarLong(0L, out) // union branch: null
        else { writeVarLong(1L, out); writeValue(row.get(i), f.dataType, out) }
      } else {
        require(!row.isNullAt(i), s"null in non-nullable field ${f.name}")
        writeValue(row.get(i), f.dataType, out)
      }
    }
    out.toByteArray
  }

  /** Decode an Avro binary record body written with `writer`, resolved to
    * `reader` (BACKWARD evolution: new nullable fields → null, dropped
    * fields → skipped, safe widenings applied).
    */
  def decodeRow(bytes: Array[Byte], writer: StructType, reader: StructType): Row =
    decodeRowFrom(new ByteArrayInputStream(bytes), writer, reader)

  /** Stream variant of [[decodeRow]]: consumes exactly one record from
    * `in` — the shape OCF blocks need, where records are concatenated
    * without per-record length prefixes.
    */
  def decodeRowFrom(in: ByteArrayInputStream, writer: StructType,
      reader: StructType): Row = {
    val decoded = writer.fields.map { f =>
      val v =
        if (!f.nullable) readValue(f.dataType, in)
        else if (readVarLong(in) == 0L) null
        else readValue(f.dataType, in)
      f.name -> ((v, f.dataType))
    }.toMap
    Row.fromSeq(reader.fields.toSeq.map { rf =>
      decoded.get(rf.name) match {
        case Some((null, _)) =>
          // fail HERE with the field named, not as an encoder NPE later:
          // a schema-violating Row must never leave the decoder
          require(rf.nullable,
            s"null in writer field ${rf.name} cannot resolve into a non-nullable reader field")
          null
        case Some((v, wdt)) => widen(v, wdt, rf.dataType)
        case None =>
          require(rf.nullable, s"reader field ${rf.name} absent from writer and not nullable")
          null
      }
    })
  }

  // ---- Confluent wire framing ------------------------------------------

  val MagicByte: Byte = 0x0

  /** magic byte + 4-byte big-endian schema id + record body. */
  def frame(schemaId: Int, body: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(5 + body.length)
    out.put(MagicByte).putInt(schemaId).put(body)
    out.array()
  }

  /** (schema id, record body). */
  def unframe(message: Array[Byte]): (Int, Array[Byte]) = {
    require(message.length >= 5 && message(0) == MagicByte,
      "not a schema-registry framed message")
    val bb = ByteBuffer.wrap(message)
    bb.get()
    val id = bb.getInt
    (id, java.util.Arrays.copyOfRange(message, 5, message.length))
  }

  // ---- Dataset plumbing -------------------------------------------------

  /** DataFrame → one `value: binary` column of framed Avro messages
    * (narrow map; the schema travels by id, not per record).
    */
  def encode(df: DataFrame, schemaId: Int): DataFrame = {
    val schema = df.schema
    df.map(row => frame(schemaId, encodeRow(row, schema)))(Encoders.BINARY)
      .toDF("value")
  }

  /** Framed messages → rows under `reader`, resolving each message's
    * writer schema through `resolveWriter` (normally a registry lookup).
    */
  def decode(messages: Dataset[Array[Byte]], reader: StructType,
      resolveWriter: Int => StructType): DataFrame = {
    messages.map { m =>
      val (id, body) = unframe(m)
      decodeRow(body, resolveWriter(id), reader)
    }(Encoders.row(reader))
  }
}
