package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro Object Container File (OCF) — the FILE half of the Avro story
  * (the wire half, Confluent-framed single messages, is
  * [[AvroBinary]]): `Obj\x01` magic, a file-metadata map carrying the
  * writer schema JSON and codec, a 16-byte sync marker, then data
  * blocks of `[record count][byte size][records…][sync]`. This is the
  * interchange format data lands in when exported from Kafka pipelines
  * or warehouse dumps — a complete engine must READ it without the
  * producing system running.
  *
  * Format anchor: the public Avro 1.11 spec, "Object Container Files".
  * Pure JDK on top of [[AvroBinary]]'s varint/record codec; `deflate`
  * blocks via `java.util.zip` (raw RFC-1951 streams, per spec). Schema
  * resolution on read reuses the BACKWARD rules: the embedded writer
  * schema decodes each record, then widens into the caller's reader
  * schema — so an old consumer reads a new producer's files.
  *
  * Scale shape: one OCF file decodes within one task (files are the
  * parallelism unit, like parquet row groups); [[readFiles]] is a
  * flatMap over `binaryFile` rows — no shuffle, no driver decode.
  */
object AvroOcf {

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  // ---- Avro schema JSON (the envelope-subset record form) ---------------

  private val typeNames: Seq[(DataType, String)] = Seq(
    LongType -> "long", IntegerType -> "int", StringType -> "string",
    BinaryType -> "bytes", DoubleType -> "double", FloatType -> "float",
    BooleanType -> "boolean")

  private[sources] def toAvroJson(schema: StructType): String = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.createObjectNode()
    root.put("type", "record").put("name", "row")
    val fields = root.putArray("fields")
    schema.fields.foreach { f =>
      val name = typeNames.collectFirst { case (dt, n) if dt == f.dataType => n }
        .getOrElse(throw new IllegalArgumentException(
          s"AvroOcf does not support ${f.dataType.simpleString} (envelope subset only)"))
      val fn = fields.addObject()
      fn.put("name", f.name)
      if (f.nullable) fn.putArray("type").add("null").add(name)
      else fn.put("type", name)
    }
    m.writeValueAsString(root)
  }

  private[sources] def fromAvroJson(json: String): StructType = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = m.readTree(json)
    if (root.path("type").asText() != "record")
      throw new java.io.IOException(s"not an Avro record schema: $json")
    val byName = typeNames.map(_.swap).toMap
    // a primitive may arrive as "long", or object form
    // {"type":"long","logicalType":…} (Kafka Connect/Debezium exports);
    // the logical annotation refines interpretation, the base decodes
    // identically — unsupported shapes fail with the field named
    def primitive(t: com.fasterxml.jackson.databind.JsonNode,
        field: String): DataType = {
      val name =
        if (t.isTextual) t.asText()
        else if (t.isObject) t.path("type").asText()
        else null
      byName.getOrElse(name, throw new java.io.IOException(
        s"unsupported Avro type $t in field $field (envelope subset only)"))
    }
    val fields = Seq.newBuilder[StructField]
    root.path("fields").forEach { fn =>
      val name = fn.path("name").asText()
      val t = fn.path("type")
      if (t.isArray) {
        // two-branch null unions in either order
        val branches = (0 until t.size).map(t.get)
        val (nulls, others) = branches.partition(b =>
          b.isTextual && b.asText() == "null")
        if (nulls.size != 1 || others.size != 1)
          throw new java.io.IOException(s"unsupported union in field $name: $t")
        // Avro writes the union BRANCH INDEX; our decoder assumes null=0,
        // so only ["null", T] matches the binary layout
        if (!t.get(0).asText().equals("null"))
          throw new java.io.IOException(
            s"union in field $name must order null first (branch indexes): $t")
        fields += StructField(name, primitive(others.head, name), nullable = true)
      } else fields += StructField(name, primitive(t, name), nullable = false)
    }
    StructType(fields.result())
  }

  // ---- codecs -----------------------------------------------------------

  private def deflate(b: Array[Byte]): Array[Byte] = {
    // Avro deflate blocks are RAW deflate streams (RFC 1951, no zlib
    // header): Deflater(level, nowrap = true)
    val d = new java.util.zip.Deflater(
      java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(b); d.finish()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(b: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true)
    inf.setInput(b)
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      if (n == 0 && inf.needsInput()) throw new java.io.IOException(
        "truncated deflate block")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  // ---- write ------------------------------------------------------------

  /** Serialize rows into one OCF byte payload. The sync marker derives
    * deterministically from the schema JSON (md5) so identical writes
    * are byte-identical — reproducible fixtures, hashable outputs.
    */
  def write(rows: Seq[Row], schema: StructType,
      codec: String = "null", blockRecords: Int = 1000): Array[Byte] = {
    require(codec == "null" || codec == "deflate", s"unsupported codec $codec")
    val schemaJson = toAvroJson(schema)
    val sync = java.security.MessageDigest.getInstance("MD5")
      .digest(schemaJson.getBytes("UTF-8"))
    val out = new ByteArrayOutputStream()
    out.write(Magic)
    // file metadata map: one block of N entries, then the 0 terminator
    val meta = Seq(
      "avro.schema" -> schemaJson.getBytes("UTF-8"),
      "avro.codec" -> codec.getBytes("UTF-8"))
    AvroBinary.writeVarLong(meta.size.toLong, out)
    meta.foreach { case (k, v) =>
      val kb = k.getBytes("UTF-8")
      AvroBinary.writeVarLong(kb.length.toLong, out); out.write(kb)
      AvroBinary.writeVarLong(v.length.toLong, out); out.write(v)
    }
    AvroBinary.writeVarLong(0L, out)
    out.write(sync)
    rows.grouped(blockRecords).foreach { block =>
      val body = new ByteArrayOutputStream()
      block.foreach(r => body.write(AvroBinary.encodeRow(r, schema)))
      val payload =
        if (codec == "deflate") deflate(body.toByteArray) else body.toByteArray
      AvroBinary.writeVarLong(block.size.toLong, out)
      AvroBinary.writeVarLong(payload.length.toLong, out)
      out.write(payload)
      out.write(sync)
    }
    out.toByteArray
  }

  // ---- read -------------------------------------------------------------

  /** Decode one OCF payload into rows under `reader`'s schema (BACKWARD
    * resolution against the embedded writer schema). Returns the writer
    * schema too — provenance for audits.
    */
  /** A length/size varint, validated: corrupt negatives or >2 GB values
    * become IOExceptions (the corrupt-file contract), never a
    * NegativeArraySizeException or a silently truncated Int.
    */
  private def readLen(in: ByteArrayInputStream, what: String): Int = {
    val n = AvroBinary.readVarLong(in)
    if (n < 0 || n > in.available())
      throw new java.io.IOException(
        s"corrupt OCF: $what length $n (have ${in.available()} bytes)")
    n.toInt
  }

  def read(payload: Array[Byte], reader: StructType): (StructType, Seq[Row]) = {
    val in = new ByteArrayInputStream(payload)
    if (!java.util.Arrays.equals(AvroBinary.readNBytes(in, 4), Magic))
      throw new java.io.IOException("not an Avro OCF payload (bad magic)")
    var schemaJson: String = null
    var codec = "null"
    var n = AvroBinary.readVarLong(in)
    while (n != 0) {
      // negative counts carry a byte size we don't need; normalize
      var i = 0L
      val count = math.abs(n)
      if (n < 0) AvroBinary.readVarLong(in) // block byte size, unused
      while (i < count) {
        val k = new String(
          AvroBinary.readNBytes(in, readLen(in, "metadata key")), "UTF-8")
        val v = AvroBinary.readNBytes(in, readLen(in, "metadata value"))
        k match {
          case "avro.schema" => schemaJson = new String(v, "UTF-8")
          case "avro.codec" => codec = new String(v, "UTF-8")
          case _ => // unknown metadata is legal; skip
        }
        i += 1
      }
      n = AvroBinary.readVarLong(in)
    }
    if (schemaJson == null)
      throw new java.io.IOException("OCF missing avro.schema metadata")
    if (codec != "null" && codec != "deflate")
      throw new java.io.IOException(s"unsupported OCF codec $codec")
    val writer = fromAvroJson(schemaJson)
    // resolution compatibility surfaces HERE with a clear message, not as
    // an encoder NPE deep in an executor task (e.g. a nullable writer
    // field read under a non-nullable reader)
    val incompat = SchemaRegistry.backwardIncompatibilities(writer, reader)
    if (incompat.nonEmpty)
      throw new java.io.IOException(
        s"reader schema cannot resolve this file: ${incompat.mkString("; ")}")
    val sync = AvroBinary.readNBytes(in, 16)
    val rows = Seq.newBuilder[Row]
    while (in.available() > 0) {
      val count = AvroBinary.readVarLong(in)
      val size = readLen(in, "block")
      val raw = AvroBinary.readNBytes(in, size)
      val body = new ByteArrayInputStream(
        if (codec == "deflate") inflate(raw) else raw)
      var i = 0L
      while (i < count) {
        rows += AvroBinary.decodeRowFrom(body, writer, reader)
        i += 1
      }
      if (!java.util.Arrays.equals(AvroBinary.readNBytes(in, 16), sync))
        throw new java.io.IOException("block sync marker mismatch")
    }
    (writer, rows.result())
  }

  /** Distributed read of OCF files: one file per task via `binaryFile`,
    * decoded in a flatMap — no shuffle, no driver decode.
    */
  def readFiles(spark: SparkSession, dir: String, reader: StructType): DataFrame = {
    implicit val enc: org.apache.spark.sql.Encoder[Row] =
      org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(reader)
    spark.read.format("binaryFile").load(dir)
      .select("content")
      .as(org.apache.spark.sql.Encoders.BINARY)
      .flatMap((bytes: Array[Byte]) => read(bytes, reader)._2)
      .toDF()
  }

  /** OCF sink for LOCAL/SHARED filesystems: each partition serializes
    * itself into ONE container file (`part-NNNNN.avro`) — partitions are
    * the parallelism unit on write exactly as files are on read, and no
    * data moves to the driver. Empty partitions write nothing (an OCF
    * with zero blocks is legal but useless).
    *
    * Filesystem contract: `dir` must be a path every executor can reach
    * (local mode, NFS — the same contract as SnapshotTable's manifests).
    * Each task creates the directory itself and writes through a
    * task-attempt-unique temp name + atomic move, so a speculative or
    * retried attempt can never interleave with a committed file — last
    * complete attempt wins, both are whole files. Object stores need a
    * Hadoop-committer-based sink instead.
    */
  def writeFiles(df: DataFrame, dir: String, codec: String = "null",
      blockRecords: Int = 1000): Unit = {
    val schema = df.schema
    df.rdd.mapPartitionsWithIndex { (part, it) =>
      // one container per partition: the file must be assembled whole
      // (blocks + trailing syncs), so the partition buffers here — size
      // partitions to the file size you want, as with any file sink
      val rows = it.toSeq
      if (rows.nonEmpty) {
        val payload = write(rows, schema, codec, blockRecords)
        val dirPath = java.nio.file.Paths.get(dir)
        java.nio.file.Files.createDirectories(dirPath)
        val attempt = org.apache.spark.TaskContext.get() match {
          case null => 0L
          case tc => tc.taskAttemptId()
        }
        val tmp = dirPath.resolve(f".part-$part%05d.avro.$attempt%d.tmp")
        java.nio.file.Files.write(tmp, payload)
        java.nio.file.Files.move(tmp, dirPath.resolve(f"part-$part%05d.avro"),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      Iterator.single(rows.size)
    }.count() // one write job
  }
}
