package graft.streaming

import graft.SparkSpec
import graft.cdc.Cdc
import graft.sources.{AvroBinary, SchemaRegistry}
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S2+S3 end to end: a stream of Confluent-framed Avro messages (the
  * shape a Kafka `value` column has) decodes inside a Structured
  * Streaming query via registry lookup, including messages written under
  * an older schema version — the consumer-side path of the reference's
  * CDC topics.
  */
class AvroStreamSpec extends SparkSpec {

  private def userRow(id: Long): Row = Row(
    id, s"user$id@example.com", s"First$id", s"Last$id", "10.50",
    1000L + id, 2000L + id, "c", 3000L + id, 3000L + id, id * 100, "false")

  test("framed Avro CDC messages decode in a streaming query (mixed versions)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val reg = new SchemaRegistry.Registry
    assert(reg.register("users-value", Cdc.usersEnvelopeSchema).isRight)
    val v2 = StructType(Cdc.usersEnvelopeSchema.fields :+
      StructField("loyalty_tier", StringType, nullable = true))
    assert(reg.register("users-value", v2).isRight)
    val id1 = reg.globalId("users-value", 1).get
    val id2 = reg.globalId("users-value", 2).get

    val source = MemoryStream[Array[Byte]]
    source.addData(
      (0 until 6).map(i => AvroBinary.frame(id1,
        AvroBinary.encodeRow(userRow(i.toLong), Cdc.usersEnvelopeSchema))) ++
        (6 until 10).map(i => AvroBinary.frame(id2,
          AvroBinary.encodeRow(
            Row.fromSeq(userRow(i.toLong).toSeq :+ s"tier$i"), v2))))

    // consumer decodes EVERYTHING under the latest schema via registry
    val decoded = AvroBinary.decode(source.toDS(), v2, i => reg.schemaById(i).get)
    val q = decoded
      .groupBy(col("loyalty_tier").isNull.as("from_v1"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("avro_stream")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val out = spark.sql("SELECT from_v1, n FROM avro_stream")
        .collect().map(r => r.getBoolean(0) -> r.getLong(1)).toMap
      assert(out(true) === 6L, "v1-written rows surface null loyalty_tier")
      assert(out(false) === 4L)
    } finally q.stop()
  }
}
