package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Speed-layer event model: the 9-type e-commerce event schema with a JSON
  * properties bag, plus the validation split (T7) and DLQ routing (S12).
  *
  * Reference: event JSON Schema
  * `.kiro/specs/realtime-analytics-speed-layer/design.md:437-461`, enum at
  * `requirements.md:41`; validation split `design.md:115-124,494-501`;
  * DLQ `design.md:503-511`.
  */
object Events {

  val eventTypes: Seq[String] = Seq(
    "page_view", "product_view", "search", "add_to_cart", "remove_from_cart",
    "checkout_start", "purchase", "signup", "login")

  /** Wire schema of one event (JSON payload on the stream). */
  val schema: StructType = StructType(Seq(
    StructField("event_id", StringType, nullable = false),
    StructField("user_id", LongType, nullable = false),
    StructField("session_id", StringType),
    StructField("event_type", StringType, nullable = false),
    StructField("ts", TimestampType, nullable = false),
    StructField("user_tier", StringType),
    StructField("properties", StringType))) // JSON bag kept as string

  final case class Event(
      event_id: String,
      user_id: Long,
      session_id: String,
      event_type: String,
      ts: java.sql.Timestamp,
      user_tier: String,
      properties: String)

  /** T7 — parse a raw `value: STRING` stream into typed events plus a
    * `validation_errors` column. Works identically on static and streaming
    * DataFrames (same Catalyst plan).
    */
  def parse(raw: DataFrame): DataFrame = {
    val parsed = raw.withColumn("event", from_json(col("value"), schema))
    parsed.select(col("value"), col("event.*"))
      .withColumn(
        "validation_errors",
        array_compact(array(
          when(col("event_id").isNull, "missing event_id"),
          when(col("user_id").isNull, "missing user_id"),
          when(col("ts").isNull, "missing ts"),
          when(col("event_type").isNull, "missing event_type")
            .when(!col("event_type").isin(eventTypes: _*), "unknown event_type"))))
  }

  /** Valid branch of the T7 split: typed events only. */
  def valid(parsed: DataFrame): Dataset[Event] = {
    val s = parsed.sparkSession
    import s.implicits._
    parsed.filter(size(col("validation_errors")) === 0)
      .select(col("event_id"), col("user_id"), col("session_id"),
        col("event_type"), col("ts"), col("user_tier"), col("properties"))
      .as[Event]
  }

  /** S12 — invalid branch: original payload + error context, ready for a
    * DLQ sink (`writeStream.format("kafka").option("topic", "...-dlq")` in
    * production; any sink in tests).
    */
  def invalid(parsed: DataFrame): DataFrame =
    parsed.filter(size(col("validation_errors")) > 0)
      .select(
        col("value").as("payload"),
        col("validation_errors"),
        current_timestamp().as("dlq_ts"))

  /** ST5 — duplicate-event elimination within the watermark.
    * `dropDuplicatesWithinWatermark` (not plain `dropDuplicates`): with
    * keys that exclude the event-time column, plain dedup state is NEVER
    * evicted by the watermark — unbounded state growth on a long-running
    * stream. The within-watermark variant expires each key once the
    * watermark passes its event time.
    */
  def deduped(events: Dataset[Event], watermark: String = "10 minutes"): Dataset[Event] =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")
}
