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

  /** The four fields every consumer must convert: validation reads them. */
  private val validationFields = Seq("event_id", "user_id", "ts", "event_type")

  private def withValidation(parsed: DataFrame): DataFrame =
    parsed.withColumn(
      "validation_errors",
      array_compact(array(
        when(col("event_id").isNull, "missing event_id"),
        when(col("user_id").isNull, "missing user_id"),
        when(col("ts").isNull, "missing ts"),
        when(col("event_type").isNull, "missing event_type")
          .when(!col("event_type").isin(eventTypes: _*), "unknown event_type"))))

  /** T7 — parse a raw `value: STRING` stream into typed events plus a
    * `validation_errors` column. Works identically on static and streaming
    * DataFrames (same Catalyst plan).
    */
  def parse(raw: DataFrame): DataFrame = {
    val parsed = raw.withColumn("event", from_json(col("value"), schema))
    withValidation(parsed.select(col("value"), col("event.*")))
  }

  /** Schema-pruned [[parse]]: converts ONLY the validation fields plus
    * `extra`. `from_json` still tokenizes the whole payload, but skips
    * the UTF8 copies and type conversion of every omitted field — the
    * per-event saving that matters when three independent consumers each
    * re-parse the same topic (the production topology): the DLQ split
    * needs 4 of the 7 fields, the funnel 6, sessionization 6. Validation
    * semantics are IDENTICAL to [[parse]] — the four checked fields are
    * always converted.
    */
  def parsePruned(raw: DataFrame, extra: Seq[String]): DataFrame = {
    val names = validationFields ++ extra.filterNot(validationFields.contains)
    val pruned = StructType(schema.fields.filter(f => names.contains(f.name)))
    val parsed = raw.withColumn("event", from_json(col("value"), pruned))
    withValidation(parsed.select(col("value"), col("event.*")))
  }

  /** Valid branch of a PRUNED parse, rebuilt to the full typed surface:
    * omitted fields come back as typed NULLs, so downstream operators
    * keep the `Dataset[Event]` contract (they must not READ the omitted
    * fields — that is the caller's pruning bargain).
    */
  def validPruned(parsed: DataFrame): Dataset[Event] = {
    val s = parsed.sparkSession
    import s.implicits._
    val have = parsed.columns.toSet
    val cols = schema.fields.map { f =>
      if (have.contains(f.name)) col(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    parsed.filter(size(col("validation_errors")) === 0)
      .select(cols.toIndexedSeq: _*)
      .as[Event]
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
