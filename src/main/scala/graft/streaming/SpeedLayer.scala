package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import Events.Event

/** The assembled speed layer (reference
  * `.kiro/specs/realtime-analytics-speed-layer/design.md:97-141`): a
  * file-based event stream → dedup → sessionization and funnel MV, with
  * real trigger (ST2) and checkpoint (ST3) wiring. In production the
  * source line changes to `format("kafka")` — everything downstream is
  * identical.
  */
object SpeedLayer {

  final case class Config(
      eventsPath: String, // parquet dir/file (canonical events table shape)
      outDir: String, // session + funnel sinks live under here
      checkpointDir: String, // ST3: one checkpoint per query
      trigger: Trigger = Trigger.AvailableNow(), // ST2; prod: ProcessingTime("2 seconds")
      maxFilesPerTrigger: Option[Int] = None, // ST2 backpressure analogue
      sessionTimeoutMs: Long = 30L * 60 * 1000) // ST1 inactivity window

  /** Adapter from the canonical `events` table shape to the speed-layer
    * [[Event]] model (testdata event types → the spec's 9-type enum;
    * `value` becomes the purchase amount in the JSON properties bag).
    * Pure column expressions — works identically on a static or streaming
    * frame (same Catalyst plan), so batch twins of streaming operators
    * share it.
    */
  def adapt(src: org.apache.spark.sql.DataFrame): Dataset[Event] = {
    val spark = src.sparkSession
    import spark.implicits._
    // `ts` arrives as epoch-nanos LongType (legacy TIMESTAMP(NANOS) files)
    // or native TimestampType (micros files) — normalize here so the rest
    // of the speed layer sees one shape.
    val tsCol = src.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        timestamp_micros(expr("ts DIV 1000"))
      case _ => col("ts")
    }
    src
      .select(
        col("event_id").cast("string").as("event_id"),
        col("user_id"),
        concat(lit("s"), col("user_id")).as("session_id"),
        when(col("event_type") === "view", "page_view")
          .when(col("event_type") === "click", "product_view")
          .when(col("event_type") === "error", "login")
          .otherwise(col("event_type")).as("event_type"),
        tsCol.as("ts"),
        lit("unknown").as("user_tier"),
        concat(lit("""{"amount": """), col("value"), lit("}")).as("properties"))
      .as[Event]
  }

  def eventStream(spark: SparkSession, cfg: Config): Dataset[Event] = {
    val schema =
      if (Tables.eventsTsIsNanos(spark, cfg.eventsPath)) Tables.events
      else Tables.eventsMicros
    val reader = spark.readStream.schema(schema)
    val src = cfg.maxFilesPerTrigger
      .fold(reader)(n => reader.option("maxFilesPerTrigger", n))
      .parquet(cfg.eventsPath)
    adapt(src)
  }

  /** Start both queries (sessionization + funnel MV). Returns them running;
    * callers await/stop. Exactly-once across restarts comes from the file
    * source offsets + sink commit log in each checkpoint.
    */
  def run(spark: SparkSession, cfg: Config): Seq[StreamingQuery] = {
    // dedup sets the stream's (single) watermark; downstream operators
    // must not redefine it
    val events = Events.deduped(eventStream(spark, cfg))

    val sessions = Sessionization.sessionize(events,
        timeoutMs = cfg.sessionTimeoutMs,
        watermark = None,
        outputMode = org.apache.spark.sql.streaming.OutputMode.Append)
      .writeStream
      .format("parquet")
      .option("path", s"${cfg.outDir}/sessions")
      .option("checkpointLocation", s"${cfg.checkpointDir}/sessions")
      .outputMode("append") // file sink: append of per-batch partials
      .trigger(cfg.trigger)
      .start()

    val funnel = StreamingAggs.funnel(events, watermark = None)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        StreamingAggs.appendPartials(batch, id, s"${cfg.outDir}/funnel")
      }
      .option("checkpointLocation", s"${cfg.checkpointDir}/funnel")
      .outputMode("update")
      .trigger(cfg.trigger)
      .start()

    Seq(sessions, funnel)
  }
}
