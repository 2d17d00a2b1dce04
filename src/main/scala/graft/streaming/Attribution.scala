package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import Events.Event

/** ST8 — stream-stream INTERVAL join: purchase attribution. Each purchase
  * joins the product views by the same user in the preceding attribution
  * window — the "which view drove this purchase" question every
  * e-commerce speed layer answers (reference funnel semantics,
  * `realtime-analytics-speed-layer/design.md:256-303`, taken from MV
  * rollups to the per-event join Spark can express directly).
  *
  * Both inputs carry an event-time watermark, which is what BOUNDS the
  * join state: Spark keeps a view row only until the purchase-side
  * watermark passes `view_ts + window` (the interval condition tells it
  * when a row can no longer match), so state is O(events in window), not
  * O(stream history) — the property that lets this run forever at
  * production rates. The same plan evaluates statically (watermark is a
  * no-op in batch), which is how the spec and the `st8_attribution`
  * oracle twin pin the semantics.
  */
object Attribution {

  /** (purchase × prior views ≤ windowMinutes) pairs per user. Works on
    * streaming and static [[Event]] datasets alike.
    */
  def viewPurchasePairs(events: Dataset[Event],
      watermark: String = "1 hour", windowMinutes: Int = 60): DataFrame = {
    val views = events.toDF
      .filter(col("event_type") === "product_view")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val purchases = events.toDF
      .filter(col("event_type") === "purchase")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    purchases.join(views, intervalCond(windowMinutes))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("view_id"), col("view_ts"))
  }

  private def intervalCond(windowMinutes: Int) =
    col("v_user") === col("p_user") &&
      col("view_ts") <= col("purchase_ts") &&
      col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES")

  /** LEFT OUTER variant: every purchase emits — attributed ones with
    * their view rows, ORGANIC ones (no prior view in the window) with
    * null view columns. In streaming, an unmatched purchase can only be
    * declared organic once no matching view can still arrive, i.e. after
    * the view-side watermark passes its interval — so null rows surface
    * with watermark latency, while matches emit immediately (standard
    * Spark outer stream-stream join semantics). State bounds are the
    * same as the inner join's: the watermark, not stream history.
    */
  def viewPurchasePairsOuter(events: Dataset[Event],
      watermark: String = "1 hour", windowMinutes: Int = 60): DataFrame = {
    val views = events.toDF
      .filter(col("event_type") === "product_view")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("v_user"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
    val purchases = events.toDF
      .filter(col("event_type") === "purchase")
      .withWatermark("ts", watermark)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
    purchases.join(views, intervalCond(windowMinutes), "left_outer")
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("view_id"), col("view_ts"))
  }
}
