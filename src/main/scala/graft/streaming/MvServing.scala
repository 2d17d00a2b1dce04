package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MV-served dashboard path.
  *
  * The reference hits its sub-second / 50-concurrent dashboard target by
  * serving point-reads from pre-aggregated ClickHouse MVs
  * (`.kiro/specs/realtime-analytics-speed-layer/design.md:148-165` target,
  * MV definitions `design.md:256-303`) — dashboards never scan the event
  * fact table. The Spark-native equivalent assembled here:
  *
  *  1. the speed layer appends partial aggregate snapshots per trigger
  *     ([[StreamingAggs.appendPartials]], stamped `__batch_id`);
  *  2. the serving layer merges-on-read (newest snapshot per group,
  *     [[StreamingAggs.mergeOnRead]]) and PINS the merged MV — a few
  *     hundred rows regardless of fact-table size — in the in-memory
  *     cache (the ClickHouse-RAM analogue);
  *  3. dashboard queries are rollups over the pinned MV tables only.
  *
  * At 100 TB the fact table is touched once per trigger by the streaming
  * aggregation; dashboard QPS costs O(|MV|) per query, independent of
  * corpus size.
  */
object MvServing {

  /** Merged + cached MV handles (grain in parens):
    * funnel (date, user_tier), tier (user_tier),
    * product (date, product_bucket), hourly (date, hour).
    */
  final case class Mvs(funnel: DataFrame, tier: DataFrame,
      product: DataFrame, hourly: DataFrame)

  /** Merge keys per MV (the MV grain). */
  val mvKeys: Seq[(String, Seq[String])] = Seq(
    "funnel" -> Seq("date", "user_tier"),
    "tier" -> Seq("user_tier"),
    "product" -> Seq("date", "product_bucket"),
    "hourly" -> Seq("date", "hour"))

  /** MV name → builder over the fact table. The builders ARE the A7/A8/
    * A9/A11 aggregate bodies ([[graft.analytics.EventQueries]]) — one
    * definition, so the MV-served dashboards cannot diverge from the
    * oracle-gated fact-scan queries.
    */
  def mvBuilders(spark: SparkSession, sfDir: String): Map[String, DataFrame] = {
    import graft.analytics.EventQueries
    Map(
      "funnel" -> EventQueries.funnelMv(spark, sfDir),
      "tier" -> EventQueries.tierMv(spark, sfDir),
      "product" -> EventQueries.productMv(spark, sfDir),
      "hourly" -> EventQueries.hourlyMv(spark, sfDir))
  }

  /** Append one partial snapshot per MV (what `foreachBatch` does each
    * trigger), then merge-on-read and pin each merged MV in the cache.
    * `batchId` lets callers append several snapshots before serving.
    */
  def materialize(spark: SparkSession, sfDir: String, baseDir: String,
      batchId: Long = 0L): Mvs = {
    val builders = mvBuilders(spark, sfDir)
    mvKeys.foreach { case (name, _) =>
      StreamingAggs.appendPartials(builders(name), batchId, s"$baseDir/$name")
    }
    serve(spark, baseDir)
  }

  /** Merge-on-read each partial table and pin the result (tiny) in memory;
    * an eager count materializes the cache so serving-path queries never
    * pay the merge. The pinned MV is collapsed to ONE partition: it is a
    * few hundred rows however big the fact table is, and a 32-partition
    * cache makes every dashboard stage spawn 32 near-empty tasks — under
    * 48-in-flight contention that scheduler storm IS the latency (measured:
    * queue p50 1.4 s before, sub-100 ms after).
    */
  def serve(spark: SparkSession, baseDir: String): Mvs = {
    val merged = mvKeys.map { case (name, keys) =>
      val m = StreamingAggs.mergeOnRead(spark, s"$baseDir/$name", keys)
        .coalesce(1).persist()
      m.count()
      name -> m
    }.toMap
    Mvs(merged("funnel"), merged("tier"), merged("product"), merged("hourly"))
  }

  /** The 8 dashboard-shaped serving queries — rollups over the pinned MVs
    * only; no query here ever touches the events fact table.
    */
  def dashboards(mvs: Mvs): Seq[(String, () => DataFrame)] = Seq(
    "funnel_conversion_by_tier" -> (() =>
      mvs.funnel.groupBy("user_tier")
        .agg(sum("n_events").as("n_events"), sum("n_views").as("n_views"),
          sum("n_purchases").as("n_purchases"),
          (sum("n_purchases").cast("double") / sum("n_views")).as("purchase_per_view"))
        .orderBy("user_tier")),
    "funnel_daily_trend" -> (() =>
      mvs.funnel.groupBy("date")
        .agg(sum("n_events").as("n_events"), sum("n_signups").as("n_signups"),
          sum("n_purchases").as("n_purchases"))
        .orderBy("date")),
    "top_products_by_purchases" -> (() =>
      mvs.product.groupBy("product_bucket")
        .agg(sum("n_purchases").as("n_purchases"), sum("n_views").as("n_views"))
        .orderBy(col("n_purchases").desc, col("product_bucket"))
        .limit(10)),
    "product_click_through" -> (() =>
      mvs.product.groupBy("product_bucket")
        .agg((sum("n_clicks").cast("double") / sum("n_views")).as("ctr"))
        .orderBy("product_bucket")),
    "tier_value_summary" -> (() =>
      mvs.tier
        .withColumn("avg_purchase_k",
          col("sum_purchase_k").cast("double") / col("n_purchases"))
        .orderBy("user_tier")),
    "hourly_peak_load" -> (() =>
      mvs.hourly.orderBy(col("n_records").desc, col("date"), col("hour")).limit(5)),
    "hour_of_day_heatmap" -> (() =>
      mvs.hourly.groupBy("hour")
        .agg(sum("n_records").as("n_records"), avg("n_users").as("avg_users"))
        .orderBy("hour")),
    "signup_share_by_date" -> (() =>
      mvs.funnel.groupBy("date")
        .agg((sum("n_signups").cast("double") / sum("n_events")).as("signup_share"))
        .orderBy("date")))

  /** Release the pinned MVs. */
  def release(mvs: Mvs): Unit =
    Seq(mvs.funnel, mvs.tier, mvs.product, mvs.hourly).foreach(_.unpersist())
}
