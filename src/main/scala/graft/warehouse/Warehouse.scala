package graft.warehouse

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse 3-layer model — Raw → Staging → Marts (S10), the engine's
  * internal equivalent of the reference's Snowflake layers
  * (`.kiro/specs/batch-analytics-layer/design.md:304-614`) and dbt's
  * incremental materialization (`design.md:648-730`).
  *
  * Layers are path namespaces (`<wh>/raw|staging|marts/<table>`), written
  * as partitioned parquet. Marts support dbt `is_incremental` semantics:
  * append only rows with `date > max(date) already materialized`
  * (`design.md:668-670`), with an explicit reprocessing window for late
  * data (SURVEY §7.4).
  *
  * Scale: staging transforms are narrow (scan → project), so raw→staging
  * is shuffle-free; marts shuffle once on their grouping key; incremental
  * runs read only the mart's max(date) (a metadata-only parquet footer
  * scan) plus the new source partitions.
  */
final class Warehouse(spark: SparkSession, root: String) {

  def path(layer: String, table: String) = s"$root/$layer/$table"

  def write(layer: String, table: String, df: DataFrame,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path(layer, table))

  def read(layer: String, table: String): DataFrame =
    spark.read.parquet(path(layer, table))

  def exists(layer: String, table: String): Boolean =
    new java.io.File(path(layer, table)).exists()

  /** dbt-style incremental append: keep only `df` rows with
    * `dateCol > max(dateCol) - reprocessDays` of what's already in the
    * mart; late rows inside the window are deduplicated by `keyCols`
    * (delete-insert semantics would need the lakehouse layer; marts are
    * append-only per the reference).
    */
  def appendIncremental(table: String, df: DataFrame, dateCol: String,
      keyCols: Seq[String], reprocessDays: Int = 0): Long = {
    val target = path("marts", table)
    if (!exists("marts", table)) {
      df.write.mode(SaveMode.Overwrite).parquet(target)
      return spark.read.parquet(target).count()
    }
    val existing = spark.read.parquet(target)
    val maxDate = existing.agg(max(col(dateCol))).head().get(0)
    // an empty mart has max(date) = null; a null threshold would filter
    // out EVERY row forever — fall back to key-dedup only
    val dated =
      if (maxDate == null) df
      else {
        val threshold =
          if (reprocessDays > 0) date_sub(lit(maxDate), reprocessDays)
          else lit(maxDate)
        df.filter(col(dateCol) > threshold)
      }
    val fresh = dated
      .join(existing.select(keyCols.map(col): _*), keyCols, "left_anti")
    val n = fresh.count()
    if (n > 0) fresh.write.mode(SaveMode.Append).parquet(target)
    n
  }
}

/** The specced `BatchAnalyticsApp` pipeline
  * (`.kiro/specs/batch-analytics-layer/design.md:110-177`): read source
  * tables → staging enhancements → mart aggregates, one call.
  */
object BatchAnalytics {

  def stageCustomers(c: DataFrame): DataFrame =
    c.withColumn("is_valid_name", col("c_name").rlike("^Customer#[0-9]+$"))
      .withColumn("is_complete_profile",
        col("c_name").isNotNull && col("c_mktsegment").isNotNull &&
          col("c_acctbal").isNotNull)
      .withColumn("balance_tier",
        when(col("c_acctbal") < 0, "negative")
          .when(col("c_acctbal") < 5000, "standard")
          .otherwise("premium"))

  def stageOrders(o: DataFrame): DataFrame =
    o.withColumn("order_date", to_date(col("o_orderdate")))
      .withColumn("is_valid_order", col("o_totalprice") >= 0)
      .withColumn("order_size_category",
        when(col("o_totalprice") < 50000, "small")
          .when(col("o_totalprice") < 200000, "medium")
          .otherwise("large"))

  def martDailyBusiness(stagedOrders: DataFrame): DataFrame =
    stagedOrders
      .groupBy("order_date")
      .agg(
        count(lit(1)).as("total_orders"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("fulfilled_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total_revenue"),
        countDistinct(col("o_custkey")).as("unique_customers"),
        sum(when(col("order_size_category") === "large", 1L).otherwise(0L)).as("large_orders"))

  def martCustomerMetrics(stagedCustomers: DataFrame, stagedOrders: DataFrame): DataFrame =
    stagedCustomers
      .join(stagedOrders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"), col("balance_tier"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("total_spent"),
        max(col("order_date")).as("last_order_date"))

  /** Full batch run into the warehouse; returns mart row counts. */
  def run(spark: SparkSession, sfDir: String, wh: Warehouse): Map[String, Long] = {
    val customers = Tables.load(spark, sfDir, "customer")
    val orders = Tables.load(spark, sfDir, "orders")
    wh.write("raw", "customer", customers)
    wh.write("raw", "orders", orders)
    val stgC = stageCustomers(wh.read("raw", "customer"))
    val stgO = stageOrders(wh.read("raw", "orders"))
    wh.write("staging", "customers", stgC)
    wh.write("staging", "orders", stgO)
    val daily = martDailyBusiness(wh.read("staging", "orders"))
    val appended = wh.appendIncremental("daily_business", daily,
      "order_date", Seq("order_date"))
    val cm = martCustomerMetrics(
      wh.read("staging", "customers"), wh.read("staging", "orders"))
    wh.write("marts", "customer_metrics", cm)
    Map(
      "daily_business_appended" -> appended,
      "customer_metrics" -> wh.read("marts", "customer_metrics").count())
  }
}
