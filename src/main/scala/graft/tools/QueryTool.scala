package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc query facade over the archived tables — the engine's equivalent
  * of the reference's `utils-dev/s3_parquet_query.py` CLI (§3.2): every
  * CLI flag becomes one DataFrame verb, and partition pruning / predicate
  * pushdown / parallel reads come from Catalyst instead of hand-rolled S3
  * listing.
  *
  * API mirrors `query_table(table, filters, columns, limit, days_back)`
  * (`s3_parquet_query.py:90-158`) and its derived entry points
  * `get_deleted_records`, `get_user_history`, `get_operation_summary`
  * (`:160-210`).
  */
final class QueryTool(spark: SparkSession, root: String) {

  /** Equality / isin filters + projection + deterministic limit (T4).
    * Filters land on the scan (Parquet pushdown); the orderBy before limit
    * makes results reproducible across partitionings.
    */
  def queryTable(
      table: String,
      filters: Map[String, Any] = Map.empty,
      columns: Seq[String] = Nil,
      limit: Int = 1000,
      orderBy: Seq[String] = Nil): DataFrame = {
    var df = load(table)
    filters.foreach { case (c, v) =>
      df = v match {
        case vs: Seq[_] => df.filter(col(c).isin(vs: _*))
        case one => df.filter(col(c) === one)
      }
    }
    if (columns.nonEmpty) df = df.select(columns.map(col): _*)
    val ordered =
      if (orderBy.nonEmpty) df.orderBy(orderBy.map(col): _*)
      else if (columns.nonEmpty) df.orderBy(columns.map(col): _*)
      else df
    ordered.limit(limit)
  }

  /** T5 — deleted-only view of a CDC table. */
  def deletedRecords(table: String, limit: Int = 1000): DataFrame =
    queryTable(table, filters = Map("__op" -> "d"), limit = limit)

  /** User history sorted by change time (`get_user_history`). */
  def userHistory(table: String, idCol: String, id: Long): DataFrame =
    load(table).filter(col(idCol) === id).orderBy(col("__ts_ms"))

  /** A6/T6 — per-operation summary with decoded op names and first/last
    * change timestamps (`get_operation_summary`).
    */
  def operationSummary(table: String): DataFrame =
    load(table)
      .withColumn("operation", QueryTool.decodeOp(col("__op")))
      .groupBy("operation")
      .agg(
        count(lit(1)).as("n"),
        min(col("__ts_ms")).as("first_ts_ms"),
        max(col("__ts_ms")).as("last_ts_ms"))
      .orderBy("operation")

  private def load(table: String): DataFrame =
    spark.read.parquet(s"$root/$table")
}

object QueryTool {
  /** T6 — op-code decode with passthrough default
    * (`s3_parquet_query.py:190-198`).
    */
  def decodeOp(op: Column): Column =
    when(op === "c", "CREATE/INSERT")
      .when(op === "u", "UPDATE")
      .when(op === "d", "DELETE")
      .when(op === "r", "READ/SNAPSHOT")
      .otherwise(op)
}
