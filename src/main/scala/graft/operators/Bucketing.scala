package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (pre-partitioned) tables for co-located joins — the
  * write-once/shuffle-never layout for repeated large-table joins at
  * 100 TB. Writing both sides bucketed+sorted on the join key lets every
  * subsequent sort-merge join read matching buckets directly: zero
  * Exchange in the plan, the single biggest cost cut for fact-to-fact
  * joins that run daily.
  *
  * (Reference counterpart: Snowflake `CLUSTER BY` on every warehouse
  * table — `.kiro/specs/batch-analytics-layer/design.md:327-613` — and
  * Iceberg sort orders; SURVEY §4 "clustering keys for scan locality".)
  */
object Bucketing {

  /** Persist `df` as a bucketed, bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String): Unit =
    df.write
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode("overwrite")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key. With equal bucket
    * counts this plans as an exchange-free sort-merge join.
    */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
