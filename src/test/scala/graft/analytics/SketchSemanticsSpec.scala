package graft.analytics

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SketchSemanticsSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("x8 verdict row: exact total agrees, merged estimate within 2%") {
    val row = SketchQueries.x8HllMergeable.run(spark, sf01).head()
    val exact = Tables.load(spark, sf01, "events")
      .agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(row.getAs[Long]("exact_total") === exact)
    assert(row.getAs[Long]("within_2pct") === 1L,
      "merged daily HLL estimate drifted more than 2% from exact")
  }

  test("merged daily sketches estimate the overall distinct, not the sum") {
    val ev = Tables.load(spark, sf01, "events")
    val daily = ev.groupBy(to_date(col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("sk"),
        countDistinct(col("user_id")).as("exact_daily"))
    val r = daily.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"),
      sum(col("exact_daily")).as("sum_daily")).head()
    // users recur across days: the union must deduplicate, so the merged
    // estimate sits far below the sum of per-day exact counts
    assert(r.getLong(0) < r.getLong(1))
  }

  test("sketch union is associative across grouping grains") {
    val ev = Tables.load(spark, sf01, "events")
    val byDay = ev.groupBy(to_date(col("ts")).as("d"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    val byType = ev.groupBy("event_type")
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    // same underlying set → same estimate regardless of partial grouping
    assert(byDay === byType)
  }
}
