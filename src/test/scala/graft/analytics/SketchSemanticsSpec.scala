package graft.analytics

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

class SketchSemanticsSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("merged daily sketches estimate the overall distinct within 5%") {
    val row = SketchQueries.x8HllMergeable.run(spark, sf01).head()
    val estimate = row.getAs[Long]("merged_estimate").toDouble
    val exact = Tables.load(spark, sf01, "events")
      .agg(countDistinct(col("user_id"))).head().getLong(0)
    val err = math.abs(estimate - exact) / exact
    assert(err < 0.05, s"HLL error $err (estimate $estimate vs exact $exact)")
    // merging daily partials must NOT equal the sum of dailies (overlap)
    assert(estimate < row.getAs[Long]("sum_daily_exact"))
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
