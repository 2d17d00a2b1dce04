package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RefreshingDimensionSpec extends SparkSpec {

  test("loads once within TTL, reloads after expiry, swaps snapshots") {
    import spark.implicits._
    var now = 0L
    var version = 0
    val dim = new RefreshingDimension(
      load = { s =>
        version += 1
        Seq((1L, s"tier-v$version"), (2L, "gold")).toDF("k", "user_tier")
      },
      ttlMs = 1000,
      clock = () => now)

    assert(dim.current(spark).count() === 2)
    assert(dim.loadCount === 1)
    now = 500 // within TTL: cached
    dim.current(spark)
    assert(dim.loadCount === 1)
    now = 1500 // expired: reload picks up new version
    val v2 = dim.current(spark).filter(col("k") === 1).head().getString(1)
    assert(dim.loadCount === 2)
    assert(v2 === "tier-v2")
  }

  test("enrich broadcast-joins with default on miss (J5 semantics)") {
    import spark.implicits._
    val dim = new RefreshingDimension(
      load = _ => Seq((1L, "gold"), (2L, "silver")).toDF("k", "user_tier"),
      ttlMs = Long.MaxValue)
    val batch = Seq((1L, "e1"), (2L, "e2"), (99L, "e3")).toDF("user_id", "event")
    val out = dim.enrich(batch, "user_id", "k", "user_tier", "unknown")
    val byUser = out.collect().map(r =>
      r.getLong(0) -> r.getString(2)).toMap
    assert(byUser === Map(1L -> "gold", 2L -> "silver", 99L -> "unknown"))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("Broadcast"), s"dimension join must broadcast:\n$plan")
  }

  test("enrich keeps the batch key when batch and dim share the key name") {
    import spark.implicits._
    val dim = new RefreshingDimension(
      load = _ => Seq((1L, "gold")).toDF("user_id", "user_tier"),
      ttlMs = Long.MaxValue)
    val batch = Seq((1L, "e1"), (2L, "e2")).toDF("user_id", "event")
    val out = dim.enrich(batch, "user_id", "user_id", "user_tier", "unknown")
    assert(out.columns.count(_ == "user_id") === 1)
    val byUser = out.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(byUser === Map(1L -> "gold", 2L -> "unknown"))
  }
}
