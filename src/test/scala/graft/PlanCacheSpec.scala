package graft

import org.apache.spark.storage.StorageLevel

class PlanCacheSpec extends SparkSpec {

  test("persisted memoizes per (session, key) and clear evicts + unpersists") {
    import spark.implicits._
    var builds = 0
    def build() = { builds += 1; Seq(1, 2, 3).toDF("n") }

    val a = PlanCache.persisted(spark, "plancache-spec-a")(build())
    val b = PlanCache.persisted(spark, "plancache-spec-a")(build())
    assert(builds === 1, "same key must not rebuild")
    assert(a eq b)
    assert(a.storageLevel === StorageLevel.MEMORY_AND_DISK)

    PlanCache.clear(spark)
    assert(a.storageLevel === StorageLevel.NONE, "clear must unpersist")
    PlanCache.persisted(spark, "plancache-spec-a")(build())
    assert(builds === 2, "cleared entry must rebuild on next use")
    PlanCache.clear(spark)
  }

  test("checkpointed memoizes a lineage-truncated frame; clear evicts it") {
    import spark.implicits._
    var builds = 0
    def build() = { builds += 1; Seq(1, 2, 3).toDF("n") }
    val a = PlanCache.checkpointed(spark, "plancache-spec-ck")(build())
    val b = PlanCache.checkpointed(spark, "plancache-spec-ck")(build())
    assert(builds === 1 && (a eq b))
    // the memoized frame's plan is the checkpoint scan, not the build —
    // the task-binary property the variant exists for
    assert(a.queryExecution.optimizedPlan.toString.contains("ExistingRDD") ||
      a.queryExecution.optimizedPlan.toString.contains("LogicalRDD"))
    assert(a.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 3))
    PlanCache.clear(spark)
    PlanCache.checkpointed(spark, "plancache-spec-ck")(build())
    assert(builds === 2, "cleared checkpointed entry must rebuild")
    PlanCache.clear(spark)
  }

  test("clearMatching evicts only keys containing the substring") {
    import spark.implicits._
    val keep = PlanCache.persisted(spark, "plancache-spec-keep/dirA")(
      Seq(1).toDF("n"))
    val drop = PlanCache.persisted(spark, "plancache-spec-drop/dirB")(
      Seq(2).toDF("n"))
    keep.count(); drop.count()
    PlanCache.clearMatching(spark, "/dirB")
    assert(drop.storageLevel === StorageLevel.NONE,
      "matching entry must unpersist")
    assert(keep.storageLevel !== StorageLevel.NONE,
      "non-matching entry must survive")
    // an evicted key rebuilds; the surviving key does not
    var rebuilt = false
    PlanCache.persisted(spark, "plancache-spec-drop/dirB") {
      rebuilt = true; Seq(2).toDF("n")
    }
    assert(rebuilt)
    PlanCache.persisted(spark, "plancache-spec-keep/dirA") {
      fail("surviving key must not rebuild")
    }
    PlanCache.clear(spark)
  }
}
