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
}
