package graft

import org.apache.spark.sql.functions._

/** Runtime (adaptive) optimizations the 100 TB deployment leans on, pinned
  * at test scale by lowering the activation thresholds — the plan
  * features are the same ones a production cluster gets at default
  * thresholds with real data sizes:
  *
  *  - AQE skew-join split: a hot join key whose shuffle partition dwarfs
  *    the others is split into sub-partitions at runtime (the automatic
  *    complement to the deterministic salting in `graft.operators.Skew`,
  *    which remains the reproducible-plan path).
  *  - Runtime bloom-filter join pruning: a selective dimension filter is
  *    turned into a bloom filter applied to the fact side BEFORE the join
  *    shuffle, cutting shuffled rows to ~the join's output size.
  */
class RuntimeOptimizationSpec extends SparkSpec {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true reader)") {
    import spark.implicits._
    // one pathological key: 200k rows of key 0 vs 2k spread over the rest
    val left = spark.range(200000).select(
        when(col("id") < 198000, 0L).otherwise(col("id") % 1000).as("k"),
        col("id").as("v"))
    val right = spark.range(1000).select(col("id").as("k"), (col("id") * 7).as("w"))
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true") {
      val joined = left.join(right, "k")
      // execute THIS dataset's QueryExecution: count()/write() build their
      // own plans, and an unexecuted AQE plan never finalizes
      assert(joined.collect().length === 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), s"AQE did not finalize:\n$plan")
      assert(plan.contains("skew=true"),
        s"skewed partition was not split at runtime:\n$plan")
    }
  }

  test("runtime bloom filter prunes the fact side before the join shuffle") {
    // selective dim filter (1% of keys) over a fact too big to broadcast
    val fact = spark.range(300000).select((col("id") % 30000).as("k"),
      col("id").as("v"))
    val dim = spark.range(30000).select(col("id").as("k"),
      (col("id") % 100).as("cat"))
    withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0") {
      val joined = fact.join(dim.filter(col("cat") === 3), "k")
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      // semantics unchanged: 30000/100 dim keys x 10 fact rows each
      assert(joined.count() === 3000L)
    }
  }
}
