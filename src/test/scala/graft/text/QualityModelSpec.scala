package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** T28 model-based quality scorer: the learned contrast must separate its
  * own training classes in the mean (guaranteed up to ppm flooring — the
  * class-mean score difference is Σ(rate_hi − rate_bg)² ≥ 0), and the
  * verdict columns must be internally consistent.
  */
class QualityModelSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  test("t28 scores separate curated from background in the mean") {
    val out = TextQueries.t28QualityModel.run(spark, sf01)
    val m = out.groupBy("is_curated")
      .agg(avg(col("score_ppm")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(m(true) > m(false),
      s"curated mean ${m(true)} must exceed background mean ${m(false)}")
  }

  test("t28 verdict columns are consistent and bounded") {
    val rows = TextQueries.t28QualityModel.run(spark, sf01).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (nToks, wsum, score, selected) =
        (r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6))
      assert(nToks > 0)
      assert(selected === (wsum > 0))
      assert(math.abs(score - wsum.toDouble / nToks) < 1e-9)
      // a ppm rate contrast can never exceed ±1e6 per token
      assert(math.abs(score) <= 1e6)
    }
  }

  test("t28 model is vocabulary-bounded and broadcast for scoring") {
    // audited on the PURE scoring plan: since r16 the consumer-facing
    // frame is a lineage-truncated memo (task-binary fix), so the
    // broadcast join is invisible in downstream executed plans
    val plan = TextQueries.scoredQualityPlan(spark, sf01)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"scoring join must broadcast the vocabulary-bounded model:\n$plan")
  }
}
