package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** End-to-end MV freshness: events landing in the source must be visible
  * through the merge-on-read serving path within the reference's 5-second
  * target (`realtime-analytics-speed-layer/tasks.md:163`).
  */
class FreshnessSpec extends SparkSpec {

  test("event-landed to dashboard-visible p95 under 5 seconds") {
    val base = Files.createTempDirectory("graft-fresh").toString
    val r = Freshness.measure(spark, base,
      nBatches = 4, eventsPerBatch = 200, triggerMs = 200, timeoutSec = 30)
    assert(r.timedOut === 0, "every batch must become visible")
    assert(r.completed === 4)
    assert(r.p95 < 5.0, s"freshness p95 ${r.p95}s exceeds the 5s target")
    // samples are real waits, not clock noise
    assert(r.samples.forall(_ > 0.0))
  }
}
