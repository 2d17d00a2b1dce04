package graft.streaming

import graft.SparkSpec
import java.nio.file.Files

/** End-to-end MV freshness: events landing in the source must be visible
  * through the merge-on-read serving path within the reference's 5-second
  * target (`realtime-analytics-speed-layer/tasks.md:163`).
  */
class FreshnessSpec extends SparkSpec {

  test("event-landed to dashboard-visible median under 5 seconds") {
    val base = Files.createTempDirectory("graft-fresh").toString
    val r = Freshness.measure(spark, base,
      nBatches = 4, eventsPerBatch = 200, triggerMs = 200, timeoutSec = 30)
    assert(r.timedOut === 0, "every batch must become visible")
    assert(r.warmupOk, "warmup batch must become visible")
    assert(r.completed === 4)
    // median, not p95: with 4 samples p95 IS the max, and one GC pause or
    // noisy-neighbor stall on a loaded box would fail the build with no
    // code defect. The bench's 8-batch run reports the honest p95.
    assert(r.p50 < 5.0, s"freshness median ${r.p50}s exceeds the 5s target")
    // samples are real waits, not clock noise
    assert(r.samples.forall(_ > 0.0))
  }
}
