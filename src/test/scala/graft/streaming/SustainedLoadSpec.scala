package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SustainedLoad]] end-to-end contract at a test-sized rate: the full
  * parse→DLQ→dedup→{funnel MV, sessions} pipeline keeps up with the
  * offered rate, exactly 2% of events exit via the DLQ, and every valid
  * event becomes MV-visible (caught_up) with measured e2e samples.
  */
class SustainedLoadSpec extends SparkSpec {

  test("sustained load: 2% DLQ, sessions emitted, MV catches up") {
    val base = java.nio.file.Files.createTempDirectory("graft-sustain").toString
    val r = SustainedLoad.run(spark, base,
      targetEps = 4000, durationSec = 5,
      eventsPerFile = 1000, triggerMs = 250, catchupTimeoutSec = 120)

    assert(r.files === 20, s"expected 20 files, got ${r.files}")
    assert(r.producedEvents === 20000L)
    assert(r.validEvents === 19600L)
    // the DLQ must receive EXACTLY the 2% planted invalid events — a
    // miswired validation (or a parse regression nulling whole rows)
    // shows up here as 100% DLQ
    assert(r.dlqRows === r.producedEvents / 50,
      s"DLQ must get exactly 2%, got ${r.dlqRows} of ${r.producedEvents}")
    assert(r.sessionRows > 0, "sessionization must emit closed sessions")
    assert(r.caughtUp, s"MV must account for every valid event " +
      s"(catchup ${r.catchupSec}s)")
    assert(r.e2e.nonEmpty && r.p95 > 0,
      "visibility crossings must produce e2e samples")
  }
}
