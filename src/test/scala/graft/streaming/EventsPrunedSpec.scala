package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Schema-pruned event parsing: identical validation verdicts to the full
  * parse on every payload shape, typed-surface reconstruction for the
  * omitted fields, and the three speed-layer consumers' exact pruning
  * bargains (funnel never reads properties, sessions never read
  * session_id, DLQ reads only the validation fields).
  */
class EventsPrunedSpec extends SparkSpec {
  import spark.implicits._

  private val payloads = Seq(
    // valid, all fields
    """{"event_id":"e1","user_id":7,"session_id":"s7","event_type":"purchase",
      |"ts":"2026-01-01 10:00:00.000","user_tier":"premium",
      |"properties":"{\"amount\": 42}"}""".stripMargin.replace("\n", ""),
    // invalid: unknown type
    """{"event_id":"e2","user_id":8,"event_type":"bogus","ts":"2026-01-01 10:00:01.000"}""",
    // invalid: missing user_id
    """{"event_id":"e3","event_type":"login","ts":"2026-01-01 10:00:02.000"}""",
    // invalid: malformed ts
    """{"event_id":"e4","user_id":9,"event_type":"login","ts":"not-a-time"}""",
    // not JSON at all
    """garbage{{""")

  private def raw = payloads.toDF("value")

  test("pruned parse renders the SAME validation verdict as the full parse") {
    val full = Events.parse(raw)
      .select(col("value"), col("validation_errors"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    for (extra <- Seq(Nil, Seq("user_tier"), Seq("session_id", "user_tier"),
        Seq("user_tier", "properties"))) {
      val pruned = Events.parsePruned(raw, extra)
        .select(col("value"), col("validation_errors"))
        .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
      assert(pruned === full, s"verdict drift with extra=$extra")
    }
  }

  test("validPruned restores the full typed surface; omitted fields are NULL") {
    val ev = Events.validPruned(
      Events.parsePruned(raw, Seq("session_id", "user_tier"))).collect()
    assert(ev.map(_.event_id).toSeq === Seq("e1"))
    assert(ev.head.session_id === "s7" && ev.head.user_tier === "premium")
    assert(ev.head.properties === null, "omitted field must be typed NULL")
    // and the full-parse valid() agrees on the surviving rows
    val fullValid = Events.valid(Events.parse(raw)).collect()
    assert(fullValid.map(_.event_id).toSeq === Seq("e1"))
  }

  test("consumer pruning bargains hold: funnel and sessions agree with the " +
    "full-parse pipeline on their own outputs") {
    // funnel over pruned events (no properties) ≡ funnel over full events
    val funnelPruned = StreamingAggs.funnel(
      Events.validPruned(Events.parsePruned(raw, Seq("session_id", "user_tier"))),
      watermark = None).collect().map(_.toSeq)
    val funnelFull = StreamingAggs.funnel(
      Events.valid(Events.parse(raw)), watermark = None).collect().map(_.toSeq)
    assert(funnelPruned.toSet === funnelFull.toSet)
    // session fold over pruned events (no session_id) ≡ over full events
    val foldPruned = Sessionization.fold(None,
      Events.validPruned(Events.parsePruned(raw,
        Seq("user_tier", "properties"))).collect().toSeq)
    val foldFull = Sessionization.fold(None,
      Events.valid(Events.parse(raw)).collect().toSeq)
    assert(foldPruned === foldFull)
    assert(foldPruned.get.total_spent_cents === 4200L,
      "properties must survive the sessions-side pruning (spend extraction)")
  }

  test("cpu probe returns sane, positive rates") {
    val r = graft.CpuProbe.run(threads = 2)
    assert(r.singleMops > 0 && r.allCoreMops > 0)
    assert(r.threads === 2)
    // compact shape parses as a two-element array
    assert(r.toJsonCompact.matches("""\[\d+,\d+\]"""))
  }
}
