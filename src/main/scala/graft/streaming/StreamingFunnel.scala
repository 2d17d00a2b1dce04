package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST17 — live ordered-step window funnel: the streaming twin of
  * a19_window_funnel ([[graft.analytics.EventQueries.funnelLevels]]),
  * the ClickHouse-`windowFunnel` semantics the reference's speed layer
  * is patterned on, kept incrementally per user.
  *
  * State per user is THREE numbers + three booleans — exactly the
  * aggregates the linear batch plan computes with its two range-frame
  * window maxes:
  *  - `max_view_us`  — latest view so far (a future click's best anchor);
  *  - `best_anchor_us` — max over clicks so far of THEIR anchor (a future
  *    purchase's best chain);
  *  - the monotone l1/l2/l3 level flags.
  * Each event folds in O(1); state never grows with event count — a
  * bot-grade user costs the same state as a one-event user (the batch
  * rewrite's linearity argument, made incremental). RocksDB-backed via
  * the session default; keys expire with an optional event-time timeout.
  *
  * Ordering contract (same as every event-time fold here): events are
  * processed in event-time order WITHIN each micro-batch (the fold
  * sorts), and batches must arrive in event-time order for stream ≡
  * batch to be an equality — an event strictly older than a user's
  * already-processed frontier is dropped by the fold, so contract
  * violations can only under-count (flags are monotone, never
  * wrong-level-up; evaluating a straggler would instead compare it
  * against views that happened after it and silently over-count).
  * Replay from an ordered log (the Kafka/file source
  * contract) satisfies this; [[graft.streaming.StreamingFunnelSpec]]
  * pins streamed ≡ batch across arbitrary in-order batch splits and a
  * checkpoint restart.
  */
object StreamingFunnel {

  final case class FunnelEvent(user_id: Long, event_type: String, us: Long)

  /** The strictly-earlier range frame, made incremental: `*_settled`
    * values come from events strictly BEFORE `frontier_us`; `*_frontier`
    * values from events AT the frontier timestamp. An event at the
    * frontier evaluates against the settled values only (ties never
    * chain — even when a micro-batch boundary splits the tie), and the
    * frontier folds into settled the moment a strictly later timestamp
    * arrives. Without the split, a view@t landing in batch N would
    * wrongly anchor a click@t in batch N+1.
    */
  final case class FunnelState(
      frontier_us: Long,          // newest processed timestamp (-1 = none)
      max_view_settled: Long,     // latest view strictly before frontier
      max_view_frontier: Long,    // latest view at the frontier
      best_anchor_settled: Long,  // max click-anchor strictly before frontier
      best_anchor_frontier: Long, // max click-anchor at the frontier
      l1: Boolean, l2: Boolean, l3: Boolean)

  final case class FunnelOut(user_id: Long, level: Int)

  val empty: FunnelState =
    FunnelState(-1L, -1L, -1L, -1L, -1L, l1 = false, l2 = false, l3 = false)

  def levelOf(s: FunnelState): Int =
    (if (s.l1) 1 else 0) + (if (s.l2) 1 else 0) + (if (s.l3) 1 else 0)

  /** Pure per-user fold, unit-testable without a streaming query.
    * Events sort by `us`; each evaluates against the settled (strictly
    * earlier) values only, exactly like the batch plan's range frame.
    */
  def fold(prev: FunnelState, events: Seq[(String, Long)], T: Long): FunnelState = {
    var st = prev
    // Strictly-late stragglers (t < frontier) are DROPPED, not evaluated:
    // a late click would otherwise compare against max_view_settled, which
    // can contain a view that occurred AFTER the click — silently
    // over-counting under a violated ordering contract. Dropping keeps the
    // "out-of-order can only under-count" guarantee unconditional. Events
    // AT the frontier are admitted (the cross-batch tie-split below needs
    // them) and are replay-idempotent — every state update is max()/||.
    events.filter(_._2 >= st.frontier_us).sortBy(_._2).foreach { case (typ, t) =>
      if (t > st.frontier_us) // a later timestamp settles the frontier
        st = st.copy(frontier_us = t,
          max_view_settled = math.max(st.max_view_settled, st.max_view_frontier),
          max_view_frontier = -1L,
          best_anchor_settled =
            math.max(st.best_anchor_settled, st.best_anchor_frontier),
          best_anchor_frontier = -1L)
      typ match {
        case "view" =>
          st = st.copy(l1 = true,
            max_view_frontier = math.max(st.max_view_frontier, t))
        case "click" =>
          if (st.max_view_settled >= 0L) {
            val l2 = st.l2 || t <= st.max_view_settled + T
            st = st.copy(l2 = l2, best_anchor_frontier =
              math.max(st.best_anchor_frontier, st.max_view_settled))
          }
        case "purchase" =>
          if (st.best_anchor_settled >= 0L && t <= st.best_anchor_settled + T)
            st = st.copy(l3 = true)
        case _ => ()
      }
    }
    st
  }

  /** Wire the stateful operator onto a (streaming) Dataset. Emits each
    * touched user's CURRENT funnel level every micro-batch (Update
    * mode) — last-write-wins on user_id gives the live level table; a
    * groupBy(level) downstream gives the live a19 histogram.
    */
  def levels(events: Dataset[FunnelEvent],
      T: Long = 86400000000L): Dataset[FunnelOut] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[FunnelEvent], state: GroupState[FunnelState]) => {
          val next = fold(state.getOption.getOrElse(empty),
            evs.map(e => (e.event_type, e.us)).toSeq, T)
          state.update(next)
          Iterator.single(FunnelOut(uid, levelOf(next)))
        })
  }
}
