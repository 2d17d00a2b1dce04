package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST23 — live multi-touch attribution: the w14 credit models
  * ([[graft.analytics.EventQueries.w14MultiTouch]]) computed AT PURCHASE
  * TIME instead of by a retrospective interval join — the number a
  * marketing dashboard bills the moment the conversion lands.
  *
  * State per user is the touch buffer the 24 h lookback needs and
  * NOTHING OLDER: each incoming event first evicts touches beyond the
  * window behind it (event-time eviction — the state bound is
  * touches-per-user-per-window, the same quantity the batch plan's
  * per-purchase window partition is bounded by, NOT per-user history);
  * a view/click appends to the buffer; a purchase computes both credit
  * splits over the strictly-earlier in-window touches — the exact
  * integer rules of w14, remainders parked on the last touch so each
  * purchase's credits sum to its cents on emission.
  *
  * Ordering contract (the funnel/CUSUM fold rule): events process in
  * event-time order within a batch (the fold sorts by (us, event_id))
  * and batches arrive in order; a purchase sharing its timestamp with a
  * touch never credits it (strict `<`, tie-safe across batch splits
  * because the buffer filter — not arrival order — decides).
  * [[graft.streaming.StreamingAttributionSpec]] pins streamed credits ≡
  * the single-threaded brute force of w14's semantics over random event
  * soups, across batch splits and a checkpoint restart.
  */
object StreamingAttribution {

  final case class AttrEvent(user_id: Long, event_type: String, us: Long,
    event_id: Long, cents: Long)

  final case class Touch(us: Long, event_id: Long, touch_type: String)

  /** Buffer of in-window touches + the event-time frontier.
    * `frontier_ids` holds the event_ids already processed AT the
    * frontier timestamp: ties split across batches must still be
    * admitted (us == frontier), so id-tracking is what makes an
    * at-least-once source redelivering a frontier-timestamp event a
    * no-op instead of a double-appended touch or re-emitted credit.
    * Bounded by construction — only ids sharing one microsecond
    * timestamp; it resets the moment the frontier advances.
    */
  final case class AttrState(frontier_us: Long, touches: Seq[Touch],
    frontier_ids: Seq[Long])

  /** One credit emission: a purchase paying one touchpoint. The touch
    * id is part of the row identity — two middle touches of the same
    * purchase legitimately carry equal amounts (the x59 lesson: never
    * let value-equal rows collapse). */
  final case class Credit(user_id: Long, purchase_id: Long,
    touch_id: Long, touch_type: String, lin_cents: Long, u_cents: Long)

  val empty: AttrState = AttrState(Long.MinValue, Seq.empty, Seq.empty)

  /** Pure per-user fold — returns (next state, emitted credits). */
  def fold(prev: AttrState, events: Seq[AttrEvent],
      T: Long): (AttrState, Seq[Credit]) = {
    var st = prev
    val out = Seq.newBuilder[Credit]
    events.sortBy(e => (e.us, e.event_id)).foreach { e =>
      if (e.us > st.frontier_us ||
          (e.us == st.frontier_us && !st.frontier_ids.contains(e.event_id))) {
        // event-time eviction: nothing older than the window survives
        val kept = st.touches.filter(_.us >= e.us - T)
        st = AttrState(e.us, kept,
          if (e.us > st.frontier_us) Seq(e.event_id)
          else st.frontier_ids :+ e.event_id)
        e.event_type match {
          case "view" | "click" =>
            st = st.copy(touches = st.touches :+
              Touch(e.us, e.event_id, e.event_type))
          case "purchase" =>
            val ts = st.touches
              .filter(t => t.us < e.us && t.us >= e.us - T)
              .sortBy(t => (t.us, t.event_id))
            val n = ts.size.toLong
            if (n > 0) {
              val uBp = ts.zipWithIndex.map { case (_, i) =>
                if (n == 1) 10000L else if (n == 2) 5000L
                else if (i == 0 || i + 1 == n) 4000L else 2000L / (n - 2)
              }
              val uBase = uBp.map(bp => e.cents * bp / 10000L)
              ts.zipWithIndex.foreach { case (t, i) =>
                val last = i + 1 == n
                out += Credit(e.user_id, e.event_id, t.event_id,
                  t.touch_type,
                  e.cents / n + (if (last) e.cents % n else 0L),
                  uBase(i) + (if (last) e.cents - uBase.sum else 0L))
              }
            }
          case _ => ()
        }
      } // else: straggler strictly older than the frontier (its window
        // has passed — ordered-log contract) or a redelivered duplicate
        // of an already-processed frontier-timestamp event. Together
        // these make fold replay-idempotent under at-least-once
        // delivery: a duplicate arrives either at the still-current
        // frontier (caught by frontier_ids) or after it advanced
        // (caught by the straggler rule).
    }
    (st, out.result())
  }

  /** Wire the stateful operator: every purchase's credit rows emit in
    * the micro-batch the purchase arrives in (Append mode — credits are
    * facts, never revised; the census is one downstream groupBy).
    *
    * Delivery contract: at-least-once input is safe — a redelivered
    * event is dropped by the fold (frontier_ids for frontier-timestamp
    * duplicates, the straggler rule for older ones), so no touch is
    * double-appended and no purchase re-emits credits. The ordering
    * contract (batches in event-time order) still governs completeness:
    * a straggler's window has passed and it earns nothing.
    */
  def credits(events: Dataset[AttrEvent],
      T: Long = 86400000000L): Dataset[Credit] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (uid: Long, evs: Iterator[AttrEvent], state: GroupState[AttrState]) => {
          val (next, out) = fold(state.getOption.getOrElse(empty),
            evs.toSeq, T)
          state.update(next)
          out.iterator
        })
  }
}
