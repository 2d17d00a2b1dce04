package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST21 — streaming CUSUM drift alarm: the e11 changepoint monitor
  * ([[graft.analytics.ExtendedSqlQueries.e11CusumChangepoint]]) as a
  * LIVE per-series gate — "did this fact stream's volume shift?" asked
  * continuously, one O(1) state cell per monitored series instead of a
  * rescan of history per audit.
  *
  * The QualityGate/TopicDrift freeze discipline: each observation
  * arrives PRE-ENRICHED with its series' in-control baseline
  * (total_pre, n_pre — fit from trusted history and broadcast-joined
  * upstream; a live stream must never re-derive its own baseline, or
  * the drift it should detect would move the reference). The fold is
  * e11's exact integer rule — dev = n_pre·x − total_pre − total_pre/10
  * (allowance k = δ/2 for the +20% design shift), S = max(0, S + dev),
  * alarm at S ≥ 2·total_pre — so stream ≡ batch is an integer equality,
  * which [[CusumGateSpec]] pins against both the textbook recursion and
  * the e11 engine output on the same series.
  *
  * Scale posture: state per series is THREE longs (frontier, running
  * statistic, first alarm) — a year-long series costs the same state as
  * a day-old one; periods at or before the frontier are ignored
  * (ordered-log replay contract, monotone like the funnel fold);
  * RocksDB-backed via the session default. 10⁶ monitored series =
  * 10⁶ × 24 bytes of state, not 10⁶ retained histories.
  */
object CusumGate {

  /** One period observation for one monitored series, pre-enriched with
    * the series' frozen baseline.
    */
  final case class Obs(key: String, t: Long, x: Long,
    total_pre: Long, n_pre: Long)

  /** O(1) per-series state. `first_alarm_t` = -1 until the first
    * threshold crossing, then latched (an alarm never un-fires).
    */
  final case class CusumState(frontier_t: Long, s: Long, first_alarm_t: Long)

  final case class CusumOut(key: String, t: Long, stat: Long,
    alarmed: Boolean, first_alarm_t: Long)

  val empty: CusumState = CusumState(-1L, 0L, -1L)

  /** Pure per-series fold (unit-testable without a streaming query),
    * e11's integer CUSUM rule. Observations sort by period; periods at
    * or before the frontier are dropped.
    */
  def fold(prev: CusumState, obs: Seq[Obs]): CusumState = {
    var st = prev
    obs.sortBy(_.t).foreach { o =>
      if (o.t > st.frontier_t) {
        val dev = o.n_pre * o.x - o.total_pre - o.total_pre / 10
        val s = math.max(0L, st.s + dev)
        val alarm =
          if (st.first_alarm_t < 0 && s >= 2 * o.total_pre) o.t
          else st.first_alarm_t
        st = CusumState(o.t, s, alarm)
      }
    }
    st
  }

  /** Wire the stateful operator onto a (streaming) Dataset of enriched
    * observations. Emits each touched series' current statistic and
    * latched alarm every micro-batch (Update mode — last-write-wins per
    * key gives the live alarm table).
    */
  def alarms(obs: Dataset[Obs]): Dataset[CusumOut] = {
    val s = obs.sparkSession
    import s.implicits._
    obs
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[Obs], state: GroupState[CusumState]) => {
          val next = fold(state.getOption.getOrElse(empty), it.toSeq)
          state.update(next)
          Iterator.single(CusumOut(key, next.frontier_t, next.s,
            next.first_alarm_t >= 0, next.first_alarm_t))
        })
  }
}
