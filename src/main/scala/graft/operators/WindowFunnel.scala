package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N-step ordered window funnel in LINEAR per-user work — the a19
  * rewrite ([[graft.analytics.EventQueries.funnelLevels]]) factored
  * into an operator for ANY step sequence: per user, the deepest prefix
  * of `steps` reachable by events with STRICTLY increasing timestamps
  * where the whole chain fits in `T` of its first step (ClickHouse
  * `windowFunnel` semantics).
  *
  * The anchor recurrence that removes pair materialization, generalized:
  *  - A₁(e) = latest step-1 time strictly before e;
  *  - Aᵢ(e) = max over step-i events f strictly before e of Aᵢ₋₁(f) —
  *    maximizing the anchor is optimal because chain validity is ONE
  *    test at the end (t_j ≤ anchor + T implies every intermediate gap
  *    fits, timestamps being increasing), and a larger anchor can only
  *    add slack;
  *  - level j is reached iff some step-j event e has us ≤ Aⱼ₋₁(e) + T
  *    (flags are prefix-monotone: the anchor chain that satisfies level
  *    j contains a witness for level j−1).
  * Each Aᵢ is one strictly-earlier range-frame running max — N−1
  * stacked window columns over the SAME partitioning and sort, so
  * Catalyst plans ONE exchange + ONE sort for the whole cascade, and
  * the final groupBy rides the window's hash partitioning. Work is
  * O(N · events-per-user); a bot-grade key never materializes pairs.
  */
object WindowFunnel {

  /** (user_id, level) for a `(user_id, event_type, us)` frame. */
  def levels(events: DataFrame, steps: Seq[String], T: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    val before = Window.partitionBy("user_id").orderBy(col("us"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val withAnchors = steps.indices.tail.foldLeft(
        events.withColumn("a1",
          max(when(col("event_type") === steps.head, col("us")))
            .over(before))) { (df, i) =>
      if (i == steps.size - 1) df // the last step needs no further anchor
      else df.withColumn(s"a${i + 1}",
        max(when(col("event_type") === steps(i), col(s"a$i"))).over(before))
    }
    val flags =
      max(when(col("event_type") === steps.head, 1).otherwise(0)).as("l1") +:
        steps.indices.tail.map(j =>
          max(when(col("event_type") === steps(j) &&
            col("us") <= col(s"a$j") + T, 1).otherwise(0)).as(s"l${j + 1}"))
    withAnchors.groupBy("user_id")
      .agg(flags.head, flags.tail: _*)
      .select(col("user_id"),
        steps.indices.map(j => col(s"l${j + 1}"))
          .reduce(_ + _).cast("long").as("level"))
  }
}
