package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval join without a cartesian.
  *
  * Spark compiles a bare non-equi join (`p BETWEEN lo AND hi`) to
  * BroadcastNestedLoopJoin when one side is small and to a cartesian
  * product + filter otherwise — O(|points| · |intervals|) compared rows,
  * the canonical scale killer for range lookups (IP→range, ts→session,
  * date→campaign window). The reference's ad-hoc SQL surface exposes
  * exactly this shape for date-window rollups; OSS Spark has no range-join
  * optimization (the hint is a proprietary extension), so the engine
  * provides the standard bucketization rewrite as a composed operator:
  *
  *  - points land in bucket `floorDiv(p, w)` — one row each;
  *  - an interval [lo, hi] is replicated to every bucket it overlaps
  *    (`sequence(floorDiv(lo,w), floorDiv(hi,w))` exploded);
  *  - an ordinary EQUI-join on the bucket + the residual BETWEEN filter
  *    compares each point only against intervals overlapping its bucket.
  *
  * One shuffle keyed by bucket (co-partitioned hash/SMJ — never BNLJ or
  * cartesian, whatever the side sizes); interval-side inflation is
  * `avg(span)/w + 1` rows, so pick `w` near the median interval span.
  * A hot bucket (many points under one popular interval region) rides
  * the same AQE skew-split path as any equi-join; extreme interval skew
  * (one interval spanning everything) degrades gracefully to that
  * interval being present in every bucket — still never a cartesian
  * against the other intervals.
  *
  * Arithmetic is exact integer floor-division (negative coordinates
  * bucket correctly; no double rounding), so results equal the naive
  * non-equi join bit for bit ([[graft.operators.RangeJoinSpec]] pins a
  * seeded differential).
  */
object RangeJoin {

  /** Exact floor division on long columns (Spark's `DIV` truncates toward
    * zero, which mis-buckets negatives; `pmod` makes the remainder
    * nonnegative so the subtraction divides exactly).
    */
  private[operators] def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / lit(w)).cast("long")

  /** Data-driven bucket width: the median interval span, computed in-plan
    * with `percentile_approx` (one aggregate over the interval frame — no
    * interval rows reach the driver, only the single scalar). At
    * `w = median span` the median interval replicates to `span/w + 1 ≤ 2`
    * buckets, so total interval-side inflation stays ≈ 2× however the
    * span distribution drifts — a hard-coded width on a 100× corpus with
    * drifted spans silently over-replicates instead. Degenerate inputs
    * (empty frame, all-inverted, all-zero-span) fall back to width 1,
    * which is always correct (buckets = exact points).
    */
  def bucketWidthFor(intervals: DataFrame, lo: String, hi: String): Long = {
    val row = intervals
      .filter(col(lo) <= col(hi))
      .agg(percentile_approx((col(hi) - col(lo) + 1).cast("double"),
        lit(0.5), lit(10000)).as("w"))
      .head()
    if (row.isNullAt(0)) 1L else math.max(1L, row.getDouble(0).toLong)
  }

  /** Inner-join `points` to every interval containing them.
    *
    * @param points      frame with a long point column `point`
    * @param intervals   frame with long interval columns `lo`, `hi`
    *                    (inclusive both ends; rows with lo > hi match
    *                    nothing and are dropped before the explode)
    * @param bucketWidth bucket size in point units (≈ median span)
    */
  def pointInInterval(points: DataFrame, point: String,
      intervals: DataFrame, lo: String, hi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = points.withColumn("__rjb", floorDiv(col(point), bucketWidth))
    val iv = intervals
      .filter(col(lo) <= col(hi))
      .withColumn("__rjb",
        explode(sequence(floorDiv(col(lo), bucketWidth),
          floorDiv(col(hi), bucketWidth))))
    p.join(iv, Seq("__rjb"))
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("__rjb")
  }

  /** Left-outer form of [[pointInInterval]]: points contained in no
    * interval survive with the interval columns null (the "orders outside
    * every campaign" audit shape). `pointKey` must be unique per point
    * row — the unmatched set is the key anti-join against the inner
    * result (two hash joins total, still no cartesian anywhere).
    */
  def pointInIntervalLeft(points: DataFrame, pointKey: String, point: String,
      intervals: DataFrame, lo: String, hi: String,
      bucketWidth: Long): DataFrame = {
    val inner = pointInInterval(points, point, intervals, lo, hi, bucketWidth)
    val unmatched = points.join(
      inner.select(col(pointKey)).distinct(), Seq(pointKey), "left_anti")
    val nullIv = intervals.columns.foldLeft(unmatched)((df, c) =>
      df.withColumn(c, lit(null).cast(intervals.schema(c).dataType)))
    inner.unionByName(nullIv.select(inner.columns.map(col).toIndexedSeq: _*))
  }

  /** Inner-join interval frames on overlap: `[aLo, aHi] ∩ [bLo, bHi] ≠ ∅`
    * (inclusive ends, touching counts). Both sides replicate to their
    * overlapped buckets; a candidate pair meets in EVERY bucket their
    * spans share, so the join additionally requires the bucket to be the
    * one containing the OVERLAP START (`max(aLo, bLo)`) — each matching
    * pair survives in exactly one bucket, no distinct pass, no row
    * explosion past the bucket replication itself.
    */
  def intervalOverlap(left: DataFrame, aLo: String, aHi: String,
      right: DataFrame, bLo: String, bHi: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    def exploded(df: DataFrame, lo: String, hi: String) = df
      .filter(col(lo) <= col(hi))
      .withColumn("__rjb",
        explode(sequence(floorDiv(col(lo), bucketWidth),
          floorDiv(col(hi), bucketWidth))))
    exploded(left, aLo, aHi)
      .join(exploded(right, bLo, bHi), Seq("__rjb"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(col("__rjb") ===
        floorDiv(greatest(col(aLo), col(bLo)), bucketWidth))
      .drop("__rjb")
  }
}
