package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ST12 — streaming quantile monitor: p50/p95/p99 dashboards over an
  * unbounded measure stream with BOUNDED state.
  *
  * No streaming-legal aggregate can hold the values a percentile needs —
  * and it doesn't have to. The one-pass histogram behind
  * [[graft.operators.Percentiles]] is a MERGEABLE sketch: rows bucket by
  * the top `binBits` bits of the order-preserving IEEE-754 transform
  * ([[graft.functions.SortableDoubleBits]] — data-independent, so the
  * binning never moves as data arrives), and per-(group, bin) running
  * counts are an ordinary update-mode streaming aggregation. State is
  * O(groups · occupied bins) counters — the AQE-map-statistics contract,
  * set by configuration, never by stream length.
  *
  * The serve side merges the latest counters and brackets each requested
  * quantile: cumulate bins to locate the one holding the target rank,
  * then invert the bit transform at the bin's edges to get a numeric
  * [lo, hi] interval GUARANTEED to contain the exact percentile. With 16
  * bin bits the interval is sign + exponent + 4 mantissa bits wide —
  * ≈ 3% relative width, far inside any latency-dashboard line — and
  * tightens exponentially with more bits, paid only in counter state.
  *
  * [[graft.streaming.QuantileMonitorSpec]] pins the streamed histogram
  * bit-identical to the batch histogram over the same rows, and the
  * exact batch percentile inside every streamed bracket.
  */
object QuantileMonitor {

  /** (group, bin) projection of a measure frame — streaming and batch
    * sides share this single definition, so parity is structural.
    */
  def binned(df: DataFrame, group: String, value: String,
      binBits: Int = 16): DataFrame = {
    graft.GraftExtensions.ensure(df.sparkSession)
    df.select(col(group).as("g"), col(value).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .select(col("g"), shiftrightunsigned(
        call_function("graft_sortable_bits", col("v")), 64 - binBits).as("bin"))
  }

  /** Update-mode running histogram: pair with
    * [[StreamingAggs.appendPartials]] + [[StreamingAggs.mergeOnRead]]
    * (keys = g, bin) on the serve side.
    */
  def histogram(stream: DataFrame, group: String, value: String,
      binBits: Int = 16): DataFrame =
    binned(stream, group, value, binBits)
      .groupBy("g", "bin").agg(count(lit(1)).as("n"))

  /** Numeric inverse of the sortable-bits transform. The transformed
    * space puts the negative-NaN payloads below -Inf and positive-NaN
    * payloads above +Inf; a bin edge landing in either region must clamp
    * to the infinity, not invert to NaN (NaN edges would poison every
    * min/max/containment downstream).
    */
  private[graft] def invertSortable(t: Long): Double = {
    val tNegInf = ~java.lang.Double.doubleToLongBits(Double.NegativeInfinity)
    val tPosInf =
      java.lang.Double.doubleToLongBits(Double.PositiveInfinity) | java.lang.Long.MIN_VALUE
    if (java.lang.Long.compareUnsigned(t, tNegInf) < 0) Double.NegativeInfinity
    else if (java.lang.Long.compareUnsigned(t, tPosInf) > 0) Double.PositiveInfinity
    else {
      val s = if (t < 0) t & ~java.lang.Long.MIN_VALUE else ~t
      java.lang.Double.longBitsToDouble(s)
    }
  }

  /** The numeric [lo, hi] interval a bin prefix covers. The all-ones bin
    * wraps `(bin+1) << shift` to 0; `-1` is then the unsigned-max
    * transformed bound (clamped to +Inf by [[invertSortable]]).
    */
  private[streaming] def binBounds(bin: Long, binBits: Int): (Double, Double) = {
    val shift = 64 - binBits
    val a = invertSortable(bin << shift)
    val b = invertSortable(((bin + 1) << shift) - 1)
    (math.min(a, b), math.max(a, b))
  }

  final case class Bracket(group: String, quantile: Double, n: Long,
      lo: Double, hi: Double)

  /** Bracket each quantile from a merged histogram frame `(g, bin, n)`.
    *
    * The cumulation is DISTRIBUTED (per-group cumsum window over the
    * bin-sorted histogram + rank-containment filter), and only located
    * bins come back to the driver: ≤ groups · |ps| · 2 rows regardless
    * of bin occupancy. The earlier driver fold collected the whole
    * groups × bins map — bounded for dashboard grains, but a per-user
    * monitor (groups ~ users) would have made the driver the ceiling;
    * this is the same shape Percentiles' cumulation moved to.
    */
  def brackets(hist: DataFrame, ps: Seq[Double],
      binBits: Int = 16): Seq[Bracket] = {
    import org.apache.spark.sql.expressions.Window
    val byBin = Window.partitionBy("g").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("g")
    val located = hist
      .select(col("g").cast("string").as("g"), col("bin"), col("n"))
      .withColumn("cum", sum(col("n")).over(byBin))
      .withColumn("total", sum(col("n")).over(whole))
      .withColumn("before", col("cum") - col("n"))
      .select(col("g"), col("bin"), col("total"), col("before"), col("cum"),
        explode(typedlit(ps.toArray)).as("p"))
      .withColumn("pos", col("p") * (col("total") - 1).cast("double"))
      .withColumn("rfloor", floor(col("pos")).cast("long"))
      .withColumn("rceil", ceil(col("pos")).cast("long"))
      .withColumn("holds_floor",
        col("rfloor") >= col("before") && col("rfloor") < col("cum"))
      .withColumn("holds_ceil",
        col("rceil") >= col("before") && col("rceil") < col("cum"))
      .filter(col("holds_floor") || col("holds_ceil"))
      .select("g", "p", "total", "bin", "holds_floor", "holds_ceil")
      .collect()
    located.groupBy(r => (r.getString(0), r.getDouble(1))).toSeq
      .map { case ((g, p), rows) =>
        val n = rows.head.getLong(2)
        val loBin = rows.find(_.getBoolean(4)).get.getLong(3)
        val hiBin = rows.find(_.getBoolean(5)).get.getLong(3)
        Bracket(g, p, n, binBounds(loBin, binBits)._1,
          binBounds(hiBin, binBits)._2)
      }.sortBy(b => (b.group, b.quantile))
  }
}
