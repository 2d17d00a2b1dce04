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
  private[streaming] def invertSortable(t: Long): Double = {
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
    * The histogram is bounded serve-side metadata (groups · occupied
    * bins), so the cumulation is a driver fold — same contract as the
    * Percentiles driver pass.
    */
  def brackets(hist: DataFrame, ps: Seq[Double],
      binBits: Int = 16): Seq[Bracket] = {
    val byGroup = hist.select(col("g").cast("string"), col("bin"), col("n"))
      .collect()
      .groupBy(_.getString(0))
    byGroup.toSeq.flatMap { case (g, rows) =>
      val bins = rows.map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
      val n = bins.map(_._2).sum
      ps.map { p =>
        val pos = p * (n - 1)
        def binAt(rank: Long): Long = {
          var before = 0L
          bins.find { case (_, c) =>
            if (rank < before + c) true else { before += c; false }
          }.get._1
        }
        val (lo, _) = binBounds(binAt(math.floor(pos).toLong), binBits)
        val (_, hi) = binBounds(binAt(math.ceil(pos).toLong), binBits)
        Bracket(g, p, n, lo, hi)
      }
    }.sortBy(b => (b.group, b.quantile))
  }
}
