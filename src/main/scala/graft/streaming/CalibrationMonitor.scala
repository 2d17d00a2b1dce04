package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ST36 — streaming calibration monitor: the live form of the x77
  * scorer audit. A quality gate that silently stops RANKING (curated no
  * longer outscores background) keeps routing documents with full
  * confidence — the monitor watches the gate's ranking health as data
  * arrives and raises an alarm the batch audit would only catch at the
  * next offline run.
  *
  * Bounded state, the [[QuantileMonitor]] discipline: arriving labeled
  * scores bucket by the top `binBits` bits of the order-preserving
  * IEEE-754 transform (data-independent — the binning never moves), and
  * the per-bin (positives, negatives) running counts are an ordinary
  * update-mode streaming aggregation — O(occupied bins) state, set by
  * configuration, never by stream length. The serve side merges the
  * latest counters ([[StreamingAggs.mergeOnRead]]) and computes the
  * tie-aware AUC over the BIN-QUANTIZED scores in driver BigInt — exact
  * for the quantization, deterministic at any partitioning, and within
  * one bin's tie mass of the unquantized x77 verdict (scores that share
  * a bin count as ties; with 16 bits a bin spans sign + exponent + 4
  * mantissa bits, so only near-equal scores collapse).
  *
  * [[graft.streaming.CalibrationMonitorSpec]] pins the streamed
  * histogram bit-identical to the batch histogram, the served verdict
  * equal to a batch twin over the same rows, closed-form planted AUCs,
  * and chunking invariance.
  */
object CalibrationMonitor {

  /** (pos, bin) projection of a labeled score frame — streaming and
    * batch sides share this single definition, so parity is structural.
    * `posCol` must be 0/1; `scoreCol` any numeric (cast to double; longs
    * below 2⁵³ cast exactly).
    */
  def binnedLabeled(df: DataFrame, posCol: String, scoreCol: String,
      binBits: Int = 16): DataFrame = {
    graft.GraftExtensions.ensure(df.sparkSession)
    df.select(col(posCol).cast("long").as("pos"),
        col(scoreCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .select(col("pos"), shiftrightunsigned(
        call_function("graft_sortable_bits", col("v")),
        64 - binBits).as("bin"))
  }

  /** Update-mode running class histogram: pair with
    * [[StreamingAggs.appendPartials]] + [[StreamingAggs.mergeOnRead]]
    * (key = bin) on the serve side.
    */
  def histogram(stream: DataFrame, posCol: String, scoreCol: String,
      binBits: Int = 16): DataFrame =
    binnedLabeled(stream, posCol, scoreCol, binBits)
      .groupBy("bin")
      .agg(sum(col("pos")).as("pos_n"),
        sum(lit(1L) - col("pos")).as("neg_n"))

  /** Ranking-health verdict from a merged (bin, pos_n, neg_n) histogram:
    * (n_pos, n_neg, auc_bp, alarm). Tie-aware AUC over the quantized
    * scores — ⌊(2·#(pos-bin above neg-bin) + #(same-bin pairs)) · 10⁴ /
    * (2·n⁺·n⁻)⌋ — computed in BigInt over the ≤ 2^binBits collected bin
    * rows (bounded by the ENCODING, never the stream). Degenerate
    * one-class streams read AUC 0 with no alarm (no ranking to judge).
    */
  def verdict(hist: DataFrame, minAucBp: Long = 5000L)
      : (Long, Long, Long, Boolean) = {
    val bins = hist.select("bin", "pos_n", "neg_n")
      .collect() // bounded: ≤ 2^binBits rows by the encoding
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1) // bins of non-negative top bits: plain order = value order
    var (negBelow, wins2) = (BigInt(0), BigInt(0))
    var (nPos, nNeg) = (BigInt(0), BigInt(0))
    bins.foreach { case (_, p, n) =>
      wins2 += BigInt(p) * (2 * negBelow + n)
      negBelow += n
      nPos += p; nNeg += n
    }
    if (nPos == 0 || nNeg == 0) (nPos.toLong, nNeg.toLong, 0L, false)
    else {
      val auc = (wins2 * 10000 / (2 * nPos * nNeg)).toLong
      (nPos.toLong, nNeg.toLong, auc, auc < minAucBp)
    }
  }
}
