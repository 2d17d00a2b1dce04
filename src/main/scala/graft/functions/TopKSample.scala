package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One candidate row for the bounded top-k sample: ranked by (h, doc_id)
  * ascending — h is a content-independent portable hash, doc_id the
  * deterministic tiebreak.
  */
final case class SampleRow(h: Long, doc_id: Long, n_chars: Long)

/** Aggregation buffer/output: the current k smallest rows, sorted. */
final case class TopKRows(rows: Seq[SampleRow])

/** Bounded top-k-per-group aggregate: keeps the k smallest (h, doc_id)
  * rows, with partial aggregation — each map task reduces its slice to
  * ≤ k rows per group BEFORE the shuffle, and merges are capped sorted
  * merges. This is the scale-safe replacement for
  * `row_number().over(Window.partitionBy(group).orderBy(h))`: the window
  * form funnels every group through one task and full-sorts it; this
  * form moves O(k) state per (task, group) and never materializes a
  * group anywhere.
  *
  * PRECONDITION: the (h, doc_id) rank key must be unique within a group.
  * `reduce` drops an incoming row that compares EQUAL to the kth
  * buffered row (`!lt` holds for equal keys), which diverges from
  * `row_number` semantics on duplicate keys. Holds here by construction
  * — doc_id is unique per stratum.
  */
final class TopKSample(k: Int)
    extends Aggregator[SampleRow, TopKRows, TopKRows] {

  private def lt(a: SampleRow, b: SampleRow): Boolean =
    a.h < b.h || (a.h == b.h && a.doc_id < b.doc_id)

  override def zero: TopKRows = TopKRows(Vector.empty)

  override def reduce(buf: TopKRows, in: SampleRow): TopKRows =
    if (buf.rows.size >= k && !lt(in, buf.rows.last)) buf
    else TopKRows((buf.rows :+ in).sortWith(lt).take(k)) // ≤ k+1 elements

  override def merge(a: TopKRows, b: TopKRows): TopKRows =
    TopKRows((a.rows ++ b.rows).sortWith(lt).take(k)) // ≤ 2k elements

  override def finish(r: TopKRows): TopKRows = r

  override def bufferEncoder: Encoder[TopKRows] = Encoders.product[TopKRows]
  override def outputEncoder: Encoder[TopKRows] = Encoders.product[TopKRows]
}
