package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored term inside a group: ranked by (rank DESC, term ASC). `v1`/
  * `v2` carry query-specific payload (counts, document frequencies) so one
  * aggregator serves every top-k-terms query shape.
  */
final case class KeyedTermRow(g: String, rank: Long, term: String,
    v1: Long, v2: Long)

/** Aggregation buffer/output: the current k best rows, sorted. */
final case class TopTerms(rows: Seq[KeyedTermRow])

/** Bounded top-k-terms-per-group aggregate: keeps the k highest-ranked
  * (rank DESC, term ASC) rows with partial aggregation — each map task
  * reduces its slice to ≤ k rows per group BEFORE the shuffle, and merges
  * are capped sorted merges. This is the scale-safe replacement for
  * `row_number().over(Window.partitionBy(g).orderBy(rank.desc, term))`
  * over a vocabulary-count table: the window form funnels each group's
  * ENTIRE vocabulary through one task (on a web-scale corpus shingle
  * vocabulary grows with the corpus — there is no "bounded per-source
  * vocabulary" at 100 TB), while this form moves O(k) state per
  * (task, group). Same machinery as [[TopKSample]], generalized from
  * hash-ascending sampling to score-descending ranking.
  *
  * PRECONDITION: (rank, term) must be unique within a group — `reduce`
  * drops an incoming row comparing EQUAL to the kth buffered row, which
  * diverges from `row_number` on duplicate keys. Holds by construction
  * for all callers: `term` is a grouping key of the count table feeding
  * the aggregate, so it is unique per group.
  */
final class TopKTerms(k: Int)
    extends Aggregator[KeyedTermRow, TopTerms, TopTerms] {

  private def lt(a: KeyedTermRow, b: KeyedTermRow): Boolean =
    a.rank > b.rank || (a.rank == b.rank && a.term < b.term)

  override def zero: TopTerms = TopTerms(Vector.empty)

  override def reduce(buf: TopTerms, in: KeyedTermRow): TopTerms =
    if (buf.rows.size >= k && !lt(in, buf.rows.last)) buf
    else TopTerms((buf.rows :+ in).sortWith(lt).take(k)) // ≤ k+1 elements

  override def merge(a: TopTerms, b: TopTerms): TopTerms =
    TopTerms((a.rows ++ b.rows).sortWith(lt).take(k)) // ≤ 2k elements

  override def finish(r: TopTerms): TopTerms = r

  override def bufferEncoder: Encoder[TopTerms] = Encoders.product[TopTerms]
  override def outputEncoder: Encoder[TopTerms] = Encoders.product[TopTerms]
}
