package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST31 — streaming sequence packing: the live, arrival-order form of
  * x12's cumulative-token packing. Batch packing assigns every document
  * a position in a fixed-budget training bin by a corpus-wide prefix
  * sum; the live form must hand each ARRIVING document its bin and
  * global token offset immediately — the shard a training loader will
  * read it from — using only a running counter per source.
  *
  * Placement semantics are x12's exactly (so stream ≡ batch on the same
  * arrival order, pinned in the spec):
  *  - documents pack contiguously in per-source arrival order (`seq`,
  *    the offset/LSN analogue — batch uses doc_id order);
  *  - a document's global token offset is the accepted mass before it
  *    (`start`), and its bin is the bin of its LAST token,
  *    `(cum_after - 1) div budget` — a straddling document spills into
  *    the next bin rather than forcing bin-exact first-fit, which keeps
  *    the decision a pure fold (first-fit would need the bin's residue
  *    AND reordering freedom a stream does not have);
  *  - rows at or before the per-source frontier are replays: their
  *    placement is already in the sink and re-deriving it cannot change
  *    a closed prefix, so they emit nothing (same discipline as ST30).
  *
  * Scale posture: state per source is THREE longs (frontier seq,
  * cumulative tokens, packed docs); placement is O(batch) after the
  * per-source grouping shuffle; `div` is exact integer division so bins
  * stay correct past 2^53 cumulative tokens (the double-division trap
  * x12 documents). A trillion-token source costs the same state as an
  * empty one.
  */
object SequencePacker {

  /** One arriving document; `seq` is the per-source arrival order. */
  final case class Doc(source: String, seq: Long, doc_id: Long, toks: Long)

  /** O(1) per-source state. */
  final case class PackState(frontier_seq: Long, cum_toks: Long,
    packed_docs: Long)

  /** Where the document landed: `start` is its 0-based global token
    * offset within the source's packed stream, `bin` the fixed-budget
    * training bin holding its last token.
    */
  final case class Placement(source: String, seq: Long, doc_id: Long,
    toks: Long, start: Long, bin: Long)

  val empty: PackState = PackState(-1L, 0L, 0L)

  /** Pure per-source fold (unit-testable without a streaming query).
    * Documents sort by `seq`; replays at or before the frontier emit
    * nothing and change nothing.
    */
  def fold(budget: Long)(prev: PackState, docs: Seq[Doc])
      : (PackState, Seq[Placement]) = {
    require(budget > 0, s"bin budget must be positive, got $budget")
    var st = prev
    val out = Seq.newBuilder[Placement]
    docs.sortBy(_.seq).foreach { d =>
      if (d.seq > st.frontier_seq) {
        val start = st.cum_toks
        val after = st.cum_toks + d.toks
        // bin of the LAST token — x12's exact formula, so the stream and
        // the batch prefix sum place every document identically. A
        // zero-token document at cum 0 bins to 0 (Scala's / rounds
        // toward zero), never arising from whitespace counts (>= 1).
        val bin = (after - 1L) / budget
        st = PackState(d.seq, after, st.packed_docs + 1L)
        out += Placement(d.source, d.seq, d.doc_id, d.toks, start, bin)
      }
    }
    (st, out.result())
  }

  /** Wire the stateful packer onto a (streaming) Dataset of documents.
    * Append mode: each document's placement is emitted exactly once.
    */
  def route(budget: Long)(docs: Dataset[Doc]): Dataset[Placement] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[Doc], state: GroupState[PackState]) => {
          val (next, out) = fold(budget)(state.getOption.getOrElse(empty),
            it.toSeq)
          state.update(next)
          out.iterator
        })
  }
}
