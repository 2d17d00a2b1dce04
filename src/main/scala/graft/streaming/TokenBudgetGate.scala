package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ST30 — streaming per-source token-budget admission: the live,
  * arrival-order form of the x62/x68 quota. Batch curation picks the
  * BEST documents up to a budget because it sees the whole corpus; an
  * INGEST door cannot — it must decide per arriving document whether
  * the source still has token budget, with nothing but a running
  * counter. This gate is that door: admit while the source's accepted
  * token mass is below its budget, reject after, deterministic and
  * exactly reproducible from the arrival log.
  *
  * Gate discipline (the QualityGate/CusumGate rules, applied to quota):
  *  - budgets arrive FROZEN on each document (pre-enriched upstream by
  *    a broadcast join against the planning table x62/x68 produced —
  *    the live door must not re-derive its own quota mid-stream);
  *  - admission is prefix-deterministic: a document is admitted iff
  *    the accepted mass BEFORE it is still under budget (the x62 "budget
  *    is a floor" semantics — the crossing document is admitted, so an
  *    oversized document cannot starve the stream), making the decision
  *    a pure fold over the per-source arrival order;
  *  - within a micro-batch, arrival order is the `seq` column (the
  *    source's offset/LSN analogue); rows at or before the frontier are
  *    REPLAYS and re-emit their original verdict idempotently — which
  *    requires no memory of past verdicts, because a verdict is a pure
  *    function of (accepted mass before seq), and replays cannot change
  *    a closed prefix.
  *
  * Scale posture: state per source is THREE longs (frontier seq,
  * accepted tokens, accepted docs) — a trillion-token source costs the
  * same state as an empty one; RocksDB-backed via the session default;
  * the fold is O(batch) with no shuffle beyond the per-source grouping.
  */
object TokenBudgetGate {

  /** One arriving document, pre-enriched with its source's frozen
    * budget. `seq` is the per-source arrival order (offset/LSN).
    */
  final case class Doc(source: String, seq: Long, doc_id: Long,
    toks: Long, budget: Long)

  /** O(1) per-source state. */
  final case class BudgetState(frontier_seq: Long, accepted_toks: Long,
    accepted_docs: Long)

  /** Per-document verdict. `accepted_toks` is the source's running
    * total AFTER this document (unchanged when rejected) — the live
    * dashboard number.
    */
  final case class Verdict(source: String, seq: Long, doc_id: Long,
    toks: Long, admitted: Boolean, accepted_toks: Long)

  val empty: BudgetState = BudgetState(-1L, 0L, 0L)

  /** Pure per-source fold (unit-testable without a streaming query):
    * admit iff the accepted mass BEFORE the document is under budget.
    * Documents sort by `seq`; rows at or before the frontier are
    * replays — their verdict is re-derivable but adds nothing to state,
    * so they emit nothing here (the sink already has them).
    */
  def fold(prev: BudgetState, docs: Seq[Doc]): (BudgetState, Seq[Verdict]) = {
    var st = prev
    val out = Seq.newBuilder[Verdict]
    docs.sortBy(_.seq).foreach { d =>
      if (d.seq > st.frontier_seq) {
        val admit = st.accepted_toks < d.budget
        st = BudgetState(d.seq,
          if (admit) st.accepted_toks + d.toks else st.accepted_toks,
          if (admit) st.accepted_docs + 1 else st.accepted_docs)
        out += Verdict(d.source, d.seq, d.doc_id, d.toks, admit,
          st.accepted_toks)
      }
    }
    (st, out.result())
  }

  /** Wire the stateful gate onto a (streaming) Dataset of enriched
    * documents. Append mode: each document's verdict is emitted exactly
    * once (replays at or before the frontier emit nothing).
    */
  def route(docs: Dataset[Doc]): Dataset[Verdict] = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[Doc], state: GroupState[BudgetState]) => {
          val (next, out) = fold(state.getOption.getOrElse(empty), it.toSeq)
          state.update(next)
          out.iterator
        })
  }
}
