package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed BPE merge-table learning — the tokenizer-training step of
  * a corpus pipeline, as alternating declarative/imperative rounds:
  *
  *  - COUNT (declarative, the expensive side): adjacent-pair frequencies
  *    via `zip_with(slice, slice)` + explode + one groupBy — a
  *    map-side-combinable aggregation whose key space is the pair
  *    vocabulary, never the corpus. This is the part that must scale:
  *    one shuffle per round, partial aggregation doing the heavy lift.
  *  - ARGMAX (driver): `orderBy(count desc, pair asc) limit 1` — a
  *    deterministic tie-break, so the learned table is reproducible
  *    across cluster layouts and engines.
  *  - REWRITE (per-partition imperative): greedy left-to-right pair
  *    replacement is inherently sequential WITHIN a sequence ("a a a"
  *    merges to [aa, a], never [aa, aa]) but embarrassingly parallel
  *    ACROSS sequences — a typed `map` over the token arrays, the same
  *    genuinely-imperative-kernel exception the multimodal decoders use.
  *
  * Rounds are bounded by the merge budget K (a constant), so the whole
  * learn is K scans of a frame that SHRINKS as merges land. Each round's
  * sequences are persisted and the previous round unpersisted — lineage
  * would otherwise re-derive round r from round 0 every time.
  *
  * Correctness is differential:
  * [[graft.text.BpeLearnSpec]] pins the distributed learn to a
  * single-threaded reference implementation, merge for merge.
  */
object BpeLearn {

  /** Greedy left-to-right single-pair merge (the standard BPE rewrite). */
  def mergeOnce(toks: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b)
        i += 2
      } else {
        out += toks(i)
        i += 1
      }
    }
    out.result()
  }

  final case class Merge(a: String, b: String, count: Long)

  /** Learn the top-`k` merges over `docs`' `toks` array column. Returns
    * the merge table in learned order. Stops early when no pair repeats.
    *
    * Tie-break collation: ties on count resolve by Spark's string
    * ordering, which compares UTF-8 BYTES — for tokens beyond the BMP
    * (emoji and other supplementary characters) this differs from Java's
    * UTF-16 `String.compareTo`. Any single-process reference comparing
    * against this learn must tie-break with a UTF-8 byte comparator (as
    * `BpeLearnSpec.referenceLearn` does), or emoji-tied corpora diverge.
    */
  def learn(docs: DataFrame, k: Int): Seq[Merge] = {
    val spark = docs.sparkSession
    import spark.implicits._
    var seqs: Dataset[Seq[String]] = docs.select(col("toks"))
      .as[Seq[String]].persist()
    seqs.count() // materialize before the loop touches it k times
    val merges = Seq.newBuilder[Merge]
    var done = false
    var round = 0
    while (round < k && !done) {
      // greatest(…, 0): a 0/1-token sequence has no pairs — a raw -1
      // slice length is a runtime error, not an empty array
      val pairLen = greatest(size(col("toks")) - 1, lit(0))
      val top = seqs.toDF("toks")
        .select(explode(zip_with(
          slice(col("toks"), lit(1), pairLen),
          slice(col("toks"), lit(2), pairLen),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .orderBy(col("n").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) done = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(a, b, n)
        val next = seqs.map(s => mergeOnce(s.toIndexedSeq, a, b): Seq[String])
          .persist()
        next.count()
        seqs.unpersist()
        seqs = next
      }
      round += 1
    }
    seqs.unpersist()
    merges.result()
  }

  /** Apply a learned merge table to a token-sequence frame (inference
    * side): merges replay IN ORDER, each greedy left-to-right — one
    * partition-parallel pass per merge over arrays that only shrink.
    */
  def applyMerges(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val table = merges.map(m => (m.a, m.b))
    val others = docs.columns.filter(_ != "toks")
    require(others.isEmpty || others.sameElements(Array("doc_id")),
      "applyMerges expects (doc_id?, toks)")
    if (others.isEmpty)
      docs.select(col("toks")).as[Seq[String]]
        .map(s => table.foldLeft(s.toIndexedSeq) { case (t, (a, b)) =>
          mergeOnce(t, a, b)
        }: Seq[String])
        .toDF("toks")
    else
      docs.select(col("doc_id"), col("toks")).as[(Long, Seq[String])]
        .map { case (id, s) =>
          (id, table.foldLeft(s.toIndexedSeq) { case (t, (a, b)) =>
            mergeOnce(t, a, b)
          }: Seq[String])
        }
        .toDF("doc_id", "toks")
  }
}
