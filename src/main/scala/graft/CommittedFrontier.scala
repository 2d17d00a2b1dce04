package graft

/** Compressed committed-id set for exactly-once ledgers: a frontier
  * watermark `F` (every id ≤ F is committed) plus the sparse set of
  * out-of-order exceptions above it. Streaming batch ids arrive
  * monotonically, so in steady state the exception set is EMPTY and the
  * whole structure is one long — memory and serialized bytes are
  * O(gaps), never O(batches ever committed). This is the bounded
  * replacement for the per-id HashSets/ledger files that grew for the
  * life of a stream (a 2 s trigger folds ~43k ids/day; a month-old
  * monitor was re-reading and rewriting a ~1.3M-line "commit point"
  * file every batch).
  *
  * Out-of-order manual drives (the reason a plain high-water mark was
  * rejected in r16) stay exact: an id above a gap lands in the
  * exception set and the frontier only advances through contiguous
  * prefixes, so an unprocessed earlier batch is never silently skipped.
  *
  * Thread-safe; all methods synchronize on the instance.
  */
final class CommittedFrontier {
  private var frontier: Long = -1L
  private val above = new java.util.TreeSet[java.lang.Long]()

  /** Mark `id` committed. */
  def add(id: Long): Unit = synchronized {
    if (id <= frontier) return
    above.add(id)
    drain()
  }

  /** Mark every id ≤ `f` committed (a frontier recovered from a
    * persisted marker).
    */
  def addFrontier(f: Long): Unit = synchronized {
    if (f > frontier) {
      frontier = f
      above.headSet(f, true).clear()
      drain()
    }
  }

  private def drain(): Unit =
    while (!above.isEmpty && above.first() == frontier + 1)
      frontier = above.pollFirst()

  def contains(id: Long): Boolean = synchronized {
    id <= frontier || above.contains(id)
  }

  /** Largest F with every id ≤ F committed (−1 = nothing). */
  def watermark: Long = synchronized(frontier)

  /** Committed ids above the watermark (empty in steady state). */
  def exceptions: Seq[Long] = synchronized {
    import scala.jdk.CollectionConverters._
    above.iterator().asScala.map(_.longValue()).toVector
  }

  /** `v2\n<frontier>\n<exception>...` — O(exceptions) bytes. */
  def serialize: String = synchronized {
    (Seq("v2", frontier.toString) ++ exceptions.map(_.toString))
      .mkString("\n")
  }
}

object CommittedFrontier {
  /** Parse [[CommittedFrontier.serialize]] output, or a LEGACY ledger
    * (one committed id per line, no `v2` header) — legacy ids compress
    * to a frontier exactly when they form a prefix.
    */
  def parse(s: String): CommittedFrontier = {
    val cf = new CommittedFrontier
    val lines = s.split("\n").filter(_.nonEmpty)
    if (lines.headOption.contains("v2")) {
      cf.addFrontier(lines(1).toLong)
      lines.drop(2).foreach(l => cf.add(l.toLong))
    } else lines.foreach(l => cf.add(l.toLong))
    cf
  }
}
