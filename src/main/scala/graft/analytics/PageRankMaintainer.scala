package graft.analytics

import graft.operators.PageRank
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ST35 — streaming PageRank maintenance: the graph-rank lifecycle
  * between full rebuilds, completing the family pattern (x46 topics →
  * [[graft.streaming.TopicDrift]], IVF → IvfMaintainer, x63 →
  * LinkageGate; x72 → this). Domain/product authority ranks are
  * corpus-level artifacts: arriving interactions keep CHANGING the
  * graph, but re-ranking on every batch would scan the world per
  * trigger. The maintainer lands micro-batches of edge deltas as
  * replay-idempotent per-batch dirs, serves the FROZEN rank table
  * (stale-but-consistent, the IVF serving rule), and a staleness
  * trigger on appended edge mass marks a refresh due; `refresh` folds
  * the deltas into the base graph (weights sum per edge) and re-runs
  * the exact fixed-point iteration.
  *
  * Exactly-once across restarts without sink transactions: each batch
  * is its own `appends/batch_id=<id>` OVERWRITE dir (re-delivery
  * replaces, never duplicates), and batches already folded by a refresh
  * are recorded in a ledger so a checkpoint replay of a folded batch is
  * a no-op. The ledger is written AFTER the folded base commits and
  * BEFORE the appends are deleted — a crash between leaves
  * folded-but-undeleted dirs that reads ignore and the next refresh
  * re-dedups (the fold sums per (u, v), and a replayed dir holds the
  * same rows it held when folded — re-summing identical content is
  * caught by the ledger check first).
  *
  * Scale posture: appends are map-only writes O(batch); staleness reads
  * parquet row counts (metadata); only `refresh` touches the full edge
  * set — which is the point of a trigger instead of a timer. Serving
  * reads one rank table, never the graph.
  */
final class PageRankMaintainer(val graphDir: String,
    iters: Int = 4, stalePpm: Long = 200000L) { // refresh at 20% new mass

  private def baseDir = s"$graphDir/base"
  private def ranksDir = s"$graphDir/ranks"
  private def appendsDir = s"$graphDir/appends"
  private def statsDir = java.nio.file.Paths.get(graphDir, "stats")
  private def baselinePath = statsDir.resolve("baseline.json")
  private def ledgerPath = statsDir.resolve("folded.json")

  private def writeAtomic(p: java.nio.file.Path, content: String): Unit = {
    java.nio.file.Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, content)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  private def baselineMass: Long =
    if (!java.nio.file.Files.exists(baselinePath)) 0L
    else java.nio.file.Files.readString(baselinePath).trim.toLong

  private def foldedIds: Set[Long] =
    if (!java.nio.file.Files.exists(ledgerPath)) Set.empty
    else java.nio.file.Files.readString(ledgerPath).split(",")
      .filter(_.nonEmpty).map(_.toLong).toSet

  private def appendBatchIds: Seq[Long] = {
    val d = java.nio.file.Paths.get(appendsDir)
    if (!java.nio.file.Files.exists(d)) Nil
    else scala.util.Using.resource(java.nio.file.Files.list(d)) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString)
        .collect { case n if n.startsWith("batch_id=") =>
          n.stripPrefix("batch_id=").toLong
        }.toSeq.sorted
    }
  }

  private def liveAppendDirs: Seq[String] =
    appendBatchIds.filterNot(foldedIds)
      .map(id => s"$appendsDir/batch_id=$id")

  /** Initialize: write the base edge set (u, v, w) and rank it. */
  def init(edges: DataFrame): Unit = {
    val s = edges.sparkSession
    edges.write.mode("overwrite").parquet(baseDir)
    writeAtomic(baselinePath,
      s.read.parquet(baseDir).agg(sum("w")).head.getLong(0).toString)
    rankAndWrite(s)
  }

  private def combinedEdges(s: SparkSession): DataFrame = {
    val base = s.read.parquet(baseDir)
    val live = liveAppendDirs
    val all = if (live.isEmpty) base
      else base.unionByName(s.read.parquet(live: _*).select("u", "v", "w"))
    all.groupBy("u", "v").agg(sum("w").as("w"))
  }

  private def rankAndWrite(s: SparkSession): Unit = {
    // build the weighted-edge frame explicitly so its persist() has an
    // owner: the rank write is the one action, then the frame unpins
    val ew = PageRank.weightedEdges(s, combinedEdges(s))
    try PageRank.runOnWeighted(ew, iters)
      .write.mode("overwrite").parquet(ranksDir)
    finally { ew.unpersist(); () }
  }

  /** The frozen serving table (node, pr). */
  def ranks(s: SparkSession): DataFrame = s.read.parquet(ranksDir)

  /** Land one micro-batch of edge deltas (u, v, w). Overwrite ⇒ a
    * foreachBatch re-delivery replaces the dir; a batch a refresh
    * already folded is a no-op. Returns rows appended.
    */
  def appendBatch(batch: DataFrame, batchId: Long): Long = {
    if (foldedIds.contains(batchId)) return 0L
    if (batch.isEmpty) return 0L
    batch.select("u", "v", "w").write.mode("overwrite")
      .parquet(s"$appendsDir/batch_id=$batchId")
    batch.sparkSession.read.parquet(s"$appendsDir/batch_id=$batchId").count()
  }

  /** Appended edge-weight mass not yet folded, vs the base mass. */
  def staleness(s: SparkSession): (Long, Long) = {
    val live = liveAppendDirs
    val appended = if (live.isEmpty) 0L
      else s.read.parquet(live: _*).agg(coalesce(sum("w"), lit(0L)))
        .head.getLong(0)
    (appended, baselineMass)
  }

  def refreshDue(s: SparkSession): Boolean = {
    val (appended, base) = staleness(s)
    base > 0 && appended * 1000000L >= base * stalePpm
  }

  /** Fold live appends into the base graph (weights sum per edge),
    * re-rank, reset the baseline, and retire the folded batch ids.
    */
  def refresh(s: SparkSession): Unit = synchronized {
    val ids = appendBatchIds.filterNot(foldedIds)
    if (ids.nonEmpty) {
      val folded = combinedEdges(s)
      val tmp = s"$graphDir/base_next"
      folded.write.mode("overwrite").parquet(tmp)
      // swap: overwrite base from the staged fold (two-step because the
      // fold READS base; a crash between leaves base_next to re-stage)
      s.read.parquet(tmp).write.mode("overwrite").parquet(baseDir)
      writeAtomic(baselinePath,
        s.read.parquet(baseDir).agg(sum("w")).head.getLong(0).toString)
      writeAtomic(ledgerPath, (foldedIds ++ ids).toSeq.sorted.mkString(","))
      ids.foreach { id =>
        val d = java.nio.file.Paths.get(s"$appendsDir/batch_id=$id")
        if (java.nio.file.Files.exists(d)) {
          import scala.jdk.CollectionConverters._
          scala.util.Using.resource(java.nio.file.Files.walk(d)) { w =>
            w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
              .iterator().asScala.foreach(java.nio.file.Files.delete)
          }
        }
      }
    }
    rankAndWrite(s)
  }

  /** Wire a streaming edge frame (u, v, w) into per-batch appends. */
  def start(edges: DataFrame,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (b: DataFrame, id: Long) =>
        appendBatch(b, id); ()
      }
      .start()
}
