package graft.lakehouse

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Incremental view maintenance (IVM) for grouped COUNT/SUM marts over a
  * [[SnapshotTable]] — refresh cost ∝ CHANGED DATA, never table size.
  *
  * The delta source is FILE-LEVEL change capture
  * ([[SnapshotTable.dirsOfVersion]]): commits added between the applied
  * and current versions contribute +1/+x per row, commits removed
  * contribute −1/−x. A COW update/delete rewrites its untouched
  * neighbors into a new commit — those rows appear on BOTH sides and
  * cancel exactly under the signed aggregation, so no row keys, no
  * pre/post-image tagging, and no snapshot diff joins are needed:
  * count/sum algebra is closed under signed multisets. (The key-diff
  * [[SnapshotTable.changes]] scans both snapshots; this reads only the
  * changed commits — at a 100 TB base with a 1 GB daily delta that is
  * the whole argument for IVM.)
  *
  * Exactly-once refresh (marker-pinned reads, the erase-cascade
  * discipline): the `_ivm_applied` marker records (baseVersion,
  * mvVersion) ATOMICALLY (temp + move). `refresh()` reads the MV state
  * at the MARKED mv version — not HEAD — merges the signed delta, then
  * overwrites and advances the marker LAST. A crash between the
  * overwrite and the marker leaves a dangling MV commit that the replay
  * ignores (it re-reads the marked version and re-merges the same
  * deterministic delta), so replays converge instead of double-counting.
  *
  * Measures must be EXACT types (long cents, counts): signed retraction
  * of floating-point partial sums drifts; integer algebra retracts to
  * bit-identical zero — a group whose rows are all deleted leaves the
  * view entirely (`n_rows == 0` prunes it).
  */
final class IncrementalView(
    val base: SnapshotTable,
    groupCols: Seq[String],
    sumCols: Seq[String],
    root: String) {
  require(groupCols.nonEmpty, "IVM needs at least one group column")

  private val spark: SparkSession = base.spark
  val mv: SnapshotTable = SnapshotTable.create(spark, s"$root/mv")
  private def markerPath: Path = Paths.get(root, "_ivm_applied")

  /** (applied base version, MV version serving it). */
  def applied: (Int, Int) =
    if (Files.exists(markerPath)) {
      val Array(b, m) = Files.readString(markerPath).trim.split(",")
      (b.toInt, m.toInt)
    } else (0, 0)

  private def writeMarker(baseV: Int, mvV: Int): Unit = {
    val tmp = Paths.get(root, s"_ivm_applied.tmp")
    Files.createDirectories(Paths.get(root))
    Files.writeString(tmp, s"$baseV,$mvV")
    Files.move(tmp, markerPath, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Signed per-group partials of one side of the file delta. */
  private def signedAgg(df: DataFrame, sign: Int): DataFrame = {
    val exprs = (count(lit(1)) * sign).as("n_rows") +:
      sumCols.map(c => (sum(col(c)) * sign).as(s"sum_$c"))
    df.groupBy(groupCols.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** The view as of the last completed refresh (marker-pinned). */
  def read(): DataFrame = {
    val (_, mvV) = applied
    val f = mv.readVersion(mvV)
    if (f.columns.isEmpty)
      spark.emptyDataFrame
    else f
  }

  /** Apply all base commits since the last refresh; returns the applied
    * base version. O(changed commits) reads; idempotent under replay.
    */
  def refresh(): Int = synchronized {
    val (fromV, mvV) = applied
    val toV = base.currentVersion
    if (toV == fromV) return fromV
    val before = base.dirsOfVersion(fromV).toSet
    val after = base.dirsOfVersion(toV).toSet
    val addedRows = base.readDirs((after -- before).toSeq.sorted)
    val removedRows = base.readDirs((before -- after).toSeq.sorted)
    val sides = Seq(addedRows -> 1, removedRows -> -1)
      .filter(_._1.columns.nonEmpty)
      .map { case (df, s) => signedAgg(df, s) }
    val delta = sides.reduceOption(_ unionByName _) match {
      case None => // version advanced with no data movement (e.g. expiry)
        writeMarker(toV, mvV)
        return toV
      case Some(d) =>
        val exprs = sum(col("n_rows")).as("n_rows") +:
          sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c"))
        d.groupBy(groupCols.map(col): _*).agg(exprs.head, exprs.tail: _*)
    }
    val prior = mv.readVersion(mvV)
    val merged =
      if (prior.columns.isEmpty) delta
      else {
        val exprs = ("n_rows" +: sumCols.map(c => s"sum_$c"))
          .map(m => sum(col(m)).as(m))
        prior.unionByName(delta)
          .groupBy(groupCols.map(col): _*)
          .agg(exprs.head, exprs.tail: _*)
      }
    val pruned = merged.filter(col("n_rows") > 0)
    val newMvV = mv.overwrite(pruned)
    writeMarker(toV, newMvV)
    toV
  }
}
