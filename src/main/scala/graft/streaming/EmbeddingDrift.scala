package graft.streaming

import graft.similarity.SpectralQueries
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

/** ST39/ST40 — streaming embedding-anisotropy drift monitor: the live
  * form of the x76 spectral audit, closing the spectral family's loop —
  * x76 MEASURES the pathology offline, x83 FIXES it (All-but-the-Top),
  * x84 LOCALIZES it per family, this WATCHES for it arriving in
  * production (globally, and — when a label column is wired — per
  * family, the streaming x84). An embedding pipeline drifts spectrally
  * when the encoder changes (silent model swap, fp16 truncation, a
  * broken normalization batch) — cosine retrieval and SemDeDup quality
  * degrade long before any per-vector check fires, because the failure
  * is a property of the DISTRIBUTION (a new dominant common direction),
  * not of any row.
  *
  * Design — the Gram merge IS the state:
  *  - Per micro-batch, ONE pass ([[SpectralQueries.gramStatsBy]]'s
  *    grouped kernel) reduces the batch to its exact second-moment
  *    partials (N, S, the 64×64 upper triangle — 2,145 integers) per
  *    label family (one `lab = -1` row when no label column is wired),
  *    appended to a count log as one row per (batch, family). Gram
  *    accumulation is associative and exact, so the merged log over any
  *    batch split equals the batch statistics of the union — stream ≡
  *    batch is an INTEGER EQUALITY, not a tolerance
  *    (`EmbeddingDriftSpec` pins chunking invariance against
  *    [[SpectralQueries.powerIteration]] on the whole corpus; the ST40
  *    spec pins the per-family rows against [[SpectralQueries
  *    .gramStatsBy]] on the union). Family Grams SUM to the global, so
  *    one grouped pass serves both the global alarm and the per-family
  *    localization — no second scan.
  *  - Input hygiene: the kernel's long accumulators assume unit-scale
  *    embeddings (|q_i| ≤ 10⁵ at the 1e-4 quantization). A malformed
  *    batch with huge components — exactly the broken-normalization
  *    pathology this monitor exists to catch — would otherwise overflow
  *    the per-partition products SILENTLY and corrupt the log. Vectors
  *    with any |q_i| > [[EmbeddingDrift.MaxAbsQ]] are therefore EXCLUDED
  *    from the Gram pass and counted per (batch, family) in the log row
  *    (`n_oversized`), and any oversized count trips the drift flag: the
  *    pathology surfaces as an alarm, never as corruption. Within the
  *    envelope, |q_i·q_j| ≤ 10¹² ⇒ a partition would need ~9·10⁶ rows to
  *    overflow a long (a 128 MB parquet split holds ~2.5·10⁵ — 36×
  *    headroom).
  *  - Serving merges the log driver-side (rows = batches × families,
  *    2,145 BigInt strings each — bounded by batch count × label
  *    cardinality, never by corpus size) and runs the same K-round
  *    BigInt iteration x76 runs, then scores the current top direction
  *    against the FROZEN baseline:
  *    align_bp = (v·v_base)²·10⁴ / (‖v‖²·‖v_base‖²), truncating.
  *  - Alarm when alignment falls below `minAlignBp` (the top direction
  *    ROTATED — a new common component appeared), the anisotropy share
  *    rises more than `maxAnisoRiseBp` over baseline (the space is
  *    COLLAPSING toward a dominant direction even if it happens to
  *    align), or any oversized vectors arrived. [[Monitor.familyStatus]]
  *    applies the same verdict per family against per-family baselines
  *    ([[fitByFamily]]) — a family with no baseline is itself an alarm
  *    (an unknown source entered the stream).
  *  - Exactly-once: the log write is a per-batch-directory overwrite (a
  *    replayed batch replaces itself — the [[StreamingDedup]] rule), and
  *    the serve-side merge reads each batch id once.
  *  - Bounded log lifetime: a forever-running monitor accumulates one
  *    directory per trigger (~43k/day at a 2 s trigger), so the serve
  *    path and the filesystem would both grow without bound.
  *    [[Monitor.compactLog]] folds all batch dirs up to a frontier into
  *    ONE merged row per family (Gram partials are associative — the
  *    fold is exact), ledgered with the [[graft.similarity
  *    .IvfMaintainer]] discipline so replays of folded batches no-op:
  *    the new compact generation is written first, the atomic ledger
  *    write is the commit point (naming the active generation and the
  *    folded-id FRONTIER — folds take a prefix, so the ledger is O(1)
  *    lines for the stream's lifetime, never a growing id list), and
  *    only then are the folded dirs deleted — a crash at any point
  *    leaves a readable, non-double-counting log.
  *
  * Scale posture: each arriving vector is touched exactly once by a
  * map-combinable kernel pass; state is 2,145 integers per (batch,
  * family), compacted to per-family rows on a schedule; serving cost is
  * O(live rows · dim²) driver arithmetic. At 100 TB/day the monitor's
  * cost is the scan it shares with ingest.
  */
object EmbeddingDrift {

  /** Reject-vector envelope in 1e-4 quantized units (= raw |x| > 100 on
    * unit-scale embeddings — two orders of magnitude past any healthy
    * normalization). See the class doc for the overflow arithmetic.
    */
  val MaxAbsQ: Long = 1000000L

  /** Frozen spectral fingerprint of the trusted corpus. */
  final case class Baseline(v: Array[Long], anisoBp: Long, meanMassBp: Long)

  private def baselineOf(g: SpectralQueries.GramStats): Baseline = {
    val (v, aniso, meanMass) = SpectralQueries.powerIterationOf(g)
    Baseline(v, aniso, meanMass)
  }

  /** Fit the baseline: one Gram pass + K driver rounds over the trusted
    * `(vec_id, embedding)` frame — exactly the x76 computation.
    */
  def fit(trusted: DataFrame): Baseline = {
    val spark = trusted.sparkSession
    baselineOf(SpectralQueries.gramStats(
      SpectralQueries.quantize(spark, trusted).select(col("q"))))
  }

  /** Per-family baselines from a trusted `(…, embedding, <labelCol>)`
    * frame — one grouped Gram pass ([[SpectralQueries.gramStatsBy]]),
    * the x84 shape. The global baseline is the exact SUM of the family
    * Grams (key -1), so fitting both costs one scan.
    */
  def fitByFamily(trusted: DataFrame, labelCol: String)
      : Map[Long, Baseline] = {
    val lf = trusted.select(col(labelCol).cast("long").as("lab"),
      quantized(col("embedding")).as("q"))
    val per = SpectralQueries.gramStatsBy(lf)
    // -1 is the GLOBAL sentinel key: a real family labeled -1 would be
    // silently replaced by the global baseline below, and in the log its
    // rows would be indistinguishable from an unlabeled run's
    require(!per.contains(-1L),
      "family label -1 is reserved for the global baseline")
    val global = per.values.reduce(sumGram)
    (per + (-1L -> global)).map { case (lab, g) => lab -> baselineOf(g) }
  }

  private def quantized(e: Column): Column =
    transform(e, x => floor(x.cast("double") * lit(1e4)).cast("long"))

  private def sumGram(a: SpectralQueries.GramStats,
      b: SpectralQueries.GramStats): SpectralQueries.GramStats =
    SpectralQueries.GramStats(a.n + b.n,
      Array.tabulate(a.s.length)(i => a.s(i) + b.s(i)),
      Array.tabulate(a.cUpper.length)(i => a.cUpper(i) + b.cUpper(i)))

  private val logSchema = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("lab", LongType, nullable = false),
    StructField("acc", ArrayType(StringType, containsNull = false),
      nullable = false),
    StructField("n_oversized", LongType, nullable = false)))

  private val statusSchema = StructType(Seq(
    StructField("n_vecs", LongType, nullable = false),
    StructField("aniso_bp", LongType, nullable = false),
    StructField("mean_mass_bp", LongType, nullable = false),
    StructField("align_bp", LongType, nullable = false),
    StructField("aniso_rise_bp", LongType, nullable = false),
    StructField("n_oversized", LongType, nullable = false),
    StructField("drifted", org.apache.spark.sql.types.BooleanType,
      nullable = false)))

  /** @param baseline        frozen global fingerprint ([[fit]], or
    *                        [[fitByFamily]]'s −1 entry)
    * @param logDir          Gram-partial count log root
    * @param minAlignBp      alarm when (v·v_base)² alignment falls below
    * @param maxAnisoRiseBp  alarm when aniso share rises more than this
    * @param labelCol        when set, batches carry this family column
    *                        and the log keeps one row per (batch,
    *                        family) — [[familyStatus]] becomes available
    * @param familyBaselines per-family fingerprints ([[fitByFamily]]);
    *                        families observed without one read as
    *                        drifted (unknown source)
    * @param autoCompactEvery when > 0, [[processBatch]] runs
    *                        [[compactLog]] after every N-th batch, so a
    *                        forever-running monitor holds ≤ N batch dirs
    *                        + one compact row per family at all times —
    *                        no operator intervention needed (0 = manual
    *                        compaction only)
    */
  final class Monitor(
      baseline: Baseline,
      logDir: String,
      minAlignBp: Long = 8000L,
      maxAnisoRiseBp: Long = 1500L,
      labelCol: Option[String] = None,
      familyBaselines: Map[Long, Baseline] = Map.empty,
      autoCompactEvery: Long = 0L) {

    private def ledgerPath =
      java.nio.file.Paths.get(logDir, "_ledger")

    /** (active compact generation, folded-id frontier). Generation 0 =
      * no compact dir exists yet. Compaction folds a PREFIX
      * (`_ <= upTo`), so the folded set compresses to a
      * [[graft.CommittedFrontier]] watermark — the ledger is O(1) lines
      * for the life of the stream (exceptions appear only under
      * out-of-order manual drives), where the r17 format accumulated
      * every folded id forever and re-read the whole list per batch.
      * Legacy id-list ledgers parse transparently and upgrade to the
      * bounded format at the next compaction.
      */
    private def readLedger(): (Long, graft.CommittedFrontier) =
      if (!java.nio.file.Files.exists(ledgerPath))
        (0L, new graft.CommittedFrontier)
      else {
        val lines = java.nio.file.Files.readString(ledgerPath)
          .split("\n").filter(_.nonEmpty)
        (lines.head.toLong,
          graft.CommittedFrontier.parse(lines.tail.mkString("\n")))
      }

    private def writeAtomic(p: java.nio.file.Path, content: String): Unit = {
      java.nio.file.Files.createDirectories(p.getParent)
      val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
      java.nio.file.Files.writeString(tmp, content)
      java.nio.file.Files.move(tmp, p,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }

    private def liveBatchIds(folded: graft.CommittedFrontier): Seq[Long] = {
      val p = java.nio.file.Paths.get(logDir)
      if (!java.nio.file.Files.exists(p)) Seq.empty
      else {
        val l = java.nio.file.Files.list(p)
        try scala.jdk.CollectionConverters.IteratorHasAsScala(l.iterator())
          .asScala.map(_.getFileName.toString)
          .filter(n => n.startsWith("b") && n.drop(1).forall(_.isDigit))
          .map(_.drop(1).toLong).filterNot(folded.contains).toVector.sorted
        finally l.close()
      }
    }

    /** Reduce one micro-batch of `(vec_id, embedding[, labelCol])` to its
      * per-family Gram partials and append them (per-batch-dir overwrite
      * — idempotent on replay; a batch [[compactLog]] already folded is a
      * no-op). Empty batches still log (an all-zero row), so the audit
      * trail records every delivered batch id. Vectors breaching the
      * [[MaxAbsQ]] envelope are excluded from the Gram and counted in
      * `n_oversized` — silent long overflow is never possible.
      */
    def processBatch(batch: DataFrame, batchId: Long): Unit = {
      if (readLedger()._2.contains(batchId)) return // O(1) ledger lines
      val spark = batch.sparkSession
      val labC = labelCol.map(c => col(c).cast("long")).getOrElse(lit(-1L))
      val qf = batch
        .select(labC.as("lab"), quantized(col("embedding")).as("q"))
        .withColumn("ok",
          expr(s"aggregate(q, true, (a, x) -> a AND abs(x) <= $MaxAbsQ)"))
        .persist() // two bounded passes: oversized census + Gram kernel
      try {
        val over = qf.filter(!col("ok")).groupBy("lab")
          .agg(count(lit(1)).as("n"))
          .collect() // bounded: one row per family
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        val grams = SpectralQueries.gramStatsBy(
          qf.filter(col("ok")).select(col("lab"), col("q")))
        val width = 1 + baseline.v.length +
          baseline.v.length * (baseline.v.length + 1) / 2
        val zero = Seq.fill(width)("0")
        val labs = (grams.keySet ++ over.keySet).toSeq.sorted
        // -1 is reserved: in the log it means "unlabeled run" — a real
        // family carrying it would merge into the global on every read
        require(labelCol.isEmpty || !labs.contains(-1L),
          "family label -1 is reserved for the unlabeled/global sentinel")
        val rows =
          if (labs.isEmpty) Seq(Row(batchId, -1L, zero, 0L))
          else labs.map { lab =>
            val acc = grams.get(lab)
              .map(g => (Seq(g.n) ++ g.s ++ g.cUpper).map(_.toString))
              .getOrElse(zero)
            Row(batchId, lab, acc, over.getOrElse(lab, 0L))
          }
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), logSchema)
          .write.mode("overwrite").parquet(s"$logDir/b$batchId")
      } finally qf.unpersist()
      if (autoCompactEvery > 0L && (batchId + 1) % autoCompactEvery == 0L)
        compactLog(batch.sparkSession, batchId)
    }

    /** Read log dirs tolerating the pre-ST40 row shape (no `lab` /
      * `n_oversized` columns — those read as null and are coalesced to
      * the unlabeled family / zero count), so a monitor pointed at a log
      * written by the earlier format reports it instead of NPE-ing.
      */
    private def readLog(spark: SparkSession, dirs: Seq[String]): Array[Row] = {
      val compat = StructType(logSchema.fields.map(f =>
        f.copy(nullable = true)))
      spark.read.schema(compat).parquet(dirs: _*)
        .select(col("batch_id"), coalesce(col("lab"), lit(-1L)).as("lab"),
          col("acc"),
          coalesce(col("n_oversized"), lit(0L)).as("n_oversized"))
        .collect() // bounded: one row per (batch, family), never per vector
    }

    /** Every live log row: folded-in compact generation + un-folded batch
      * dirs (each read once — the ledger excludes folded ids even when
      * their dirs outlive a crash between ledger write and deletion).
      * Synchronized against [[compactLog]] (which [[processBatch]] can
      * trigger via `autoCompactEvery`): the ledger read, the dir
      * listing, and the parquet read must not interleave with a
      * compaction deleting the dirs they name.
      */
    private def logRows(spark: SparkSession): Array[Row] = synchronized {
      val (gen, folded) = readLedger()
      val dirs = liveBatchIds(folded).map(id => s"$logDir/b$id") ++
        (if (gen > 0) Seq(s"$logDir/_compact_v$gen") else Seq.empty)
      require(dirs.nonEmpty, "embedding-drift log is empty")
      readLog(spark, dirs)
    }

    private def foldRows(rows: Seq[Row])
        : Map[Long, (SpectralQueries.GramStats, Long)] = {
      val dim = baseline.v.length
      rows.groupBy(_.getLong(1)).map { case (lab, rs) =>
        val width = rs.head.getSeq[String](2).size
        val tot = Array.fill(width)(BigInt(0))
        var oversized = 0L
        rs.foreach { r =>
          val a = r.getSeq[String](2)
          var i = 0
          while (i < width) { tot(i) += BigInt(a(i)); i += 1 }
          oversized += r.getLong(3)
        }
        lab -> (SpectralQueries.GramStats(tot(0),
          tot.slice(1, 1 + dim), tot.slice(1 + dim, width)), oversized)
      }
    }

    /** The merged GLOBAL Gram statistics over every logged batch (family
      * partials sum exactly — one log serves both views).
      */
    def merged(spark: SparkSession): SpectralQueries.GramStats =
      foldRows(logRows(spark).toSeq).values.map(_._1).reduce(sumGram)

    /** The merged per-family Gram statistics. */
    def mergedByFamily(spark: SparkSession)
        : Map[Long, SpectralQueries.GramStats] =
      foldRows(logRows(spark).toSeq).map { case (l, (g, _)) => (l, g) }

    /** Fold every batch dir with id ≤ `upTo` into the compact generation
      * — exact (Gram partials are associative), ledgered (replays of
      * folded batches no-op), crash-safe (the atomic ledger write is the
      * commit point; see the class doc). Log size after: one row per
      * family + one dir per un-folded batch.
      */
    def compactLog(spark: SparkSession, upTo: Long): Unit = synchronized {
      val (gen, folded) = readLedger()
      val ids = liveBatchIds(folded).filter(_ <= upTo)
      if (ids.isEmpty) return
      val dirs = ids.map(id => s"$logDir/b$id") ++
        (if (gen > 0) Seq(s"$logDir/_compact_v$gen") else Seq.empty)
      // bounded: (batches being folded + families) rows
      val rows = readLog(spark, dirs)
      val foldedRows = foldRows(rows.toSeq).toSeq.sortBy(_._1).map {
        case (lab, (g, over)) =>
          Row(-1L, lab, (Seq(g.n) ++ g.s ++ g.cUpper).map(_.toString), over)
      }
      // 1. new generation first (an orphan if we crash before step 2)
      spark.createDataFrame(
        spark.sparkContext.parallelize(foldedRows, 1), logSchema)
        .write.mode("overwrite").parquet(s"$logDir/_compact_v${gen + 1}")
      // 2. COMMIT: the ledger names the active generation + the folded
      // frontier (ids are a prefix of the live set — O(1) lines forever)
      ids.foreach(folded.add)
      writeAtomic(ledgerPath,
        (gen + 1).toString + "\n" + folded.serialize)
      // 3. best-effort cleanup (re-attempted by any later compaction)
      val victims = ids.map(id => s"$logDir/b$id") ++
        (if (gen > 0) Seq(s"$logDir/_compact_v$gen") else Seq.empty)
      victims.foreach { d =>
        val p = java.nio.file.Paths.get(d)
        if (java.nio.file.Files.exists(p)) {
          val st = java.nio.file.Files.walk(p)
          try {
            import scala.jdk.CollectionConverters._
            st.sorted(java.util.Comparator.reverseOrder())
              .iterator().asScala
              .foreach(java.nio.file.Files.deleteIfExists(_))
          } finally st.close()
        }
      }
    }

    private def verdict(g: SpectralQueries.GramStats, base: Baseline,
        oversized: Long): Row = {
      val (v, aniso, meanMass) = SpectralQueries.powerIterationOf(g)
      val vb = base.v
      val dot = (v.indices).map(i => BigInt(v(i)) * BigInt(vb(i))).sum
      val vv = v.map(x => BigInt(x) * BigInt(x)).sum
      val vbvb = vb.map(x => BigInt(x) * BigInt(x)).sum
      // max(1): a log holding only empty/zero batches yields a zero
      // iterate vector (vv = 0) — the monitor must report the degenerate
      // state (align 0 ⇒ drifted), not crash on a quiet stream
      val alignBp = ((dot * dot * 10000) / (vv * vbvb).max(1)).toLong
      val rise = aniso - base.anisoBp
      val drifted = alignBp < minAlignBp || rise > maxAnisoRiseBp ||
        oversized > 0
      Row(g.n.toLong, aniso, meanMass, alignBp, rise, oversized, drifted)
    }

    /** Current GLOBAL drift verdict: one row — (n_vecs, aniso_bp,
      * mean_mass_bp, align_bp, aniso_rise_bp, n_oversized, drifted).
      */
    def status(spark: SparkSession): DataFrame = {
      val byLab = foldRows(logRows(spark).toSeq)
      val g = byLab.values.map(_._1).reduce(sumGram)
      val oversized = byLab.values.map(_._2).sum
      spark.createDataFrame(spark.sparkContext.parallelize(
        Seq(verdict(g, baseline, oversized)), 1), statusSchema)
    }

    /** Per-FAMILY drift verdicts (the streaming x84): one row per family
      * seen in the log — its own spectrum scored against its own
      * baseline, so a private-direction pathology inside one family
      * alarms even while the global spectrum stays quiet. A family with
      * no fitted baseline reads drifted with align 0/rise 0 (an unknown
      * source entered the stream — that IS the signal).
      */
    def familyStatus(spark: SparkSession): DataFrame = {
      val rows = foldRows(logRows(spark).toSeq).toSeq.sortBy(_._1).map {
        case (lab, (g, over)) =>
          familyBaselines.get(lab) match {
            case Some(b) =>
              val v = verdict(g, b, over)
              Row.fromSeq(lab +: v.toSeq)
            case None =>
              Row(lab, g.n.toLong, 0L, 0L, 0L, 0L, over, true)
          }
      }
      val schema = StructType(
        StructField("label", LongType, nullable = false) +:
          statusSchema.fields.toSeq)
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    }

    /** Wire a file-source embedding stream through the monitor (schema
      * grows a long label column when `labelCol` is wired).
      */
    def start(spark: SparkSession, inDir: String,
        checkpoint: String): StreamingQuery = {
      val schema = labelCol match {
        case Some(c) => StructType(EmbeddingDrift.vecSchema.fields :+
          StructField(c, LongType, nullable = false))
        case None => EmbeddingDrift.vecSchema
      }
      spark.readStream.schema(schema).parquet(inDir)
        .writeStream
        .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
        .option("checkpointLocation", checkpoint)
        .start()
    }
  }

  /** Wire schema of one incoming vector. */
  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding",
      ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false))))
}
