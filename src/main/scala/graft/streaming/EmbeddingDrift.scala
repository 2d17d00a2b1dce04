package graft.streaming

import graft.similarity.SpectralQueries
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{ArrayType, LongType, StringType, StructField, StructType}

/** ST39 — streaming embedding-anisotropy drift monitor: the live form of
  * the x76 spectral audit, closing the spectral family's loop — x76
  * MEASURES the pathology offline, x83 FIXES it (All-but-the-Top), this
  * WATCHES for it arriving in production. An embedding pipeline drifts
  * spectrally when the encoder changes (silent model swap, fp16
  * truncation, a broken normalization batch) — cosine retrieval and
  * SemDeDup quality degrade long before any per-vector check fires,
  * because the failure is a property of the DISTRIBUTION (a new dominant
  * common direction), not of any row.
  *
  * Design — the Gram merge IS the state:
  *  - Per micro-batch, ONE pass ([[SpectralQueries.gramStats]]'s kernel)
  *    reduces the batch to its exact second-moment partials (N, S, the
  *    64×64 upper triangle — 2,145 integers), appended to a count log as
  *    one row per batch. Gram accumulation is associative and exact, so
  *    the merged log over any batch split equals the batch statistics of
  *    the union — stream ≡ batch is an INTEGER EQUALITY, not a tolerance
  *    (`EmbeddingDriftSpec` pins chunking invariance against
  *    [[SpectralQueries.powerIteration]] on the whole corpus).
  *  - Serving merges the log driver-side (rows = batches, 2,145 BigInt
  *    strings each — bounded by batch COUNT, never by corpus size) and
  *    runs the same K-round BigInt iteration x76 runs, then scores the
  *    current top direction against the FROZEN baseline:
  *    align_bp = (v·v_base)²·10⁴ / (‖v‖²·‖v_base‖²), truncating.
  *  - Alarm when alignment falls below `minAlignBp` (the top direction
  *    ROTATED — a new common component appeared) or the anisotropy share
  *    rises more than `maxAnisoRiseBp` over baseline (the space is
  *    COLLAPSING toward a dominant direction even if it happens to align).
  *  - Exactly-once: the log write is a per-batch-directory overwrite (a
  *    replayed batch replaces itself — the [[StreamingDedup]] rule), and
  *    the serve-side merge reads each batch id once.
  *
  * Scale posture: each arriving vector is touched exactly once by a
  * map-combinable kernel pass; state is 2,145 integers per BATCH (not
  * per key); serving cost is O(batches·dim²) driver arithmetic. At
  * 100 TB/day the monitor's cost is the scan it shares with ingest.
  */
object EmbeddingDrift {

  /** Frozen spectral fingerprint of the trusted corpus. */
  final case class Baseline(v: Array[Long], anisoBp: Long, meanMassBp: Long)

  /** Fit the baseline: one Gram pass + K driver rounds over the trusted
    * `(vec_id, embedding)` frame — exactly the x76 computation.
    */
  def fit(trusted: DataFrame): Baseline = {
    val spark = trusted.sparkSession
    val (v, aniso, meanMass) = SpectralQueries.powerIteration(
      SpectralQueries.quantize(spark, trusted))
    Baseline(v, aniso, meanMass)
  }

  private val logSchema = StructType(Seq(
    StructField("batch_id", LongType, nullable = false),
    StructField("acc", ArrayType(StringType, containsNull = false),
      nullable = false)))

  final class Monitor(
      baseline: Baseline,
      logDir: String,
      minAlignBp: Long = 8000L,
      maxAnisoRiseBp: Long = 1500L) {

    /** Reduce one micro-batch of `(vec_id, embedding)` to its Gram
      * partials and append them (per-batch-dir overwrite — idempotent on
      * replay). Empty batches still log (an all-zero row), so the audit
      * trail records every delivered batch id.
      */
    def processBatch(batch: DataFrame, batchId: Long): Unit = {
      val spark = batch.sparkSession
      val g = SpectralQueries.gramStats(
        SpectralQueries.quantize(spark, batch).select(col("q")))
      val acc = (Seq(g.n) ++ g.s ++ g.cUpper).map(_.toString)
      val row = Row(batchId, acc)
      spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(row), 1), logSchema)
        .write.mode("overwrite").parquet(s"$logDir/b$batchId")
    }

    /** The merged Gram statistics over every logged batch. */
    def merged(spark: SparkSession): SpectralQueries.GramStats = {
      val rows = spark.read.option("recursiveFileLookup", "true")
        .schema(logSchema).parquet(logDir)
        .collect() // bounded: one 2,145-value row per BATCH, never per vector
      require(rows.nonEmpty, "embedding-drift log is empty")
      val width = rows.head.getSeq[String](1).size
      val tot = Array.fill(width)(BigInt(0))
      rows.foreach { r =>
        val a = r.getSeq[String](1)
        var i = 0
        while (i < width) { tot(i) += BigInt(a(i)); i += 1 }
      }
      val dim = baseline.v.length
      SpectralQueries.GramStats(tot(0),
        tot.slice(1, 1 + dim), tot.slice(1 + dim, width))
    }

    /** Current drift verdict: one row —
      * (n_vecs, aniso_bp, mean_mass_bp, align_bp, aniso_rise_bp, drifted).
      */
    def status(spark: SparkSession): DataFrame = {
      val g = merged(spark)
      val (v, aniso, meanMass) = SpectralQueries.powerIterationOf(g)
      val vb = baseline.v
      val dot = (v.indices).map(i => BigInt(v(i)) * BigInt(vb(i))).sum
      val vv = v.map(x => BigInt(x) * BigInt(x)).sum
      val vbvb = vb.map(x => BigInt(x) * BigInt(x)).sum
      val alignBp = ((dot * dot * 10000) / (vv * vbvb)).toLong
      val rise = aniso - baseline.anisoBp
      val drifted = alignBp < minAlignBp || rise > maxAnisoRiseBp
      val schema = StructType(Seq(
        StructField("n_vecs", LongType, nullable = false),
        StructField("aniso_bp", LongType, nullable = false),
        StructField("mean_mass_bp", LongType, nullable = false),
        StructField("align_bp", LongType, nullable = false),
        StructField("aniso_rise_bp", LongType, nullable = false),
        StructField("drifted", org.apache.spark.sql.types.BooleanType,
          nullable = false)))
      spark.createDataFrame(spark.sparkContext.parallelize(Seq(
        Row(g.n.toLong, aniso, meanMass, alignBp, rise, drifted)), 1), schema)
    }

    /** Wire a file-source embedding stream through the monitor. */
    def start(spark: SparkSession, inDir: String,
        checkpoint: String): StreamingQuery =
      spark.readStream.schema(EmbeddingDrift.vecSchema).parquet(inDir)
        .writeStream
        .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
        .option("checkpointLocation", checkpoint)
        .start()
  }

  /** Wire schema of one incoming vector. */
  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType, nullable = false),
    StructField("embedding",
      ArrayType(org.apache.spark.sql.types.FloatType, containsNull = false))))
}
