package graft.similarity

import graft.{PlanCache, QueryDef}
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spectral diagnostics over the embedding corpus.
  *
  * Sentence/document embedding spaces are notoriously ANISOTROPIC: most
  * of the variance concentrates in a handful of directions (Ethayarajh
  * 2019, "How Contextual are Contextualized Word Representations?";
  * Mu & Viswanath 2018, "All-but-the-Top"), which degrades cosine-based
  * retrieval and near-dup mining — the exact operators this engine's
  * ANN/SemDeDup family runs. x76 measures the effect: the share of
  * centered variance captured by the TOP PRINCIPAL DIRECTION, plus the
  * direction itself (the vector "All-but-the-Top" would remove) and the
  * mass of the common-mean component.
  *
  * Distributed design — ONE corpus pass, not K: dim = 64 is small, so
  * the exact Gram matrix C = Σ_d q_d q_dᵀ (2,080 upper-triangle longs)
  * is computed in a single per-partition kernel pass (the shape Spark
  * MLlib's `RowMatrix.computeGramianMatrix` uses for PCA when the column
  * count is driver-sized), merged exactly through a 2,145-key
  * DECIMAL(38,0) reduce, and the K power-iteration rounds then run on
  * the DRIVER over the 64×64 matrix in BigInt:
  *
  *   u = C·v  (exactly Σ_d q_d (q_d·v) — the same integers the per-pass
  *             form computes, by distributivity),
  *   N·G_c·v = N·u − S (S·v),      S = Σ_d q_d.
  *
  * At 100 TB this is one scan with a combinable reduce — the r15 bench
  * window recorded the K-scan form at 36 s when it ran late in a
  * 181-query session (each extra pass re-pays whatever state the session
  * has accumulated); collapsing to one pass makes the wall cost
  * scan-bounded by construction. The kernel accumulates in primitive
  * longs per partition (|q_i| ≤ 10⁵ ⇒ |q_i·q_j| ≤ 10¹⁰ ⇒ overflow needs
  * ≥ 9·10⁸ rows in ONE partition — 3,000× past a 128 MB parquet split),
  * and the cross-partition merge runs in DECIMAL(38,0), exact at any
  * corpus size.
  *
  * Exactness: embeddings quantize to 1e-4 units in longs (`floor(x·1e4)`
  * — the [[SimilarityQueries.qfix]] convention at a coarser scale so
  * corpus-wide second-moment sums stay far from overflow); per-pass sums
  * aggregate as DECIMAL(38,0) (exact at any corpus size, matching
  * DuckDB's BIGINT→HUGEINT promotion); the driver folds them as BigInt
  * with TRUNCATING division everywhere a quotient can be negative —
  * measured this round: DuckDB's integer `//` truncates toward zero
  * (`-7 // 2 = -3`), exactly BigInt `/` semantics (the inverse of the
  * x74 finding, which was about floor(double division) vs DIV — always
  * measure, never assume, which way an engine rounds). Every emitted
  * number is an integer, so the oracle compare is an exact hash match
  * with no tolerance verdict.
  */
object SpectralQueries {

  private val DIM = 64

  /** Fixed iteration count — replayed verbatim by the oracle's
    * materialized-CTE rounds; convergence is not adjudicated, the two
    * engines replay the identical op sequence. 6 rounds separate the top
    * direction decisively on this corpus (ratio-squared per-round gain).
    */
  private val Iters = 6

  /** L∞ normalization unit between rounds: loadings live in per-mille. */
  private val VUnit = 1000L


  /** The quantized corpus frame (vec_id, q: array<long> in 1e-4 units) —
    * persisted once per corpus dir and shared by all K+1 passes.
    */
  private def qframe(s: SparkSession, d: String): DataFrame =
    PlanCache.persisted(s, s"x76/qarr/$d") {
      quantize(s, Tables.load(s, d, "embeddings"))
    }

  /** Quantize an (vec_id, embedding: array<float>) frame to 1e-4-unit
    * longs — exposed so specs can run the iteration on planted corpora.
    */
  private[graft] def quantize(s: SparkSession, emb: DataFrame): DataFrame = {
    graft.GraftExtensions.ensure(s)
    emb.select(col("vec_id"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1e4)).cast("long")).as("q"))
  }

  /** Exact corpus second-moment statistics from the one-pass Gram
    * kernel: row count N, column sums S = Σq, and the upper triangle of
    * C = Σ q qᵀ. `c(i, j)` reads the full symmetric matrix; `qq` (the
    * raw second moment Σ‖q‖²) is the trace of C.
    */
  private[graft] final case class GramStats(
      n: BigInt, s: Array[BigInt], cUpper: Array[BigInt]) {
    def c(i: Int, j: Int): BigInt = {
      val (a, b) = if (i <= j) (i, j) else (j, i)
      cUpper(a * DIM - a * (a - 1) / 2 + (b - a))
    }
    def qq: BigInt = (0 until DIM).map(i => c(i, i)).sum
  }

  /** ONE distributed pass over `q` rows → exact [[GramStats]].
    *
    * Per-partition kernel accumulates N, S (64 longs) and the C upper
    * triangle (2,080 longs) in primitives — |q_i·q_j| ≤ 10¹⁰ at the
    * 1e-4 quantization of unit-scale embeddings, so a partition would
    * need ~9·10⁸ rows to overflow a long (a 128 MB parquet split holds
    * ~2.5·10⁵). Partials merge via posexplode → 2,145-key DECIMAL(38,0)
    * sums (map-side combinable; exact at any corpus size; never a
    * driver-side collect of per-partition arrays, which at 100 TB would
    * be partitions × 17 KB).
    */
  private[graft] def gramStats(qf: DataFrame): GramStats = {
    val tri = DIM * (DIM + 1) / 2
    val session = qf.sparkSession
    import session.implicits._
    val partials = qf.select(col("q")).as[Seq[Long]]
      .mapPartitions { it =>
        val acc = new Array[Long](1 + DIM + tri)
        while (it.hasNext) {
          val q = it.next()
          acc(0) += 1L
          var i = 0
          var base = 1 + DIM
          while (i < DIM) {
            val qi = q(i)
            acc(1 + i) += qi
            var j = i
            while (j < DIM) {
              acc(base + (j - i)) += qi * q(j)
              j += 1
            }
            base += DIM - i
            i += 1
          }
        }
        Iterator.single(acc)
      }
    val merged = partials.toDF("acc")
      .select(posexplode(col("acc")))
      .groupBy("pos")
      .agg(sum(col("col").cast(DecimalType(38, 0))).as("v"))
      .collect() // bounded: 2,145 rows, corpus-size independent
    val vals = new Array[BigInt](1 + DIM + tri)
    java.util.Arrays.fill(vals.asInstanceOf[Array[AnyRef]], BigInt(0))
    merged.foreach(r => vals(r.getInt(0)) = BigInt(r.getDecimal(1).toBigInteger))
    GramStats(vals(0), vals.slice(1, 1 + DIM), vals.slice(1 + DIM, 1 + DIM + tri))
  }

  /** The grouped form of [[gramStats]]: ONE pass over `(lab, q)` rows →
    * exact per-group [[GramStats]]. The kernel keeps one accumulator per
    * group per partition; the merge is a (lab, pos)-keyed DECIMAL(38,0)
    * aggregate and the collect is groups × 2,145 values — bounded by the
    * GROUP CARDINALITY (the x80 contract: groups are catalog entities
    * like sources or label families, never corpus-sized).
    */
  private[graft] def gramStatsBy(df: DataFrame): Map[Long, GramStats] = {
    val tri = DIM * (DIM + 1) / 2
    val session = df.sparkSession
    import session.implicits._
    val partials = df.select(col("lab"), col("q")).as[(Long, Seq[Long])]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[Long, Array[Long]]
        while (it.hasNext) {
          val (lab, q) = it.next()
          val acc = m.getOrElseUpdate(lab, new Array[Long](1 + DIM + tri))
          acc(0) += 1L
          var i = 0
          var base = 1 + DIM
          while (i < DIM) {
            val qi = q(i)
            acc(1 + i) += qi
            var j = i
            while (j < DIM) {
              acc(base + (j - i)) += qi * q(j)
              j += 1
            }
            base += DIM - i
            i += 1
          }
        }
        m.iterator
      }
    val merged = partials.toDF("lab", "acc")
      .select(col("lab"), posexplode(col("acc")))
      .groupBy("lab", "pos")
      .agg(sum(col("col").cast(DecimalType(38, 0))).as("v"))
      .collect() // bounded: groups × 2,145 rows
    merged.groupBy(_.getLong(0)).map { case (lab, rows) =>
      val vals = new Array[BigInt](1 + DIM + tri)
      java.util.Arrays.fill(vals.asInstanceOf[Array[AnyRef]], BigInt(0))
      rows.foreach(r => vals(r.getInt(1)) = BigInt(r.getDecimal(2).toBigInteger))
      lab -> GramStats(vals(0), vals.slice(1, 1 + DIM),
        vals.slice(1 + DIM, 1 + DIM + tri))
    }
  }

  /** Matrix-free-in-spirit power iteration: one Gram pass over the
    * corpus, then K driver-side BigInt rounds over the 64×64 C —
    * integer-for-integer identical to running each round as a corpus
    * scan (u = C·v = Σ_d q_d (q_d·v) by distributivity), which is what
    * the DuckDB oracle replays.
    *
    * Returns (final loading vector in per-mille, aniso_bp, mean_mass_bp):
    *  - aniso_bp: top-eigenvalue share of the CENTERED trace, basis points
    *    (Rayleigh quotient of the last pre-normalization product);
    *  - mean_mass_bp: ‖Σq‖² / (N·Σ‖q‖²) — the common-mean component's
    *    share of raw second moment (what "All-but-the-Top" subtracts).
    */
  private[graft] def powerIteration(qf: DataFrame)
      : (Array[Long], Long, Long) = powerIterationOf(gramStats(qf))

  /** The K BigInt rounds alone: final v (per-mille longs), the
    * PRE-normalization product of the last round (tLast) and the vector
    * it was computed from (vPrev) — the Rayleigh ingredients.
    */
  private[graft] def iterate(g: GramStats)
      : (Array[Long], Array[BigInt], Array[BigInt]) = {
    val n = g.n
    val sv = g.s
    var v = Array.fill(DIM)(BigInt(VUnit))
    var vPrev = v
    var tLast = Array.fill(DIM)(BigInt(0))
    for (_ <- 1 to Iters) {
      val u = Array.tabulate(DIM)(i =>
        (0 until DIM).map(j => g.c(i, j) * v(j)).sum)
      val sDotV = (0 until DIM).map(i => sv(i) * v(i)).sum
      val t = Array.tabulate(DIM)(i => n * u(i) - sv(i) * sDotV)
      val m = t.map(_.abs).max.max(BigInt(1))
      vPrev = v
      tLast = t
      // BigInt `/` truncates toward zero — the semantics DuckDB's
      // integer `//` applies (measured: -7 // 2 = -3)
      v = t.map(x => (x * VUnit) / m)
    }
    (v.map(_.toLong), vPrev, tLast)
  }

  private[graft] def powerIterationOf(g: GramStats)
      : (Array[Long], Long, Long) = {
    val (v, vPrev, tLast) = iterate(g)
    val rayNum = (0 until DIM).map(i => vPrev(i) * tLast(i)).sum
    val rayDen = (0 until DIM).map(i => vPrev(i) * vPrev(i)).sum
    val ssum = g.s.map(x => x * x).sum
    val traceC = g.n * g.qq - ssum
    // max(1) denominators: an all-zero/degenerate Gram (empty or
    // zero-vector input — possible for ST39's streaming callers on a
    // quiet stream) must report 0, not throw. On any real corpus both
    // denominators are positive, so x76/x83/x84 parity is untouched
    // (their oracles carry no GREATEST for these and never need one).
    val anisoBp = ((rayNum * 10000) / (rayDen * traceC).max(1)).toLong
    val meanMassBp = ((ssum * 10000) / (g.n * g.qq).max(1)).toLong
    (v, anisoBp, meanMassBp)
  }

  /** X76 — embedding anisotropy audit: top principal direction (matrix-
    * free distributed power iteration, K=6), its share of centered
    * variance, and the common-mean mass — all in exact integer units.
    */
  val x76EmbeddingAnisotropy = QueryDef(
    "x76_embedding_anisotropy",
    "top principal direction of the embedding corpus + centered-variance share (matrix-free power iteration, exact fixed point)",
    (s, d) => {
      val (loading, anisoBp, meanMassBp) = powerIteration(qframe(s, d))
      val rows = (1 to DIM).map(i =>
        Row(i.toLong, loading(i - 1), anisoBp, meanMassBp))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("dim",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("loading_pm",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("aniso_bp",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("mean_mass_bp",
          org.apache.spark.sql.types.LongType, nullable = false)))
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
        .orderBy("dim")
    },
    Some(oracleSql))

  /** DuckDB replay: the identical pass-0 sums and K materialized
    * iteration rounds in HUGEINT (`SUM(BIGINT)` promotes exactly), with
    * `//` TRUNCATING division matching the driver's BigInt `/` (both
    * round toward zero: -7 // 2 = -3, measured — see the class doc).
    */
  /** The K materialized power-iteration rounds over a `base (vec_id, i,
    * qi)` / `nn (n)` / `sums (i, s)` CTE family — shared verbatim by the
    * x76 and x83 oracles (x83 just points `base` at the corrupted
    * corpus).
    */
  private def roundsSql: String =
    (1 to Iters).map { k =>
      val pv = if (k == 1) "v0" else s"v${k - 1}"
      s"""sd$k AS (
         |  SELECT b.vec_id, SUM(b.qi * v.val) AS sdoc
         |  FROM base b JOIN $pv v USING (i) GROUP BY b.vec_id),
         |u$k AS (
         |  SELECT b.i, SUM(b.qi * s.sdoc) AS u
         |  FROM base b JOIN sd$k s USING (vec_id) GROUP BY b.i),
         |dv$k AS (SELECT SUM(s.s * v.val) AS sv
         |         FROM sums s JOIN $pv v USING (i)),
         |t$k AS MATERIALIZED (
         |  SELECT u.i,
         |         (SELECT n FROM nn) * u.u - s.s * (SELECT sv FROM dv$k) AS t
         |  FROM u$k u JOIN sums s USING (i)),
         |m$k AS (SELECT GREATEST(MAX(ABS(t)), 1) AS m FROM t$k),
         |v$k AS MATERIALIZED (
         |  SELECT i, (t * $VUnit) // (SELECT m FROM m$k) AS val FROM t$k)"""
        .stripMargin
    }.mkString(",\n")

  private def oracleSql: String = {
    val rounds = roundsSql
    s"""WITH base AS MATERIALIZED (
       |  SELECT e.vec_id, u.i AS i,
       |         CAST(floor(CAST(e.embedding[u.i] AS DOUBLE) * 10000.0)
       |              AS BIGINT) AS qi
       |  FROM embeddings e, UNNEST(generate_series(1, $DIM)) AS u(i)),
       |nn AS (SELECT CAST(count(DISTINCT vec_id) AS HUGEINT) AS n FROM base),
       |sums AS MATERIALIZED (
       |  SELECT i, CAST(SUM(qi) AS HUGEINT) AS s FROM base GROUP BY i),
       |qqt AS (SELECT CAST(SUM(qi * qi) AS HUGEINT) AS qq FROM base),
       |ssq AS (SELECT SUM(s * s) AS ss FROM sums),
       |v0 AS (SELECT g.i, CAST($VUnit AS HUGEINT) AS val
       |       FROM UNNEST(generate_series(1, $DIM)) AS g(i)),
       |$rounds,
       |ray AS (SELECT SUM(v.val * t.t) AS num, SUM(v.val * v.val) AS den
       |        FROM v${Iters - 1} v JOIN t$Iters t USING (i)),
       |trc AS (SELECT (SELECT n FROM nn) * (SELECT qq FROM qqt) -
       |               (SELECT ss FROM ssq) AS tr)
       |SELECT CAST(v.i AS BIGINT) AS dim,
       |       CAST(v.val AS BIGINT) AS loading_pm,
       |       CAST((10000 * (SELECT num FROM ray)) //
       |            ((SELECT den FROM ray) * (SELECT tr FROM trc))
       |            AS BIGINT) AS aniso_bp,
       |       CAST((10000 * (SELECT ss FROM ssq)) //
       |            ((SELECT n FROM nn) * (SELECT qq FROM qqt))
       |            AS BIGINT) AS mean_mass_bp
       |FROM v$Iters v ORDER BY dim""".stripMargin
  }

  /** Planted common-direction amplitude, in 1e-4 quantized units per
    * dimension: vector d gets `(vec_id % 7 + 1) · 625` added to EVERY
    * dimension — i.e. α_d·g with g = (1/8,…,1/8) (unit norm over 64
    * dims) and α_d ∈ {0.5,…,3.5}. Integer-exact and replayable by
    * construction; it turns the near-isotropic synthetic corpus (top
    * direction 2.1% of variance) into the anisotropic shape real text
    * embeddings have (planted: ~51% — measured before freezing the
    * oracle).
    */
  private def plantSql = s"625 * (vec_id % 7 + 1)"

  /** The corrupted quantized corpus behind x83 — (vec_id, label, qc) —
    * PlanCache'd: referenced by the Gram pass and the pair-scoring join.
    */
  private[similarity] def corruptedFrame(s: SparkSession, d: String): DataFrame =
    PlanCache.persisted(s, s"x83/qc/$d") {
      graft.GraftExtensions.ensure(s)
      Tables.load(s, d, "embeddings").select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) " +
          s"* 10000.0) AS BIGINT) + $plantSql)").as("qc"))
    }

  /** X83 — All-but-the-Top anisotropy CORRECTION (Mu & Viswanath 2018,
    * "All-but-the-Top: Simple and Effective Postprocessing for Word
    * Representations"): x76 measures the pathology, this operator applies
    * the fix — subtract the corpus mean and project out the top principal
    * direction — and PROVES it helps retrieval by re-scoring
    * label-recall@10 on the planted families in the raw vs corrected
    * space.
    *
    * Audit design (the x48/x65 planted-pathology discipline): the
    * synthetic corpus is nearly isotropic, where ABTT is a no-op-to-
    * harmful (measured: top direction carries 2.1% of variance and is
    * label-DISCRIMINATIVE — removing it costs recall). So the audit
    * plants the pathology it corrects: a deterministic common bias
    * direction with per-doc amplitude ([[plantSql]]), the exact shape
    * (Ethayarajh 2019) real sentence embeddings exhibit. On the planted
    * corpus the top direction is ~51% of variance and non-discriminative;
    * the audit reports label-recall@10 in BOTH spaces — corrected must
    * beat raw (measured: 33→40 hits of 300 at sf0.1; ≥ at every SF,
    * pinned by `SpectralSpec`).
    *
    * Exactness: the correction runs entirely in integer fixed point —
    * m = S div n (truncating), v from the SAME K-round iteration x76
    * uses (over the corrupted Gram), w = qc − m, r = (w·v·10³) div (v·v),
    * z_i = 10³·w_i − r·v_i (the per-mille scales of w·v and v·v cancel,
    * so r·v_i IS the projection at the 10³·w scale; truncating r costs
    * ≤ |v|_∞ = 10³ on a ~3·10⁷ z scale) — corrected vectors are
    * identical longs on both engines. Overflow envelope: v is
    * L∞-normalized (|v|_∞ = 10³, |v|₂ ≥ 10³), so r ≤ 10³·|w|₂/|v|₂ ≤
    * 8·|w|_∞ and |z|_∞ ≤ 9·10³·|w|_∞ ≤ 2.7·10⁸ ⇒ pair dots ≤ 64·|z|²_∞
    * < 4.7·10¹⁸ — long-safe with 2× headroom (this corpus: |z| ≈ 3·10⁷).
    * Cosines are one identical IEEE op sequence. Scale posture: one
    * Gram pass (the x76 kernel), one O(dim) driver fold, one broadcast
    * query-set scan of the corpus (the x6 brute-force shape — this is
    * the audit; production serving stays on the IVF path).
    */
  val x83AnisotropyCorrection = QueryDef(
    "x83_anisotropy_correction",
    "All-but-the-Top correction: label-recall@10 in raw vs mean+top-direction-removed space on a planted anisotropic corpus",
    (s, d) => {
      val base = corruptedFrame(s, d)
      val g = gramStats(base.select(col("qc").as("q")))
      val (v, _, _) = powerIterationOf(g)
      val vv = v.map(x => x * x).sum // ≤ 64·10⁶ — long-safe
      val m = (0 until DIM).map(i => (g.s(i) / g.n).toLong) // truncating
      val mStr = m.mkString("array(", "L,", "L)")
      val vStr = v.mkString("array(", "L,", "L)")
      val corrected = base
        .withColumn("w", expr(s"zip_with(qc, $mStr, (a, b) -> a - b)"))
        .withColumn("wv",
          call_function("graft_dot_long", col("w"), typedlit(v.toSeq)))
        .withColumn("r", expr(s"(wv * 1000L) div ${vv}L"))
        .withColumn("z", expr(
          s"zip_with(w, $vStr, (a, b) -> a * 1000L - r * b)"))
        .withColumn("nraw",
          call_function("graft_dot_long", col("qc"), col("qc")))
        .withColumn("nz", call_function("graft_dot_long", col("z"), col("z")))
        .select("vec_id", "label", "qc", "z", "nraw", "nz")
      val qset = corrected.filter(col("vec_id") % 67 === 0)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("qc").as("q_qc"), col("z").as("q_z"),
          col("nraw").as("q_nraw"), col("nz").as("q_nz"))
      val sc = corrected.join(broadcast(qset), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("q_label"), col("label"), col("vec_id"),
          (call_function("graft_dot_long", col("qc"), col("q_qc"))
            .cast("double") /
            (sqrt(col("nraw").cast("double")) *
              sqrt(col("q_nraw").cast("double")))).as("cos_raw"),
          (call_function("graft_dot_long", col("z"), col("q_z"))
            .cast("double") /
            (sqrt(col("nz").cast("double")) *
              sqrt(col("q_nz").cast("double")))).as("cos_z"))
      def top(space: String, cosCol: String) = {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col(cosCol).desc, col("vec_id"))
        sc.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 10)
          .select(lit(space).as("space"), col("q_id"),
            (col("label") === col("q_label")).cast("long").as("hit"))
      }
      top("abtt", "cos_z").unionAll(top("raw", "cos_raw"))
        .groupBy("space")
        .agg(countDistinct(col("q_id")).as("n_queries"),
          sum(col("hit")).as("label_hits"),
          count(lit(1)).as("total_slots"))
        .select(col("space"), col("n_queries"), col("label_hits"),
          col("total_slots"),
          expr("(label_hits * 10000) div total_slots").as("recall_bp"))
        .orderBy("space")
    },
    Some(x83OracleSql))

  private def x83OracleSql: String =
    s"""WITH base AS MATERIALIZED (
       |  SELECT e.vec_id, e.label, u.i AS i,
       |         CAST(floor(CAST(e.embedding[u.i] AS DOUBLE) * 10000.0)
       |              AS BIGINT) + $plantSql AS qi
       |  FROM embeddings e, UNNEST(generate_series(1, $DIM)) AS u(i)),
       |nn AS (SELECT CAST(count(DISTINCT vec_id) AS HUGEINT) AS n FROM base),
       |sums AS MATERIALIZED (
       |  SELECT i, CAST(SUM(qi) AS HUGEINT) AS s FROM base GROUP BY i),
       |v0 AS (SELECT g.i, CAST($VUnit AS HUGEINT) AS val
       |       FROM UNNEST(generate_series(1, $DIM)) AS g(i)),
       |$roundsSql,
       |vvt AS (SELECT SUM(val * val) AS vv FROM v$Iters),
       |mm AS (SELECT i, s // (SELECT n FROM nn) AS m FROM sums),
       |w AS MATERIALIZED (
       |  SELECT b.vec_id, b.label, b.i, b.qi, b.qi - mm.m AS wi
       |  FROM base b JOIN mm USING (i)),
       |wvt AS (SELECT vec_id, SUM(wi * v.val) AS wv
       |        FROM w JOIN v$Iters v USING (i) GROUP BY 1),
       |rr AS (SELECT vec_id, (wv * 1000) // (SELECT vv FROM vvt) AS r
       |       FROM wvt),
       |z AS MATERIALIZED (
       |  SELECT w.vec_id, w.label, w.i, w.qi,
       |         w.wi * 1000 - rr.r * v.val AS zi
       |  FROM w JOIN rr USING (vec_id) JOIN v$Iters v USING (i)),
       |nrm AS MATERIALIZED (
       |  SELECT vec_id, CAST(SUM(qi * qi) AS BIGINT) AS nraw,
       |         CAST(SUM(zi * zi) AS BIGINT) AS nz
       |  FROM z GROUP BY 1),
       |dots AS MATERIALIZED (
       |  SELECT a.vec_id, a.label, b.vec_id AS q_id, b.label AS q_label,
       |         CAST(SUM(a.qi * b.qi) AS BIGINT) AS draw,
       |         CAST(SUM(a.zi * b.zi) AS BIGINT) AS dz
       |  FROM z a JOIN z b ON a.i = b.i AND b.vec_id % 67 = 0
       |                    AND a.vec_id <> b.vec_id
       |  GROUP BY 1, 2, 3, 4),
       |sc AS (SELECT d.*, n1.nraw AS araw, n1.nz AS az,
       |              n2.nraw AS qraw, n2.nz AS qz
       |       FROM dots d JOIN nrm n1 ON d.vec_id = n1.vec_id
       |                   JOIN nrm n2 ON d.q_id = n2.vec_id),
       |ranked AS (
       |  SELECT 'raw' AS space, q_id, q_label, label,
       |         row_number() OVER (PARTITION BY q_id ORDER BY
       |           CAST(draw AS DOUBLE) / (sqrt(CAST(araw AS DOUBLE)) *
       |             sqrt(CAST(qraw AS DOUBLE))) DESC, vec_id) AS rk
       |  FROM sc
       |  UNION ALL
       |  SELECT 'abtt', q_id, q_label, label,
       |         row_number() OVER (PARTITION BY q_id ORDER BY
       |           CAST(dz AS DOUBLE) / (sqrt(CAST(az AS DOUBLE)) *
       |             sqrt(CAST(qz AS DOUBLE))) DESC, vec_id) AS rk
       |  FROM sc)
       |SELECT space, CAST(count(DISTINCT q_id) AS BIGINT) AS n_queries,
       |       CAST(SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END)
       |            AS BIGINT) AS label_hits,
       |       CAST(count(*) AS BIGINT) AS total_slots,
       |       CAST((SUM(CASE WHEN label = q_label THEN 1 ELSE 0 END) * 10000)
       |            // count(*) AS BIGINT) AS recall_bp
       |FROM ranked WHERE rk <= 10
       |GROUP BY space ORDER BY space""".stripMargin

  /** X84 — per-family spectral health: x76's audit decomposed BY LABEL
    * FAMILY (the per-source health matrix of x80, for embeddings). For
    * each planted family: its member count, its OWN top-direction
    * variance share, its common-mean mass, and the squared-cosine
    * alignment of its top direction with the GLOBAL one. The audit a
    * training-data team runs to localize a spectral pathology: a family
    * with high aniso + low global alignment has its own private common
    * direction (a templated/near-duplicate family — the SemDeDup
    * signal); high aniso + high alignment across families means the
    * ENCODER is degenerate (fix globally with x83); all-low is healthy.
    *
    * One pass: the grouped Gram kernel ([[gramStatsBy]]) reduces the
    * corpus to labels × 2,145 integers; the global Gram is the exact SUM
    * of the family Grams (free — no second pass); K rounds per family
    * run on the driver (labels are catalog-bounded). Degenerate families
    * (n ≤ 1, or zero centered variance) guard every division with
    * max(·,1) — mirrored as GREATEST(·,1) in the oracle, so tiny planted
    * families can never diverge the engines. Output is integer-exact;
    * the oracle replays the per-label rounds with the global as label
    * −1 (a unioned copy of the corpus, so its sums are identical to the
    * engine's Gram-sum shortcut by construction).
    */
  val x84FamilySpectra = QueryDef(
    "x84_family_spectra",
    "per-label-family anisotropy + alignment with the global top direction (grouped one-pass Gram, exact fixed point)",
    (s, d) => {
      val lf = PlanCache.persisted(s, s"x84/ql/$d") {
        graft.GraftExtensions.ensure(s)
        Tables.load(s, d, "embeddings").select(
          col("label").cast("long").as("lab"),
          transform(col("embedding"),
            x => floor(x.cast("double") * lit(1e4)).cast("long")).as("q"))
      }
      val per = gramStatsBy(lf)
      val global = per.values.reduce { (a, b) =>
        GramStats(a.n + b.n,
          Array.tabulate(a.s.length)(i => a.s(i) + b.s(i)),
          Array.tabulate(a.cUpper.length)(i => a.cUpper(i) + b.cUpper(i)))
      }
      val all = per.toSeq.sortBy(_._1) :+ (-1L -> global)
      val folded = all.map { case (lab, g) =>
        val (v, vPrev, tLast) = iterate(g)
        val rayNum = (0 until DIM).map(i => vPrev(i) * tLast(i)).sum
        val rayDen = (0 until DIM).map(i => vPrev(i) * vPrev(i)).sum
        val ssum = g.s.map(x => x * x).sum
        val traceC = g.n * g.qq - ssum
        val anisoBp = ((rayNum * 10000) / (rayDen * traceC).max(1)).toLong
        val meanMassBp = ((ssum * 10000) / (g.n * g.qq).max(1)).toLong
        (lab, g.n.toLong, v, anisoBp, meanMassBp)
      }
      val vg = folded.last._3
      val gg = vg.map(x => BigInt(x) * BigInt(x)).sum
      val rows = folded.map { case (lab, n, v, aniso, mm) =>
        val dg = v.indices.map(i => BigInt(v(i)) * BigInt(vg(i))).sum
        val vv = v.map(x => BigInt(x) * BigInt(x)).sum
        val alignBp = ((dg * dg * 10000) / (vv * gg).max(1)).toLong
        Row(lab, n, aniso, mm, alignBp)
      }
      val schema = org.apache.spark.sql.types.StructType(
        Seq("label", "n_vecs", "aniso_bp", "mean_mass_bp",
          "align_global_bp").map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.LongType, nullable = false)))
      s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
        .orderBy("label")
    },
    Some(x84OracleSql))

  /** The per-label x84 rounds: every x76 CTE keyed by `lab`, with the
    * global corpus riding along as lab = −1 (a unioned copy — identical
    * sums to the engine's Gram-sum shortcut).
    */
  private def x84OracleSql: String = {
    val rounds = (1 to Iters).map { k =>
      val pv = if (k == 1) "v0" else s"v${k - 1}"
      s"""sd$k AS (
         |  SELECT b.lab, b.vec_id, SUM(b.qi * v.val) AS sdoc
         |  FROM base b JOIN $pv v ON v.lab = b.lab AND v.i = b.i
         |  GROUP BY b.lab, b.vec_id),
         |u$k AS (
         |  SELECT b.lab, b.i, SUM(b.qi * s.sdoc) AS u
         |  FROM base b JOIN sd$k s
         |    ON s.lab = b.lab AND s.vec_id = b.vec_id
         |  GROUP BY b.lab, b.i),
         |dv$k AS (SELECT s.lab, SUM(s.s * v.val) AS sv
         |         FROM sums s JOIN $pv v ON v.lab = s.lab AND v.i = s.i
         |         GROUP BY s.lab),
         |t$k AS MATERIALIZED (
         |  SELECT u.lab, u.i, nn.n * u.u - s.s * dv.sv AS t
         |  FROM u$k u JOIN sums s ON s.lab = u.lab AND s.i = u.i
         |            JOIN nn ON nn.lab = u.lab
         |            JOIN dv$k dv ON dv.lab = u.lab),
         |m$k AS (SELECT lab, GREATEST(MAX(ABS(t)), 1) AS m
         |        FROM t$k GROUP BY lab),
         |v$k AS MATERIALIZED (
         |  SELECT t.lab, t.i, (t.t * $VUnit) // m.m AS val
         |  FROM t$k t JOIN m$k m ON m.lab = t.lab)""".stripMargin
    }.mkString(",\n")
    s"""WITH raw AS MATERIALIZED (
       |  SELECT CAST(e.label AS BIGINT) AS lab, e.vec_id, u.i AS i,
       |         CAST(floor(CAST(e.embedding[u.i] AS DOUBLE) * 10000.0)
       |              AS BIGINT) AS qi
       |  FROM embeddings e, UNNEST(generate_series(1, $DIM)) AS u(i)),
       |base AS MATERIALIZED (
       |  SELECT lab, vec_id, i, qi FROM raw
       |  UNION ALL SELECT -1 AS lab, vec_id, i, qi FROM raw),
       |nn AS MATERIALIZED (
       |  SELECT lab, CAST(count(DISTINCT vec_id) AS HUGEINT) AS n
       |  FROM base GROUP BY lab),
       |sums AS MATERIALIZED (
       |  SELECT lab, i, CAST(SUM(qi) AS HUGEINT) AS s
       |  FROM base GROUP BY lab, i),
       |qqt AS (SELECT lab, CAST(SUM(qi * qi) AS HUGEINT) AS qq
       |        FROM base GROUP BY lab),
       |ssq AS (SELECT lab, SUM(s * s) AS ss FROM sums GROUP BY lab),
       |v0 AS (SELECT l.lab, g.i, CAST($VUnit AS HUGEINT) AS val
       |       FROM (SELECT DISTINCT lab FROM base) l,
       |            UNNEST(generate_series(1, $DIM)) AS g(i)),
       |$rounds,
       |ray AS (SELECT v.lab, SUM(v.val * t.t) AS num,
       |               SUM(v.val * v.val) AS den
       |        FROM v${Iters - 1} v JOIN t$Iters t
       |          ON t.lab = v.lab AND t.i = v.i
       |        GROUP BY v.lab),
       |gvec AS (SELECT i, val FROM v$Iters WHERE lab = -1),
       |ggn AS (SELECT SUM(val * val) AS gg FROM gvec),
       |al AS (SELECT v.lab, SUM(v.val * g.val) AS dg,
       |              SUM(v.val * v.val) AS vv
       |       FROM v$Iters v JOIN gvec g USING (i) GROUP BY v.lab)
       |SELECT nn.lab AS label,
       |       CAST(nn.n AS BIGINT) AS n_vecs,
       |       CAST((10000 * ray.num) //
       |            GREATEST(ray.den * (nn.n * qqt.qq - ssq.ss), 1)
       |            AS BIGINT) AS aniso_bp,
       |       CAST((10000 * ssq.ss) // GREATEST(nn.n * qqt.qq, 1)
       |            AS BIGINT) AS mean_mass_bp,
       |       CAST((al.dg * al.dg * 10000) //
       |            GREATEST(al.vv * (SELECT gg FROM ggn), 1)
       |            AS BIGINT) AS align_global_bp
       |FROM nn JOIN qqt ON qqt.lab = nn.lab
       |        JOIN ssq ON ssq.lab = nn.lab
       |        JOIN ray ON ray.lab = nn.lab
       |        JOIN al ON al.lab = nn.lab
       |ORDER BY label""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(x76EmbeddingAnisotropy,
    x83AnisotropyCorrection, x84FamilySpectra)
}
