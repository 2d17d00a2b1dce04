package graft.tools

import graft.{GraftSession, SparkEntry}
import java.nio.file.{Files, Paths}

/** Manual sf1-scale parity spot-check (not driver-invoked): the driver
  * gates correctness at sf0.01, and NOTES records DuckDB OOMing on full
  * sf0.1 sweeps — so the most data-sensitive queries get their own
  * heavier drill here: generate a ScaleCorpus at `replicas`× the sf0.1
  * base (10× ≈ sf1), dump those queries' results + oracle SQL exactly
  * like [[graft.Verify]], then compare with per-query FRESH DuckDB
  * connections (tools/compare_oracle.py --fresh), which is what keeps
  * the oracle side inside memory at this scale.
  *
  * Usage:
  *   runMain graft.tools.VerifyHeavy [outDir] [replicas] [names]
  * then:
  *   python3 tools/compare_oracle.py --fresh <outDir>/corpus <outDir>
  *
  * Default query set: the ten most data-shaped plans (pair mining,
  * retrieval, quotas, bloom pruning, CDC compaction) plus x68's
  * tokenizer-train — the ones whose behavior could silently change with
  * data volume.
  */
object VerifyHeavy {
  val DefaultNames: Seq[String] = Seq(
    "x2_dedup_minhash_lsh", "x3_dedup_simhash", "x43_hashed_doc_vectors",
    "x53_quality_propagation", "x54_ann_ivf_adc",
    "x62_token_budget_selection", "x67_hard_negatives",
    "j12_bloom_pruned_join", "cdc3_scd2_history",
    "cdc4_pit_lookup", "x68_bpe_token_budget",
    // r15 continuation: the packing-order audit stacks global windows
    // on the clustered corpus — the one new plan whose cost shape is
    // data-volume-sensitive
    "x70_semantic_packing",
    // r15 third wave: iterative graph joins (edge volume scales with
    // orders), the doc×centroid silhouette matrix, and the four-rung
    // gram ladder — each could silently change shape with data volume
    "x72_copurchase_pagerank", "x74_cluster_silhouette",
    "x75_contamination_extent",
    // this wave: the AUC/decile audit (rank prefixes + radix deciles),
    // the Spearman/quadrant agreement (HUGEINT headroom shrinks with
    // n² — sf1 is the documented-safe edge worth recording), and the
    // cross-entropy grid (vocab-bounded by design; prove it at 10×)
    "x77_scorer_calibration", "x78_signal_agreement",
    "x80_source_crossentropy",
    // r16: the ABTT recall audit (its oracle's pair-dot CTE is
    // |Q|·N·64 rows — sf1 is where that shape earns its keep) and the
    // de-windowed z-order deal (ntile replay through range partitions)
    "x83_anisotropy_correction", "q18_zorder_skipping",
    // r17: the grouped Gram kernel — per-family accumulator maps are the
    // one spectral shape whose memory/merge cost grows with label
    // cardinality × corpus, so the sf1 drill covers it
    "x84_family_spectra",
    // r17 second wave: the recursive-closure oracles (x15's component
    // closure; x85 composes BOTH the simhash and cosine-edge closures)
    // blew DuckDB temp at sf1 until `sim`/`sim_pairs`/`*_und` went
    // MATERIALIZED — plain CTEs re-inline per reference and per
    // recursive iteration (the r15 x53 lesson, generalized). Keep them
    // in the drill so a regression re-surfaces here, not in a verdict.
    "x15_dedup_clusters", "x85_crossmodal_paired_dedup",
    "x86_crossmodal_split_leakage", "x87_paired_survivorship",
    // r18: x88 composes THREE recursive closures (simhash + cosine +
    // the pair-hub graph) — exactly the oracle class that exhausted
    // DuckDB temp at sf1 until MATERIALIZED; x89's w/embq CTEs are the
    // corpus-shaped join the alignment census rides
    "x88_paired_split_producer", "x89_crossmodal_alignment")

  /** Excluded from the seeded rotation: oracles DOCUMENTED as exceeding
    * this machine at sf1. Empty since r18 — x53's recursive replay
    * (the one historical entry: >70 GB DuckDB temp, NOTES r15) passes
    * clean after the r17 MATERIALIZED-CTE oracle fix (r18 drill: 50k
    * rows OK at sf1), so nothing is denied; the hook stays for the next
    * genuinely machine-bound oracle.
    */
  val SampleDeny: Set[String] = Set.empty

  /** Seeded per-round rotation (VERDICT r17 item 4): the static drill
    * set let x15's latent sf1 oracle bomb sleep for five rounds — a
    * random sample on top of the pins means every oracle query
    * eventually gets a heavy drill. Deterministic per seed, recorded in
    * the run log.
    */
  def rotationSample(seed: Long, n: Int): Seq[String] = {
    val pool = graft.SparkEntry.queries.keys.toSeq.sorted
      .filterNot(DefaultNames.contains).filterNot(SampleDeny.contains)
    new scala.util.Random(seed).shuffle(pool).take(n)
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("/tmp/verify_heavy")
    val replicas = args.lift(1).map(_.toInt).getOrElse(10)
    val pinned = args.lift(2).filter(_ != "-").map(_.split(",").toSeq)
      .getOrElse(DefaultNames)
    val seed = args.lift(3).map(_.toLong)
    val sampleN = args.lift(4).map(_.toInt).getOrElse(7)
    val sampled = seed.map(rotationSample(_, sampleN)).getOrElse(Seq.empty)
    seed.foreach(sd => println(
      s"[verify-heavy] rotation sample (seed=$sd): ${sampled.mkString(",")}"))
    val names = (pinned ++ sampled).distinct
    val baseSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", "graft-verify-heavy",
      shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    val corpus = s"$outDir/corpus"
    new java.io.File(corpus).mkdirs()
    println(s"[verify-heavy] generating ${replicas}x corpus from $baseSf")
    val tG = System.nanoTime()
    ScaleCorpus.generate(spark, baseSf, corpus, replicas = replicas)
    println(f"[verify-heavy] corpus ready in ${(System.nanoTime() - tG) / 1e9}%.1f s")

    val known = names.filter(SparkEntry.queries.contains)
    names.filterNot(SparkEntry.queries.contains)
      .foreach(n => System.err.println(s"[verify-heavy] unknown query: $n"))
    known.foreach { name =>
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, corpus).coalesce(1)
          .write.mode("overwrite").parquet(s"$outDir/$name")
        println(f"[verify-heavy] $name dumped in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      } catch { case e: Throwable =>
        System.err.println(s"[verify-heavy] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => known.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    graft.PlanCache.clear(spark)
    spark.stop()
    println(s"[verify-heavy] done; compare with: " +
      s"python3 tools/compare_oracle.py --fresh $corpus $outDir")
  }
}
