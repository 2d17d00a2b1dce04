package graft.multimodal

import graft.QueryDef
import graft.dedup.{ClusterQueries, DedupQueries}
import graft.similarity.SimilarityQueries
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-modal PAIRED curation: the dedup decision for caption–image
  * pairs (the LAION shape — every training example is a text AND an
  * image, and the pair must be dropped when EITHER side is a
  * non-canonical near-duplicate). Single-modality dedup under-deletes
  * paired corpora: a template caption re-used over distinct photos, or
  * one photo re-captioned a hundred ways, both survive per-modality
  * canonical cuts on the OTHER side — the pair-level rule is the one
  * that actually de-weights the duplicated content.
  *
  * Semantics: each side carries its own near-dup cluster map `(node,
  * lbl)` with the min-id canonical convention (x15's rule, shared by
  * text SimHash components and [[Multimodal.imageDupClusters]]); a pair
  * is KEPT iff its text is its text-cluster's canonical (or unclustered)
  * AND its image is its image-cluster's canonical (or unclustered).
  * The census over {kept, drop_text, drop_image, drop_both} is the audit
  * a curation team reads: `drop_both` ≈ exact pair duplicates,
  * `drop_text`-heavy ≈ caption templating, `drop_image`-heavy ≈ image
  * re-captioning. The honest cost of the simple EITHER rule is visible
  * in the same census: two clusters can canonicalize onto DIFFERENT
  * pairs and drop a whole family — counted, not hidden.
  *
  * Scale posture: cluster maps are pair-graph-sized (bounded by the
  * banded candidate generation, never corpus-shaped); the verdict is two
  * left joins of those maps onto one pass of the pair frame, and the
  * census is a fixed-cardinality aggregate. No windows, no self-joins.
  *
  * Reference anchor: extends the reference's dedup/quality gates (batch
  * pipeline north star) to paired multimodal corpora; pair-level
  * canonicalization per Webster et al. 2023 ("On the De-duplication of
  * LAION-2B") — rebuilt as exact cluster-map joins, not transcribed.
  */
object CrossModalQueries {

  /** Flag every pair: `(pair_id, text_id, image_id, text_dup, image_dup,
    * status)` given the two `(node, lbl)` cluster maps. `*_dup` = member
    * of a cluster AND not its canonical (min id). Factored so specs can
    * drive planted cluster maps — including real
    * [[Multimodal.imageDupClusters]] output — through the exact
    * production join shape.
    */
  private[graft] def pairedFlags(pairs: DataFrame, textCc: DataFrame,
      imgCc: DataFrame): DataFrame =
    pairs
      .join(textCc.select(col("node").as("text_id"), col("lbl").as("__tl")),
        Seq("text_id"), "left")
      .join(imgCc.select(col("node").as("image_id"), col("lbl").as("__il")),
        Seq("image_id"), "left")
      .select(col("pair_id"), col("text_id"), col("image_id"),
        coalesce(col("__tl") =!= col("text_id"), lit(false)).as("text_dup"),
        coalesce(col("__il") =!= col("image_id"), lit(false)).as("image_dup"))
      .withColumn("status",
        when(col("text_dup") && col("image_dup"), "drop_both")
          .when(col("text_dup"), "drop_text")
          .when(col("image_dup"), "drop_image")
          .otherwise("kept"))

  /** The pair-level census over [[pairedFlags]] output — all four
    * statuses always present (zero-filled), so the row set is stable
    * across scale factors and the oracle compare is schema-exact.
    */
  private[graft] def census(flags: DataFrame): DataFrame = {
    val s = flags.sparkSession
    import s.implicits._
    val statuses = Seq("drop_both", "drop_image", "drop_text", "kept")
      .toDF("status")
    statuses
      .join(flags.groupBy("status").agg(count(lit(1)).as("__n")),
        Seq("status"), "left")
      .select(col("status"), coalesce(col("__n"), lit(0L)).as("n_pairs"))
      .orderBy("status")
  }

  /** X85 — cross-modal paired dedup census. The pair table is the
    * aligned (doc_id = vec_id) caption–embedding join; the text side is
    * the memoized x15 SimHash component map and the image side closes
    * the x5 cosine near-dup edges (the embeddings standing in for image
    * embeddings) into components with the same propagation operator —
    * so both modalities share one canonicalization convention and the
    * DuckDB oracle replays both closures recursively.
    */
  val x85CrossModalPairs = QueryDef(
    "x85_crossmodal_paired_dedup",
    "caption-image pair curation: drop a pair when EITHER modality is a non-canonical near-dup (text SimHash clusters x embedding cosine clusters)",
    (s, d) => {
      val textCc = ClusterQueries.textClusterMap(s, d)
      val imgCc = ClusterQueries.memoizedComponents(s, s"x85img/$d")(
        SimilarityQueries.cosineEdges(s, d))
      val pairs = Tables.load(s, d, "documents").select(col("doc_id"))
        .join(Tables.load(s, d, "embeddings").select(col("vec_id")),
          col("vec_id") === col("doc_id"))
        .select(col("doc_id").as("pair_id"), col("doc_id").as("text_id"),
          col("vec_id").as("image_id"))
      census(pairedFlags(pairs, textCc, imgCc))
    },
    Some(s"""WITH RECURSIVE ${DedupQueries.simHashSqlCtes(DedupQueries.BAND_DF_CAP)},
            |t_und AS MATERIALIZED (SELECT doc_a AS node, doc_b AS nbr FROM sim_pairs
            |          UNION ALL
            |          SELECT doc_b AS node, doc_a AS nbr FROM sim_pairs),
            |t_reach AS (SELECT node, node AS lbl FROM t_und
            |            UNION
            |            SELECT u.nbr AS node, r.lbl
            |            FROM t_reach r JOIN t_und u ON r.node = u.node),
            |t_cc AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM t_reach GROUP BY node),
            |${SimilarityQueries.cosineEdgesSqlCtes},
            |i_und AS MATERIALIZED (SELECT doc_a AS node, doc_b AS nbr FROM e_pairs
            |          UNION ALL
            |          SELECT doc_b AS node, doc_a AS nbr FROM e_pairs),
            |i_reach AS (SELECT node, node AS lbl FROM i_und
            |            UNION
            |            SELECT u.nbr AS node, r.lbl
            |            FROM i_reach r JOIN i_und u ON r.node = u.node),
            |i_cc AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM i_reach GROUP BY node),
            |flags AS (
            |  SELECT d.doc_id AS pair_id,
            |         coalesce(t.lbl <> d.doc_id, FALSE) AS text_dup,
            |         coalesce(i.lbl <> d.doc_id, FALSE) AS image_dup
            |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
            |       LEFT JOIN t_cc t ON t.node = d.doc_id
            |       LEFT JOIN i_cc i ON i.node = d.doc_id),
            |cens AS (
            |  SELECT CASE WHEN text_dup AND image_dup THEN 'drop_both'
            |              WHEN text_dup THEN 'drop_text'
            |              WHEN image_dup THEN 'drop_image'
            |              ELSE 'kept' END AS status,
            |         CAST(count(*) AS BIGINT) AS n
            |  FROM flags GROUP BY 1),
            |statuses AS (
            |  SELECT unnest(['drop_both', 'drop_image', 'drop_text', 'kept'])
            |    AS status)
            |SELECT s.status, CAST(coalesce(c.n, 0) AS BIGINT) AS n_pairs
            |FROM statuses s LEFT JOIN cens c USING (status)
            |ORDER BY status""".stripMargin))

  /** Per-pair leakage flags given a split: a TEST pair leaks when its
    * text (or image) shares a near-dup cluster with ANY train pair's
    * text (or image) — membership in a cluster that holds only other
    * test pairs is NOT leakage. Factored for planted-split specs;
    * `pairs` carries (pair_id, text_id, image_id, is_train).
    */
  private[graft] def splitLeakFlags(pairs: DataFrame, textCc: DataFrame,
      imgCc: DataFrame): DataFrame = {
    val withLbls = pairs
      .join(textCc.select(col("node").as("text_id"), col("lbl").as("__tl")),
        Seq("text_id"), "left")
      .join(imgCc.select(col("node").as("image_id"), col("lbl").as("__il")),
        Seq("image_id"), "left")
    val trainTextLbls = withLbls.filter(col("is_train") && col("__tl").isNotNull)
      .select(col("__tl")).distinct()
      .withColumn("__t_leaky", lit(true))
    val trainImgLbls = withLbls.filter(col("is_train") && col("__il").isNotNull)
      .select(col("__il")).distinct()
      .withColumn("__i_leaky", lit(true))
    withLbls
      .join(broadcast(trainTextLbls), Seq("__tl"), "left")
      .join(broadcast(trainImgLbls), Seq("__il"), "left")
      .select(col("pair_id"), col("is_train"),
        (!col("is_train") && coalesce(col("__t_leaky"), lit(false)))
          .as("leak_text"),
        (!col("is_train") && coalesce(col("__i_leaky"), lit(false)))
          .as("leak_image"))
  }

  /** The one-row leakage report over [[splitLeakFlags]] output. */
  private[graft] def leakReport(flags: DataFrame): DataFrame =
    flags.agg(
      sum(when(col("is_train"), 1L).otherwise(0L)).as("n_train"),
      sum(when(!col("is_train"), 1L).otherwise(0L)).as("n_test"),
      sum(when(col("leak_text"), 1L).otherwise(0L)).as("n_leak_text"),
      sum(when(col("leak_image"), 1L).otherwise(0L)).as("n_leak_image"),
      sum(when(col("leak_text") || col("leak_image"), 1L).otherwise(0L))
        .as("n_leak_either"),
      sum(when(col("leak_text") && col("leak_image"), 1L).otherwise(0L))
        .as("n_leak_both"))
      .withColumn("leak_bp",
        expr("(n_leak_either * 10000) div greatest(n_test, 1L)"))

  /** X86 — cross-modal SPLIT-LEAKAGE audit: x21's question asked of a
    * paired corpus. A train/test split of caption–image pairs leaks
    * when a test pair's text OR image is a near-dup of any train
    * pair's — the single-modality audit (x21/x23) misses exactly the
    * cross-modal half (a test image re-captioned in train scores as
    * clean text). Same deterministic pair_id % 10 < 8 split as
    * x13/x21; same cluster maps (and the same session memos) as x85,
    * so the pair of audits costs one clustering. Output is one exact-
    * integer row: split sizes, per-side and either/both leak counts,
    * and the headline leak_bp a curation team gates a release on.
    *
    * Scale posture: leak label sets are DISTINCT cluster ids touched by
    * train — bounded by cluster count, broadcast back onto the pair
    * frame; everything else is the x85 join shape.
    */
  val x86CrossModalSplitLeakage = QueryDef(
    "x86_crossmodal_split_leakage",
    "paired train/test split leakage: test pairs sharing a text OR image near-dup cluster with train (exact integer census)",
    (s, d) => {
      val textCc = ClusterQueries.textClusterMap(s, d)
      val imgCc = ClusterQueries.memoizedComponents(s, s"x85img/$d")(
        SimilarityQueries.cosineEdges(s, d))
      val pairs = Tables.load(s, d, "documents").select(col("doc_id"))
        .join(Tables.load(s, d, "embeddings").select(col("vec_id")),
          col("vec_id") === col("doc_id"))
        .select(col("doc_id").as("pair_id"), col("doc_id").as("text_id"),
          col("vec_id").as("image_id"),
          (col("doc_id") % 10 < 8).as("is_train"))
      leakReport(splitLeakFlags(pairs, textCc, imgCc))
    },
    Some(s"""WITH RECURSIVE ${DedupQueries.simHashSqlCtes(DedupQueries.BAND_DF_CAP)},
            |t_und AS MATERIALIZED (SELECT doc_a AS node, doc_b AS nbr FROM sim_pairs
            |          UNION ALL
            |          SELECT doc_b AS node, doc_a AS nbr FROM sim_pairs),
            |t_reach AS (SELECT node, node AS lbl FROM t_und
            |            UNION
            |            SELECT u.nbr AS node, r.lbl
            |            FROM t_reach r JOIN t_und u ON r.node = u.node),
            |t_cc AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM t_reach GROUP BY node),
            |${SimilarityQueries.cosineEdgesSqlCtes},
            |i_und AS MATERIALIZED (SELECT doc_a AS node, doc_b AS nbr FROM e_pairs
            |          UNION ALL
            |          SELECT doc_b AS node, doc_a AS nbr FROM e_pairs),
            |i_reach AS (SELECT node, node AS lbl FROM i_und
            |            UNION
            |            SELECT u.nbr AS node, r.lbl
            |            FROM i_reach r JOIN i_und u ON r.node = u.node),
            |i_cc AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM i_reach GROUP BY node),
            |p AS MATERIALIZED (
            |  SELECT d.doc_id AS pair_id, d.doc_id % 10 < 8 AS is_train,
            |         t.lbl AS tl, i.lbl AS il
            |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
            |       LEFT JOIN t_cc t ON t.node = d.doc_id
            |       LEFT JOIN i_cc i ON i.node = d.doc_id),
            |tleak AS MATERIALIZED (SELECT DISTINCT tl FROM p
            |          WHERE is_train AND tl IS NOT NULL),
            |ileak AS MATERIALIZED (SELECT DISTINCT il FROM p
            |          WHERE is_train AND il IS NOT NULL),
            |f AS (
            |  SELECT p.pair_id, p.is_train,
            |         (NOT p.is_train AND tk.tl IS NOT NULL) AS leak_text,
            |         (NOT p.is_train AND ik.il IS NOT NULL) AS leak_image
            |  FROM p LEFT JOIN tleak tk ON p.tl = tk.tl
            |         LEFT JOIN ileak ik ON p.il = ik.il)
            |SELECT CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
            |         AS n_train,
            |       CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
            |         AS n_test,
            |       CAST(sum(CASE WHEN leak_text THEN 1 ELSE 0 END) AS BIGINT)
            |         AS n_leak_text,
            |       CAST(sum(CASE WHEN leak_image THEN 1 ELSE 0 END) AS BIGINT)
            |         AS n_leak_image,
            |       CAST(sum(CASE WHEN leak_text OR leak_image THEN 1 ELSE 0 END)
            |         AS BIGINT) AS n_leak_either,
            |       CAST(sum(CASE WHEN leak_text AND leak_image THEN 1 ELSE 0 END)
            |         AS BIGINT) AS n_leak_both,
            |       CAST((sum(CASE WHEN leak_text OR leak_image THEN 1 ELSE 0 END)
            |             * 10000) //
            |            greatest(sum(CASE WHEN is_train THEN 0 ELSE 1 END), 1)
            |         AS BIGINT) AS leak_bp
            |FROM f""".stripMargin))

  /** X87 — paired survivorship: x34's golden-record consolidation
    * applied to the IMAGE-side near-dup clusters. When one image (or its
    * near-dups) carries many captions across the corpus — the dominant
    * LAION-style duplication mode x85's census calls `drop_image` — the
    * surviving pair needs ONE caption and the merged provenance of the
    * family it absorbed: the canonical (min-id) pair's caption survives,
    * the caption-diversity count says how much paraphrase signal the
    * family held (a training-data team may route high-diversity families
    * to a caption-sampling loader instead of dropping them), and sources
    * merge into the sorted provenance list.
    *
    * Scale posture: the cluster map is pair-graph-bounded and broadcast
    * onto ONE documents scan; a single hash aggregate per cluster —
    * min/count/collect_set carry bounded state (sources are a catalog
    * vocabulary). No window, no self-join — x34's exact shape.
    */
  val x87PairedSurvivorship = QueryDef(
    "x87_paired_survivorship",
    "golden pair per image near-dup cluster: canonical caption, caption diversity, merged provenance",
    (s, d) => {
      val imgCc = ClusterQueries.memoizedComponents(s, s"x85img/$d")(
        SimilarityQueries.cosineEdges(s, d))
      Tables.load(s, d, "documents")
        .select(col("doc_id"), col("text"), col("source"), col("n_chars"))
        .join(broadcast(imgCc.select(col("node").as("doc_id"), col("lbl"))),
          Seq("doc_id"))
        .groupBy(col("lbl").as("cluster_id"))
        .agg(
          count(lit(1)).as("n_pairs"),
          countDistinct(col("text")).as("n_captions"),
          min_by(col("text"), col("doc_id")).as("survivor_caption"),
          array_join(array_sort(collect_set(col("source"))), ",").as("sources"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("cluster_id")
    },
    Some(s"""WITH RECURSIVE ${SimilarityQueries.cosineEdgesSqlCtes},
            |i_und AS MATERIALIZED (SELECT doc_a AS node, doc_b AS nbr FROM e_pairs
            |          UNION ALL
            |          SELECT doc_b AS node, doc_a AS nbr FROM e_pairs),
            |i_reach AS (SELECT node, node AS lbl FROM i_und
            |            UNION
            |            SELECT u.nbr AS node, r.lbl
            |            FROM i_reach r JOIN i_und u ON r.node = u.node),
            |i_cc AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM i_reach GROUP BY node)
            |SELECT i.lbl AS cluster_id,
            |       CAST(count(*) AS BIGINT) AS n_pairs,
            |       CAST(count(DISTINCT d.text) AS BIGINT) AS n_captions,
            |       arg_min(d.text, d.doc_id) AS survivor_caption,
            |       array_to_string(list_sort(list(DISTINCT d.source)), ',')
            |         AS sources,
            |       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
            |FROM documents d JOIN i_cc i ON i.node = d.doc_id
            |GROUP BY i.lbl
            |ORDER BY cluster_id""".stripMargin))

  /** Hub-node offsets for the pair-link graph: a text cluster id tl
    * becomes node HubT+tl, an image cluster id il becomes HubI+il.
    * Pair ids are doc_ids (≪ 10¹²), so pair nodes sort below every hub
    * and the component min-label IS the min pair id — the same
    * canonicalization convention as every other cluster map.
    */
  private[graft] val HubT = 1000000000000L
  private[graft] val HubI = 2000000000000L

  /** Connected components over the bipartite pair-link graph: pairs
    * sharing a text near-dup cluster OR an image near-dup cluster land
    * in one component (pair ↔ cluster-hub edges — never pair×pair, so
    * the edge count is O(pairs with a cluster), not O(cluster size²)).
    * Input `(pair_id, __tl, __il)` (nullable labels); output
    * `(node, lbl)` restricted to pair nodes.
    */
  private[graft] def pairLinkComponents(s: org.apache.spark.sql.SparkSession,
      memoKey: String, withLbls: DataFrame): DataFrame =
    ClusterQueries.memoizedComponents(s, memoKey)(
      withLbls.filter(col("__tl").isNotNull)
        .select(col("pair_id").as("doc_a"),
          (col("__tl") + lit(HubT)).as("doc_b"))
        .unionAll(withLbls.filter(col("__il").isNotNull)
          .select(col("pair_id").as("doc_a"),
            (col("__il") + lit(HubI)).as("doc_b"))))
      .filter(col("node") < HubT)

  /** Assign every pair to a split: component canonical id mod 10 < 8 →
    * train. Returns `(pair_id, text_id, image_id, is_train)` — the
    * shape [[splitLeakFlags]] audits.
    */
  private[graft] def pairedSplit(s: org.apache.spark.sql.SparkSession,
      memoKey: String, pairs: DataFrame, textCc: DataFrame,
      imgCc: DataFrame): DataFrame = {
    val withLbls = pairs
      .join(textCc.select(col("node").as("text_id"), col("lbl").as("__tl")),
        Seq("text_id"), "left")
      .join(imgCc.select(col("node").as("image_id"), col("lbl").as("__il")),
        Seq("image_id"), "left")
    val comp = pairLinkComponents(s, memoKey,
      withLbls.select("pair_id", "__tl", "__il"))
    withLbls
      .join(comp.select(col("node").as("pair_id"), col("lbl").as("__grp")),
        Seq("pair_id"), "left")
      .select(col("pair_id"), col("text_id"), col("image_id"),
        coalesce(col("__grp"), col("pair_id")).as("grp"))
      .withColumn("is_train", col("grp") % 10 < 8)
  }

  /** X88 — paired split PRODUCER: the pair-level x23. x86 AUDITS a given
    * split for cross-modal leakage; this PRODUCES one that is leak-free
    * BY CONSTRUCTION. Split key = connected component over the bipartite
    * pair-link graph (pairs sharing a text cluster OR an image cluster
    * — one more closure over the maps x85 already builds, through
    * cluster-HUB nodes so the graph is pair↔hub bipartite, never
    * pair×pair); a whole component lands on one side (component
    * canonical id mod 10 < 8 → train), so no near-dup cluster on either
    * modality can straddle the boundary and x86's leak counts are zero
    * identically. The one-row report carries the honest costs a
    * curation team reads before adopting a grouped split: component
    * granularity (n_components, max_component_pairs — transitive
    * linking can chain families) and the achieved train share
    * (train_bp — grouped assignment cannot hit 80.00% exactly), plus
    * the x86 leak audit RE-RUN on the produced split (the zeros are
    * computed, not asserted).
    *
    * Scale posture: edges are O(clustered pairs), components converge in
    * O(log diameter) propagation rounds, the audit is x86's broadcast
    * shape — nothing corpus².
    */
  val x88PairedSplitProducer = QueryDef(
    "x88_paired_split_producer",
    "leak-free paired train/test split: whole pair-link components (shared text OR image cluster) assigned to one side; x86's audit re-run reads zero",
    (s, d) => {
      val textCc = ClusterQueries.textClusterMap(s, d)
      val imgCc = ClusterQueries.memoizedComponents(s, s"x85img/$d")(
        SimilarityQueries.cosineEdges(s, d))
      val pairs = Tables.load(s, d, "documents").select(col("doc_id"))
        .join(Tables.load(s, d, "embeddings").select(col("vec_id")),
          col("vec_id") === col("doc_id"))
        .select(col("doc_id").as("pair_id"), col("doc_id").as("text_id"),
          col("vec_id").as("image_id"))
      val split = pairedSplit(s, s"x88comp/$d", pairs, textCc, imgCc)
      val compStats = split.groupBy("grp").agg(count(lit(1)).as("__n"))
        .agg(count(lit(1)).as("n_components"),
          max(col("__n")).as("max_component_pairs"))
      leakReport(splitLeakFlags(
        split.select("pair_id", "text_id", "image_id", "is_train"),
        textCc, imgCc))
        .crossJoin(broadcast(compStats))
        .withColumn("train_bp",
          expr("(n_train * 10000) div greatest(n_train + n_test, 1L)"))
        .select(col("n_components"), col("max_component_pairs"),
          col("n_train"), col("n_test"), col("train_bp"),
          col("n_leak_text"), col("n_leak_image"), col("n_leak_either"),
          col("leak_bp"))
    },
    Some(s"""WITH RECURSIVE ${DedupQueries.simHashSqlCtes(DedupQueries.BAND_DF_CAP)},
            |t_und AS MATERIALIZED (SELECT doc_a AS node, doc_b AS nbr FROM sim_pairs
            |          UNION ALL
            |          SELECT doc_b AS node, doc_a AS nbr FROM sim_pairs),
            |t_reach AS (SELECT node, node AS lbl FROM t_und
            |            UNION
            |            SELECT u.nbr AS node, r.lbl
            |            FROM t_reach r JOIN t_und u ON r.node = u.node),
            |t_cc AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM t_reach GROUP BY node),
            |${SimilarityQueries.cosineEdgesSqlCtes},
            |i_und AS MATERIALIZED (SELECT doc_a AS node, doc_b AS nbr FROM e_pairs
            |          UNION ALL
            |          SELECT doc_b AS node, doc_a AS nbr FROM e_pairs),
            |i_reach AS (SELECT node, node AS lbl FROM i_und
            |            UNION
            |            SELECT u.nbr AS node, r.lbl
            |            FROM i_reach r JOIN i_und u ON r.node = u.node),
            |i_cc AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM i_reach GROUP BY node),
            |p AS MATERIALIZED (
            |  SELECT d.doc_id AS pair_id, t.lbl AS tl, i.lbl AS il
            |  FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
            |       LEFT JOIN t_cc t ON t.node = d.doc_id
            |       LEFT JOIN i_cc i ON i.node = d.doc_id),
            |g_und AS MATERIALIZED (
            |  SELECT pair_id AS node, $HubT + tl AS nbr FROM p WHERE tl IS NOT NULL
            |  UNION ALL
            |  SELECT $HubT + tl AS node, pair_id AS nbr FROM p WHERE tl IS NOT NULL
            |  UNION ALL
            |  SELECT pair_id AS node, $HubI + il AS nbr FROM p WHERE il IS NOT NULL
            |  UNION ALL
            |  SELECT $HubI + il AS node, pair_id AS nbr FROM p WHERE il IS NOT NULL),
            |g_reach AS (SELECT node, node AS lbl FROM g_und
            |            UNION
            |            SELECT u.nbr AS node, r.lbl
            |            FROM g_reach r JOIN g_und u ON r.node = u.node),
            |g_cc AS MATERIALIZED (SELECT node, min(lbl) AS lbl FROM g_reach
            |        GROUP BY node HAVING node < $HubT),
            |split AS MATERIALIZED (
            |  SELECT p.pair_id, p.tl, p.il,
            |         coalesce(g.lbl, p.pair_id) AS grp,
            |         coalesce(g.lbl, p.pair_id) % 10 < 8 AS is_train
            |  FROM p LEFT JOIN g_cc g ON g.node = p.pair_id),
            |cstats AS (
            |  SELECT CAST(count(*) AS BIGINT) AS n_components,
            |         CAST(max(n) AS BIGINT) AS max_component_pairs
            |  FROM (SELECT grp, count(*) AS n FROM split GROUP BY grp)),
            |tleak AS MATERIALIZED (SELECT DISTINCT tl FROM split
            |          WHERE is_train AND tl IS NOT NULL),
            |ileak AS MATERIALIZED (SELECT DISTINCT il FROM split
            |          WHERE is_train AND il IS NOT NULL),
            |f AS (
            |  SELECT s.pair_id, s.is_train,
            |         (NOT s.is_train AND tk.tl IS NOT NULL) AS leak_text,
            |         (NOT s.is_train AND ik.il IS NOT NULL) AS leak_image
            |  FROM split s LEFT JOIN tleak tk ON s.tl = tk.tl
            |         LEFT JOIN ileak ik ON s.il = ik.il),
            |rep AS (
            |  SELECT CAST(sum(CASE WHEN is_train THEN 1 ELSE 0 END) AS BIGINT)
            |           AS n_train,
            |         CAST(sum(CASE WHEN is_train THEN 0 ELSE 1 END) AS BIGINT)
            |           AS n_test,
            |         CAST(sum(CASE WHEN leak_text THEN 1 ELSE 0 END) AS BIGINT)
            |           AS n_leak_text,
            |         CAST(sum(CASE WHEN leak_image THEN 1 ELSE 0 END) AS BIGINT)
            |           AS n_leak_image,
            |         CAST(sum(CASE WHEN leak_text OR leak_image THEN 1 ELSE 0 END)
            |           AS BIGINT) AS n_leak_either
            |  FROM f)
            |SELECT c.n_components, c.max_component_pairs, r.n_train, r.n_test,
            |       CAST((r.n_train * 10000) //
            |            greatest(r.n_train + r.n_test, 1) AS BIGINT) AS train_bp,
            |       r.n_leak_text, r.n_leak_image, r.n_leak_either,
            |       CAST((r.n_leak_either * 10000) //
            |            greatest(r.n_test, 1) AS BIGINT) AS leak_bp
            |FROM rep r CROSS JOIN cstats c""".stripMargin))

  /** Per-pair caption–image agreement: cosine between the x43 hashed
    * tf-idf text vector (64 integer buckets) and the 64-dim image
    * embedding, both in exact fixed-point (dot and norms are exact long
    * sums; only the final division is IEEE double — bit-identical in
    * both engines). Factored for planted-pair specs. `w` = (doc_id,
    * bucket, wsum); `embq` = (vec_id, bucket, qv) quantized 1e-8 units.
    * Within-envelope arithmetic: |wsum| ≲ 10⁸ (per-doc tf·idf mass) ×
    * |qv| ≤ 2·10⁸ over ≤ 64 buckets keeps the dot < 2⁶³ with 3 orders
    * of headroom regardless of corpus size (per-doc quantities only).
    */
  private[graft] def alignmentScores(w: DataFrame, embq: DataFrame)
      : DataFrame = {
    val tn = w.groupBy("doc_id").agg(sum(col("wsum") * col("wsum")).as("tss"))
    val in = embq.groupBy("vec_id").agg(sum(col("qv") * col("qv")).as("iss"))
    w.join(embq, w("doc_id") === embq("vec_id") &&
        w("bucket") === embq("bucket"))
      .groupBy(col("doc_id")).agg(sum(col("wsum") * col("qv")).as("dot"))
      .join(tn, Seq("doc_id"))
      .join(in, col("doc_id") === col("vec_id"))
      .select(col("doc_id").as("pair_id"),
        (col("dot").cast("double") /
          (sqrt(col("tss").cast("double")) * sqrt(col("iss").cast("double"))))
          .as("agree"))
  }

  /** X89 — cross-modal ALIGNMENT audit: the caption–image AGREEMENT
    * census (CLIP-score shape — Radford et al. 2021; LAION filters
    * pairs below a cosine threshold). The paired family so far curates
    * by DUPLICATION only; the other LAION-scale gate is whether the
    * caption actually DESCRIBES the image. With both sides embedded in
    * one 64-dim space (x43 hashed text vectors; the embeddings table
    * standing in for image embeddings), the per-pair cosine is the
    * agreement score, and the decile census is the release-gate
    * artifact: a healthy corpus masses in the high deciles; a caption
    * mix-up batch surfaces as a low/negative-decile bulge, and the
    * mismatched-pair quarantine is "decile < threshold".
    *
    * Scale posture: one narrow explode of the embedding column (64
    * fixed rows per pair, three longs wide), one co-keyed equi-join
    * against the memoized x43 weight frame, and fixed-cardinality
    * aggregates — no windows, no self-joins, nothing corpus².
    */
  val x89CrossModalAlignment = QueryDef(
    "x89_crossmodal_alignment",
    "caption-image agreement census: exact fixed-point cosine between hashed text vectors and image embeddings, bucketed by decile",
    (s, d) => {
      val w = graft.text.TextQueries.hashedWeights(s, d)
      val embq = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").as("bucket"),
          floor(col("col").cast("double") * lit(1e8)).cast("long").as("qv"))
      alignmentScores(w, embq)
        .groupBy(floor(col("agree") * 10).cast("long").as("agree_decile"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy("agree_decile")
    },
    Some(s"""WITH ${graft.text.TextQueries.hashedWeightsSql},
            |embq AS MATERIALIZED (
            |  SELECT vec_id, i - 1 AS bucket,
            |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 100000000.0)
            |           AS BIGINT) AS qv
            |  FROM embeddings, UNNEST(generate_series(1, 64)) AS u(i)),
            |tnrm AS (SELECT doc_id, CAST(sum(wsum * wsum) AS BIGINT) AS tss
            |         FROM w GROUP BY 1),
            |inrm AS (SELECT vec_id, CAST(sum(qv * qv) AS BIGINT) AS iss
            |         FROM embq GROUP BY 1),
            |dots AS (SELECT w.doc_id, CAST(sum(w.wsum * embq.qv) AS BIGINT) AS dot
            |         FROM w JOIN embq
            |           ON embq.vec_id = w.doc_id AND embq.bucket = w.bucket
            |         GROUP BY 1),
            |agr AS (SELECT d.doc_id AS pair_id,
            |               CAST(dot AS DOUBLE) /
            |                 (sqrt(CAST(tss AS DOUBLE)) * sqrt(CAST(iss AS DOUBLE)))
            |                 AS agree
            |        FROM dots d JOIN tnrm t ON t.doc_id = d.doc_id
            |             JOIN inrm i ON i.vec_id = d.doc_id)
            |SELECT CAST(floor(agree * 10) AS BIGINT) AS agree_decile,
            |       CAST(count(*) AS BIGINT) AS n_pairs
            |FROM agr GROUP BY 1 ORDER BY 1""".stripMargin))

  /** X90 — cross-modal RETRIEVAL eval: does the caption actually
    * retrieve its own image? x65 evaluates text→text retrieval; the
    * paired corpus's end-use is text→image (CLIP-style zero-shot
    * retrieval — Radford et al. 2021 report R@1/R@5/R@10 on
    * caption→image search as THE quality metric of an aligned pair
    * corpus). For a bounded sample of query captions (every 101st
    * doc_id, capped at 100 — the x67 anchor discipline: the eval batch
    * is bounded at ANY corpus size), every image in the corpus is
    * scored with the same exact fixed-point cosine as x89, and the rank
    * of the TRUE paired image (tie-break: smaller vec_id wins) is the
    * per-query verdict; hit1/hit10 are the recall@k indicators a
    * release gate thresholds on. Low mean agreement with high true-rank
    * = captions too generic to separate images (x89 can't see this —
    * its census is marginal, not contrastive).
    *
    * Scale posture: queries are broadcast as dense 64-long vectors
    * (bounded by the cap); the image side streams through ONE
    * `graft_dot_long` codegen pass (no explode of the corpus against
    * queries, no shuffle of the Q×N product — the per-pair dot happens
    * map-side under whole-stage codegen, x67's shape); the rank is a
    * count-better-than aggregate against the broadcast truth row, not a
    * window over the Q×N frame.
    */
  /** The x90 core over prepared frames: `qvecs` = (q_doc, qarr: 64
    * longs, tss), `imgs` = (vec_id, iarr: 64 longs, iss). Truth = the
    * image whose vec_id equals the query's doc_id (queries without one
    * drop — only PAIRED captions are evaluable). Factored so planted
    * integer fixtures drive the exact production join shape. Callers
    * ensure [[graft.GraftExtensions]] is registered.
    */
  private[graft] def retrievalRanks(qvecs: DataFrame, imgs: DataFrame)
      : DataFrame = {
    val truth = imgs.join(broadcast(qvecs), col("vec_id") === col("q_doc"))
      .withColumn("dot", call_function("graft_dot_long",
        col("iarr"), col("qarr")))
      .select(col("q_doc").as("tq"),
        (col("dot").cast("double") /
          (sqrt(col("tss").cast("double")) * sqrt(col("iss").cast("double"))))
          .as("agree_true"))
    // ONE pass of the image corpus against the broadcast queries;
    // count-better-than replaces a rank window over Q×N rows. Exact
    // double compares: dot/√·√ is correctly-rounded IEEE on both
    // engines, so ties are exact and the vec_id tie-break is total.
    val better = imgs.crossJoin(broadcast(qvecs))
      .withColumn("dot", call_function("graft_dot_long",
        col("iarr"), col("qarr")))
      .withColumn("agree", col("dot").cast("double") /
        (sqrt(col("tss").cast("double")) * sqrt(col("iss").cast("double"))))
      .join(broadcast(truth), col("q_doc") === col("tq"))
      .filter(col("agree") > col("agree_true") ||
        (col("agree") === col("agree_true") && col("vec_id") < col("tq")))
      .groupBy(col("q_doc")).agg(count(lit(1)).as("n_better"))
    // better is ≤ Q rows post-agg — tiny BY CONSTRUCTION but invisible
    // to Catalyst behind the aggregate (the r13 post-agg broadcast rule)
    truth.select(col("tq").as("pair_id"), col("agree_true"))
      .join(broadcast(better.withColumnRenamed("q_doc", "pair_id")),
        Seq("pair_id"), "left")
      .select(col("pair_id"),
        (coalesce(col("n_better"), lit(0L)) + 1L).as("true_rank"),
        (coalesce(col("n_better"), lit(0L)) === 0L).as("hit1"),
        (coalesce(col("n_better"), lit(0L)) < 10L).as("hit10"),
        col("agree_true"))
      .orderBy("pair_id")
  }

  val x90CrossModalRetrieval = QueryDef(
    "x90_crossmodal_retrieval_eval",
    "text-to-image retrieval eval: exact rank of the true paired image per sampled caption + recall@1/@10 flags",
    (s, d) => {
      graft.GraftExtensions.ensure(s)
      val w = graft.text.TextQueries.hashedWeights(s, d)
      // dense caption vectors for the sampled queries (bounded: % 101,
      // LIMIT 100 — the mining-batch cap)
      val qvecs = w.filter(pmod(col("doc_id"), lit(101)) === 0)
        .groupBy("doc_id")
        .agg(collect_list(struct(col("bucket"), col("wsum"))).as("bw"),
          sum(col("wsum") * col("wsum")).as("tss"))
        .withColumn("qarr", expr(
          "transform(sequence(0L, 63L), b -> " +
            "coalesce(element_at(map_from_entries(bw), b), 0L))"))
        .orderBy("doc_id").limit(100)
        .select(col("doc_id").as("q_doc"), col("qarr"), col("tss"))
      // image vectors: the x89 quantization (floor(v·1e8)) kept DENSE —
      // |qv| ≤ 2·10⁸ × |wsum| ≲ 10⁸ over 64 buckets keeps the dot well
      // inside long range (same envelope as x89's alignmentScores)
      val imgs = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), expr(
          "transform(embedding, v -> CAST(floor(CAST(v AS DOUBLE) * 1e8) AS LONG))")
          .as("iarr"))
        .withColumn("iss", expr("aggregate(iarr, 0L, (a, x) -> a + x * x)"))
      retrievalRanks(qvecs, imgs)
    },
    Some(s"""WITH ${graft.text.TextQueries.hashedWeightsSql},
            |embq AS MATERIALIZED (
            |  SELECT vec_id, i - 1 AS bucket,
            |         CAST(floor(CAST(embedding[i] AS DOUBLE) * 100000000.0)
            |           AS BIGINT) AS qv
            |  FROM embeddings, UNNEST(generate_series(1, 64)) AS u(i)),
            |tnrm AS (SELECT doc_id, CAST(sum(wsum * wsum) AS BIGINT) AS tss
            |         FROM w GROUP BY 1),
            |inrm AS MATERIALIZED (
            |  SELECT vec_id, CAST(sum(qv * qv) AS BIGINT) AS iss
            |  FROM embq GROUP BY 1),
            |anch AS MATERIALIZED (
            |  SELECT doc_id AS q_doc, tss FROM tnrm
            |  WHERE doc_id % 101 = 0 ORDER BY doc_id LIMIT 100),
            |wq AS (SELECT q_doc, bucket, wsum FROM w
            |       JOIN anch ON w.doc_id = anch.q_doc),
            |dots AS MATERIALIZED (
            |  SELECT q_doc, vec_id, CAST(sum(qv * wsum) AS BIGINT) AS dot
            |  FROM embq JOIN wq USING (bucket) GROUP BY 1, 2),
            |allp AS (
            |  SELECT a.q_doc, n.vec_id,
            |         CAST(coalesce(d.dot, 0) AS DOUBLE) /
            |           (sqrt(CAST(a.tss AS DOUBLE)) * sqrt(CAST(n.iss AS DOUBLE)))
            |           AS agree
            |  FROM anch a CROSS JOIN inrm n
            |       LEFT JOIN dots d ON d.q_doc = a.q_doc AND d.vec_id = n.vec_id),
            |tru AS (SELECT q_doc AS pair_id, agree AS agree_true
            |        FROM allp WHERE q_doc = vec_id),
            |rk AS (
            |  SELECT t.pair_id, t.agree_true,
            |         CAST(count(*) FILTER (WHERE p.agree > t.agree_true OR
            |           (p.agree = t.agree_true AND p.vec_id < t.pair_id))
            |           AS BIGINT) AS n_better
            |  FROM tru t JOIN allp p ON p.q_doc = t.pair_id
            |  GROUP BY 1, 2)
            |SELECT pair_id, n_better + 1 AS true_rank,
            |       n_better = 0 AS hit1, n_better < 10 AS hit10, agree_true
            |FROM rk ORDER BY pair_id""".stripMargin))

  def defs: Seq[QueryDef] = Seq(x85CrossModalPairs, x86CrossModalSplitLeakage,
    x87PairedSurvivorship, x88PairedSplitProducer, x89CrossModalAlignment,
    x90CrossModalRetrieval)
}
