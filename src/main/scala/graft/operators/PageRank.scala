package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact fixed-point PageRank over a weighted directed edge list.
  *
  * Ranks are carried as longs in `SCALE` units (1e12 = rank 1.0 spread
  * over the node set) and every step is integer arithmetic with floor
  * division — `DIV` in Spark, `//` in DuckDB, identical for the
  * all-positive quantities here — so the result is bit-identical across
  * engines, partition counts, and accumulation orders. Floating-point
  * PageRank cannot be oracle-gated: the per-node inflow sum is
  * order-dependent in IEEE arithmetic and diverges in the last ulps
  * between a 32-partition Spark agg and a single-threaded replay.
  *
  * Semantics (damping d = 85/100, K fixed iterations):
  * {{{
  *   base     = SCALE div N                      // N = |nodes|
  *   r0(v)    = base
  *   inflow_i(v) = Σ_{(u,v,w) ∈ E} (r_{i-1}(u) · w) div W_u
  *   r_i(v)   = (15 · base) div 100 + (85 · inflow_i(v)) div 100
  * }}}
  * where `W_u = Σ_v w(u,v)` is u's out-weight. Flooring leaks a few
  * units of mass per node per round (bounded by in-degree per node), so
  * Σ r_K ≤ SCALE — conservation up to floor loss is pinned in the spec.
  *
  * Dangling nodes are the caller's contract: every node must have at
  * least one out-edge (symmetrized co-occurrence graphs satisfy this by
  * construction). Nodes appear in the result iff they appear as an edge
  * source or target.
  *
  * Scale posture: the weighted-edge frame (edges ⋈ out-weights) is
  * computed once, hash-partitioned on `u`, and reused across all K
  * iterations — each iteration is one equi-join (rank side shuffles onto
  * the cached edge partitioning) plus one map-side-combinable sum. K is
  * a constant, so the whole computation is K linear passes over E; no
  * iteration-growing lineage (each r_i is referenced exactly once by
  * r_{i+1}).
  *
  * Reference behavior: the reference ships no graph operator — this is
  * part of the engine's large-scale analytics surface (domain/product
  * centrality for curation weighting, e.g. Common-Crawl-style harmonic/
  * PageRank domain scores used as quality priors).
  */
object PageRank {

  val SCALE = 1000000000000L

  /** The out-weighted edge frame (u, v, w, wu), hash-partitioned on `u`
    * so every iteration's join reuses one exchange. With a non-empty
    * `cacheKey` it is persisted through [[graft.PlanCache]] — callers
    * that also need degree statistics derive them from THIS frame, not
    * from a re-built pair join.
    */
  def weightedEdges(spark: SparkSession, edges: DataFrame,
      cacheKey: String = ""): DataFrame = {
    def build = {
      val wdeg = edges.groupBy("u").agg(sum("w").as("wu"))
      edges.join(wdeg, "u").repartition(col("u"))
        .select(col("u"), col("v"), col("w"), col("wu"))
    }
    if (cacheKey.isEmpty) build.persist()
    else graft.PlanCache.checkpointed(spark, s"$cacheKey/ew")(build)
  }

  /** K iterations over a [[weightedEdges]] frame → (node, pr). */
  def runOnWeighted(ew: DataFrame, iters: Int): DataFrame = {
    val nF = ew.agg(countDistinct(col("u")).as("n"))
    val nodes = ew.select(col("u").as("node")).distinct()
    val r0 = nodes.crossJoin(broadcast(nF))
      .select(col("node"), expr(s"$SCALE DIV n").cast("long").as("pr"))

    (1 to iters).foldLeft(r0) { (r, _) =>
      ew.join(r.withColumnRenamed("node", "u"), "u")
        .select(col("v"), expr("(pr * w) DIV wu").as("c"))
        .groupBy(col("v"))
        .agg(sum(col("c")).as("inflow"))
        .crossJoin(broadcast(nF))
        .select(col("v").as("node"),
          (expr(s"(15 * ($SCALE DIV n)) DIV 100") +
            expr("(85 * inflow) DIV 100")).cast("long").as("pr"))
    }
  }

  /** Run K iterations over `edges` with columns (u: long, v: long,
    * w: long). Returns (node, pr) with `pr` in SCALE units.
    *
    * `cacheKey`: when non-empty, BOTH the weighted-edge frame and the
    * final rank frame persist through [[graft.PlanCache]] — domain/
    * product rank tables are corpus-level artifacts rebuilt per corpus
    * version, so repeated readers in one session (Verify/Bench re-runs,
    * downstream joins) reuse one copy, the x2-signatures/x68-learn
    * precedent. An empty key keeps everything plan-local.
    */
  def run(spark: SparkSession, edges: DataFrame, iters: Int,
      cacheKey: String = ""): DataFrame = {
    val ew = weightedEdges(spark, edges, cacheKey)
    if (cacheKey.isEmpty) runOnWeighted(ew, iters)
    else graft.PlanCache.checkpointed(spark, s"$cacheKey/pr$iters")(
      runOnWeighted(ew, iters))
  }

  /** DuckDB replay of [[run]]: WITH-clause chain from an `edges` CTE
    * (u, v, w — the caller supplies it) through `wdeg`, `ew`, `nn`, and
    * `r0..r<iters>`, ending with `r<iters>(node, pr)`. Iteration CTEs are
    * MATERIALIZED so each round's frame is computed once.
    */
  def oracleSql(iters: Int): String = {
    def round(i: Int): String =
      s"""r$i AS MATERIALIZED (
         |  SELECT e.v AS node,
         |         CAST((15 * ($SCALE // nn.n)) // 100
         |            + (85 * sum((r.pr * e.w) // e.wu)) // 100 AS BIGINT) AS pr
         |  FROM ew e JOIN r${i - 1} r ON e.u = r.node CROSS JOIN nn
         |  GROUP BY e.v, nn.n)""".stripMargin
    s"""wdeg AS (SELECT u, CAST(sum(w) AS BIGINT) AS wu FROM edges GROUP BY 1),
       |ew AS MATERIALIZED (
       |  SELECT e.u, e.v, e.w, d.wu FROM edges e JOIN wdeg d USING (u)),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM wdeg),
       |r0 AS (SELECT u AS node, CAST($SCALE // n AS BIGINT) AS pr
       |       FROM wdeg CROSS JOIN nn),
       |${(1 to iters).map(round).mkString(",\n")}""".stripMargin
  }
}
