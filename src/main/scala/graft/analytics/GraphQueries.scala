package graft.analytics

import graft.QueryDef
import graft.operators.PageRank
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Graph analytics over relation-derived graphs.
  *
  * Complements the dedup family's connected components (x15) and triangle
  * census (x59) with *iterative* graph centrality — the primitive behind
  * domain-authority quality priors in web-corpus curation (Common-Crawl
  * harmonic/PageRank domain ranks) and market-basket product centrality.
  *
  * Everything is exact integer arithmetic ([[PageRank]]'s fixed-point
  * contract) so the queries hash-gate against DuckDB without tolerance
  * verdicts.
  */
object GraphQueries {

  /** Iteration budget for x72: enough for the rank to separate hubs from
    * leaves on this graph diameter, small enough that the oracle's
    * materialized-CTE replay stays cheap (each round is one pass over E
    * in both engines).
    */
  private val Iters = 4

  /** X72 — PageRank over the part co-purchase graph.
    *
    * Nodes are parts; an edge (u, v) with weight w means u and v appear
    * together in w distinct orders. The graph is symmetrized (undirected
    * co-occurrence), so every node has out-edges by construction —
    * [[PageRank]]'s no-dangling contract holds. Output is the top-20
    * parts by rank with their neighborhood stats (ties broken by
    * partkey).
    *
    * Scale posture: the pair join is bounded per order by items-per-order
    * (TPC-H ≤ 7 → ≤ 21 pairs), so |E| = O(|orders|) — never quadratic in
    * parts; the weighted-edge frame is built once, hash-partitioned on
    * `u`, persisted, and reused by all K iterations; each iteration is
    * one equi-join + one map-side-combinable sum. The final top-20 is a
    * rank-side-only sort of |parts| rows.
    */
  val x72CopurchasePagerank = QueryDef(
    "x72_copurchase_pagerank",
    "fixed-point PageRank over the part co-purchase graph, top-20 hubs",
    (s, d) => {
      val li = Tables.load(s, d, "lineitem")
        .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
        .distinct()
      val half = li.as("a")
        .join(li.as("b"),
          col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .groupBy(col("a.pk").as("u"), col("b.pk").as("v"))
        .agg(count(lit(1)).as("w"))
      val edges = half.union(half.select(col("v"), col("u"), col("w")))
      val pr = PageRank.run(s, edges, Iters, cacheKey = s"x72/$d")
      // degree stats come from the SAME persisted weighted-edge frame
      // the iterations use — never a second pair-join build
      val deg = PageRank.weightedEdges(s, edges, s"x72/$d")
        .groupBy(col("u").as("node"))
        .agg(count(lit(1)).as("n_neighbors"), sum("w").as("w_degree"))
      pr.join(deg, "node")
        .select(col("node").as("p_partkey"), col("n_neighbors"),
          col("w_degree"), col("pr").as("rank_fp"))
        .orderBy(col("rank_fp").desc, col("p_partkey"))
        .limit(20)
    },
    Some(s"""WITH li AS (
            |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
            |half AS (
            |  SELECT a.pk AS u, b.pk AS v, CAST(count(*) AS BIGINT) AS w
            |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
            |  GROUP BY 1, 2),
            |edges AS MATERIALIZED (
            |  SELECT u, v, w FROM half
            |  UNION ALL SELECT v AS u, u AS v, w FROM half),
            |${PageRank.oracleSql(Iters)},
            |deg AS (
            |  SELECT u AS node, CAST(count(*) AS BIGINT) AS n_neighbors,
            |         CAST(sum(w) AS BIGINT) AS w_degree
            |  FROM edges GROUP BY 1)
            |SELECT r.node AS p_partkey, d.n_neighbors, d.w_degree,
            |       r.pr AS rank_fp
            |FROM r$Iters r JOIN deg d USING (node)
            |ORDER BY rank_fp DESC, p_partkey LIMIT 20""".stripMargin))

  def defs: Seq[QueryDef] = Seq(x72CopurchasePagerank)
}
