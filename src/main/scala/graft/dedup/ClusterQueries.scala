package graft.dedup

import graft.QueryDef
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Near-duplicate CLUSTER canonicalization: the step after pair
  * generation in every dedup pipeline. Pairwise near-dup relations are
  * not transitive-closed (A~B, B~C but A≁C), so "drop one of each pair"
  * under-deletes and order-dependent greedy passes are irreproducible —
  * the standard contract is: connected components over the near-dup
  * pair graph, keep one canonical doc (min id) per component.
  *
  * Components are computed by iterative min-label propagation: every
  * node starts as its own label, each round every node takes the min of
  * its own and its neighbors' labels, and the loop stops when a round
  * changes nothing. Each round is one shuffle join + one aggregation,
  * and the round count is the graph diameter — near-dup components are
  * band-blocked near-cliques (diameter 1–3), so this converges in a
  * handful of rounds regardless of corpus size. At 1000-executor scale
  * the same loop runs with edges partitioned by node; the
  * alternating-star optimizations (large-star/small-star) drop in only
  * if components with large diameters appear, which near-dup graphs do
  * not produce.
  *
  * Reference anchor: dedup extension per the training-data north star —
  * pair generation is x3's (SimHash, Hamming ≤ 2), so the DuckDB oracle
  * replays the identical edges and closes them with a recursive CTE.
  */
object ClusterQueries {

  /** Min-label propagation to a fixpoint. `edges` must be (doc_a, doc_b)
    * with doc_a < doc_b; returns (node, lbl) with lbl = min doc_id of the
    * node's component. Each round materializes via `localCheckpoint` (the
    * loop must not re-execute a growing lineage) and evicts the previous
    * round's RDD immediately.
    */
  private[graft] def connectedComponents(edges: DataFrame): DataFrame = {
    val und = edges
      .select(col("doc_a").as("node"), col("doc_b").as("nbr"))
      .union(edges.select(col("doc_b").as("node"), col("doc_a").as("nbr")))
      .localCheckpoint(true)
    var labels = und.select("node").distinct()
      .withColumn("lbl", col("node")).localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < 20) {
      val nbrMin = und
        .join(labels.select(col("node").as("nbr"), col("lbl").as("nlbl")),
          Seq("nbr"))
        .groupBy("node").agg(min(col("nlbl")).as("nmin"))
      val next = labels.join(nbrMin, Seq("node"), "left")
        .select(col("node"),
          least(col("lbl"), coalesce(col("nmin"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      changed = next
        .join(labels.select(col("node"), col("lbl").as("prev")), Seq("node"))
        .filter(col("lbl") < col("prev")).count()
      graft.similarity.Ivf.dropCheckpoint(labels)
      labels = next
      iter += 1
    }
    graft.similarity.Ivf.dropCheckpoint(und)
    require(changed == 0, s"label propagation not converged after $iter rounds")
    labels
  }

  // Clusters are COMPUTED ONCE per (session, dir) and the tiny (node,
  // lbl) result is kept checkpointed — same memo + cleanup pattern as
  // the IVF index (the loop's checkpoints are evicted inside the loop;
  // only the final frame survives until PlanCache.clear/app end).
  private val ccMemo =
    new java.util.HashMap[SparkSession, Map[String, DataFrame]]()

  graft.PlanCache.registerCleanupHook { s =>
    val dropped = ccMemo.synchronized(Option(ccMemo.remove(s)))
    dropped.foreach(_.values.foreach(graft.similarity.Ivf.dropCheckpoint))
  }

  private def clusters(s: SparkSession, d: String): DataFrame =
    ccMemo.synchronized {
      val m = Option(ccMemo.get(s)).getOrElse(Map.empty)
      m.get(d) match {
        case Some(hit) => hit
        case None =>
          graft.PlanCache.track(s)
          val edges = DedupQueries
            .simHashPairs(s, d, DedupQueries.BAND_DF_CAP)
            .select("doc_a", "doc_b")
          val built = connectedComponents(edges)
          ccMemo.put(s, m.updated(d, built))
          built
      }
    }

  /** X15 — near-dup cluster membership: every doc in a SimHash near-dup
    * component, its cluster id (= component min doc_id), whether it is
    * the canonical survivor, and the cluster size.
    */
  val x15DedupClusters = QueryDef(
    "x15_dedup_clusters",
    "connected-component dedup clusters (SimHash pairs), canonical per cluster",
    (s, d) => {
      val cc = clusters(s, d)
      val sizes = cc.groupBy("lbl").agg(count(lit(1)).as("n_docs"))
      cc.join(sizes, Seq("lbl"))
        .select(col("lbl").as("cluster_id"), col("node").as("doc_id"),
          when(col("node") === col("lbl"), 1).otherwise(0).as("is_canonical"),
          col("n_docs"))
        .orderBy("cluster_id", "doc_id")
    },
    Some(s"""WITH RECURSIVE ${DedupQueries.simHashSqlCtes(DedupQueries.BAND_DF_CAP)},
            |und AS (SELECT doc_a AS node, doc_b AS nbr FROM sim_pairs
            |        UNION ALL
            |        SELECT doc_b AS node, doc_a AS nbr FROM sim_pairs),
            |reach AS (SELECT node, node AS lbl FROM und
            |          UNION
            |          SELECT u.nbr AS node, r.lbl
            |          FROM reach r JOIN und u ON r.node = u.node),
            |cc AS (SELECT node AS doc_id, min(lbl) AS cluster_id
            |       FROM reach GROUP BY node),
            |sized AS (SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_docs
            |          FROM cc GROUP BY cluster_id)
            |SELECT cc.cluster_id, cc.doc_id,
            |       CAST(CASE WHEN cc.doc_id = cc.cluster_id THEN 1 ELSE 0 END AS INTEGER) AS is_canonical,
            |       s.n_docs
            |FROM cc JOIN sized s ON cc.cluster_id = s.cluster_id
            |ORDER BY cc.cluster_id, cc.doc_id""".stripMargin))

  val defs: Seq[QueryDef] = Seq(x15DedupClusters)
}
