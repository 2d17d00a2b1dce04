package graft.analytics

import graft.SparkSpec
import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** PageRank operator + x72 query pins.
  *
  * The brute-force reference re-implements the integer recurrence as a
  * single-threaded Scala fold over adjacency maps — an independent
  * implementation (no DataFrames), so a divergence localizes to the
  * distributed plan, not a shared formula.
  */
class GraphQueriesSpec extends SparkSpec {
  import spark.implicits._

  private def brute(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1)
    val wu = out.map { case (u, es) => u -> es.map(_._3).sum }
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val base = PageRank.SCALE / n
    var r: Map[Long, Long] = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val inflow = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, v, w) <- edges)
        inflow(v) += r(u) * w / wu(u)
      r = nodes.map(v => v -> (15 * base / 100 + 85 * inflow(v) / 100)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(spark, edges.toDF("u", "v", "w"), iters)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap

  test("hand graph: triangle plus pendant matches the single-threaded fold") {
    // 1-2-3 triangle (unit weights), 4 attached to 1 with weight 3
    val half = Seq((1L, 2L, 1L), (2L, 3L, 1L), (1L, 3L, 1L), (1L, 4L, 3L))
    val edges = half ++ half.map { case (u, v, w) => (v, u, w) }
    assert(run(edges, 4) === brute(edges, 4))
  }

  test("directed weighted graph with a sink cycle matches the fold") {
    // every node has out-edges (operator contract); uneven weights force
    // the floor-division paths
    val edges = Seq(
      (1L, 2L, 7L), (1L, 3L, 2L), (2L, 3L, 1L), (3L, 1L, 5L),
      (3L, 4L, 5L), (4L, 1L, 1L), (5L, 1L, 9L), (1L, 5L, 1L))
    assert(run(edges, 6) === brute(edges, 6))
  }

  test("star graph: the hub out-ranks every leaf") {
    val half = (2L to 9L).map(leaf => (1L, leaf, 1L))
    val edges = half ++ half.map { case (u, v, w) => (v, u, w) }
    val r = run(edges, 4)
    val hub = r(1L)
    assert((2L to 9L).forall(leaf => r(leaf) < hub))
    // symmetric leaves tie exactly (integer arithmetic, identical inputs)
    assert((2L to 9L).map(r).toSet.size === 1)
  }

  test("mass conserves up to floor loss and ranks are deterministic") {
    val half = Seq((1L, 2L, 1L), (2L, 3L, 4L), (1L, 3L, 2L), (3L, 4L, 1L))
    val edges = half ++ half.map { case (u, v, w) => (v, u, w) }
    val r1 = run(edges, 5)
    val r2 = run(edges, 5)
    assert(r1 === r2)
    val total = r1.values.sum
    // each round floors at most |E| + 2·|V| unit drops of that round's
    // mass; 5 rounds on 8 edges / 4 nodes stays within a loose bound
    assert(total <= PageRank.SCALE)
    assert(total >= PageRank.SCALE - 5 * (edges.size + 2 * 4))
  }

  test("x72 emits 20 hub parts with positive ranks at sf0.001") {
    val out = GraphQueries.x72CopurchasePagerank.run(spark, sfDir).collect()
    assert(out.length === 20)
    assert(out.forall(_.getAs[Long]("rank_fp") > 0))
    // descending rank order with partkey tie-break
    val ranks = out.map(r =>
      (r.getAs[Long]("rank_fp"), r.getAs[Long]("p_partkey")))
    assert(ranks.sameElements(ranks.sortBy(t => (-t._1, t._2))))
    // hubs must out-rank the uniform start (they absorb leaf mass)
    val n = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_partkey").distinct().count()
    assert(out.head.getAs[Long]("rank_fp") > PageRank.SCALE / n)
  }
}
