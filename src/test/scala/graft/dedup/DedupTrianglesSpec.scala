package graft.dedup

import graft.SparkSpec

/** X59 triangle census: planted graph shapes with hand-countable
  * structure through the degree-ordered plan, plus a brute-force
  * differential on the real corpus's near-dup edges.
  */
class DedupTrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def census(edges: Seq[(Long, Long)]) =
    ClusterQueries.triangleCensus(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).head

  test("K4 clique: 4 triangles, every wedge closed (transitivity 10000 bp)") {
    val k4 = for (a <- 0L to 3L; b <- (a + 1) to 3L) yield (a, b)
    assert(census(k4) === ((4L, 6L, 12L, 4L, 10000L)))
  }

  test("a path closes nothing; a star centers all wedges, closes none") {
    // path 0-1-2-3: 2 wedges, 0 triangles
    assert(census(Seq((0L, 1L), (1L, 2L), (2L, 3L))) === ((4L, 3L, 2L, 0L, 0L)))
    // star around 0 with 4 leaves: C(4,2)=6 wedges, 0 triangles — the
    // degree-ordered direction makes the hub the EXPENSIVE endpoint of
    // no wedge (leaves rank below it), so fan-out stays per-leaf
    assert(census((1L to 4L).map((0L, _))) === ((5L, 4L, 6L, 0L, 0L)))
  }

  test("randomized differential: 12 seeded G(n,p) graphs vs brute force") {
    (1 to 12).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val n = 8 + rnd.nextInt(17) // 8..24 nodes
      val p = 0.15 + rnd.nextDouble() * 0.35
      val edges = (for {
        a <- 0L until n; b <- (a + 1) until n if rnd.nextDouble() < p
      } yield (a, b)).toSeq
      if (edges.nonEmpty) {
        val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
          .map { case (k, v) => k -> v.map(_._2).toSet }
        // yield the distinct triple: the inner generator is a Set, and
        // `yield 1` would collapse an edge's multiple closing vertices
        val tris = (for {
          (a, b) <- edges
          c <- adj(a) if c > b && adj(b)(c)
        } yield (a, b, c)).size.toLong
        val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
        val got = census(edges)
        assert(got._4 === tris, s"seed $seed: triangles ${got._4} != $tris")
        assert(got._3 === wedges, s"seed $seed: wedges ${got._3} != $wedges")
        assert(got._1 === adj.size.toLong && got._2 === edges.size.toLong,
          s"seed $seed census: $got")
      }
    }
  }

  test("x59 equals a brute-force count on the sf0.01 near-dup graph") {
    val sf01 = "/root/testdata/sf0.01"
    val edges = DedupQueries
      .ngramJaccardPairs(spark, sf01, DedupQueries.SHINGLE_DF_CAP)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (n, es) => n -> es.map(_._2).toSet }
    val eset = edges.map { case (a, b) => (a min b, a max b) }.toSet
    val tris = (for {
      (a, b) <- eset.toSeq
      c <- adj(a) if c > b && adj(b)(c)
    } yield (a, b, c)).size.toLong
    val wedges = adj.values.map(s => s.size.toLong * (s.size - 1) / 2).sum
    val got = ClusterQueries.x59DedupTriangles.run(spark, sf01).collect().head
    assert(got.getLong(0) === adj.size.toLong)
    assert(got.getLong(1) === eset.size.toLong)
    assert(got.getLong(2) === wedges)
    assert(got.getLong(3) === tris, "triangle count diverged from brute force")
    assert(got.getLong(4) === 3 * tris * 10000 / math.max(wedges, 1L))
  }
}
