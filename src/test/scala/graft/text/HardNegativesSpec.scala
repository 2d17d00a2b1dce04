package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hard-negative mining semantics on planted structure: near-duplicates
  * are EXCLUDED (false negatives for contrastive training), near-misses
  * rank first, same-source docs never appear, and the corpus query
  * returns a full ladder per anchor.
  */
class HardNegativesSpec extends SparkSpec {
  import spark.implicits._

  // anchor A (src0); B = exact copy in src1 (near-dup, must be EXCLUDED);
  // C = A with a two-token edit in src1 (the hard negative, rank 1);
  // D = half-overlapping in src2 (softer negative, after C);
  // E = same-source near-miss (must never appear: source filter);
  // F = unrelated vocabulary (softest).
  private val base = "alpha beta gamma delta epsilon zeta eta theta"
  private val frame = Seq(
    (0L, base, "src0"),
    (1L, base, "src1"),
    (2L, "alpha beta gamma delta epsilon zeta iota kappa", "src1"),
    (3L, "alpha beta gamma delta mu nu xi omicron", "src2"),
    (4L, "alpha beta gamma delta epsilon zeta eta sigma", "src0"),
    (5L, "pi rho sigma tau upsilon phi chi psi", "src2")
  ).toDF("doc_id", "text", "source")

  private def mine(maxCos: Double = 0.95, k: Int = 3) =
    TextQueries.hardNegativesOf(frame, col("doc_id") === 0, k, maxCos)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(4)))

  test("near-duplicate copies are excluded; the near-miss ranks first") {
    graft.GraftExtensions.ensure(spark)
    val got = mine()
    assert(!got.exists(_._2 == 1L), "exact cross-source copy must be excluded")
    assert(!got.exists(_._2 == 4L), "same-source doc must be excluded")
    assert(got.head._2 == 2L, s"two-token edit should be the hardest negative: $got")
    assert(got.map(_._1).toSeq == (1L to got.length).toSeq)
    // cosine ladder strictly ordered
    assert(got.map(_._3).toSeq ==
      got.map(_._3).sorted(Ordering[Double].reverse).toSeq)
  }

  test("raising the bar to 1.0 admits the exact copy at rank 1 " +
    "(the threshold is what excludes it, not an id rule)") {
    graft.GraftExtensions.ensure(spark)
    val got = mine(maxCos = 1.0000001)
    assert(got.head._2 == 1L && got.head._3 > 0.9999)
  }

  test("zero-overlap pairs are not candidates: an anchor with fewer than " +
    "k overlapping cross-source docs returns a SHORT ladder") {
    graft.GraftExtensions.ensure(spark)
    // anchor shares vocabulary with exactly ONE cross-source doc; the
    // other cross-source docs are vocabulary-disjoint (dot = 0). The
    // oracle's bucket equi-join never produces zero-overlap candidates,
    // so the miner must not fill the remaining top-k slots with them.
    val sparse = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "src0"),
      (1L, "alpha beta gamma delta mu nu xi omicron", "src1"),
      (2L, "pi rho sigma tau upsilon phi chi psi", "src1"),
      (3L, "lambda kappa iota omega psi chi phi upsilon", "src2")
    ).toDF("doc_id", "text", "source")
    val got = TextQueries.hardNegativesOf(sparse, col("doc_id") === 0, 3, 0.95)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(4)))
    // expected candidate set = exactly the oracle's: cross-source docs
    // sharing ≥1 HASHED bucket with the anchor (64-bucket feature
    // hashing can collide disjoint vocabularies — doc 1 overlaps by
    // construction; 2 and 3 only if their terms collide into anchor
    // buckets, in which case they are genuine candidates on BOTH engines)
    val w = TextQueries.hashedWeightsOf(sparse.select("doc_id", "text"),
      TextQueries.idfOf(sparse.select("doc_id", "text")))
    val anchorBuckets = w.filter(col("doc_id") === 0)
      .select("bucket").as[Long].collect().toSet
    val expected = w.filter(col("doc_id") =!= 0)
      .filter(col("bucket").isin(anchorBuckets.toSeq: _*))
      .select("doc_id").as[Long].collect().toSet
    assert(expected.contains(1L) && expected.size < 3,
      s"fixture broke: want a sub-k candidate set, got $expected")
    assert(got.map(_._2).toSet === expected,
      s"negatives must be exactly the bucket-overlap candidates: $got")
    assert(got.forall(_._3 > 0.0),
      "zero-overlap pairs (cos 0) must never fill ladder slots")
  }

  test("corpus query yields k negatives per anchor with the near-dup bar") {
    val out = TextQueries.x67HardNegatives.run(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(4) < 0.95))
    val byAnchor = rows.groupBy(_.getLong(0))
    assert(byAnchor.values.forall(_.length <= 3))
    assert(byAnchor.values.forall(g =>
      g.map(_.getLong(1)).sorted.sameElements(1L to g.length)))
  }
}
