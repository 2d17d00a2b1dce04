package graft.cdc

import graft.SparkSpec

/** q21: the audit must catch every corruption class on planted
  * histories and certify the real cdc3 derivation clean.
  */
class Scd2IntegritySpec extends SparkSpec {
  import spark.implicits._

  private def audit(rows: Seq[(Long, Long, Option[Long])]) = {
    val df = rows.map { case (id, f, t) =>
      (id, f, t.map(Long.box).orNull.asInstanceOf[java.lang.Long])
    }.toDF("id", "vfrom", "vto")
    CdcQueries.scd2AuditOf(df).collect().head
  }

  test("a clean tiling history certifies clean") {
    val r = audit(Seq(
      (1L, 10L, Some(20L)), (1L, 20L, Some(30L)), (1L, 30L, None),
      (2L, 5L, None)))
    assert(r.getAs[Long]("n_keys") === 2L)
    assert(r.getAs[Long]("n_versions") === 4L)
    assert(r.getAs[Boolean]("clean"))
  }

  test("overlap, gap, and multi-current are each caught and counted") {
    val r = audit(Seq(
      // key 1: overlap — v2 starts before v1 ends
      (1L, 10L, Some(25L)), (1L, 20L, None),
      // key 2: gap — v2 starts after v1 ends
      (2L, 10L, Some(15L)), (2L, 30L, None),
      // key 3: two open versions (multi-current) — the open first
      // version also overlaps its successor by definition
      (3L, 10L, None), (3L, 20L, None),
      // key 4: clean control
      (4L, 1L, Some(2L)), (4L, 2L, None)))
    assert(r.getAs[Long]("n_overlap_pairs") === 2L) // key 1 + key 3
    assert(r.getAs[Long]("n_gap_pairs") === 1L) // key 2
    assert(r.getAs[Long]("n_multi_current_keys") === 1L) // key 3
    assert(!r.getAs[Boolean]("clean"))
  }

  test("the real cdc3 derivation is clean by construction at sf0.001") {
    val r = CdcQueries.q21Scd2Integrity.run(spark, sfDir).collect().head
    assert(r.getAs[Boolean]("clean"), r.toString)
    assert(r.getAs[Long]("n_keys") > 0)
    assert(r.getAs[Long]("n_versions") >= r.getAs[Long]("n_keys"))
  }
}
