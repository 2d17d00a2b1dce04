package graft.cdc

import graft.SparkSpec

/** CDC3 SCD2 invariants: per key, versions chain without gaps (each
  * version's valid_to is the next version's valid_from or the closing
  * delete), exactly one current version on live keys, none on deleted
  * keys, and version numbers are contiguous from 1.
  */
class Scd2Spec extends SparkSpec {

  test("cdc3: version chains, current flags, delete closure") {
    val rows = CdcQueries.cdc3Scd2.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4),
        r.getBoolean(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val byId = rows.groupBy(_._1)
    byId.foreach { case (id, vs) =>
      val sorted = vs.sortBy(_._2)
      // contiguous version numbers from 1
      assert(sorted.map(_._5).toSeq === (1L to vs.length).toSeq, s"id $id")
      // every non-final version closes exactly at the next version's start
      sorted.sliding(2).filter(_.size == 2).foreach { case Array(a, b) =>
        assert(a._3 === b._2, s"id $id: gap between versions ${a._5}->${b._5}")
        assert(!a._4, s"id $id: superseded version ${a._5} still current")
      }
      val last = sorted.last
      val deleted = id % 97 == 0
      if (deleted) {
        // the delete event closed the last version at its own LSN
        assert(!last._4 && last._3 === id * 10 + 2,
          s"deleted id $id must have a closed, non-current last version")
      } else {
        assert(last._4 && last._3 === -1L,
          s"live id $id must end in one open current version")
      }
      assert(sorted.count(_._4) === (if (deleted) 0 else 1))
    }
    // fulfilled orders produce 2 versions, others 1 — both shapes present
    assert(byId.values.exists(_.length == 2) && byId.values.exists(_.length == 1))
  }
}
