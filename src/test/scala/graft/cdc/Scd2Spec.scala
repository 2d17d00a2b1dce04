package graft.cdc

import graft.SparkSpec

/** CDC3 SCD2 invariants: per key, versions chain without gaps (each
  * version's valid_to is the next version's valid_from or the closing
  * delete), exactly one current version on live keys, none on deleted
  * keys, and version numbers are contiguous from 1.
  */
class Scd2Spec extends SparkSpec {

  test("cdc4: probes hit the temporally correct version; pre-birth and " +
    "post-delete probes miss") {
    val rows = CdcQueries.cdc4PitLookup.run(spark, sfDir).collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (Option(r.getString(2)), if (r.isNullAt(4)) -1L else r.getLong(4))))
      .toMap
    assert(rows.nonEmpty)
    val hist = CdcQueries.cdc3Scd2.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3), r.getLong(4),
        r.getLong(6)))
    hist.map(_._1).distinct.foreach { id =>
      // before birth: MISS, never fall forward to version 1
      assert(rows((id, id * 10 - 5)) === ((None, -1L)), s"id $id pre-birth")
      // at the insert LSN: version 1 exactly
      assert(rows((id, id * 10))._2 === 1L, s"id $id at insert")
      // at the update boundary: the version whose interval CONTAINS the
      // lsn ([from, to) semantics) — recompute from the history table
      val atUpd = hist.filter(h => h._1 == id && h._3 <= id * 10 + 1 &&
        (h._4 == -1L || id * 10 + 1 < h._4))
      assert(atUpd.length === 1, s"id $id: probe must land in one interval")
      assert(rows((id, id * 10 + 1))._2 === atUpd.head._5, s"id $id at update")
      // after a delete: history exists but the probe must MISS
      if (id % 97 == 0)
        assert(rows((id, id * 10 + 2)) === ((None, -1L)),
          s"id $id must not serve a deleted dimension")
    }
  }

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
