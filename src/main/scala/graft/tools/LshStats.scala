package graft.tools

import graft.GraftSession

/** Manual LSH diagnostics (not driver-invoked): print
  * [[graft.dedup.DedupQueries.lshOccupancy]] for one or more sf dirs —
  * the band-bucket occupancy and candidate-pair volume that adjudicate
  * x2/x21 wall-time swings across corpus regenerations.
  *
  * `runMain graft.tools.LshStats <sfDir> [<sfDir> ...]`
  */
object LshStats {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: LshStats <sfDir> [<sfDir> ...]")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", "graft-lsh-stats",
      shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { d =>
      val rows = graft.dedup.DedupQueries.lshOccupancy(spark, d).collect()
      rows.foreach { r =>
        println(s"""LSHSTATS {"sf":"$d","family":"${r.getString(0)}",""" +
          s""""buckets":${r.getLong(1)},"max_occupancy":${r.getLong(2)},""" +
          s""""p99_occupancy":${r.getLong(3)},"pairs_uncapped":${r.getLong(4)},""" +
          s""""pairs_capped":${r.getLong(5)},"buckets_capped":${r.getLong(6)}}""")
      }
    }
    graft.PlanCache.clear(spark)
    spark.stop()
  }
}
