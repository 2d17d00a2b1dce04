package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q19: the integer EMD equals the textbook definition computed the
  * slow way in doubles, for every group; flags derive from the values.
  */
class LDiversitySpec extends SparkSpec {

  test("q19 EMD matches the definitional double computation within 1 bp; " +
    "flags consistent; bounds hold") {
    val rows = ExtendedSqlQueries.q19LDiversityTCloseness.run(spark, sfDir)
      .collect().map(r => (r.getAs[String]("region"),
        r.getAs[String]("segment"), r.getAs[Long]("n"),
        r.getAs[Long]("l_distinct"), r.getAs[Boolean]("meets_l3"),
        r.getAs[Long]("emd_bp"), r.getAs[Boolean]("meets_t02")))
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r._6 >= 0L && r._6 <= 10000L, s"EMD out of [0,1]: $r")
      assert(r._5 === (r._4 >= 3) && r._7 === (r._6 <= 2000L), s"flag: $r")
    }

    // definitional re-computation: P/Q cumulative shares in doubles
    val cells = graft.sources.Tables.load(spark, sfDir, "customer")
      .join(broadcast(graft.sources.Tables.load(spark, sfDir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(graft.sources.Tables.load(spark, sfDir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name").as("region"), col("c_mktsegment").as("segment"),
        floor(col("c_acctbal") / 2000).cast("long").as("band"))
      .groupBy("region", "segment", "band").count()
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Long]("band"), r.getAs[Long]("count")))
    val bandsSorted = cells.map(_._2).distinct.sorted
    val m = bandsSorted.length
    val globByBand = bandsSorted.map(b =>
      b -> cells.filter(_._2 == b).map(_._3).sum).toMap
    val nTotal = globByBand.values.sum.toDouble
    rows.foreach { r =>
      val mine = cells.filter(_._1 == (r._1, r._2))
      val n = mine.map(_._3).sum.toDouble
      var cp = 0.0; var cq = 0.0; var acc = 0.0
      bandsSorted.foreach { b =>
        cp += mine.filter(_._2 == b).map(_._3).sum / n
        cq += globByBand(b) / nTotal
        acc += math.abs(cp - cq)
      }
      val emd = acc / (m - 1)
      assert(math.abs(emd * 10000 - r._6) <= 1.0,
        s"${r._1}/${r._2}: integer EMD ${r._6} vs definitional ${emd * 10000}")
      assert(mine.length.toLong === r._4, s"l_distinct mismatch for $r")
    }
  }
}
