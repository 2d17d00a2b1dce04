package graft.analytics

import graft.SparkSpec

/** e11 CUSUM: the window-expressible prefix-min identity
  * S_t = P_t − min(0, min_{j≤t} P_j) against the textbook recursion
  * S_t = max(0, S_{t−1} + dev_t), both property-tested and replayed on
  * the engine's own output.
  */
class CusumSpec extends SparkSpec {

  private def recursion(devs: Seq[Long]): Seq[Long] =
    devs.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail

  private def identity(devs: Seq[Long]): Seq[Long] = {
    val p = devs.scanLeft(0L)(_ + _).tail
    val runMin = p.scanLeft(0L)(math.min).tail // includes virtual P_0 = 0
    p.zip(runMin).map { case (pt, m) => pt - m }
  }

  test("prefix-min identity equals the max(0,...) recursion (200 random series)") {
    (1 to 200).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val devs = Seq.fill(50 + rnd.nextInt(200))(rnd.nextInt(2001) - 1100L)
      assert(identity(devs) === recursion(devs), s"seed $seed")
    }
  }

  test("e12 per-key output equals per-key single-threaded recursions") {
    import org.apache.spark.sql.functions._
    val rows = graft.sources.Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority").as("prio"),
        to_date(date_trunc("month", col("o_orderdate"))).as("mo"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("prio", "mo").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    val got = ExtendedSqlQueries.e12CusumPerKey.run(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((Option(r.get(3)).map(_.asInstanceOf[Long]), r.getLong(4),
          r.getLong(5)))).toMap
    rows.groupBy(_._1).foreach { case (prio, ms) =>
      val series = ms.map(_._2).toSeq
      val shiftT = series.size * 2 / 3
      val pre = series.take(shiftT - 1)
      val (tp, np) = (pre.sum, pre.size.toLong)
      val devs = series.zipWithIndex.map { case (c, i) =>
        val x = if (prio == "1-URGENT" && i + 1 >= shiftT)
          c + tp / np / 3 else c
        np * x - tp - tp / 10
      }
      val stats = recursion(devs)
      val alarms = stats.zipWithIndex.collect {
        case (st, i) if st >= 2 * tp => (i + 1).toLong
      }
      assert(got(prio) === ((alarms.headOption, stats.max,
        alarms.count(_ < shiftT).toLong)), s"prio $prio")
    }
  }

  test("e11 output equals a single-threaded recursion over the same series") {
    import org.apache.spark.sql.functions._
    val weekly = graft.sources.Tables.load(spark, sfDir, "orders")
      .groupBy(to_date(date_trunc("week", col("o_orderdate"))).as("wk"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("wk").collect().map(_.getLong(1)).toSeq
    val nWeeks = weekly.size.toLong
    val shiftT = nWeeks * 2 / 3
    val pre = weekly.take((shiftT - 1).toInt)
    val (totalPre, nPre) = (pre.sum, pre.size.toLong)
    val delta = totalPre / nPre / 5
    val devs = weekly.zipWithIndex.map { case (c, i) =>
      val x = if (i + 1 >= shiftT) c + delta else c
      nPre * x - totalPre - totalPre / 10
    }
    val stats = recursion(devs)
    val alarms = stats.zipWithIndex.collect {
      case (st, i) if st >= 2 * totalPre => (i + 1).toLong
    }
    val row = ExtendedSqlQueries.e11CusumChangepoint.run(spark, sfDir)
      .collect().head
    assert(row.getLong(0) === nWeeks)
    assert(row.getLong(1) === shiftT)
    val firstAlarm = if (alarms.isEmpty) null else alarms.head
    assert(Option(row.get(2)).map(_.asInstanceOf[Long]) ===
      Option(firstAlarm).map(_.asInstanceOf[Long]))
    assert(row.getLong(4) === stats.max)
    assert(row.getLong(5) === alarms.count(_ < shiftT).toLong)
  }
}
