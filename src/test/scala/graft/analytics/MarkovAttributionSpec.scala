package graft.analytics

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** w15 — Markov removal-effect attribution: planted-journey exactness,
  * journey-splitting rules, and a single-threaded differential on the
  * real corpus.
  */
class MarkovAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def plant(rows: Seq[(Long, String, Long, Long)]) =
    rows.toDF("user_id", "event_type", "us", "event_id")

  test("w15: hand journey - removal effect is exactly the dropped path") {
    // J1: view -> purchase; J2 (later session): click -> abandoned
    val base = plant(Seq(
      (1L, "view", 0L, 1L),
      (1L, "purchase", 60000000L, 2L),
      (1L, "click", 7200000000L, 3L)))
    val counts = EventQueries.markovTransitions(base)
      .groupBy("src", "dst").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(counts === Map(
      ("START", "view") -> 1L, ("view", "CONV") -> 1L,
      ("START", "click") -> 1L, ("click", "NULL") -> 1L))
    val eff = EventQueries.markovRemovalEffects(counts, Seq("click", "view"))
    val byCh = eff.map(e => e._1 -> e).toMap
    // full chain: p(START) = (1e9 + 0) / 2
    assert(byCh("view")._3 === 500000000L)
    // removing view kills the only converting path
    assert(byCh("view")._4 === 0L)
    assert(byCh("view")._5 === 10000L)
    assert(byCh("view")._6 === 10000L)
    // removing click changes nothing (its path never converts)
    assert(byCh("click")._4 === 500000000L)
    assert(byCh("click")._5 === 0L)
    assert(byCh("click")._6 === 0L)
  }

  test("w15: purchases split journeys; 30-min gaps split sessions") {
    val m = 60000000L // one minute in us
    val base = plant(Seq(
      (1L, "view", 0L, 1L),
      (1L, "purchase", 5 * m, 2L), // ends journey 1
      (1L, "click", 10 * m, 3L), // post-purchase -> new journey
      (1L, "error", 50 * m, 4L))) // 40-min gap -> new session
    val trans = EventQueries.markovTransitions(base)
      .groupBy("src", "dst").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(trans === Map(
      ("START", "view") -> 1L, ("view", "CONV") -> 1L,
      ("START", "click") -> 1L, ("click", "NULL") -> 1L,
      ("START", "error") -> 1L, ("error", "NULL") -> 1L))
  }

  test("w15: distributed derivation equals a single-threaded fold") {
    val evs = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // independent journey fold: per user sorted by (us, event_id)
    val counts = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    evs.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._4))
      var prevUs = Long.MinValue
      var inJourney = false // true once a channel step opened the journey
      var prev = "START"
      sorted.foreach { case (_, et, us, _) =>
        val newSession = prevUs == Long.MinValue || us - prevUs > 1800000000L
        if (newSession && inJourney) {
          counts((prev, "NULL")) += 1; prev = "START"; inJourney = false
        }
        if (et == "purchase") {
          counts((prev, "CONV")) += 1; prev = "START"; inJourney = false
        } else {
          counts((prev, et)) += 1; prev = et; inJourney = true
        }
        prevUs = us
      }
      if (inJourney) counts((prev, "NULL")) += 1
    }
    val sparkCounts = EventQueries.markovTransitions(
      Tables.load(spark, sfDir, "events").select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"), col("event_id")))
      .groupBy("src", "dst").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(sparkCounts === counts.toMap)

    // and the full query reproduces the fold's removal ladder
    val channels = evs.map(_._2).distinct.filter(_ != "purchase").sorted.toSeq
    val exp = EventQueries.markovRemovalEffects(counts.toMap, channels)
      .map(e => (e._1, e._2, e._3, e._4, e._5, e._6))
    val got = graft.SparkEntry.queries("w15_markov_attribution")(spark, sfDir)
      .orderBy("channel").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === exp)
    // the corpus genuinely converts: full-chain probability is positive
    assert(got.head._3 > 0L)
  }
}
