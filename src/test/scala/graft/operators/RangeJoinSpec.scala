package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[RangeJoin]] semantics: bit-equal to the naive non-equi join on
  * seeded adversarial inputs (overlaps, containment, negatives, empty
  * and degenerate intervals), with a plan that never degrades to
  * BroadcastNestedLoop or a cartesian product.
  */
class RangeJoinSpec extends SparkSpec {

  private def naive(points: org.apache.spark.sql.DataFrame,
      intervals: org.apache.spark.sql.DataFrame) =
    points.crossJoin(intervals)
      .filter(col("p") >= col("lo") && col("p") <= col("hi"))

  test("differential vs naive non-equi join (500 points x 60 intervals, seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813)
    // points straddle zero so floor-division bucketing of negatives is hit
    val points = (1 to 500).map(i => (i.toLong, rnd.nextLong(4000) - 2000))
      .toDF("pid", "p")
    // spans 0 (degenerate single-point), tiny, typical, huge (bucket-storm),
    // plus inverted lo > hi rows that must match nothing
    val intervals = (1 to 60).map { i =>
      val lo = rnd.nextLong(4200) - 2100
      val span = i % 6 match {
        case 0 => 0L
        case 1 => rnd.nextLong(3)
        case 2 | 3 => rnd.nextLong(200)
        case 4 => rnd.nextLong(1500)
        case 5 => -(rnd.nextLong(50) + 1) // inverted: empty
      }
      (i.toLong, lo, lo + span)
    }.toDF("iid", "lo", "hi")

    for (w <- Seq(1L, 7L, 64L, 5000L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", w)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      val want = naive(points, intervals)
        .select("pid", "iid").as[(Long, Long)].collect().sorted.toSeq
      assert(want.nonEmpty, "fixture must produce matches")
      assert(got === want, s"bucketWidth=$w diverges from the naive join")
    }
  }

  test("bounds are inclusive on both ends; duplicates of a matching point are kept") {
    import spark.implicits._
    val points = Seq((1L, 10L), (2L, 10L), (3L, 20L), (4L, 21L))
      .toDF("pid", "p")
    val intervals = Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 8L)
      .select("pid").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 3L))
  }

  test("plan is an equi-join on the bucket: no BNLJ, no cartesian") {
    import spark.implicits._
    val points = spark.range(10000).select(col("id").as("pid"),
      (col("id") * 13 % 5000).as("p"))
    val intervals = (1 to 400).map(i => (i.toLong, i * 12L, i * 12L + 150L))
      .toDF("iid", "lo", "hi")
    val plan = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 128L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join degraded to BNLJ:\n$plan")
    assert(!plan.contains("CartesianProduct"),
      s"range join degraded to cartesian:\n$plan")
  }

  test("intervalOverlap differential: each pair exactly once, any width (seeded)") {
    import spark.implicits._
    val rnd = new scala.util.Random(424242)
    def mk(n: Int, tag: String) = (1 to n).map { i =>
      val lo = rnd.nextLong(3000) - 1500
      val span = i % 5 match {
        case 0 => 0L
        case 1 => rnd.nextLong(5)
        case 2 | 3 => rnd.nextLong(300)
        case 4 => rnd.nextLong(1200)
      }
      (i.toLong, lo, lo + span)
    }.toDF(s"${tag}id", s"${tag}lo", s"${tag}hi")
    val a = mk(120, "a")
    val b = mk(80, "b")
    val want = a.crossJoin(b)
      .filter(col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
    assert(want.nonEmpty)
    for (w <- Seq(1L, 16L, 250L, 10000L)) {
      val got = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi", w)
        .select("aid", "bid").as[(Long, Long)].collect().sorted.toSeq
      // sorted WITH duplicates: a pair surviving in two buckets would
      // differ from `want` even though the distinct sets agree
      assert(got === want, s"bucketWidth=$w diverges (or duplicates pairs)")
    }
  }

  test("left-outer points survive with null intervals; matched rows identical to inner") {
    import spark.implicits._
    val points = Seq((1L, 5L), (2L, 15L), (3L, 100L), (4L, 15L))
      .toDF("pid", "p")
    val intervals = Seq((10L, 10L, 20L), (11L, 12L, 16L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin
      .pointInIntervalLeft(points, "pid", "p", intervals, "lo", "hi", 8L)
      .select(col("pid"), col("iid"))
      .as[(Long, Option[Long])].collect().sorted.toSeq
    assert(got === Seq(
      (1L, None), (2L, Some(10L)), (2L, Some(11L)),
      (3L, None), (4L, Some(10L)), (4L, Some(11L))))
  }

  test("bucketWidthFor picks the median span; replication stays <= ~2x") {
    import spark.implicits._
    val rnd = new scala.util.Random(1207)
    // span mix around a median near 100 with a 5% long tail (the
    // realistic shape), plus inverted rows that bucketWidthFor must ignore
    val intervals = (1 to 2000).map { i =>
      val lo = rnd.nextLong(1000000)
      val span = i % 20 match {
        case 19 => -5L // inverted: excluded from both width and join
        case 18 => 40L + rnd.nextLong(1000) // tail
        case _ => 40L + rnd.nextLong(120)
      }
      (i.toLong, lo, lo + span)
    }.toDF("iid", "lo", "hi")
    val w = RangeJoin.bucketWidthFor(intervals, "lo", "hi")
    val spans = intervals.filter(col("lo") <= col("hi"))
      .select((col("hi") - col("lo") + 1).as("s")).as[Long].collect().sorted
    val median = spans(spans.length / 2)
    assert(math.abs(w - median) <= math.max(2L, median / 20),
      s"width $w far from exact median $median")
    // replication factor = exploded interval rows / valid interval rows:
    // at w = median span the median interval covers <= 2 buckets, so the
    // corpus-wide factor must stay ~2x (the operator doc's contract)
    val valid = intervals.filter(col("lo") <= col("hi"))
    val exploded = valid.select(explode(sequence(
      RangeJoin.floorDiv(col("lo"), w),
      RangeJoin.floorDiv(col("hi"), w)))).count()
    val factor = exploded.toDouble / valid.count()
    assert(factor <= 2.5, f"interval replication $factor%.2f exceeds ~2x at median-span width $w")
    // and the median interval itself covers at most 2 buckets — the
    // per-interval form of the same contract, tail-independent
    assert(median / w + 1 <= 2, s"median-span interval covers ${median / w + 1} buckets at width $w")
  }

  test("bucketWidthFor degenerate inputs fall back to width 1") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("lo", "hi")
    assert(RangeJoin.bucketWidthFor(empty, "lo", "hi") === 1L)
    val inverted = Seq((10L, 5L), (20L, 0L)).toDF("lo", "hi")
    assert(RangeJoin.bucketWidthFor(inverted, "lo", "hi") === 1L)
    val points = Seq((7L, 7L), (9L, 9L)).toDF("lo", "hi")
    assert(RangeJoin.bucketWidthFor(points, "lo", "hi") === 1L)
  }

  test("floorDiv buckets negatives correctly (DIV truncation would not)") {
    import spark.implicits._
    val got = Seq(-21L, -20L, -1L, 0L, 1L, 19L, 20L).toDF("v")
      .select(RangeJoin.floorDiv(col("v"), 20L).as("b"))
      .as[Long].collect().toSeq
    assert(got === Seq(-2L, -1L, -1L, 0L, 0L, 0L, 1L))
  }
}
