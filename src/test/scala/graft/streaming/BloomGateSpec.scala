package graft.streaming

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming existence gate: the unknown route is EXACT (never a known
  * key), the maybe route is a measured prefilter, the reference is
  * scanned at most once per TTL, and a live drive matches the batch
  * partition on any split.
  */
class BloomGateSpec extends SparkSpec {
  import spark.implicits._

  private def customers(s: org.apache.spark.sql.SparkSession): DataFrame =
    Tables.load(s, sfDir, "customer").select(col("c_custkey").as("key"))

  private def gate(ttlMs: Long = Long.MaxValue, mBits: Int = 1 << 20,
      clock: () => Long = () => 0L) =
    new BloomGate(customers(_), "key", ttlMs, mBits, clock = clock)

  test("unknown route never contains a key from the reference") {
    val g = gate()
    val known = customers(spark).select(col("key").as("user_id"))
    val probes = known.unionByName(
      spark.range(5000000L, 5002000L).toDF("user_id"))
    val (_, unknown) = g.route(probes, "user_id")
    val falseNeg = unknown.join(customers(spark),
      col("user_id") === col("key"), "left_semi").count()
    assert(falseNeg == 0L, "a known key was routed certainly-unknown")
    assert(g.fitCount == 1)
  }

  test("the maybe route is a prefilter: non-members mostly routed out, " +
    "measured fpr small at default sizing") {
    val g = gate()
    val absent = spark.range(5000000L, 5010000L).toDF("user_id")
    val (maybe, unknown) = g.route(absent, "user_id")
    val fp = maybe.count()
    assert(fp + unknown.count() == 10000L)
    assert(fp < 20, s"fpr ${fp / 10000.0} too high at m=2^20")
  }

  test("a saturated tiny filter degrades toward pass-through, " +
    "never toward false negatives") {
    val g = gate(mBits = 256)
    val known = customers(spark).select(col("key").as("user_id"))
    val (maybe, _) = g.route(known, "user_id")
    assert(maybe.count() == known.count(), "every member must route maybe")
  }

  test("reference is scanned once per TTL; refit sees appended keys") {
    var now = 0L
    @volatile var extra = false
    val ref: org.apache.spark.sql.SparkSession => DataFrame = s => {
      val base = customers(s)
      if (extra) base.unionByName(Seq(4999999L).toDF("key")) else base
    }
    val g = new BloomGate(ref, "key", ttlMs = 1000, clock = () => now)
    val probe = Seq(4999999L).toDF("user_id")
    val (_, unknown1) = g.route(probe, "user_id")
    assert(unknown1.count() == 1, "not yet in the reference")
    extra = true
    now = 500
    val (_, unknown2) = g.route(probe, "user_id")
    assert(unknown2.count() == 1 && g.fitCount == 1,
      "mid-TTL the frozen snapshot must stay blind to the append")
    now = 1500
    val (maybe3, unknown3) = g.route(probe, "user_id")
    assert(unknown3.count() == 0 && maybe3.count() == 1 && g.fitCount == 2,
      "TTL expiry must surface the appended key")
  }

  test("live stream drive matches the batch partition on any split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val g = gate()
    val keys: Seq[Long] =
      customers(spark).limit(40).as[Long].collect().toSeq ++
        (5000000L to 5000039L)
    val seen = scala.collection.mutable.Map[Long, Boolean]()
    val mem = MemoryStream[Long]
    val q = mem.toDF().toDF("user_id").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        g.flag(batch, "user_id").collect().foreach(r =>
          seen.synchronized { seen(r.getLong(0)) = r.getBoolean(1) })
        ()
      }.start()
    try {
      mem.addData(keys.take(13))
      q.processAllAvailable()
      mem.addData(keys.drop(13))
      q.processAllAvailable()
    } finally q.stop()
    val batchFlags = g.flag(keys.toDF("user_id"), "user_id")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(seen.toMap === batchFlags)
    // all 40 known keys flagged maybe; unknown block overwhelmingly not
    assert(keys.take(40).forall(batchFlags(_)))
  }
}
