package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  import org.apache.spark.sql.DataFrame
  // 90% of rows on one hot key — the shape AQE alone can't fully split
  private lazy val big: DataFrame = {
    import spark.implicits._
    spark.range(0, 10000)
      .select(when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id") % 100)
        .as("k"), col("id").as("payload"))
  }
  private lazy val small: DataFrame = {
    import spark.implicits._
    (0L until 100L).map(k => (k, s"dim$k")).toDF("sk", "name")
  }

  test("saltedJoin(inner) equals the plain join, row for row") {
    val plain = big.join(small, big("k") === small("sk")).drop("sk")
      .orderBy("payload").collect()
    val salted = Skew.saltedJoin(big, small, "k", "sk", buckets = 8)
      .drop("sk").orderBy("payload").collect()
    assert(salted.length === plain.length)
    assert(salted.toSeq === plain.toSeq)
  }

  test("saltedJoin(left) preserves unmatched big-side rows") {
    val smallMissingHotKey = small.filter(col("sk") =!= 7L)
    val plain = big.join(smallMissingHotKey, big("k") === col("sk"), "left")
      .drop("sk").orderBy("payload").collect()
    val salted = Skew.saltedJoin(big, smallMissingHotKey, "k", "sk", 8, "left")
      .drop("sk").orderBy("payload").collect()
    assert(salted.toSeq === plain.toSeq)
  }

  test("salt spreads the hot key across buckets") {
    val spread = big.filter(col("k") === 7L)
      .withColumn("s", Skew.saltCol(8, col("k"), col("payload")))
      .select("s").distinct().count()
    assert(spread === 8, "hot key must occupy every salt bucket")
  }

  test("saltedDistinctCount equals exact countDistinct") {
    val exact = big.groupBy("k")
      .agg(countDistinct(col("payload")).as("n_distinct_payload"))
      .orderBy("k").collect()
    val salted = Skew.saltedDistinctCount(big, Seq("k"), "payload", 8)
      .orderBy("k").collect()
    assert(salted.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      exact.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("salting is deterministic across repartitionings") {
    val a = big.withColumn("s", Skew.saltCol(8, col("payload")))
      .orderBy("payload").select("s").collect().map(_.getInt(0)).toSeq
    val b = big.repartition(17)
      .withColumn("s", Skew.saltCol(8, col("payload")))
      .orderBy("payload").select("s").collect().map(_.getInt(0)).toSeq
    assert(a === b)
  }
}
