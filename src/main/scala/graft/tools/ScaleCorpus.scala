package graft.tools

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-generated scale-up corpus: replicate the driver's sf-corpus N times
  * with TPC-H-style key remapping, so the engine's 100 TB posture claims can
  * be measured one order of magnitude up from the largest provided testdata
  * (sf0.1 → an sf1-equivalent) instead of only asserted.
  *
  * Scaling rules (mirroring how TPC-H itself scales with SF):
  *  - `region`/`nation` are fixed-cardinality dimensions — copied as-is.
  *  - `customer`/`supplier`/`part`/`orders`/`lineitem`/`events`/`documents`/
  *    `embeddings` grow linearly: replica `r` shifts every key column by
  *    `r * KeyOffset`, and foreign keys shift together, so each replica is a
  *    self-consistent sub-universe with exactly the original's per-key
  *    distributions (orders per customer, lines per order, events per user).
  *    Cross-replica joins produce nothing — scaling is linear by
  *    construction, which is precisely what the soak wants to verify the
  *    ENGINE also achieves (a super-linear wall-time curve then indicts the
  *    plan, not the data).
  *  - `documents.text` in replica r > 0 is the original doc's words
  *    reordered by a deterministic per-replica hash sort. Every
  *    order-INdependent statistic (length, distinct-word diversity,
  *    stopword ratio, token counts — everything t21's quality score and the
  *    x25 gate read) is preserved exactly, while the 3-token shingles that
  *    drive the near-dup families (x2/x3/x4) decorrelate across replicas:
  *    within a replica, exact dups stay exact dups (same permutation on
  *    identical text) and near-dup pairs keep most of their common-word
  *    runs, but a doc and its foreign-replica twin share almost no
  *    shingles. Without this, 10 verbatim copies would square the LSH
  *    bucket occupancy (every band bucket 10× deeper → 100× candidate
  *    pairs) — a data-authoring artifact, not an engine property.
  *
  * Everything is narrow column work (explode of a literal replica array, no
  * shuffle except the final spread repartition), so generation itself is
  * cheap and distributed.
  */
object ScaleCorpus {

  /** Replica key shift. Far above any sf0.1 key (max observed ~6e6) and far
    * below Long overflow at 10 replicas.
    */
  val KeyOffset = 100000000L // 1e8

  private def shiftKeys(df: DataFrame, keyCols: Seq[String]): DataFrame =
    keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + col("__r") * KeyOffset))

  /** Words of `text`, reordered by xxhash64(word, replica) — identity for
    * replica 0. Stable under duplicates (hash ties sort by the word itself).
    */
  private def permuteText(text: Column, r: Column): Column = {
    val keyed = transform(split(text, " "),
      w => struct(xxhash64(w, r).as("k"), w.as("w")))
    val sorted = array_join(
      transform(array_sort(keyed), s => s.getField("w")), " ")
    when(r === 0, text).otherwise(sorted)
  }

  /** Generate the scaled corpus from `srcDir` into `outDir` (all ten
    * canonical tables, `<name>.parquet` layout, same on-disk schemas).
    * `spread` = output files per scaled table, so downstream scans start
    * with real parallelism instead of one fat file.
    */
  def generate(spark: SparkSession, srcDir: String, outDir: String,
      replicas: Int = 10, spread: Int = 32): Unit = {
    require(replicas >= 1 && replicas * 2 < Int.MaxValue)

    val keyCols: Map[String, Seq[String]] = Map(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"))

    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for ((name, declared) <- Tables.all) {
      // raw read (no events ts derivation): the output must round-trip the
      // exact on-disk shape so Tables.load works on the scaled dir. Events
      // `ts` varies by generator version (nanos-as-long vs native micros) —
      // probe like Tables.load does, so the scaled copy keeps an encoding
      // the loader will classify the same way.
      val schema =
        if (name == "events" &&
            !Tables.eventsTsIsNanos(spark, s"$srcDir/$name.parquet"))
          Tables.eventsMicros
        else declared
      val src = spark.read.schema(schema).parquet(s"$srcDir/$name.parquet")
      val scaled = keyCols.get(name) match {
        case None => src // fixed dims: region, nation
        case Some(ks) =>
          val replicated = src.withColumn("__r",
            explode(typedlit((0 until replicas).toArray)))
          val shifted = shiftKeys(replicated, ks)
          val out =
            if (name == "documents")
              shifted
                .withColumn("text", permuteText(col("text"), col("__r")))
                .withColumn("n_chars", length(col("text")).cast("long"))
            else shifted
          out.drop("__r").repartition(spread)
      }
      scaled.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    }
  }
}
