package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch main for ad-hoc plan/timing probes while iterating. */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", "graft-probe",
      shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    time("x4 fused-index") {
      dedup.DedupQueries.x4NgramJaccard.run(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    // legacy formulation (separate sizes agg + joins) as correctness control
    val sh = dedup.DedupQueries.shingleSet(
      sources.Tables.load(spark, d, "documents"), "doc_id")
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val hot = sh.groupBy("shingle").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > dedup.DedupQueries.SHINGLE_DF_CAP).select("shingle")
    val capped = sh.join(hot, Seq("shingle"), "left_anti")
    val inter = capped.as("a")
      .join(capped.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    val legacy = inter
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("sa.sz") + col("sb.sz") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.5)
    val newRows = dedup.DedupQueries.x4NgramJaccard.run(spark, d)
      .collect().map(_.mkString("|")).toSet
    val oldRows = legacy.collect().map(_.mkString("|")).toSet
    println(s"[probe] x4 rows new=${newRows.size} legacy=${oldRows.size} " +
      s"match=${newRows == oldRows}")
    spark.stop()
  }
}
