package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** r19 scratch probe (not driver-invoked, not part of the inventory):
  * answers two plan questions before committing to a design —
  *  1. does SmallSortRule fire on the agg→orderBy shapes it targets?
  *  2. are might_contain / bloom_filter_agg resolvable from expr()/SQL?
  */
object Probe19 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("local[8]", "probe19",
      shufflePartitions = 8).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def finalPlan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan.toString
        case o => o.toString
      }

    // 1a. small agg + orderBy — does the final plan keep rangepartitioning?
    val small = spark.range(100000L)
      .select((col("id") % 97).as("k"), col("id").as("v"))
      .groupBy("k").agg(sum("v").as("s")).orderBy("s")
    small.collect()
    val sp = finalPlan(small)
    println(s"[probe] small final has rangepartitioning: ${sp.contains("rangepartitioning")}, coalesce1: ${sp.contains("Coalesce 1")}")

    // 1b. big agg + orderBy (300k groups > maxRows)
    val big = spark.range(300000L)
      .select(col("id").as("k"), (col("id") * 3).as("v"))
      .groupBy("k").agg(sum("v").as("s")).orderBy(desc("s"))
    big.collect()
    val bp = finalPlan(big)
    println(s"[probe] big final has rangepartitioning: ${bp.contains("rangepartitioning")}, coalesce1: ${bp.contains("Coalesce 1")}")

    // 2. native bloom expressions from SQL
    try {
      val r = spark.sql(
        """select might_contain(
          |  (select bloom_filter_agg(xxhash64(id), 100L, 1024L) from range(10)),
          |  xxhash64(5L)) as hit""".stripMargin).collect()
      println(s"[probe] might_contain via SQL works: ${r.head}")
    } catch {
      case e: Exception =>
        println(s"[probe] might_contain via SQL FAILED: ${e.getMessage.take(300)}")
    }
    try {
      spark.range(10).createOrReplaceTempView("__probe_dim")
      val r2 = spark.range(100).filter(expr(
        "might_contain((select bloom_filter_agg(xxhash64(id), 10L, 1024L) from __probe_dim), xxhash64(id))"))
      val n = r2.count()
      println(s"[probe] expr() scalar-subquery bloom filter works: kept $n of 100")
      println(r2.queryExecution.optimizedPlan.toString.take(1500))
    } catch {
      case e: Exception =>
        println(s"[probe] expr() bloom FAILED: ${e.getMessage.take(300)}")
    }
    spark.stop()
  }
}
