package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** One-off measurement harness (not driver-invoked): quantify the fixed
  * cost of a final global `orderBy` (range exchange = sampling pass +
  * shuffle stage) against `coalesce(1).sortWithinPartitions` on a small
  * bounded output — the shape every inventory query ends in.
  *
  * runMain graft.tools.SortCostProbe <sfDir> [reps]
  */
object SortCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-sortprobe",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    // a typical census body: orders -> groupBy status/priority (~25 rows)
    def body = graft.sources.Tables.load(spark, sfDir, "orders")
      .groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("v"))
    force(body) // warm codegen + footer caches
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        force(mk)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[sortprobe] $tag: median ${ts.sorted.apply(reps / 2)}%.3f " +
        ts.map(t => f"$t%.3f").mkString("(", ", ", ")"))
    }
    time("bare (no sort)")(body)
    time("orderBy")(body.orderBy("o_orderstatus", "o_orderpriority"))
    time("coalesce1+sortWithin")(
      body.coalesce(1).sortWithinPartitions("o_orderstatus", "o_orderpriority"))
    spark.stop()
  }
}
