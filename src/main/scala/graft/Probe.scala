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
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    val li = sources.Tables.load(spark, d, "lineitem")
    time("raw 2-col scan + minmax agg") {
      li.select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
        .groupBy("g").agg(min("v"), max("v"), count(lit(1))).collect()
    }
    time("full a13") {
      analytics.RelationalQueries.a13Percentiles.run(spark, d)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
