package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every inventory query against
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line with per-query seconds.
  *
  * Each query is forced through a `noop` write — full materialization of
  * every output row/column (a bare `count()` lets Catalyst prune most of
  * the plan). A small warmup query first absorbs JVM/codegen startup so
  * per-query numbers measure the plans, not classloading.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.create(s"local[$cpus]", "graft-bench",
      shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warmup: one scan+agg+join through codegen
    force(SparkEntry.queries("j4_daily_business_metrics")(spark, sfDir))

    // best-of-2 per query: the first execution of each distinct plan shape
    // pays JIT/codegen compilation; the second measures the plan itself.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var failed = false
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try force(fn(spark, sfDir))
        catch { case e: Throwable =>
          failed = true
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
        }
        (System.nanoTime() - t0) / 1e9
      }
      // a failure must not masquerade as a fast timing in the JSON
      name -> (if (failed) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum

    // CDC ingest throughput, comparable to the reference's headline
    // events/sec numbers (BASELINE.md): generate -> unwrap -> partitioned
    // bronze parquet, end to end.
    val ingestEvents = 2000000L
    val ingestDir = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    val t0 = System.nanoTime()
    val env = cdc.Cdc.unwrap(cdc.Cdc.generateUsersCdc(spark, ingestEvents))
    cdc.Cdc.writeBronze(env, ingestDir)
    val nWritten = spark.read.parquet(ingestDir).count()
    val ingestSec = (System.nanoTime() - t0) / 1e9
    val eps = nWritten / ingestSec

    println(s"""{"metric":"total","value":$total,"unit":"sec","runs":2,""" +
      s""""ingest_events_per_sec":$eps,"ingest_events":$nWritten,""" +
      s""""queries":$qs,"sf":"$sfDir"}""")
    PlanCache.clear(spark)
    spark.stop()
  }
}
