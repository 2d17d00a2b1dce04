package graft
import org.apache.spark.sql.SparkSession

/** Scratch main for ad-hoc plan/timing probes while iterating. */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", "graft-probe",
      shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Unit): Unit = {
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[probe] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      }
    }
    // ingest timing probe: generate -> unwrap -> partitioned bronze write
    time("gen_unwrap_noop") {
      cdc.Cdc.unwrap(cdc.Cdc.generateUsersCdc(spark, 2000000L))
        .write.format("noop").mode("overwrite").save()
    }
    time("ingest_2m") {
      val dir = java.nio.file.Files.createTempDirectory("graft-probe-ingest").toString
      val env = cdc.Cdc.unwrap(cdc.Cdc.generateUsersCdc(spark, 2000000L))
      cdc.Cdc.writeBronze(env, dir)
      println(s"[probe] rows=${spark.read.parquet(dir).count()}")
    }
    spark.stop()
  }
}
