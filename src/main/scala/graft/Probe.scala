package graft
import org.apache.spark.sql.SparkSession

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
    Seq("x2_dedup_minhash_lsh", "x3_dedup_simhash").foreach { q =>
      time(q) {
        SparkEntry.queries(q)(spark, d)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
