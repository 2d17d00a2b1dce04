package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Mirrors the reference's Spark tuning surface (AQE coalesce/skew-join,
  * Kryo, explicit shuffle parallelism — see reference
  * `2-batch-analytics-layer/task6-ecommerce-tables-job.yaml:154-161`) but
  * sized for the actual runtime: shuffle partitions follow the available
  * parallelism instead of a hard-coded 200, which on a real cluster should
  * be set to 2-3x total cores (AQE coalesces down from there at runtime).
  */
object GraftSession {

  /** Builder with scale-aware defaults; caller may override before create. */
  def builder(
      master: String = "local[*]",
      appName: String = "graft",
      shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .withExtensions(GraftExtensions.inject)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.localShuffleReader.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "snappy")
      // testdata events.parquet carries TIMESTAMP(NANOS) which Spark cannot
      // represent natively; read as epoch-nanos long and convert in Tables.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // v2 output commit: tasks move their files into place themselves, so
      // committing a time-partitioned write (bronze spans ~600 hour dirs)
      // is parallel instead of one serial driver-side rename storm — on a
      // 1000-executor cluster (or a metadata-slow disk) the v1 driver
      // commit IS the ingest bottleneck.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")

  def create(
      master: String = "local[*]",
      appName: String = "graft",
      shufflePartitions: Int = 32): SparkSession = {
    val spark = builder(master, appName, shufflePartitions).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
