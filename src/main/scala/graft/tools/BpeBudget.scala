package graft.tools

import graft.GraftSession
import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Manual BPE budget record (not driver-invoked): learn a
  * vocabulary-scale merge budget on the ScaleCorpus-replicated documents
  * table and print how far the exact-safe merge batching amortizes the
  * count+rewrite rounds (rounds ≪ k is the claim; the spec proves it at
  * k=32, this records it at a real budget).
  *
  * `runMain graft.tools.BpeBudget [sfDir] [k] [replicas]`
  */
object BpeBudget {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(256)
    val replicas = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create(s"local[$cpus]", "graft-bpe-budget",
      shufflePartitions = cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")
    val scaled = java.nio.file.Files.createTempDirectory("graft-bpe-budget").toString
    ScaleCorpus.generate(spark, sfDir, scaled, replicas = replicas, spread = 2)
    val toks = Tables.load(spark, scaled, "documents")
      .select(split(lower(col("text")), " ").as("toks"))
    val t0 = System.nanoTime()
    val (merges, stats) = graft.text.BpeLearn.learnWithStats(toks, k)
    val sec = (System.nanoTime() - t0) / 1e9
    println(s"""BPEBUDGET {"sf":"$sfDir","replicas":$replicas,"k":$k,""" +
      s""""merges":${stats.merges},"rounds":${stats.rounds},""" +
      s""""collapsed_rows":${stats.collapsedRows},""" +
      s""""batch_sizes":[${stats.batchSizes.mkString(",")}],""" +
      s""""wall_sec":${math.round(sec * 100) / 100.0},""" +
      s""""last_merge_count":${merges.lastOption.map(_.count).getOrElse(-1L)}}""")
    spark.stop()
  }
}
