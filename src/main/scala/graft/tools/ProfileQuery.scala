package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Per-operator profile of a named inventory query (not driver-invoked):
  * runs the query through the bench's noop-write forcing, then walks the
  * EXECUTED plan printing every operator with its populated SQL metrics
  * (output rows, codegen/agg/sort/shuffle times, bytes) — the local-mode
  * substitute for the Spark UI's SQL tab (spark.ui is off in this env).
  *
  * Usage: runMain graft.tools.ProfileQuery <sfDir> <name1,name2,...> [runs]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", "graft-profile",
      shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // task-level totals per run, via listener
    val taskMs = new java.util.concurrent.atomic.LongAdder
    val shufRec = new java.util.concurrent.atomic.LongAdder
    val shufMb = new java.util.concurrent.atomic.LongAdder
    val nTasks = new java.util.concurrent.atomic.LongAdder
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          taskMs.add(m.executorRunTime)
          shufRec.add(m.shuffleWriteMetrics.recordsWritten)
          shufMb.add(m.shuffleWriteMetrics.bytesWritten)
          nTasks.add(1)
        }
      }
    })
    @volatile var lastQe: org.apache.spark.sql.execution.QueryExecution = null
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        lastQe = qe
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    })
    def allNodes(p: SparkPlan, depth: Int): Seq[(SparkPlan, Int)] = p match {
      case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan, depth)
      case q: QueryStageExec        => allNodes(q.plan, depth)
      case other => (other, depth) +: other.children.flatMap(allNodes(_, depth + 1))
    }

    force(SparkEntry.queries("j4_daily_business_metrics")(spark, sfDir)) // warmup
    names.foreach { n =>
      (1 to runs).foreach { r =>
        taskMs.reset(); shufRec.reset(); shufMb.reset(); nTasks.reset()
        lastQe = null
        val t0 = System.nanoTime()
        force(SparkEntry.queries(n)(spark, sfDir))
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // listener-bus settle
        println(f"[profile] $n run$r wall=$wall%.3f s taskSec=${taskMs.sum() / 1000.0}%.2f " +
          f"tasks=${nTasks.sum()} shufRec=${shufRec.sum()} shufMB=${shufMb.sum() / 1048576.0}%.1f")
        if (r == runs && lastQe != null) {
          allNodes(lastQe.executedPlan, 0).foreach { case (node, d) =>
            val ms = node.metrics.toSeq
              .filter(_._2.value > 0)
              .sortBy(_._1)
              .map { case (k, m) => s"$k=${m.value}" }
            if (ms.nonEmpty)
              println("  " + ("  " * d) + node.nodeName + ": " + ms.mkString(", "))
            else
              println("  " + ("  " * d) + node.nodeName)
          }
        }
      }
    }
    spark.stop()
  }
}
