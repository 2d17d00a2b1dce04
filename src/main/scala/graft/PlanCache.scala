package graft

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped persisted-plan memo.
  *
  * Operators that persist an intermediate (minhash signatures, simhash
  * tables, shingle indexes) would otherwise create a NEW cached copy on
  * every invocation — Verify/Bench run each query repeatedly in one
  * session, and the block manager would accumulate identical cached
  * tables until session end. The memo keys on the session OBJECT via a
  * weak reference (not an identity hash, which could collide after GC and
  * hand a new session a DataFrame bound to a dead one): entries become
  * collectable with their session, and `clear` evicts a session's entries
  * eagerly (called from Verify/Bench teardown).
  */
object PlanCache {

  // weak keys: a stopped, dereferenced session's entries vanish with it
  private val sessions =
    new java.util.WeakHashMap[SparkSession, ConcurrentHashMap[String, DataFrame]]()

  private def tableFor(spark: SparkSession): ConcurrentHashMap[String, DataFrame] =
    sessions.synchronized {
      var t = sessions.get(spark)
      if (t == null) { t = new ConcurrentHashMap[String, DataFrame](); sessions.put(spark, t) }
      t
    }

  def persisted(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    tableFor(spark).computeIfAbsent(key, _ =>
      build.persist(StorageLevel.MEMORY_AND_DISK))

  /** Unpersist and drop every entry belonging to `spark`. Safe to call on
    * a stopped session (unpersist becomes a no-op).
    */
  def clear(spark: SparkSession): Unit = {
    val t = sessions.synchronized(sessions.remove(spark))
    if (t != null) t.values().forEach { df =>
      try df.unpersist(blocking = false)
      catch { case _: Exception => () }
    }
  }
}
