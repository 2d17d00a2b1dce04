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
  * tables until session end. The memo keys on (session, logical key) so
  * repeated invocations share one persisted copy.
  */
object PlanCache {

  private val cache = new ConcurrentHashMap[String, DataFrame]()

  def persisted(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cache.computeIfAbsent(s"${System.identityHashCode(spark)}/$key", _ =>
      build.persist(StorageLevel.MEMORY_AND_DISK))
}
