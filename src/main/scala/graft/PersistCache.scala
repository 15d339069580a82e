package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}

/** Session-scoped memo registry for expensive persisted frames (simhash
  * pair graphs, component labels, PQ code tables): operators that share
  * an intermediate register it here so it is built and persisted ONCE
  * per (session, dataset) instead of once per build() call — repeated
  * builds (Verify + specs + Bench in one JVM, interactive iteration)
  * would otherwise accumulate MEMORY_AND_DISK entries with no owner.
  *
  * Eviction: one listener per SparkContext clears every session slot
  * attached to that context when the application ends. Sessions
  * discarded mid-flight on a still-running shared context (newSession()
  * pools) are NOT collected automatically — Spark has no session-end
  * callback — so long-lived multi-session services should call
  * `invalidate(session)` when retiring a session.
  */
object PersistCache {

  private val slots =
    new java.util.concurrent.ConcurrentHashMap[SparkSession,
      scala.collection.concurrent.TrieMap[String, DataFrame]]()
  private val hookedContexts =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[SparkContext, java.lang.Boolean]())

  private def hookContext(sc: SparkContext): Unit =
    if (hookedContexts.add(sc))
      sc.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit = {
          val it = slots.keySet().iterator()
          while (it.hasNext) if (it.next().sparkContext eq sc) it.remove()
          hookedContexts.remove(sc)
        }
      })

  /** Memoized build: returns the cached frame for (session, key) or runs
    * `build` (which should persist its result) and caches it.
    */
  def getOrElseUpdate(spark: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    val perSession = slots.computeIfAbsent(spark, { s =>
      hookContext(s.sparkContext)
      scala.collection.concurrent.TrieMap.empty[String, DataFrame]
    })
    perSession.getOrElseUpdate(key, build)
  }

  /** Drop (and unpersist) everything cached for a session — for services
    * that retire sessions while the underlying context keeps running.
    */
  def invalidate(spark: SparkSession): Unit = {
    val m = slots.remove(spark)
    if (m != null) m.values.foreach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => () }
    }
  }
}
