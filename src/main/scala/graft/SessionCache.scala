package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.SparkSession

/** Session-scoped memo for build-once artifacts (bucketed tables, inverted
  * index dirs, IVF/PQ indexes). A plain static ConcurrentHashMap keyed by
  * SparkSession pins every stopped session (and whatever the cached value
  * references) forever in a long-lived JVM; this one registers a listener
  * per session that evicts all of that session's entries when its context
  * ends, so stopped sessions become collectable. `drop` lets callers evict
  * eagerly (e.g. after unpersisting an index).
  *
  * LIMITATION (documented, by design): Spark emits no per-session lifecycle
  * event, so sessions created with `newSession()` over a SHARED long-lived
  * SparkContext are only evicted when the whole application ends — a server
  * that churns through thousands of short-lived child sessions must call
  * [[dropSession]] when it retires one (there is nothing to hook instead:
  * `SparkListenerApplicationEnd` is the only end signal Spark exposes). */
final class SessionCache[V] {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]()
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  private def hook(s: SparkSession): Unit =
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit = {
          entries.keySet.removeIf(_._1 eq s)
          hooked.remove(s)
        }
      })
    }

  def getOrBuild(s: SparkSession, key: String)(build: => V): V = {
    hook(s)
    entries.computeIfAbsent((s, key), _ => build)
  }

  def drop(s: SparkSession, key: String): Option[V] =
    Option(entries.remove((s, key)))

  /** Evict every entry of one session — the hook for servers retiring a
    * `newSession()` child while the shared context lives on (see the class
    * LIMITATION note). */
  def dropSession(s: SparkSession): Unit = {
    entries.keySet.removeIf(_._1 eq s)
    hooked.remove(s)
  }
}
