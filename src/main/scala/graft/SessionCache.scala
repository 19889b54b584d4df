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
  * `SparkListenerApplicationEnd` is the only end signal Spark exposes).
  *
  * `onEvict` runs once per evicted VALUE on every eviction path (listener,
  * [[drop]], [[dropSession]]) — the place to release what the cached value
  * owns (unpersist a frame, delete a temp directory). Cached values backed
  * by on-disk state would otherwise outlive every eviction (ADVICE r6: the
  * IVF temp-dir leak). */
final class SessionCache[V](onEvict: V => Unit = (_: V) => ()) {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]()
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  private def evictSession(s: SparkSession): Unit = {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 eq s) { it.remove(); onEvict(e.getValue) }
    }
    hooked.remove(s)
  }

  private def hook(s: SparkSession): Unit =
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(end: SparkListenerApplicationEnd): Unit =
          evictSession(s)
      })
    }

  def getOrBuild(s: SparkSession, key: String)(build: => V): V = {
    hook(s)
    entries.computeIfAbsent((s, key), _ => build)
  }

  /** Eager single-entry eviction; `onEvict` has already run on the returned
    * value. */
  def drop(s: SparkSession, key: String): Option[V] = {
    val v = Option(entries.remove((s, key)))
    v.foreach(onEvict)
    v
  }

  /** Evict every entry of one session — the hook for servers retiring a
    * `newSession()` child while the shared context lives on (see the class
    * LIMITATION note). */
  def dropSession(s: SparkSession): Unit = evictSession(s)
}
