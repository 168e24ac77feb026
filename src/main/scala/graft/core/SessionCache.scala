package graft.core

import org.apache.spark.sql.SparkSession

/** Session-scoped in-process memo for durable-index handles (ADVICE r10:
  * the previous `ConcurrentHashMap[String, _]` keyed entries by
  * `System.identityHashCode(session)` — stopped/GC'd sessions leaked their
  * persisted frames forever, and a reused identity hash could serve frames
  * bound to a stopped SparkContext). Entries live in a
  * [[java.util.WeakHashMap]] keyed by the session OBJECT (SparkSession
  * doesn't override equals, so WeakHashMap's equals-based lookup is
  * identity — collision-proof), so a session's whole sub-map becomes
  * unreachable the moment the session object does, and a new session can
  * never alias an old one's entries.
  *
  * Persisted frames inside evicted values are reclaimed by the block
  * manager when their (stopped) context goes away; until the session object
  * is GC'd its live frames stay valid — exactly the lifetime a memo wants.
  * Compute runs inside the inner map's `computeIfAbsent`, so two threads of
  * one session racing the same key build once (same contract as before).
  */
final class SessionCache[V] {

  private val maps =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, V]]()

  private def mapFor(s: SparkSession)
      : java.util.concurrent.ConcurrentHashMap[String, V] =
    maps.synchronized {
      var m = maps.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, V]()
        maps.put(s, m)
      }
      m
    }

  def getOrCompute(s: SparkSession, key: String)(f: => V): V =
    mapFor(s).computeIfAbsent(key, _ => f)

  def put(s: SparkSession, key: String, v: V): Unit = {
    mapFor(s).put(key, v); ()
  }

  /** Test/maintenance hook: drop one session's memo so a fresh build
    * exercises the durable load path. */
  def evictSession(s: SparkSession): Unit =
    maps.synchronized { maps.remove(s); () }
}
