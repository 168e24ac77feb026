package graft.core

import org.apache.spark.sql.SparkSession

/** Session-scoped in-process memo for durable-index handles (ADVICE r10:
  * the previous `ConcurrentHashMap[String, _]` keyed entries by
  * `System.identityHashCode(session)` — stopped/GC'd sessions leaked their
  * persisted frames forever, and a reused identity hash could serve frames
  * bound to a stopped SparkContext). Entries live in a
  * [[java.util.WeakHashMap]] keyed by the session OBJECT (SparkSession
  * doesn't override equals, so WeakHashMap's equals-based lookup is
  * identity — collision-proof), so a new session can never alias an old
  * one's entries.
  *
  * Lifecycle honesty: cached values hold DataFrames, every Dataset holds
  * its SparkSession, and WeakHashMap references VALUES strongly — so an
  * entry's value pins its own weak key and GC alone does NOT reclaim a
  * stopped session's sub-map (the WeakHashMap javadoc's value→key
  * warning). Reclamation is therefore EXPLICIT: [[evictSession]] removes
  * the sub-map and runs the cache owner's `release` callback on every
  * evicted value (unpersisting its frames out of the shared CacheManager,
  * which would otherwise pin them until context stop). Long-lived drivers
  * cycling many sessions should evict each session when done with it;
  * everything is reclaimed at the latest when the SparkContext stops.
  * Compute runs inside the inner map's `computeIfAbsent`, so two threads
  * of one session racing the same key build once (same contract as
  * before).
  *
  * @param release eviction callback, run on every value leaving the cache.
  *   CONTRACT: MUST be idempotent (ADVICE r12) — in the narrow window
  *   where [[evictSession]]'s iteration and [[getOrCompute]]'s
  *   post-insert orphan re-check both see the same value, `release` runs
  *   twice on it by design. `Dataset.unpersist` (the only callback in the
  *   tree today) is; a future owner wiring a non-idempotent reclaim
  *   (close(), free()) must dedupe inside its own callback. */
final class SessionCache[V](release: V => Unit = (_: V) => ()) {

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

  /** Memoized fetch. Closes the evict race (VERDICT r11 task 7): a compute
    * in flight while [[evictSession]] runs used to insert its value into
    * the now-orphaned inner map, leaking its persisted frames into the
    * shared CacheManager with no release ever seeing them. After the
    * insert, membership is re-checked under the SAME lock eviction uses —
    * if this session is no longer mapped to the map we inserted into, the
    * value is taken back out and released (the caller still gets a fully
    * usable handle; its frames just recompute instead of serving from
    * cache, which is exactly what eviction asks for). In the narrow window
    * where eviction's iteration and this re-check both see the value,
    * `release` can run twice — the callback contract is therefore
    * IDEMPOTENT release (unpersist is). */
  def getOrCompute(s: SparkSession, key: String)(f: => V): V = {
    val m = mapFor(s)
    val v = m.computeIfAbsent(key, _ => f)
    val orphaned = maps.synchronized(maps.get(s) ne m)
    if (orphaned && m.remove(key, v)) {
      try release(v)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    v
  }

  def put(s: SparkSession, key: String, v: V): Unit = {
    mapFor(s).put(key, v); ()
  }

  /** Test/maintenance hook: drop one session's memo — running `release`
    * on every evicted value so their persisted frames leave the shared
    * CacheManager — so a fresh build exercises the durable load path.
    * In-flight computes self-release on completion (see [[getOrCompute]]),
    * so no value survives eviction un-released. */
  def evictSession(s: SparkSession): Unit = {
    val evicted = maps.synchronized(Option(maps.remove(s)))
    evicted.foreach { m =>
      m.values().forEach { v =>
        try release(v)
        catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }
}
