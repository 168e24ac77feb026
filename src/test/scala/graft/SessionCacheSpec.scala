package graft

import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import graft.core.SessionCache

/** The session-scoped index-handle memo: the evict/getOrCompute race
  * (VERDICT r11 task 7 — previously documented-as-accepted). A compute in
  * flight while evictSession runs must NOT leak its value: the value is
  * released on completion and the orphaned map never serves it. */
class SessionCacheSpec extends AnyFunSuite {
  lazy val spark = graft.core.Sessions.local(2, "sessioncache-spec")

  test("evictSession mid-compute: the in-flight value is released, never leaked") {
    val released = new ConcurrentLinkedQueue[String]()
    val cache = new SessionCache[String](v => { released.add(v); () })
    val s = spark.newSession()
    val computeEntered = new CountDownLatch(1)
    val evictDone = new CountDownLatch(1)
    @volatile var got: String = null
    val t = new Thread(() => {
      got = cache.getOrCompute(s, "k") {
        computeEntered.countDown()
        evictDone.await() // latch-forced interleaving: eviction runs NOW
        "value1"
      }
    })
    t.start()
    computeEntered.await()
    cache.evictSession(s) // the compute is in flight — nothing to release yet
    evictDone.countDown()
    t.join()
    // the caller still gets a usable handle ...
    assert(got == "value1")
    // ... but the value did not survive eviction un-released
    assert(released.asScala.toSeq == Seq("value1"),
      s"in-flight value must be released on completion: $released")
    // and a later fetch recomputes instead of serving the orphaned value
    var recomputed = false
    assert(cache.getOrCompute(s, "k") { recomputed = true; "value2" } == "value2")
    assert(recomputed, "the evicted session's memo must not resurrect")
  }

  test("eviction after a completed compute releases exactly the cached values") {
    val released = new ConcurrentLinkedQueue[String]()
    val cache = new SessionCache[String](v => { released.add(v); () })
    val s = spark.newSession()
    assert(cache.getOrCompute(s, "a")("va") == "va")
    assert(cache.getOrCompute(s, "b")("vb") == "vb")
    assert(cache.getOrCompute(s, "a")(fail("memo must serve the hit")) == "va")
    cache.evictSession(s)
    assert(released.asScala.toSeq.sorted == Seq("va", "vb"))
    // double eviction is a no-op
    cache.evictSession(s)
    assert(released.size == 2)
  }

  test("sessions are isolated: eviction of one never releases another's values") {
    val released = new ConcurrentLinkedQueue[String]()
    val cache = new SessionCache[String](v => { released.add(v); () })
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    cache.getOrCompute(s1, "k")("one")
    cache.getOrCompute(s2, "k")("two")
    cache.evictSession(s1)
    assert(released.asScala.toSeq == Seq("one"))
    assert(cache.getOrCompute(s2, "k")(fail("s2's memo must survive")) == "two")
  }
}
