package graft

import java.util.concurrent.CountDownLatch
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.LazyFillCache

/** Lazy-fill TTL cache semantics (reference
  * `caching_lazyfill.go:87-157`): read-through, jittered deadline,
  * invalidate, and atomic per-key fill under concurrency.
  */
class LazyFillCacheSpec extends AnyFunSuite {

  test("serves the cached value within TTL; refills at the deadline") {
    var clock = 0L
    var fills = 0
    val c = new LazyFillCache[String, Int](1000, _ => { fills += 1; fills },
      () => clock, () => 1.0)
    assert(c.get("a") === 1)
    assert(c.get("a") === 1)
    clock = 999
    assert(c.get("a") === 1)   // one tick before the deadline: cached
    clock = 1000
    assert(c.get("a") === 2)   // deadline passed: refilled
    assert(fills === 2)
  }

  test("jittered deadlines stay inside [0.75, 1.25) x ttl") {
    var clock = 0L
    val fills = new AtomicInteger(0)
    val seeded = new scala.util.Random(42)
    val c = new LazyFillCache[Int, Int](1000, _ => fills.incrementAndGet(),
      () => clock,
      () => LazyFillCache.JitterLo +
        (LazyFillCache.JitterHi - LazyFillCache.JitterLo) * seeded.nextDouble())
    (0 until 100).foreach(c.get)
    assert(fills.get === 100)
    clock = 749                 // below every possible deadline (>= 750)
    (0 until 100).foreach(c.get)
    assert(fills.get === 100, "no entry may expire before 0.75 x ttl")
    clock = 1250                // at/above every possible deadline (< 1250)
    (0 until 100).foreach(c.get)
    assert(fills.get === 200, "every entry must expire by 1.25 x ttl")
  }

  test("invalidate forces a refill before the deadline") {
    var fills = 0
    val c = new LazyFillCache[String, Int](1000000, _ => { fills += 1; fills })
    assert(c.get("k") === 1)
    c.invalidate("k")
    assert(c.get("k") === 2)
  }

  test("concurrent readers of one expired key fill exactly once") {
    val fills = new AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val c = new LazyFillCache[String, Int](1000000,
      _ => { Thread.sleep(20); fills.incrementAndGet() })
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    val threads = (0 until 8).map { _ =>
      new Thread(() => { gate.await(); results.add(c.get("k")) })
    }
    threads.foreach(_.start())
    gate.countDown()
    threads.foreach(_.join(10000))
    assert(fills.get === 1)
    assert(results.size === 8)
    results.forEach(v => assert(v === 1))
  }
}
