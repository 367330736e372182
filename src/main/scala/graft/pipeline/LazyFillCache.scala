package graft.pipeline

import java.util.concurrent.ConcurrentHashMap
import java.util.function.BiFunction

/** Read-through TTL cache with jittered expiry — the reference's
  * lazy-fill dimension cache semantics
  * (`vendor/github.com/cloudfoundry-community/firehose-to-syslog/
  * caching/caching_lazyfill.go:87-157`): `get(k)` serves the cached
  * value until its deadline passes, then calls `fill` and stores the
  * result with deadline `now + ttl * jitter`, jitter uniform in
  * [0.75, 1.25) (`:152-153`) so a fleet of entries filled together
  * does not expire — and re-fill-stampede — together.
  *
  * Where it sits in the Spark engine: dimension joins are broadcast
  * snapshots, so per-ROW lazy fill (the Go design, one process, one
  * cache) translates to per-SNAPSHOT lazy fill on the driver —
  * [[graft.streaming.StreamingPipeline.startWithDimRefresh]] consults
  * one entry per refresh decision, reloading the snapshot only when
  * the jittered TTL lapses instead of every micro-batch. The class
  * itself is generic and thread-safe (atomic per-key compute), with
  * injectable clock and jitter for determinism in tests.
  */
final class LazyFillCache[K, V](
    ttlMs: Long,
    fill: K => V,
    now: () => Long = () => System.currentTimeMillis(),
    jitter: () => Double = LazyFillCache.defaultJitter) extends Serializable {

  require(ttlMs > 0, s"ttl must be positive, got $ttlMs")

  private case class Entry(deadline: Long, value: V)
  @transient private lazy val entries = new ConcurrentHashMap[K, Entry]()

  /** Cached value, re-filled through `fill` iff absent or expired.
    * Atomic per key: concurrent readers of an expired entry compute
    * the refill once (ConcurrentHashMap.compute's per-key lock).
    */
  def get(k: K): V = {
    val t = now()
    entries.compute(k, new BiFunction[K, Entry, Entry] {
      override def apply(key: K, e: Entry): Entry =
        if (e != null && t < e.deadline) e
        else Entry(t + (ttlMs * jitter()).toLong, fill(key))
    }).value
  }

  /** Drop a key so the next [[get]] re-fills (the Go `Invalidate`). */
  def invalidate(k: K): Unit = entries.remove(k)

  def size: Int = entries.size()
}

object LazyFillCache {
  /** Uniform in [0.75, 1.25) — `caching_lazyfill.go:152-153`. */
  val JitterLo = 0.75
  val JitterHi = 1.25
  def defaultJitter: () => Double =
    () => JitterLo + (JitterHi - JitterLo) * scala.util.Random.nextDouble()
}
