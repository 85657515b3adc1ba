package graft.server

import scala.collection.mutable

/** Byte-bounded tile cache with pluggable eviction policy (reference
  * X7/U4/F17: xcube_server/cache.py:174-197 priority plug-ins — LRU /
  * MRU / LFU / RR, all four reproduced, plus a beyond-ref FIFO — with
  * byte accounting and trim-to-75% eviction, cache.py:257-274,
  * defaults.py:30).
  *
  * Driver-side concurrency: coarse lock (tile encode dominates cost).
  */
class TileCache(capacityBytes: Long,
                policy: TileCache.Policy = TileCache.Lru,
                trimRatio: Double = 0.75) {

  private final case class Entry(value: Array[Byte], var lastAccess: Long,
                                 var hits: Long, insertedAt: Long)
  private val entries = mutable.LinkedHashMap.empty[String, Entry]
  private var bytes = 0L
  private var tick = 0L

  def get(key: String): Option[Array[Byte]] = synchronized {
    entries.get(key).map { e =>
      tick += 1
      e.lastAccess = tick
      e.hits += 1
      e.value
    }
  }

  def put(key: String, value: Array[Byte]): Unit = synchronized {
    remove(key)
    tick += 1
    entries.put(key, Entry(value, tick, 0, tick))
    bytes += value.length
    if (bytes > capacityBytes) trim()
  }

  def sizeBytes: Long = synchronized(bytes)
  def size: Int = synchronized(entries.size)

  /** drop everything (dataset registry changed — cached tiles may
    * render data that no longer exists) */
  def clear(): Unit = synchronized { entries.clear(); bytes = 0L }

  private def remove(key: String): Unit =
    entries.remove(key).foreach(e => bytes -= e.value.length)

  /** evict lowest-priority entries until under trimRatio × capacity
    * (cache.py:361-397 trim semantics). One stable sort per trim burst
    * (O(n log n)) instead of an O(n) minBy per eviction: priorities
    * cannot change mid-trim (the lock is held, so no accesses), and the
    * stable sort over insertion-ordered entries breaks priority ties in
    * insertion order — exactly what minBy's first-encounter did. */
  private def trim(): Unit = {
    val target = (capacityBytes * trimRatio).toLong
    if (bytes > target) {
      val victims = entries.toSeq.sortBy { case (_, e) =>
        policy.priority(e.lastAccess, e.hits, e.insertedAt) }.iterator
      while (bytes > target && victims.hasNext) remove(victims.next()._1)
    }
  }
}

object TileCache {
  /** Higher priority = kept longer. */
  trait Policy { def priority(lastAccess: Long, hits: Long, insertedAt: Long): Long }
  /** least-recently-used evicted first */
  object Lru extends Policy { def priority(a: Long, h: Long, i: Long): Long = a }
  /** most-recently-used evicted first */
  object Mru extends Policy { def priority(a: Long, h: Long, i: Long): Long = -a }
  /** least-frequently-used evicted first */
  object Lfu extends Policy { def priority(a: Long, h: Long, i: Long): Long = h }
  /** FIFO: oldest insert evicted first (beyond-ref; a saner stand-in
    * for RR when deterministic eviction is wanted) */
  object Fifo extends Policy { def priority(a: Long, h: Long, i: Long): Long = i }
  /** The reference's 'random replacement', kept bug-for-bug: its
    * priority is literally the access-count PARITY (cache.py:186-187
    * `item.access_count % 2`), so even-hit-count entries evict first —
    * not actually random, but it is what POLICY_RR ships. */
  object Rr extends Policy { def priority(a: Long, h: Long, i: Long): Long = h % 2 }
}
