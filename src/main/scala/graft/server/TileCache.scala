package graft.server

import scala.collection.mutable

/** Byte-bounded tile cache with pluggable eviction policy (reference
  * X7/U4/F17: xcube_server/cache.py:174-197 priority plug-ins — LRU /
  * MRU / LFU / RR — with byte accounting and trim-to-75% eviction,
  * cache.py:257-274, defaults.py:30).
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
    * (cache.py:361-397 trim semantics). */
  private def trim(): Unit = {
    val target = (capacityBytes * trimRatio).toLong
    while (bytes > target && entries.nonEmpty) {
      val victim = entries.minBy { case (_, e) => policy.priority(e.lastAccess,
        e.hits, e.insertedAt) }
      remove(victim._1)
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
  /** FIFO: oldest insert evicted first */
  object Fifo extends Policy { def priority(a: Long, h: Long, i: Long): Long = i }
}
