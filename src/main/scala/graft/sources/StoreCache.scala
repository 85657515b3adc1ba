package graft.sources

import scala.collection.concurrent.TrieMap

/** Serving-path caches for direct (no-Spark-job) store reads.
  *
  * [[StoreWindow]] originally called `StoreOps.forPath` + decoded the
  * time axis on EVERY tile request — for an HDF5 store that re-parses
  * the whole file header per request, undercutting the fast path's
  * latency goal. Three tiers, all driver/serving-thread side (executors
  * never see this object):
  *
  *  1. memoized [[StoreOps]] instances per store path (an `Hdf5Ops`
  *     parses its header once, lazily);
  *  2. the DECODED time axis per store (CF units arithmetic done once),
  *     with binary search for the request's time step;
  *  3. a byte-bounded LRU of DECODED chunks keyed (store, variable,
  *     chunk index) — the blob LRU under it caches compressed bytes,
  *     so before this cache a hot tile crossing several chunks paid
  *     decompress + mask-and-scale on every PNG-cache miss.
  *
  * Writers and config reloads call [[invalidate]]/[[clear]] (wired into
  * `ZarrStore.invalidateMeta` and `BlobStore.dropAll`), so a reload
  * re-observes the world like the blob seam does.
  */
private[graft] object StoreCache {

  private val opsMap = TrieMap.empty[String, StoreOps]
  // (decoded epoch-us axis, is-ascending) — ascending axes (the CF
  // norm) binary-search; anything else falls back to a linear scan
  private val axisMap = TrieMap.empty[String, (Array[Long], Boolean)]

  private val chunkCapacityBytes: Long =
    sys.props.getOrElse("graft.chunkCache.mb", "256").toLong << 20

  private final case class ChunkKey(path: String, variable: String,
                                    idx: Seq[Int])
  /** decoded tile windows of the parquet serving path — the parquet
    * analogue of a decoded chunk (its natural decode unit IS the tile
    * block), sharing one byte budget + LRU order with chunks */
  private final case class WindowKey(path: String, variable: String,
                                     timeUs: Long, y0: Int, x0: Int,
                                     h: Int, w: Int,
                                     extra: Seq[(String, Double)])
  private val chunkMap =
    new java.util.LinkedHashMap[AnyRef, Array[Double]](256, 0.75f, true)
  private var chunkBytes = 0L

  private def keyPath(k: AnyRef): String = k match {
    case c: ChunkKey => c.path
    case w: WindowKey => w.path
  }

  def ops(path: String): StoreOps =
    opsMap.getOrElseUpdate(path, StoreOps.forPath(path))

  /** decoded time axis, cached; (values, ascending) */
  def timeAxis(path: String): (Array[Long], Boolean) =
    axisMap.getOrElseUpdate(path, {
      val ax = ops(path).read1dLongs("time")
      var asc = true
      var i = 1
      while (i < ax.length) { if (ax(i) <= ax(i - 1)) asc = false; i += 1 }
      (ax, asc)
    })

  /** index of `timeUs` on the cached axis, -1 when absent */
  def timeIndex(path: String, timeUs: Long): Int = {
    val (ax, asc) = timeAxis(path)
    if (asc) {
      val i = java.util.Arrays.binarySearch(ax, timeUs)
      if (i >= 0) i else -1
    } else ax.indexOf(timeUs)
  }

  /** decoded chunk through the byte-bounded LRU; duplicate concurrent
    * loads are possible and harmless (last write wins) */
  def chunk(path: String, variable: String, meta: ZarrStore.ArrayMeta,
            idx: Seq[Int]): Array[Double] =
    cached(ChunkKey(path, variable, idx))(
      ops(path).readChunk(variable, meta, idx)).get

  /** decoded parquet tile window through the same LRU (consumers treat
    * the returned array as read-only — the renderer only reads) */
  def window(path: String, variable: String, timeUs: Long, y0: Int,
             x0: Int, h: Int, w: Int,
             extra: Seq[(String, Double)] = Nil)
            (load: => Option[Array[Double]]): Option[Array[Double]] =
    cached(WindowKey(path, variable, timeUs, y0, x0, h, w, extra))(
      load.orNull)

  private def cached(key: AnyRef)
                    (load: => Array[Double]): Option[Array[Double]] = {
    chunkMap.synchronized {
      val hit = chunkMap.get(key)
      if (hit != null) return Some(hit)
    }
    val data = load
    if (data == null) return None
    chunkMap.synchronized {
      if (!chunkMap.containsKey(key)) {
        chunkMap.put(key, data)
        chunkBytes += data.length * 8L
        while (chunkBytes > chunkCapacityBytes && chunkMap.size > 1) {
          val it = chunkMap.entrySet().iterator()
          val eldest = it.next()
          chunkBytes -= eldest.getValue.length * 8L
          it.remove()
        }
      }
    }
    Some(data)
  }

  private[graft] def cachedChunkBytes: Long =
    chunkMap.synchronized(chunkBytes)

  /** drop everything cached under one store path (writers re-writing a
    * fixture, metadata invalidation hooks). This is THE invalidation
    * seam — every format-level cache hangs off it, so a caller that
    * invalidates a store never keeps reading stale parsed headers,
    * chunk indexes or consolidated metadata from a format cache the
    * seam forgot (the round-17 review found Hdf5's and ZarrStore's
    * caches surviving it). */
  def invalidate(path: String): Unit = {
    opsMap.remove(path)
    axisMap.remove(path)
    chunkMap.synchronized {
      val it = chunkMap.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (keyPath(e.getKey) == path) {
          chunkBytes -= e.getValue.length * 8L
          it.remove()
        }
      }
    }
    ParquetWindow.invalidate(path)
    Hdf5.invalidateUnder(path)
    ZarrStore.invalidateMetaUnder(path)
  }

  def clear(): Unit = {
    opsMap.clear()
    axisMap.clear()
    chunkMap.synchronized { chunkMap.clear(); chunkBytes = 0L }
    ParquetWindow.clear()
    Hdf5.clearCaches()
    ZarrStore.clearMetaCaches()
  }
}
