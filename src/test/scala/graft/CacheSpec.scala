package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.render.Render
import graft.server.TileCache

class CacheSpec extends AnyFunSuite {

  private def bytes(n: Int): Array[Byte] = Array.fill(n)(1.toByte)

  test("LRU evicts least-recently-used, trims to 75%") {
    val c = new TileCache(1000, TileCache.Lru)
    (1 to 10).foreach(i => c.put(s"k$i", bytes(100))) // exactly at capacity
    assert(c.size == 10)
    c.get("k1") // refresh k1
    c.put("k11", bytes(100)) // overflow → trim to ≤750
    assert(c.sizeBytes <= 750)
    assert(c.get("k1").isDefined)   // refreshed survives
    assert(c.get("k2").isEmpty)     // oldest unaccessed evicted
  }

  test("LFU keeps frequently-hit entries") {
    val c = new TileCache(1000, TileCache.Lfu)
    (1 to 10).foreach(i => c.put(s"k$i", bytes(100)))
    (1 to 5).foreach(_ => c.get("k3"))
    c.put("k11", bytes(100))
    assert(c.get("k3").isDefined)
  }

  test("FIFO evicts oldest inserts regardless of access") {
    val c = new TileCache(1000, TileCache.Fifo)
    (1 to 10).foreach(i => c.put(s"k$i", bytes(100)))
    (1 to 5).foreach(_ => c.get("k1"))
    c.put("k11", bytes(100))
    assert(c.get("k1").isEmpty) // oldest insert evicted despite hits
  }

  test("RR (reference parity): priority is access-count parity — " +
      "even-hit entries evict first, odd-hit entries survive") {
    val c = new TileCache(1000, TileCache.Rr)
    (1 to 10).foreach(i => c.put(s"k$i", bytes(100)))
    c.get("k5") // k5: 1 hit → priority 1; everything else 0
    c.put("k11", bytes(100)) // overflow → trim to ≤750: evict 4 of the 0s
    assert(c.sizeBytes <= 750)
    assert(c.get("k5").isDefined, "odd-hit-count entry must survive")
    // ties among priority-0 entries break in insertion order
    assert(c.get("k1").isEmpty && c.get("k2").isEmpty)
  }

  test("trim evicts in one sorted burst with stable insertion-order ties") {
    val c = new TileCache(1000, TileCache.Lfu)
    (1 to 10).foreach(i => c.put(s"k$i", bytes(100)))
    c.put("big", bytes(400)) // forces a multi-eviction burst (1400 → ≤750)
    assert(c.sizeBytes <= 750)
    // zero-hit ties: k1..k7 (earliest inserts) go first, later ones stay
    assert(c.get("k1").isEmpty && c.get("k7").isEmpty)
    assert(c.get("k8").isDefined && c.get("big").isDefined)
  }

  test("clear() drops all entries and byte accounting (hot reload)") {
    val c = new graft.server.TileCache(1024)
    c.put("a", Array.fill(100)(1.toByte))
    c.put("b", Array.fill(100)(2.toByte))
    assert(c.size == 2 && c.sizeBytes == 200)
    c.clear()
    assert(c.size == 0 && c.sizeBytes == 0)
    assert(c.get("a").isEmpty)
    c.put("c", Array.fill(10)(3.toByte)) // still usable after clear
    assert(c.get("c").isDefined)
  }

  test("image-space 2x antialias downsample (A8)") {
    // 4x4 checkerboard of opaque black/white → 2x2 mid-gray-ish blend
    val px = Array.tabulate(16)(i =>
      if ((i % 4 + i / 4) % 2 == 0) 0xff000000 else 0xffffffff)
    val down = Render.downsample2x(px, 4, 4)
    assert(down.length == 4)
    down.foreach { p =>
      assert((p >>> 24) == 0xff)
      val r = (p >> 16) & 0xff
      assert(r > 30 && r < 230, s"expected blended gray, got $r") // blended
    }
    // odd size → (n+1)/2
    assert(Render.downsample2x(Array.fill(15)(0xff000000), 5, 3).length == 3 * 2)
  }
}
