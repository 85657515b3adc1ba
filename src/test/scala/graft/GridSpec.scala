package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.geo.Geo.BBox
import graft.grid.TileGrid

/** Golden values ported from the reference suite
  * (test/im/test_tilegrid.py:57-85) plus search invariants over a
  * deterministic sample of sizes. */
class GridSpec extends AnyFunSuite {

  private val Global = BBox(-180, -90, 180, 90)

  test("CCI dataset shapes reproduce reference tile grids") {
    assert(TileGrid.create(1440, 720, Some(500), Some(500), Global) ==
      TileGrid(2, 2, 1, 360, 360, Global))
    assert(TileGrid.create(7200, 3600, Some(500), Some(500), Global) ==
      TileGrid(4, 2, 1, 450, 450, Global))
    assert(TileGrid.create(720, 360, Some(500), Some(500), Global, invY = true) ==
      TileGrid(1, 2, 1, 360, 360, Global, invY = true))
    assert(TileGrid.create(8640, 4320, Some(500), Some(500), Global, invY = true) ==
      TileGrid(4, 2, 1, 540, 540, Global, invY = true))
    assert(TileGrid.create(129600, 64800, Some(500), Some(500), Global) ==
      TileGrid(6, 6, 3, 675, 675, Global))
  }

  test("subset shapes, incl. padded-extent adjustment") {
    assert(TileGrid.create(52, 36, Some(500), Some(500), BBox(72, 8, 85, 17)) ==
      TileGrid(1, 1, 1, 52, 36, BBox(72, 8, 85, 17)))
    assert(TileGrid.create(4000, 3000, Some(500), Some(500),
      BBox(-20, 10, 60, 70), invY = true) ==
      TileGrid(4, 1, 1, 500, 375, BBox(-20, 10, 60, 70), invY = true))
    val padded = TileGrid.create(4012, 3009, Some(500), Some(500),
      BBox(-20, 10, 60, 70), invY = true)
    assert(padded == TileGrid(2, 3, 5, 669, 301,
      BBox(-20.0, 9.980059820538386, 60.03988035892323, 70.0), invY = true))
  }

  test("demo cube grid (FIXTURES.md §1): 2000x1000 at 250-chunk") {
    val g = TileGrid.create(2000, 1000, Some(250), Some(250),
      BBox(0.0, 50.0, 5.0, 52.5))
    assert(g == TileGrid(3, 2, 1, 250, 250, BBox(0.0, 50.0, 5.0, 52.5)))
  }

  test("1d subdivision invariants (GE mode) over sampled sizes") {
    val rnd = new scala.util.Random(42)
    (1 to 300).foreach { _ =>
      val s = 2 + rnd.nextInt(30000)
      val sub = TileGrid.pow2Subdivision1d(s, TileGrid.ModeGe, tsOpt = Some(256))
      assert(sub.sMax >= s, s"s=$s")
      assert(sub.sMax == (1 << (sub.nl - 1)).toLong * sub.nt0 * sub.ts, s"s=$s")
      assert(sub.nl <= 16 && sub.nt0 <= 8, s"s=$s")
    }
  }

  test("level size recurrence (n+1)/2") {
    assert(TileGrid.levelSizes(2000, 1000, 3) ==
      Seq((2000, 1000), (1000, 500), (500, 250)))
    assert(TileGrid.levelSizes(5, 5, 3) == Seq((5, 5), (3, 3), (2, 2)))
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val n = 1 + rnd.nextInt(100000)
      val sizes = TileGrid.levelSizes(n, n, 1 + rnd.nextInt(16))
      sizes.sliding(2).foreach {
        case Seq((a, _), (b, _)) => assert(b == (a + 1) / 2)
        case _ =>
      }
    }
  }
}
