package graft

import java.sql.Timestamp

import graft.cube.{CubeFrame, CubeGrid}
import graft.render.Render
import graft.render.Render.ColorMapping

class RenderSpec extends SparkSpec {

  test("map_colors kernel: invalid → transparent, linear bucketing (F3)") {
    val m = ColorMapping(0.0, 10.0, Render.GrayLike,
      fillValue = Some(-1.0), validMax = Some(9.5))
    val px = Render.mapColors(
      Array(0.0, 5.0, 10.0, Double.NaN, -1.0, 99.0), m)
    assert(px(3) == 0 && px(4) == 0 && px(5) == 0) // NaN, fill, > validMax
    assert((px(0) >>> 24) == 0xff)                  // opaque
    assert((px(0) & 0xff) == 0)                     // black at vmin
    assert((px(1) & 0xff) == 128)                   // mid-gray at half
  }

  test("alpha-ramp palette derivation (cmaps.py:133-162)") {
    val p = Render.gradientPalette(256, (0, 0, 0), (255, 255, 255),
      alphaRamp = true)
    assert((p(0) >>> 24) == 0)
    assert((p(255) >>> 24) == 0xff)
    assert((p(128) >>> 24) == 0xff) // saturated by half-way
  }

  test("PNG encode emits valid PNG bytes (K1)") {
    val png = Render.toPng(Array.fill(16 * 16)(0xff00ff00), 16, 16)
    assert(png.take(8).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte,
      'G'.toByte, 0x0d.toByte, 0x0a.toByte, 0x1a.toByte, 0x0a.toByte))
  }

  test("tile render end-to-end: window, NaN padding, flip") {
    import spark.implicits._
    val grid = CubeGrid(4, 4, 0.0, 0.0, 1.0, latAscending = true)
    val t0 = Timestamp.valueOf("2017-01-01 00:00:00")
    // only half the tile has data — the rest must become transparent
    val rows = for { y <- 0 until 2; x <- 0 until 4 }
      yield (t0, y, x, grid.latOfY(y), grid.lonOfX(x), (y * 4 + x).toDouble)
    val cube = CubeFrame(rows.toDF("time", "y_idx", "x_idx", "lat", "lon", "v"),
      grid, Seq("v"))
    val png = Render.renderTile(cube, "v", t0, tileX = 0, tileY = 0,
      tileW = 4, tileH = 4, ColorMapping(0.0, 16.0, Render.ViridisLike))
    assert(png.length > 50)
    val legend = Render.legend(ColorMapping(0.0, 16.0, Render.ViridisLike))
    assert(legend.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
  }
}
