package graft.render

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.cube.CubeFrame

/** Tile rendering: value grid → RGBA → PNG (reference F3/F4/K1:
  * the numba `map_colors` kernel at xcube_server/im/tiledimage.py:638-665
  * and the PNG sink at tiledimage.py:498-504).
  *
  * Execution shape follows SURVEY §3.1: tile latency budgets make small
  * tiles a driver-local path over (cached) level data — Spark jobs are
  * for pyramid BUILDS and zonal analytics, not per-tile requests. The
  * colormap kernel itself is a tight primitive loop either way.
  */
object Render {

  /** A linear colormap over [vmin, vmax] with `palette` ARGB entries;
    * invalid cells (NaN / fill / outside valid range) are transparent —
    * the reference's map_colors semantics. */
  final case class ColorMapping(vmin: Double, vmax: Double,
                                palette: Array[Int],
                                fillValue: Option[Double] = None,
                                validMin: Option[Double] = None,
                                validMax: Option[Double] = None)

  /** Simple deterministic gradient palettes (stand-ins for matplotlib
    * colormaps, reference im/cmaps.py; alpha-ramp variants mirror the
    * `<name>_alpha` derivation at cmaps.py:133-162). */
  def gradientPalette(n: Int, from: (Int, Int, Int),
                      to: (Int, Int, Int), alphaRamp: Boolean = false): Array[Int] =
    Array.tabulate(n) { i =>
      val t = i.toDouble / (n - 1)
      def lerp(a: Int, b: Int) = (a + t * (b - a)).round.toInt & 0xff
      val alpha =
        if (!alphaRamp) 0xff
        else math.min(0xff, (2.0 * t * 0xff).round.toInt) // 0→1 over first half
      (alpha << 24) | (lerp(from._1, to._1) << 16) |
        (lerp(from._2, to._2) << 8) | lerp(from._3, to._3)
    }

  val ViridisLike: Array[Int] = gradientPalette(256, (68, 1, 84), (253, 231, 37))
  val GrayLike: Array[Int] = gradientPalette(256, (0, 0, 0), (255, 255, 255))

  /** The fused mask+normalize+palette kernel (map_colors, F3): one pass,
    * no allocation beyond the output. NaN / fill / out-of-valid-range →
    * fully transparent pixel. */
  def mapColors(values: Array[Double], m: ColorMapping): Array[Int] = {
    val n = m.palette.length
    val scale = n / (m.vmax - m.vmin)
    val out = new Array[Int](values.length)
    var i = 0
    while (i < values.length) {
      val v = values(i)
      val invalid = java.lang.Double.isNaN(v) ||
        java.lang.Double.isInfinite(v) ||
        m.fillValue.exists(_ == v) ||
        m.validMin.exists(v < _) || m.validMax.exists(v > _)
      out(i) =
        if (invalid) 0x00000000
        else {
          val idx0 = ((v - m.vmin) * scale).toInt
          val idx = if (idx0 < 0) 0 else if (idx0 >= n) n - 1 else idx0
          m.palette(idx)
        }
      i += 1
    }
    out
  }

  /** ARGB pixel array → PNG bytes (fast path — ImageIO's PNG writer at
    * default settings; reference uses compress_level=1, K1). */
  def toPng(pixels: Array[Int], width: Int, height: Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_ARGB)
    img.setRGB(0, 0, width, height, pixels, 0, width)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Render one tile from a cube: filter the tile's index window (P7),
    * collect the (tileW × tileH) cell values — absent rows are NaN
    * padding (F8 trim/pad semantics) — then colormap + PNG encode.
    * Flip-y (F7) honors inv_y grids. */
  def renderTile(cube: CubeFrame, variable: String,
                 timeValue: java.sql.Timestamp,
                 tileX: Int, tileY: Int, tileW: Int, tileH: Int,
                 mapping: ColorMapping, flipY: Boolean = false): Array[Byte] = {
    val x0 = tileX * tileW
    val y0 = tileY * tileH
    val rows = cube.df
      .filter(col("time") === lit(timeValue) &&
        col("x_idx") >= x0 && col("x_idx") < x0 + tileW &&
        col("y_idx") >= y0 && col("y_idx") < y0 + tileH)
      .select(col("y_idx"), col("x_idx"), col(variable).cast("double"))
      .collect()
    val grid = Array.fill(tileH * tileW)(Double.NaN)
    rows.foreach { r =>
      val ry = r.getInt(0) - y0
      val rx = r.getInt(1) - x0
      val py = if (flipY) tileH - 1 - ry else ry
      if (!r.isNullAt(2)) grid(py * tileW + rx) = r.getDouble(2)
    }
    toPng(mapColors(grid, mapping), tileW, tileH)
  }

  /** PNG from an already-assembled row-major value window (the direct
    * chunk-read serving path, [[graft.sources.StoreWindow]]): same
    * colormap + flip semantics as [[renderTile]], so the two paths are
    * byte-identical for the same values. */
  def renderWindow(window: Array[Double], tileW: Int, tileH: Int,
                   mapping: ColorMapping, flipY: Boolean): Array[Byte] = {
    val grid =
      if (!flipY) window
      else {
        val g = new Array[Double](window.length)
        var y = 0
        while (y < tileH) {
          System.arraycopy(window, y * tileW, g, (tileH - 1 - y) * tileW,
            tileW)
          y += 1
        }
        g
      }
    toPng(mapColors(grid, mapping), tileW, tileH)
  }

  /** Image-space antialiased 2× downsample (reference A8,
    * PilDownsamplingImage at tiledimage.py:724-754): AWT smooth scaling
    * over the rendered RGBA pixels — the pyramid path for pre-rendered
    * imagery, vs the value-space aggregation of operators.Pyramid. */
  def downsample2x(pixels: Array[Int], width: Int, height: Int): Array[Int] = {
    val src = new BufferedImage(width, height, BufferedImage.TYPE_INT_ARGB)
    src.setRGB(0, 0, width, height, pixels, 0, width)
    val w2 = (width + 1) / 2
    val h2 = (height + 1) / 2
    val dst = new BufferedImage(w2, h2, BufferedImage.TYPE_INT_ARGB)
    val g = dst.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(src, 0, 0, w2, h2, null)
    g.dispose()
    val out = new Array[Int](w2 * h2)
    dst.getRGB(0, 0, w2, h2, out, 0, w2)
    out
  }

  /** Colorbar legend PNG (reference K2, controllers/tiles.py:145-184):
    * matplotlib-ColorbarBase-style VERTICAL bar — gradient (vmax at the
    * top), tick marks with value labels, and an optional rotated
    * variable label along the right edge — drawn with AWT instead of a
    * matplotlib figure. Transparent background (fig.patch alpha 0.0,
    * tiles.py:177-178). */
  def legend(mapping: ColorMapping, label: Option[String] = None,
             width: Int = 160, height: Int = 320): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_ARGB)
    val g = img.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_TEXT_ANTIALIASING,
      java.awt.RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
    val (top, bottom) = (10, 10)
    val barX = 8
    val barW = math.max(10, width / 5)
    val barH = math.max(2, height - top - bottom)
    val n = mapping.palette.length
    var y = 0
    while (y < barH) {
      val t = 1.0 - y.toDouble / (barH - 1) // row 0 = vmax
      g.setColor(new java.awt.Color(
        mapping.palette(math.min(n - 1, (t * (n - 1)).round.toInt)), true))
      g.drawLine(barX, top + y, barX + barW - 1, top + y)
      y += 1
    }
    g.setColor(java.awt.Color.DARK_GRAY)
    g.drawRect(barX, top, barW, barH)
    g.setFont(new java.awt.Font(java.awt.Font.SANS_SERIF,
      java.awt.Font.PLAIN, 11))
    niceTicks(mapping.vmin, mapping.vmax, 5).foreach { v =>
      // vmin == vmax is a reachable query override: 0/0 = NaN would
      // pin the tick at the bar top — center the single value instead
      val range = mapping.vmax - mapping.vmin
      val t = if (range == 0.0) 0.5 else (v - mapping.vmin) / range
      val ty = top + ((1.0 - t) * barH).round.toInt
      g.drawLine(barX + barW, ty, barX + barW + 4, ty)
      g.drawString(tickLabel(v), barX + barW + 7, ty + 4)
    }
    label.foreach { l =>
      // rotated axis label along the right edge (ColorbarBase.set_label)
      val g2 = g.create().asInstanceOf[java.awt.Graphics2D]
      g2.setFont(new java.awt.Font(java.awt.Font.SANS_SERIF,
        java.awt.Font.PLAIN, 12))
      g2.rotate(math.Pi / 2, width - 6, height / 2.0)
      val fm = g2.getFontMetrics
      g2.drawString(l, width - 6 - fm.stringWidth(l) / 2, height / 2 + 4)
      g2.dispose()
    }
    g.dispose()
    val os = new ByteArrayOutputStream()
    ImageIO.write(img, "png", os)
    os.toByteArray
  }

  /** 'nice' tick values covering [vmin, vmax] (the 1-2-5 ladder
    * matplotlib's MaxNLocator uses). */
  def niceTicks(vmin: Double, vmax: Double, maxTicks: Int): Seq[Double] = {
    val range = vmax - vmin
    if (!(range > 0) || range.isInfinite) return Seq(vmin)
    val raw = range / maxTicks
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val step = Seq(1.0, 2.0, 5.0, 10.0).map(_ * mag).find(range / _ <= maxTicks)
      .getOrElse(10.0 * mag)
    val start = math.ceil(vmin / step) * step
    Iterator.iterate(start)(_ + step).takeWhile(_ <= vmax + step * 1e-9).toSeq
  }

  private[graft] def tickLabel(v: Double): String =
    if (v == v.floor && math.abs(v) < 1e7) v.toLong.toString
    else {
      // trim trailing zeros from the MANTISSA only — a blanket
      // replaceAll("0+$") on "%.4g" output corrupts exponents whose
      // last digit is 0 ("1.230e+10" -> "1.230e+1")
      val s = f"$v%.4g"
      val ei = s.indexWhere(c => c == 'e' || c == 'E')
      if (ei < 0) s.replaceAll("0+$", "").stripSuffix(".")
      else {
        val mant = s.substring(0, ei)
        val trimmed = if (mant.contains('.'))
          mant.replaceAll("0+$", "").stripSuffix(".") else mant
        trimmed + s.substring(ei)
      }
    }
}
