package graft.render

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.cube.CubeFrame
import graft.render.Render.ColorMapping

/** Distributed pyramid-tile materialization: render EVERY tile of a
  * level as one Spark job, bytes identical to the per-request
  * [[Render.renderTile]] path the HTTP server uses.
  *
  * The per-request path collects one tile's cells to the driver — right
  * for interactive serving (a 256×256 window), wrong for "pre-render
  * the whole pyramid": at 100 TB that is millions of driver round
  * trips. Here the full tile-key space (a `spark.range`, so empty
  * tiles render too) left-joins the level's cells on the tile key —
  * one hash-partitioned shuffle co-locates each tile's cells — and
  * `mapGroups` colormap+PNG-encodes on the executors. Output can stay
  * a Dataset (for a sink of choice) or be written as `z/x/y.png`
  * through the Hadoop FS API (local dir in tests, s3a/gs on a
  * cluster). */
object TileMaterialize {

  /** All tiles of one level at one time step (and, for a 4-D cube, one
    * extra-dim plane — default: the FIRST coordinate per dim, the
    * serving default): (tileX, tileY, png). Without the plane filter a
    * 4-D cube's depth planes would overlay nondeterministically
    * (last-shuffled-write-wins per pixel). */
  def renderLevel(cube: CubeFrame, variable: String,
                  timeValue: java.sql.Timestamp,
                  tileW: Int, tileH: Int, mapping: ColorMapping,
                  flipY: Boolean = false,
                  extraSel: Seq[(String, Double)] = Nil)
      : Dataset[(Int, Int, Array[Byte])] = {
    val spark = cube.df.sparkSession
    import spark.implicits._
    val sel =
      if (extraSel.nonEmpty) extraSel
      else cube.extraDims.map(d => d.name -> d.values.head)
    require(sel.map(_._1) == cube.extraDims.map(_.name),
      s"extra-dim selection ${sel.map(_._1)} must name the cube's dims " +
        s"${cube.extraDims.map(_.name)} in order")
    // values must sit ON the axis: an off-axis value would match no
    // rows and the bulk job would "succeed" writing zero tiles (the
    // per-request path nearest-snaps; a batch job misconfiguration
    // should fail loudly instead)
    sel.zip(cube.extraDims).foreach { case ((n, v), ed) =>
      require(ed.values.contains(v),
        s"$n=$v is not on the axis ${ed.values.mkString("[", ", ", "]")}")
    }
    val ntx = (cube.grid.width + tileW - 1) / tileW
    val nty = (cube.grid.height + tileH - 1) / tileH
    // the colormap kernel runs MAP-SIDE as a codegen expression
    // (ColorMapArgb fuses mask+normalize+palette into the scan
    // projection, SURVEY X8): the shuffle carries one int per cell
    // instead of a double re-kerneled per tile in a closure, and the
    // post-shuffle closure only places pixels and PNG-encodes
    val cells = sel.foldLeft(cube.df.filter(col("time") === lit(timeValue))) {
        case (df, (n, v)) => df.filter(col(n) === lit(v))
      }
      .select((col("x_idx") / tileW).cast("int").as("tx"),
        (col("y_idx") / tileH).cast("int").as("ty"),
        col("y_idx"), col("x_idx"),
        graft.functions.ColorMapArgb(col(variable), mapping).as("argb"))
    // full key space via range: tiles with no cells must still render
    // (the per-request path serves them as all-NaN tiles)
    val keys = spark.range(ntx.toLong * nty)
      .select((col("id") % ntx).cast("int").as("tx"),
        (col("id") / ntx).cast("int").as("ty"))
    keys.join(cells, Seq("tx", "ty"), "left_outer")
      .groupByKey(r => (r.getInt(0), r.getInt(1)))
      .mapGroups { (key: (Int, Int), rows: Iterator[org.apache.spark.sql.Row]) =>
        val (tx, ty) = key
        val pixels = new Array[Int](tileH * tileW) // 0 = transparent,
        // exactly what mapColors yields for the NaN padding
        rows.foreach { r =>
          if (!r.isNullAt(2)) {
            val ry = r.getInt(2) - ty * tileH
            val rx = r.getInt(3) - tx * tileW
            val py = if (flipY) tileH - 1 - ry else ry
            pixels(py * tileW + rx) = r.getInt(4)
          }
        }
        (tx, ty, Render.toPng(pixels, tileW, tileH))
      }
  }

  /** Materialize a level to `<outDir>/<z>/<x>/<y>.png` through the
    * Hadoop FS API — executor-side writes, no driver fan-in. Returns
    * the tile count. */
  def writeLevel(cube: CubeFrame, variable: String,
                 timeValue: java.sql.Timestamp, z: Int, outDir: String,
                 tileW: Int, tileH: Int, mapping: ColorMapping,
                 flipY: Boolean = false,
                 extraSel: Seq[(String, Double)] = Nil): Long = {
    val tiles = renderLevel(cube, variable, timeValue, tileW, tileH,
      mapping, flipY, extraSel)
    val spark = tiles.sparkSession
    val confSer = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val written = spark.sparkContext.longAccumulator("tiles_written")
    tiles.foreachPartition {
      (it: Iterator[(Int, Int, Array[Byte])]) =>
        val conf = confSer.value
        it.foreach { case (tx, ty, png) =>
          val p = new org.apache.hadoop.fs.Path(s"$outDir/$z/$tx/$ty.png")
          val fs = p.getFileSystem(conf)
          val out = fs.create(p, true)
          try out.write(png) finally out.close()
          written.add(1L)
        }
    }
    written.value
  }
}
