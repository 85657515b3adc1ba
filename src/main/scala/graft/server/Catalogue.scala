package graft.server

import graft.grid.TileGrid

/** Dataset catalogue responses (reference §3.3 JSON surface:
  * get_datasets/get_dataset at xcube_server/controllers/catalogue.py:
  * 13-111 — id/title/bbox/variables with dtype+colormap/dimensions with
  * coordinate dumps). Driver-side metadata projection; the only cluster
  * work is the tiny distinct-coordinate scans, already cached on the
  * CubeFrame's grid.
  */
object Catalogue {

  def datasetsJson(ctx: ServiceContext): String =
    Json.obj("datasets" -> Json.arr(ctx.datasetIds.flatMap(ctx.dataset).map {
      ds => datasetSummaryJson(ds)
    }))

  def datasetSummaryJson(ds: RegisteredDataset): String = {
    val b = ds.cube.grid.bbox
    Json.obj(
      "id" -> Json.str(ds.id),
      "title" -> Json.str(ds.title),
      "bbox" -> Json.arr(Seq(b.xMin, b.yMin, b.xMax, b.yMax).map(Json.num)))
  }

  def datasetJson(ds: RegisteredDataset,
                  groupTitles: Map[String, String] = Map.empty): String = {
    val g = ds.cube.grid
    val b = g.bbox
    val grid = ds.tileGrid
    // var-dim order: time, <extra non-spatial dims>, lat, lon
    val dimNames = Seq("time") ++ ds.cube.extraDims.map(_.name) ++
      Seq("lat", "lon")
    val variables = ds.cube.variables.map { v =>
      val cm = ds.style.flatMap(_.colorMappings.get(v))
      Json.obj(
        "id" -> Json.str(v),
        "name" -> Json.str(v),
        "dims" -> Json.arr(dimNames.map(Json.str)),
        "dtype" -> Json.str("float64"),
        // unstyled default = the reference's DEFAULT_CMAP_CBAR
        // (defaults.py:36) — and the SAME default the tile/legend
        // render path uses, so the advertised colorbar is the
        // rendered one
        "colorBarName" -> Json.str(cm.map(_.colorBar).getOrElse("jet")),
        "colorBarMin" -> Json.num(cm.map(_.valueRange._1).getOrElse(0.0)),
        "colorBarMax" -> Json.num(cm.map(_.valueRange._2).getOrElse(1.0)),
        "tileGrid" -> tileGridJson(grid))
    }
    val base = Seq(
      "id" -> Json.str(ds.id),
      "title" -> Json.str(ds.title),
      "bbox" -> Json.arr(Seq(b.xMin, b.yMin, b.xMax, b.yMax).map(Json.num)),
      "variables" -> Json.arr(variables),
      // reference: dimensions are full coordinate dumps in var-dim order
      // (catalogue.py:87-88 → get_dataset_coordinates per dim)
      "dimensions" -> Json.arr(dimNames.map(coordsJson(ds, _))))
    // dataset-attached place groups (catalogue.py:89-91)
    val withGroups =
      if (ds.placeGroupRefs.isEmpty) base
      else base :+ ("placeGroups" -> Json.arr(ds.placeGroupRefs.map(id =>
        Json.obj("id" -> Json.str(id),
          "title" -> Json.str(groupTitles.getOrElse(id, id))))))
    Json.obj(withGroups: _*)
  }

  /** GET /datasets/{ds}/coords/{dim} — one coordinate-variable dump
    * (reference catalogue.py:97-111: name/size/dtype/coordinates, float
    * dims as numbers, time as ISO strings). lat/lon derive from the
    * grid (no Spark job); time is the per-registration cached axis. */
  def coordsJson(ds: RegisteredDataset, dim: String): String = {
    val g = ds.cube.grid
    dim match {
      case "lat" =>
        val vals = (0 until g.height).map(y => Json.num(g.latOfY(y)))
        Json.obj("name" -> Json.str("lat"), "size" -> g.height.toString,
          "dtype" -> Json.str("float64"), "coordinates" -> Json.arr(vals))
      case "lon" =>
        val vals = (0 until g.width).map(x => Json.num(g.lonOfX(x)))
        Json.obj("name" -> Json.str("lon"), "size" -> g.width.toString,
          "dtype" -> Json.str("float64"), "coordinates" -> Json.arr(vals))
      case "time" =>
        val vals = ds.timeLabels.map(Json.str)
        Json.obj("name" -> Json.str("time"), "size" -> vals.size.toString,
          "dtype" -> Json.str("datetime64[ns]"),
          "coordinates" -> Json.arr(vals))
      case other =>
        ds.cube.extraDims.find(_.name == other) match {
          case Some(ed) =>
            Json.obj("name" -> Json.str(ed.name),
              "size" -> ed.values.size.toString,
              "dtype" -> Json.str("float64"),
              "units" -> Json.str(ed.units),
              "coordinates" -> Json.arr(ed.values.map(Json.num)))
          case None =>
            throw new NoSuchElementException(s"unknown dimension $other")
        }
    }
  }

  /** Tile-source options for map clients (reference
    * controllers/tiles.py:226-285): OpenLayers 4 ol.source.XYZ options
    * or Cesium UrlTemplateImageryProvider options. */
  def tileSourceOptionsJson(t: TileGrid, url: String, client: String): String = {
    val (w, s, e, n) =
      (t.extent.xMin, t.extent.yMin, t.extent.xMax, t.extent.yMax)
    client match {
      case "ol4" =>
        val res0 = (n - s) / t.height(0)
        Json.obj(
          "url" -> Json.str(url),
          "projection" -> Json.str("EPSG:4326"),
          "minZoom" -> "0",
          "maxZoom" -> (t.numLevels - 1).toString,
          "tileGrid" -> Json.obj(
            "extent" -> Json.arr(Seq(w, s, e, n).map(Json.num)),
            "origin" -> Json.arr(Seq(w, if (t.invY) s else n).map(Json.num)),
            "tileSize" -> Json.arr(Seq(t.tileWidth, t.tileHeight)
              .map(v => Json.num(v.toDouble))),
            "resolutions" -> Json.arr((0 until t.numLevels)
              .map(i => Json.num(res0 / (1 << i))))))
      case "cesium" =>
        val rect = Json.obj(
          "west" -> Json.num(w), "south" -> Json.num(s),
          "east" -> Json.num(e), "north" -> Json.num(n))
        Json.obj(
          "url" -> Json.str(url),
          "rectangle" -> rect,
          "minimumLevel" -> "0",
          "maximumLevel" -> (t.numLevels - 1).toString,
          "tileWidth" -> t.tileWidth.toString,
          "tileHeight" -> t.tileHeight.toString,
          "tilingScheme" -> Json.obj(
            "rectangle" -> rect,
            "numberOfLevelZeroTilesX" -> t.numLevelZeroTilesX.toString,
            "numberOfLevelZeroTilesY" -> t.numLevelZeroTilesY.toString))
      case other =>
        throw new IllegalArgumentException(s"""Unknown tile client "$other"""")
    }
  }

  /** tile grid for a registered dataset (shared by the tilegrid
    * endpoint and WMTS). */
  def tileGridOf(ds: RegisteredDataset): TileGrid = {
    val g = ds.cube.grid
    TileGrid.create(g.width, g.height, None, None, g.bbox,
      invY = g.latAscending)
  }

  /** TileGrid.to_json shape (tilegrid.py:157-168). */
  def tileGridJson(t: TileGrid): String =
    Json.obj(
      "numLevelZeroTilesX" -> t.numLevelZeroTilesX.toString,
      "numLevelZeroTilesY" -> t.numLevelZeroTilesY.toString,
      "tileWidth" -> t.tileWidth.toString,
      "tileHeight" -> t.tileHeight.toString,
      "numLevels" -> t.numLevels.toString,
      "invY" -> t.invY.toString,
      "extent" -> Json.obj(
        "west" -> Json.num(t.extent.xMin), "south" -> Json.num(t.extent.yMin),
        "east" -> Json.num(t.extent.xMax), "north" -> Json.num(t.extent.yMax)))
}
