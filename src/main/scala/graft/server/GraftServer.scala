package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.functions._

import graft.Q
import graft.geo.Geo
import graft.operators.{Places, TimeSeries}
import graft.render.Render
import graft.render.Render.ColorMapping

/** Thin HTTP shell over the engine (reference routing table:
  * xcube_server/app.py:40-103). The handlers do exactly what the
  * reference controllers do — parse params, dispatch to an operator,
  * serialize — with Spark jobs underneath for analytics and the
  * driver-local fast path for tiles (SURVEY §3.1). JDK HttpServer: the
  * shell stays dependency-free.
  *
  * Routes:
  *   GET  /datasets                               catalogue JSON
  *   GET  /datasets/{ds}                          dataset details
  *   GET  /datasets/{ds}/vars/{v}/tiles/{z}/{x}/{y}.png   map tile
  *   GET  /datasets/{ds}/vars/{v}/legend.png      colorbar legend
  *   GET  /ts/{ds}/{v}/point?lon=..&lat=..        point time series
  *   POST /ts/{ds}/{v}/geometry                   zonal time series (WKT body)
  *   GET  /places/test?geom=WKT                   feature query
  *   GET  /wmts/1.0.0/WMTSCapabilities.xml        capabilities
  */
class GraftServer(ctx: ServiceContext, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.setExecutor(Executors.newFixedThreadPool(8))

  /** in-memory PNG tile cache (reference X7: 512 MB LRU default with
    * 75% trim, defaults.py:30 / cache.py:257-274) */
  private val tileCache =
    new TileCache(graft.model.ServiceConfig.parseSize("512M"), TileCache.Lru)

  /** optional static asset root (reference S8: pre-rendered raster
    * files served straight from disk, ne2.py:63-78) */
  @volatile var staticRoot: Option[java.nio.file.Path] = None

  def address: String = s"http://localhost:${server.getAddress.getPort}"

  def start(): GraftServer = { server.start(); this }
  def stop(): Unit = server.stop(0)

  server.createContext("/", (ex: HttpExchange) => {
    try route(ex)
    catch {
      // param coercion failures are client errors (reference F13:
      // reqparams.py wraps them as 400s)
      case e @ (_: IllegalArgumentException | _: NumberFormatException |
                _: NoSuchElementException) => send(ex, 400,
        Json.obj("error" -> Json.str(String.valueOf(e.getMessage))),
        "application/json")
      case e: Throwable => send(ex, 500,
        Json.obj("error" -> Json.str(String.valueOf(e))), "application/json")
    }
  })

  private def route(ex: HttpExchange): Unit = {
    val path = ex.getRequestURI.getPath
    val parts = path.split("/").filter(_.nonEmpty)
    (ex.getRequestMethod, parts.toList) match {
      case ("GET", "datasets" :: Nil) =>
        send(ex, 200, Catalogue.datasetsJson(ctx), "application/json")
      case ("GET", "datasets" :: ds :: Nil) =>
        withDataset(ex, ds)(d =>
          send(ex, 200, Catalogue.datasetJson(d), "application/json"))
      case ("GET", "datasets" :: ds :: "coords" :: dim :: Nil) =>
        withDataset(ex, ds)(d =>
          send(ex, 200, Catalogue.coordsJson(d, dim), "application/json"))
      case ("GET", "datasets" :: ds :: "vars" :: v :: "tiles" :: z :: x :: yPng :: Nil) =>
        withDataset(ex, ds)(d => tile(ex, d, v, z.toInt, x.toInt,
          yPng.stripSuffix(".png").toInt))
      case ("GET", "datasets" :: ds :: "vars" :: v :: "legend.png" :: Nil) =>
        withDataset(ex, ds)(d =>
          sendBytes(ex, 200, Render.legend(mapping(d, v)), "image/png"))
      case ("GET", "ts" :: ds :: v :: "point" :: Nil) =>
        withDataset(ex, ds) { d =>
          val q = query(ex)
          val df = TimeSeries.point(d.cube, v,
            q("lon").toDouble, q("lat").toDouble)
          send(ex, 200, tsJson(df), "application/json")
        }
      case ("POST", "ts" :: ds :: v :: "geometry" :: Nil) =>
        withDataset(ex, ds) { d =>
          val wkt = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          val df = TimeSeries.zonal(d.cube, v, Geo.parseWkt(wkt))
          send(ex, 200, tsJson(df), "application/json")
        }
      case ("GET", "places" :: group :: Nil) =>
        val geomWkt = query(ex).getOrElse("geom",
          throw new IllegalArgumentException("geom parameter required"))
        val df = ctx.places(group).getOrElse {
          send(ex, 404, Json.obj("error" -> Json.str(s"no place group $group")),
            "application/json"); return
        }
        val hits = Places.pointsWithinWkt(df, "x", "y", geomWkt)
          .collect().map(r => Json.obj(
            "id" -> r.getAs[Long]("id").toString,
            "x" -> Json.num(r.getAs[Double]("x")),
            "y" -> Json.num(r.getAs[Double]("y"))))
        send(ex, 200, Json.obj("places" -> Json.arr(hits)), "application/json")
      case ("GET", "colorbars" :: Nil) =>
        send(ex, 200, graft.render.ColorMaps.json, "application/json")
      case ("GET", "colorbars.html" :: Nil) =>
        send(ex, 200, graft.render.ColorMaps.html, "text/html")
      case ("GET", "wmts" :: "1.0.0" :: "WMTSCapabilities.xml" :: Nil) =>
        send(ex, 200, Wmts.capabilitiesXml(ctx, address, Map.empty),
          "application/xml")
      case ("GET", "static" :: rest) if staticRoot.isDefined =>
        val base = staticRoot.get.normalize()
        val p = base.resolve(rest.mkString("/")).normalize()
        if (!p.startsWith(base) || !java.nio.file.Files.isRegularFile(p))
          send(ex, 404, Json.obj("error" -> Json.str("not found")),
            "application/json")
        else {
          val mime =
            if (p.toString.endsWith(".png")) "image/png"
            else if (p.toString.endsWith(".jpg")) "image/jpeg"
            else "application/octet-stream"
          sendBytes(ex, 200, java.nio.file.Files.readAllBytes(p), mime)
        }
      case _ =>
        send(ex, 404, Json.obj("error" -> Json.str(s"no route $path")),
          "application/json")
    }
  }

  private def withDataset(ex: HttpExchange, id: String)
                         (f: RegisteredDataset => Unit): Unit =
    ctx.dataset(id) match {
      case Some(d) => f(d)
      case None => send(ex, 404,
        Json.obj("error" -> Json.str(s"no dataset $id")), "application/json")
    }

  private def mapping(d: RegisteredDataset, v: String): ColorMapping = {
    val cm = d.style.flatMap(_.colorMappings.get(v))
    ColorMapping(cm.map(_.valueRange._1).getOrElse(0.0),
      cm.map(_.valueRange._2).getOrElse(1.0),
      graft.render.ColorMaps.paletteOrDefault(
        cm.map(_.colorBar).getOrElse("viridis")))
  }

  /** Tile request: cache probe → latest-time tile render (the 'current'
    * J5 default), keyed like the reference image cache
    * (controllers/tiles.py:57-61). WMTS z routes to a pyramid level —
    * z = 0 is the coarsest, level index counts finest→coarsest, so
    * level = numLevels - 1 - z (reference context.py:155 get_variable
    * _for_z); low-zoom tiles never touch full-resolution data. */
  private def tile(ex: HttpExchange, d: RegisteredDataset, v: String,
                   z: Int, x: Int, y: Int): Unit = {
    val key = s"${d.id}/$v/$z/$x/$y"
    tileCache.get(key) match {
      case Some(cached) => sendBytes(ex, 200, cached, "image/png")
      case None =>
        val levels = d.levelSeq
        val cube = levels(
          math.max(0, math.min(levels.length - 1, levels.length - 1 - z)))
        val png = Render.renderTile(cube, v, d.latestTime, x, y, 256, 256,
          mapping(d, v), flipY = cube.grid.latAscending)
        tileCache.put(key, png)
        sendBytes(ex, 200, png, "image/png")
    }
  }

  /** time-series rows → reference JSON shape (time_series.py:133-145) */
  private def tsJson(df: org.apache.spark.sql.DataFrame): String = {
    val rows = df.collect().map { r =>
      Json.obj(
        "date" -> Json.str(r.getAs[String]("date")),
        "result" -> Json.obj(
          "totalCount" -> r.getAs[Long]("total_count").toString,
          "validCount" -> r.getAs[Long]("valid_count").toString,
          "average" -> (if (r.isNullAt(r.fieldIndex("average"))) "null"
                        else r.getAs[Double]("average").toString)))
    }
    Json.obj("results" -> Json.arr(rows))
  }

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).map(_.split("&").flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(k -> java.net.URLDecoder.decode(v, "UTF-8"))
        case _ => None
      }
    }.toMap).getOrElse(Map.empty)

  private def send(ex: HttpExchange, code: Int, body: String,
                   contentType: String): Unit =
    sendBytes(ex, code, body.getBytes(StandardCharsets.UTF_8), contentType)

  private def sendBytes(ex: HttpExchange, code: Int, body: Array[Byte],
                        contentType: String): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, body.length)
    val os = ex.getResponseBody
    os.write(body)
    os.close()
  }
}
