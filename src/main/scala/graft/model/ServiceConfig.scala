package graft.model

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import scala.jdk.CollectionConverters._

/** Service configuration (reference: YAML config consumed at
  * xcube_server/service.py:179-201 and dispatched at
  * xcube_server/context.py:207-287; demo at
  * xcube_server/res/demo/config.yml).
  *
  * Same document shape: `Datasets` (descriptors with Identifier, Title,
  * BoundingBox, FileSystem, Path, Style, Function/InputDatasets for
  * computed cubes), `PlaceGroups`, `Styles` (per-variable color
  * mappings), `ServiceProvider`. Parsed with the YAML support already
  * on Spark's classpath (jackson-dataformat-yaml).
  */
final case class DatasetDescriptor(identifier: String, title: String,
                                   boundingBox: Option[Seq[Double]],
                                   fileSystem: String, path: String,
                                   style: Option[String],
                                   function: Option[String],
                                   inputDatasets: Seq[String],
                                   inputParameters: Map[String, String],
                                   placeGroupRefs: Seq[String],
                                   endpoint: Option[String] = None,
                                   region: Option[String] = None)

/** A place-group descriptor (reference context.py:349-399): `path` may
  * be a glob over collection files; `places` are nested sub-groups. */
final case class PlaceGroupConfig(identifier: String, title: String,
                                  path: String,
                                  propertyMapping: Map[String, String] = Map.empty,
                                  places: Seq[PlaceGroupConfig] = Nil)

final case class ColorMappingConfig(colorBar: String, valueRange: (Double, Double))

final case class StyleConfig(identifier: String,
                             colorMappings: Map[String, ColorMappingConfig])

final case class ServiceConfig(datasets: Seq[DatasetDescriptor],
                               placeGroups: Seq[PlaceGroupConfig],
                               styles: Seq[StyleConfig],
                               provider: Map[String, String]) {
  def dataset(id: String): Option[DatasetDescriptor] =
    datasets.find(_.identifier == id)
  def style(id: String): Option[StyleConfig] = styles.find(_.identifier == id)
}

object ServiceConfig {

  private val mapper = new ObjectMapper(new YAMLFactory())

  def fromFile(path: String): ServiceConfig =
    fromString(Files.readString(Paths.get(path)))

  def fromString(yaml: String): ServiceConfig = {
    val root = mapper.readTree(yaml)
    def arr(n: JsonNode, field: String): Seq[JsonNode] =
      Option(n.get(field)).map(_.elements().asScala.toSeq).getOrElse(Nil)
    def str(n: JsonNode, field: String): Option[String] =
      Option(n.get(field)).map(_.asText())

    val datasets = arr(root, "Datasets").map { d =>
      DatasetDescriptor(
        identifier = str(d, "Identifier").getOrElse(""),
        title = str(d, "Title").getOrElse(""),
        boundingBox = Option(d.get("BoundingBox"))
          .map(_.elements().asScala.map(_.asDouble()).toSeq),
        fileSystem = str(d, "FileSystem").getOrElse("local"),
        path = str(d, "Path").getOrElse(""),
        style = str(d, "Style"),
        function = str(d, "Function"),
        inputDatasets = arr(d, "InputDatasets").map(_.asText()),
        inputParameters = Option(d.get("InputParameters"))
          .map(p => p.properties().asScala.map(e =>
            e.getKey -> e.getValue.asText()).toMap)
          .getOrElse(Map.empty),
        placeGroupRefs = arr(d, "PlaceGroups")
          .flatMap(pg => str(pg, "PlaceGroupRef")),
        // obs descriptors may point at a non-AWS object store
        // (reference context.py:218-225 maps these to the S3 client)
        endpoint = str(d, "Endpoint"),
        region = str(d, "Region"))
    }
    def placeGroup(p: JsonNode): PlaceGroupConfig =
      PlaceGroupConfig(str(p, "Identifier").getOrElse(""),
        str(p, "Title").getOrElse(""), str(p, "Path").getOrElse(""),
        propertyMapping = Option(p.get("PropertyMapping"))
          .map(m => m.properties().asScala.map(e =>
            e.getKey -> e.getValue.asText()).toMap).getOrElse(Map.empty),
        places = arr(p, "Places").map(placeGroup))
    val placeGroups = arr(root, "PlaceGroups").map(placeGroup)
    val styles = arr(root, "Styles").map { s =>
      val cms = Option(s.get("ColorMappings")).map { cm =>
        cm.properties().asScala.map { e =>
          val vr = e.getValue.get("ValueRange")
          require(vr != null && vr.isArray && vr.size() >= 2,
            s"style '${str(s, "Identifier").getOrElse("")}': ColorMappings." +
              s"${e.getKey} needs ValueRange: [min, max]")
          e.getKey -> ColorMappingConfig(
            Option(e.getValue.get("ColorBar")).map(_.asText())
              .getOrElse("jet"), // DEFAULT_CMAP_CBAR (context.py:195)
            (vr.get(0).asDouble(), vr.get(1).asDouble()))
        }.toMap
      }.getOrElse(Map.empty[String, ColorMappingConfig])
      StyleConfig(str(s, "Identifier").getOrElse(""), cms)
    }
    val provider = Option(root.get("ServiceProvider"))
      .map(p => p.properties().asScala.map(e =>
        e.getKey -> e.getValue.asText()).toMap)
      .getOrElse(Map.empty[String, String])
    ServiceConfig(datasets, placeGroups, styles, provider)
  }

  /** "512M"-style size parse (reference F16, service.py:353-369). */
  def parseSize(s: String): Long = {
    val t = s.trim.toUpperCase
    val (num, mult) = t.lastOption match {
      case Some('K') => (t.dropRight(1), 1L << 10)
      case Some('M') => (t.dropRight(1), 1L << 20)
      case Some('G') => (t.dropRight(1), 1L << 30)
      case Some('T') => (t.dropRight(1), 1L << 40)
      case _ => (t, 1L)
    }
    (num.toDouble * mult).toLong
  }

  /** mtime-watched hot reload (reference S9, service.py:179-201): returns
    * a () => ServiceConfig that re-parses only when the file changed. */
  def watching(path: String): () => ServiceConfig = {
    var lastMtime = 0L
    var cached: ServiceConfig = null
    () => {
      val mtime = Files.getLastModifiedTime(Paths.get(path)).toMillis
      if (cached == null || mtime != lastMtime) {
        cached = fromFile(path)
        lastMtime = mtime
      }
      cached
    }
  }
}
