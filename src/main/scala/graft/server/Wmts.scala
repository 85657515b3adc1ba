package graft.server

import graft.grid.TileGrid

/** WMTS 1.0.0 capabilities document (reference K4:
  * get_wmts_capabilities_xml at xcube_server/controllers/wmts.py:12-287
  * — service/provider header, one TileMatrixSet per distinct tile grid
  * with WGS84 scale denominators, one Layer per servable variable).
  * Pure driver-side templating over the registry metadata.
  */
object Wmts {

  /** WGS84 meters per degree at the equator / standard 0.28mm pixel —
    * the WMTS scale-denominator arithmetic (wmts.py:144-173). */
  private val MetersPerDegree = 6378137.0 * 2.0 * math.Pi / 360.0
  private val PixelSizeMeters = 0.28e-3

  /** XML text escape — Json.esc escapes quotes/backslashes but NOT the
    * XML metacharacters, so a title containing `&` or `<` would yield a
    * document schema-validating clients reject. */
  private[graft] def xmlEsc(s: String): String = {
    val b = new StringBuilder(s.length)
    s.foreach {
      case '&' => b.append("&amp;")
      case '<' => b.append("&lt;")
      case '>' => b.append("&gt;")
      case '"' => b.append("&quot;")
      case '\'' => b.append("&apos;")
      case c => b.append(c)
    }
    b.toString
  }

  def capabilitiesXml(ctx: ServiceContext, serviceUrl: String,
                      provider: Map[String, String] = Map.empty): String = {
    val datasets = ctx.datasetIds.flatMap(ctx.dataset)
    val layers = new StringBuilder
    val matrixSets = new StringBuilder
    // TileMatrixSet identity is the WHOLE grid — extent and tile size
    // included, not just max-level pixel dimensions: two equal-sized
    // grids over different bboxes have different TopLeftCorners, and
    // sharing one tmsId would send the second dataset's WMTS clients
    // to the wrong geography. The first grid of each pixel size keeps
    // the plain TileGrid_w_h name (stable for existing clients);
    // extent-conflicting latecomers get a _2/_3… suffix.
    var tmsByIdentity = Map.empty[String, String]
    var taken = Set.empty[String]

    datasets.foreach { ds =>
      val g = ds.cube.grid
      val grid = ds.tileGrid
      val identity = s"${grid.width(grid.maxLevel)}_" +
        s"${grid.height(grid.maxLevel)}_${grid.extent.xMin}_" +
        s"${grid.extent.yMin}_${grid.extent.xMax}_${grid.extent.yMax}_" +
        s"${grid.tileWidth}_${grid.tileHeight}"
      val tmsId = tmsByIdentity.getOrElse(identity, {
        val base = s"TileGrid_${grid.width(grid.maxLevel)}_" +
          s"${grid.height(grid.maxLevel)}"
        val fresh = Iterator.from(1)
          .map(i => if (i == 1) base else s"${base}_$i")
          .find(!taken(_)).get
        taken += fresh
        tmsByIdentity += identity -> fresh
        matrixSets.append(tileMatrixSetXml(fresh, grid))
        fresh
      })
      // time (+ extra non-spatial dim) <Dimension> values are shared
      // across a dataset's layers (the dimensions_xml_cache of
      // wmts.py:199-201)
      val dimensionXml = timeDimensionXml(ds) +
        ds.cube.extraDims.map(extraDimensionXml).mkString
      ds.cube.variables.foreach { v =>
        layers.append(
          s"""    <Layer>
             |      <ows:Identifier>${xmlEsc(ds.id)}.${xmlEsc(v)}</ows:Identifier>
             |      <ows:Title>${xmlEsc(ds.title)} ${xmlEsc(v)}</ows:Title>
             |      <ows:WGS84BoundingBox>
             |        <ows:LowerCorner>${g.bbox.xMin} ${g.bbox.yMin}</ows:LowerCorner>
             |        <ows:UpperCorner>${g.bbox.xMax} ${g.bbox.yMax}</ows:UpperCorner>
             |      </ows:WGS84BoundingBox>
             |      <Style isDefault="true"><ows:Identifier>Default</ows:Identifier></Style>
             |      <Format>image/png</Format>
             |$dimensionXml      <TileMatrixSetLink><TileMatrixSet>$tmsId</TileMatrixSet></TileMatrixSetLink>
             |      <ResourceURL format="image/png" resourceType="tile"
             |        template="$serviceUrl/datasets/${xmlEsc(ds.id)}/vars/${xmlEsc(v)}/tiles/{TileMatrix}/{TileCol}/{TileRow}.png"/>
             |    </Layer>
             |""".stripMargin)
      }
    }

    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<Capabilities xmlns="http://www.opengis.net/wmts/1.0"
       |    xmlns:ows="http://www.opengis.net/ows/1.1"
       |    xmlns:xlink="http://www.w3.org/1999/xlink" version="1.0.0">
       |  <ows:ServiceIdentification>
       |    <ows:Title>graft WMTS</ows:Title>
       |    <ows:ServiceType>OGC WMTS</ows:ServiceType>
       |    <ows:ServiceTypeVersion>1.0.0</ows:ServiceTypeVersion>
       |  </ows:ServiceIdentification>
       |  <ows:ServiceProvider>
       |    <ows:ProviderName>${xmlEsc(provider.getOrElse("ProviderName", "graft"))}</ows:ProviderName>
       |  </ows:ServiceProvider>
       |  <Contents>
       |${layers.toString}${matrixSets.toString}  </Contents>
       |${themesXml(datasets)}  <ServiceMetadataURL xlink:href="$serviceUrl/wmts/1.0.0/WMTSCapabilities.xml"/>
       |</Capabilities>
       |""".stripMargin
  }

  /** Per-layer time `<Dimension>` with ISO value dumps (wmts.py:195-237:
    * UOM ISO8601, Default current, Current true, one <Value> per
    * coordinate). Placed BEFORE TileMatrixSetLink — the WMTS 1.0
    * LayerType sequence is Style, Format, InfoFormat, Dimension,
    * TileMatrixSetLink, ResourceURL; schema-validating clients reject
    * other orders. */
  def timeDimensionXml(ds: RegisteredDataset): String = {
    val values = ds.timeLabels.map(l =>
      s"        <Value>$l</Value>\n").mkString
    s"""      <Dimension>
       |        <ows:Identifier>time</ows:Identifier>
       |        <ows:Title>time</ows:Title>
       |        <ows:UOM>ISO8601</ows:UOM>
       |        <Default>current</Default>
       |        <Current>true</Current>
       |$values      </Dimension>
       |""".stripMargin
  }

  /** `<Dimension>` for an extra non-spatial axis (wmts.py:218-235 for
    * non-time dims: UOM from the coordinate's units, Default = the
    * FIRST coordinate value — the indexer's no-param default — Current
    * false, one <Value> per coordinate). */
  def extraDimensionXml(ed: graft.cube.ExtraDim): String = {
    // same integral-double rendering as the JSON surface (a client
    // pasting a WMTS <Value> into ?depth= must hit the same plane the
    // catalogue advertises)
    def fmt(v: Double): String = Json.num(v)
    val values = ed.values.map(v =>
      s"        <Value>${fmt(v)}</Value>\n").mkString
    s"""      <Dimension>
       |        <ows:Identifier>${xmlEsc(ed.name)}</ows:Identifier>
       |        <ows:Title>${xmlEsc(ed.name)}</ows:Title>
       |        <ows:UOM>${xmlEsc(ed.units)}</ows:UOM>
       |        <Default>${fmt(ed.values.head)}</Default>
       |        <Current>false</Current>
       |$values      </Dimension>
       |""".stripMargin
  }

  /** Themes tree (wmts.py:246-266): one Theme per dataset with a nested
    * Theme + LayerRef per variable. */
  def themesXml(datasets: Seq[RegisteredDataset]): String = {
    val b = new StringBuilder("  <Themes>\n")
    datasets.foreach { ds =>
      b.append("    <Theme>\n")
        .append(s"      <ows:Title>${xmlEsc(ds.title)}</ows:Title>\n")
        .append(s"      <ows:Abstract></ows:Abstract>\n")
        .append(s"      <ows:Identifier>${xmlEsc(ds.id)}</ows:Identifier>\n")
      ds.cube.variables.foreach { v =>
        b.append("      <Theme>\n")
          .append(s"        <ows:Title>${xmlEsc(v)}</ows:Title>\n")
          .append(s"        <ows:Identifier>${xmlEsc(ds.id)}.${xmlEsc(v)}</ows:Identifier>\n")
          .append(s"        <LayerRef>${xmlEsc(ds.id)}.${xmlEsc(v)}</LayerRef>\n")
          .append("      </Theme>\n")
      }
      b.append("    </Theme>\n")
    }
    b.append("  </Themes>\n").toString
  }

  def tileMatrixSetXml(id: String, grid: TileGrid): String = {
    val res0 = (grid.extent.xMax - grid.extent.xMin) / grid.width(0)
    val matrices = (0 until grid.numLevels).map { z =>
      val res = res0 / (1 << z)
      val scaleDenominator = res * MetersPerDegree / PixelSizeMeters
      s"""      <TileMatrix>
         |        <ows:Identifier>$z</ows:Identifier>
         |        <ScaleDenominator>$scaleDenominator</ScaleDenominator>
         |        <TopLeftCorner>${grid.extent.xMin} ${grid.extent.yMax}</TopLeftCorner>
         |        <TileWidth>${grid.tileWidth}</TileWidth>
         |        <TileHeight>${grid.tileHeight}</TileHeight>
         |        <MatrixWidth>${grid.numTilesX(z)}</MatrixWidth>
         |        <MatrixHeight>${grid.numTilesY(z)}</MatrixHeight>
         |      </TileMatrix>
         |""".stripMargin
    }.mkString
    s"""    <TileMatrixSet>
       |      <ows:Identifier>$id</ows:Identifier>
       |      <ows:SupportedCRS>urn:ogc:def:crs:OGC:1.3:CRS84</ows:SupportedCRS>
       |$matrices    </TileMatrixSet>
       |""".stripMargin
  }
}
