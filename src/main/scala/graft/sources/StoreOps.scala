package graft.sources

/** Store-IO facade behind the cube DataSourceV2: the scan/reader code
  * is format-agnostic (chunk triples + 1-D coordinate axes); zarr and
  * NetCDF-3 plug in here. A NetCDF classic variable is presented as an
  * array chunked (1, lat, lon) — one time slice per chunk, matching
  * its contiguous row-major layout, so every "chunk read" is one
  * sequential slab read. */
private[sources] sealed trait StoreOps extends Serializable {
  def variableNames: Seq[String]
  def arrayMeta(name: String): ZarrStore.ArrayMeta
  def readChunk(name: String, meta: ZarrStore.ArrayMeta,
                idx: Seq[Int]): Array[Double]
  def read1d(name: String): Array[Double]
  def read1dLongs(name: String): Array[Long]
}

private[sources] object StoreOps {
  def forPath(path: String): StoreOps =
    if (path.endsWith(".nc")) NetcdfOps(path) else ZarrOps(path)
}

private[sources] final case class ZarrOps(path: String) extends StoreOps {
  def variableNames: Seq[String] = ZarrStore.variableNames(path)
  def arrayMeta(name: String): ZarrStore.ArrayMeta =
    ZarrStore.readArrayMeta(path, name)
  def readChunk(name: String, meta: ZarrStore.ArrayMeta,
                idx: Seq[Int]): Array[Double] =
    ZarrStore.readChunk(path, name, meta, idx)
  def read1d(name: String): Array[Double] = ZarrStore.read1d(path, name)
  def read1dLongs(name: String): Array[Long] =
    ZarrStore.read1dLongs(path, name)
}

private[sources] final case class NetcdfOps(path: String) extends StoreOps {
  @transient private lazy val header = NetcdfStore.readHeader(path)

  def variableNames: Seq[String] = NetcdfStore.variableNames(header)

  def arrayMeta(name: String): ZarrStore.ArrayMeta = {
    val v = header.variable(name)
    val shape = header.shapeOf(v)
    val chunks =
      if (shape.length == 3) Seq(1, shape(1), shape(2)) else shape
    ZarrStore.ArrayMeta(shape, chunks, "<f8", comp = "null", Double.NaN)
  }

  def readChunk(name: String, meta: ZarrStore.ArrayMeta,
                idx: Seq[Int]): Array[Double] = {
    val v = header.variable(name)
    val slab = meta.chunks.product
    NetcdfStore.readSlab(path, v, idx.head.toLong * slab, slab)
  }

  def read1d(name: String): Array[Double] =
    NetcdfStore.read1d(path, header, name)

  def read1dLongs(name: String): Array[Long] =
    NetcdfStore.read1d(path, header, name).map(_.toLong)
}
