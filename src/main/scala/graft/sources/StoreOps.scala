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
  /** text attributes of one variable (CF `units`/`calendar` carriers) */
  def textAttrs(name: String): Map[String, String]
}

private[sources] object StoreOps {
  /** Dispatch by what the store IS, not the extension: `.nc` can be
    * classic (CDF magic) or NetCDF-4 (an HDF5 container). */
  def forPath(path: String): StoreOps =
    if (java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(path))) {
      if (Hdf5.isHdf5(path)) Hdf5Ops(path) else NetcdfOps(path)
    } else ZarrOps(path)
}

private[sources] final case class ZarrOps(path: String) extends StoreOps {
  def variableNames: Seq[String] = ZarrStore.variableNames(path)
  def arrayMeta(name: String): ZarrStore.ArrayMeta =
    ZarrStore.readArrayMeta(path, name)
  def readChunk(name: String, meta: ZarrStore.ArrayMeta,
                idx: Seq[Int]): Array[Double] =
    ZarrStore.readChunk(path, name, meta, idx)
  def read1d(name: String): Array[Double] = ZarrStore.read1d(path, name)
  def read1dLongs(name: String): Array[Long] = {
    // CF time axes ("days since ...") decode to epoch-us; graft-native
    // stores hold epoch-us int64 directly. One metadata fetch serves
    // the attrs probe and the chosen read path.
    val meta = ZarrStore.readArrayMeta(path, name)
    CfTime.axisUs(meta.textAttrs, ZarrStore.read1d(path, name, meta))
      .getOrElse(ZarrStore.read1dLongs(path, name, meta))
  }
  def textAttrs(name: String): Map[String, String] =
    ZarrStore.readArrayMeta(path, name).textAttrs
}

/** NetCDF-4/HDF5 files through the [[Hdf5]] reader. A chunked HDF5
  * variable keeps its own chunk grid (the scan plans one partition per
  * stored chunk — reads stay IO-aligned); contiguous variables present
  * as one time slice per chunk like the classic path. */
private[sources] final case class Hdf5Ops(path: String) extends StoreOps {
  @transient private lazy val f = Hdf5.open(path)

  def variableNames: Seq[String] =
    f.datasets.values.filter(_.shape.length == 3).map(_.name).toSeq.sorted

  def arrayMeta(name: String): ZarrStore.ArrayMeta = {
    val d = f.datasets(name)
    val chunks =
      if (d.layoutClass == 2) d.chunkDims
      else Seq(1) ++ d.shape.drop(1)
    val comp = d.filters.map(_.id).map {
      case 1 => "deflate"; case 2 => "shuffle"; case 3 => "fletcher32"
      case other => s"filter$other"
    } match { case Nil => "null"; case fs => fs.mkString("+") }
    ZarrStore.ArrayMeta(d.shape, chunks, dtypeStr(d), comp, d.fill)
  }

  private def dtypeStr(d: Hdf5.Dataset): String = {
    val order = if (d.dtype.littleEndian) "<" else ">"
    val kind = d.dtype.clazz match {
      case 1 => "f"
      case 0 => if (d.dtype.signed) "i" else "u"
      case c => s"c$c"
    }
    s"$order$kind${d.dtype.size}"
  }

  def readChunk(name: String, meta: ZarrStore.ArrayMeta,
                idx: Seq[Int]): Array[Double] = {
    val d = f.datasets(name)
    CfScale(d.attrs, Hdf5.readChunk(path, d, idx))
  }

  def read1d(name: String): Array[Double] = {
    val d = f.datasets(name)
    CfScale(d.attrs, Hdf5.read1d(path, d))
  }

  def read1dLongs(name: String): Array[Long] = {
    val d = f.datasets(name)
    CfTime.axisUs(d.textAttrs, read1d(name))
      .getOrElse(read1d(name).map(_.toLong)) // native: epoch-us doubles
  }
  def textAttrs(name: String): Map[String, String] =
    f.datasets(name).textAttrs
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
    CfScale(v.attrs,
      NetcdfStore.readSlab(path, v, idx.head.toLong * slab, slab))
  }

  def read1d(name: String): Array[Double] =
    CfScale(header.variable(name).attrs,
      NetcdfStore.read1d(path, header, name))

  def read1dLongs(name: String): Array[Long] = {
    val v = header.variable(name)
    CfTime.axisUs(v.textAttrs, read1d(name))
      .getOrElse(read1d(name).map(_.toLong)) // native: epoch-us doubles
  }
  def textAttrs(name: String): Map[String, String] =
    header.variable(name).textAttrs
}
