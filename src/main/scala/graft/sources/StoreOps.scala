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
  /** every array in the store, coordinate axes included */
  def arrayNames: Seq[String]
  /** declared axis names of one variable (zarr `_ARRAY_DIMENSIONS` /
    * v3 `dimension_names`, NetCDF dim table); Nil when the format
    * doesn't carry them (plain HDF5) — callers fall back to matching
    * 1-D coordinate arrays by length */
  def dimNames(name: String): Seq[String] = Nil
}

private[sources] object StoreOps {
  /** Dispatch by what the store IS, not the extension: `.nc` can be
    * classic (CDF magic) or NetCDF-4 (an HDF5 container). */
  def forPath(path: String): StoreOps =
    if (java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(path))) {
      if (Hdf5.isHdf5(path)) Hdf5Ops(path) else NetcdfOps(path)
    } else ZarrOps(path)

  /** The servable variable subset: one relation carries ONE dim
    * signature, but real stores mix ranks (a 3-D `sst` next to a 4-D
    * `temp` column variable is normal xarray output). Serve the
    * largest same-shape group — ties break to the group holding the
    * first-sorted variable — and leave the rest unregistered, like the
    * pre-extra-dims behavior served 3-D variables and silently ignored
    * higher ranks. Failing the whole open on a mixed store would
    * regress every store that used to work. */
  def servableVariables(ops: StoreOps): Seq[String] = {
    val all = ops.variableNames
    if (all.lengthCompare(1) <= 0) all
    else {
      // group by shape AND resolved extra-dim names: two equal-shape
      // variables on DIFFERENT axes (depth[5] vs sigma[5]) must not
      // share a relation — the schema would label one variable's
      // planes with the other's coordinates and every indexer on it
      // would silently select the wrong physical plane
      def dimsKey(v: String): Option[Seq[String]] =
        try Some(extraDimNames(ops, v))
        catch { case scala.util.control.NonFatal(_) => None }
      val groups = all.groupBy(v => (ops.arrayMeta(v).shape, dimsKey(v)))
        .values.toSeq
      groups.maxBy(g => (g.size, g.contains(all.head),
        -all.indexOf(g.min)))
    }
  }

  /** Names + axis lengths of a rank≥3 variable's EXTRA non-spatial
    * dims (the axes between time and the spatial pair — the
    * `time × depth × y × x` case the reference serves with per-request
    * indexers, context.py:420-451). Resolution: the variable's
    * declared dim names when the store carries them, else the unique
    * 1-D coordinate array whose length matches the axis. A dim with no
    * coordinate array fails loudly — the reference's 400 for
    * "dimension has no coordinates", and silently mis-labeling an axis
    * would poison every indexer. */
  def extraDimNames(ops: StoreOps, variable: String): Seq[String] = {
    val shape = ops.arrayMeta(variable).shape
    if (shape.length <= 3) return Nil
    val declared = ops.dimNames(variable)
    lazy val oneD: Seq[(String, Int)] = ops.arrayNames.flatMap { n =>
      try {
        val s = ops.arrayMeta(n).shape
        if (s.length == 1) Some(n -> s.head) else None
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    val reserved = Set("time", "lat", "lon", "x", "y")
    (1 to shape.length - 3).map { axis =>
      if (declared.length == shape.length) declared(axis)
      else oneD.filter { case (n, len) =>
        !reserved(n) && len == shape(axis)
      } match {
        case Seq((one, _)) => one
        case Seq() => throw new IllegalArgumentException(
          s"axis $axis of $variable (length ${shape(axis)}) has no 1-D " +
            "coordinate array — extra dims need coordinates")
        case many => throw new IllegalArgumentException(
          s"axis $axis of $variable matches several coordinate arrays " +
            s"(${many.map(_._1).mkString(", ")}) — declare dimension " +
            "names (_ARRAY_DIMENSIONS / dimension_names)")
      }
    }
  }

  /** The [[graft.cube.ExtraDim]] descriptors of a variable: resolved
    * names plus their coordinate values in store order. */
  def extraDimsOf(ops: StoreOps, variable: String)
      : Seq[graft.cube.ExtraDim] =
    extraDimNames(ops, variable).map { n =>
      graft.cube.ExtraDim(n, ops.read1d(n).toSeq,
        units = ops.textAttrs(n).getOrElse("units", ""))
    }
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
  def arrayNames: Seq[String] = ZarrStore.allArrayNames(path)
  override def dimNames(name: String): Seq[String] =
    ZarrStore.readArrayMeta(path, name).dims
}

/** NetCDF-4/HDF5 files through the [[Hdf5]] reader. A chunked HDF5
  * variable keeps its own chunk grid (the scan plans one partition per
  * stored chunk — reads stay IO-aligned); contiguous variables present
  * as one time slice per chunk like the classic path. */
private[sources] final case class Hdf5Ops(path: String) extends StoreOps {
  @transient private lazy val f = Hdf5.open(path)

  def variableNames: Seq[String] =
    f.datasets.values.filter(_.shape.length >= 3).map(_.name).toSeq.sorted

  def arrayNames: Seq[String] = f.datasets.keys.toSeq.sorted

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
    val vals = read1d(name) // read ONCE; shared by both outcomes below
    CfTime.axisUs(d.textAttrs, vals)
      .getOrElse(vals.map(_.toLong)) // native: epoch-us doubles
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
    // contiguous row-major: one chunk per leading-dim slice (a rank-4
    // variable chunks (1, 1, lat, lon) — one (time, depth) plane per
    // sequential slab read)
    val chunks =
      if (shape.length >= 3)
        Seq.fill(shape.length - 2)(1) ++ shape.takeRight(2)
      else shape
    ZarrStore.ArrayMeta(shape, chunks, "<f8", comp = "null", Double.NaN)
  }

  def readChunk(name: String, meta: ZarrStore.ArrayMeta,
                idx: Seq[Int]): Array[Double] = {
    val v = header.variable(name)
    val slab = meta.chunks.product
    // linearize the chunk index over the chunk grid (row-major); with
    // spatial chunks == full extent the spatial components are 0
    val lin = idx.zip(meta.numChunks)
      .foldLeft(0L) { case (acc, (i, n)) => acc * n + i }
    CfScale(v.attrs, NetcdfStore.readSlab(path, v, lin * slab, slab))
  }

  def read1d(name: String): Array[Double] =
    CfScale(header.variable(name).attrs,
      NetcdfStore.read1d(path, header, name))

  def read1dLongs(name: String): Array[Long] = {
    val v = header.variable(name)
    val vals = read1d(name) // read ONCE; shared by both outcomes below
    CfTime.axisUs(v.textAttrs, vals)
      .getOrElse(vals.map(_.toLong)) // native: epoch-us doubles
  }
  def textAttrs(name: String): Map[String, String] =
    header.variable(name).textAttrs
  def arrayNames: Seq[String] = header.vars.map(_.name).sorted
  override def dimNames(name: String): Seq[String] =
    header.variable(name).dimIds.map(header.dims(_).name)
}
