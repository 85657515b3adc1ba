package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 read connector for cube stores — Zarr v2 directories
  * and NetCDF-3 classic files, dispatched by path suffix through
  * [[StoreOps]] (SURVEY S1-S3: the live on-ramp the reference gets
  * from xarray's zarr/netcdf engines, context.py:245-250). One Spark
  * input partition per CHUNK triple (time, y, x) — the chunk-aligned
  * planning of mldataset.py:437-456; a NetCDF variable reads as one
  * chunk per time slice, matching its contiguous layout — so task
  * parallelism and IO granularity follow the store's own layout, the
  * property that keeps reads sequential at 100 TB.
  *
  * Pushdown:
  *  - column pruning reaches the chunk files: a projection of one
  *    variable opens only that variable's chunks (plus the tiny 1-D
  *    coordinate axes);
  *  - time/y_idx/x_idx range predicates prune whole chunks at plan
  *    time (reported via pushedFilters for `.explain`); Spark
  *    re-applies the residual row-level filter after the scan.
  *
  * Relation schema (the long-format cube contract of graft.cube.Cube):
  *   time TIMESTAMP, y_idx INT, x_idx INT, lat DOUBLE, lon DOUBLE,
  *   <var> DOUBLE per 3-D array.
  */
class ZarrDataSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrDataSource.schemaFor(ZarrDataSource.pathOf(options))


  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new ZarrTable(properties.get("path"), schema)

  override def supportsExternalMetadata(): Boolean = false
}

object ZarrDataSource {
  def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "zarr source requires a 'path' option")
    p
  }

  def schemaFor(path: String): StructType = {
    val vars = StoreOps.forPath(path).variableNames
    StructType(Seq(
      StructField("time", TimestampType, nullable = false),
      StructField("y_idx", IntegerType, nullable = false),
      StructField("x_idx", IntegerType, nullable = false),
      StructField("lat", DoubleType, nullable = false),
      StructField("lon", DoubleType, nullable = false)) ++
      vars.map(v => StructField(v, DoubleType, nullable = false)))
  }
}

class ZarrTable(path: String, tableSchema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"zarr:$path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(path, tableSchema)
}

/** index-space bounds extracted from pushed filters (None = unbounded) */
private[sources] final case class ZarrBounds(
    tMinUs: Option[Long] = None, tMaxUs: Option[Long] = None,
    yMin: Option[Int] = None, yMax: Option[Int] = None,
    xMin: Option[Int] = None, xMax: Option[Int] = None)

class ZarrScanBuilder(path: String, tableSchema: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {

  private var required: StructType = tableSchema
  private var bounds = ZarrBounds()
  private var pushed: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve source field order; an empty projection (count(*)) still
    // needs the cell geometry to emit the right row count
    required = StructType(tableSchema.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val usable = filters.filter(collectBound)
    pushed = usable
    filters // everything stays a residual: chunk pruning is coarse
  }

  override def pushedFilters(): Array[Filter] = pushed

  private def toMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(t.getTime * 1000L + (t.getNanos / 1000) % 1000)
    case i: java.time.Instant => Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
    case _ => None
  }
  private def toInt(v: Any): Option[Int] = v match {
    case i: Int => Some(i)
    case l: Long => Some(l.toInt)
    case _ => None
  }

  /** fold one filter into the bounds; true when it contributed */
  private def collectBound(f: Filter): Boolean = f match {
    case sources.And(l, r) =>
      val a = collectBound(l); val b = collectBound(r); a || b
    case sources.EqualTo(c, v) =>
      collectBound(sources.GreaterThanOrEqual(c, v)) &
        collectBound(sources.LessThanOrEqual(c, v))
    case sources.GreaterThanOrEqual("time", v) =>
      toMicros(v).exists { m => bounds = bounds.copy(
        tMinUs = Some(bounds.tMinUs.fold(m)(math.max(_, m)))); true }
    case sources.GreaterThan("time", v) => collectBound(
      sources.GreaterThanOrEqual("time", v))
    case sources.LessThanOrEqual("time", v) =>
      toMicros(v).exists { m => bounds = bounds.copy(
        tMaxUs = Some(bounds.tMaxUs.fold(m)(math.min(_, m)))); true }
    case sources.LessThan("time", v) => collectBound(
      sources.LessThanOrEqual("time", v))
    case sources.GreaterThanOrEqual("y_idx", v) =>
      toInt(v).exists { i => bounds = bounds.copy(
        yMin = Some(bounds.yMin.fold(i)(math.max(_, i)))); true }
    case sources.GreaterThan("y_idx", v) => toInt(v).exists { i =>
      bounds = bounds.copy(
        yMin = Some(bounds.yMin.fold(i + 1)(math.max(_, i + 1)))); true }
    case sources.LessThanOrEqual("y_idx", v) =>
      toInt(v).exists { i => bounds = bounds.copy(
        yMax = Some(bounds.yMax.fold(i)(math.min(_, i)))); true }
    case sources.LessThan("y_idx", v) => toInt(v).exists { i =>
      bounds = bounds.copy(
        yMax = Some(bounds.yMax.fold(i - 1)(math.min(_, i - 1)))); true }
    case sources.GreaterThanOrEqual("x_idx", v) =>
      toInt(v).exists { i => bounds = bounds.copy(
        xMin = Some(bounds.xMin.fold(i)(math.max(_, i)))); true }
    case sources.GreaterThan("x_idx", v) => toInt(v).exists { i =>
      bounds = bounds.copy(
        xMin = Some(bounds.xMin.fold(i + 1)(math.max(_, i + 1)))); true }
    case sources.LessThanOrEqual("x_idx", v) =>
      toInt(v).exists { i => bounds = bounds.copy(
        xMax = Some(bounds.xMax.fold(i)(math.min(_, i)))); true }
    case sources.LessThan("x_idx", v) => toInt(v).exists { i =>
      bounds = bounds.copy(
        xMax = Some(bounds.xMax.fold(i - 1)(math.min(_, i - 1)))); true }
    case _ => false
  }

  override def build(): Scan = new ZarrScan(path, required, bounds)
}

/** one zarr chunk triple */
private[sources] final case class ZarrInputPartition(tc: Int, yc: Int, xc: Int)
    extends InputPartition

class ZarrScan(path: String, required: StructType, bounds: ZarrBounds)
    extends Scan with Batch {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String = {
    val b = Seq(
      bounds.tMinUs.map(t => s"time>=$t"), bounds.tMaxUs.map(t => s"time<=$t"),
      bounds.yMin.map(y => s"y_idx>=$y"), bounds.yMax.map(y => s"y_idx<=$y"),
      bounds.xMin.map(x => s"x_idx>=$x"), bounds.xMax.map(x => s"x_idx<=$x"))
      .flatten.mkString(", ")
    s"ZarrScan path=$path chunkPruning=[$b]"
  }

  private lazy val ops = StoreOps.forPath(path)
  private lazy val vars = ops.variableNames
  private lazy val projectedVars =
    vars.filter(required.fieldNames.contains)
  /** chunk geometry comes from the first 3-D array; all arrays must
    * share it (the store contract). Per-variable metas still matter:
    * dtype, fill and CF attributes are PER ARRAY (one packed int16
    * variable next to an unpacked f8 one is normal), so each readChunk
    * gets its own meta, not the geometry carrier's. */
  private lazy val meta = ops.arrayMeta(
    projectedVars.headOption.getOrElse(vars.head))
  private lazy val metas: Map[String, ZarrStore.ArrayMeta] =
    projectedVars.map(v => v -> ops.arrayMeta(v)).toMap
  private lazy val timeUs = ops.read1dLongs("time")

  override def planInputPartitions(): Array[InputPartition] = {
    metas.foreach { case (v, m) =>
      require(m.shape == meta.shape && m.chunks == meta.chunks,
        s"variable $v chunking ${m.chunks} differs from ${meta.chunks}")
    }
    val Seq(nt, nh, nw) = meta.shape
    val Seq(ct, cy, cx) = meta.chunks
    val parts = for {
      tc <- 0 until (nt + ct - 1) / ct
      if chunkTimeOverlaps(tc, ct, nt)
      yc <- 0 until (nh + cy - 1) / cy
      if rangeOverlaps(yc * cy, math.min(nh, (yc + 1) * cy) - 1,
        bounds.yMin, bounds.yMax)
      xc <- 0 until (nw + cx - 1) / cx
      if rangeOverlaps(xc * cx, math.min(nw, (xc + 1) * cx) - 1,
        bounds.xMin, bounds.xMax)
    } yield ZarrInputPartition(tc, yc, xc)
    parts.toArray[InputPartition]
  }

  private def rangeOverlaps(lo: Int, hi: Int, min: Option[Int],
                            max: Option[Int]): Boolean =
    min.forall(hi >= _) && max.forall(lo <= _)

  private def chunkTimeOverlaps(tc: Int, ct: Int, nt: Int): Boolean = {
    val lo = timeUs(tc * ct)
    val hi = timeUs(math.min(nt, (tc + 1) * ct) - 1)
    bounds.tMinUs.forall(hi >= _) && bounds.tMaxUs.forall(lo <= _)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrReaderFactory(ops, required, meta, metas, projectedVars, timeUs,
      ops.read1d("lat"), ops.read1d("lon"))
}

class ZarrReaderFactory(ops: StoreOps, required: StructType,
                        meta: ZarrStore.ArrayMeta,
                        metas: Map[String, ZarrStore.ArrayMeta],
                        vars: Seq[String],
                        timeUs: Array[Long], lat: Array[Double],
                        lon: Array[Double])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val zp = p.asInstanceOf[ZarrInputPartition]
    new ZarrPartitionReader(ops, required, meta, metas, vars, timeUs, lat,
      lon, zp)
  }
}

class ZarrPartitionReader(ops: StoreOps, required: StructType,
                          meta: ZarrStore.ArrayMeta,
                          metas: Map[String, ZarrStore.ArrayMeta],
                          vars: Seq[String],
                          timeUs: Array[Long], lat: Array[Double],
                          lon: Array[Double], part: ZarrInputPartition)
    extends PartitionReader[InternalRow] {

  private val Seq(nt, nh, nw) = meta.shape
  private val Seq(ct, cy, cx) = meta.chunks
  // chunk extent clipped to the array shape (zarr edge chunks pad)
  private val t0 = part.tc * ct
  private val y0 = part.yc * cy
  private val x0 = part.xc * cx
  private val tLen = math.min(ct, nt - t0)
  private val yLen = math.min(cy, nh - y0)
  private val xLen = math.min(cx, nw - x0)

  private val chunkData: Map[String, Array[Double]] = vars.map(v =>
    v -> ops.readChunk(v, metas.getOrElse(v, meta),
      Seq(part.tc, part.yc, part.xc))).toMap

  // field emitters resolved once (projection order = required order)
  private val emitters: Array[(Int, Int, Int) => Any] =
    required.fields.map { f =>
      f.name match {
        case "time" => (t: Int, _: Int, _: Int) => timeUs(t0 + t)
        case "y_idx" => (_: Int, y: Int, _: Int) => y0 + y
        case "x_idx" => (_: Int, _: Int, x: Int) => x0 + x
        case "lat" => (_: Int, y: Int, _: Int) => lat(y0 + y)
        case "lon" => (_: Int, _: Int, x: Int) => lon(x0 + x)
        case v =>
          val data = chunkData(v)
          (t: Int, y: Int, x: Int) => data((t * cy + y) * cx + x)
      }
    }

  private var i = -1
  private val n = tLen * yLen * xLen
  private val row = new GenericInternalRow(required.length)

  override def next(): Boolean = { i += 1; i < n }

  override def get(): InternalRow = {
    val t = i / (yLen * xLen)
    val rem = i % (yLen * xLen)
    val y = rem / xLen
    val x = rem % xLen
    var k = 0
    while (k < emitters.length) {
      row.update(k, emitters(k)(t, y, x))
      k += 1
    }
    row
  }

  override def close(): Unit = ()
}
