package graft.sources

/** CF mask-and-scale conventions (what xarray's `mask_and_scale=True`
  * applies when the reference opens NetCDF/zarr stores,
  * xcube_server/context.py:243-250 via xr.open_dataset/open_zarr):
  * raw values equal to `_FillValue` or `missing_value` become NaN,
  * then packed values decode as `raw * scale_factor + add_offset`.
  * Real-world cubes are overwhelmingly int16-packed with these
  * attributes; without this step a reader surfaces meaningless raw
  * counts. Masking happens BEFORE scaling (fill matches the raw
  * value), exactly like xarray's conventions pipeline.
  */
private[sources] object CfScale {

  def isNoop(attrs: Map[String, Seq[Double]]): Boolean =
    !attrs.contains("_FillValue") && !attrs.contains("missing_value") &&
      !attrs.contains("scale_factor") && !attrs.contains("add_offset")

  /** apply in place and return the same array (hot path: one pass) */
  def apply(attrs: Map[String, Seq[Double]],
            arr: Array[Double]): Array[Double] = {
    if (isNoop(attrs)) return arr
    val fill = attrs.get("_FillValue").flatMap(_.headOption)
      .getOrElse(Double.NaN)
    val miss = attrs.get("missing_value").flatMap(_.headOption)
      .getOrElse(Double.NaN)
    val scale = attrs.get("scale_factor").flatMap(_.headOption).getOrElse(1.0)
    val off = attrs.get("add_offset").flatMap(_.headOption).getOrElse(0.0)
    var i = 0
    while (i < arr.length) {
      val v = arr(i)
      arr(i) = if (v == fill || v == miss) Double.NaN else v * scale + off
      i += 1
    }
    arr
  }
}
