package graft.sources

/** CF time-coordinate decoding (xarray's decode_cf_datetime, applied by
  * the reference when it opens any store, context.py:243-250): a time
  * variable carrying a `units` attribute of the form
  * `"<interval> since <base timestamp>"` decodes as
  * `base + value * interval`. Real-world axes are NEVER raw epoch
  * values — "days since 1970-01-01" and "seconds since 2000-01-01" are
  * the overwhelming profiles — so without this step a reader produces
  * epoch-1970 garbage dates. Only the standard/proleptic-Gregorian
  * calendar is supported (the java.time arithmetic); exotic calendars
  * (360_day, noleap) fail loudly rather than silently mis-date.
  */
private[graft] object CfTime {

  private val UnitsUs: Map[String, Double] = Map(
    "microseconds" -> 1.0, "microsecond" -> 1.0, "us" -> 1.0,
    "milliseconds" -> 1e3, "millisecond" -> 1e3, "ms" -> 1e3,
    "seconds" -> 1e6, "second" -> 1e6, "sec" -> 1e6, "secs" -> 1e6,
    "s" -> 1e6,
    "minutes" -> 60e6, "minute" -> 60e6, "min" -> 60e6, "mins" -> 60e6,
    "hours" -> 3600e6, "hour" -> 3600e6, "hr" -> 3600e6, "hrs" -> 3600e6,
    "h" -> 3600e6,
    "days" -> 86400e6, "day" -> 86400e6, "d" -> 86400e6)

  private val Pattern =
    """(?i)\s*([a-z]+)\s+since\s+(.+?)\s*""".r

  /** Some((base epoch-us, interval-us)) when `units` is a decodable CF
    * time specification. */
  def parseUnits(units: String,
                 calendar: Option[String]): Option[(Long, Double)] = {
    calendar.map(_.toLowerCase).foreach { c =>
      require(c == "standard" || c == "gregorian" ||
        c == "proleptic_gregorian",
        s"CF calendar '$c' unsupported (standard/proleptic_gregorian only)")
    }
    units match {
      case Pattern(interval, base) =>
        UnitsUs.get(interval.toLowerCase).map((parseBaseUs(base), _))
      case _ => None
    }
  }

  /** tolerant ISO-ish base-timestamp parse: date only, space or 'T'
    * separator, optional fractional seconds, optional Z/offset */
  private def parseBaseUs(s0: String): Long = {
    val s = s0.trim
    val norm = if (s.contains('T')) s else s.replaceFirst(" ", "T")
    val odt =
      try java.time.OffsetDateTime.parse(norm).toInstant
      catch {
        case _: java.time.format.DateTimeParseException =>
          try java.time.LocalDateTime.parse(norm)
            .toInstant(java.time.ZoneOffset.UTC)
          catch {
            case _: java.time.format.DateTimeParseException =>
              java.time.LocalDate.parse(norm).atStartOfDay()
                .toInstant(java.time.ZoneOffset.UTC)
          }
      }
    Math.addExact(Math.multiplyExact(odt.getEpochSecond, 1000000L),
      odt.getNano / 1000L)
  }

  /** decode raw coordinate values to epoch-microseconds (round-half-up
    * on fractional intervals, like pandas) */
  def decode(raw: Array[Double], baseUs: Long,
             intervalUs: Double): Array[Long] =
    raw.map(v => baseUs + math.round(v * intervalUs))

  /** The time axis of a store variable as epoch-microseconds: CF
    * `units` decoding when the attribute is present, raw values
    * otherwise (graft's native convention stores epoch-us directly). */
  def axisUs(textAttrs: Map[String, String],
             rawRead: => Array[Double]): Option[Array[Long]] =
    textAttrs.get("units")
      .flatMap(u => parseUnits(u, textAttrs.get("calendar")))
      .map { case (base, iv) => decode(rawRead, base, iv) }
}
