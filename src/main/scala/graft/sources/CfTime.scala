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
        // this IS a time spec — an interval we can't decode (months,
        // years: calendar-dependent lengths) must fail loudly, never
        // fall back to raw values that would silently mis-date rows
        val iv = UnitsUs.getOrElse(interval.toLowerCase,
          throw new IllegalArgumentException(
            s"CF time interval '$interval' unsupported " +
              "(us/ms/s/min/h/day; months and years are calendar-dependent)"))
        Some((parseBaseUs(base), iv))
      case _ => None
    }
  }

  // CF base timestamps are looser than strict ISO: single-digit date
  // and time components ("2000-1-1 0:0:0", the CF spec's own examples),
  // space or 'T' separators, optional fractional seconds, optional
  // Z/UTC/±H[H][:MM] offsets
  private val Base = ("""(\d{1,4})-(\d{1,2})-(\d{1,2})""" +
    """(?:[T ](\d{1,2}):(\d{1,2})(?::(\d{1,2})(\.\d+)?)?)?""" +
    """(?:\s*(?:Z|UTC|([+-]\d{1,2})(?::?(\d{2}))?))?""").r

  private def parseBaseUs(s0: String): Long = s0.trim match {
    case Base(y, mo, d, h, mi, se, frac, offH, offM) =>
      val ldt = java.time.LocalDateTime.of(y.toInt, mo.toInt, d.toInt,
        Option(h).map(_.toInt).getOrElse(0),
        Option(mi).map(_.toInt).getOrElse(0),
        Option(se).map(_.toInt).getOrElse(0))
      val localUs = Math.addExact(Math.multiplyExact(
        ldt.toEpochSecond(java.time.ZoneOffset.UTC), 1000000L),
        Option(frac).map(f => math.round(f.toDouble * 1e6)).getOrElse(0L))
      val offUs = Option(offH).map { oh =>
        val sign = if (oh.startsWith("-")) -1L else 1L
        val hours = oh.drop(1).toLong
        val mins = Option(offM).map(_.toLong).getOrElse(0L)
        sign * (hours * 3600L + mins * 60L) * 1000000L
      }.getOrElse(0L)
      localUs - offUs // local-with-offset → UTC
    case other => throw new IllegalArgumentException(
      s"unparseable CF base timestamp '$other'")
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
