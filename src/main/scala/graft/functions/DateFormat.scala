package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** E12 — relative/absolute date formatting (reference
  * `pyspider/libs/utils.py:72-143` `format_date`, itself lifted from
  * tornado). Reproduced as a PURE COLUMNAR expression over epoch seconds:
  * no UDF, no JVM `Calendar`/locale, no session-timezone dependence — the
  * calendar parts come from integer civil-from-days arithmetic (Gregorian,
  * proleptic) and the weekday/month names from fixed English arrays, so the
  * whole thing stays inside whole-stage codegen and is bit-identical on any
  * cluster/locale/timezone config.
  *
  * Faithfully reproduced reference quirks (all oracle-verified):
  *   - `if not date` — epoch 0 (and NULL) render as "-";
  *   - future clamping uses `(date - now).seconds` — the SECONDS COMPONENT
  *     of the timedelta, not total seconds — so any future instant a whole
  *     number of days (±60 s) ahead clamps to "1 second ago" in relative
  *     mode (`utils.py:87-95`);
  *   - minute/hour rounding is Python 3 `round` = HALF-EVEN (banker's);
  *   - `seconds`/`days` below are likewise the timedelta components:
  *     `seconds ∈ [0, 86400)`, `days` floor-divided;
  *   - hour is NOT zero-padded ("%d:%02d"), month/day in the "M-D" form are
  *     unpadded ints, `gmt_offset` is in minutes and SUBTRACTED (tornado
  *     convention: negative offset = east of GMT).
  */
object DateFormat {

  private val WEEKDAYS = Seq("Sunday", "Monday", "Tuesday", "Wednesday",
    "Thursday", "Friday", "Saturday")
  private val MONTHS = Seq("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  private val DAY = 86400L

  /** Floor(a / b) for b > 0 over epoch-scale longs. Plain long division
    * truncates toward zero; epoch days can be negative (pre-1970), so fix
    * up the sign case columnar-ly. */
  private def fdiv(a: Column, b: Long): Column = {
    val q = (a / b).cast("long") // truncating division (both sides long)
    when(a < 0 && a =!= q * b, q - 1).otherwise(q)
  }

  /** Civil calendar parts from days-since-epoch (Howard Hinnant's
    * `civil_from_days`, public-domain algorithm) — (year, month, day). */
  private def civil(z: Column): (Column, Column, Column) = {
    val zz = z + 719468L
    val era = fdiv(zz, 146097L)
    val doe = zz - era * 146097L // [0, 146096] — truncation == floor below
    val yoe = ((doe - (doe / 1460L).cast("long") + (doe / 36524L).cast("long")
      - (doe / 146096L).cast("long")) / 365L).cast("long")
    val doy = doe - (yoe * 365L + (yoe / 4L).cast("long") - (yoe / 100L).cast("long"))
    val mp = ((doy * 5L + 2L) / 153L).cast("long")
    val day = doy - ((mp * 153L + 2L) / 5L).cast("long") + 1L
    val month = mp + when(mp < 10L, 3L).otherwise(-9L)
    val year = yoe + era * 400L + when(month <= 2L, 1L).otherwise(0L)
    (year, month, day)
  }

  /** `format_date(ts, now)` — both epoch SECONDS (long, `ts` nullable).
    * `gmtOffset` in minutes, subtracted (tornado convention). */
  def formatDate(ts: Column, now: Column, gmtOffset: Int = 0,
                 relative: Boolean = true, shorter: Boolean = false,
                 fullFormat: Boolean = false): Column = {
    // future handling: clamp to now when <60 s ahead IN THE SECONDS
    // COMPONENT (the reference quirk), else force the full format
    val clamp = lit(relative) && (ts > now) && (pmod(ts - now, lit(DAY)) < 60L)
    val tsEff = when(clamp, now).otherwise(ts)
    val isFull = lit(fullFormat) || ((ts > now) && !clamp)

    val diff = now - tsEff // timedelta(now - date)
    val days = fdiv(diff, DAY) // .days (floor)
    val secs = pmod(diff, lit(DAY)) // .seconds component, [0, 86400)

    val localTs = tsEff - gmtOffset * 60L
    val localNow = now - gmtOffset * 60L
    val zTs = fdiv(localTs, DAY)
    val sod = localTs - zTs * DAY
    val (year, month, day) = civil(zTs)
    val (_, _, yday) = civil(fdiv(localNow - DAY, DAY))

    val timeStr = format_string("%d:%02d", (sod / 3600L).cast("long"),
      (pmod(sod, lit(3600L)) / 60L).cast("long"))
    val weekdayName = element_at(
      array(WEEKDAYS.map(lit): _*), (pmod(zTs + 4L, lit(7L)) + 1L).cast("int"))
    val monthName = element_at(array(MONTHS.map(lit): _*), month.cast("int"))

    def at(head: Column): Column =
      if (shorter) head else concat(head, lit(" at "), timeStr)
    val fullStr = at(concat(monthName, lit(" "), day.cast("string"),
      lit(", "), year.cast("string")))

    // half-even (banker's) rounding of secs/unit, exactly Python 3 round()
    def roundHalfEven(unit: Long): Column = {
      val q = (secs / unit).cast("long")
      val r = pmod(secs, lit(unit))
      q + when(r * 2L > unit, 1L).when(r * 2L < unit, 0L).otherwise(pmod(q, lit(2L)))
    }
    val minutes = roundHalfEven(60L)
    val hours = roundHalfEven(3600L)

    val relBranch = // relative && days == 0: always returns here
      when(secs < 50L,
        when(secs <= 1L, lit("1 second ago"))
          .otherwise(concat(secs.cast("string"), lit(" seconds ago"))))
        .when(secs < 3000L, // 50 * 60
          when(minutes <= 1L, lit("1 minute ago"))
            .otherwise(concat(minutes.cast("string"), lit(" minutes ago"))))
        .otherwise(
          when(hours <= 1L, lit("1 hour ago"))
            .otherwise(concat(hours.cast("string"), lit(" hours ago"))))

    val base = when(isFull, fullStr)
    val withRel = if (relative) base.when(days === 0L, relBranch) else base
    withRel
      .when(days === 0L, timeStr) // relative=false only (relBranch returned)
      .when(lit(relative) && days === 1L && day === yday,
        if (shorter) lit("yesterday") else concat(lit("yesterday at "), timeStr))
      .when(days < 5L, at(weekdayName))
      .when(days < 334L,
        at(concat(month.cast("string"), lit("-"), day.cast("string"))))
      .otherwise(fullStr)
  }

  /** Null/zero guard applied outermost (`if not date: return '-'`). */
  def formatDateOrDash(ts: Column, now: Column, gmtOffset: Int = 0,
                       relative: Boolean = true, shorter: Boolean = false,
                       fullFormat: Boolean = false): Column =
    when(ts.isNull || ts === 0L, lit("-"))
      .otherwise(formatDate(ts, now, gmtOffset, relative, shorter, fullFormat))
}
