package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native E12 `format_date` kernel (reference `pyspider/libs/utils.py:72-143`).
  *
  * Why a native expression and not the Column-composed version this replaces:
  * the civil-from-days calendar arithmetic reuses intermediates (`doe`,
  * `yoe`, `month`, `day`, `fullStr`, `timeStr`) many times each, and Catalyst
  * inlines every reuse — the composed tree grows multiplicatively through
  * each layer (fdiv→civil→names→branch chain) and the generated
  * UnsafeProjection source reached ~132 MB: janino sat 40+ minutes just
  * PARSING it (observed live in the r4 Verify run). Here the whole function
  * is one static Scala method; codegen emits a single call, so the generated
  * source is O(1) and the row cost is a handful of integer divisions.
  *
  * Semantics are bit-identical to the composed version (oracle-verified by
  * the `e12_format_date` gate + DateFormatSpec): proleptic-Gregorian civil
  * parts via Hinnant's public-domain `civil_from_days`, fixed English
  * names (no JVM locale/timezone), and all reference quirks — the
  * seconds-component future clamp, Python-3 half-even rounding, unpadded
  * hour, tornado's subtracted gmt_offset minutes. */
object DateKernels {

  private val WEEKDAYS = Array("Sunday", "Monday", "Tuesday", "Wednesday",
    "Thursday", "Friday", "Saturday")
  private val MONTHS = Array("Jan", "Feb", "Mar", "Apr", "May", "Jun",
    "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

  private val DAY = 86400L

  def formatDate(ts: Column, now: Column, gmtOffset: Int,
                 relative: Boolean, shorter: Boolean, fullFormat: Boolean): Column =
    ExpressionUtils.column(FormatDate(
      ExpressionUtils.expression(ts), ExpressionUtils.expression(now),
      gmtOffset, relative, shorter, fullFormat))

  /** (year, month, day) from days-since-epoch — Hinnant `civil_from_days`. */
  private def civil(z: Long): (Long, Long, Long) = {
    val zz = z + 719468L
    val era = Math.floorDiv(zz, 146097L)
    val doe = zz - era * 146097L // [0, 146096]
    val yoe = (doe - doe / 1460L + doe / 36524L - doe / 146096L) / 365L
    val doy = doe - (365L * yoe + yoe / 4L - yoe / 100L)
    val mp = (5L * doy + 2L) / 153L
    val day = doy - (153L * mp + 2L) / 5L + 1L
    val month = mp + (if (mp < 10L) 3L else -9L)
    val year = yoe + era * 400L + (if (month <= 2L) 1L else 0L)
    (year, month, day)
  }

  /** Python 3 round() of secs/unit: half-even (banker's). */
  private def roundHalfEven(secs: Long, unit: Long): Long = {
    val q = secs / unit
    val r = secs % unit
    q + (if (r * 2L > unit) 1L else if (r * 2L < unit) 0L else q % 2L)
  }

  /** The full reference algorithm over epoch seconds. Called once per row
    * from both the interpreted eval and the generated code. */
  def format(ts: Long, now: Long, gmtOffset: Int,
             relative: Boolean, shorter: Boolean, fullFormat: Boolean): UTF8String = {
    // future clamp: <60 s ahead IN THE SECONDS COMPONENT (the quirk)
    val clamp = relative && ts > now && Math.floorMod(ts - now, DAY) < 60L
    val tsEff = if (clamp) now else ts
    val isFull = fullFormat || (ts > now && !clamp)

    val diff = now - tsEff
    val days = Math.floorDiv(diff, DAY) // timedelta .days (floor)
    val secs = Math.floorMod(diff, DAY) // timedelta .seconds, [0, 86400)

    val localTs = tsEff - gmtOffset * 60L
    val localNow = now - gmtOffset * 60L
    val zTs = Math.floorDiv(localTs, DAY)
    val sod = localTs - zTs * DAY
    val (year, month, day) = civil(zTs)
    val yday = civil(Math.floorDiv(localNow - DAY, DAY))._3

    val timeStr = "%d:%02d".format(sod / 3600L, (sod % 3600L) / 60L)
    def at(head: String): String =
      if (shorter) head else head + " at " + timeStr
    val fullStr = at(MONTHS((month - 1).toInt) + " " + day + ", " + year)

    val out =
      if (isFull) fullStr
      else if (relative && days == 0L) {
        if (secs < 50L) {
          if (secs <= 1L) "1 second ago" else secs + " seconds ago"
        } else if (secs < 3000L) { // 50 * 60
          val m = roundHalfEven(secs, 60L)
          if (m <= 1L) "1 minute ago" else m + " minutes ago"
        } else {
          val h = roundHalfEven(secs, 3600L)
          if (h <= 1L) "1 hour ago" else h + " hours ago"
        }
      }
      else if (days == 0L) timeStr // relative=false
      else if (relative && days == 1L && day == yday)
        (if (shorter) "yesterday" else "yesterday at " + timeStr)
      else if (days < 5L) at(WEEKDAYS(Math.floorMod(zTs + 4L, 7L).toInt))
      else if (days < 334L) at(month + "-" + day)
      else fullStr
    UTF8String.fromString(out)
  }
}

/** format_date(ts, now) with the static knobs baked in; NULL ts → NULL
  * (the `'-'` guard for NULL/0 stays in the thin `when` wrapper,
  * `graft/functions/DateFormat.scala`). */
case class FormatDate(left: Expression, right: Expression, gmtOffset: Int,
    relative: Boolean, shorter: Boolean, fullFormat: Boolean)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = StringType
  override def prettyName: String = "format_date"

  override protected def nullSafeEval(ts: Any, now: Any): Any =
    DateKernels.format(ts.asInstanceOf[Long], now.asInstanceOf[Long],
      gmtOffset, relative, shorter, fullFormat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ts, now) => {
      s"""${ev.value} = org.apache.spark.sql.graft.DateKernels.format(
         |  $ts, $now, $gmtOffset, $relative, $shorter, $fullFormat);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
