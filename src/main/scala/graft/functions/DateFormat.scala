package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** E12 — relative/absolute date formatting (reference
  * `pyspider/libs/utils.py:72-143` `format_date`, itself lifted from
  * tornado). Implemented as a native Catalyst expression
  * (`org.apache.spark.sql.graft.DateKernels`): one static call per row
  * inside whole-stage codegen — no UDF, no JVM `Calendar`/locale, no
  * session-timezone dependence. The calendar parts come from integer
  * civil-from-days arithmetic (Gregorian, proleptic) and the weekday/month
  * names from fixed English arrays, so the output is bit-identical on any
  * cluster/locale/timezone config.
  *
  * An earlier version composed the same arithmetic out of Column
  * expressions; Catalyst inlines every reuse of an intermediate, the tree
  * grew multiplicatively, and the generated projection reached ~132 MB of
  * Java (janino spent 40+ min parsing it). See DateKernels for the full
  * story — the kernel IS the fix.
  *
  * Faithfully reproduced reference quirks (all oracle-verified):
  *   - `if not date` — epoch 0 (and NULL) render as "-";
  *   - future clamping uses `(date - now).seconds` — the SECONDS COMPONENT
  *     of the timedelta, not total seconds — so any future instant a whole
  *     number of days (±60 s) ahead clamps to "1 second ago" in relative
  *     mode (`utils.py:87-95`);
  *   - minute/hour rounding is Python 3 `round` = HALF-EVEN (banker's);
  *   - `seconds`/`days` are the timedelta components: `seconds ∈ [0,
  *     86400)`, `days` floor-divided;
  *   - hour is NOT zero-padded ("%d:%02d"), month/day in the "M-D" form are
  *     unpadded ints, `gmt_offset` is in minutes and SUBTRACTED (tornado
  *     convention: negative offset = east of GMT).
  */
object DateFormat {

  /** `format_date(ts, now)` — both epoch SECONDS (long, `ts` nullable). */
  def formatDate(ts: Column, now: Column, gmtOffset: Int = 0,
                 relative: Boolean = true, shorter: Boolean = false,
                 fullFormat: Boolean = false): Column =
    org.apache.spark.sql.graft.DateKernels.formatDate(
      ts, now, gmtOffset, relative, shorter, fullFormat)

  /** Null/zero guard applied outermost (`if not date: return '-'`). */
  def formatDateOrDash(ts: Column, now: Column, gmtOffset: Int = 0,
                       relative: Boolean = true, shorter: Boolean = false,
                       fullFormat: Boolean = false): Column =
    when(ts.isNull || ts === 0L, lit("-"))
      .otherwise(formatDate(ts, now, gmtOffset, relative, shorter, fullFormat))
}
