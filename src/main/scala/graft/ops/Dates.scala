package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Date/time standardization — the reference's datetime parsing
  * re-expressed with Spark's codegen'd temporal functions.
  *
  * Reference: openpolicedata/datetime_parser.py —
  * `parse_date_to_datetime` (:14, multi-format tolerant parse),
  * `parse_time` (:382), `merge_date_and_time` (:206);
  * openpolicedata/preproc.py `standardize_date` (:1373) /
  * `merge_date_time` (:1406).
  *
  * ANSI-safe: uses try_to_timestamp so unparseable strings yield null
  * (the reference's NaT) instead of raising under Spark 4's default
  * ANSI mode.
  */
object Dates {

  /** Multi-format tolerant parse: first format that matches wins,
    * null (NaT) when none do. */
  def parseDateMulti(c: Column, formats: Seq[String]): Column =
    coalesce(formats.map(f => try_to_timestamp(c, lit(f))): _*).cast("date")

  /** Merge separate date and time string columns into one timestamp.
    * When the time is null/unparseable the reference's
    * `merge_date_and_time(empty_time='ignore')` falls back to the date
    * alone (datetime_parser.py:206); `emptyTimeIgnore=false` keeps the
    * strict null-propagating behavior. */
  def mergeDateTime(dateStr: Column, timeStr: Column,
                    fmt: String = "yyyy-MM-dd HH:mm:ss",
                    dateFmt: String = "yyyy-MM-dd",
                    emptyTimeIgnore: Boolean = true): Column = {
    val merged = try_to_timestamp(concat(dateStr, lit(" "), timeStr), lit(fmt))
    if (emptyTimeIgnore) coalesce(merged, try_to_timestamp(dateStr, lit(dateFmt)))
    else merged
  }

  /** Truncate a (possibly nanosecond-precision) timestamp to seconds —
    * used to canonicalize before comparisons. */
  def toSecond(c: Column): Column = date_trunc("second", c)

  /** Format fallback list covering the shapes the reference's own test
    * suite exercises (tests/test_date_parser.py:57,64 parametrizations):
    * ISO with/without time, T-separators with .000/.000Z millis, US
    * orderings with 2- or 4-digit years, "HHmm hours" military stamps,
    * month-name dates, and "+00"-offset timestamps. */
  val defaultFormats: Seq[String] = Seq(
    "yyyy-MM-dd", "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm:ssx",
    "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'", "yyyy-MM-dd'T'HH:mm:ss.SSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "MM/dd/yyyy", "M/d/yyyy",
    "MM/dd/yyyy HH:mm", "MM/dd/yyyy HHmm", "MM-dd-yyyy",
    "MMMM d, yyyy")

  /** Flexible date parse covering the reference's real-world shapes
    * (datetime_parser.py:14 `parse_date_to_datetime` and the formats in
    * tests/test_date_parser.py): epoch millis (13 digits), epoch seconds
    * (10 digits), YYYYMMDD[HHMMSS] ints — including float-rendered
    * "20200601.0" — quarterly strings ("2021-Q2" → quarter start), then
    * a format fallback list. Trailing " hours" and repeated spaces are
    * normalized first. */
  def parseDateFlexible(c: Column, formats: Seq[String] = defaultFormats): Column = {
    val s = regexp_replace(regexp_replace(regexp_replace(
      trim(c.cast("string")), "\\.0$", ""), "(?i)\\s*hours$", ""), "\\s{2,}", " ")
    val qYear = regexp_extract(s, "^(\\d{4})\\s*-?\\s*Q([1-4])$", 1).cast("int")
    val qNum = regexp_extract(s, "^(\\d{4})\\s*-?\\s*Q([1-4])$", 2).cast("int")
    when(s.rlike("^\\d{13}$"), timestamp_millis(s.cast("long")))
      .when(s.rlike("^\\d{10}$"), timestamp_seconds(s.cast("long")))
      .when(s.rlike("^\\d{14}$"), try_to_timestamp(s, lit("yyyyMMddHHmmss")))
      .when(s.rlike("^\\d{8}$"), try_to_timestamp(s, lit("yyyyMMdd")))
      .when(s.rlike("^\\d{4}\\s*-?\\s*Q[1-4]$"),
        make_timestamp(qYear, (qNum - 1) * 3 + 1, lit(1), lit(0), lit(0), lit(0)))
      // 2-digit years need their own branch: a generic "M/d/yyyy" in the
      // fallback list would parse "1/2/97" as year 0097, and Java's 'yy'
      // pivots to 2000-2099 while the reference follows the POSIX %y
      // convention (69-99 → 19xx) — so build from components.
      .when(s.rlike("^\\d{1,2}/\\d{1,2}/\\d{2}$"), {
        val m2 = regexp_extract(s, "^(\\d{1,2})/(\\d{1,2})/(\\d{2})$", 1).cast("int")
        val d2 = regexp_extract(s, "^(\\d{1,2})/(\\d{1,2})/(\\d{2})$", 2).cast("int")
        val y2 = regexp_extract(s, "^(\\d{1,2})/(\\d{1,2})/(\\d{2})$", 3).cast("int")
        val y4 = when(y2 >= 69, y2 + 1900).otherwise(y2 + 2000)
        // try_make_timestamp: the regex admits calendar-invalid cells
        // ("2/30/99", "13/5/99"), and plain make_timestamp THROWS on
        // them under default ANSI — breaking the null-on-unparseable
        // contract exactly where junk tolerance matters (column
        // identification runs this over arbitrary messy candidates)
        call_function("try_make_timestamp",
          y4, m2, d2, lit(0), lit(0), lit(0))
      })
      .otherwise(coalesce(formats.map(f => try_to_timestamp(s, lit(f))): _*))
  }

  /** Time-of-day parse (datetime_parser.py:382 `parse_time` /
    * :434 `convert_timestr_to_sec`) to a canonical "HH:mm:ss" string;
    * null when unparseable (the reference's NaT). Long tail carried
    * over from the reference:
    *   - error codes 9999/999/99, 'TIME'/'NULL'/'#NAME?'/'#VALUE!'/'-',
    *     and date-shaped strings in the time column → null;
    *   - "P M"/"A M" spacing cleanup, then all whitespace removed;
    *   - dotted "14.30.59" and semicolon-typo "14;30" separators;
    *   - colon-less AM/PM ints ("130PM" → 1:30 PM);
    *   - ISO-embedded times ("1899-12-30T21:30:00" → 21:30:00);
    *   - 1-2-digit ints are minutes ("45" → 00:45:00), 3-4-digit ints
    *     are military HHMM;
    *   - 12 AM → 00, 12 PM → 12, and the 24h+PM typo rule (hour > 12
    *     with a PM marker keeps the 24h hour);
    *   - fractional seconds drop to :00 (the reference's int() parse
    *     of "59.123" fails and leaves second unset).
    * Deviation: text times the reference raises on ("noon") → null. */
  def parseTime(c: Column): Column = {
    def two(x: Column): Column = lpad(x.cast("int").cast("string"), 2, "0")
    val t0 = upper(trim(c.cast("string")))
    val t1 = regexp_replace(regexp_replace(t0, "P\\s+M", "PM"), "A\\s+M", "AM")
    val tt = regexp_replace(t1, "\\s+", "")
    // Canonical substitutions before the main chain.
    val t = when(tt.rlike("^\\d{2};\\d{2}$"), regexp_replace(tt, ";", ":"))
      .when(tt.rlike("^\\d{1,2}\\.\\d{1,2}\\.\\d{1,2}$"), regexp_replace(tt, "\\.", ":"))
      .when(tt.rlike("T\\d{1,2}:\\d{2}"), regexp_extract(tt, "T(\\d.*)$", 1))
      .when(tt.rlike("^\\d{1,2}(AM|PM)$"), // hour-only "9PM"/"12AM"
        concat(regexp_extract(tt, "^(\\d{1,2})(AM|PM)$", 1), lit(":00"),
               regexp_extract(tt, "^(\\d{1,2})(AM|PM)$", 2)))
      .when(tt.rlike("^\\d{3,4}(AM|PM)$"),
        concat(regexp_extract(tt, "^(\\d{1,2})(\\d{2}(?:AM|PM))$", 1), lit(":"),
               regexp_extract(tt, "^(\\d{1,2})(\\d{2}(?:AM|PM))$", 2)))
      .otherwise(tt)
    val colonRe = "^(\\d{1,2}):(\\d{1,2})(:(\\d{1,2})(\\.\\d+)?)?(AM|PM)?$"
    val h = regexp_extract(t, colonRe, 1).cast("int")
    val m = regexp_extract(t, colonRe, 2).cast("int")
    val sRaw = regexp_extract(t, colonRe, 4)
    val frac = regexp_extract(t, colonRe, 5)
    val mark = regexp_extract(t, colonRe, 6)
    val hAdj = when(mark === "AM", when(h === 12, 0).otherwise(h))
      .when(mark === "PM", when(h === 12, 12).when(h > 12, h).otherwise(h + 12))
      .otherwise(h)
    // invalid (> 59) or fractional seconds drop to :00 — the reference's
    // dt.time.replace(second=...) raises for both and leaves second unset
    val sec = when(sRaw === "" || frac =!= "" || sRaw.cast("int") > 59, lit("00"))
      .otherwise(lpad(sRaw.cast("int").cast("string"), 2, "0"))
    val mil = t.cast("int")
    // the reference's midnight fix (time_col[time_col==2400]=0) runs
    // before its hour<24 validity check — 2400 means 00:00, not invalid
    when(t.isin("2400", "24:00", "24:00:00"), lit("00:00:00"))
      .when(t.isin("", "-", "9999", "999", "99", "TIME", "NULL", "#NAME?", "#VALUE!"),
        lit(null).cast("string"))
      .when(t.rlike("^\\d{1,2}[/-]\\d{1,2}[/-]\\d{2,4}"), lit(null).cast("string"))
      .when(t.rlike(colonRe),
        when(hAdj < 24 && m <= 59, concat_ws(":", two(hAdj), two(m), sec))
          .otherwise(lit(null).cast("string")))
      .when(t.rlike("^\\d{1,4}$"),
        when((mil.divide(100).cast("int") < 24) && (mil % 100 < 60),
          concat_ws(":", two(mil.divide(100).cast("int")), two(mil % 100), lit("00")))
          .otherwise(lit(null).cast("string")))
      .otherwise(lit(null).cast("string"))
  }
}
