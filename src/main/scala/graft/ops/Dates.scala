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

  /** Flexible date parse covering the reference's real-world shapes
    * (datetime_parser.py:14): epoch millis (13 digits), epoch seconds
    * (10 digits), YYYYMMDD ints (8 digits), quarterly strings
    * ("2021-Q2" → quarter start), then the caller's format list. */
  def parseDateFlexible(c: Column, formats: Seq[String]): Column = {
    val s = trim(c.cast("string"))
    val qYear = regexp_extract(s, "^(\\d{4})\\s*-?\\s*Q([1-4])$", 1).cast("int")
    val qNum = regexp_extract(s, "^(\\d{4})\\s*-?\\s*Q([1-4])$", 2).cast("int")
    when(s.rlike("^\\d{13}$"), timestamp_millis(s.cast("long")))
      .when(s.rlike("^\\d{10}$"), timestamp_seconds(s.cast("long")))
      .when(s.rlike("^\\d{8}$"), try_to_timestamp(s, lit("yyyyMMdd")))
      .when(s.rlike("^\\d{4}\\s*-?\\s*Q[1-4]$"),
        make_timestamp(qYear, (qNum - 1) * 3 + 1, lit(1), lit(0), lit(0), lit(0)))
      .otherwise(coalesce(formats.map(f => try_to_timestamp(s, lit(f))): _*))
  }

  /** Time-of-day parse (datetime_parser.py:382 `parse_time`) to a
    * canonical "HH:mm:ss" string: 24h "H:mm[:ss]", military "HMM"/
    * "HHMM" ints, and "h:mm[:ss] AM/PM"; null when unparseable. */
  def parseTime(c: Column): Column = {
    val t = upper(trim(c.cast("string")))
    def two(x: Column): Column = lpad(x.cast("int").cast("string"), 2, "0")
    val mil = t.cast("int")
    val milOk = t.rlike("^\\d{3,4}$") &&
      (mil.divide(100).cast("int") < 24) && (mil % 100 < 60)
    val ampmH = regexp_extract(t, "^(\\d{1,2}):(\\d{2})(:(\\d{2}))?\\s*(AM|PM)$", 1).cast("int")
    val ampmM = regexp_extract(t, "^(\\d{1,2}):(\\d{2})(:(\\d{2}))?\\s*(AM|PM)$", 2)
    val ampmS = regexp_extract(t, "^(\\d{1,2}):(\\d{2})(:(\\d{2}))?\\s*(AM|PM)$", 4)
    val ampmMark = regexp_extract(t, "^(\\d{1,2}):(\\d{2})(:(\\d{2}))?\\s*(AM|PM)$", 5)
    val h24 = when(ampmMark === "AM", when(ampmH === 12, 0).otherwise(ampmH))
      .otherwise(when(ampmH === 12, 12).otherwise(ampmH + 12))
    when(t.rlike("^\\d{1,2}:\\d{2}:\\d{2}$"),
        concat_ws(":", two(split(t, ":").getItem(0)), split(t, ":").getItem(1), split(t, ":").getItem(2)))
      .when(t.rlike("^\\d{1,2}:\\d{2}$"),
        concat_ws(":", two(split(t, ":").getItem(0)), split(t, ":").getItem(1), lit("00")))
      .when(milOk, concat_ws(":", two(mil.divide(100).cast("int")), two(mil % 100), lit("00")))
      .when(t.rlike("^(\\d{1,2}):(\\d{2})(:(\\d{2}))?\\s*(AM|PM)$"),
        concat_ws(":", two(h24), ampmM, when(ampmS === "", "00").otherwise(ampmS)))
      .otherwise(lit(null).cast("string"))
  }
}
