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
}
