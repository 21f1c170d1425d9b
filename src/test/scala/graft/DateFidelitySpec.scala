package graft

import org.apache.spark.sql.functions._
import graft.ops.Dates

/** Fidelity spec mirroring the reference's own date-parser test suite
  * (tests/test_date_parser.py): real dates from the test tables are
  * rendered in each format the reference parametrizes over, then parsed
  * back; the round trip must reproduce the original date (or datetime,
  * for time-bearing formats).
  *
  * The reference's `%#m%d%Y` (unpadded month+day+year concatenated, e.g.
  * "6152020") is intentionally unsupported: without a separator the
  * digits are ambiguous and the engine refuses to guess.
  */
class DateFidelitySpec extends SparkSpec {
  import spark.implicits._

  private def orders = graft.sources.Tables(spark, sfDir, "orders")
    .select(col("o_orderkey"), col("o_orderdate")).limit(200)

  /** test_dates_to_datetime (:57): date-only round trips. */
  private val dateOnlyFormats = Seq(
    "yyyyMMdd",           // %Y%m%d
    "MMMM d, yyyy",       // %B %#d, %Y
    "M/d/yy",             // %#m/%#d/%y
    "M/d/yyyy",           // %#m/%#d/%Y
    "MM-dd-yyyy",         // %m-%d-%Y
    "yyyy-MM-dd")         // %Y-%m-%d

  test("reference date-only formats round trip") {
    dateOnlyFormats.foreach { f =>
      val bad = orders
        .select(col("o_orderdate").cast("date").as("want"),
          Dates.parseDateFlexible(date_format(col("o_orderdate"), f)).cast("date").as("got"))
        .filter(col("want") =!= col("got") || col("got").isNull)
        .count()
      assert(bad == 0, s"format $f failed round trip")
    }
  }

  test("float-rendered int dates parse (\"20200601.0\", %Y%m%d.0)") {
    val bad = orders
      .select(col("o_orderdate").cast("date").as("want"),
        Dates.parseDateFlexible(
          concat(date_format(col("o_orderdate"), "yyyyMMdd"), lit(".0")))
          .cast("date").as("got"))
      .filter(col("want") =!= col("got") || col("got").isNull).count()
    assert(bad == 0)
  }

  test("double-space and offset-suffix formats normalize and parse") {
    // %m/%d/%Y  00:00 (double space) and %Y-%m-%d 00:00:00+00
    val df = Seq("06/15/2020  00:00", "2020-06-15 00:00:00+00").toDF("raw")
    val got = df.select(Dates.parseDateFlexible(col("raw")).cast("date").cast("string"))
      .as[String].collect()
    assert(got.toSeq == Seq("2020-06-15", "2020-06-15"))
  }

  /** test_datetimes_to_datetime (:64): time-bearing round trips. */
  test("reference datetime formats round trip with time preserved") {
    val stamped = graft.sources.Tables(spark, sfDir, "events")
      .select(date_trunc("second", col("ts")).as("want")).limit(200)
    val fmts = Seq(
      "yyyy-MM-dd HH:mm:ss",          // %Y-%m-%d %H:%M:%S
      "yyyy-MM-dd'T'HH:mm:ss.SSS",    // %Y-%m-%dT%H:%M:%S.000
      "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'", // %Y-%m-%dT%H:%M:%S.000Z
      "yyyyMMddHHmmss")               // %Y%m%d%H%M%S
    fmts.foreach { f =>
      val bad = stamped
        .select(col("want"),
          Dates.parseDateFlexible(date_format(col("want"), f)).as("got"))
        .filter(col("want") =!= col("got") || col("got").isNull).count()
      assert(bad == 0, s"format $f failed round trip")
    }
  }

  test("military 'HHmm hours' stamps parse (%m/%d/%Y %H%M hours)") {
    val df = Seq("06/15/2020 1430 hours", "06/15/2020 0005 HOURS").toDF("raw")
    val got = df.select(Dates.parseDateFlexible(col("raw")).cast("string"))
      .as[String].collect()
    assert(got.toSeq == Seq("2020-06-15 14:30:00", "2020-06-15 00:05:00"))
  }

  /** test_unix_to_datetime (:107): epoch millis. */
  test("calendar-invalid 2-digit dates null; hour-only AM/PM times parse") {
    import graft.ops.Dates
    // "2/30/99" matches the 2-digit-year regex but is not a real date:
    // must be null, not a DATETIME_FIELD_OUT_OF_BOUNDS job kill
    val parsed = Seq("2/30/99", "13/5/99", "1/2/97").toDF("raw")
      .select(Dates.parseDateFlexible(col("raw")).as("ts")).collect()
    assert(parsed(0).isNullAt(0) && parsed(1).isNullAt(0))
    assert(!parsed(2).isNullAt(0))
    // "9PM"/"12AM" previously fell through every branch to null
    val times = Seq("9PM", "12AM", "12PM").toDF("raw")
      .select(Dates.parseTime(col("raw")).as("t")).as[String].collect().toSeq
    assert(times == Seq("21:00:00", "00:00:00", "12:00:00"), times.toString)
  }

  test("epoch milliseconds round trip") {
    val stamped = graft.sources.Tables(spark, sfDir, "events")
      .select(date_trunc("second", col("ts")).as("want")).limit(100)
    val bad = stamped.select(col("want"),
        Dates.parseDateFlexible((unix_timestamp(col("want")) * 1000).cast("string")).as("got"))
      .filter(col("want") =!= col("got") || col("got").isNull).count()
    assert(bad == 0)
  }
}
