package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.Dates

/** Pins kernel ≡ Column-chain for the date/time parsers: the kernels
  * exist purely for plan size (one node vs ~150 per candidate column),
  * so any divergence from the chains — whose semantics the DuckDB
  * oracle replays — is a correctness bug, not a tuning choice. */
class DatesKernelSpec extends SparkSpec {
  import spark.implicits._

  private val dateProbes: Seq[String] = Seq(
    // epoch shapes
    "1577836800", "1577836800000", "20200601", "20200601.0", "20200601123456",
    // quarters, with the spacing variants the regex admits
    "2021-Q2", "2021 Q2", "2021Q4", "2021 - Q1", "2020-Q5",
    // 2-digit-year US dates incl. POSIX pivot edges and invalid calendars
    "1/2/97", "12/31/69", "1/1/68", "2/30/99", "13/5/99", "0/5/99",
    // the fallback format list, one sample each
    "2020-06-01", "2020-06-01 10:11:12", "2020-06-01 10:11:12+00",
    "2020-06-01T10:11:12.000Z", "2020-06-01T10:11:12.000", "2020-06-01T10:11:12",
    "06/01/2020", "6/1/2020", "06/01/2020 10:11", "06/01/2020 1011",
    "06-01-2020", "June 1, 2020",
    // normalization tail: trailing .0, " hours", doubled spaces
    "2020-06-01  10:11:12", "1200 hours", "1200 HOURS", "20200601.0 ",
    // junk
    "", " ", "N/A", "not a date", "99999999999999999999", "2020-13-45",
    null)

  private val timeProbes: Seq[String] = Seq(
    "10:11:12", "1:2:3", "10:11", "9PM", "12AM", "12PM", "130PM", "1130AM",
    "0945", "945", "45", "7", "2400", "24:00", "24:00:00", "23:59:60",
    "14.30.59", "14;30", "10:11:12.5", "10:61", "25:00", "#NAME?", "TIME",
    "9999", "999", "99", "-", "", "1899-12-30T21:30:00", "12/31/2020",
    "1-2-99", "P M", "9 P M", "10:11:12 PM", "10:11PM", "noon", null)

  // NOTE every comparison below runs the chain and the kernel in
  // SEPARATE queries: fusing a ~150-node chain and its kernel twin in
  // one projection is exactly the Janino-64KB bloat the kernels exist
  // to remove — the fused form trips the compile failure the
  // CodegenGuard (correctly) fails the suite on.

  test("parse_date_flexible kernel equals the Column chain on the adversarial corpus") {
    GraftFunctions.ensureRegistered(spark)
    val df = dateProbes.toDF("s")
    val chain = df.select(
      Dates.parseDateFlexible(col("s")).cast("long")).collect().map(_.get(0))
    val kernel = df.select(
      GraftFunctions.parseDateFlexible(col("s"), Dates.defaultFormats)
        .cast("long")).collect().map(_.get(0))
    dateProbes.indices.foreach { i =>
      assert(chain(i) == kernel(i),
        s"date kernel diverges on '${dateProbes(i)}': chain=${chain(i)} kernel=${kernel(i)}")
    }
  }

  test("parse_time_std kernel equals the Column chain on the adversarial corpus") {
    GraftFunctions.ensureRegistered(spark)
    val df = timeProbes.toDF("s")
    val chain = df.select(Dates.parseTime(col("s"))).collect().map(_.get(0))
    val kernel = df.select(
      GraftFunctions.parseTimeStd(col("s"))).collect().map(_.get(0))
    timeProbes.indices.foreach { i =>
      assert(chain(i) == kernel(i),
        s"time kernel diverges on '${timeProbes(i)}': chain=${chain(i)} kernel=${kernel(i)}")
    }
  }

  test("kernels agree with the chains over the events corpus (end-to-end shapes)") {
    GraftFunctions.ensureRegistered(spark)
    // real testdata date/time-ish strings: event ts rendered several ways
    val ev = graft.sources.Tables(spark, sfDir, "events")
      .select(col("event_id"),
        date_format(col("ts"), "M/d/yy").as("d1"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("d2"),
        date_format(col("ts"), "HH:mm").as("t1"),
        date_format(col("ts"), "hmm").as("t2"))
    def run(f: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
            cols: Seq[String]): Map[(Long, String), Any] =
      cols.flatMap { c =>
        ev.select(col("event_id"), f(col(c)))
          .collect().map(r => (r.getLong(0), c) -> r.get(1))
      }.toMap
    val dChain = run(c => Dates.parseDateFlexible(c).cast("long"), Seq("d1", "d2"))
    val dKernel = run(c => GraftFunctions
      .parseDateFlexible(c, Dates.defaultFormats).cast("long"), Seq("d1", "d2"))
    assert(dChain == dKernel)
    val tChain = run(Dates.parseTime(_), Seq("t1", "t2"))
    val tKernel = run(GraftFunctions.parseTimeStd(_), Seq("t1", "t2"))
    assert(tChain == tKernel)
    assert(dChain.nonEmpty && tChain.nonEmpty)
  }
}
