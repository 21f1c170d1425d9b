package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dates, Identify, Luts, Standardizer}
import graft.sources.Loaders

class StandardizerSpec extends SparkSpec {
  import spark.implicits._

  private val messy = Seq(
    ("2020-06-01", "14:30", "W", "HISPANIC", "M", "25", "Austin PD", 1L),
    ("06/02/2020", "230", "BLACK", "NON-HISPANIC", "F", "40 AND OLDER", "Dallas Police", 2L),
    ("20200603", "2:15 PM", "UNKNOWN", null, null, null, "Austin PD", 3L)
  ).toDF("incident_date", "incident_tm", "subject_race", "subject_ethnicity",
    "subject_sex", "subject_age", "agency_name", "case_id")

  test("identifyColumns maps messy names to role-qualified canonical fields") {
    val got = Identify.identifyColumns(messy)
    assert(got("DATE") == "incident_date")
    assert(got("TIME") == "incident_tm")
    assert(got("RACE_SUBJECT") == "subject_race")
    assert(got("ETHNICITY_SUBJECT") == "subject_ethnicity")
    assert(got("GENDER_SUBJECT") == "subject_sex")
    assert(got("AGE_SUBJECT") == "subject_age")
    assert(got("AGENCY") == "agency_name")
    assert(!got.contains("FATAL"))
  }

  test("identifyColumns separates officer and subject demographics") {
    val df = Seq(("W", "B", "M")).toDF("officer_race", "subject_race", "deputy_sex")
    val got = Identify.identifyColumns(df)
    assert(got("RACE_OFFICER") == "officer_race")
    assert(got("RACE_SUBJECT") == "subject_race")
    assert(got("GENDER_OFFICER") == "deputy_sex")
  }

  test("identifyColumns rejects unknown known-column overrides") {
    intercept[IllegalArgumentException](
      Identify.identifyColumns(messy, known = Map("DATE" -> "nope")))
  }

  test("standardize: full pipeline renames, converts, merges, orders") {
    val r = Standardizer.standardize(messy)
    val df = r.df
    // standardized first, passthrough middle, RAW_ last
    assert(df.columns.head == "DATE")
    assert(df.columns.last.startsWith(Standardizer.RawPrefix))
    assert(df.columns.contains("DATETIME") && df.columns.contains("RE_GROUP_SUBJECT"))
    assert(df.columns.contains("case_id"))
    val rows = df.orderBy("case_id")
      .select("DATE", "TIME", "RACE_SUBJECT", "ETHNICITY_SUBJECT", "GENDER_SUBJECT", "DATETIME")
      .collect()
    assert(rows(0).getString(0) == "2020-06-01" && rows(0).getString(1) == "14:30:00")
    assert(rows(0).getString(2) == "WHITE" && rows(0).getString(3) == "HISPANIC/LATINO")
    assert(rows(1).getString(0) == "2020-06-02" && rows(1).getString(1) == "02:30:00")
    assert(rows(1).getString(2) == "BLACK" && rows(1).getString(3) == "NON-HISPANIC/NON-LATINO")
    assert(rows(2).getString(0) == "2020-06-03" && rows(2).getString(1) == "14:15:00")
    assert(rows(2).getString(3) == "UNSPECIFIED" && rows(2).getString(4) == "UNSPECIFIED")
    assert(rows(0).getTimestamp(5).toString == "2020-06-01 14:30:00.0")
  }

  test("standardize: source columns literally named like canonical fields survive") {
    // "Date"/"Time"/"Agency"/"Race" collide case-insensitively with the
    // canonical names; the RAW_ rename must happen BEFORE the
    // standardized withColumn or the standardized column is lost.
    val df = Seq(("2020-06-01", "14:30", "Austin PD", "W", 1L))
      .toDF("Date", "Time", "Agency", "Race", "case_id")
    val r = Standardizer.standardize(df)
    assert(r.colMap("DATE") == "Date")
    val out = r.df
    assert(out.columns.contains("DATE") && out.columns.contains("RAW_Date"))
    val row = out.select("DATE", "TIME", "AGENCY", "RACE_SUBJECT").head()
    assert(row.getString(0) == "2020-06-01" && row.getString(1) == "14:30:00")
    assert(row.getString(2) == "Austin PD" && row.getString(3) == "WHITE")
  }

  test("find_related_tables discovers sibling sub-tables with year rules") {
    import graft.catalog.Catalog
    val entries = Seq(
      ("USE OF FORCE - INCIDENTS", "2020"),
      ("USE OF FORCE - SUBJECTS", "2020"),
      ("USE OF FORCE - OFFICERS", "2020"),
      ("USE OF FORCE - SUBJECTS/OFFICERS", "MULTIPLE"),
      ("OFFICER-INVOLVED SHOOTINGS", "2020"),
      ("STOPS", "2020"))
    val rel = Catalog.findRelatedTables(entries, "USE OF FORCE - INCIDENTS", Some("2020"))
    assert(rel.map(_._1).toSet == Set("USE OF FORCE - SUBJECTS",
      "USE OF FORCE - OFFICERS", "USE OF FORCE - SUBJECTS/OFFICERS"))
    // sub_type substring vs exact match (the reference's exact_match flag)
    assert(Catalog.findRelatedTables(entries, "USE OF FORCE - INCIDENTS",
      Some("2020"), subType = Some("SUBJECTS")).map(_._1).toSet ==
      Set("USE OF FORCE - SUBJECTS", "USE OF FORCE - SUBJECTS/OFFICERS"))
    assert(Catalog.findRelatedTables(entries, "USE OF FORCE - INCIDENTS",
      Some("2020"), subType = Some("SUBJECTS"), exactMatch = true).map(_._1) ==
      Seq("USE OF FORCE - SUBJECTS"))
    // no subtype suffix → no related tables (incl. the -INVOLVED guard)
    assert(Catalog.findRelatedTables(entries, "OFFICER-INVOLVED SHOOTINGS", Some("2020")).isEmpty)
    assert(Catalog.findRelatedTables(entries, "STOPS", Some("2020")).isEmpty)
    // ambiguous years without a year argument must fail
    val dup = entries :+ ("USE OF FORCE - SUBJECTS", "2021")
    intercept[IllegalArgumentException](
      Catalog.findRelatedTables(dup, "USE OF FORCE - INCIDENTS"))
  }

  test("demographic column accessors prefer the requested role") {
    val r = Standardizer.standardize(messy)
    assert(r.raceCol().contains("RACE_SUBJECT"))
    assert(r.genderCol().contains("GENDER_SUBJECT"))
    assert(r.ageCol().contains("AGE_SUBJECT"))
    assert(r.raceCol("OFFICER").isEmpty)
  }

  test("collisions, custom date formats, age junk, regex delimiters (r6 review)") {
    // an UNCONSUMED passthrough column named like a produced canonical
    // name must be preserved under RAW_, not silently replaced
    val df = Seq(("2020-01-01", "booked", 1L))
      .toDF("arrest_date", "Date", "id")
    val r = Standardizer.standardize(df, known = Map("DATE" -> "arrest_date"),
      validateContent = false)
    assert(r.df.columns.contains("RAW_Date"), r.df.columns.mkString(","))
    assert(r.df.select("RAW_Date").head().getString(0) == "booked")
    // a pre-existing RAW_-named user column passes through under
    // keepRaw=false instead of being dropped
    val withRaw = Seq(("2020-01-01", "note", 1L))
      .toDF("arrest_date", "RAW_notes", "id")
    val r2 = Standardizer.standardize(withRaw,
      known = Map("DATE" -> "arrest_date"), validateContent = false,
      keepRaw = false)
    assert(r2.df.columns.contains("RAW_notes"))
    // caller-supplied dateFormats participate in content validation —
    // scoring with only the defaults rejected the binding
    val dotted = Seq.tabulate(20)(i => (f"${i % 28 + 1}%02d.06.2020", i))
      .toDF("incident_date", "n")
    val r3 = Standardizer.standardize(dotted,
      dateFormats = Seq("dd.MM.yyyy"))
    assert(r3.colMap.get("DATE").contains("incident_date"), r3.colMap.toString)
    assert(r3.df.select("DATE").head().getString(0) == "2020-06-01")
    // AGE runs the reference's numeric standardization (junk/range →
    // null), not a bare string cast
    val ages = Seq(("999", 1L), ("-5", 2L), ("34.4", 3L), ("junk", 4L), ("25", 5L))
      .toDF("subject_age", "id")
    val r4 = Standardizer.standardize(ages, validateContent = false).df
      .orderBy("id").select("AGE_SUBJECT").collect().map(_.getString(0))
    assert(r4.toSeq == Seq(null, null, "34", null, "25"), r4.mkString(","))
    // stdMulti treats the delimiter literally
    val multi = Seq("B|WHITE").toDF("raw")
      .select(graft.ops.Standardize.stdMulti(col("raw"), "|", Luts.raceStd(_)).as("y"))
      .as[String].head()
    assert(multi == "BLACK| WHITE", multi)
  }

  test("standardize option surface: keep_raw, merge_datetime, combo, no_id") {
    // keep_raw=False drops the RAW_ originals (test_not_keep_raw)
    val noRaw = Standardizer.standardize(messy, keepRaw = false).df
    assert(!noRaw.columns.exists(_.startsWith(Standardizer.RawPrefix)))
    assert(noRaw.columns.contains("DATE") && noRaw.columns.contains("case_id"))
    // merge_datetime=False skips DATETIME (test_merge_datetime_false)
    val noDt = Standardizer.standardize(messy, mergeDatetime = false).df
    assert(!noDt.columns.contains("DATETIME"))
    // race_eth_combo=False emits no RE_GROUP (test_race_eth_combo_false)
    val noCombo = Standardizer.standardize(messy, raceEthCombo = "false").df
    assert(!noCombo.columns.exists(_.startsWith("RE_GROUP")))
    // concat mode uses the concatenating combiner (test_race_eth_combo_concat)
    val cat = Standardizer.standardize(messy, raceEthCombo = "concat").df
    val v = cat.filter(col("case_id") === 1).select("RE_GROUP_SUBJECT").head().getString(0)
    assert(v.contains("WHITE") && v.contains("HISPANIC"), v)
    // no_id="null" blanks unrecognized categorical values (test_no_id_null)
    val df = Seq(("ZEBRA", 1L)).toDF("subject_race", "id")
    val nulled = Standardizer.standardize(df, noId = "null").df
    assert(nulled.select("RACE_SUBJECT").head().getString(0) == "")
    intercept[IllegalArgumentException](
      Standardizer.standardize(messy, raceEthCombo = "bogus"))
  }

  test("custom race/gender cats remap standard labels; bad keys rejected") {
    // test_preproc.py:152 test_race_cats — WHITE remapped to TEST moves
    // exactly the rows the standard LUT mapped to WHITE
    val df = Seq(("W", 1L), ("CAUCASIAN", 2L), ("B", 3L), ("ZEBRA", 4L))
      .toDF("subject_race", "id")
    val std = Standardizer.standardize(df).df
      .select("id", "RACE_SUBJECT").as[(Long, String)].collect().toMap
    val custom = Standardizer.standardize(df, raceCats = Map("WHITE" -> "TEST")).df
      .select("id", "RACE_SUBJECT").as[(Long, String)].collect().toMap
    std.foreach { case (id, v) =>
      assert(custom(id) == (if (v == "WHITE") "TEST" else v), s"id=$id")
    }
    assert(custom(4L) == "ZEBRA") // keep-mode passthrough untouched by remap
    // gender_cats on the same surface
    val g = Seq(("F", 1L)).toDF("subject_gender", "id")
    assert(Standardizer.standardize(g, genderCats = Map("FEMALE" -> "F_"))
      .df.select("GENDER_SUBJECT").head().getString(0) == "F_")
    // test_race_cats_bad_input — unknown category key raises
    intercept[IllegalArgumentException](
      Standardizer.standardize(df, raceCats = Map("NOT_A_CAT" -> "X")))
    // eth remap must flow through to the race+eth combiner: a remapped
    // NON-LATINO label still lets the race win in merge mode
    val both = Seq(("WHITE", "NOT HISPANIC", 1L))
      .toDF("subject_race", "subject_ethnicity", "id")
    val re = Standardizer.standardize(both,
      ethCats = Map("NON-HISPANIC/NON-LATINO" -> "NL")).df
    assert(re.select("ETHNICITY_SUBJECT").head().getString(0) == "NL")
    assert(re.select("RE_GROUP_SUBJECT").head().getString(0) == "WHITE")
  }

  test("get_transform_map records every applied conversion") {
    val r = Standardizer.standardize(messy)
    val byNew = r.transforms.map(t => t.newColumn -> t.conversion).toMap
    assert(byNew("DATE") == "date_parse" && byNew("TIME") == "time_parse")
    assert(byNew("RACE_SUBJECT") == "race_lut" && byNew("GENDER_SUBJECT") == "gender_lut")
    assert(byNew("DATETIME") == "merge_date_time")
    assert(byNew("RE_GROUP_SUBJECT") == "combine_race_ethnicity")
    // filter forms (data.py get_transform_map(orig=, new=))
    assert(r.transformMap(orig = Some("subject_race")).map(_.newColumn) == Seq("RACE_SUBJECT"))
    assert(r.transformMap(newCol = Some("TIME")).map(_.origColumn) == Seq("incident_tm"))
  }

  test("content validation rejects name-matched columns that don't parse") {
    // "status_date" name-matches DATE first but holds garbage;
    // "time_zone" name-matches TIME but holds zone codes.
    val df = Seq(
      ("CLOSED", "2020-06-01", "CST", "14:30"),
      ("OPEN", "06/02/2020", "CST", "2:15 PM"),
      ("VOID", "20200603", "MST", "230")
    ).toDF("status_date", "incident_date", "time_zone", "incident_tm")
    // name-only binding picks the first match — the wrong column
    val nameOnly = Identify.identifyColumns(df)
    assert(nameOnly("DATE") == "status_date" && nameOnly("TIME") == "time_zone")
    // content validation skips to the parseable candidates
    val validated = Identify.identifyColumnsValidated(df)
    assert(validated("DATE") == "incident_date", validated.toString)
    assert(validated("TIME") == "incident_tm", validated.toString)
    // and the full pipeline (validateContent on by default) converts them
    val out = Standardizer.standardize(df).df
    assert(out.select("DATE").collect().map(_.getString(0)).toSet
      == Set("2020-06-01", "2020-06-02", "2020-06-03"))
  }

  test("content validation drops DATE/TIME entirely when nothing parses") {
    val df = Seq(("x", "garbage", "zone")).toDF("id", "report_date", "time_zone")
    val validated = Identify.identifyColumnsValidated(df)
    assert(!validated.contains("DATE") && !validated.contains("TIME"))
  }

  test("content validation prefers the more complete datetime column") {
    // Both parse, but only one carries varying time-of-day — the
    // reference's validate_date completeness score prefers it.
    val df = Seq(
      ("2020-06-01", "2020-06-01 14:30:11"),
      ("2020-06-02", "2020-06-02 09:15:42"),
      ("2020-06-03", "2020-06-03 22:05:03")
    ).toDF("posted_date", "occurred_datetime")
    val validated = Identify.identifyColumnsValidated(df)
    assert(validated("DATE") == "occurred_datetime", validated.toString)
  }

  test("ethnicity-named columns bind to ETHNICITY, never RACE") {
    val both = Identify.identifyColumns(
      Seq(("HISPANIC", "W")).toDF("subject_ethnicity", "subject_race"))
    assert(both("ETHNICITY_SUBJECT") == "subject_ethnicity")
    assert(both("RACE_SUBJECT") == "subject_race")
    val only = Identify.identifyColumns(Seq("HISPANIC").toDF("ethnicity"))
    assert(only.get("ETHNICITY_SUBJECT").contains("ethnicity"))
    assert(!only.keys.exists(_.startsWith("RACE")))
  }

  test("age range maps ADULT/JUVENILE to the reference's full-range buckets") {
    val got = Seq("ADULT", "JUVENILE", "adult ").toDF("raw")
      .select(graft.ops.AgeRange.ageRangeStd(col("raw"))).as[String].collect()
    assert(got.toSeq == Seq("18-120", "0-17", "18-120"))
  }

  test("parseDateFlexible: epochs, int dates, quarters, format list") {
    val df = Seq("1577836800", "1577836800000", "20200601", "2021-Q3",
      "06/15/2020", "garbage").toDF("raw")
    val got = df.select(Dates.parseDateFlexible(col("raw"),
      Seq("yyyy-MM-dd", "MM/dd/yyyy")).cast("string")).as[String].collect()
    assert(got.toSeq == Seq("2020-01-01 00:00:00", "2020-01-01 00:00:00",
      "2020-06-01 00:00:00", "2021-07-01 00:00:00", "2020-06-15 00:00:00", null))
  }

  test("parseTime: 24h, military, AM/PM, invalid") {
    val df = Seq("9:05", "14:30:59", "230", "2359", "12:00 AM", "12:30 PM",
      "1:05:09 PM", "2560", "noon").toDF("raw")
    val got = df.select(Dates.parseTime(col("raw"))).as[String].collect()
    assert(got.toSeq == Seq("09:05:00", "14:30:59", "02:30:00", "23:59:00",
      "00:00:00", "12:30:00", "13:05:09", null, null))
  }

  test("parseTime long tail: error codes, separators, typos, fractions") {
    val cases = Seq(
      "9999" -> null, "999" -> null, "99" -> null, // error codes
      "TIME" -> null, "#NAME?" -> null, "-" -> null,
      "6/1/2020" -> null, // date accidentally in the time column
      "45" -> "00:45:00", "5" -> "00:05:00", // short ints are minutes
      "14;30" -> "14:30:00", // semicolon typo
      "14.30.59" -> "14:30:59", // dotted separators
      "130PM" -> "13:30:00", "1130AM" -> "11:30:00", // colon-less AM/PM
      "11:30 P M" -> "23:30:00", // split-PM cleanup
      "1899-12-30T21:30:00" -> "21:30:00", // ISO-embedded time
      "14:5" -> "14:05:00", // 1-digit minutes
      "13:30 PM" -> "13:30:00", // 24h + PM typo keeps 24h hour
      "14:30:59.123" -> "14:30:00", // fractional secs drop (reference quirk)
      "14:30:99" -> "14:30:00", // invalid seconds also drop, not null
      // the reference maps 2400 to midnight BEFORE the hour<24 check
      "2400" -> "00:00:00", "24:00" -> "00:00:00",
      "23:70" -> null, "24:30" -> null)
    val got = cases.map(_._1).toDF("raw")
      .select(Dates.parseTime(col("raw"))).as[String].collect()
    cases.zip(got).foreach { case ((in, want), g) =>
      assert(g == want, s"for '$in': got $g want $want")
    }
  }

  test("fatal and firearm LUT core vocabulary") {
    val fatal = Map("FATAL" -> "YES", "Deceased" -> "YES", "1" -> "YES",
      "NON-FATAL" -> "NO", "No Contact" -> "NO", "0" -> "NO",
      "SELF-INFLICTED" -> "SELF-INFLICTED FATAL", "" -> "UNSPECIFIED",
      "UNRESOLVED" -> "UNRESOLVED") // keep mode passes unknowns through
    fatal.foreach { case (k, want) =>
      val got = Seq(k).toDF("raw").select(Luts.fatalStd(col("raw"))).as[String].head()
      assert(got == want, s"for '$k'")
    }
    val firearm = Map("FIREARM" -> "YES", "TRUE" -> "YES", "1" -> "YES",
      "OC SPRAY" -> "NO", "canine bite" -> "NO", "DISPLAYED WEAPON" -> "NO",
      "NO FORCE" -> "NO", "0" -> "NO", "" -> "UNSPECIFIED",
      // the reference's isdigit branch: any positive integer is YES
      "2" -> "YES", "00" -> "NO")
    firearm.foreach { case (k, want) =>
      val got = Seq(k).toDF("raw").select(Luts.firearmStd(col("raw"))).as[String].head()
      assert(got == want, s"for '$k'")
    }
  }

  test("ethnicity LUT core vocabulary") {
    val cases = Map("HISPANIC" -> "HISPANIC/LATINO", "H" -> "HISPANIC/LATINO",
      "NON-HISPANIC" -> "NON-HISPANIC/NON-LATINO", "NOT HISPANIC" -> "NON-HISPANIC/NON-LATINO",
      "MIDDLE EASTERN" -> "MIDDLE EASTERN", "U" -> "UNKNOWN", "" -> "UNSPECIFIED",
      // _converters.py:269 claims NONE/NHIS for non-Latino, BEFORE the
      // unspecified set (which does not list NONE)
      "NONE" -> "NON-HISPANIC/NON-LATINO", "NHIS" -> "NON-HISPANIC/NON-LATINO")
    cases.foreach { case (k, want) =>
      val got = Seq(k).toDF("raw").select(Luts.ethStd(col("raw"))).as[String].head()
      assert(got == want, s"for '$k'")
    }
    // ethStd honors noId like every other LUT
    val e = intercept[Exception](Seq("ZEBRA").toDF("raw")
      .select(Luts.ethStd(col("raw"), noId = "error")).as[String].head())
    assert(e.getMessage.contains("Unknown value"))
    assert(Seq("ZEBRA").toDF("raw")
      .select(Luts.ethStd(col("raw"), noId = "null")).as[String].head() == "")
  }

  test("loader registry round-trips CSV with the Sources API on top") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_csv").toString
    graft.sources.Tables(spark, sfDir, "nation").write.mode("overwrite")
      .option("header", "true").csv(s"$tmp/nation.csv")
    val back = Loaders("csv").load(spark, s"$tmp/nation.csv")
    assert(back.count() == 25)
    assert(graft.sources.Sources.load(back, select = Seq("n_name")).columns.toSeq == Seq("n_name"))
    intercept[IllegalArgumentException](Loaders("xml"))
  }
}
