package graft

import org.apache.spark.sql.functions._
import graft.ops._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- Standardize -----------------------------------------------------

  test("mapCats matches case-insensitively after trim, null → UNSPECIFIED") {
    val lut = Seq("W" -> "WHITE", "B" -> "BLACK")
    val got = Seq(Some(" w "), Some("B"), Some("zz"), None).toDF("x")
      .select(Standardize.mapCats(col("x"), lut, default = "KEEP").as("y"))
      .as[String].collect()
    assert(got.toSeq == Seq("WHITE", "BLACK", "KEEP", "UNSPECIFIED"))
  }

  test("rangeBucket: nulls do NOT fall into the top bucket") {
    val got = Seq(Some(5.0), Some(30.0), Some(90.0), None).toDF("x")
      .select(Standardize.rangeBucket(col("x"), Seq(18, 65), Seq("child", "adult", "senior")).as("y"))
      .as[String].collect()
    assert(got.toSeq == Seq("child", "adult", "senior", "UNSPECIFIED"))
  }

  test("precedenceCombineIn: trigger wins, otherwise primary") {
    val df = Seq(("WHITE", "HISPANIC"), ("BLACK", "NO")).toDF("race", "eth")
    val got = df.select(Standardize.precedenceCombineIn(
      col("race"), col("eth"), Seq("HISPANIC"), "LATINO").as("y")).as[String].collect()
    assert(got.toSeq == Seq("LATINO", "BLACK"))
  }

  // ---- Luts ------------------------------------------------------------

  test("race LUT core vocabulary") {
    val cases = Map(
      "WHITE" -> "WHITE", "w" -> "WHITE", "CAUCASIAN" -> "WHITE",
      "B" -> "BLACK", "african american" -> "BLACK",
      "ASIAN" -> "ASIAN", "ASIAN/PACIFIC ISLANDER" -> "ASIAN/PACIFIC ISLANDER",
      "HAWAIIAN" -> "HAWAIIAN/PACIFIC ISLANDER",
      "HISPANIC" -> "HISPANIC/LATINO", "AMERICAN INDIAN" -> "INDIGENOUS",
      "TWO OR MORE" -> "MULTIPLE", "OTH/UNK" -> "OTHER OR UNKNOWN",
      "UNK" -> "UNKNOWN", "OTHER" -> "OTHER", "MISSING" -> "UNSPECIFIED",
      "ZEBRA" -> "ZEBRA")
    val got = cases.keys.toSeq.map(k =>
      k -> Seq(k).toDF("raw").select(Luts.raceStd(col("raw"))).as[String].head())
    got.foreach { case (k, v) => assert(v == cases(k), s"for '$k'") }
  }

  test("rulesToColumnLut equals the plain when-chain on vocab, noise, and near-misses") {
    import graft.ops.Luts
    import graft.ops.Luts.{ContainsAny, InSet, Rule}
    val ruleSets = Seq(
      "race" -> Luts.raceRules, "gender" -> Luts.genderRules,
      "eth" -> Luts.ethRules, "injury" -> Luts.injuryRules,
      "fatal" -> Luts.fatalRules, "firearm" -> Luts.firearmRules,
      "role" -> Luts.roleRules)
    for ((label, rules) <- ruleSets) {
      // every exact vocab value, every contains-substring (fires the
      // residual path), mutations that miss the map but graze matchers,
      // plus generic junk and the empty string
      val vocab = rules.flatMap(_.anyOf).flatMap {
        case InSet(vs, _) => vs
        case ContainsAny(ss, _) => ss.map(s => s"PRE $s POST")
        case _ => Nil
      }
      val probes = (vocab ++ vocab.map(_ + " X") ++ vocab.map("Z" + _) ++
        Seq("", " ", "GARBAGE", "NO DATA HERE", "1", "X Y Z")).distinct
      val df = probes.toDF("x")
      val got = df.select(
          Luts.rulesToColumnLut(rules, col("x"), lit("ORIG")).as("lut"),
          Luts.rulesToColumn(rules, col("x"), lit("ORIG")).as("chain"))
        .collect()
      probes.zip(got).foreach { case (p, row) =>
        assert(row.getString(0) == row.getString(1),
          s"$label diverges on '$p': lut=${row.getString(0)} chain=${row.getString(1)}")
      }
    }
  }

  test("race agg fallbacks and per-source code tables") {
    val agg = Map("CHINESE" -> "ASIAN", "SAMOAN" -> "HAWAIIAN/PACIFIC ISLANDER",
      "WHITE HISPANIC" -> "HISPANIC/LATINO", "MEXICAN" -> "HISPANIC/LATINO",
      "BOSNIAN" -> "WHITE", "NON-HISPANIC" -> "NON-HISPANIC")
    agg.foreach { case (k, want) =>
      val got = Seq(k).toDF("raw").select(Luts.raceStd(col("raw"))).as[String].head()
      assert(got == want, s"for '$k'")
    }
    val bySource = Seq(
      ("Chicago", "BLK", "BLACK"), ("Chicago", "API", "ASIAN/PACIFIC ISLANDER"),
      ("Los Angeles", "K", "ASIAN"), ("Los Angeles", "S", "HAWAIIAN/PACIFIC ISLANDER"),
      ("Los Angeles", "Z", "SOUTH ASIAN"), ("New York City", "Q", "HISPANIC/LATINO"),
      ("California", "4", "MIDDLE EASTERN/SOUTH ASIAN"), ("Lincoln", "3", "HISPANIC/LATINO"),
      ("Dallas", "L", "HISPANIC/LATINO"), ("Nowhere", "W", "WHITE"))
    bySource.foreach { case (src, raw, want) =>
      val got = Seq(raw).toDF("raw")
        .select(Luts.raceStdForSource(col("raw"), src)).as[String].head()
      assert(got == want, s"for source=$src raw='$raw'")
    }
  }

  test("race/gender LUTs map null to UNSPECIFIED") {
    val df = Seq(Option.empty[String]).toDF("raw")
    assert(df.select(Luts.raceStd(col("raw"))).as[String].head() == "UNSPECIFIED")
    assert(df.select(Luts.genderStd(col("raw"))).as[String].head() == "UNSPECIFIED")
    assert(df.select(Luts.injuryStd(col("raw"))).as[String].head() == "UNSPECIFIED")
  }

  test("gender LUT handles punctuation/space-stripped variants") {
    val cases = Map("M" -> "MALE", "male/man" -> "MALE", "F" -> "FEMALE",
      "NON-BINARY" -> "GENDER NON-BINARY",
      "TRANSGENDER MALE" -> "TRANSGENDER MALE",
      "GENDER NON-CONFORMING" -> "TRANSGENDER OR GENDER NON-CONFORMING",
      "NO DATA" -> "UNSPECIFIED")
    cases.foreach { case (k, want) =>
      val got = Seq(k).toDF("raw").select(Luts.genderStd(col("raw"))).as[String].head()
      assert(got == want, s"for '$k'")
    }
  }

  test("injury LUT: keywords, label strips, numerics") {
    val cases = Map("3 - LACERATION" -> "INJURED", "OFFICER INJURED" -> "INJURED",
      "Killed" -> "FATAL", "No" -> "NO INJURY", "0" -> "NO INJURY",
      "1" -> "INJURED", "SUICIDE" -> "SELF-INFLICTED FATAL",
      "COMPLAINT OF PAIN" -> "INJURED",
      // the reference's isdigit branch: ANY positive integer
      "6" -> "INJURED", "12" -> "INJURED", "00" -> "NO INJURY",
      // is_fatal (_converters.py:805): YES + fatal word, no nonfatal word
      "Yes - Deceased" -> "FATAL",
      "Yes, injured and later deceased" -> "INJURED", // nonfatal word wins
      "SELF INFLICTED GUNSHOT WOUND" -> "SELF-INFLICTED INJURY",
      // leading count strip (_converters.py:793): scalar, not two rows
      "1 No Injury" -> "NO INJURY", "2 Unknown" -> "UNKNOWN",
      // expanded keyword list
      "TWISTED KNEE" -> "INJURED", "LOSS OF TOOTH" -> "INJURED")
    cases.foreach { case (k, want) =>
      val got = Seq(k).toDF("raw").select(Luts.injuryStd(col("raw"))).as[String].head()
      assert(got == want, s"for '$k'")
    }
  }

  test("age range normalization") {
    val cases = Map("25 - 34" -> "25-34", "OVER 65" -> "65-120", "65+" -> "65-120",
      "UNDER 21" -> "0-21", "20S" -> "20-29", "B - 18-29" -> "18-29",
      "25" -> "25-34", "7" -> "0-17", "" -> "UNSPECIFIED",
      "ADULT" -> "18-120", "JUVENILE" -> "0-17",
      // 10-digit junk bucketed like the reference's arbitrary-precision
      // int — an ANSI int cast used to kill the job here
      "9999999999" -> "65-120")
    cases.foreach { case (k, want) =>
      val got = Seq(k).toDF("raw").select(AgeRange.ageRangeStd(col("raw"))).as[String].head()
      assert(got == want, s"for '$k'")
    }
  }

  test("no_id modes: keep passes through, null blanks, error raises") {
    val df = Seq("GLORP").toDF("raw")
    assert(df.select(Luts.raceStd(col("raw"), "keep")).as[String].head() == "GLORP")
    assert(df.select(Luts.raceStd(col("raw"), "null")).as[String].head() == "")
    intercept[Exception](df.select(Luts.raceStd(col("raw"), "error")).as[String].head())
    intercept[IllegalArgumentException](Luts.raceStd(col("raw"), "bogus"))
  }

  test("combineRaceEth merge and concat modes follow the reference") {
    val df = Seq(("BLACK", "NON-HISPANIC/NON-LATINO"), ("BLACK", "HISPANIC/LATINO"),
      ("WHITE", "UNKNOWN")).toDF("r", "e")
    val merged = df.select(Standardize.combineRaceEth(col("r"), col("e"), "merge"))
      .as[String].collect()
    assert(merged.toSeq == Seq("BLACK", "HISPANIC/LATINO", "UNKNOWN"))
    val concat = df.select(Standardize.combineRaceEth(col("r"), col("e"), "concat"))
      .as[String].collect()
    assert(concat.toSeq == Seq("BLACK", "BLACK HISPANIC/LATINO", "WHITE UNKNOWN"))
    intercept[IllegalArgumentException](Standardize.combineRaceEth(col("r"), col("e"), "x"))
  }

  test("stdMulti standardizes each person in a delimited cell") {
    val df = Seq(Some("B, WHITE"), Some("ASIAN"), None).toDF("raw")
    val got = df.select(Standardize.stdMulti(col("raw"), ",", Luts.raceStd(_)).as("y"))
      .as[String].collect()
    assert(got.toSeq == Seq("BLACK, WHITE", "ASIAN", "UNSPECIFIED"))
  }

  test("role LUT and per-source gender codes") {
    val roles = Map("Officer" -> "OFFICER", "CIVILIAN" -> "SUBJECT",
      "Citizen" -> "SUBJECT", "SUBJECT" -> "SUBJECT", "" -> "UNSPECIFIED")
    roles.foreach { case (k, want) =>
      assert(Seq(k).toDF("raw").select(Luts.roleStd(col("raw"))).as[String].head() == want, s"role '$k'")
    }
    val genders = Seq(("California", "3", "TRANSGENDER MALE"),
      ("California", "5", "TRANSGENDER OR GENDER NON-CONFORMING"),
      ("Lincoln", "2", "FEMALE"), ("New York City", "Z", "UNKNOWN"),
      ("Nowhere", "F", "FEMALE"))
    genders.foreach { case (src, raw, want) =>
      val got = Seq(raw).toDF("raw")
        .select(Luts.genderStdForSource(col("raw"), src)).as[String].head()
      assert(got == want, s"gender source=$src raw='$raw'")
    }
  }

  test("fatal and firearm yes/no LUTs") {
    val fatal = Map("FATAL" -> "YES", "Deceased" -> "YES", "non-fatal" -> "NO",
      "N" -> "NO", "SELF-INFLICTED" -> "SELF-INFLICTED FATAL", "1" -> "YES")
    fatal.foreach { case (k, want) =>
      assert(Seq(k).toDF("raw").select(Luts.fatalStd(col("raw"))).as[String].head() == want, s"fatal '$k'")
    }
    val firearm = Map("FIREARM" -> "YES", "TRUE" -> "YES", "OC SPRAY" -> "NO",
      "CANINE UNIT" -> "NO", "0" -> "NO")
    firearm.foreach { case (k, want) =>
      assert(Seq(k).toDF("raw").select(Luts.firearmStd(col("raw"))).as[String].head() == want, s"firearm '$k'")
    }
  }

  // ---- Dates -----------------------------------------------------------

  test("parseDateMulti: first matching format wins, null when none") {
    val df = Seq("01/02/1997", "19970203", "1997-02-04", "garbage").toDF("raw")
    val got = df.select(Dates.parseDateMulti(col("raw"),
      Seq("MM/dd/yyyy", "yyyyMMdd", "yyyy-MM-dd")).cast("string").as("d"))
      .as[String].collect()
    assert(got.toSeq == Seq("1997-01-02", "1997-02-03", "1997-02-04", null))
  }

  test("mergeDateTime: empty time falls back to date when ignoring") {
    val df = Seq(("2021-05-01", Some("10:30:00")), ("2021-05-02", None)).toDF("d", "t")
    val ignore = df.select(Dates.mergeDateTime(col("d"), col("t")).cast("string").as("m"))
      .as[String].collect()
    assert(ignore.toSeq == Seq("2021-05-01 10:30:00", "2021-05-02 00:00:00"))
    val strict = df.select(Dates.mergeDateTime(col("d"), col("t"), emptyTimeIgnore = false)
      .cast("string").as("m")).as[String].collect()
    assert(strict.toSeq == Seq("2021-05-01 10:30:00", null))
  }

  // ---- Expand ----------------------------------------------------------

  test("expandDelim keeps rows whose cell is null") {
    val df = Seq((1, Some("a,b")), (2, None)).toDF("id", "cell")
    val got = Expand.expandDelim(df, "cell", ",", "v").orderBy("id", "v").collect()
    assert(got.length == 3)
    assert(got.map(r => (r.getInt(0), r.getAs[String]("v"))).toSeq ==
      Seq((1, "a"), (1, "b"), (2, null)))
  }

  test("regex-metachar delimiters split literally; absurd counts keep whole") {
    // "|" as a regex matches the empty string — the literal split must
    // not shred cells into characters
    val df = Seq((1, "BLACK|WHITE")).toDF("id", "cell")
    val got = Expand.expandDelim(df, "cell", "|", "v")
      .select("v").as[String].collect().toSeq
    assert(got == Seq("BLACK", "WHITE"), got.toString)
    // an 11-digit count would CAST_OVERFLOW under ANSI (and a merely
    // large one would materialize a billion-element array) — the cell
    // passes through whole, like expandInjuryCounts' guard
    val big = Expand.expandCounts(
        Seq((1, "99999999999 - Black")).toDF("id", "cell"), "cell", "v", "p")
      .select("v").as[String].collect().toSeq
    assert(big == Seq("99999999999 - Black"))
  }

  test("detectMultiValue finds only the delimited columns") {
    val df = Seq(("B, W", "M", "20, 30"), ("A", "F", "40"), ("W", "M", "50"))
      .toDF("race", "sex", "ages")
    val got = Expand.detectMultiValue(df, Seq("race", "sex", "ages"), ",")
    assert(got == Seq("race", "ages"))
  }

  test("expandDelimPos does not corrupt pre-existing pos/col columns") {
    val df = Seq((1, "x", "a,b")).toDF("id", "pos", "cell")
    val got = Expand.expandDelimPos(df, "cell", ",", "v", "item_num")
      .orderBy("item_num").collect()
    assert(got.map(r => (r.getAs[String]("pos"), r.getAs[Int]("item_num"), r.getAs[String]("v"))).toSeq ==
      Seq(("x", 0, "a"), ("x", 1, "b")))
  }

  test("expandCounts: count-annotated cells explode per person; plain cells pass through") {
    val df = Seq((1, "2 - Black 1 - White"), (2, "White"), (3, null: String))
      .toDF("id", "cell")
    val got = Expand.expandCounts(df, "cell", "value", "item_num")
      .orderBy("id", "item_num")
      .as[(Int, Option[Int], Option[String])].collect().toSeq
    assert(got === Seq(
      (1, Some(0), Some("Black")), (1, Some(1), Some("Black")),
      (1, Some(2), Some("White")),
      (2, Some(0), Some("White")),
      (3, Some(0), None)))
    // a zero count contributes NOTHING (Spark's sequence(1, 0) is the
    // descending [1, 0] — the guard must keep it from emitting twice)
    val zero = Expand.expandCounts(
        Seq((1, "0 - White 1 - Black")).toDF("id", "cell"),
        "cell", "value", "item_num")
      .as[(Int, Option[Int], Option[String])].collect().toSeq
    assert(zero === Seq((1, Some(0), Some("Black"))))
  }

  test("expandWithNames: code after whitespace or Ê; itemNum picks race vs gender") {
    val df = Seq((1, "John Doe W/M; Jane Roe B/F"), (2, "LeeÊAA/F"),
      (3, "plain")).toDF("id", "cell")
    def run(i: Int) = Expand.expandWithNames(df, "cell", "v", "item_num", i)
      .orderBy("id", "item_num").as[(Int, Option[Int], Option[String])].collect().toSeq
    assert(run(0) === Seq((1, Some(0), Some("W")), (1, Some(1), Some("B")),
      (2, Some(0), Some("AA")), (3, Some(0), Some("plain"))))
    assert(run(1).map(_._3) === Seq(Some("M"), Some("F"), Some("F"), Some("plain")))
  }

  test("expandInjuryCounts: converter-guided greedy parse with counts") {
    val df = Seq(
      (1, "2 Injured 1 Deceased"),       // counts multiply items
      (2, "Deceased Injured"),           // bare multi-item, converter splits
      (3, "No Injury"),                  // whole cell standardizes: scalar
      (4, "Complaint Of Pain"),          // multi-word single item
      (5, "2 Gibberish Xyz"),            // unparseable leftover: falls back whole
      (6, null: String)
    ).toDF("id", "cell")
    val got = Expand.expandInjuryCounts(df, "cell", "v", "item_num")
      .orderBy("id", "item_num")
      .as[(Int, Option[Int], Option[String])].collect().toSeq
    val byId = got.groupBy(_._1).view.mapValues(_.map(_._3.orNull)).toMap
    def std(s: String) = graft.ops.Luts.injuryStdStrict(s).get
    assert(byId(1) === Seq(std("Injured"), std("Injured"), std("Deceased")))
    assert(byId(2) === Seq(std("Deceased"), std("Injured")))
    assert(byId(3) === Seq(std("No Injury")))
    assert(byId(4) === Seq(std("Complaint Of Pain")))
    assert(byId(5) === Seq("2 Gibberish Xyz")) // kept whole
    assert(byId(6) === Seq(null))
    // reference quirks + robustness: a digit-only cell is scalar
    // INJURED (the isdigit branch, _converters.py:776 — any positive
    // integer, not just 1-5), trailing counts are ignored, absurd
    // counts keep whole
    val quirks = Expand.expandInjuryCounts(
        Seq((1, "6"), (2, "2 Injured 1"), (3, "99999999999 Injured"))
          .toDF("id", "cell"), "cell", "v", "item_num")
      .orderBy("id", "item_num")
      .as[(Int, Option[Int], Option[String])].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._3.orNull)).toMap
    assert(quirks(1) === Seq(std("6")))
    assert(quirks(2) === Seq(std("Injured"), std("Injured")))
    assert(quirks(3) === Seq("99999999999 Injured"))
  }

  test("expandInjuryCounts: parse map builds distributed, no driver jobs") {
    // the r4 verdict's scale fix: the greedy parse must run as a
    // Dataset map over the distinct values, not a distinct().collect()
    // on the driver — constructing the operator must launch ZERO jobs
    // (the old implementation ran the distinct eagerly at build time).
    var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val df = Seq((1, "2 Injured 1 Deceased"), (2, "Fatal")).toDF("id", "cell")
      val expanded = Expand.expandInjuryCounts(df, "cell", "v", "item_num")
      Thread.sleep(300) // listener events post async; a collect-at-build
                        // would surface its JobStart well within this
      assert(jobs === 0, "operator construction must not run driver jobs")
      assert(expanded.orderBy("id", "item_num").as[(Int, Option[Int], Option[String])]
        .collect().map(_._3.orNull).toSeq ===
        Seq("INJURED", "INJURED", "FATAL", "FATAL"))
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("nameParts: null → UNSPECIFIED, '/' cells split into trimmed parts") {
    val df = Seq((1, null: String), (2, "John Doe"), (3, " Jane Roe / John Doe "),
      (4, "A/B/C")).toDF("id", "raw")
    val got = df.select(col("id"), Standardize.nameParts(col("raw")).as("p"))
      .orderBy("id").as[(Int, Seq[String])].collect()
    assert(got(0)._2 === Seq("UNSPECIFIED"))
    assert(got(1)._2 === Seq("John Doe"))
    assert(got(2)._2 === Seq("Jane Roe", "John Doe"))
    assert(got(3)._2 === Seq("A", "B", "C"))
  }

  test("standardizeAge: coercion, sentinel-min, range clamp, half-even round, zero -> null") {
    val df = Seq(
      (1, "25"), (2, "junk"), (3, "-5"), (4, "150"), (5, "0"),
      (6, "-9999"),          // lone sub-(-1000) sentinel -> null
      (7, "33.4"), (8, "0.5") // half-even: 0.5 -> 0 -> null
    ).toDF("id", "raw")
    val got = AgeRange.standardizeAge(df, "id", "raw")
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getInt(1))).toSeq
    assert(got === Seq(Some(25), None, None, None, None, None, Some(33), None))
    // a REPEATED sub-(-1000) value is NOT the pandas sentinel fix: it
    // nulls via the range rule all the same, but so does -999
    val rep = Seq((1, "-9999"), (2, "-9999"), (3, "40")).toDF("id", "raw")
    val got2 = AgeRange.standardizeAge(rep, "id", "raw")
      .orderBy("id").collect()
      .map(r => if (r.isNullAt(1)) None else Some(r.getInt(1))).toSeq
    assert(got2 === Seq(None, None, Some(40)))
    // empty sentinel set (no row < -1000): the 1-row aggregate still
    // produces a row, ages flow through
    val clean = Seq((1, "18")).toDF("id", "raw")
    assert(AgeRange.standardizeAge(clean, "id", "raw").head().getInt(1) === 18)
  }

  // ---- Mat -------------------------------------------------------------

  test("Mat.releasable: values preserved, blocks tracked, release drops exactly them") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val (m1, rel1) = Mat.releasable(
      Seq(1, 2, 3).toDF("x").select(col("x"), (col("x") * 2).as("y")))
    val mine = sc.getPersistentRDDs.keySet -- before
    assert(mine.nonEmpty, "localCheckpoint must register persistent blocks")
    // the materialized frame is a fresh leaf (no upstream lineage to
    // re-run) and carries the same rows
    assert(m1.queryExecution.optimizedPlan.collectLeaves().forall(
      _.getClass.getSimpleName.contains("LogicalRDD")))
    assert(m1.orderBy("x").collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
      === Seq((1, 2), (2, 4), (3, 6)))
    // a SECOND mat derived from the first stays readable after the
    // first is released (the iterative-loop pattern: release supersedes)
    val (m2, rel2) = Mat.releasable(m1.filter(col("x") > 1))
    rel1()
    // unpersist is async; poll briefly for the tracked ids to drop
    val deadline = System.nanoTime() + 10e9.toLong
    while (sc.getPersistentRDDs.keySet.intersect(mine).nonEmpty &&
           System.nanoTime() < deadline) Thread.sleep(50)
    assert(sc.getPersistentRDDs.keySet.intersect(mine).isEmpty,
      "release() must unpersist exactly the checkpoint's blocks")
    assert(m2.count() === 2, "a later mat must survive releasing its parent")
    rel2()
  }

  test("Mat.releasable never sweeps a user cache materialized by the checkpoint job") {
    val sc = spark.sparkContext
    // LAZY cache: its InMemoryRelation buffer persists for the first
    // time INSIDE the checkpoint job below — the naive before/after
    // diff would claim it and release() would silently drop the
    // user's cached data
    val lookup = Seq((1, "a"), (2, "b")).toDF("k", "v").cache()
    val before = sc.getPersistentRDDs.keySet
    val (m, rel) = Mat.releasable(lookup.select(col("k") * 2 as "k2"))
    val newIds = sc.getPersistentRDDs.keySet -- before
    assert(m.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 4))
    rel()
    val deadline = System.nanoTime() + 10e9.toLong
    while (newIds.exists(id => sc.getPersistentRDDs.contains(id) &&
             sc.getPersistentRDDs(id).isCheckpointed) &&
           System.nanoTime() < deadline) Thread.sleep(50)
    // the cache's buffer RDD (persisted during the job, NOT checkpointed)
    // must still be registered after release
    val survivors = sc.getPersistentRDDs.keySet.intersect(newIds)
    assert(survivors.exists(id => !sc.getPersistentRDDs(id).isCheckpointed),
      s"user cache was swept (surviving new ids: $survivors)")
    lookup.unpersist()
  }
}
