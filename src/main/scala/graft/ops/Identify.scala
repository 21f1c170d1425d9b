package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column identification: map a messy per-agency schema onto canonical
  * fields by name-pattern matching, optionally validated by content
  * ([[identifyColumnsValidated]]).
  *
  * Reference: openpolicedata/preproc.py:520 `_find_col_matches` and the
  * per-field match substrings at :654 (date), :750 (time), :789 (race),
  * :818 (ethnicity), :835 (age), :856 (age range), :867 (gender),
  * :893 (fatal). Matching is case-insensitive substring over column
  * names with per-field exclusions; first match wins.
  *
  * [[identifyColumns]] is pure driver-side metadata work — no job is
  * launched. [[identifyColumnsValidated]] additionally runs ONE bounded
  * aggregate over a row sample to score DATE/TIME candidates by their
  * content (datetime_parser.py:230 `validate_date`, :275
  * `validate_time`), so a name-matched column whose values don't parse
  * is rejected instead of silently bound.
  */
object Identify {

  /** Canonical field → (match substrings, exclude substrings). */
  val fieldPatterns: Seq[(String, (Seq[String], Seq[String]))] = Seq(
    "DATE"      -> (Seq("datetime", "date") -> Seq("birth", "dob", "update")),
    "TIME"      -> (Seq("time", "tm", "toa") -> Seq("datetime", "times")),
    // NB: "ethnicity" is deliberately NOT a RACE match substring — an
    // ethnicity-named column must bind to ETHNICITY (next entry), never
    // RACE (pinned by IdentifySpec's binding-order test).
    "RACE"      -> (Seq("race", "rae_full", "re_grp") -> Seq("ethnicity")),
    "ETHNICITY" -> (Seq("ethnicity", "ethnic", "nationality") -> Nil),
    "AGE_RANGE" -> (Seq("agerange", "age_range", "age range", "agegroup", "age_group") -> Nil),
    "AGE"       -> (Seq("age") -> Seq("agency", "range", "group", "average", "coverage")),
    "GENDER"    -> (Seq("g_full", "gender", "gend", "sex") -> Nil),
    "AGENCY"    -> (Seq("agency", "department", "dept") -> Nil),
    "FATAL"     -> (Seq("fatal", "fatality", "deceased", "died", "death") -> Nil),
    "INJURY"    -> (Seq("injur", "injury") -> Nil),
    "ROLE"      -> (Seq("role", "civilian_officer", "civilian or officer") -> Nil)
  )

  /** Demographic fields get role-qualified canonical names
    * (RACE_SUBJECT / RACE_OFFICER — defs.py columns); the role comes
    * from the reference's officer terms (preproc.py:550). */
  val demographicFields: Set[String] =
    Set("RACE", "ETHNICITY", "AGE", "AGE_RANGE", "GENDER")
  val officerTerms: Seq[String] = Seq("officer", "deputy", "empl", "personnel")

  private def matches(colName: String, subs: Seq[String], excl: Seq[String]): Boolean = {
    val n = colName.toLowerCase
    subs.exists(n.contains) && !excl.exists(n.contains)
  }

  private def role(colName: String): String =
    if (officerTerms.exists(colName.toLowerCase.contains)) "_OFFICER" else "_SUBJECT"

  /** Identify source columns for each canonical field. Demographic
    * fields may match one column per role (subject + officer); other
    * fields take the first match. `known` entries (role-qualified or
    * base names) override pattern search (the reference's
    * known_col_names). */
  def identifyColumns(df: DataFrame,
                      known: Map[String, String] = Map.empty): Map[String, String] = {
    val cols = df.columns.toSeq
    known.foreach { case (f, c) =>
      require(cols.contains(c), s"Known column '$c' for $f is not in the DataFrame")
    }
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    val used = scala.collection.mutable.Set[String]()
    known.foreach { case (f, c) => out(f) = c; used += c }
    fieldPatterns.foreach { case (field, (subs, excl)) =>
      val hits = cols.filterNot(used.contains).filter(matches(_, subs, excl))
      if (demographicFields.contains(field)) {
        hits.foreach { c =>
          val key = field + role(c)
          if (!out.contains(key)) { out(key) = c; used += c }
        }
      } else hits.headOption.foreach { c =>
        if (!out.contains(field)) { out(field) = c; used += c }
      }
    }
    out.toMap
  }

  /** All name-pattern candidates for one field, in schema order. */
  private def candidatesFor(df: DataFrame, field: String): Seq[String] = {
    val (subs, excl) = fieldPatterns.toMap.apply(field)
    df.columns.toSeq.filter(matches(_, subs, excl))
  }

  /** Name-pattern identification plus content validation of the
    * DATE/TIME bindings (datetime_parser.py:230 `validate_date`, :275
    * `validate_time`; preproc.py validator hooks):
    *
    *   - every DATE candidate is scored on a row sample by parse rate
    *     and variability — minutes varying > hours > day > month >
    *     constant (the reference's completeness score), columns whose
    *     content doesn't parse score out entirely;
    *   - a TIME candidate must parse as a time of day AND not carry a
    *     varying date (a datetime column is "not a time column");
    *   - all candidate metrics come from ONE aggregate over
    *     `df.limit(sampleSize)` (the reference caps validation at 100k
    *     rows the same way), so validation cost is bounded regardless
    *     of table size.
    *
    * `known` bindings are trusted and never overridden. */
  def identifyColumnsValidated(df: DataFrame,
                               known: Map[String, String] = Map.empty,
                               sampleSize: Int = 1000,
                               minParseRate: Double = 0.5,
                               dateFormats: Seq[String] = Dates.defaultFormats): Map[String, String] = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    val base = identifyColumns(df, known)
    val dateCands = if (known.contains("DATE")) Nil else candidatesFor(df, "DATE")
    val timeCands = if (known.contains("TIME")) Nil else candidatesFor(df, "TIME")
    if (dateCands.isEmpty && timeCands.isEmpty) return base

    val sample = df.limit(sampleSize)
    // The multi-count_distinct aggregate below plans as an Expand with
    // one projection per distinct group. If the aggregate children were
    // the raw parse expressions, EVERY Expand projection would carry a
    // full copy of the parseDateFlexible when-chain — measured to blow
    // Janino's 64KB method limit in expand_switchCaseCode (the whole
    // stage then silently runs interpreted) and to re-parse each value
    // once per metric. So: evaluate the heavy chains ONCE per row in a
    // projection below the aggregate, and keep the cheap field
    // extraction in a SECOND projection — CollapseProject will not
    // inline the non-cheap parse chain into its six consumers, and the
    // Expand then routes bare attributes only.
    val cands = (dateCands ++ timeCands).distinct
    val parsedCols = sample.select(cands.zipWithIndex.flatMap { case (c, i) =>
      // caller-supplied formats participate in validation: scoring with
      // only the defaults would REJECT the very column custom formats
      // were supplied to parse
      // kernel renderers, not the Column chains: this projection is
      // instantiated once per CANDIDATE column, and the ~150-node
      // chains made Catalyst analysis + per-stage Janino the dominant
      // standardize() cost (SCALING.md round 10). Kernel == chain is
      // pinned by DatesKernelSpec.
      val parsed = graft.functions.GraftFunctions.parseDateFlexible(col(c), dateFormats)
      Seq(col(c).isNotNull.as(s"nn_$i"),
        parsed.as(s"p_$i"),
        graft.functions.GraftFunctions.parseTimeStd(col(c)).isNotNull.as(s"t_$i"))
    }: _*)
    val fields = parsedCols.select(cands.indices.flatMap { i =>
      Seq(col(s"nn_$i"), col(s"t_$i"),
        col(s"p_$i").isNotNull.as(s"np_$i"),
        minute(col(s"p_$i")).as(s"min_$i"),
        hour(col(s"p_$i")).as(s"hour_$i"),
        dayofmonth(col(s"p_$i")).as(s"day_$i"),
        month(col(s"p_$i")).as(s"mon_$i"),
        to_date(col(s"p_$i")).as(s"date_$i"))
    }: _*)
    val aggCols = cands.zipWithIndex.flatMap { case (c, i) =>
      Seq(
        count(when(col(s"nn_$i"), 1)).as(s"n_$c"),
        count(when(col(s"np_$i"), 1)).as(s"np_$c"),
        count_distinct(col(s"min_$i")).as(s"nmin_$c"),
        count_distinct(col(s"hour_$i")).as(s"nhour_$c"),
        count_distinct(col(s"day_$i")).as(s"nday_$c"),
        count_distinct(col(s"mon_$i")).as(s"nmon_$c"),
        count(when(col(s"t_$i"), 1)).as(s"nt_$c"),
        count_distinct(col(s"date_$i")).as(s"ndate_$c"))
    }
    val m = fields.agg(aggCols.head, aggCols.tail: _*).head()
    def g(name: String): Long = m.getAs[Long](name)

    // validate_date scoring: 5 = minutes vary … 1 = parses but constant.
    def dateScore(c: String): Int = {
      val nonNull = g(s"n_$c")
      if (nonNull == 0 || g(s"np_$c").toDouble / nonNull < minParseRate) 0
      else if (g(s"nmin_$c") > 1) 5
      else if (g(s"nhour_$c") > 1) 4
      else if (g(s"nday_$c") > 1) 3
      else if (g(s"nmon_$c") > 1) 2
      else 1
    }
    // validate_time: must parse as time-of-day; a varying date part
    // means the column holds datetimes, not times.
    def timeOk(c: String): Boolean = {
      val nonNull = g(s"n_$c")
      nonNull > 0 && g(s"nt_$c").toDouble / nonNull >= minParseRate &&
        g(s"ndate_$c") <= 1
    }

    val out = scala.collection.mutable.Map[String, String]() ++= base
    val taken = scala.collection.mutable.Set[String]() ++=
      (base - "DATE" - "TIME").values
    // BOTH known bindings are claimed up front: DATE scoring runs
    // first, and a declared TIME column (e.g. an event_datetime the
    // caller pinned) scores 5 on the date metrics — without this it
    // would be re-bound as DATE over the real date column
    known.get("DATE").foreach(taken += _)
    known.get("TIME").foreach(taken += _)
    if (!known.contains("DATE")) {
      val scored = dateCands.filterNot(taken.contains).map(c => c -> dateScore(c))
        .filter(_._2 > 0)
      // maxBy keeps the FIRST candidate at the maximal score — the
      // schema-order tie-break.
      val best = if (scored.isEmpty) None else Some(scored.maxBy(_._2)._1)
      best match {
        case Some(c) => out("DATE") = c; taken += c
        case None    => out.remove("DATE")
      }
    } else taken += known("DATE")
    if (!known.contains("TIME")) {
      timeCands.filterNot(taken.contains).find(timeOk) match {
        case Some(c) => out("TIME") = c; taken += c
        case None    => out.remove("TIME")
      }
    }
    out.toMap
  }
}
