package graft.ops

import org.apache.spark.sql.DataFrame

/** Column identification: map a messy per-agency schema onto canonical
  * fields by name-pattern matching.
  *
  * Reference: openpolicedata/preproc.py:520 `_find_col_matches` and the
  * per-field match substrings at :654 (date), :750 (time), :789 (race),
  * :818 (ethnicity), :835 (age), :856 (age range), :867 (gender),
  * :893 (fatal). Matching is case-insensitive substring over column
  * names with per-field exclusions; first match wins (the reference
  * scores multiple candidates — per-source tie-breaking is out of
  * scope).
  *
  * Pure driver-side metadata work — no job is launched.
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
}
