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
    "RACE"      -> (Seq("race", "ethnicity", "rae_full", "re_grp") -> Seq("ethnicity")),
    "ETHNICITY" -> (Seq("ethnicity", "ethnic", "nationality") -> Nil),
    "AGE_RANGE" -> (Seq("agerange", "age_range", "age range", "agegroup", "age_group") -> Nil),
    "AGE"       -> (Seq("age") -> Seq("agency", "range", "group", "average", "coverage")),
    "GENDER"    -> (Seq("g_full", "gender", "gend", "sex") -> Nil),
    "AGENCY"    -> (Seq("agency", "department", "dept") -> Nil),
    "FATAL"     -> (Seq("fatal", "fatality", "deceased", "died", "death") -> Nil),
    "INJURY"    -> (Seq("injur", "injury") -> Nil),
    "ROLE"      -> (Seq("role", "civilian_officer", "civilian or officer") -> Nil)
  )

  private def matches(colName: String, subs: Seq[String], excl: Seq[String]): Boolean = {
    val n = colName.toLowerCase
    subs.exists(n.contains) && !excl.exists(n.contains)
  }

  /** Identify the first matching source column for each canonical field.
    * `known` entries override pattern search (the reference's
    * known_col_names). */
  def identifyColumns(df: DataFrame,
                      known: Map[String, String] = Map.empty): Map[String, String] = {
    val cols = df.columns.toSeq
    known.foreach { case (f, c) =>
      require(cols.contains(c), s"Known column '$c' for $f is not in the DataFrame")
    }
    val found = fieldPatterns.flatMap { case (field, (subs, excl)) =>
      known.get(field).orElse(cols.find(matches(_, subs, excl))).map(field -> _)
    }.toMap
    // A column may only serve one canonical field (first in pattern
    // order wins) — mirrors the reference's exclude_col_names chaining.
    val seen = scala.collection.mutable.Set[String]()
    fieldPatterns.map(_._1).flatMap { f =>
      found.get(f).filter(seen.add).map(f -> _)
    }.toMap
  }
}
