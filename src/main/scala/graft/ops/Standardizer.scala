package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The full standardization pipeline — the reference's
  * `Table.standardize` (openpolicedata/data.py:682 → preproc.py:1456
  * `standardize_rename_only`, :1480 `sort_columns`, :1491
  * `standardize_columns`) as one DataFrame → DataFrame transform:
  *
  *   1. identify source columns by name patterns ([[Identify]])
  *   2. copy them to canonical names (originals kept under RAW_ prefix,
  *      the reference's _OLD_COLUMN_INDICATOR behavior)
  *   3. apply the categorical LUTs ([[Luts]], [[AgeRange]])
  *   4. parse/merge date + time ([[Dates]])
  *   5. order columns: standardized first, untouched passthroughs next,
  *      RAW_ originals last
  *
  * Everything is a stack of narrow per-row projections — single scan
  * stage, no shuffle, safe at any scale.
  */
object Standardizer {

  val RawPrefix = "RAW_"

  final case class Result(df: DataFrame, colMap: Map[String, String])

  /** Standardize every identified field. `validateContent` (on by
    * default, as in the reference) re-scores DATE/TIME bindings against
    * a row sample so a name-matched column whose values don't parse is
    * rejected — see [[Identify.identifyColumnsValidated]]. */
  def standardize(df: DataFrame,
                  known: Map[String, String] = Map.empty,
                  dateFormats: Seq[String] = Dates.defaultFormats,
                  validateContent: Boolean = true): Result = {
    val colMap =
      if (validateContent) Identify.identifyColumnsValidated(df, known)
      else Identify.identifyColumns(df, known)

    def convert(field: String, src: Column): Column =
      field.stripSuffix("_SUBJECT").stripSuffix("_OFFICER") match {
        case "RACE"      => Luts.raceStd(src)
        case "ETHNICITY" => Luts.ethStd(src)
        case "GENDER"    => Luts.genderStd(src)
        case "INJURY"    => Luts.injuryStd(src)
        case "FATAL"     => Luts.fatalStd(src)
        case "ROLE"      => Luts.roleStd(src)
        case "AGE_RANGE" => AgeRange.ageRangeStd(src)
        case "AGE"       => src.cast("string")
        // date-only canonical string ("yyyy-MM-dd") so the DATETIME
        // merge below can re-parse it with the default formats
        case "DATE"      => Dates.parseDateFlexible(src, dateFormats).cast("date").cast("string")
        case "TIME"      => Dates.parseTime(src)
        case _           => src
      }

    val stdCols = colMap.toSeq.sortBy { f =>
      val base = f._1.stripSuffix("_SUBJECT").stripSuffix("_OFFICER")
      (Identify.fieldPatterns.indexWhere(_._1 == base), f._1)
    }
    // Move originals to RAW_ names BEFORE writing standardized columns.
    // Spark resolves withColumn case-insensitively by default, so a
    // source column literally named "Date"/"Agency" would otherwise be
    // REPLACED in place by withColumn("DATE", ...) and the later rename
    // pass would then strip the standardized column away (leaving the
    // final select to fail). Renaming first makes the canonical names
    // always-free and keeps every consumed original under RAW_.
    var out = df
    colMap.values.toSeq.distinct.foreach(c =>
      out = out.withColumnRenamed(c, RawPrefix + c))
    stdCols.foreach { case (field, srcName) =>
      out = out.withColumn(field, convert(field, col(RawPrefix + srcName)))
    }
    // DATE+TIME merge when both present (preproc.py:1406 merge_date_time)
    if (colMap.contains("DATE") && colMap.contains("TIME"))
      out = out.withColumn("DATETIME",
        Dates.mergeDateTime(col("DATE"), col("TIME")))
    // RE_GROUP per role: merged race+ethnicity when both present, else
    // race (preproc.py:1533 combine_race_ethnicity + re_group aliasing)
    Seq("_SUBJECT", "_OFFICER").foreach { r =>
      if (colMap.contains("RACE" + r) && colMap.contains("ETHNICITY" + r))
        out = out.withColumn("RE_GROUP" + r,
          Standardize.combineRaceEth(col("RACE" + r), col("ETHNICITY" + r), "merge"))
      else if (colMap.contains("RACE" + r))
        out = out.withColumn("RE_GROUP" + r, col("RACE" + r))
    }

    // Order columns canonically (originals already carry RAW_ names).
    val stdNames = stdCols.map(_._1) ++
      Seq("DATETIME", "RE_GROUP_SUBJECT", "RE_GROUP_OFFICER").filter(out.columns.contains)
    val rawNames = out.columns.filter(_.startsWith(RawPrefix)).toSeq
    val passthru = out.columns.filterNot(c => stdNames.contains(c) || rawNames.contains(c)).toSeq
    Result(out.select((stdNames ++ passthru ++ rawNames).map(col): _*), colMap)
  }
}
