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

  /** One applied conversion — the reference's transform record
    * (data.py:548 `get_transform_map`): which original column became
    * which standardized column, via which conversion. */
  final case class Transform(field: String, origColumn: String,
                             newColumn: String, conversion: String)

  final case class Result(df: DataFrame, colMap: Map[String, String],
                          transforms: Seq[Transform] = Nil) {
    /** `get_transform_map(orig=, new=)`: filter the applied-conversion
      * log by original and/or standardized column name. */
    def transformMap(orig: Option[String] = None,
                     newCol: Option[String] = None): Seq[Transform] =
      transforms.filter(t => orig.forall(_ == t.origColumn) &&
        newCol.forall(_ == t.newColumn))

    /** `Table.get_race_col`/`get_gender_col`/`get_age_col` (data.py):
      * the standardized column name for a demographic field, preferring
      * the requested role ("SUBJECT"/"OFFICER"). */
    def stdCol(field: String, role: String = "SUBJECT"): Option[String] =
      Seq(s"${field}_$role", field).find(colMap.contains)
    def raceCol(role: String = "SUBJECT"): Option[String] = stdCol("RACE", role)
    def genderCol(role: String = "SUBJECT"): Option[String] = stdCol("GENDER", role)
    def ageCol(role: String = "SUBJECT"): Option[String] =
      stdCol("AGE", role).orElse(stdCol("AGE_RANGE", role))
  }

  /** Standardize every identified field, with the reference's option
    * surface (exercised by its tests/test_preproc.py):
    *   - `validateContent` (on by default) re-scores DATE/TIME bindings
    *     against a row sample — see
    *     [[Identify.identifyColumnsValidated]];
    *   - `keepRaw` (preproc keep_raw): false drops the RAW_ originals
    *     from the output;
    *   - `mergeDatetime` (merge_datetime): false skips the DATE+TIME →
    *     DATETIME merge;
    *   - `raceEthCombo` (race_eth_combo): "merge" | "concat" build
    *     RE_GROUP via [[Standardize.combineRaceEth]]; "false" emits no
    *     combined column;
    *   - `noId` (no_id): "keep" | "null" | "error" for unrecognized
    *     categorical values, passed to every LUT;
    *   - `raceCats` / `ethCats` / `genderCats` (race_cats/eth_cats/
    *     gender_cats): caller-supplied output labels for standard
    *     categories, unknown keys rejected — see [[Luts.remapCats]]. */
  def standardize(df: DataFrame,
                  known: Map[String, String] = Map.empty,
                  dateFormats: Seq[String] = Dates.defaultFormats,
                  validateContent: Boolean = true,
                  keepRaw: Boolean = true,
                  mergeDatetime: Boolean = true,
                  raceEthCombo: String = "merge",
                  noId: String = "keep",
                  raceCats: Map[String, String] = Map.empty,
                  ethCats: Map[String, String] = Map.empty,
                  genderCats: Map[String, String] = Map.empty): Result = {
    graft.functions.GraftFunctions.ensureRegistered(df.sparkSession)
    require(Seq("merge", "concat", "false").contains(raceEthCombo),
      s"raceEthCombo must be merge|concat|false, got $raceEthCombo")
    val colMap =
      if (validateContent)
        Identify.identifyColumnsValidated(df, known, dateFormats = dateFormats)
      else Identify.identifyColumns(df, known)

    def convert(field: String, src: Column): (Column, String) =
      field.stripSuffix("_SUBJECT").stripSuffix("_OFFICER") match {
        case "RACE"      => Luts.remapCats(Luts.raceStd(src, noId), raceCats,
          Luts.catValues(Luts.raceRules), "race") -> "race_lut"
        case "ETHNICITY" => Luts.remapCats(Luts.ethStd(src, noId), ethCats,
          Luts.catValues(Luts.ethRules), "ethnicity") -> "ethnicity_lut"
        case "GENDER"    => Luts.remapCats(Luts.genderStd(src, noId), genderCats,
          Luts.catValues(Luts.genderRules), "gender") -> "gender_lut"
        case "INJURY"    => Luts.injuryStd(src, noId) -> "injury_lut"
        case "FATAL"     => Luts.fatalStd(src, noId) -> "fatal_lut"
        case "ROLE"      => Luts.roleStd(src, noId) -> "role_lut"
        case "AGE_RANGE" => AgeRange.ageRangeStd(src) -> "age_range_lut"
        case "AGE"       => {
          // the reference's _standardize_age scalar path (preproc.py
          // :2131-2146, same rules as AgeRange.standardizeAge): numeric
          // coercion (junk → null), [0, 120] range-null, half-even
          // round, age 0 → null — previously the column was only
          // string-cast, passing junk the reference would have nulled
          val d = when(trim(src.cast("string")).rlike("^[-+]?\\d+(\\.\\d+)?$"),
            trim(src.cast("string")).cast("double"))
          when(d.isNull, lit(null).cast("string"))
            .when(d < 0 || d > 120, lit(null).cast("string"))
            .when(bround(d) === 0, lit(null).cast("string"))
            .otherwise(bround(d).cast("int").cast("string")) -> "age_std"
        }
        // date-only canonical string ("yyyy-MM-dd") so the DATETIME
        // merge below can re-parse it with the default formats
        // kernels (one node per parse; DatesKernelSpec pins == chain)
        case "DATE"      => graft.functions.GraftFunctions
          .parseDateFlexible(src, dateFormats).cast("date").cast("string") -> "date_parse"
        case "TIME"      => graft.functions.GraftFunctions.parseTimeStd(src) -> "time_parse"
        case _           => src -> "rename"
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
    // produced canonical names, for the collision sweep below
    val producedNames = (stdCols.map(_._1) ++
      Seq("DATETIME", "RE_GROUP_SUBJECT", "RE_GROUP_OFFICER")).map(_.toLowerCase)
    val consumed = colMap.values.toSeq.distinct
    // UNCONSUMED passthrough columns whose names case-insensitively
    // collide with a produced canonical name would be silently
    // REPLACED by the withColumn below (Spark resolves
    // case-insensitively) — move them to RAW_ too, data preserved
    val collisions = df.columns.toSeq
      .filterNot(consumed.contains)
      .filter(c => producedNames.contains(c.toLowerCase))
    val renamedToRaw = consumed ++ collisions
    renamedToRaw.foreach { c =>
      require(!df.columns.contains(RawPrefix + c),
        s"standardize: input already has a column '${RawPrefix + c}' — " +
          s"renaming '$c' would create a duplicate; rename one first")
    }
    renamedToRaw.foreach(c => out = out.withColumnRenamed(c, RawPrefix + c))
    val log = Seq.newBuilder[Transform]
    stdCols.foreach { case (field, srcName) =>
      val (converted, kind) = convert(field, col(RawPrefix + srcName))
      out = out.withColumn(field, converted)
      log += Transform(field, srcName, field, kind)
    }
    // DATE+TIME merge when both present (preproc.py:1406 merge_date_time)
    if (mergeDatetime && colMap.contains("DATE") && colMap.contains("TIME")) {
      out = out.withColumn("DATETIME",
        Dates.mergeDateTime(col("DATE"), col("TIME")))
      log += Transform("DATETIME", colMap("DATE") + "+" + colMap("TIME"),
        "DATETIME", "merge_date_time")
    }
    // RE_GROUP per role: combined race+ethnicity when both present, else
    // race (preproc.py:1533 combine_race_ethnicity + re_group aliasing)
    if (raceEthCombo != "false") Seq("_SUBJECT", "_OFFICER").foreach { r =>
      if (colMap.contains("RACE" + r) && colMap.contains("ETHNICITY" + r)) {
        // the ethnicity column already carries any custom labels, so the
        // combiner must compare against the REMAPPED non-Latino label
        val nonLatino = ethCats.getOrElse("NON-HISPANIC/NON-LATINO",
          "NON-HISPANIC/NON-LATINO")
        out = out.withColumn("RE_GROUP" + r,
          Standardize.combineRaceEth(col("RACE" + r), col("ETHNICITY" + r),
            raceEthCombo, nonLatino))
        log += Transform("RE_GROUP" + r,
          colMap("RACE" + r) + "+" + colMap("ETHNICITY" + r),
          "RE_GROUP" + r, "combine_race_ethnicity")
      } else if (colMap.contains("RACE" + r)) {
        out = out.withColumn("RE_GROUP" + r, col("RACE" + r))
        log += Transform("RE_GROUP" + r, colMap("RACE" + r), "RE_GROUP" + r, "alias")
      }
    }

    // Order columns canonically (originals already carry RAW_ names;
    // keepRaw=false drops them, the reference's keep_raw=False).
    val stdNames = stdCols.map(_._1) ++
      Seq("DATETIME", "RE_GROUP_SUBJECT", "RE_GROUP_OFFICER").filter(out.columns.contains)
    // track the RAW_ names WE created — a pre-existing input column
    // that happens to be named RAW_something is ordinary user data and
    // must pass through (keyed off the prefix it was silently dropped
    // under keepRaw=false)
    val rawSet = renamedToRaw.map(RawPrefix + _).toSet
    val rawNames = if (keepRaw) out.columns.filter(rawSet.contains).toSeq else Nil
    val passthru = out.columns.filterNot(c => stdNames.contains(c) ||
      rawSet.contains(c)).toSeq
    Result(out.select((stdNames ++ passthru ++ rawNames).map(col): _*), colMap, log.result())
  }
}
