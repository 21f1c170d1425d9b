package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Categorical standardization — the reference's converter LUTs
  * re-expressed as codegen-friendly `when` chains (no UDFs).
  *
  * Reference: openpolicedata/_converters.py — `_create_race_lut` (:293),
  * `_create_gender_lut` (:620), `_create_age_range_lut` (:146),
  * `_create_injury_lut` (:773); openpolicedata/preproc.py —
  * `standardize_columns` (:1491), `combine_race_ethnicity` (:1533),
  * `standardize_rename_only` (:1456) + `sort_columns` (:1480).
  *
  * Scale notes: all of these are narrow per-row expressions that stay
  * inside WholeStageCodegen; they add no shuffle and do not block
  * predicate pushdown on other columns.
  */
object Standardize {

  /** Exact-match LUT with a default — `std_dict` (_converters.py:908).
    * Matches case-insensitively after trim (the reference upper-cases
    * before lookup) and maps NULL to `nullOut` (the reference's
    * UNSPECIFIED class) instead of the default. */
  def mapCats(c: Column, lut: Seq[(String, String)], default: String,
              nullOut: String = "UNSPECIFIED"): Column = {
    val norm = upper(trim(c))
    val mapped = lut.foldRight(lit(default): Column) { case ((k, v), acc) =>
      when(norm === k.trim.toUpperCase(java.util.Locale.ROOT), v).otherwise(acc)
    }
    when(c.isNull, lit(nullOut)).otherwise(mapped)
  }

  /** First-matching-keyword LUT (ordered precedence) — the contains-based
    * matching used by the injury/fatal converters (_converters.py:773). */
  def keywordCat(c: Column, keywords: Seq[(String, String)], default: String): Column =
    keywords.foldRight(lit(default): Column) { case ((kw, cat), acc) =>
      when(c.contains(kw), cat).otherwise(acc)
    }

  /** Numeric value → labelled range buckets — `_create_age_range_lut`
    * (_converters.py:146). `bounds` are the inclusive-lower split points,
    * labels has size bounds.size + 1. */
  def rangeBucket(c: Column, bounds: Seq[Double], labels: Seq[String],
                  nullLabel: String = "UNSPECIFIED"): Column = {
    require(labels.size == bounds.size + 1)
    // Null guard first: without it every `c < b` is null and evaluation
    // would fall through to the top bucket (the reference returns an
    // unidentified marker for null ages, _converters.py:146).
    val bucketed = bounds.zip(labels.init).foldRight(lit(labels.last): Column) {
      case ((b, lbl), acc) => when(c < b, lbl).otherwise(acc)
    }
    when(c.isNull, lit(nullLabel)).otherwise(bucketed)
  }

  /** Precedence combine of two categorical columns —
    * `combine_race_ethnicity` (preproc.py:1533): if the secondary column
    * hits a trigger value it wins, otherwise the (standardized) primary. */
  def precedenceCombine(primary: Column, secondary: Column,
                        trigger: String, triggerOut: String): Column =
    when(secondary === trigger, triggerOut).otherwise(primary)

  /** Set-valued variant: the secondary column wins when it matches any
    * trigger value (callers pre-normalize case/whitespace). */
  def precedenceCombineIn(primary: Column, secondary: Column,
                          triggers: Seq[String], triggerOut: String): Column =
    when(secondary.isin(triggers: _*), triggerOut).otherwise(primary)

  /** Faithful `combine_race_ethnicity` (preproc.py:1553) over
    * STANDARDIZED race + ethnicity columns: in "merge" mode the
    * ethnicity wins unless it is exactly NON-LATINO; "concat" appends
    * the ethnicity to the race instead. Null eth (pre-standardization
    * should make this impossible) falls back to race. */
  def combineRaceEth(raceStd: Column, ethStd: Column, mode: String,
                     nonLatino: String = "NON-HISPANIC/NON-LATINO"): Column = mode match {
    case "merge" =>
      when(ethStd.isNull || ethStd === nonLatino, raceStd).otherwise(ethStd)
    case "concat" =>
      when(ethStd.isNull || ethStd === nonLatino, raceStd)
        .otherwise(concat(raceStd, lit(" "), ethStd))
    case other => throw new IllegalArgumentException(
      s"combine mode must be merge|concat, got $other")
  }

  /** Multi-person cell standardization — the reference's `std_dict`
    * (_converters.py:908): a delimited cell holding several people's
    * values ("BLACK, WHITE") is standardized per item and re-joined in
    * order. Cells without the delimiter go through `stdFn` unchanged. */
  def stdMulti(c: Column, delim: String, stdFn: Column => Column): Column =
    // Pattern.quote: split() takes a regex but delim is a literal — an
    // unquoted "|" would shred every cell into characters (same fix as
    // nameParts below and Expand.expandDelim)
    when(c.isNull, stdFn(c))
      .otherwise(array_join(transform(
        split(c, java.util.regex.Pattern.quote(delim)), x => stdFn(trim(x))),
        delim.trim + " "))

  /** `standardize_name` (preproc.py:1424): nulls become UNSPECIFIED;
    * cells holding several people's names split on the delimiter into
    * trimmed parts. The reference returns {index: name} dicts — the
    * array position plays the index key. */
  def nameParts(c: Column, delim: String = "/"): Column =
    when(c.isNull, array(lit("UNSPECIFIED")))
      .otherwise(transform(
        split(c, java.util.regex.Pattern.quote(delim)), x => trim(x)))
}
