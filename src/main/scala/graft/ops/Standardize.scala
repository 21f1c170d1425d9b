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

  /** Exact-match LUT with a default — `std_dict` (_converters.py:908). */
  def mapCats(c: Column, lut: Seq[(String, String)], default: String): Column =
    lut.foldRight(lit(default): Column) { case ((k, v), acc) =>
      when(c === k, v).otherwise(acc)
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
  def rangeBucket(c: Column, bounds: Seq[Double], labels: Seq[String]): Column = {
    require(labels.size == bounds.size + 1)
    bounds.zip(labels.init).foldRight(lit(labels.last): Column) {
      case ((b, lbl), acc) => when(c < b, lbl).otherwise(acc)
    }
  }

  /** Precedence combine of two categorical columns —
    * `combine_race_ethnicity` (preproc.py:1533): if the secondary column
    * hits a trigger value it wins, otherwise the (standardized) primary. */
  def precedenceCombine(primary: Column, secondary: Column,
                        trigger: String, triggerOut: String): Column =
    when(secondary === trigger, triggerOut).otherwise(primary)
}
