package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Age-range normalization — the reference's `_create_age_range_lut`
  * (openpolicedata/_converters.py:146) re-expressed as a codegen-friendly
  * conditional chain, with a matching DuckDB SQL rendering for the
  * oracle.
  *
  * Canonical output is "lo-hi" (e.g. "18-24"):
  *   "25 - 34"  → "25-34"      (range spacing normalized)
  *   "OVER 65"  → "65-120"     (p_over)
  *   "18+"      → "18-120"     (p_plus), "18 PLUS" (p_plus2)
  *   "60 AND OLDER" → "60-120" (p_above)
  *   "UNDER 21" → "0-21"       (p_under)
  *   "17 AND YOUNGER" → "0-17" (p_under2)
  *   "20S"      → "20-29"      (p_decade)
  *   "ADULT"    → "18-120", "JUVENILE" → "0-17" (_converters.py:180)
  *   plain age number → bucketed (engine-defined census-style bins)
  *   null/blank/missing → UNSPECIFIED
  * Unrecognized values pass through unchanged (no_id="keep").
  *   "1 TO 17"  → "1-17"       (p_range2)
  *
  * Known scope cut vs the reference: per-source exception tables are
  * not carried (no live per-agency datasets in this build).
  */
object AgeRange {

  private val bounds = Seq(18, 25, 35, 45, 55, 65)
  private val labels = Seq("0-17", "18-24", "25-34", "35-44", "45-54", "55-64", "65-120")

  def ageRangeStd(raw: Column): Column = {
    // Strip a leading single-letter category label ("B - 18-29" style)
    // then upper + trim — _converters.py:186.
    // Capture-group form (not lookahead) so the same pattern runs on
    // DuckDB's RE2 oracle side.
    val x = trim(regexp_replace(upper(trim(raw)), "^[A-Z]\\s*-\\s*(\\d)", "$1"))
    val decade = regexp_extract(x, "^(\\d+)0S$", 1).cast("int") * 10
    // long, not int: a 10-digit junk age would throw CAST_OVERFLOW
    // under ANSI instead of bucketing to 65-120 like the reference's
    // arbitrary-precision int(x); the digit branch below is capped at
    // 18 digits so the long cast itself can never overflow
    val n = x.cast("long")
    val bucketed = bounds.zip(labels.init).foldRight(lit(labels.last): Column) {
      case ((b, lbl), acc) => when(n < b, lbl).otherwise(acc)
    }
    when(raw.isNull, lit(Luts.UNSPECIFIED))
      .when(x.isin("", "MISSING", "N/A", "NA", "UNKNOWN", "NOT SPECIFIED"), lit(Luts.UNSPECIFIED))
      .when(x.rlike("^\\d+\\s*-\\s*\\d+$"),
            regexp_replace(x, "^(\\d+)\\s*-\\s*(\\d+)$", "$1-$2"))
      .when(x.rlike("^\\d+\\s*TO\\s*\\d+$"),
            regexp_replace(x, "^(\\d+)\\s*TO\\s*(\\d+)$", "$1-$2"))
      .when(x.rlike("^(OVER|>)\\s*\\d+$"),
            regexp_replace(x, "^(OVER|>)\\s*(\\d+)$", "$2-120"))
      .when(x.rlike("^\\d+\\s*(\\+|PLUS)$"),
            regexp_replace(x, "^(\\d+)\\s*(\\+|PLUS)$", "$1-120"))
      .when(x.rlike("^\\d+\\s*(AND|&)\\s*(ABOVE|OLDER)$"),
            regexp_replace(x, "^(\\d+)\\s*(AND|&)\\s*(ABOVE|OLDER)$", "$1-120"))
      .when(x.rlike("^(UNDER|<|BELOW)\\s*\\d+$"),
            regexp_replace(x, "^(UNDER|<|BELOW)\\s*(\\d+)$", "0-$2"))
      .when(x.rlike("^\\d+\\s*(AND|&)\\s*(UNDER|YOUNGER)$"),
            regexp_replace(x, "^(\\d+)\\s*(AND|&)\\s*(UNDER|YOUNGER)$", "0-$1"))
      .when(x.rlike("^\\d+0S$"),
            concat(decade.cast("string"), lit("-"), (decade + 9).cast("string")))
      .when(x === "ADULT", lit("18-120"))
      .when(x === "JUVENILE", lit("0-17"))
      .when(x.rlike("^\\d{1,18}$"), bucketed)
      .otherwise(x)
  }

  /** Single-value age standardization — the reference's
    * `_standardize_age` scalar path (openpolicedata/preproc.py:2131):
    * numeric coercion (junk → null), out-of-range [0, 120] → null
    * (which subsumes the reference's lone sub-(-1000) sentinel fix,
    * preproc.py:2132 — see the in-body note), rounded (half-even,
    * pandas Series.round), and age 0 → null (preproc.py:2146). The
    * reference's conversion-rate validation heuristics belong to
    * column BINDING and live in ops/Identify.
    *
    * Scale shape: pure scan-stage expressions — no aggregate, no
    * join. Returns (idCol, age int). */
  def standardizeAge(df: DataFrame, idCol: String, rawCol: String): DataFrame = {
    // try_cast: junk strings coerce to null (ANSI-safe), like pandas
    // to_numeric(errors="coerce").
    //
    // The reference's lone sub-(-1000) sentinel fix (preproc.py:2132)
    // is SUBSUMED here: every value it can null is < -1000 < 0 and is
    // nulled by the [0, 120] range check regardless of its count, so
    // the output is bit-identical without the extra min/count
    // aggregation pass the earlier implementation ran per call.
    val base = df.select(col(idCol),
      expr(s"try_cast(`$rawCol` as double)").as("__n"))
    base
      .select(col(idCol),
        when(col("__n").isNull, lit(null))
          .when(col("__n") < 0 || col("__n") > 120, lit(null))
          .when(bround(col("__n")) === 0, lit(null))
          .otherwise(bround(col("__n")))
          .cast("int").as("age"))
  }

  /** Matching DuckDB SQL over a column literally named `raw`. */
  val ageRangeStdSql: String = {
    val x = "trim(regexp_replace(upper(trim(raw)), '^[A-Z]\\s*-\\s*(\\d)', '\\1'))"
    val n = s"CAST($x AS BIGINT)"
    val decade = s"(CAST(regexp_extract($x, '^(\\d+)0S$$', 1) AS INT) * 10)"
    val bucketed = bounds.zip(labels.init).foldRight(s"'${labels.last}'") {
      case ((b, lbl), acc) => s"CASE WHEN $n < $b THEN '$lbl' ELSE $acc END"
    }
    s"""CASE
       |  WHEN raw IS NULL THEN '${Luts.UNSPECIFIED}'
       |  WHEN $x IN ('', 'MISSING', 'N/A', 'NA', 'UNKNOWN', 'NOT SPECIFIED') THEN '${Luts.UNSPECIFIED}'
       |  WHEN regexp_matches($x, '^\\d+\\s*-\\s*\\d+$$') THEN regexp_replace($x, '^(\\d+)\\s*-\\s*(\\d+)$$', '\\1-\\2')
       |  WHEN regexp_matches($x, '^\\d+\\s*TO\\s*\\d+$$') THEN regexp_replace($x, '^(\\d+)\\s*TO\\s*(\\d+)$$', '\\1-\\2')
       |  WHEN regexp_matches($x, '^(OVER|>)\\s*\\d+$$') THEN regexp_replace($x, '^(OVER|>)\\s*(\\d+)$$', '\\2-120')
       |  WHEN regexp_matches($x, '^\\d+\\s*(\\+|PLUS)$$') THEN regexp_replace($x, '^(\\d+)\\s*(\\+|PLUS)$$', '\\1-120')
       |  WHEN regexp_matches($x, '^\\d+\\s*(AND|&)\\s*(ABOVE|OLDER)$$') THEN regexp_replace($x, '^(\\d+)\\s*(AND|&)\\s*(ABOVE|OLDER)$$', '\\1-120')
       |  WHEN regexp_matches($x, '^(UNDER|<|BELOW)\\s*\\d+$$') THEN regexp_replace($x, '^(UNDER|<|BELOW)\\s*(\\d+)$$', '0-\\2')
       |  WHEN regexp_matches($x, '^\\d+\\s*(AND|&)\\s*(UNDER|YOUNGER)$$') THEN regexp_replace($x, '^(\\d+)\\s*(AND|&)\\s*(UNDER|YOUNGER)$$', '0-\\1')
       |  WHEN regexp_matches($x, '^\\d+0S$$') THEN CAST($decade AS VARCHAR) || '-' || CAST($decade + 9 AS VARCHAR)
       |  WHEN $x = 'ADULT' THEN '18-120'
       |  WHEN $x = 'JUVENILE' THEN '0-17'
       |  WHEN regexp_matches($x, '^\\d{1,18}$$') THEN $bucketed
       |  ELSE $x
       |END""".stripMargin
  }
}
