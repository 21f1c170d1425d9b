package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine rounding for DOUBLE-valued scores.
  *
  * `round(x, d)` on a double is NOT portable between engines even when
  * both sides compute the bit-identical double: Spark rounds via
  * BigDecimal HALF_UP on the exact binary expansion, DuckDB via
  * `std::round(x * 10^d) / 10^d` — and on boundary values (the exact
  * representable neighborhood of …5) the two flip the last digit
  * (observed live: q_quality_score at sf0.1, q_quantiles at sf0.001).
  * Decimal-typed arithmetic is exempt (exact, both engines agree);
  * this helper exists for scores that are genuinely doubles.
  *
  * The fix is to spell the rounding out as `floor(x * 10^d + 0.5) /
  * 10^d`: multiply, add, floor, divide are each exactly-specified IEEE
  * ops, so identical inputs give identical outputs on every engine.
  * (Half-up-toward-positive for negatives — a CONVENTION difference
  * from round()'s away-from-zero that doesn't matter because both
  * sides use the same formula.) Render the matching oracle expression
  * with [[sql]].
  */
object Det {

  def round(c: Column, digits: Int): Column = {
    require(digits >= 0 && digits <= 9, s"digits out of range: $digits")
    val f = math.pow(10, digits)
    floor(c * f + 0.5).cast("double") / f
  }

  def round4(c: Column): Column = round(c, 4)

  /** The identical formula in DuckDB SQL over expression `e`. */
  def sql(e: String, digits: Int): String = {
    require(digits >= 0 && digits <= 9, s"digits out of range: $digits")
    val f = math.pow(10, digits).toLong
    s"CAST(floor(($e) * $f + 0.5) AS DOUBLE) / $f"
  }

  def sql4(e: String): String = sql(e, 4)
}
