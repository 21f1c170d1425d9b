package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-value cell expansion — the reference's demographic "expand".
  *
  * Reference: openpolicedata/data.py:578 `Table.expand` — rows whose
  * demographic cells hold delimited multi-person values are exploded to
  * one row per person; openpolicedata/preproc.py:1623
  * `check_for_multiple`.
  *
  * Spark-first: `explode(split(...))` is a generator inside the same
  * stage — no shuffle, fully parallel, and Catalyst prunes untouched
  * columns through it.
  */
object Expand {

  /** Explode a delimited column to one row per value. `explode_outer`
    * keeps rows whose cell is null (the reference's pandas explode keeps
    * scalar/NaN rows — data.py:578). */
  def expandDelim(df: DataFrame, column: String, delim: String,
                  as: String): DataFrame =
    // Pattern.quote: split() takes a REGEX, but delim is a literal
    // separator (detectMultiValue's contains() treats it as one) — an
    // unquoted "|" would match the empty string and shred every cell
    // into characters
    df.withColumn(as, explode_outer(
      split(col(column), java.util.regex.Pattern.quote(delim)))).drop(column)

  /** Detect which of `cols` actually hold delimited multi-value cells —
    * the reference's `check_for_multiple` (preproc.py:1623): a column
    * qualifies when at least `minFraction` of its non-null cells contain
    * the delimiter. One aggregate job over the candidate columns. */
  def detectMultiValue(df: DataFrame, cols: Seq[String], delim: String,
                       minFraction: Double = 0.01): Seq[String] = {
    if (cols.isEmpty) return Nil
    val aggs = cols.flatMap { c =>
      Seq(count(when(col(c).contains(delim), 1)).as(s"${c}__hits"),
          count(col(c)).as(s"${c}__n"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.filter { c =>
      val hits = row.getAs[Long](s"${c}__hits")
      val n = row.getAs[Long](s"${c}__n")
      n > 0 && hits.toDouble / n >= minFraction
    }
  }

  /** Positional variant (keeps the reference's item_num semantics,
    * _converters.py `item_num`). Aliases the generator output directly —
    * never renames hardcoded `pos`/`col`, which would corrupt same-named
    * input columns. */
  def expandDelimPos(df: DataFrame, column: String, delim: String,
                     as: String, posCol: String): DataFrame =
    df.select(df.columns.map(col) :+
        posexplode_outer(split(col(column),
          java.util.regex.Pattern.quote(delim))).as(Seq(posCol, as)): _*)
      .drop(column)

  /** The reference's count-annotation regex, verbatim
    * (_converters.py:977 `race_count_re`): "2 - Black 1 - White". */
  val CountRe: String = "(\\d+)\\s?-\\s?([A-Za-z]+\\.?\\s?[A-Za-z]*\\.?)"

  /** The reference's name-annotation regex, verbatim
    * (_converters.py std_with_names): a 1-2 letter demographic code
    * pair after whitespace — or the Ê mojibake the Dallas officer_s
    * column carries — e.g. "John Doe W/M; Jane Roe B/F". */
  val WithNameRe: String = "[\\sÊ](\\w{1,2}/\\w)"

  /** `std_with_names` expansion: name-annotated multi-person cells
    * explode to one row per person carrying the `itemNum`-th component
    * of the demographic code (0 = race, 1 = gender — the reference
    * standardizes each in its own pass). Cells without any code pass
    * through as a single item, including nulls. */
  def expandWithNames(df: DataFrame, column: String, as: String,
                      posCol: String, itemNum: Int): DataFrame = {
    require(itemNum >= 0 && itemNum <= 1, s"itemNum must be 0|1, got $itemNum")
    val codes = regexp_extract_all(col(column), lit(WithNameRe), lit(1))
    val items = transform(codes, c =>
      element_at(split(c, "/"), itemNum + 1))
    val out = when(size(codes) > 0, items).otherwise(array(col(column)))
    df.select(df.columns.map(col) :+
        posexplode_outer(out).as(Seq(posCol, as)): _*)
      .drop(column)
  }

  /** `std_with_counts` (_converters.py, injury variant): converter-
    * GUIDED greedy parse — tokens accumulate until the accumulated
    * phrase standardizes under the strict injury vocabulary, a numeric
    * token multiplies the item that follows ("2 Injured 1 Deceased" →
    * INJURED, INJURED, DECEASED; "Deceased Injured" → DECEASED,
    * INJURED). Cells that standardize whole stay scalar; cells with
    * unparseable leftovers fall back whole (no_id="keep").
    *
    * Architecture follows the reference's map-over-uniques shape, but
    * DISTRIBUTED: the distinct values stay a Dataset and the greedy
    * parse runs as a typed map on the executors (the parser is plain
    * Scala), so nothing is ever collected to the driver — a free-text
    * column with unbounded distincts costs one extra shuffle, not
    * driver memory. The parse map folds back through an equi-join (no
    * broadcast hint; AQE decides). Returns one row per person with the
    * STANDARDIZED value.
    *
    * Faithful reference quirks, kept deliberately: a trailing count
    * with no following item is silently ignored, and a digit-only cell
    * expands to NOTHING (the reference maps it to an empty dict) — the
    * outer explode still emits one null-valued row so the input row
    * survives. Counts longer than 6 digits mark the cell unparseable
    * (keep-whole) instead of crashing on Int overflow or exploding
    * memory — the reference would do both. */
  def expandInjuryCounts(df: DataFrame, column: String, as: String,
                         posCol: String, delim: String = " "): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    require(!df.columns.contains("__items"),
      "expandInjuryCounts: column __items collides with the operator's working column")
    val d = delim // local copy: the closure must not capture the DataFrame
    val mapDf = df.select(col(column)).na.drop().distinct().as[String]
      .map(x => (x, parseInjuryCell(x, d))).toDF(column, "__items")
    df.join(mapDf, Seq(column), "left")
      .select(df.columns.filter(_ != column).map(col) :+
        posexplode_outer(coalesce(col("__items"), array(col(column))))
          .as(Seq(posCol, as)): _*)
  }

  /** The converter-guided greedy parse for one (non-null) injury cell —
    * plain Scala, run distributed inside [[expandInjuryCounts]]. */
  // REFERENCE QUIRK (faithful, _converters.py:793): the whole-cell
  // strict pass strips only a SINGLE leading count digit, so
  // "2 Injured" collapses to ONE scalar INJURED while "12 Injured"
  // takes the greedy count path and expands to twelve rows — the
  // reference's std_with_counts behaves identically (its converter
  // count-strip regex is ^\d\s+, one digit).
  def parseInjuryCell(x: String, delim: String = " "): Seq[String] =
    graft.ops.Luts.injuryStdStrict(x) match {
      case Some(std) => Seq(std) // whole cell standardizes: scalar
      case None =>
        var count = 1
        var cur = ""
        val out = Seq.newBuilder[String]
        var failed = false
        x.split(java.util.regex.Pattern.quote(delim)).foreach { tok =>
          if (tok.nonEmpty && tok.forall(_.isDigit)) {
            if (tok.length > 6) failed = true // overflow/absurd count
            else count = tok.toInt
          } else {
            cur = if (cur.isEmpty) tok.trim else cur + " " + tok.trim
            graft.ops.Luts.injuryStdStrict(cur).foreach { std =>
              (0 until count).foreach(_ => out += std)
              count = 1
              cur = ""
            }
          }
        }
        if (cur.nonEmpty) failed = true // unparseable leftover
        if (failed) Seq(x) else out.result()
    }

  /** `std_counts` expansion (_converters.py:975): cells annotated with
    * per-category counts ("2 - Black 1 - White") explode to one row per
    * PERSON (each label repeated its count), positions running across
    * the whole cell; cells without the annotation pass through as a
    * single item (the reference standardizes them scalar), including
    * nulls. Pure generator + scan-stage expressions — no shuffle. */
  def expandCounts(df: DataFrame, column: String, as: String,
                   posCol: String): DataFrame = {
    val toks = regexp_extract_all(col(column), lit(CountRe), lit(0))
    // absurd counts keep the cell WHOLE (same guard as
    // expandInjuryCounts): an 11-digit count would throw CAST_OVERFLOW
    // under ANSI, and a merely-large one would materialize a
    // billion-element array per row
    val absurd = exists(toks,
      t => length(regexp_extract(t, CountRe, 1)) > lit(6))
    // guard count = 0: Spark's sequence(1, 0) is the DESCENDING [1, 0]
    // (step defaults to -1 when start > stop), which would emit the
    // label twice; a zero count must contribute nothing
    val expanded = flatten(transform(toks, t => {
      val cnt = when(length(regexp_extract(t, CountRe, 1)) <= 6,
        regexp_extract(t, CountRe, 1)).cast("int")
      val lbl = trim(regexp_extract(t, CountRe, 2))
      when(cnt >= 1, transform(sequence(lit(1), cnt), _ => lbl))
        .otherwise(array().cast("array<string>"))
    }))
    val items = when(size(toks) > 0 && !absurd, expanded)
      .otherwise(array(col(column)))
    df.select(df.columns.map(col) :+
        posexplode_outer(items).as(Seq(posCol, as)): _*)
      .drop(column)
  }
}
