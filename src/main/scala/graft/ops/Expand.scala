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
    df.withColumn(as, explode_outer(split(col(column), delim))).drop(column)

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
        posexplode_outer(split(col(column), delim)).as(Seq(posCol, as)): _*)
      .drop(column)
}
