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
