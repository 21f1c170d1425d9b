package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** HTML table loader — the reference's Html loader
  * (openpolicedata/data_loaders/html.py:10, pandas `read_html`
  * semantics: parse the first `<table>` in the document, first header
  * row becomes the columns). A police-data HTML page is a small
  * single-file artifact parsed on the driver; Spark transforms stack on
  * top of the resulting DataFrame.
  *
  * Deliberately regex-based (no HTML parser on the classpath): handles
  * well-formed static tables — `<tr>` rows, `<th>`/`<td>` cells, nested
  * inline tags stripped, basic entities unescaped. All cells surface as
  * strings (type inference is the caller's `cast`).
  */
object Html {

  private val TableRe = "(?is)<table[^>]*>(.*?)</table>".r
  private val RowRe = "(?is)<tr[^>]*>(.*?)</tr>".r
  private val CellRe = "(?is)<t([hd])[^>]*>(.*?)</t[hd]>".r

  private[sources] def unescape(s: String): String =
    s.replace("&nbsp;", " ").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&amp;", "&")

  private def cellText(html: String): String =
    unescape(html.replaceAll("(?s)<[^>]*>", "")).trim

  /** All tables in the document, as (header, rows). A table's header is
    * its first row; `<th>` cells anywhere mark that row as header-like
    * but position wins (pandas' default). */
  private[sources] def parseTables(html: String): Seq[(Seq[String], Seq[Seq[String]])] =
    TableRe.findAllMatchIn(html).flatMap { t =>
      val rows = RowRe.findAllMatchIn(t.group(1)).map { r =>
        CellRe.findAllMatchIn(r.group(1)).map(m => cellText(m.group(2))).toSeq
      }.toSeq.filter(_.nonEmpty)
      // Empty layout/spacer tables are omitted from the result list —
      // pandas read_html does the same, so tableIndex matches its
      // numbering and a stray <table></table> can't fail the parse.
      if (rows.isEmpty) None else Some((rows.head, rows.tail))
    }.toSeq

  /** Parse the index-th `<table>` of the file into a string-typed
    * DataFrame (html.py:97 load → pandas read_html()[0]). */
  def read(spark: SparkSession, path: String, tableIndex: Int = 0): DataFrame = {
    val html = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
    val tables = parseTables(html)
    require(tables.nonEmpty, s"no <table> found in $path")
    require(tableIndex < tables.size,
      s"table index $tableIndex out of range (${tables.size} tables in $path)")
    val (header, rows) = tables(tableIndex)
    val names = header.zipWithIndex.map { case (h, i) => if (h.isEmpty) s"_c$i" else h }
    val width = names.length
    val data = rows.map(r => Row.fromSeq((0 until width).map(i =>
      if (i < r.length && r(i).nonEmpty) r(i) else null)))
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(spark.sparkContext.parallelize(data), schema)
  }
}
