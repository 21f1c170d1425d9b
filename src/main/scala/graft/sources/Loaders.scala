package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-format data loaders behind one interface — the reference's
  * data_loaders registry (openpolicedata/data_loaders/data_loader.py:297;
  * per-backend `get_count` / `load` / `get_years`) re-expressed as lazy
  * Spark scans. The live HTTP backends (Socrata/ArcGIS/CKAN/Carto/ODS)
  * are out of scope in this zero-egress build (SURVEY §5); their query
  * semantics — server-side WHERE on dates, projection, paging — are what
  * [[Sources]] implements on top of any loader here, with Catalyst
  * pushing the predicates into the scan exactly as the reference pushes
  * them into the backend's query API.
  */
object Loaders {

  sealed trait Loader {
    /** Lazy scan; every [[Sources]] operator composes on top. */
    def load(spark: SparkSession, path: String): DataFrame
  }

  /** Parquet-backed dataset (the native path). */
  case object ParquetLoader extends Loader {
    def load(spark: SparkSession, path: String): DataFrame = {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      Tables.normalizeEventTs(spark.read.parquet(path))
    }
  }

  /** CSV-backed dataset (reference data_loaders/csv.py `Csv`). */
  final case class CsvLoader(header: Boolean = true, inferSchema: Boolean = true,
                             delimiter: String = ",") extends Loader {
    def load(spark: SparkSession, path: String): DataFrame =
      spark.read
        .option("header", header.toString)
        .option("inferSchema", inferSchema.toString)
        .option("delimiter", delimiter)
        .csv(path)
  }

  /** JSON-lines-backed dataset. */
  case object JsonLoader extends Loader {
    def load(spark: SparkSession, path: String): DataFrame =
      spark.read.json(path)
  }

  /** Zip-wrapped CSV (the reference's `Csv` accepts .zip archives —
    * tests/test_loader_csv.py test_load_single_file_csv_zip). The
    * archive must contain exactly one CSV entry; it is extracted to a
    * fresh managed temp file per load (never beside the archive — a
    * load must not mutate the dataset directory, and a persistent
    * cache would serve stale data after the archive changes) and
    * scanned as normal CSV so every Sources predicate still pushes
    * into the scan. */
  final case class CsvZipLoader(csv: CsvLoader = CsvLoader()) extends Loader {
    def load(spark: SparkSession, path: String): DataFrame = {
      val zf = new java.util.zip.ZipFile(path)
      try {
        import scala.jdk.CollectionConverters._
        val entries = zf.entries().asScala.filterNot(_.isDirectory)
          .filter(_.getName.toLowerCase.endsWith(".csv")).toList
        entries match {
          case one :: Nil =>
            val out = java.nio.file.Files.createTempFile("graft_csvzip_", ".csv")
            java.nio.file.Files.copy(zf.getInputStream(one), out,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            out.toFile.deleteOnExit()
            csv.load(spark, out.toString)
          case Nil => throw new IllegalArgumentException(
            s"zip at $path contains no .csv entry")
          case many => throw new IllegalArgumentException(
            s"zip at $path contains ${many.size} csv entries; expected exactly one " +
              s"(have: ${many.map(_.getName).mkString(", ")})")
        }
      } finally zf.close()
    }
  }

  /** Excel-backed dataset (reference data_loaders/excel.py `Excel`);
    * sheet None → single sheet or year-sheet combine, see [[Xlsx]]. */
  final case class ExcelLoader(sheet: Option[String] = None) extends Loader {
    def load(spark: SparkSession, path: String): DataFrame =
      Xlsx.read(spark, path, sheet)
  }

  /** HTML-table-backed dataset (reference data_loaders/html.py `Html`). */
  final case class HtmlLoader(tableIndex: Int = 0) extends Loader {
    def load(spark: SparkSession, path: String): DataFrame =
      Html.read(spark, path, tableIndex)
  }

  /** Format registry (reference data_loaders/__init__.py exports). */
  val registry: Map[String, Loader] = Map(
    "parquet" -> ParquetLoader,
    "csv" -> CsvLoader(),
    "csv_zip" -> CsvZipLoader(),
    "json" -> JsonLoader,
    "excel" -> ExcelLoader(),
    "html" -> HtmlLoader())

  def apply(format: String): Loader =
    registry.getOrElse(format.toLowerCase,
      throw new IllegalArgumentException(
        s"Unknown loader format '$format' (have: ${registry.keys.mkString(", ")})"))
}
