package graft.sources

import org.apache.spark.sql.DataFrame

/** Per-table export with the reference's canonical filenames.
  *
  * Reference: openpolicedata/data.py:397 `Table.to_csv`, :1963
  * `get_csv_filename`, :2105 `_get_filename` — filename is
  * `{state}_{source}[_{agency} if != source]_{table_type}_{date}` where
  * a date range renders as `{start}_{stop}`; extension selects format.
  *
  * Scale notes: writes stay distributed (one file per partition by
  * default); `singleFile=true` coalesces through one task and is only
  * for small reference extracts — never the 100 TB path.
  */
object Export {

  /** Canonical base filename (without extension) — data.py:2105. */
  def canonicalBase(state: String, sourceName: String, agency: String,
                    tableType: String, date: Either[String, (String, String)]): String = {
    val b = new StringBuilder(s"${state}_$sourceName")
    if (sourceName != agency) b.append(s"_$agency")
    b.append(s"_$tableType")
    date match {
      case Left(single)       => b.append(s"_$single")
      case Right((d0, d1))    => b.append(s"_${d0}_$d1")
    }
    b.toString
  }

  def csvFilename(state: String, sourceName: String, agency: String,
                  tableType: String, date: Either[String, (String, String)]): String =
    canonicalBase(state, sourceName, agency, tableType, date) + ".csv"

  def parquetFilename(state: String, sourceName: String, agency: String,
                      tableType: String, date: Either[String, (String, String)]): String =
    canonicalBase(state, sourceName, agency, tableType, date) + ".parquet"

  /** Geo-suffixed canonical name — data.py:2100 (`.geoparquet` when the
    * table carries geometry). */
  def geoParquetFilename(state: String, sourceName: String, agency: String,
                         tableType: String, date: Either[String, (String, String)]): String =
    canonicalBase(state, sourceName, agency, tableType, date) + ".geoparquet"

  /** `Table.to_csv`: write under outputDir with the canonical name. */
  def toCsv(df: DataFrame, outputDir: String, state: String, sourceName: String,
            agency: String, tableType: String,
            date: Either[String, (String, String)],
            singleFile: Boolean = false): String = {
    val path = s"$outputDir/${csvFilename(state, sourceName, agency, tableType, date)}"
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(path)
    path
  }

  def toParquet(df: DataFrame, outputDir: String, state: String, sourceName: String,
                agency: String, tableType: String,
                date: Either[String, (String, String)]): String = {
    val path = s"$outputDir/${parquetFilename(state, sourceName, agency, tableType, date)}"
    df.write.mode("overwrite").parquet(path)
    path
  }

  /** `Table.to_parquet` for a geo table (data.py:532
    * `get_parquet_filename(geo=True)`): same distributed parquet write,
    * `.geoparquet` canonical name, and a fail-loud check that the
    * geometry column actually is the point struct — the reference picks
    * the suffix from the frame's TYPE (isinstance GeoDataFrame,
    * data.py:542), so writing a geo name without geometry is a bug. */
  def toGeoParquet(df: DataFrame, outputDir: String, state: String,
                   sourceName: String, agency: String, tableType: String,
                   date: Either[String, (String, String)],
                   geometryCol: String = "geometry"): String = {
    require(df.columns.contains(geometryCol) &&
        graft.geo.Geo.isPointType(df.schema(geometryCol).dataType),
      s"toGeoParquet: column '$geometryCol' must be the " +
        s"struct<lon double, lat double> point column (got " +
        s"${df.schema.find(_.name == geometryCol).map(_.dataType).getOrElse("absent")})")
    val path = s"$outputDir/${geoParquetFilename(state, sourceName, agency, tableType, date)}"
    df.write.mode("overwrite").parquet(path)
    path
  }

  /** Reload a `.geoparquet` export; the point struct round-trips
    * natively through parquet. */
  def loadGeoParquet(spark: org.apache.spark.sql.SparkSession, outputDir: String,
                     state: String, sourceName: String, agency: String,
                     tableType: String, date: Either[String, (String, String)]): DataFrame =
    spark.read.parquet(
      s"$outputDir/${geoParquetFilename(state, sourceName, agency, tableType, date)}")

  /** Hive-partitioned parquet layout — the 100 TB twin of the
    * reference's year-chunked iteration (`load_iter(year=...)` /
    * split_date_range): data lands under `partCols`-derived directories
    * (e.g. `year=2021/`), so a year- or agency-filtered read PRUNES
    * whole partitions at plan time (`PartitionFilters` in the scan —
    * asserted by ExportSpec) instead of scanning and discarding.
    * `partCols` must be existing columns; derive them first (e.g.
    * `withColumn("year", year(col("date")))`). Writes stay fully
    * distributed; files per partition follow the upstream parallelism. */
  def toPartitionedParquet(df: DataFrame, outputDir: String,
                           partCols: Seq[String]): String = {
    require(partCols.nonEmpty, "partCols must be non-empty")
    df.write.mode("overwrite").partitionBy(partCols: _*).parquet(outputDir)
    outputDir
  }

  /** `Source.load_from_csv` (data.py): reload a previously-exported
    * table from its canonical filename. */
  def loadCsv(spark: org.apache.spark.sql.SparkSession, outputDir: String,
              state: String, sourceName: String, agency: String,
              tableType: String, date: Either[String, (String, String)]): DataFrame =
    Loaders("csv").load(spark,
      s"$outputDir/${csvFilename(state, sourceName, agency, tableType, date)}")
}
