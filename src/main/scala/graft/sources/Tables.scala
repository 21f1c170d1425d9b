package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loading over a scale-factor directory.
  *
  * Plays the role of the reference's data-loader registry
  * (reference: openpolicedata/data_loaders/data_loader.py:297 `Data_Loader`
  * and data.py:1819 `__get_loader`): each named dataset resolves to a lazy
  * Spark scan, so downstream filters/projections are pushed by Catalyst
  * into the parquet reader (the Spark-native equivalent of the reference's
  * server-side WHERE / select pushdown on Socrata/ArcGIS/CKAN backends).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
