package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed storage for co-located joins: writing both sides of a
  * recurring fact-fact join bucketed (and sorted) by the join key lets
  * every subsequent join run shuffle-free — each bucket pair joins
  * locally. This is the storage-layout half of the 100 TB join story;
  * `broadcast()` covers small dims and AQE covers the rest.
  *
  * Spark-native: `bucketBy`/`sortBy` + `saveAsTable` (bucket metadata
  * lives in the session catalog; `spark.sql.sources.bucketing.enabled`
  * is on by default).
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted table. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Join two same-bucketed tables on their bucket key — planned
    * without any Exchange when bucket counts line up. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
