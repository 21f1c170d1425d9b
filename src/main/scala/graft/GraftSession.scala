package graft

import org.apache.spark.sql.SparkSession

/** Recommended session builder for the graft engine: UTC, AQE on,
  * right-sized shuffle parallelism, custom expressions registered via
  * SparkSessionExtensions, and the nanosecond-parquet legacy read conf.
  *
  * Library code never requires this — every operator also registers its
  * expressions defensively — but it is the one-liner a user switching
  * from the reference starts with.
  */
object GraftSession {

  def builder(master: String = "local[*]",
              shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def getOrCreate(master: String = "local[*]",
                  shufflePartitions: Int = 32): SparkSession = {
    val s = builder(master, shufflePartitions).getOrCreate()
    graft.functions.GraftFunctions.ensureRegistered(s)
    s
  }
}
