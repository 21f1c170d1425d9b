package org.apache.spark.sql.graftshim

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.classic.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Package shim exposing `internalCreateDataFrame` (private[sql]) to
  * graft.ops.Mat: wrapping a checkpointed INTERNAL-row RDD directly
  * keeps the materialized loop state in Tungsten format. The public
  * route (`Dataset.rdd` + `createDataFrame`) deserializes every row to
  * an external Row and converts it back on EVERY read of the frame —
  * paid once per round per state table in the iterative operators,
  * which is exactly the cost the checkpoint blocks exist to avoid. */
object InternalDf {
  def create(spark: SparkSession, rdd: RDD[InternalRow],
             schema: StructType): DataFrame =
    spark.internalCreateDataFrame(rdd, schema)
}
