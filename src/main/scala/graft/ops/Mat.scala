package graft.ops

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame

/** Materialization for iterative DataFrame algorithms (connected
  * components, PageRank): eager localCheckpoint re-wrapped in a fresh
  * LogicalRDD, plus explicit release of superseded checkpoints.
  *
  * Two problems this solves together:
  *
  *  - STATS: a localCheckpointed plan inherits the origin plan's
  *    sizeInBytes estimate, and each round's join MULTIPLIES the two
  *    sides' estimates, so round n plans with a ~2^n-bit BigInt and the
  *    driver burns seconds in BigInteger.multiply. Re-wrapping the
  *    checkpointed RDD in a fresh LogicalRDD resets the estimate.
  *
  *  - MEMORY: localCheckpoint persists its blocks at MEMORY_AND_DISK
  *    and Spark never drops them until the RDD is garbage-collected —
  *    on a long-lived session (or inside a 50-round loop) every
  *    superseded round's node table stays pinned in executor memory.
  *    The release handle unpersists exactly the blocks the checkpoint
  *    created, so a loop holds at most two rounds of state.
  *
  * The new-RDD set is identified by diffing
  * `sparkContext.getPersistentRDDs` around the checkpoint — sound
  * while one thread materializes at a time (true for this library's
  * operators; concurrent jobs would only over-release their OWN
  * not-yet-released checkpoints, never unrelated cached data).
  *
  * NEVER release a checkpoint that a returned DataFrame still reads
  * from: localCheckpoint truncates lineage, so unpersisted blocks are
  * unrecoverable by design. Callers release only superseded rounds.
  */
object Mat {
  /** Materialize eagerly; returns the stats-reset frame and a handle
    * that unpersists the checkpoint's blocks (non-blocking).
    *
    * `coalesceTo > 0` narrows the checkpointed RDD to at most that many
    * partitions (a zero-shuffle coalesce on already-materialized
    * blocks). Iterative state tables inherit their producing join's
    * partition count — e.g. a 2-way union of 32-partition shuffles
    * yields 64 — and every subsequent round then pays 64 task launches
    * per stage on a table that may hold a few thousand rows; capping at
    * the cluster's parallelism removes pure scheduling overhead without
    * losing any (it never coalesces BELOW the requested target). */
  def releasable(df: DataFrame, coalesceTo: Int = 0): (DataFrame, () => Unit) = {
    val spark = df.sparkSession
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val ck = df.localCheckpoint() // eager: runs the plan now
    val mine: Seq[RDD[_]] =
      sc.getPersistentRDDs.iterator.collect {
        case (id, r) if !before(id) => r
      }.toSeq
    val rdd =
      if (coalesceTo > 0 && ck.rdd.getNumPartitions > coalesceTo)
        ck.rdd.coalesce(coalesceTo)
      else ck.rdd
    (spark.createDataFrame(rdd, ck.schema),
      () => mine.foreach(_.unpersist(blocking = false)))
  }

  /** Materialize without tracking — for a frame that must stay live as
    * long as the session (callers that cannot scope a release). */
  def apply(df: DataFrame): DataFrame = releasable(df)._1
}
