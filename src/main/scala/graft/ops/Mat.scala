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
    // isLocallyCheckpointed narrows the diff to OUR checkpoint: a lazy
    // user cache() whose InMemoryRelation buffer happens to persist for
    // the first time INSIDE this job would otherwise land in the diff
    // window and be unpersisted by release() — silently dropping the
    // user's cached data (the buffer RDD is never re-persisted).
    val mine: Seq[RDD[_]] =
      sc.getPersistentRDDs.iterator.collect {
        case (id, r) if !before(id) && r.isCheckpointed => r
      }.toSeq
    // Re-wrap the checkpointed INTERNAL RDD (Tungsten rows): the public
    // Dataset.rdd + createDataFrame route would deserialize every row
    // to an external Row and convert it back on EVERY read — a
    // per-round tax on the iterative loop state this helper serves.
    val internal = ck.queryExecution.toRdd
    val rdd =
      if (coalesceTo > 0 && internal.getNumPartitions > coalesceTo)
        internal.coalesce(coalesceTo)
      else internal
    (org.apache.spark.sql.graftshim.InternalDf.create(
        spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
        rdd, ck.schema),
      () => mine.foreach(_.unpersist(blocking = false)))
  }

  /** Materialize without tracking — for a frame that must stay live as
    * long as the session (callers that cannot scope a release). */
  def apply(df: DataFrame): DataFrame = releasable(df)._1
}
