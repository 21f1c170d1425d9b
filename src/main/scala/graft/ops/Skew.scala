package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot aggregation keys: two-phase salted
  * aggregation. Phase 1 groups on (key, salt) so one hot key spreads
  * across `salts` reducers; phase 2 merges the partials per key.
  *
  * Complements AQE's skew-join splitting (enabled in GraftSession):
  * AQE re-splits skewed *join* partitions at runtime, while salting is
  * the static answer for skewed *aggregations* whose partial state per
  * key is mergeable. The salt is derived from a per-row id, so results
  * are independent of the salt assignment.
  */
object Skew {

  /** Salted sum/count rollup of `valueCol` per `key`. Output columns:
    * key, n (count), total (sum). Equivalent to
    * `df.groupBy(key).agg(count, sum)` for any salt count. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
    salted.groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__sum"))
      .groupBy(col(key))
      .agg(sum("__n").as("n"), sum("__sum").as("total"))
  }

  /** Skew-safe equi-join for a fact table with pathologically hot join
    * keys: each fact row gets a random salt in [0, salts) and the dim
    * side is replicated once per salt, so the join key becomes
    * (key, salt) and one hot key spreads across `salts` reducers
    * instead of one straggler task. Result ≡ the plain inner join
    * (verified by the q_salted_join oracle).
    *
    * Cost model: the dim side shuffles salts× its size — use when dim
    * is modest (not broadcast-small, not fact-sized) and the skew is
    * known ahead of time; AQE's skew-join split is the runtime
    * alternative when statistics surface it. The salt comes from a
    * per-row hash, so results are independent of the assignment. */
  def saltedJoin(fact: DataFrame, factKey: String,
                 dim: DataFrame, dimKey: String, salts: Int = 16): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedFact = fact.withColumn("__fsalt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts)).cast("int"))
    val saltRows = fact.sparkSession.range(salts)
      .select(col("id").cast("int").as("__dsalt"))
    val repDim = dim.crossJoin(broadcast(saltRows)) // salts rows — a literal
    saltedFact.join(repDim,
        col(factKey) === col(dimKey) && col("__fsalt") === col("__dsalt"))
      .drop("__fsalt", "__dsalt")
  }

  /** Generic mergeable variant: caller supplies phase-1 partial
    * aggregates and the phase-2 merge over them (columns must line up
    * by name). */
  def salted(df: DataFrame, key: String, salts: Int)
            (partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    require(salts > 0, "salts must be positive")
    df.withColumn("__salt", pmod(xxhash64(monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merges.head, merges.tail: _*)
  }
}
