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
  * key is mergeable. The salt is derived from a CONTENT hash of the
  * row, so it is stable under partial stage retries — a salt derived
  * from row ORDER (monotonically_increasing_id, rand) changes when a
  * fetch-failure recomputes a map task with different shuffle-read
  * order, and reducers consuming a mix of old and new map output then
  * double-count or drop rows. The cost of content salting: a hot key
  * whose rows are EXACT duplicates in every column all land on one
  * salt (no spread) — the pathological-duplicates case needs an
  * explicit disambiguating column.
  */
object Skew {

  /** Content hash over the row's HASHABLE columns. MapType columns
    * are excluded: hashing maps is disallowed by default since Spark
    * 3.0 (map iteration order is unspecified, so the hash would be
    * nondeterministic — the exact retry-stability property the
    * content salt exists for). Casting maps to string would inherit
    * the same order instability, so exclusion is the correct guard;
    * a frame whose ONLY columns are maps falls back to a constant
    * salt (no spread — same documented tradeoff as all-duplicate
    * rows, and still retry-stable). */
  private def contentSalt(df: DataFrame, salts: Int) = {
    import org.apache.spark.sql.types.MapType
    def hashable(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: MapType => false
      case org.apache.spark.sql.types.ArrayType(e, _) => hashable(e)
      case org.apache.spark.sql.types.StructType(fs) => fs.forall(f => hashable(f.dataType))
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => col(f.name))
    if (cols.isEmpty) lit(0) else pmod(xxhash64(cols: _*), lit(salts))
  }

  /** Salted sum/count rollup of `valueCol` per `key`. Output columns:
    * key, n (count), total (sum). Value-equivalent to
    * `df.groupBy(key).agg(count, sum)` for any salt count (NOTE: a
    * DECIMAL valueCol widens one step more than the single-phase
    * aggregate — sum-of-sums applies precision widening twice). */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     salts: Int = 16): DataFrame =
    salted(df, key, salts)(
      Seq(count(lit(1)).as("__n"), sum(col(valueCol)).as("__sum")),
      Seq(sum("__n").as("n"), sum("__sum").as("total")))

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
      contentSalt(fact, salts).cast("int")).alias("__sj_fact")
    val saltRows = fact.sparkSession.range(salts)
      .select(col("id").cast("int").as("__dsalt"))
    val repDim = dim.crossJoin(broadcast(saltRows)) // salts rows — a literal
      .alias("__sj_dim")
    // dataset aliases: same-named fact/dim keys would otherwise be an
    // AMBIGUOUS_REFERENCE analysis error (bloomJoin's established fix)
    saltedFact.join(repDim,
        col(s"__sj_fact.$factKey") === col(s"__sj_dim.$dimKey") &&
          col("__sj_fact.__fsalt") === col("__sj_dim.__dsalt"))
      .drop("__fsalt", "__dsalt")
  }

  /** Generic mergeable variant: caller supplies phase-1 partial
    * aggregates and the phase-2 merge over them (columns must line up
    * by name). */
  def salted(df: DataFrame, key: String, salts: Int)
            (partials: Seq[Column], merges: Seq[Column]): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(partials.nonEmpty && merges.nonEmpty,
      "salted: partials and merges must be non-empty")
    df.withColumn("__salt", contentSalt(df, salts))
      .groupBy(col(key), col("__salt"))
      .agg(partials.head, partials.tail: _*)
      .groupBy(col(key))
      .agg(merges.head, merges.tail: _*)
  }
}
