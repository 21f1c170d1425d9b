package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Runtime-filter (semi-join reduction) for selective fact⋈dim joins —
  * THE shuffle-volume lever at 100 TB: when the dim side is selective
  * (a filtered part list, a sampled id set), the plain join still
  * shuffles EVERY fact row to find the few that match. A Bloom filter
  * over the dim keys is a fixed-size summary (numBits/8 bytes however
  * many keys it holds) that broadcasts as a 1-row literal and kills
  * non-matching fact rows in the scan stage, BEFORE the join exchange —
  * the fact shuffle then carries ~selectivity × |fact| rows instead of
  * |fact|. False positives pass the filter but die in the exact join,
  * so the result is IDENTICAL to the plain join (which is what the
  * oracle checks); false negatives cannot occur.
  *
  * This is the operator form of Spark's own row-level runtime filtering
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`, which only
  * triggers on its internal heuristics); expressed explicitly it is
  * plannable, testable, and usable on any key expression.
  *
  * Sizing: numBits defaults to 2^22 (512 KiB serialized) — at the
  * classic k=6 probes that holds ~400k keys under 2% false positives;
  * both knobs are caller-tunable and validated at plan time.
  */
object RuntimeFilter {

  /** Fact rows whose key MIGHT be in `dim`'s key set (no false
    * negatives). The 1-row build aggregate is partial-aggregated (each
    * build partition ships one bit array, OR-merged) and then
    * materialized INTO A LITERAL — exactly the mechanism of Spark's own
    * runtime bloom filter (a scalar subquery whose result is injected
    * into the plan). The eager numBits/8-byte collect is bounded by
    * construction, independent of dim size; the probe is then a pure
    * codegen predicate in the fact scan stage. (Attaching the bitmap as
    * a COLUMN via a broadcast cross join is the tempting lazy spelling,
    * and a trap: the nested-loop join copies the bitmap into every
    * joined row — numBits/8 bytes PER FACT ROW of row-write cost,
    * observed as a 40x slowdown at sf0.1.) */
  def bloomPrefilter(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      numBits: Int = 1 << 22, numHashes: Int = 6): DataFrame = {
    GraftFunctions.ensureRegistered(fact.sparkSession)
    // HASH IN A COMMON TYPE: xxhash64 is type-sensitive (an int 5 and a
    // long 5L hash differently) while the exact join coerces — hashing
    // the raw columns would produce FALSE NEGATIVES for join-coercible
    // but differently-typed keys, silently dropping matching rows.
    // Integral pairs widen to long; any other mismatch fails loud
    // (a silent row loss is the one thing this operator must not do).
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val integral = Set[org.apache.spark.sql.types.DataType](
      ByteType, ShortType, IntegerType, LongType)
    val ft = fact.select(col(factKey)).schema.head.dataType
    val dt = dim.select(col(dimKey)).schema.head.dataType
    val (fk, dk) =
      if (ft == dt) (col(factKey), col(dimKey))
      else if (integral(ft) && integral(dt))
        (col(factKey).cast("long"), col(dimKey).cast("long"))
      else throw new IllegalArgumentException(
        s"bloomPrefilter: key types differ ($factKey: $ft vs $dimKey: $dt) " +
          "— cast them to a common type first (type-sensitive hashing " +
          "would silently drop matching rows)")
    val bloom: Array[Byte] = dim
      .agg(GraftFunctions.bloomAgg(xxhash64(dk), numBits, numHashes).as("__bloom"))
      .head().getAs[Array[Byte]]("__bloom")
    fact.where(GraftFunctions.bloomMightContain(lit(bloom), xxhash64(fk)))
  }

  /** Exact inner join with the Bloom prefilter applied to the fact side
    * first. Result ≡ `fact.join(dim, factKey === dimKey)` — the exact
    * join removes the Bloom's false positives. Note: like
    * [[bloomPrefilter]], CONSTRUCTING this join eagerly runs the
    * (bounded) dim-side build aggregate. The join condition is resolved
    * through dataset aliases, so fact and dim key columns may share a
    * name without ambiguity. */
  def bloomJoin(fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      numBits: Int = 1 << 22, numHashes: Int = 6): DataFrame =
    bloomPrefilter(fact, factKey, dim, dimKey, numBits, numHashes)
      .alias("__bloom_fact")
      .join(dim.alias("__bloom_dim"),
        col(s"__bloom_fact.$factKey") === col(s"__bloom_dim.$dimKey"))
}
