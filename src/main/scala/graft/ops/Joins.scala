package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Temporal join operators Spark lacks natively: backward as-of join and
  * keyless interval (range) join. Both are composed from existing
  * operators (union + window, explode + equi-join) rather than a custom
  * SparkPlan — the compositions shuffle exactly once on a well-chosen
  * key, which is the property a custom operator would exist to provide.
  */
object Joins {

  /** Name normalizer matching the session's resolver: with the default
    * spark.sql.caseSensitive=false a user column 'Asof' IS the
    * operator's 'asof', and a case-sensitive string intersect would
    * wave it through the collision guard — then withColumn silently
    * REPLACES the user's data. */
  private def resolver(df: DataFrame): String => String =
    if (df.sparkSession.sessionState.conf.caseSensitiveAnalysis) identity
    else _.toLowerCase(java.util.Locale.ROOT)

  /** Backward as-of join: for every left row, the single right row with
    * the greatest `rightTimeCol` <= `leftTimeCol` (or strictly <, with
    * `strict = true`) within the same `keyCol` group. Returns every left
    * row (left-outer semantics) plus one struct column `asof` holding
    * the matched right row's time (field `__rt`) and its remaining
    * columns — null when no right row precedes.
    *
    * Implementation: both sides are tagged and unioned, then a
    * partition-by-key window running in (time, side) order carries the
    * last non-null right payload forward onto each left row
    * (`last(..., ignoreNulls)` over unbounded-preceding..current).
    * A right row at the exact left time sorts before the left row when
    * matches-at-equal-time are allowed, after it when strict.
    *
    * Scale shape: ONE hash shuffle on the key plus a per-key time sort —
    * the same cost class as a sort-merge join, with no M×N candidate
    * explosion and no correlated re-scan per probe row. All rows of one
    * key land in one window partition, so a pathologically hot key
    * funnels to a single task; the remedy at that extreme is coarse
    * time-range pre-bucketing with boundary carry-over, not needed at
    * any realistic per-key history size.
    *
    * Determinism contract: `right` must be unique per (key, time) —
    * pre-aggregate it otherwise (ties would make the carried payload
    * depend on partition order). */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTimeCol: String, rightTimeCol: String,
               strict: Boolean = false): DataFrame = {
    val norm = resolver(left)
    val leftFields = left.schema.fields.toSeq
    val reserved = Seq("__k", "__t", "__side", "__p", "asof")
    val clash = leftFields.map(f => norm(f.name)).intersect(reserved)
    require(clash.isEmpty, s"asofJoin: left columns ${clash.mkString(", ")} " +
      "collide with the operator's working columns")
    val valFields = right.schema.fields.toSeq
      .filter(f => norm(f.name) != norm(keyCol) && norm(f.name) != norm(rightTimeCol))
    require(!valFields.exists(f => norm(f.name) == "__rt"), "asofJoin: right " +
      "column __rt collides with the payload's matched-time field")
    val rtField = right.schema.fields.find(f => norm(f.name) == norm(rightTimeCol))
      .getOrElse(throw new IllegalArgumentException(
        s"asofJoin: right side has no column '$rightTimeCol'"))
    val ltField = left.schema.fields.find(f => norm(f.name) == norm(leftTimeCol))
      .getOrElse(throw new IllegalArgumentException(
        s"asofJoin: left side has no column '$leftTimeCol'"))
    // fail up front with the CALLER's column names — a type mismatch
    // would otherwise surface as a cryptic union error on the internal
    // '__t' working column
    require(ltField.dataType == rtField.dataType,
      s"asofJoin: time columns must have the same type — " +
      s"'$leftTimeCol' is ${ltField.dataType}, '$rightTimeCol' is ${rtField.dataType}")
    val payloadType = StructType(StructField("__rt", rtField.dataType) +: valFields)

    // Right rows sort before left rows at equal time (side 0 < 1) so an
    // exact-time match is visible; strict mode sorts them after (2 > 1).
    // Null-key right rows can never match (SQL equality semantics — a
    // window partition WOULD group nulls together), so drop them; null-
    // key left rows pass through with a null `asof`.
    val rightSide = if (strict) 2 else 0
    val r = right.filter(col(keyCol).isNotNull && col(rightTimeCol).isNotNull).select(
      Seq(col(keyCol).as("__k"), col(rightTimeCol).as("__t"),
        lit(rightSide).cast(IntegerType).as("__side"),
        struct((col(rightTimeCol).as("__rt") +:
          valFields.map(f => col(f.name))): _*).as("__p")) ++
        leftFields.map(f => lit(null).cast(f.dataType).as(f.name)): _*)
    val l = left.filter(col(keyCol).isNotNull).select(
      Seq(col(keyCol).as("__k"), col(leftTimeCol).as("__t"),
        lit(1).cast(IntegerType).as("__side"),
        lit(null).cast(payloadType).as("__p")) ++
        leftFields.map(f => col(f.name)): _*)

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l.unionByName(r)
      .withColumn("asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftFields.map(f => col(f.name)) :+ col("asof"): _*)
    // Null-key left rows can never match (their right rows were dropped
    // above), so their `asof` is null A PRIORI — bypass the window
    // instead of funneling them all into the single null-key hash
    // partition, where a large logged-out/unkeyed fraction becomes one
    // straggler task's sort buffer.
    matched.unionByName(left.filter(col(keyCol).isNull)
      .withColumn("asof", lit(null).cast(payloadType)))
  }

  /** Keyless interval join: probe rows whose `probeTimeCol` falls inside
    * an interval [startCol, endCol) of `intervals`. Returns the matched
    * (probe ⋈ interval) rows with every probe column plus the interval's
    * columns; aggregation (counts per interval, etc.) is the caller's.
    *
    * Implementation: each interval is exploded to the coarse time
    * buckets it covers; each probe row keys to its single bucket; the
    * sides meet in a bucket equi-join and the exact [start, end)
    * containment is a post-join filter. A probe row lies in exactly one
    * bucket, so a match is emitted exactly once — no dedup needed.
    *
    * Scale shape: a hash shuffle keyed on the time bucket — never a
    * cross join (the naive plan Spark picks for a pure inequality
    * join). Pick `bucketUs` near the typical interval length: one
    * interval then explodes to ~2 bucket rows, and bucket fan-out stays
    * O(intervals). Hot buckets (a burst hour) are ordinary join skew —
    * AQE splits them. An interval spanning more than
    * `maxBucketsPerInterval` buckets fails the job with a clear error
    * instead of silently fanning out (a single sentinel end date like
    * 9999-12-31 would otherwise explode one row into ~70M). */
  def rangeJoin(probe: DataFrame, probeTimeCol: String,
                intervals: DataFrame, startCol: String, endCol: String,
                bucketUs: Long, maxBucketsPerInterval: Int = 4096): DataFrame = {
    require(bucketUs > 0, s"rangeJoin: bucketUs must be positive, got $bucketUs")
    require(maxBucketsPerInterval > 0,
      s"rangeJoin: maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val norm = resolver(probe)
    val probeCols = probe.schema.fieldNames.toSeq
    val ivCols = intervals.schema.fieldNames.toSeq
    val overlap = probeCols.map(norm).intersect(ivCols.map(norm))
    require(overlap.isEmpty,
      s"rangeJoin: overlapping column names ${overlap.mkString(", ")}")
    val clash = (probeCols ++ ivCols).map(norm)
      .intersect(Seq("__pt", "__b", "__s", "__e"))
    require(clash.isEmpty, s"rangeJoin: columns ${clash.mkString(", ")} " +
      "collide with the operator's working columns")
    val s = unix_micros(col(startCol))
    val e = unix_micros(col(endCol))
    val bStart = floor(s / bucketUs).cast("long")
    val bEnd = floor((e - 1) / bucketUs).cast("long")
    // raise_error sits in the sequence bound so the guard cannot be
    // pruned away: the row either explodes within budget or fails loud
    val guardedEnd = when(bEnd - bStart >= maxBucketsPerInterval,
        raise_error(concat(lit(s"rangeJoin: interval spans > $maxBucketsPerInterval buckets "),
          lit(s"(bucketUs=$bucketUs) — raise bucketUs or clean sentinel end times"))
          .cast("long")))
      .otherwise(bEnd)
    // NULL-BOUND CONTRACT: an interval with a null start or end is
    // DROPPED here (e > s is null — SQL inequality semantics), same as
    // an empty one. Open-ended "still active" intervals (end = NULL)
    // must be closed with an explicit horizon by the caller first; a
    // far-future sentinel like 9999-12-31 instead trips the bucket
    // budget below, deliberately.
    val iv = intervals
      .filter(e > s) // an empty interval matches nothing (and sequence() would reject stop < start)
      .withColumn("__b", explode(sequence(bStart, guardedEnd)))
      .withColumn("__s", s).withColumn("__e", e)
    val pt = unix_micros(col(probeTimeCol))
    val pb = probe
      .withColumn("__pt", pt)
      .withColumn("__b", floor(pt / bucketUs).cast("long"))
    pb.join(iv, pb("__b") === iv("__b") &&
        col("__pt") >= col("__s") && col("__pt") < col("__e"))
      .select((probeCols ++ ivCols).map(col): _*)
  }
}
