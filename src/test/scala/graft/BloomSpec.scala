package graft

import org.apache.spark.sql.functions._
import graft.functions.{BloomImpl, GraftFunctions}
import graft.ops.RuntimeFilter

/** Bloom runtime filter: kernel properties, distributed merge, and the
  * end-to-end invariant (bloomJoin ≡ plain join). */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("kernel: no false negatives, bounded false-positive rate") {
    val words = new Array[Long](1 << 10) // 2^16 bits
    val rnd = new java.util.SplittableRandom(7L)
    val present = Array.fill(2000)(rnd.nextLong())
    present.foreach(BloomImpl.add(words, _, 6))
    val bytes = BloomImpl.serialize(words, 6)
    assert(present.forall(BloomImpl.mightContain(bytes, _)), "false negative")
    // 2k keys in 64k bits at k=6 → theoretical fpr ~0.33%; assert < 3%
    val absent = Array.fill(20000)(rnd.nextLong()).filterNot(present.contains)
    val fp = absent.count(BloomImpl.mightContain(bytes, _))
    assert(fp.toDouble / absent.length < 0.03, s"fp rate ${fp.toDouble / absent.length}")
  }

  test("aggregate merges partial filters across partitions (OR)") {
    GraftFunctions.ensureRegistered(spark)
    val keys = (1L to 5000L).toDF("k").repartition(8)
    val bloom = keys
      .agg(GraftFunctions.bloomAgg(xxhash64(col("k")), 1 << 16, 6).as("b"))
      .head().getAs[Array[Byte]]("b")
    // every inserted key's xxhash64 must probe true — compute the same
    // hashes through Spark so the seed matches
    val hashes = (1L to 5000L).toDF("k").select(xxhash64(col("k"))).as[Long].collect()
    assert(hashes.forall(BloomImpl.mightContain(bloom, _)))
  }

  test("bloom_agg rejects bad sizing at plan time") {
    GraftFunctions.ensureRegistered(spark)
    val df = Seq(1L).toDF("k")
    intercept[Exception] { // non-power-of-two bits
      df.agg(GraftFunctions.bloomAgg(xxhash64(col("k")), 1000, 6)).collect()
    }
    intercept[Exception] { // too many probes
      df.agg(GraftFunctions.bloomAgg(xxhash64(col("k")), 1 << 10, 64)).collect()
    }
  }

  test("bloomJoin result is identical to the plain join") {
    val li = graft.sources.Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey")
    val dim = graft.sources.Tables(spark, sfDir, "part")
      .filter(col("p_brand") === "Brand#4").select("p_partkey", "p_size")
    val got = RuntimeFilter.bloomJoin(li, "l_partkey", dim, "p_partkey", 1 << 16, 6)
    val want = li.join(dim, col("l_partkey") === col("p_partkey"))
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
    // same-named key columns must not be ambiguous (the join resolves
    // through dataset aliases)
    val factK = li.select(col("l_orderkey"), col("l_partkey").as("key"))
    val dimK = dim.select(col("p_partkey").as("key"))
    assert(RuntimeFilter.bloomJoin(factK, "key", dimK, "key", 1 << 16, 6).count()
      == want.count())
  }

  test("prefilter keeps all matches and prunes most non-matches") {
    // dim = 100 keys out of 100k fact rows; the prefilter must keep every
    // true match and cut the fact side by orders of magnitude
    val fact = (1L to 100000L).toDF("fk")
    val dim = (1L to 100000L by 1000).toDF("dk") // 100 keys
    val kept = RuntimeFilter.bloomPrefilter(fact, "fk", dim, "dk", 1 << 16, 6)
    val keptKeys = kept.as[Long].collect().toSet
    val dimKeys = (1L to 100000L by 1000).toSet
    assert(dimKeys.subsetOf(keptKeys), "prefilter dropped a true match")
    assert(keptKeys.size < 2000, s"prefilter too weak: kept ${keptKeys.size} of 100000")
  }

  test("plan: bloom probe is a pre-exchange filter, build broadcasts one bounded row") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val dflt = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1") // the 100 TB shape: dim too big to auto-broadcast
      val li = graft.sources.Tables(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_partkey")
      val dim = graft.sources.Tables(spark, sfDir, "part")
        .filter(col("p_brand") === "Brand#4").select("p_partkey")
      val plan = RuntimeFilter.bloomJoin(li, "l_partkey", dim, "p_partkey")
        .queryExecution.executedPlan.toString
      assert(plan.contains("bloom_might_contain"), plan.take(2000))
      // the probe must sit BEFORE the join's exchange: the filter line
      // appears below (deeper than) the SortMergeJoin/ShuffledHashJoin
      val probeAt = plan.indexOf("bloom_might_contain")
      val joinAt = math.max(plan.indexOf("SortMergeJoin"), plan.indexOf("ShuffledHashJoin"))
      assert(joinAt >= 0, "expected a shuffled join under disabled auto-broadcast")
      assert(probeAt > joinAt, "bloom probe should be a child (printed after) the join")
      // the bloom reaches the probe as a LITERAL (Spark's own runtime-
      // filter mechanism) — NO broadcast exchange anywhere: not the dim,
      // and not the bitmap-as-column cross join (which would copy the
      // bitmap into every fact row)
      val bc = plan.sliding("BroadcastExchange".length).count(_ == "BroadcastExchange")
      assert(bc == 0, s"expected a literal bloom probe with no broadcast, saw $bc")
    } finally spark.conf.set(key, dflt)
  }
}
