package graft

import org.apache.spark.sql.functions._
import graft.sim.{Ann, Pq}

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val embs = graft.sources.Tables(spark, sfDir, "embeddings")

  test("encode: m codes per vector, each within the codebook range") {
    val cb = Pq.codebook(embs, "vec_id", "embedding", nCentroids = 16)
    val codes = Pq.encode(embs, cb, "vec_id", "embedding", m = 8, subDim = 8)
    val bad = codes.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c > 15)).count()
    assert(bad === 0L)
    assert(codes.count() === embs.count())
  }

  test("a corpus vector identical to the query attains the minimal ADC distance") {
    // plant an exact copy of query vec 3 under a fresh id
    val copy = embs.filter(col("vec_id") === 3)
      .select((col("vec_id") + 900000L).as("vec_id"), col("embedding"))
    val corpus = embs.select("vec_id", "embedding").unionByName(copy)
    val top = Pq.pqTopK(embs.filter(col("vec_id") === 3), corpus,
      "vec_id", "embedding", k = corpus.count().toInt, m = 8, subDim = 8)
    val byId = top.select("neighbor_id", "adc_micro")
      .as[(Long, Long)].collect().toMap
    val minAdc = byId.values.min
    // the copy's code word minimizes every subspace term for this query
    assert(byId(900003L) === minAdc)
    assert(byId(3L) === minAdc)
  }

  test("PQ shortlist + exact rerank at full shortlist equals brute force") {
    val q = embs.filter(col("vec_id") < 3)
    val n = embs.count().toInt
    val got = Pq.pqRerankTopK(q, embs, "vec_id", "embedding",
        k = 10, shortlist = n)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val want = Ann.bruteForceTopK(q, embs, "vec_id", "embedding", 10)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(got === want)
  }

  test("IVF-PQ: exactness form equals brute force; pruned form stays inside probed cells") {
    val q = embs.filter(col("vec_id") < 3)
    val exact = Pq.ivfPqTopK(q, embs, "vec_id", "embedding", "label",
        k = 10, nprobe = 1000, shortlist = 10000000)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    val bf = Ann.bruteForceTopK(q, embs, "vec_id", "embedding", 10)
      .orderBy("query_id", "rank")
      .as[(Long, Long, Double, Int)].collect().toSeq
    assert(exact === bf)
    // pruned serving shape: k rows per query, every neighbor from a
    // probed cell (labels are NOT geometric clusters in this corpus, so
    // recall is nprobe/|cells| by construction — no recall floor here)
    val pruned = Pq.ivfPqTopK(q, embs, "vec_id", "embedding", "label",
      k = 10, nprobe = 2, shortlist = 100)
    val counts = pruned.groupBy("query_id").count()
      .as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ == 10L) && counts.size == 3)
    val cellOf = embs.select(col("vec_id"), col("label"))
      .as[(Long, Int)].collect().toMap
    val probedPerQ = pruned.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(p => cellOf(p._2)).toSet).toMap
    assert(probedPerQ.values.forall(_.size <= 2), probedPerQ.toString)
  }

  test("lloydIteration: every cluster owns its seed vector; means are member averages") {
    import graft.sim.Kmeans
    val out = Kmeans.lloydIteration(embs, "vec_id", "embedding", k = 8, dim = 64)
      .collect()
    assert(out.length === 8 * 64)
    // each cluster's member count is the same across its 64 dims
    val byCluster = out.groupBy(_.getAs[Int]("cluster"))
      .view.mapValues(_.map(_.getAs[Long]("n")).toSet).toMap
    assert(byCluster.size === 8 && byCluster.values.forall(_.size == 1))
    // the seed vectors are their own nearest centroid (distance 0), so
    // every cluster is non-empty and counts sum to the corpus
    assert(byCluster.values.map(_.head).sum === embs.count())
    assert(byCluster.values.forall(_.head >= 1L))
    // a singleton-cluster sanity: planting one far-away vector makes it
    // a seed whose cluster mean IS the vector (exact reproduction)
    val far = Seq((-1L, Array.fill(64)(100.0f))).toDF("vec_id", "embedding")
    val out2 = Kmeans.lloydIteration(
      embs.select("vec_id", "embedding").unionByName(far),
      "vec_id", "embedding", k = 8, dim = 64)
    val c0 = out2.collect().filter(_.getAs[Int]("cluster") == 0)
    assert(c0.length === 64 && c0.forall(_.getAs[Long]("n") == 1L))
    assert(c0.forall(_.getAs[Double]("mean") == 100.0))
  }

  test("PQ shortlist recall: a 10x shortlist recovers most of the exact top-10") {
    val q = embs.filter(col("vec_id") < 3)
    val short = Pq.pqRerankTopK(q, embs, "vec_id", "embedding",
        k = 10, shortlist = 100)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val exact = Ann.bruteForceTopK(q, embs, "vec_id", "embedding", 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (short & exact).size.toDouble / exact.size
    // even the untrained lowest-id codebook should route a 10x
    // shortlist to better than chance (100/2000 = 5%)
    assert(recall >= 0.3, s"recall $recall")
  }

  test("dimension and band guards fail loud, not with null-collapsed codes") {
    // m*subDim beyond the 64-dim embeddings: subspaces past the end
    // would silently encode as code 0 (null-collapsed argmin) — must
    // raise a named error instead
    val e = intercept[Exception](
      Pq.pqTopK(embs.filter(col("vec_id") < 2), embs, "vec_id", "embedding",
        k = 5, m = 16, subDim = 8).collect())
    assert(e.getMessage.contains("exceeds the vector length"), e.getMessage)
    // LSH band math: bands > numPlanes would put EVERY row in one
    // bucket (a silent cross join); non-divisible bands drop sign bits
    intercept[IllegalArgumentException](
      Ann.lshTopK(embs, embs, "vec_id", "embedding", 5, numPlanes = 16, bands = 32))
    intercept[IllegalArgumentException](
      Ann.lshTopK(embs, embs, "vec_id", "embedding", 5, numPlanes = 16, bands = 3))
  }
}
