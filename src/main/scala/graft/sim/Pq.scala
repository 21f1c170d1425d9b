package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization for embedding-scale ANN (Jégou et al. 2011,
  * "Product Quantization for Nearest Neighbor Search"): the vector is
  * split into `m` subspaces, each subspace quantized to its nearest of
  * `nCentroids` codebook entries, and a corpus vector is stored as `m`
  * small codes — 64 float dims collapse to 8 bytes, the 32× memory cut
  * that makes a 100 TB vector corpus fit an ANN serving tier. Queries
  * score candidates by Asymmetric Distance Computation (ADC): one
  * per-query table of query-to-centroid sub-distances, then each
  * candidate's distance is `m` table lookups — no float vector is ever
  * read at query time.
  *
  * Codebook discipline: [[codebook]] builds a DETERMINISTIC codebook
  * (the subspace slices of the `nCentroids` lowest-id corpus vectors),
  * so the whole pipeline — codebook, codes, ADC ranks — is exactly
  * reproducible by the DuckDB oracle. A production system would train
  * per-subspace k-means instead (see [[graft.sim.Ann.ivfLearnedTopK]] for
  * the seeded-MLlib pattern); every downstream step is codebook-
  * agnostic, so swapping it in changes no operator code.
  *
  * Scale shape: the codebook is a bounded 1-row broadcast (nCentroids
  * structs — fixed size by construction, NOT corpus-sized). Encoding is
  * a pure scan-stage expression over the corpus (no shuffle). ADC
  * scoring broadcasts the small-by-contract query side, exactly like
  * [[Ann.bruteForceTopK]]; at 100 TB the scored side would additionally
  * be cell-pruned by an IVF coarse quantizer before ADC.
  */
object Pq {

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Squared L2 between subspace `s` (0-based) of two double arrays,
    * dims [s·subDim+1 .. (s+1)·subDim] — a deterministic left fold,
    * then fixed to MICRO-UNITS (×1e6, half-up, long). Integer
    * sub-distances make every downstream sum order-independent and the
    * argmin/rank comparisons integer-exact across engines — the same
    * reason the repo's double scores round through one spelled-out
    * formula (graft.functions.Det). */
  private[sim] def subDistMicro(a: Column, b: Column, s: Column, subDim: Int): Column =
    floor(aggregate(sequence(lit(1), lit(subDim)), lit(0.0), (acc, j) => {
      val d = element_at(a, (s * subDim + j).cast("int")) -
        element_at(b, (s * subDim + j).cast("int"))
      acc + d * d
    }) * 1000000.0 + 0.5).cast("long")

  /** Deterministic codebook: one row with `cb` = array of the
    * `nCentroids` lowest-id corpus vectors in id order (entry i = code
    * i-1). Bounded by construction — safe to broadcast. The 16-row sort
    * is a `limit` over the id column, not a corpus sort. */
  def codebook(corpus: DataFrame, idCol: String, vecCol: String,
               nCentroids: Int): DataFrame = {
    require(nCentroids >= 2, s"pq: need >= 2 centroids, got $nCentroids")
    corpus.orderBy(col(idCol)).limit(nCentroids)
      .select(struct(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("v")).as("e"))
      .groupBy()
      .agg(array_sort(collect_list(col("e"))).as("es"))
      .select(transform(col("es"), e => e.getField("v")).as("cb"))
  }

  /** Index of the nearest codebook entry for subspace `s` (0-based,
    * id-order tie-break via the integer (d, cid) struct-min) — ONE
    * definition shared by the encoder and the Lloyd trainer
    * ([[Kmeans.lloydIteration]]), so the assignment rule cannot
    * silently diverge between them. */
  private[sim] def nearestCode(v: Column, cb: Column, s: Column,
                               subDim: Int): Column =
    array_min(zip_with(cb, sequence(lit(0), size(cb) - 1),
      (cvec, cid) => struct(subDistMicro(v, cvec, s, subDim).as("d"),
        cid.as("cid"))))
      .getField("cid")

  /** Fail-loud dimension guard: subspaces past the actual vector length
    * would read out-of-bounds — a null-collapsed code-0 under legacy
    * SQL, an opaque INVALID_ARRAY_INDEX under ANSI. A standalone FILTER
    * predicate (never a wrapper column — see the CollapseProject note
    * in graft.geo). */
  private def dimGuard(v: Column, m: Int, subDim: Int): Column =
    when(size(v) >= lit(m * subDim), lit(true))
      .otherwise(raise_error(concat(
        lit(s"pq: m*subDim = ${m * subDim} exceeds the vector length "),
        size(v).cast("string"),
        lit(" — lower m/subDim to cover the embedding dimension"))))

  /** Encode every corpus vector as `m` codes (0-based, id-order
    * tie-break): per subspace, the index of the nearest codebook entry.
    * Pure scan-stage expression after a 1-row codebook broadcast —
    * returns (idCol, codes array<int>). */
  def encode(corpus: DataFrame, cb: DataFrame, idCol: String, vecCol: String,
             m: Int, subDim: Int): DataFrame = {
    val parts = corpus.sparkSession.sparkContext.defaultParallelism
    corpus.repartition(parts)
      .select(col(idCol), asDouble(col(vecCol)).as("__v"))
      .filter(dimGuard(col("__v"), m, subDim))
      .crossJoin(broadcast(cb))
      .select(col(idCol),
        transform(sequence(lit(0), lit(m - 1)), s =>
          nearestCode(col("__v"), col("cb"), s, subDim)).as("codes"))
  }

  /** One row per query: (query_id, __qtab) where __qtab is the m ×
    * nCentroids table of micro-unit query-to-centroid sub-distances —
    * the per-query half of ADC, computed once and broadcast (the query
    * side is small by contract). */
  private def queryAdcTable(queries: DataFrame, cb: DataFrame, idCol: String,
                            vecCol: String, m: Int, subDim: Int): DataFrame = {
    val qtab = transform(sequence(lit(0), lit(m - 1)), s =>
      transform(col("cb"), cvec => subDistMicro(col("__q"), cvec, s, subDim)))
    queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("__q"))
      .filter(dimGuard(col("__q"), m, subDim))
      .crossJoin(broadcast(cb))
      .select(col("query_id"), qtab.as("__qtab"))
  }

  /** A candidate's ADC distance: m integer table lookups summed in
    * subspace order — order-independent, so ranks are integer-exact
    * across engines. Expects `__qtab` and `codes` columns in scope. */
  private def adcExpr(m: Int): Column =
    aggregate(sequence(lit(1), lit(m)), lit(0L), (acc, s) =>
      acc + element_at(element_at(col("__qtab"), s.cast("int")),
        (element_at(col("codes"), s.cast("int")) + 1).cast("int")))

  /** ADC top-k: per query, a subspace×centroid distance table (m ×
    * nCentroids micro-unit longs — computed once per query), then every
    * candidate's approximate distance is m integer lookups summed —
    * order-independent, so ranks are integer-exact across engines with
    * the id tie-break. Returns (query_id, neighbor_id, adc_micro,
    * rank). */
  def adcTopK(queries: DataFrame, codes: DataFrame, cb: DataFrame,
              idCol: String, vecCol: String, k: Int, m: Int,
              subDim: Int): DataFrame = {
    val q = broadcast(queryAdcTable(queries, cb, idCol, vecCol, m, subDim))
    val w = Window.partitionBy("query_id")
      .orderBy(col("adc_micro").asc, col("neighbor_id").asc)
    q.crossJoin(codes.select(col(idCol).as("neighbor_id"), col("codes")))
      .select(col("query_id"), col("neighbor_id"), adcExpr(m).as("adc_micro"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** The full deterministic PQ pipeline over one corpus: codebook →
    * encode → ADC top-k. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8, subDim: Int = 8,
             nCentroids: Int = 16): DataFrame = {
    val cb = codebook(corpus, idCol, vecCol, nCentroids)
    val codes = encode(corpus, cb, idCol, vecCol, m, subDim)
    adcTopK(queries, codes, cb, idCol, vecCol, k, m, subDim)
  }

  /** FAISS-style IVF-PQ — the composed production ANN topology: the
    * coarse quantizer routes each query to its `nprobe` nearest cells
    * (cosine to the per-cell mean centroid, as [[Ann.ivfTopK]]), PQ
    * codes score ONLY the probed cells' members by ADC, and the ADC
    * shortlist is exactly reranked with the float vectors. At 100 TB
    * the scan touches nprobe/|cells| of the corpus and reads 8-byte
    * codes, not 256-byte vectors, until the final rerank of
    * `shortlist` rows per query.
    *
    * Exactness pin: with nprobe >= |cells| AND shortlist >= |corpus|
    * this equals brute force — the registered oracle form (same
    * pattern as q_ann_ivf_verify); pruned settings trade recall for
    * touched cells × codes. Returns (query_id, neighbor_id, cos,
    * rank). */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                vecCol: String, cellCol: String, k: Int, nprobe: Int,
                shortlist: Int, m: Int = 8, subDim: Int = 8,
                nCentroids: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(queries.sparkSession)
    val parts = corpus.sparkSession.sparkContext.defaultParallelism
    // coarse routing: tiny cells×dim centroid table, broadcast
    val cents = Ann.centroids(corpus, cellCol, vecCol)
    val wProbe = Window.partitionBy("query_id")
      .orderBy(col("ccos").desc, col("cell").asc)
    val probes = queries
      .select(col(idCol).as("query_id"), asDouble(col(vecCol)).as("qv"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("cell"),
        graft.functions.GraftFunctions.cosineSim(col("qv"), col("centroid")).as("ccos"))
      .withColumn("p", row_number().over(wProbe))
      .filter(col("p") <= nprobe)
      .select("query_id", "cell")
    // PQ codes carry their cell for the probe join
    val cb = codebook(corpus, idCol, vecCol, nCentroids)
    val codes = encode(corpus, cb, idCol, vecCol, m, subDim)
      .join(corpus.select(col(idCol), col(cellCol).as("cell")), idCol)
    val qt = broadcast(queryAdcTable(queries, cb, idCol, vecCol, m, subDim))
    val wAdc = Window.partitionBy("query_id")
      .orderBy(col("adc_micro").asc, col("neighbor_id").asc)
    val cand = probes
      .join(codes.select(col("cell"), col(idCol).as("neighbor_id"), col("codes")), "cell")
      .join(qt, "query_id")
      .select(col("query_id"), col("neighbor_id"), adcExpr(m).as("adc_micro"))
      .withColumn("sl", row_number().over(wAdc))
      .filter(col("sl") <= shortlist)
      .select("query_id", "neighbor_id")
    // exact rerank of the shortlist
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")))
    val c = corpus.repartition(parts).select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val wK = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.join(c, "neighbor_id")
      .join(q, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.Det.round4(
          graft.functions.GraftFunctions.cosineSim(col("qv"), col("cv"))).as("cos"))
      .withColumn("rank", row_number().over(wK))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** PQ shortlist + exact rerank — the production serving shape: ADC
    * prunes the corpus to `shortlist` candidates per query (codes-only
    * scan), then exact cosine reranks just those. With shortlist ≥
    * corpus size this EQUALS brute force (PqSpec pins that); at scale
    * the shortlist bounds the float-vector reads per query. */
  def pqRerankTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                   vecCol: String, k: Int, shortlist: Int, m: Int = 8,
                   subDim: Int = 8, nCentroids: Int = 16): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(queries.sparkSession)
    val cand = pqTopK(queries, corpus, idCol, vecCol, shortlist, m, subDim, nCentroids)
      .select(col("query_id"), col("neighbor_id"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      asDouble(col(vecCol)).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"),
      asDouble(col(vecCol)).as("cv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cand.join(c, "neighbor_id")
      .join(q, "query_id")
      .select(col("query_id"), col("neighbor_id"),
        graft.functions.Det.round4(
          graft.functions.GraftFunctions.cosineSim(col("qv"), col("cv"))).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }
}
