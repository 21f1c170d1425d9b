package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Term-weighting / retrieval scoring over a document corpus: TF-IDF
  * statistics and BM25 ranking (Robertson et al., the Okapi BM25
  * formula) — the text-analysis layer a training-data pipeline uses for
  * corpus-level term statistics, query-based slicing, and relevance
  * filtering.
  *
  * Scale shape: term frequencies are one groupBy(doc, term) over the
  * exploded token stream (map-side combine), document frequencies one
  * groupBy(term); both shuffle keyed aggregates, no cross joins. The
  * corpus constants (N, average length) are a 1-row aggregate joined by
  * literal broadcast. Scoring a query touches only the posting rows of
  * the query's terms — the term filter pushes into the tf aggregate's
  * input scan.
  */
object Rank {

  /** (doc_id, term, tf) — term frequencies of the whitespace-token
    * stream, lowercased. */
  def termFreqs(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Long-tail inverted index over word BIGRAMS: one row per term
    * whose df is at most a 1/denom fraction of the corpus, carrying the
    * full ascending posting list (comma-joined — a string survives
    * every engine's row canonicalizer; a raw array does not). The df
    * cutoff is the honesty knob at 100 TB: a hot term's posting list is
    * corpus-sized and would be sharded (delta-encoded blocks keyed by
    * (term, shard)), never carried as one aggregate row — this operator
    * serves the long tail, where the fraction bounds every list. The
    * cutoff compares integers (`df * denom <= n`), so the selection is
    * engine-portable. One keyed shuffle; map-side partial collect_list;
    * the 1-row corpus count crosses as a literal broadcast. */
  def postings(docs: DataFrame, idCol: String, textCol: String,
               denom: Int = 25): DataFrame = {
    require(denom >= 1, s"postings: denom must be >= 1, got $denom")
    graft.functions.GraftFunctions.ensureRegistered(docs.sparkSession)
    val parts = docs.sparkSession.sparkContext.defaultParallelism
    // SINGLE-AGGREGATE form (round 9; supersedes the two-phase
    // head-anti form). The driver counts the corpus once — the head
    // cutoff becomes a PLAN parameter — and one keyed aggregate
    // produces df and the posting list together: count(1) is the exact
    // df; capped_collect_longs stops appending past cap = ⌊N/denom⌋,
    // so a hot-head term abandons its list (NULL) instead of building
    // a corpus-sized buffer, and the post-aggregate df filter keeps a
    // term iff its list is complete (df ≤ cap ⇔ never overflowed,
    // including across partials — see the kernel scaladoc). vs the
    // two-phase form this deletes the df-partials exchange, the
    // broadcast anti-join probe per gram row, AND the second reader of
    // the gram exchange (kernel+explode ran twice under ReuseExchange;
    // measured A/B below). Gram generation + per-doc distinct + the
    // ^\S+ \S+$ cleanliness filter stay fused in the codegen
    // clean_word_bigrams kernel; the repartition spreads gram work off
    // the few parquet splits and hash-partitions on the id
    // (deterministic, not round-robin — the AQE stage-cache trap).
    // SNAPSHOT CONTRACT: docs is scanned TWICE — count() here bakes N
    // into the cap and the df filter, and the main query re-executes
    // the plan below. A deterministic source (parquet tables, as
    // everywhere in this engine) makes both passes see the same corpus;
    // a changing or non-deterministic docs (a stream, a sample without
    // a seed) could disagree and shift the head cutoff silently —
    // Mat(docs) first in that case.
    val n = docs.count()
    val cap = math.max(n / denom, 1L)
    docs
      .select(col(idCol).as("doc_id"), lower(col(textCol)).as("t"))
      .repartition(parts, col("doc_id"))
      .select(col("doc_id"),
        explode(graft.functions.GraftFunctions.cleanWordBigrams(col("t"))).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        graft.functions.GraftFunctions
          .cappedCollectLongs(col("doc_id"), cap).as("docs_arr"))
      .filter(col("df") * denom <= lit(n))
      .select(col("term"), col("df"),
        array_join(sort_array(col("docs_arr")), ",").as("docs"))
  }

  /** Tokenizer-style vocabulary table: terms appearing in at least
    * `minDf` documents, with stable ids assigned by (document
    * frequency desc, term) rank. The corpus-sized work is the keyed
    * df aggregate; the single-partition rank window only ever sees the
    * VOCABULARY (distinct terms above the cutoff — bounded by the
    * language, not the corpus). Returns (term, df, term_id). */
  def buildVocab(docs: DataFrame, idCol: String, textCol: String,
                 minDf: Long): DataFrame = {
    val dfreq = termFreqs(docs, idCol, textCol)
      .groupBy("term").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDf)
    dfreq.select(col("term"), col("df"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("df").desc, col("term"))).cast("long").as("term_id"))
  }

  /** Apply a [[buildVocab]] vocabulary to encode every document as its
    * token-id sequence — the "tokenize the corpus" step after vocab
    * training: per token position, the term's vocab id, out-of-vocab →
    * 0 (the reserved UNK id). Returns (idCol, n_tokens, n_oov,
    * ids_csv) with ids in original token order; every doc survives
    * (empty text encodes as the single UNK of its one empty token).
    *
    * Scale shape: position-annotated tokens left-join the vocab on the
    * term (the vocab is language-bounded — AQE broadcasts it while it
    * fits, and the join stays a hash shuffle beyond that); the id
    * sequence reassembles in one per-doc aggregation, the same
    * explode → equi-join → in-order fold-back shape as
    * [[graft.text.Curation.lineDedup]].
    *
    * The docs are RANGE-partitioned on the id BEFORE the explode (r11,
    * guide §2.4): while the vocab join stays broadcast the partitioning
    * survives to the aggregation (RangePartitioning satisfies the
    * groupBy's ClusteredDistribution — no hash exchange) and to a
    * caller's orderBy(idCol) (OrderedDistribution — the global sort is
    * partition-local, no sample job). One exchange total, and the
    * explode+aggregate run at cluster width instead of on the scan's
    * splits. If the vocab ever outgrows broadcast, the term-keyed
    * shuffle join breaks the chain and the caller's orderBy plans its
    * own range exchange — slower, still correct. */
  def tokenize(docs: DataFrame, idCol: String, textCol: String,
               minDf: Long): DataFrame = {
    require(!Seq("pos", "term", "term_id", "n_tokens", "n_oov", "ids_csv")
        .contains(idCol.toLowerCase),
      s"tokenize: idCol '$idCol' collides with the operator's working/output columns")
    val vocab = buildVocab(docs, idCol, textCol, minDf).select("term", "term_id")
    val par = docs.sparkSession.sparkContext.defaultParallelism
    val toks = docs.repartitionByRange(par, col(idCol)).select(col(idCol),
      posexplode(split(lower(coalesce(col(textCol), lit(""))), " "))
        .as(Seq("pos", "term")))
    toks.join(vocab, Seq("term"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("term_id").isNull, 1L).otherwise(0L)).as("n_oov"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"),
            coalesce(col("term_id"), lit(0L)).as("tid")))),
          s => s.getField("tid").cast("string")), ",").as("ids_csv"))
  }

  /** Top-k TF-IDF keywords per document: score = tf * ln((N+1)/(df+1))
    * (add-one smoothed idf), rounded to 4 decimals BEFORE ranking so
    * ties break identically everywhere (then term asc). Returns
    * (doc_id, term, score, rnk <= k).
    *
    * Scale shape: ONE corpus-sized exchange — the raw text,
    * hash-partitioned on the doc id. Both the tf and the df branch
    * read that same exchange (identical column sets, so ReuseExchange
    * keeps one copy; the naive two-branch form re-ran the
    * explode+partial-agg scan twice — its df branch pruned the count
    * buffer, de-canonicalizing the subtree). Partitioning on the id
    * alone satisfies every doc-keyed clustered distribution
    * downstream, so the (doc_id, term) tf aggregate, the per-doc
    * dedup feeding df, AND the top-k heap all run exchange-free; the
    * only other shuffles carry the vocabulary-bounded df partials and
    * the k·N result rows. df joins back WITHOUT a broadcast hint: df
    * is corpus-DERIVED (web-scale corpora grow distinct terms
    * near-linearly for a long regime — a forced broadcast is the
    * round-2 scale-killer, and an 8 GB+ vocabulary would abort the
    * job where a shuffle join completes). AQE promotes the join to
    * broadcast at runtime when df truly fits — measured here: the
    * same single-map-side plan, no tf term-exchange materializes. */
  def keywords(docs: DataFrame, idCol: String, textCol: String,
               k: Int = 3): DataFrame = {
    require(k >= 1, s"keywords: k must be >= 1, got $k")
    val parts = docs.sparkSession.sparkContext.defaultParallelism
    val base = docs.select(col(idCol).as("doc_id"), col(textCol).as("__t"))
      .repartition(parts, col("doc_id"))
    def terms(df: DataFrame) = df.select(col("doc_id"),
        explode(split(lower(col("__t")), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = terms(base).groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = terms(base).select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val consts = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(consts))
      .select(col("doc_id"), col("term"),
        graft.functions.Det.round4(col("tf") * log((col("n_docs") + 1) / (col("df") + 1))).as("score"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("score"), col("rnk"))
  }

  /** BM25 ranking of documents against a bag-of-terms query.
    * k1 controls tf saturation, b length normalization; idf is the
    * standard smoothed form ln(1 + (N - df + 0.5)/(df + 0.5)).
    * Returns the top `limit` (doc_id, score) rows, score rounded to 4
    * decimals, deterministic doc_id tiebreak. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
           limit: Int = 10): DataFrame = {
    require(queryTerms.nonEmpty, "bm25: query terms must be non-empty")
    require(limit >= 1, s"bm25: limit must be >= 1, got $limit")
    val terms = queryTerms.map(_.toLowerCase).distinct
    val tf = termFreqs(docs, idCol, textCol)
    // coalesce NULL text to '' BEFORE split: size(split(null)) is -1
    // under legacy sizeOfNull, silently polluting avg_dl (the DuckDB
    // oracle's avg() would skip a NULL — engine/oracle divergence)
    val lens = docs.select(col(idCol).as("doc_id"),
      size(split(lower(coalesce(col(textCol), lit(""))), " ")).cast("double").as("dl"))
    // corpus constants: one row, joined as a literal broadcast
    val consts = lens.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avg_dl"))
    val df = tf.filter(col("term").isin(terms: _*))
      .groupBy("term").agg(count(lit(1)).cast("double").as("df"))
    val scored = tf.filter(col("term").isin(terms: _*))
      .join(df, "term")
      .join(lens, "doc_id")
      .crossJoin(broadcast(consts))
      .select(col("doc_id"),
        (log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avg_dl"))))
          .as("s"))
      // decimal-exact sum (partition-order-independent), then the
      // deterministic double rounding shared with the oracle
      .groupBy("doc_id").agg(graft.functions.Det.round4(
        sum(col("s").cast("decimal(30,15)")).cast("double")).as("score"))
    scored.orderBy(col("score").desc, col("doc_id")).limit(limit)
  }
}
