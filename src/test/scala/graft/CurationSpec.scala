package graft

import org.apache.spark.sql.functions._
import graft.text.Curation

/** Corpus-curation operators: deterministic content split, PII scrub,
  * benchmark decontamination, KMV distinct sketch. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("splitLabel: deterministic, content-addressed, fractions roughly hold") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val split = docs.select(col("doc_id"),
      Curation.splitLabel(col("text"), Seq("train" -> 0.8, "val" -> 0.1), "test")
        .as("split"))
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9)
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) > 0)
    // determinism: same content → same label, independent of row order
    val again = docs.orderBy(desc("doc_id")).select(col("doc_id"),
      Curation.splitLabel(col("text"), Seq("train" -> 0.8, "val" -> 0.1), "test")
        .as("split"))
    assert(split.orderBy("doc_id").collect().toSeq ==
      again.orderBy("doc_id").collect().toSeq)
    // id re-assignment does not move content across splits (content hash)
    val renumbered = docs.withColumn("doc_id", col("doc_id") + 1000000)
      .select(Curation.splitLabel(col("text"), Seq("train" -> 0.8, "val" -> 0.1), "test")
        .as("split"))
    assert(renumbered.groupBy("split").count().as[(String, Long)].collect().toMap == counts)
  }

  test("null text and null groups flow through the curation operators") {
    // curationPipeline: a NULL-text doc must still get a keep/reason
    // row (it previously vanished through the NULL-fp equi-join)
    val docs = Seq((1L, "lorem ipsum " + Seq.fill(60)("the word is fine.").mkString(" ")),
      (2L, null: String), (3L, null: String)).toDF("doc_id", "text")
    val out = Curation.curationPipeline(docs, "doc_id", "text")
      .as[(Long, Boolean, Option[String])].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L), s"rows lost: ${out.toSeq}")
    // the two NULL-text docs dedup against each other: one is a duplicate
    assert(out.count(r => r._3.contains("duplicate")) == 1)
    // domainMix: NULL-group rows are sampled like any group, not dropped
    val mixed = Curation.domainMix(
      Seq((1L, "en", "a"), (2L, "en", "b"), (3L, null, "c"), (4L, null, "d"))
        .toDF("id", "lang", "text"), "lang", "id", "text")
    assert(mixed.columns.toSeq == Seq("lang", "id"))
    // no silent loss: every surviving row's id is one of the inputs and
    // the NULL group is ELIGIBLE (rate 1.0 — smallest group ties)
    assert(mixed.count() <= 4)
    // splitLabelSql escapes embedded quotes into valid SQL
    val sql = Curation.splitLabelSql("text", Seq("tr'ain" -> 0.8), "te'st")
    assert(sql.contains("'tr''ain'") && sql.contains("'te''st'"))
    intercept[IllegalArgumentException](
      Curation.splitLabel(col("text"), Seq.empty, "all"))
  }

  test("hexThreshold boundaries") {
    assert(Curation.hexThreshold(0.0) == "00000000")
    assert(Curation.hexThreshold(0.5) == "80000000")
    assert(Curation.hexThreshold(1.0) == "ffffffff")
  }

  test("scrubPii redacts email, ssn, phone; count matches") {
    val df = Seq(
      "mail me at jane.doe+x@example.co.uk today",
      "ssn 123-45-6789 phone 555-867-5309 and 555.867.5309",
      "no pii here 1234 5-12-3456",
      "edge 999-99-9999",
      "overlap 123-45-6789@example.com end").toDF("t")
      .select(col("t"), Curation.scrubPii(col("t")).as("s"),
        Curation.piiCount(col("t")).as("n"))
    val rows = df.collect()
    assert(rows(0).getString(1) == "mail me at <EMAIL> today" && rows(0).getLong(2) == 1)
    assert(rows(1).getString(1) == "ssn <SSN> phone <PHONE> and <PHONE>" && rows(1).getLong(2) == 3)
    assert(rows(2).getString(1) == rows(2).getString(0) && rows(2).getLong(2) == 0)
    assert(rows(3).getString(1) == "edge <SSN>" && rows(3).getLong(2) == 1)
    // overlapping spans count once — exactly as many as are redacted
    assert(rows(4).getString(1) == "overlap <EMAIL> end" && rows(4).getLong(2) == 1)
  }

  test("wordNgrams: sliding, distinct, short-doc truncation") {
    val df = Seq("a b c d", "a b").toDF("text")
      .select(split(col("text"), " ").as("w"))
      .repartition(2)
      .select(Curation.wordNgrams(col("w"), 3).as("g"))
    val got = df.as[Seq[String]].collect().toSet
    assert(got == Set(Seq("a b c", "b c d"), Seq("a b")))
  }

  test("contamination finds planted overlap and nothing else") {
    val corpus = Seq(
      (1L, "q w e r t y u i"),      // shares "x y z" 3-gram? no
      (2L, "p l a n t e d m a r k er"), // no overlap
      (3L, "z z top x y z here now")   // contains "x y z"
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "the bench set has x y z inside")).toDF("doc_id", "text")
    val hits = Curation.contamination(corpus, bench, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(3L -> 1L))
  }

  test("contamination: truncated grams, repeats, and delimiter fidelity (hashed path)") {
    // the kernel path hashes byte slices — these cases pin its parity
    // with the oracle's string semantics:
    val corpus = Seq(
      (1L, "a b"),                  // < n words: whole text = the one truncated gram
      (2L, "a  b c"),               // double space = empty middle word; gram "a  b" + " b c"... byte-faithful
      (3L, "x y z x y z x y z"),    // repeated gram: must count ONCE (countDistinct)
      (4L, ""),                     // empty text: one "" truncated gram
      (5L, "totally clean words here")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (97L, "a b"),                 // matches doc 1's truncated gram exactly
      (98L, "x y z"),               // matches doc 3 (once)
      (99L, "")                     // matches doc 4
    ).toDF("doc_id", "text")
    val hits = Curation.contamination(corpus, bench, "doc_id", "text", 3)
      .as[(Long, Long)].collect().toMap
    // doc 2: its 3-grams are "a  b" and " b c" (empty word kept) —
    // neither equals bench's "a b"/"x y z" under byte-faithful split
    assert(hits == Map(1L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("contamination plan: equi-join on gram, no cartesian, no corpus broadcast") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val plan = Curation.contamination(
      docs.filter(col("doc_id") % 97 =!= 0),
      docs.filter(col("doc_id") % 97 === 0), "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // with AQE the join strategy is runtime-chosen; statically we pin
    // that the only join is keyed on the gram column
    assert(plan.contains("gram"), plan)
  }

  test("packChunks: per-shard running offsets, boundary straddling") {
    val df = Seq(
      ("s1", 1L, "a b c"),          // 3 tokens: offset 0, chunks 0..0
      ("s1", 2L, "d e f g"),        // 4 tokens: offset 3, ends at 7 → 0..1 (cap 4)
      ("s1", 3L, "h"),              // offset 7, ends 8 → chunk 1..1
      ("s2", 9L, "x y z w v")       // separate shard: offset 0, 5 toks → 0..1
    ).toDF("source", "doc_id", "text")
    val got = Curation.packChunks(df, "doc_id", "text", "source", contextLen = 4)
      .orderBy("source", "doc_id")
      .select("source", "doc_id", "n_tokens", "tok_offset", "first_chunk", "last_chunk")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", 1L, 3L, 0L, 0L, 0L),
      ("s1", 2L, 4L, 3L, 0L, 1L),
      ("s1", 3L, 1L, 7L, 1L, 1L),
      ("s2", 9L, 5L, 0L, 0L, 1L)))
  }

  test("kmv_sketch aggregate: k smallest distinct values, duplicate-proof") {
    val vals = Seq(50L, 10L, 30L, 10L, 10L, 20L, 40L, 30L, 60L, 20L)
    val got = vals.toDF("h")
      .repartition(3) // exercise partial merge across partitions
      .agg(graft.functions.GraftFunctions.kmvSketch(col("h"), 4))
      .head().getSeq[Long](0)
    assert(got == Seq(10L, 20L, 30L, 40L)) // distinct, ascending, capped at k
    // fewer distinct than k → whole set
    val small = Seq(7L, 7L, 3L).toDF("h")
      .agg(graft.functions.GraftFunctions.kmvSketch(col("h"), 10))
      .head().getSeq[Long](0)
    assert(small == Seq(3L, 7L))
  }

  test("kmvEstimate plan has no distinct expansion — pure partial-sketch path") {
    val orders = graft.sources.Tables(spark, sfDir, "orders")
    val plan = Curation.kmvEstimate(orders, col("o_orderkey"), 64)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    // sketch estimate equals the distinct-based demo form's estimate
    val e1 = Curation.kmvEstimate(orders, col("o_orderkey"), 64).head().getDouble(0)
    val e2 = Curation.kmvDistinct(orders, col("o_orderkey"), 64).head().getDouble(0)
    assert(e1 == e2)
  }

  test("sampleKPerGroup: deterministic, k-capped, groups smaller than k kept whole") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val s1 = Curation.sampleKPerGroup(docs, "source", "doc_id", "text", 3)
      .orderBy("source", "doc_id").collect().toSeq
    // per-group cap holds
    val perGroup = s1.groupBy(_.getString(0)).view.mapValues(_.size)
    assert(perGroup.values.forall(_ <= 3))
    // deterministic under repartitioning
    val s2 = Curation.sampleKPerGroup(docs.repartition(7), "source", "doc_id", "text", 3)
      .orderBy("source", "doc_id").collect().toSeq
    assert(s1 == s2)
    // k larger than every group → identity (all rows sampled)
    val all = Curation.sampleKPerGroup(docs, "source", "doc_id", "text", 1 << 20)
    assert(all.count() == docs.count())
    // duplicate content must not inflate the sample past k: 4 rows but
    // only 2 distinct texts in one group, k=2 → exactly 2 rows
    val dupes = Seq(("g", 1L, "same text"), ("g", 2L, "same text"),
      ("g", 3L, "other"), ("g", 4L, "other")).toDF("source", "doc_id", "text")
    val got = Curation.sampleKPerGroup(dupes, "source", "doc_id", "text", 2)
      .orderBy("doc_id").as[(String, Long)].collect().toSeq
    assert(got == Seq(("g", 1L), ("g", 3L))) // min id represents each content
  }

  test("curation operators tolerate null and empty text without crashing") {
    import graft.text.TextStats
    val messy = Seq((1L, "alpha beta alpha beta", "s1"),
      (2L, null.asInstanceOf[String], "s1"),
      (3L, "", "s2")).toDF("doc_id", "text", "source")
    // split: null content hashes to a label deterministically (md5(null)
    // is null → falls to the last label), no exception
    val labels = messy.select(Curation.splitLabel(col("text"),
      Seq("train" -> 0.8, "val" -> 0.1), "test").as("s")).collect()
    assert(labels.length == 3 && labels.forall(!_.isNullAt(0)))
    // scrub/count: null in → null out (Spark null-propagation)
    val pii = messy.select(Curation.scrubPii(col("text")).as("s"),
      Curation.piiCount(col("text")).as("n")).collect()
    assert(pii(1).isNullAt(0) && pii(1).isNullAt(1))
    // packChunks: null text → token count of a null split is handled
    val packed = Curation.packChunks(messy, "doc_id", "text", "source", 4)
    assert(packed.count() == 3)
    // repetition: null words array → 0.0 (size(null) = -1 < n), same as
    // the oracle's nw IS NULL guard
    val repVals = messy.select(col("doc_id"), split(col("text"), " ").as("w"))
      .repartition(2)
      .select(col("doc_id"), TextStats.repetitionRatio(col("w"), 2).as("r"))
      .orderBy("doc_id").collect()
    assert(repVals(0).getDouble(1) == 0.3333) // 3 grams, 2 distinct
    assert(repVals(1).getDouble(1) == 0.0)
    assert(repVals(2).getDouble(1) == 0.0) // "" splits to one empty token
    // sampling + contamination + vocab: null rows must not throw
    assert(Curation.sampleKPerGroup(messy, "source", "doc_id", "text", 2).count() >= 1)
    assert(Curation.contamination(messy, messy.limit(1), "doc_id", "text", 2)
      .count() >= 0)
    assert(graft.text.Rank.buildVocab(messy, "doc_id", "text", 1L).count() >= 1)
  }

  test("kmv estimate within 25% of exact on order keys; exact when k >= n") {
    val orders = graft.sources.Tables(spark, sfDir, "orders")
    val r = Curation.kmvDistinct(orders, col("o_orderkey"), 256).head()
    val (est, exact) = (r.getDouble(0), r.getLong(1))
    assert(exact > 256, s"fixture too small: $exact")
    assert(math.abs(est - exact) / exact < 0.25, s"est $est vs exact $exact")
    // k >= distinct count → exact by construction
    val r2 = Curation.kmvDistinct(orders, col("o_orderkey"), 1 << 20).head()
    assert(r2.getDouble(0) == r2.getLong(1).toDouble && r2.getDouble(2) == 0.0)
  }

  test("assignIds: contiguous 0-based ids matching the global order, stable under repartition") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
      .select("doc_id", "source")
    val got = Curation.assignIds(docs, Seq("source", "doc_id"))
      .orderBy("gid").as[(Long, String, Long)].collect().toSeq
    val n = got.length
    assert(got.map(_._3) == (0L until n.toLong), "ids must be 0..n-1 contiguous")
    // ids follow the (source, doc_id) total order
    assert(got.map(r => (r._2, r._1)) == got.map(r => (r._2, r._1)).sorted)
    // physical partitioning must not change the assignment
    val again = Curation.assignIds(docs.repartition(7), Seq("source", "doc_id"))
      .orderBy("gid").as[(Long, String, Long)].collect().toSeq
    assert(again == got)
    intercept[IllegalArgumentException](
      Curation.assignIds(docs.withColumnRenamed("source", "gid"), Seq("gid")))
  }

  test("domainMix downsamples skewed groups toward the smallest") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val before = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val kept = Curation.domainMix(docs, "lang", "doc_id", "text")
    val after = kept.groupBy("lang").count().as[(String, Long)].collect().toMap
    val minBefore = before.values.min
    // smallest group survives whole; bigger groups shrink toward it
    // (hash thresholding: within sampling noise, not exact)
    assert(after(before.minBy(_._2)._1) == minBefore)
    after.foreach { case (g, n) =>
      assert(n <= before(g), s"$g grew")
      assert(math.abs(n - minBefore) < minBefore * 0.5, s"$g: $n vs target $minBefore")
    }
    // deterministic: same input → same kept set
    val again = Curation.domainMix(docs, "lang", "doc_id", "text")
    assert(kept.except(again).isEmpty && again.except(kept).isEmpty)
  }

  test("tokenBudget: shares sum to ~1, cumulative share is monotone largest-first") {
    val docs = graft.sources.Tables(spark, sfDir, "documents")
    val b = Curation.tokenBudget(docs, "source", "text")
      .orderBy(col("tokens").desc, col("source"))
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(b.nonEmpty)
    assert(math.abs(b.map(_._4).sum - 1.0) < 1e-3)
    assert(b.last._5 > 0.999 && b.last._5 <= 1.000001)
    b.sliding(2).foreach { case Seq(hi, lo) =>
      assert(hi._3 >= lo._3, "not sorted largest-first")
      assert(hi._5 <= lo._5 + 1e-12, "cum share must be monotone")
    case _ => }
    // docs/token totals reconcile with direct aggregation
    val direct = docs.groupBy("source")
      .agg(count(lit(1)).as("d"), sum(size(split(col("text"), " "))).as("t"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    b.foreach { case (s, d, t, _, _) => assert(direct(s) == (d, t), s) }
  }

  test("rankBuckets: integer-exact rank terciles, ties broken by id, tiny inputs") {
    val df = Seq((1L, 3.0), (2L, 1.0), (3L, 2.0), (4L, 1.0), (5L, 9.0), (6L, 0.5))
      .toDF("id", "score")
    val got = Curation.rankBuckets(df, "score", "id")
      .as[(Long, Double, String)].collect().map(r => r._1 -> r._3).toMap
    // order: 6(0.5) 2(1.0) 4(1.0 — id tiebreak) 3(2.0) 1(3.0) 5(9.0)
    assert(got == Map(6L -> "head", 2L -> "head", 4L -> "middle",
      3L -> "middle", 1L -> "tail", 5L -> "tail"))
    // tiny inputs follow the same integer rule: n=1 → rank 0 is head;
    // n=2 → rank 1 has 1*3=3 < 2*2 → middle (no tail until n >= 3)
    val one = Curation.rankBuckets(Seq((1L, 5.0)).toDF("id", "score"), "score", "id")
      .as[(Long, Double, String)].collect()
    assert(one.head._3 == "head")
    val two = Curation.rankBuckets(Seq((1L, 5.0), (2L, 1.0)).toDF("id", "score"), "score", "id")
      .as[(Long, Double, String)].collect().map(r => r._1 -> r._3).toMap
    assert(two == Map(2L -> "head", 1L -> "middle"))
  }

  test("lineDedup drops corpus-repeated lines, keeps order, nulls empty docs") {
    val docs = Seq(
      (1L, "unique one\nboilerplate footer\nunique two"),
      (2L, "boilerplate footer\nanother unique"),
      (3L, "  boilerplate footer  "), // whitespace-trimmed match; all lines drop
      (4L, "solo line")
    ).toDF("doc_id", "text")
    val out = Curation.lineDedup(docs, "doc_id", "text", minCount = 2)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[String])].collect()
    assert(out(0) === ((1L, 3L, 1L, Some("unique one\nunique two"))))
    assert(out(1) === ((2L, 2L, 1L, Some("another unique"))))
    assert(out(2) === ((3L, 1L, 1L, None))) // every line dropped → NULL
    assert(out(3) === ((4L, 1L, 0L, Some("solo line"))))
  }

  test("lineDedup keeps null-text docs as one empty line (no silent row loss)") {
    val docs = Seq((1L, null: String), (2L, null: String), (3L, "real line"))
      .toDF("doc_id", "text")
    val out = Curation.lineDedup(docs, "doc_id", "text", minCount = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Option[String])].collect()
    // both null docs present; their shared empty line hits the threshold
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(out(0) === ((1L, 1L, 1L, None)))
    assert(out(2) === ((3L, 1L, 0L, Some("real line"))))
  }

  test("lineDedup counts within-doc repeats toward the corpus threshold") {
    val docs = Seq((1L, "same line\nsame line"), (2L, "other")).toDF("doc_id", "text")
    val out = Curation.lineDedup(docs, "doc_id", "text", minCount = 2)
      .orderBy("doc_id").as[(Long, Long, Long, Option[String])].collect()
    assert(out(0) === ((1L, 2L, 2L, None)))
    assert(out(1) === ((2L, 1L, 0L, Some("other"))))
  }

  test("gopherQuality rules: word count, stopwords, symbols, alpha fraction") {
    val longGood = ("the quick brown fox jumps with vigor over the lazy dog " * 5).trim
    val docs = Seq(
      (1L, longGood),                       // 55 words, stopwords, alpha → keep
      (2L, "too short to keep"),            // word count below minWords
      (3L, longGood + " ### ... ### ... ### ... ###"), // symbol ratio >= 0.1
      (4L, ("123 456 789 000 111 " * 12).trim + " the with"), // alpha frac <= 0.8
      (5L, ("quick brown fox jumps vigor " * 11).trim) // no stopwords
    ).toDF("doc_id", "text")
    val out = Curation.gopherQuality(docs, "doc_id", "text", minWords = 50)
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Boolean]("keep")).toSeq ===
      Seq(true, false, false, false, false))
    val good = out(0)
    assert(good.getAs[Long]("n_words") === 55L)
    assert(good.getAs[Long]("n_stopwords") === 15L) // the×10, with×5
    assert(good.getAs[Double]("symbol_ratio") === 0.0)
    assert(good.getAs[Double]("frac_alpha_words") === 1.0)
    // null text is metric-safe and dropped
    val nulls = Curation.gopherQuality(
      Seq((9L, null: String)).toDF("doc_id", "text"), "doc_id", "text")
      .head()
    assert(!nulls.getAs[Boolean]("keep"))
  }

  test("curationPipeline: first-kill provenance, duplicate beats every later stage") {
    // a doc that passes c4+gopher: 60 words in punctuated 6-word lines,
    // stopword-bearing, alpha words
    val good = (1 to 10).map(i =>
      s"the quick brown fox line$i jumps.").mkString("\n")
    val docs = Seq(
      (1L, good),
      (2L, good),                        // exact copy -> duplicate (not c4/gopher)
      (3L, "short no punct"),            // killed by c4 (no qualifying lines)
      (4L, good.replace(".", ".") + "\n" + ("#### #### #### ####. " * 12).trim)
    ).toDF("doc_id", "text")
    val got = Curation.curationPipeline(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Boolean, Option[String])].collect().toSeq
    assert(got(0)._1 == 1L && got(1)._2 == false &&
      got(1)._3.contains("duplicate"), got.toString)
    assert(got(2)._3.contains("c4"))
    // doc 1 and 4 get SOME verdict from the lm/gopher stages without
    // crashing; reasons come only from the known set
    val allowed = Set("duplicate", "c4", "gopher", "lm_tail")
    assert(got.flatMap(_._3).forall(allowed))
    // keep flag is exactly reason-is-null
    assert(got.forall(r => r._2 == r._3.isEmpty))
  }

  test("dsirWeights: target-like source docs outrank target-unlike ones") {
    val docs = Seq(
      (1L, "alpha beta alpha beta alpha", true),   // target domain
      (2L, "alpha beta gamma alpha beta", true),
      (3L, "alpha beta alpha beta gamma", false),  // source, target-like
      (4L, "delta epsilon delta epsilon zeta", false), // source, unlike
      (5L, "delta zeta epsilon delta zeta", false)
    ).toDF("doc_id", "text", "tgt")
    val out = Curation.dsirWeights(docs, "doc_id", "text", col("tgt"))
      .orderBy("doc_id").collect()
    val w = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logw")).toMap
    // the target-like source doc must outweigh both unlike source docs
    assert(w(3L) > w(4L) && w(3L) > w(5L))
    // target docs score high under their own model
    assert(w(1L) > w(4L))
    // feature count = unigrams + bigrams = 5 + 4
    assert(out.head.getAs[Long]("n_feats") === 9L)
    // single-word doc: unigram only, no bigram, no crash
    val one = Curation.dsirWeights(
      Seq((9L, "alpha", false)).toDF("doc_id", "text", "tgt"),
      "doc_id", "text", col("tgt")).head()
    assert(one.getAs[Long]("n_feats") === 1L)
  }

  test("c4Clean: line keep rules, doc kill markers, null-safe") {
    val goodLine = "one two three four five six."
    val docs = Seq(
      (1L, s"$goodLine\n$goodLine\nanother fine sentence right here!\nno punct line here at all\nshort one."),
      (2L, s"$goodLine\n$goodLine"),                        // only 2 sentences -> killed
      (3L, s"$goodLine\n$goodLine\n$goodLine\ncontains Lorem Ipsum text."), // marker kill
      (4L, s"$goodLine\n$goodLine\n$goodLine\ncode { block }"),             // brace kill
      (5L, "nothing qualifies here"),
      (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Curation.c4Clean(docs, "doc_id", "text").orderBy("doc_id").collect()
    assert(out.map(_.getAs[Boolean]("keep")).toSeq ===
      Seq(true, false, false, false, false, false))
    // doc 1: 5 lines, 3 kept ("no punct" fails the terminal rule,
    // "short one." fails the 5-word floor)
    assert(out(0).getAs[Long]("n_lines") === 5L)
    assert(out(0).getAs[Long]("n_kept") === 3L)
    assert(out(0).getAs[String]("cleaned_text") ===
      s"$goodLine\n$goodLine\nanother fine sentence right here!")
    // marker kills still report their kept lines (the 4-word marker
    // line itself fails the 5-word floor)
    assert(out(2).getAs[Long]("n_kept") === 3L)
    // nothing kept -> cleaned_text NULL
    assert(out(4).getAs[String]("cleaned_text") == null)
    assert(out(5).getAs[Long]("n_lines") === 1L)
  }
}
