package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.analytics.Analytics
import graft.sources.{Export, Sources, Tables}
import graft.sources.Sources.Year

/** Physical-plan audits: the scale properties (filter pushdown, column
  * pruning, broadcast joins, whole-stage codegen) must be visible in the
  * executed plan, not assumed. */
class PlanSpec extends SparkSpec {

  private def planOf(df: DataFrame): String = {
    // render with a generous metadata budget: the default 100-char
    // truncation can cut a PushedFilters list mid-entry (timestamp
    // literals render long since the LTZ read-path change), which would
    // fail contains() checks on filters that ARE pushed
    val key = "spark.sql.maxMetadataStringLength"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "2000")
    try df.queryExecution.executedPlan.toString()
    finally spark.conf.set(key, prev)
  }

  test("q_load_year: year selector compiles to a pushed range predicate") {
    val df = Sources.load(Tables(spark, sfDir, "orders"),
      date = Some(("o_orderdate", Year(1997))))
    val p = planOf(df)
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("GreaterThanOrEqual(o_orderdate") && p.contains("LessThan(o_orderdate"),
      s"year filter must push as a range, got:\n$p")
  }

  test("q_load_select: read schema pruned to the projection") {
    val df = Sources.load(Tables(spark, sfDir, "lineitem"),
      select = Seq("l_orderkey", "l_quantity"))
    val p = planOf(df)
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), p)
  }

  test("q1: map-side partial aggregation precedes the exchange") {
    val p = planOf(Analytics.q1(spark, sfDir))
    // partial_* before the Exchange = map-side combine: the shuffle
    // carries 6 grouped rows, not the scan.
    assert(p.contains("partial_sum") && p.indexOf("partial_sum") > p.indexOf("Exchange"), p)
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
  }

  test("q5: all three dims join via BroadcastHashJoin") {
    val p = planOf(Analytics.q5(spark, sfDir))
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts:\n$p")
  }

  test("q3: filtered customer side is broadcast; date filters pushed") {
    val p = planOf(Analytics.q3(spark, sfDir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"), p)
  }

  /** Run with auto-broadcast disabled: any BroadcastExchange left in the
    * initial plan can then only come from an explicit broadcast() hint —
    * exactly what must NOT exist on a corpus-derived side. (AQE may still
    * freely convert small sides to broadcast at runtime.) */
  private def withoutAutoBroadcast[T](f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, old)
  }

  test("q_window_topn compiles to the bounded-heap aggregate, not a Window sort") {
    // graft.plans.TopKRewrite: the REGISTERED query (not a synthetic
    // twin) must plan as topk_rows partial aggregation with no Window
    // operator and no per-group sort of the revenue table.
    val p = planOf(Analytics.windowTopN(spark, sfDir))
    assert(p.contains("partial_topk_rows"), s"expected heap aggregate:\n$p")
    assert(!p.contains("Window"), s"Window must be rewritten away:\n$p")
  }

  test("ann brute-force top-k compiles through the topk rewrite") {
    val p = planOf(graft.sim.Ann.bruteForceTopK(
      Tables(spark, sfDir, "embeddings").limit(5),
      Tables(spark, sfDir, "embeddings"), "vec_id", "embedding", 10))
    assert(p.contains("partial_topk_rows") && !p.contains("Window"), p)
  }

  test("ngram pairs: salted equi-join on the block key, no corpus-side broadcast") {
    withoutAutoBroadcast {
      val df = graft.dedup.Dedup.ngramJaccardPairs(
        Tables(spark, sfDir, "documents"), "doc_id", "text", "source", 3, 0.6)
      val p = planOf(df)
      assert(p.contains("blk") && p.contains("salt"),
        s"pair generation must be a salted bucketed equi-join:\n$p")
      assert(!p.contains("BroadcastExchange"),
        s"corpus-derived gram table must never carry a broadcast hint:\n$p")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"no unblocked cross product allowed:\n$p")
    }
  }

  test("minhash pairs: band-bucket join, no corpus-side broadcast, no cross product") {
    withoutAutoBroadcast {
      val df = graft.dedup.Dedup.minhashPairs(
        Tables(spark, sfDir, "documents"), "doc_id", "text")
      val p = planOf(df)
      assert(p.contains("band_hash"), p)
      assert(!p.contains("BroadcastExchange"),
        s"corpus-derived banded/signature tables must never carry a broadcast hint:\n$p")
      assert(!p.contains("CartesianProduct"), s"no cross product:\n$p")
    }
  }

  test("minhash carrySigs: every exchange corpus-linear — no distinct, no re-attach") {
    withoutAutoBroadcast {
      val df = graft.dedup.Dedup.minhashPairs(
        Tables(spark, sfDir, "documents"), "doc_id", "text",
        carrySigs = true)
      // Unwrap AQE (the leaf-wrapper trap — see the DSIR test).
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      val plan = df.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
      // The whole point of carry mode: CANDIDATE-volume (Σ cluster²)
      // work must never reach an exchange. distinct() would appear as
      // an aggregate over the band-multiplied join output; the sig
      // re-attach as joins beyond the single bucket self-join. Both
      // detonated the disk at sf10 (SCALING.md, the sf10 drill).
      assert(plan.collect { case a: BaseAggregateExec => a }.isEmpty,
        s"carry mode must not distinct/aggregate the candidate stream:\n$plan")
      assert(plan.collect { case j: BaseJoinExec => j }.size == 1,
        s"carry mode has exactly the bucket self-join, no sig re-attach:\n$plan")
      // EVERY shuffle must key on the bucket columns (bands × sig per
      // doc — corpus-linear). An id-keyed exchange would be the sig
      // re-attach creeping back; a pair-keyed one the distinct. (The
      // initial plan holds one band-keyed copy per join side —
      // identical subtrees that ReuseExchange computes once at
      // runtime.)
      val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.nonEmpty &&
          shuffles.forall(_.outputPartitioning.toString.contains("band_hash")),
        s"carry mode shuffles only on the bucket key:\n$plan")
      // The signature table is Mat'd (checkpoint barrier): its scan
      // must be an ExistingRDD, not a recomputable parquet branch.
      assert(plan.toString.contains("Scan ExistingRDD"),
        s"sigs must be Mat'd (sunk-projection barrier):\n$plan")
      assert(plan.toString.contains("earlier_band_agree"),
        s"emit-once filter missing:\n$plan")
    }
  }

  test("postings: single-aggregate form — no joins, one gram exchange, capped lists") {
    withoutAutoBroadcast {
      val df = graft.text.Rank.postings(
        Tables(spark, sfDir, "documents"), "doc_id", "text")
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      // inputPlan is pre-EnsureRequirements (explicit repartitions
      // only); apply it to see the requirement-driven agg exchange too
      val plan = org.apache.spark.sql.execution.exchange.EnsureRequirements()(
        df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.inputPlan
          case p => p
        })
      // Round-9 shape: the head cutoff is a PLAN parameter (driver
      // count), so there is NO join of any kind — no head anti-join,
      // no df shuffle-join, no 1-row constant broadcast. One keyed
      // aggregate produces df and the capped posting list together.
      val joins = plan.collect { case j: BaseJoinExec => j }
      assert(joins.isEmpty, s"single-aggregate postings has no joins:\n$plan")
      assert(!plan.toString.contains("CartesianProduct"))
      // gram generation + distinct + \S-filter fused in the codegen
      // kernel (the HOF+rlike form ran interpreted)
      assert(plan.toString.contains("clean_word_bigrams"),
        s"fused gram kernel missing:\n$plan")
      assert(!plan.toString.contains("array_distinct"),
        s"interpreted HOF distinct crept back:\n$plan")
      // Hot-head lists must be abandoned inside the aggregate, never
      // materialized: the capped kernel rides the ONE term aggregate.
      assert(plan.toString.contains("capped_collect_longs"),
        s"capped posting-list kernel missing:\n$plan")
      assert(!plan.toString.contains("collect_list"),
        s"unbounded collect_list crept back:\n$plan")
      // Exactly two shuffles: the deterministic doc_id hash repartition
      // (spreads gram work off the parquet splits; not round-robin —
      // the AQE stage-cache trap) and the term aggregate exchange.
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.size == 2,
        s"expected doc_id repartition + term agg exchange only:\n$plan")
      assert(shuffles.exists(_.outputPartitioning.toString.contains("doc_id")),
        s"doc_id hash repartition missing:\n$plan")
      assert(!plan.toString.contains("RoundRobin"),
        s"postings must not round-robin (defeats runtime stage reuse):\n$plan")
    }
  }

  test("keywords: one shared doc-keyed corpus exchange, broadcast df, heap top-k") {
    withoutAutoBroadcast {
      val df = graft.text.Rank.keywords(
        Tables(spark, sfDir, "documents"), "doc_id", "text", k = 3)
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}
      // inputPlan is pre-EnsureRequirements (explicit repartitions only);
      // apply it so requirement-driven exchanges are visible too —
      // the assertion below is precisely that only ONE such exchange
      // (the vocabulary-bounded df partial) gets inserted
      val plan = org.apache.spark.sql.execution.exchange.EnsureRequirements()(
        df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.inputPlan
          case p => p
        })
      // ONE corpus-sized exchange: raw text hash-partitioned on the doc
      // id, carried identically by the tf and df branches so
      // ReuseExchange runs the scan map side once (the old form's df
      // branch pruned the count buffer → de-canonicalized subtree →
      // double explode scan). Remaining shuffles are term-keyed:
      // vocabulary-bounded df partials, plus the tf side of the
      // STATIC-fallback shuffle join — df carries NO broadcast hint
      // (corpus-derived side, the round-2 scale-killer); at runtime
      // AQE promotes the join to broadcast when df truly fits, and
      // the stage table shows no tf term-exchange materializing
      // (SCALING.md round 9). This test pins the scale-safe STATIC
      // shape under auto-broadcast off.
      val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
      val (docKeyed, rest) = shuffles.partition(
        _.outputPartitioning.toString.contains("doc_id"))
      val (docRepart, docEnsure) = docKeyed.partition(
        _.shuffleOrigin.toString.contains("REPARTITION"))
      assert(docRepart.size == 2 && docRepart.head.sameResult(docRepart(1)),
        s"branch repartitions must be reuse-identical:\n$plan")
      // the static SMJ fallback re-clusters the join output by doc_id
      // for the heap; at runtime the AQE broadcast preserves the doc
      // partitioning and this exchange never materializes (stage table)
      assert(docEnsure.size <= 1,
        s"at most the static-fallback heap re-cluster:\n$plan")
      val (single, keyed) = rest.partition(
        _.outputPartitioning.toString.contains("SinglePartition"))
      assert(keyed.nonEmpty &&
          keyed.forall(_.outputPartitioning.toString.contains("term")),
        s"non-doc shuffles must all be term-keyed (df finish + static join fallback):\n$plan")
      assert(single.size <= 1, s"only the n_docs constant may single-partition:\n$plan")
      // exactly the df equi-join on term, and NO corpus-scan broadcast
      // anywhere (the n_docs 1-row constant rides a
      // BroadcastNestedLoopJoin)
      val joins = plan.collect { case j: BaseJoinExec => j }
        .filterNot(_.getClass.getSimpleName.contains("NestedLoop"))
      assert(joins.size == 1, s"exactly the df join:\n$plan")
      assert(joins.head.leftKeys.toString.contains("term") ||
          joins.head.rightKeys.toString.contains("term"),
        s"df join must be keyed on term:\n$plan")
      // any broadcast side must be AGGREGATE-bounded (the 1-row n_docs
      // count) — a raw, un-aggregated corpus branch under a broadcast
      // is the round-2 scale-killer
      import org.apache.spark.sql.execution.exchange.BroadcastExchangeLike
      assert(plan.collect { case b: BroadcastExchangeLike => b }.forall(
          _.collectFirst { case a: BaseAggregateExec => a }.isDefined),
        s"every broadcast side must be aggregate-bounded:\n$plan")
      // the rank window is rewritten to the bounded-heap aggregate and
      // runs on the doc partitioning — no exchange between join and heap
      assert(plan.toString.contains("topk_rows"),
        s"window top-k must rewrite to the bounded heap:\n$plan")
    }
  }

  test("simhash/embed pairs: no corpus-side broadcast") {
    withoutAutoBroadcast {
      val ps = planOf(graft.dedup.Dedup.simhashPairs(
        Tables(spark, sfDir, "documents"), "doc_id", "text"))
      assert(!ps.contains("BroadcastExchange") && !ps.contains("CartesianProduct"), ps)
      val pe = planOf(graft.dedup.Dedup.embedCosinePairs(
        Tables(spark, sfDir, "embeddings"), "vec_id", "embedding", "label", 0.3))
      assert(!pe.contains("BroadcastExchange") && !pe.contains("CartesianProduct"), pe)
    }
  }

  test("asofJoin: one hash shuffle on the key, a window, and no join operator") {
    val events = Tables(spark, sfDir, "events")
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts")).agg(max("event_id").as("pid"))
    val p = planOf(graft.ops.Joins.asofJoin(events, purchases, "user_id", "ts", "ts"))
    assert(p.contains("Window"), p)
    assert(!p.contains("Join"), s"as-of must be union+window, not a join:\n$p")
    // exactly one hash exchange on the as-of key (the pre-agg reuses it)
    val keyExchanges = "hashpartitioning\\(__k".r.findAllIn(p).size
    assert(keyExchanges == 1, s"expected one __k exchange, got $keyExchanges:\n$p")
  }

  test("domainMix: rate table is AQE-joined, never hint-broadcast") {
    withoutAutoBroadcast {
      val p = planOf(graft.text.Curation.domainMix(
        Tables(spark, sfDir, "documents"), "lang", "doc_id", "text"))
      // the single-row min is the ONLY allowed broadcast; the per-group
      // rate table (unbounded cardinality at host granularity) is not
      val broadcasts = "BroadcastExchange".r.findAllIn(p).size
      assert(broadcasts <= 1, s"rate table must not be hint-broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), p.take(1500))
    }
  }

  test("assignIds: no global window, no single-partition funnel of the data") {
    val p = planOf(graft.text.Curation.assignIds(
      Tables(spark, sfDir, "documents").select("doc_id", "source"),
      Seq("source", "doc_id")))
    // the ids come from zipWithIndex over ONE range-partitioned RDD
    // (opaque to this plan); what must NOT appear is the
    // row_number-over-everything shape
    assert(!p.contains("Window"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("lineDedup and semantic dedup: no corpus-side broadcast") {
    withoutAutoBroadcast {
      val pl = planOf(graft.text.Curation.lineDedup(
        Tables(spark, sfDir, "documents")
          .select(col("doc_id"), regexp_replace(col("text"), "((\\w+ ){5})", "$1\n").as("text")),
        "doc_id", "text", 2))
      assert(!pl.contains("BroadcastExchange"),
        s"line-count side is corpus-derived, must not broadcast:\n$pl")
      val psem = planOf(graft.dedup.Dedup.semantic(
        Tables(spark, sfDir, "embeddings"), "vec_id", "embedding", "label", 0.3))
      assert(!psem.contains("BroadcastExchange") && !psem.contains("CartesianProduct"), psem)
    }
  }

  test("substring spans / DSIR: no corpus-side broadcast, no cross product") {
    withoutAutoBroadcast {
      val docs = Tables(spark, sfDir, "documents")
      val pspan = planOf(graft.dedup.Dedup.repeatedSpans(
        docs, "doc_id", "text", k = 10, minCount = 2))
      assert(!pspan.contains("BroadcastExchange") && !pspan.contains("CartesianProduct"),
        s"gram/word sides are corpus-derived, must not broadcast:\n$pspan")
      // dsir (r7 no-explode architecture): the model is trained by a
      // typed-imperative map-fold and applied by a driver-built
      // bounded lookup INSIDE dsir_score — the scoring plan must
      // contain NO join of any kind (the r6 broadcast-join probe paid
      // per-occurrence costs; a reappearing join means a regression to
      // that shape, and a SHUFFLE join on Zipfian feature keys is the
      // measured 100 TB killer this plan shape exists to avoid) and
      // NO Generate (occurrences must never exist as rows).
      // Unwrap AQE first: AdaptiveSparkPlanExec is a LEAF node, so a
      // collect over the wrapper sees nothing and the assertion would
      // pass vacuously (the r5 ADVICE finding) — traverse the initial
      // physical plan instead.
      val rawPlan = graft.text.Curation.dsirWeights(
        docs, "doc_id", "text", pmod(col("doc_id"), lit(10)) === 0)
        .queryExecution.executedPlan
      import org.apache.spark.sql.execution.{GenerateExec, SparkPlan}
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.joins.BaseJoinExec
      val dsirPlan = rawPlan match {
        case a: AdaptiveSparkPlanExec => a.inputPlan
        case p => p
      }
      // sensitivity guard: the scoring projection (dsir_score over the
      // materialized count maps) must be VISIBLE to this traversal,
      // else the check is vacuous (the r5 finding: collect over the
      // AQE leaf saw nothing)
      val hasScore = dsirPlan.collect {
        case p: SparkPlan if p.expressions.exists(_.exists(
          _.isInstanceOf[graft.functions.DsirScore])) => p
      }
      assert(hasScore.nonEmpty,
        s"expected the dsir_score fold in the unwrapped plan:\n$dsirPlan")
      val joins = dsirPlan.collect { case j: BaseJoinExec => j }
      assert(joins.isEmpty,
        s"dsir scoring must not join (model is a driver-built bounded fold):\n$dsirPlan")
      val gens = dsirPlan.collect { case g: GenerateExec => g }
      assert(gens.isEmpty,
        s"dsir must never explode occurrences into rows:\n$dsirPlan")
    }
  }

  test("bloom prefilter: the bitmap is a literal probe, zero broadcast exchanges") {
    withoutAutoBroadcast {
      val li = Tables(spark, sfDir, "lineitem").select("l_orderkey", "l_partkey")
      val dim = Tables(spark, sfDir, "part")
        .filter(col("p_brand") === "Brand#4").select("p_partkey")
      val p = planOf(graft.ops.RuntimeFilter.bloomPrefilter(li, "l_partkey", dim, "p_partkey"))
      assert(p.contains("bloom_might_contain"), p)
      assert(!p.contains("BroadcastExchange") && !p.contains("Join"),
        s"prefilter must be a pure scan-stage literal probe:\n$p")
    }
  }

  test("topk_agg: bounded-heap aggregate partial-aggregates before the shuffle") {
    val p = planOf(graft.analytics.Analytics.windowTopNAgg(spark, sfDir))
    // partial_topk_largest under ObjectHashAggregate BEFORE the exchange
    // = the shuffle carries at most k rows per group per partition.
    assert(p.contains("partial_topk_largest"),
      s"expected map-side partial top-k:\n$p")
    assert(p.indexOf("partial_topk_largest") > p.indexOf("Exchange"), p)
  }

  test("export writes canonical reference filenames") {
    assert(Export.csvFilename("Texas", "Austin", "Austin", "STOPS", Left("2020"))
      == "Texas_Austin_STOPS_2020.csv")
    assert(Export.csvFilename("Texas", "Austin", "Austin PD", "STOPS",
      Right(("2020", "2022"))) == "Texas_Austin_Austin PD_STOPS_2020_2022.csv")
    val tmp = java.nio.file.Files.createTempDirectory("graft_export").toString
    val path = Export.toParquet(Tables(spark, sfDir, "region"), tmp,
      "Texas", "Austin", "Austin", "STOPS", Left("2020"))
    val back = spark.read.parquet(path)
    assert(back.count() == 5)
    // csv export → canonical-name reload round trip (load_from_csv)
    Export.toCsv(Tables(spark, sfDir, "region"), tmp,
      "Texas", "Austin", "Austin", "STOPS", Left("2020"))
    val csvBack = Export.loadCsv(spark, tmp, "Texas", "Austin", "Austin",
      "STOPS", Left("2020"))
    assert(csvBack.count() == 5 && csvBack.columns.contains("r_name"))
  }

  test("partitioned export prunes whole partitions on a year filter") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_part").toString
    val orders = Tables(spark, sfDir, "orders")
      .withColumn("year", org.apache.spark.sql.functions.year(
        org.apache.spark.sql.functions.col("o_orderdate")))
    Export.toPartitionedParquet(orders, s"$tmp/orders_by_year", Seq("year"))
    // layout: one hive directory per year
    val dirs = new java.io.File(s"$tmp/orders_by_year").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.nonEmpty && dirs.forall(_.startsWith("year=")), dirs.mkString(","))
    val back = spark.read.parquet(s"$tmp/orders_by_year")
      .filter(org.apache.spark.sql.functions.col("year") === 1996)
    val plan = back.queryExecution.executedPlan.toString
    // the filter must reach the scan as a PARTITION filter (directory
    // pruning at plan time), not a post-scan row filter
    assert(plan.contains("PartitionFilters") &&
      plan.replaceAll("\\s+", " ").matches(".*PartitionFilters: \\[[^\\]]*year[^\\]]*1996.*"),
      plan.take(1500))
    val want = orders.filter(org.apache.spark.sql.functions.col("year") === 1996).count()
    assert(back.count() == want && want > 0)
  }

  test("q_range_join: unscaled-long sum — decimal cast fenced below the join") {
    val p = planOf(SparkEntry.queries("q_range_join")(spark, sfDir))
    // overlapping windows fan each event out ~240× at sf1, so the pair
    // stream must sum LONGS (fast hash map), never decimals (measured
    // 15.6 s vs 2.3 s); the one decimal rebuild happens per GROUP
    assert(!p.contains("sum(cast(value"),
      s"decimal sum leaked onto the pair stream:\n$p")
    assert(p.contains("sum(__uv"), s"missing unscaled-long sum:\n$p")
    // the MakeDecimal rebuild folds into the final aggregate's result
    // expressions (invisible in the summary string) — pin it logically
    val op = SparkEntry.queries("q_range_join")(spark, sfDir)
      .queryExecution.optimizedPlan.toString()
    assert(op.contains("MakeDecimal"), s"missing per-group decimal rebuild:\n$op")
    // the per-event cast must sit BELOW the repartition barrier, below
    // the join — an un-fenced projection collapses above the BHJ and
    // recomputes the cast per PAIR (measured 7.4 s vs 2.7 s at sf1)
    val iJoin = p.indexOf("BroadcastHashJoin")
    val iRepart = p.indexOf("REPARTITION_BY_NUM")
    val iUnscaled = p.indexOf("UnscaledValue")
    assert(iJoin >= 0 && iRepart >= 0 && iUnscaled >= 0,
      s"expected BHJ + repartition + UnscaledValue in:\n$p")
    assert(iJoin < iRepart && iRepart < iUnscaled,
      s"UnscaledValue must render below the repartition fence below the " +
        s"join (join@$iJoin, fence@$iRepart, cast@$iUnscaled):\n$p")
  }

  /** The sort-over-expensive-projection recipe (r10): a final GLOBAL
    * orderBy above an expensive map projection makes the range
    * exchange's sampling job re-execute the projection (~2× the query).
    * These queries instead RANGE-partition the cheap input by the sort
    * key and sort within partitions — the plan must show exactly one
    * exchange (a range one), and no global sort. */
  private def assertRangeThenLocalSort(name: String): Unit = {
    val p = planOf(SparkEntry.queries(name)(spark, sfDir))
    val exchanges = "Exchange (range|hash)partitioning".r.findAllIn(p).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("rangepartitioning"),
      s"$name: expected exactly one RANGE exchange, got $exchanges in:\n$p")
    assert(!p.contains("Sort [") || !"Sort \\[[^\\]]*\\], true".r.findFirstIn(p).isDefined,
      s"$name: global sort must not reappear above the projection:\n$p")
  }

  test("q_standardize_e2e: one range exchange below the std projection, local sort") {
    assertRangeThenLocalSort("q_standardize_e2e")
  }

  test("q_pii_scrub: one range exchange below the kernel, local sort") {
    assertRangeThenLocalSort("q_pii_scrub")
  }

  test("q_parse_dates: one range exchange below the parse projection, orderBy adds none") {
    // the r11 recipe variant that KEEPS orderBy: over range-partitioned
    // input the global sort satisfies OrderedDistribution and plans no
    // exchange of its own — a second exchange here means the recipe broke
    val p = planOf(SparkEntry.queries("q_parse_dates")(spark, sfDir))
    val exchanges = "Exchange (range|hash)partitioning".r.findAllIn(p).toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("rangepartitioning"),
      s"q_parse_dates: expected exactly one RANGE exchange, got $exchanges in:\n$p")
  }

  test("q_tokenize: range partitioning survives explode+vocab join to the agg and sort") {
    // docs are range-partitioned on doc_id BELOW the explode; while the
    // vocab join stays broadcast the aggregation needs no doc-keyed hash
    // exchange and the final orderBy plans no exchange — one doc_id
    // exchange total, and it is the range one
    val p = planOf(SparkEntry.queries("q_tokenize")(spark, sfDir))
    assert("rangepartitioning\\(doc_id".r.findAllIn(p).size == 1,
      s"q_tokenize: expected exactly one doc_id range exchange:\n$p")
    // the vocab df-count legitimately shuffles on (doc_id, term) — what
    // must NOT exist is a doc_id-ONLY hash exchange (the agg requirement
    // reappearing because the vocab join stopped broadcasting)
    assert("hashpartitioning\\(doc_id#\\d+L?, \\d+\\)".r.findFirstIn(p).isEmpty,
      s"q_tokenize: doc-keyed hash exchange crept back (vocab join no longer broadcast?):\n$p")
  }

  test("q_substr_scrub: range exchange above the rm join; orderBy adds none") {
    // the removal-ranges join may plan as SMJ (rm is corpus-derived, no
    // broadcast hint) — the operator range-partitions its OUTPUT above
    // the join, so the rebuild projection runs once and the caller's
    // orderBy is exchange-free regardless of join strategy. A second
    // range exchange = the recipe broke and orderBy re-sorted globally.
    val p = planOf(SparkEntry.queries("q_substr_scrub")(spark, sfDir))
    assert("rangepartitioning\\(doc_id".r.findAllIn(p).size == 1,
      s"q_substr_scrub: expected exactly one doc_id range exchange:\n$p")
  }
}
