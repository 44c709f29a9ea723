package graft

import graft.analytics.Queries

/** Physical-plan assertions: the scale properties every 100 TB plan must
  * keep — filters pushed into the parquet scan, column pruning, broadcast
  * joins for dimensions, top-k planned as TakeOrderedAndProject, semi/anti
  * join physical ops. A regression here is a 100× slowdown at scale that the
  * row-level oracle would never notice. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  /** Deterministically drain the shared listener bus so every
    * QueryExecutionListener event from actions already run has been
    * DELIVERED before the assertion reads the counter (round-17 ADVICE
    * #2: a fixed Thread.sleep races the async bus and can go flaky or
    * silently vacuous). `listenerBus` is `private[spark]` — public at
    * the bytecode level, so reflection reaches it without a shim class;
    * falls back to the old fixed wait if a Spark upgrade renames it. */
  private def drainListenerBus(): Unit =
    try {
      val sc = spark.sparkContext
      val bus = sc.getClass.getMethods.find(_.getName == "listenerBus")
        .get.invoke(sc)
      val wait = bus.getClass.getMethods
        .filter(_.getName == "waitUntilEmpty").minBy(_.getParameterCount)
      if (wait.getParameterCount == 0) wait.invoke(bus)
      else wait.invoke(bus, java.lang.Long.valueOf(30000L))
      ()
    } catch { case _: ReflectiveOperationException | _: NoSuchElementException =>
      Thread.sleep(2000)
    }

  test("q01: ship-date filter reaches the parquet scan (PushedFilters)") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate"), p)
  }

  test("q01: scan reads only the six needed lineitem columns (pruning)") {
    val p = plan("q01_pricing_summary")
    val schema = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(!schema.contains("l_orderkey") && !schema.contains("l_partkey"),
      s"unneeded columns in scan: $schema")
    assert(schema.contains("l_quantity") && schema.contains("l_discount"))
  }

  test("q02: nation and region join as broadcasts, not shuffles") {
    val p = plan("q02_revenue_by_nation")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"dims must broadcast:\n$p")
  }

  test("q03: top-10 plans as TakeOrderedAndProject (k rows cross the wire)") {
    assert(plan("q03_top_orders").contains("TakeOrderedAndProject"))
  }

  test("q06/q07: semi and anti joins use dedicated physical join types") {
    assert(plan("q06_semi_join").contains("LeftSemi"))
    assert(plan("q07_anti_join").contains("LeftAnti"))
  }

  test("q18: range join keeps the equi key (no nested-loop blowup)") {
    val p = plan("q18_range_join")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"range join must stay keyed:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join fell back to an all-pairs strategy:\n$p")
  }

  test("s01: the query vectors broadcast; the corpus never shuffles") {
    val p = SparkEntry.queries("s01_knn_brute")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("d04/d05/s02: no near-dup or ANN operator falls back to all-pairs") {
    for (name <- Seq("d04_ngram_jaccard", "d05_embedding_neardup", "s02_ann_lsh",
        "d06_simhash_hamming", "c01_decontaminate")) {
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name materializes an all-pairs product:\n$p")
    }
  }

  test("d01: exact dedup shuffles digests, not document text") {
    val p = plan("d01_exact_dedup")
    // the md5 projects BELOW the exchange, partial aggregation combines
    // map-side, and no text column crosses the wire
    assert(p.contains("partial_min"), s"expected map-side combine:\n$p")
    val partial = p.linesIterator.find(_.contains("partial_min")).get
    assert(!partial.contains("text#"),
      s"document text must not reach the shuffle:\n$partial")
  }

  test("q35: single-scan funnel — one events scan, one user-keyed exchange, zero joins") {
    val p = plan("q35_funnel")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"funnel must read events exactly once:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"funnel must shuffle once, on user_id:\n$p")
    assert(!p.contains("Join"), s"single-scan funnel must not join:\n$p")
  }

  test("q12: pure scalar projection has no exchange at all") {
    val p = plan("q12_scalar_funcs")
    // one final sort for the deterministic output order is expected; no
    // hash-partitioning exchanges from the projection itself
    assert(!p.contains("hashpartitioning"), s"scalar projection must not shuffle:\n$p")
  }

  test("t11/t13/t16/t17/t18/t20/t21: rule filters and normalizers are shuffle-free scalar projections") {
    for (name <- Seq("t11_gopher_rules", "t13_url_filter",
        "t16_nfc_normalize", "t17_strip_accents", "t18_strip_html",
        "t20_sentence_stats", "t21_script_profile")) {
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("hashpartitioning"),
        s"$name must not shuffle (pure per-row projection):\n$p")
      assert(!p.contains("Join"), s"$name must not join:\n$p")
    }
  }

  test("t22/t24: length buckets and readability are shuffle-free projections (+histogram agg)") {
    // t24 is a pure per-row projection; t22's only aggregation is the
    // <=64-row power-of-2 histogram — neither may join
    for (name <- Seq("t22_length_buckets", "t24_readability")) {
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("Join"), s"$name must not join:\n$p")
    }
    assert(!plan("t24_readability").contains("hashpartitioning"),
      "t24 must not shuffle (pure per-row projection)")
  }

  test("q46: unpivot plans as one Expand projection — no shuffle, no join") {
    val p = plan("q46_unpivot")
    assert(p.contains("Expand"), s"unpivot should plan as Expand:\n$p")
    assert(!p.contains("hashpartitioning"), s"unpivot must not shuffle:\n$p")
    assert(!p.contains("Join"), s"unpivot must not join:\n$p")
  }

  test("q42: the LATERAL subquery decorrelates to a map-side WindowGroupLimit, not a loop") {
    val p = plan("q42_lateral_join")
    assert(p.contains("WindowGroupLimit"),
      s"lateral top-k should push the rank limit map-side:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the customer side should broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"lateral must not plan as a per-row loop:\n$p")
  }

  test("s15: k-means assignment is a shuffle-free plan-literal argmin projection") {
    import org.apache.spark.sql.functions.col
    val cents = graft.ext.Similarity.kmeansFit(
      Tables.load(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") < 64), "vec_id", "embedding", k = 4, iters = 1)
    val p = graft.ext.Similarity.kmeansAssign(
      Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"),
      s"assignment must not shuffle (centroids are plan literals):\n$p")
    assert(!p.contains("Join"), s"assignment must not join:\n$p")
  }

  test("s20: the refined-pipeline centroids assign with the same shuffle-free projection") {
    import org.apache.spark.sql.functions.col
    val cents = graft.ext.Similarity.kmeansFitParallelRefined(
      Tables.load(spark, dir, "embeddings").select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") < 64), "vec_id", "embedding",
      k = 3, rounds = 1, l = 2, candIters = 1, refineIters = 1)
    val p = graft.ext.Similarity.kmeansAssign(
      Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", cents)
      .queryExecution.executedPlan.toString
    assert(!p.contains("hashpartitioning"),
      s"assignment must not shuffle (centroids are plan literals):\n$p")
    assert(!p.contains("Join"), s"assignment must not join:\n$p")
  }

  test("s18: truncated search rides a broadcast; no all-pairs fallback") {
    val p = plan("s18_truncated_knn")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"stage-1 queries must ride a broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("d13/m08: CDC boundary+digest derivation is projection-only below the digest-keyed aggs") {
    // the per-row work (rolling-hash boundaries, chunk slicing, digests)
    // must all sit BELOW any exchange: the only shuffles are the digest df
    // count, the per-doc agg, and the joins back — never a cartesian
    for (name <- Seq("d13_cdc_chunks", "m08_cdc_binary")) {
      val p = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name fell back to an all-pairs strategy:\n$p")
      assert(p.contains("graft_cdc_boundaries"),
        s"$name must plan the native rolling-hash expression:\n$p")
    }
  }

  test("t19: char-entropy scoring is a shuffle-free scalar projection") {
    val p = plan("t19_char_entropy")
    assert(!p.contains("hashpartitioning"),
      s"t19 must not shuffle (pure per-row projection):\n$p")
    assert(!p.contains("Join"), s"t19 must not join:\n$p")
  }

  test("s10: sign signatures stream; queries broadcast; no corpus shuffle before ranking") {
    val p = plan("s10_binary_knn")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"binary-KNN queries must ride a broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("s13: both stages stay keyed — broadcast prefilter, id-keyed rerank join") {
    val p = plan("s13_binary_rerank")
    // stage 1: query signatures broadcast against the streaming corpus
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"prefilter queries must ride a broadcast:\n$p")
    // stage 2: candidates join vectors by id — never an all-pairs fallback
    assert(!p.contains("CartesianProduct"),
      s"rerank must stay keyed:\n$p")
  }

  test("q38: bucketed join runs with zero Exchange and zero Sort below the join") {
    val df = SparkEntry.queries("q38_bucketed_join")(spark, dir)
    df.collect() // AQE finalizes; the bucketed tables get written
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val joinSection = p.split("SortMergeJoin") match {
      case parts if parts.length >= 2 => parts.last // everything under the join
      case _ => fail(s"expected a SortMergeJoin in:\n$p")
    }
    assert(joinSection.contains("Bucketed: true"),
      s"scans must report bucketed reads:\n$joinSection")
    assert(!joinSection.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$joinSection")
    assert(!joinSection.contains("Sort "),
      s"sortBy buckets must also delete the join sorts:\n$joinSection")
  }

  test("AQE splits a skewed join partition at runtime (the q36 salting alternative)") {
    import org.apache.spark.sql.functions._
    // Funnel 90% of fact rows onto one join key, force a sort-merge join,
    // and drop the skew thresholds to local scale: AQE's OptimizeSkewedJoin
    // must split the hot partition (the join prints skew=true) — the
    // runtime counterpart of q36's deterministic salting, and the reason
    // the engine leaves AQE skew handling ON in GraftSession.
    val dir01 = "/root/testdata/sf0.01"
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8192",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // repartition(8) first: AQE splits a skewed REDUCE partition along
      // MAPPER-chunk boundaries, so a single-row-group local file (one map
      // task) is unsplittable no matter how skewed — the Tables.loadSpread
      // concern surfacing in the shuffle layer. At 100 TB there are always
      // thousands of mappers; locally we must manufacture them.
      val li = spark.read.parquet(s"$dir01/lineitem.parquet").repartition(8)
        .withColumn("jk",
          when(pmod(col("l_orderkey"), lit(10)) < 9, 1L)
            .otherwise(col("l_orderkey")))
      val dim = spark.read.parquet(s"$dir01/part.parquet")
        .select(col("p_partkey").as("jk"), col("p_name")).limit(2000)
      val j = li.hint("MERGE").join(dim, Seq("jk"))
        .groupBy(col("p_name")).agg(sum(col("l_quantity")).as("q"))
      j.collect()
      val p = j.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(p.contains("skew=true"),
        s"AQE must mark the skewed merge join:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q39: one-day query prunes to ONE date partition at planning time") {
    val df = SparkEntry.queries("q39_partition_pruning")(spark, dir)
    df.collect() // writes the partitioned copy; AQE finalizes
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val scan = p.linesIterator.find(_.contains("PartitionFilters")).getOrElse(
      fail(s"no partitioned scan in:\n$p"))
    assert(scan.contains("event_date") && scan.contains("2024-01-15"),
      s"the day filter must prune partitions, not rows:\n$scan")
    // directory-level pruning: the filter never reaches the data columns
    assert(!scan.contains("PushedFilters: [IsNotNull(event_date"),
      s"event_date is a partition column, not a data filter:\n$scan")
  }

  test("t12: bigram model joins stay keyed; the corpus never cross-products") {
    val df = SparkEntry.queries("t12_bigram_surprise")(spark, dir)
    df.collect() // execute df's OWN QueryExecution so AQE finalizes (PlanDump note)
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"bigram scoring fell back to all-pairs:\n$p")
    // the prefix distribution derives from the bigram count table: its copy
    // of the count subtree rides a ReusedExchange at runtime, so at most two
    // tokenize+ngram Generates execute (model build + probe), never a third
    assert("Generate explode".r.findAllIn(p).size <= 2 || p.contains("ReusedExchange"),
      s"prefix counts must re-aggregate the vocabulary, not re-explode the corpus:\n$p")
  }

  test("c12: every window in the plan is partitioned (no corpus-sized single task)") {
    // round-12 verdict #2: the old plan's cumulative window over DISTINCT
    // double scores had no partitionBy — corpus-sized at 100 TB. The
    // bucketed re-plan must leave NO partition-less window spec anywhere.
    val df = SparkEntry.queries("c12_perplexity_buckets")(spark, dir)
    df.collect() // AQE-finalize df's own QueryExecution (PlanDump note)
    val p = df.queryExecution.executedPlan.toString
    val specs = "windowspecdefinition\\([^#]*".r.findAllIn(p).toSeq
    assert(specs.nonEmpty, s"expected a windowed plan:\n$p")
    specs.foreach { sp =>
      assert(sp.contains("__bkt"),
        s"partition-less window spec in the c12 plan: $sp\n$p")
    }
    // and the bucket-offset side must arrive broadcast, never shuffled
    assert(p.contains("BroadcastHashJoin"), s"offsets must broadcast:\n$p")
  }

  test("s21/s22: recall rows keep the bounded-heap ADC and broadcast probes") {
    for (name <- Seq("s21_ivfpq_recall", "s22_ivfpq_residual_recall")) {
      val p = plan(name)
      assert(p.contains("BroadcastHashJoin"),
        s"$name: probes+LUTs must broadcast against the code table:\n$p")
      assert(p.contains("partial_topkagg") || p.contains("ObjectHashAggregate"),
        s"$name: ADC ranking must combine map-side (bounded-heap partial agg):\n$p")
      assert(!p.contains("CartesianProduct"), s"$name fell back to all-pairs:\n$p")
    }
  }

  test("d16: keep-best windows only the paired rows; component labels broadcast") {
    val df = SparkEntry.queries("d16_keepbest_dedup")(spark, dir)
    df.collect() // AQE-finalize df's own QueryExecution (PlanDump note)
    val p = df.queryExecution.executedPlan.toString
    // every window partitions by the duplicate group — no corpus-wide task
    val specs = "windowspecdefinition\\([^#]*".r.findAllIn(p).toSeq
    assert(specs.nonEmpty && specs.forall(_.contains("dup_group")),
      s"keep-best windows must partition by dup_group:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the pair-graph component labels must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"d16 fell back to all-pairs:\n$p")
  }

  test("t27/t28: BPE segmentation joins the folded vocabulary, never cross-products") {
    for (name <- Seq("t27_bpe_segment", "t28_bpe_fertility")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"$name fell back to all-pairs:\n$p")
    }
    // round-20 merge-table memo: the list t27/t28 serve must equal a FRESH
    // bpeTrain run on the same dir, rank order and all (deterministic
    // training is what licenses the memo — the cachedModel rule)
    import spark.implicits._
    val fresh = ext.TextAnalysis.bpeTrain(
        Tables.loadSpread(spark, dir, "documents"), "text", nMerges = 8)
      .orderBy($"rank").select($"left", $"right")
      .as[(String, String)].collect().toSeq
    assert(ext.TextAnalysis.cachedMerges(spark, dir, 8) == fresh,
      "cachedMerges diverged from a fresh bpeTrain")
  }

  test("s23/s25: queries broadcast; the corpus side never cross-products unbroadcast") {
    // s23 is a non-equi join (label mismatch), so the legitimate physical
    // shape is a BroadcastNestedLoopJoin with the tiny QUERY side as the
    // build side; a CartesianProduct would mean the broadcast was lost and
    // the corpus pairs with itself
    val p23 = plan("s23_hard_negatives")
    assert(p23.contains("BroadcastNestedLoopJoin") || p23.contains("BroadcastHashJoin"),
      s"s23: the query side must broadcast:\n$p23")
    assert(!p23.contains("CartesianProduct"), s"s23 fell back to all-pairs:\n$p23")
    // s25 (round-20 re-plan): ONE partial aggregation — the broadcast
    // query join feeds MmrAgg directly, so the plan must keep the
    // broadcast (no all-pairs product), contain NO window sort and NO
    // checkpoint scan, and shuffle only the aggregation's partial buffers
    // (a single pair of HashAggregate nodes around one Exchange)
    val p25 = plan("s25_mmr_rerank")
    assert(!p25.contains("CartesianProduct"), s"s25 fell back to all-pairs:\n$p25")
    assert(p25.contains("BroadcastNestedLoopJoin") || p25.contains("BroadcastHashJoin"),
      s"s25: the query side must broadcast:\n$p25")
    assert(!p25.contains("Window") && !p25.contains("Scan ExistingRDD"),
      s"s25: the greedy re-rank must run inside the aggregation, not " +
        s"window/checkpoint stages:\n$p25")
    val p25Exchanges = "Exchange hashpartitioning".r.findAllIn(p25).length
    assert(p25Exchanges == 1,
      s"s25: expected exactly 1 aggregation exchange, got $p25Exchanges:\n$p25")
  }

  test("s24: DBSCAN stays pair-graph-keyed — bucket equi-join, no all-pairs") {
    val df = SparkEntry.queries("s24_density_clusters")(spark, dir)
    df.collect() // AQE-finalize df's own QueryExecution (PlanDump note)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"s24 materializes an all-pairs product:\n$p")
  }

  test("s26: knn graph stays band-bucket-keyed — equi-join candidates, partitioned ranking") {
    val df = SparkEntry.queries("s26_knn_graph")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"s26 materializes an all-pairs product:\n$p")
    // the per-src ranking must never sort the edge list in one task
    assert(p.contains("windowspecdefinition(src#") ||
      p.contains("windowspecdefinition(src,"),
      s"s26's ranking window must partition by src:\n$p")
  }

  test("c17: soft-dedup weights broadcast the pair-graph side; no windows at all") {
    val df = SparkEntry.queries("c17_soft_dedup_weights")(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"component labels/sizes must broadcast onto the corpus:\n$p")
    assert(!p.contains("windowspecdefinition"),
      s"the weight is a projection — no window should appear:\n$p")
    assert(!p.contains("CartesianProduct"), s"c17 fell back to all-pairs:\n$p")
  }

  test("c18/t29: every window partitions by the cluster (no corpus-sized task)") {
    for (name <- Seq("c18_coreset_sample", "t29_cluster_terms")) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.collect()
      val p = df.queryExecution.executedPlan.toString
      val specs = "windowspecdefinition\\([^#]*".r.findAllIn(p).toSeq
      assert(specs.nonEmpty, s"$name: expected a windowed plan:\n$p")
      specs.foreach { sp =>
        assert(sp.contains("cluster"),
          s"$name: partition-less window spec: $sp\n$p")
      }
      assert(!p.contains("CartesianProduct"), s"$name fell back to all-pairs:\n$p")
    }
  }

  test("s08: IVF-PQ candidates ride a broadcast probe; the code table never shuffles whole") {
    val p = plan("s08_ivfpq")
    assert(p.contains("BroadcastHashJoin"),
      s"probes+LUTs must broadcast against the code table:\n$p")
    assert(p.contains("partial_topkagg") || p.contains("ObjectHashAggregate"),
      s"ADC ranking must combine map-side (bounded-heap partial agg):\n$p")
  }

  test("d02/d09: the minhash queries run on the persisted posting table — no tokenization in-plan") {
    // the serving contract: the signature pass (tokenize + shingle + 16
    // md5 mins) happens ONCE at table build; the query plans must contain
    // only the band-bucket window/joins over the stored relation. A
    // regression here silently re-pays the scan-dominant pass per query.
    for (q <- Seq("d02_minhash_lsh", "d09_crosscorpus_neardup")) {
      val p = plan(q)
      assert(!p.contains("regexp") && !p.contains("explode") &&
        !p.contains("md5"),
        s"$q must serve the persisted posting table, not recompute signatures:\n$p")
      assert(p.contains("graft_derived"),
        s"$q must scan the content-addressed posting store:\n$p")
    }
  }

  test("q51: exactPercentilesAuto picks builtin below the distinct switch, histogram above; plans bit-equal") {
    import spark.implicits._
    val lineitem = Tables.load(spark, dir, "lineitem")
    // the probe sees the real distinct count; force each verdict with an
    // explicit switch around it (sf0.001 prices show ~6k distinct, so the
    // DEFAULT 4096 switch routes lineitem prices to the histogram plan —
    // the scale-safe side)
    val (cb, seenB) = Queries.exactPercentilesAutoChoice(
      lineitem, "l_extendedprice", switchDistinct = Long.MaxValue)
    assert(cb == "builtin" && seenB > 0L, s"($cb, $seenB)")
    val (ch, seenH) = Queries.exactPercentilesAutoChoice(
      lineitem, "l_extendedprice", switchDistinct = 1L)
    assert(ch == "histogram" && seenH > 1L, s"($ch, $seenH)")
    // round-15 ADVICE: the choice must be DETERMINISTIC under partitioning
    // — the HLL probe sees the full column, so any file layout of the same
    // data yields the same estimate and the same plan (the old 64k-row
    // limit probe was an arbitrary prefix that could flip with file order)
    val expected = (if (seenB > 4096L) "histogram" else "builtin", seenB)
    val sortedByValue = lineitem.orderBy($"l_extendedprice")
    for (parts <- Seq(1, 64)) {
      val got = Queries.exactPercentilesAutoChoice(
        sortedByValue.repartition(parts), "l_extendedprice")
      assert(got == expected,
        s"choice must not depend on layout: parts=$parts -> $got != $expected")
    }
    // round-16 verdict #6 belt-and-braces: the HLL ESTIMATE ITSELF (not
    // just the verdict at the default switch) is layout-invariant, so the
    // choice is identical at EVERY switch value on EVERY layout — the ±5%
    // HLL error can only matter within a hair of a switch the caller
    // picked, where the two plans are bit-equal by the shared-oracle
    // contract anyway. Enumerate switch values spanning both verdicts ×
    // layouts (value-sorted 1/8/64 partitions and the raw scan): one
    // estimate, one choice per switch, everywhere.
    val layouts: Seq[(String, org.apache.spark.sql.DataFrame)] =
      ("raw", lineitem) +: Seq(1, 8, 64).map(p =>
        (s"sorted/$p", sortedByValue.repartition(p)))
    val estimates = layouts.map { case (tag, df) =>
      tag -> Queries.exactPercentilesAutoChoice(df, "l_extendedprice")._2
    }
    assert(estimates.map(_._2).distinct.size == 1,
      s"HLL estimate must be layout-invariant: $estimates")
    for (switch <- Seq(1L, 64L, 1024L, 4096L, 65536L, Long.MaxValue);
         (tag, df) <- layouts) {
      val (choice, est) =
        Queries.exactPercentilesAutoChoice(df, "l_extendedprice", switch)
      val want = if (seenB > switch) "histogram" else "builtin"
      assert(choice == want && est == seenB,
        s"switch=$switch layout=$tag -> ($choice, $est), want ($want, $seenB)")
    }
    val ps = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95)
    val keys = Seq("l_returnflag", "l_linestatus")
    def built(switch: Long) = Queries.exactPercentilesAuto(
      lineitem, keys, "l_extendedprice", ps, switchDistinct = switch)
    val builtin = built(Long.MaxValue)
    val hist = built(1L)
    assert(builtin.queryExecution.executedPlan.toString
        .contains("percentile_disc"),
      "below the switch the builtin agg-buffer plan must run")
    val hp = hist.queryExecution.executedPlan.toString
    assert(!hp.contains("percentile_disc") && hp.contains("Window"),
      s"above the switch the keyed-histogram window plan must run:\n$hp")
    // one contract, two plans: the rows are bit-equal either way
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"l_returnflag", $"l_linestatus")
        .collect().map(_.toSeq).toSeq
    assert(rows(builtin) == rows(hist),
      "both percentile plans must return identical rows")
  }

  test("s34/s35/c19: fusion and sampling plans keep their scale shapes") {
    // s34: both ranking sides broadcast their query slice; no all-pairs
    val p34 = plan("s34_rrf_hybrid")
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r.findAllIn(p34).size >= 2,
      s"both rankers' query sides must broadcast:\n$p34")
    assert(!p34.contains("CartesianProduct"), "fusion must not cross-product")
    // s35: the returned assignment is a shuffle-free projection against
    // plan-literal picks — no joins, no aggregates (the k−1 argmax jobs ran
    // eagerly at build time via TakeOrdered, outside this plan)
    val p35 = plan("s35_kcenter")
    assert(!p35.contains("Join") && !p35.contains("HashAggregate"),
      s"k-center assignment must be a pure projection:\n$p35")
    // c19: the draw is TakeOrderedAndProject — n rows cross the wire, not
    // a global sort of the corpus
    val p19 = plan("c19_weighted_sample")
    assert(p19.contains("TakeOrderedAndProject"),
      s"the weighted draw must plan as top-n:\n$p19")
  }

  test("adaptive-banding corpus count is memoized: repeat query builds run zero count jobs") {
    // round-15 verdict #3: s02/s12/s26/s29's width probes each paid one
    // exact count() job per invocation on the same unchanged dir. After one
    // warm call, BUILDING each query again must trigger no count action —
    // the memo key is the stat+footer fingerprint, so only a regenerated
    // dir recounts. (s24 is excluded: its dbscan/connected-components
    // driver-size switch legitimately counts the PAIR GRAPH per run.)
    assert(Tables.cachedCount(spark, dir, "embeddings") == 500L)
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (funcName == "count") { seen.incrementAndGet(); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      for (q <- Seq("s02_ann_lsh", "s12_ann_recall", "s26_knn_graph",
          "s29_knn_graph_recall"))
        SparkEntry.queries(q)(spark, dir)
      // the listener bus is async — wait until every event has delivered
      drainListenerBus()
      assert(seen.get() == 0,
        s"repeat builds must run zero count jobs, saw ${seen.get()}")
    } finally spark.listenerManager.unregister(l)
  }

  test("component labels are content-addressed: repeat c17/c19/d07 invocations run zero pair-stage jobs") {
    // round-16 verdict #3: c19 at the 100× scale-up spent 31 s rebuilding
    // the c17 pair-graph components per invocation. The labels now persist
    // via Tables.cachedDerived keyed on the documents fingerprint
    // (Dedup.sigComponentsTable) — the first invocation builds, every
    // later one scans the stored relation. The pair stage is detectable
    // by its driver actions: connectedComponents MUST run count (the
    // driver/distributed switch) and collect (the union-find edge fold);
    // the serving path runs neither.
    def drain(q: String): Unit = SparkEntry.queries(q)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    drain("c17_soft_dedup_weights") // builds (or finds) the stored table
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (funcName == "count" || funcName == "collect") {
          seen.incrementAndGet(); ()
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      for (q <- Seq("c17_soft_dedup_weights", "c19_weighted_sample",
          "d07_neardup_components", "d11_dup_stats", "d16_keepbest_dedup"))
        drain(q)
      drainListenerBus()
      assert(seen.get() == 0,
        s"served invocations must run zero pair-stage count/collect jobs, saw ${seen.get()}")
    } finally spark.listenerManager.unregister(l)
    // and the served plan is a stored-relation scan, not a band self-join
    val p = SparkEntry.queries("d07_neardup_components")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("simhash_comp_2x15h1"),
      s"d07 must scan the persisted component table:\n${p.take(2000)}")
    assert(!p.contains("__bsig"),
      s"no band-signature join may remain in the served plan:\n${p.take(2000)}")
  }

  test("streamed component store serves the d07/c17/d11 shapes with zero pair-stage jobs") {
    // round-18 verdict #3: the component-label store was the last
    // content-addressed relation without a streaming path. Serving from
    // the streamed store must never touch the pair stage — detectable by
    // its driver actions (connectedComponents runs count + collect); the
    // streamed read is a scan + id-keyed window.
    import org.apache.spark.sql.functions.col
    val docs = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val store = java.nio.file.Files.createTempDirectory("comp_serve").toString
    // build (runs the pair stage once — before the listener registers)
    graft.streaming.CurationStream.componentBatch(store, "doc_id", "text")(
      docs, 0L)
    val seen = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (funcName == "count" || funcName == "collect") {
          seen.incrementAndGet(); ()
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      val streamed = graft.streaming.CurationStream
        .loadComponentIndex(spark, store)
      // d07 shape (label scan), c17 shape (soft-dedup weights), d11 shape
      // (cluster histogram) — all served from the streamed relation
      streamed.select(col("id").as("doc_id"), col("component"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
      graft.ext.CurationOps.softDedupWeightsFromComponents(
          docs, "doc_id", streamed)
        .write.format("noop").mode("overwrite").save()
      graft.ext.DedupOps.componentStatsFromLabels(docs, "doc_id", streamed)
        .write.format("noop").mode("overwrite").save()
      drainListenerBus()
      assert(seen.get() == 0,
        s"streamed-store serving must run zero pair-stage jobs, saw ${seen.get()}")
    } finally spark.listenerManager.unregister(l)
    // and the served plan reads the store — no band-signature join remains
    val p = graft.ext.CurationOps.softDedupWeightsFromComponents(
        docs, "doc_id",
        graft.streaming.CurationStream.loadComponentIndex(spark, store))
      .queryExecution.executedPlan.toString
    assert(!p.contains("__bv") && !p.contains("__bd"),
      s"no band join may remain in the streamed serving plan:\n${p.take(2000)}")
  }

  test("ivf fusion-leg list table is content-addressed: s38 serves the store; repeat invocations run zero build jobs") {
    // round 19: the IVF leg's corpus assignment persists once per
    // dir-content ((cluster, vec_id)-sorted); serving ranks against the
    // stored relation instead of re-assigning the corpus per invocation
    import org.apache.spark.sql.functions.col
    graft.ext.Similarity.ivfLegTable(spark, dir).head()
    assert(plan("s38_rrf_ivf_recall").contains("ivfleg_k16"),
      "s38 must scan the persisted IVF list table")
    val saves = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (funcName == "save") { saves.incrementAndGet(); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      graft.ext.Similarity.ivfLegTable(spark, dir).head()
      graft.ext.Similarity.ivfLegTable(spark, dir).head()
      drainListenerBus()
      assert(saves.get() == 0,
        s"repeat list-table reads must run zero store builds, saw ${saves.get()}")
    } finally spark.listenerManager.unregister(l)
  }

  test("ivf leg: a measured per-corpus beta floor prunes the list-table scan to the probed lists") {
    // round-19 verdict #1: at the shipped witness floor (β = 1.6) the
    // probe fraction is ~0.88 and 20 spread queries cover every list, so
    // the (cluster, vec_id) store sort bought no row-group pruning. On a
    // CLUSTERED corpus with a measured per-corpus floor
    // (spark.graft.ivf.beta) the derived nprobe collapses and the store
    // scan must carry the ivfPqSearch pruneLists discipline: the probed
    // lists pushed as a chunked In.
    val cdir = java.nio.file.Files.createTempDirectory("ivf_clustered").toString
    graft.scratch.ClusteredIvfSweep.gen(spark, cdir, 2048L, 16)
    spark.conf.set("spark.graft.ivf.beta", "64.0")
    try {
      val df = graft.ext.Similarity.ivfRankingTop(spark, cdir, 10)
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("ivfleg_k16"), s"leg must scan the store:\n${p.take(800)}")
      assert(p.contains("In(cluster"),
        s"probed lists must push into the store scan:\n${p.take(2000)}")
      assert(df.groupBy("query_id").count().count() == 20,
        "every witness query must still rank through the pruned scan")
    } finally spark.conf.unset("spark.graft.ivf.beta")
    // the default floor on the SPREAD witness corpus self-disables the
    // pushdown (the probed union covers nlist — an In over every list
    // would prune nothing and only add predicate cost)
    val p0 = graft.ext.Similarity.ivfRankingTop(spark, dir, 10)
      .queryExecution.executedPlan.toString
    assert(!p0.contains("In(cluster"),
      s"an all-list probe must not wrap the scan in a vacuous In:\n${p0.take(2000)}")
  }

  test("fusion router self-detects graphMaintained via the derived-registry probe") {
    // round-19 verdict #2: rrfServedTop5Auto trusted a caller-asserted
    // graphMaintained boolean — a stale assertion silently served the
    // graph leg's full build cost. The router now probes the cachedDerived
    // registry for a committed knngraphleg artifact at the CURRENT dir
    // fingerprint; the graph leg routes only when its build is provably
    // already paid.
    import graft.ext.Similarity
    val gdir = java.nio.file.Files.createTempDirectory("graph_router").toString
    graft.scratch.ClusteredIvfSweep.gen(spark, gdir, 300L, 4)
    val pastCap = (256L << 12) + 1
    // absent artifact => not maintained => ivf leg, probe-evidence logged
    assert(!Similarity.graphLegMaintained(spark, gdir))
    val (leg0, ev0) = Similarity.resolveFusionLeg(spark, gdir, pastCap, None)
    assert(leg0 == "ivf", s"absent artifact must route ivf, got $leg0")
    assert(ev0.contains("no knngraphleg artifact"), ev0)
    // maintaining the graph (one build, content-addressed) flips the probe
    assert(Similarity.knnGraphLegTable(spark, gdir).count() > 0)
    assert(Similarity.graphLegMaintained(spark, gdir))
    val (leg1, ev1) = Similarity.resolveFusionLeg(spark, gdir, pastCap, None)
    assert(leg1 == "graph", s"fresh artifact must route graph, got $leg1")
    assert(ev1.contains("committed knngraphleg artifact"), ev1)
    // below the width cap the probed leg still wins regardless of evidence
    assert(Similarity.resolveFusionLeg(spark, gdir, 5000L, None)._1 == "probed")
    // an explicit caller assertion overrides the registry in BOTH directions
    val (legF, evF) = Similarity.resolveFusionLeg(spark, gdir, pastCap, Some(false))
    assert(legF == "ivf" && evF.contains("caller-asserted"), s"$legF / $evF")
    // STALE content: regenerating the table changes the fingerprint, so
    // yesterday's artifact is no longer evidence — the probe answers false
    assert(new java.io.File(s"$gdir/embeddings.parquet", "_SUCCESS").delete())
    graft.scratch.ClusteredIvfSweep.gen(spark, gdir, 301L, 4)
    assert(!Similarity.graphLegMaintained(spark, gdir),
      "a stale artifact (changed dir content) must not read as maintained")
    assert(Similarity.resolveFusionLeg(spark, gdir, pastCap, None)._1 == "ivf")
  }

  test("s02 bucket table is content-addressed: serving plans scan the store; repeat invocations run zero build jobs") {
    // round-17 (late): the corpus-side hyperplane projection is persisted
    // once per corpus; s02/s12/s33/s36 then join the stored
    // (bucket, vec_id)-sorted relation. First touch builds (or finds) it.
    import org.apache.spark.sql.functions.col
    graft.ext.Similarity.bucketTable(spark, dir).head()
    // snapshot the store directory itself (name, size, mtime of every
    // file) — the disk-level ground truth the listener assertion below is
    // a proxy for (round-17 ADVICE #2)
    def storeListing(): Seq[(String, Long, Long)] = {
      val root = new java.io.File(sys.props("java.io.tmpdir"), "graft_derived")
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.startsWith("s02bucket_w"))
        .flatMap(d => Option(d.listFiles()).getOrElse(Array.empty).map(f =>
          (d.getName + "/" + f.getName, f.length, f.lastModified)))
        .sortBy(_._1).toSeq
    }
    val listingBefore = storeListing()
    assert(listingBefore.nonEmpty, "the bucket store must exist on disk")
    // serving plans read the store, not a re-bucketed corpus projection
    for (q <- Seq("s02_ann_lsh", "s12_ann_recall"))
      assert(plan(q).contains("s02bucket_w8"),
        s"$q must scan the persisted bucket table")
    // repeat invocations run zero writes (the store build is a `save`
    // action; serving must never re-run it) — the cachedCount/
    // sigComponentsTable listener pattern
    val saves = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        if (funcName == "save") { saves.incrementAndGet(); () }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      for (q <- Seq("s02_ann_lsh", "s12_ann_recall", "s33_ann_probe_gain"))
        SparkEntry.queries(q)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      drainListenerBus()
      // noop drains don't report `save`; the store build (write.parquet)
      // does — so ANY save here would be a rebuild
      assert(saves.get() == 0,
        s"serving must not rebuild the bucket store, saw ${saves.get()} saves")
    } finally spark.listenerManager.unregister(l)
    // belt-and-braces against listener API drift (ADVICE #2): the store
    // DIRECTORY itself must be untouched by serving — same file set, same
    // mtimes, no new _SUCCESS — regardless of how V2 writes report
    assert(storeListing() == listingBefore,
      "serving changed the bucket store directory on disk")
    // sanity on the stored relation (value-level parity with the inline
    // projection is the strict oracle gate's job — s02/s12/s33 rows)
    val stored = graft.ext.Similarity.bucketTable(spark, dir)
      .select(col("vec_id"), col("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(stored.nonEmpty && stored.map(_._2).distinct.size > 1,
      "store must hold real bucket assignments")
  }

  test("binary signature table: persisted sigs equal the inline projection; the served fusion scans the store") {
    // the round-17 served-fusion Hamming leg: a content-addressed
    // (vec_id, sig0, sig1) table — parity with the inline sign projection
    // must be exact (pure integer bit-math, so bit-identical by
    // construction; this pins the plumbing)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val e = Tables.loadSpread(spark, dir, "embeddings")
    val inline = graft.ext.Similarity.withBinarySig(
        e.select($"vec_id",
          transform($"embedding", x => x.cast("double")).as("__v")), "__v")
      .select($"vec_id", $"sig0", $"sig1")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val stored = graft.ext.Similarity.binarySigTable(spark, dir)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(stored == inline, "persisted signatures must equal the inline projection")
    // the served fusion's Hamming leg reads the store (a graft_derived
    // parquet scan), not the float embedding column
    val plan = graft.ext.Similarity.rrfServedTop5(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("binsig_64"),
      s"the served fusion must scan the persisted signature table:\n${plan.take(2000)}")
  }
}
