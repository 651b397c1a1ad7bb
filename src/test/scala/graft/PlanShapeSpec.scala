package graft

/** Regression guards on PHYSICAL PLAN SHAPE — the properties that make
  * these operators survive a 100 TB deployment, asserted so a future edit
  * can't silently reintroduce a scale-killer (round 1 shipped a cartesian
  * pair join and three few-partition windows that were correct and fast
  * at test SF but wrong at scale). */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, Sf0001).queryExecution.executedPlan.toString

  test("pair-generation dedup ops never plan a nested-loop or cartesian pair join") {
    for (q <- Seq("dedup_embedding_cosine", "dedup_levenshtein",
                  "dedup_minhash_lsh", "dedup_simhash", "dedup_ngram_jaccard",
                  "dedup_substring", "cross_source_dup_matrix")) {
      val p = plan(q)
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q plans a nested loop")
      assert(!p.contains("CartesianProduct"), s"$q plans a cartesian product")
    }
  }

  test("scan-heavy queries push filters and prune columns at the source") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"), p.take(400))
    val proj = plan("events_filter_project")
    assert(proj.contains("PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)"))
  }

  test("bounded dims broadcast; no forced broadcast marker on SF-scaled tables") {
    // nation/region keep explicit hints → BroadcastHashJoin must appear
    assert(plan("q5_nation_revenue").contains("BroadcastHashJoin"))
  }

  test("global top-k plans as TakeOrdered, not a full sort") {
    assert(plan("top100_items").contains("TakeOrderedAndProject"))
  }

  test("ANN top-k windows are salted: rank runs over (query, salt) first") {
    // the stage-1 window must partition by the crc32 salt, not query_id alone
    val p = plan("ann_bruteforce_topk")
    assert(p.contains("crc32"), "salted pre-reduce window missing")
  }

  test("brute-force ANN widens a narrow scan to session parallelism, never a fixed width") {
    // single-split local file → spread to defaultParallelism (not a constant)
    val par = spark.sparkContext.defaultParallelism
    val p = plan("ann_bruteforce_topk")
    assert(p.contains(s"RoundRobinPartitioning($par"),
      "narrow input must widen to the session's parallelism")
  }

  test("brute-force ANN never collapses an already-parallel scan with a repartition") {
    // at 100 TB the scan arrives with more splits than cores; the operator
    // must add NO round-robin exchange there (round 3's #1 defect: a
    // hardcoded repartition(32) would collapse the scan to 32 tasks)
    import org.apache.spark.sql.functions.col
    val par = spark.sparkContext.defaultParallelism
    val wide = spark.range(0, 256, 1, par * 2)
      .selectExpr("id AS vec_id",
        "transform(sequence(1, 8), j -> cast(pmod(id * j, 7) - 3 AS DOUBLE)) AS embedding")
    val pw = graft.operators.Similarity.bruteForceTopK(wide, nQueries = 3, k = 2)
      .queryExecution.executedPlan.toString
    assert(!pw.contains("RoundRobinPartitioning"),
      "operator repartitioned an input that already had >= parallelism partitions")
  }

  test("shard packing windows per bounded doc-range block, never per whole source") {
    // the running-sum window must be keyed (source, block_id): a window
    // keyed by source alone would buffer an entire source in one task
    val p = plan("pack_shards")
    assert(p.contains("block_id"), "bounded block key missing from the packing window")
    assert(p.contains("hashpartitioning(source"), "window partitioning missing")
  }

  test("star join over the partitioned fact carries a DYNAMIC partition filter on the scan") {
    // the 100 TB scan lever: the month-dim filter must reach the fact
    // scan as a runtime PartitionFilter (dynamicpruningexpression), not
    // as a post-scan join filter — otherwise a 7-year fact table is read
    // whole to answer a 3-month question
    val p = plan("dpp_quarter_revenue")
    assert(p.contains("dynamicpruning"),
      s"fact scan lost its dynamic partition filter:\n${p.take(2000)}")
    assert(p.contains("PartitionFilters"), "partitioned scan missing entirely")
  }

  test("q6: all three predicates reach the parquet reader; only the four referenced columns read") {
    // the scan-bound TPC-H shape: at 100 TB row groups outside the year
    // are skipped on min/max stats, so pushdown IS the query's cost
    // model. Formatted mode: the plain toString truncates the
    // PushedFilters list mid-way
    val p = SparkEntry.queries("q6_discount_band")(spark, Sf0001)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("GreaterThanOrEqual(l_shipdate,1996-01-01") &&
      p.contains("LessThan(l_shipdate,1997-01-01"), s"shipdate range not pushed:\n${p.take(1200)}")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.05)") &&
      p.contains("LessThanOrEqual(l_discount,0.07)"), "discount band not pushed")
    assert(p.contains("LessThan(l_quantity,24.0)"), "quantity cap not pushed")
    assert(p.contains("struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"),
      "scan reads more than the four referenced columns")
  }

  test("runtime Bloom filter from the filtered dim side is injected into the fact scan") {
    // DPP's row-level cousin: when the join key is NOT the partition
    // column, the segment filter must still reach the orders scan — as
    // a bloom_filter_agg over the dim keys probed by might_contain on
    // the fact side. Built in its own child session (broadcast disabled
    // to reproduce the 100 TB shuffle-join plan locally).
    val df = graft.operators.Star.bloomSegmentRevenue(spark, Sf0001)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("bloom_filter_agg"),
      s"no Bloom filter built from the dim side:\n${p.take(2000)}")
    assert(p.toLowerCase.contains("might_contain"),
      s"fact scan not probed by the Bloom filter:\n${p.take(2000)}")
  }

  test("bucketed fact join: SortMergeJoin with zero Exchange below it (shuffle paid at write)") {
    // run the registered query once: it writes both bucketed tables and
    // must pick the sort-merge (co-located) strategy, not a broadcast
    val full = plan("bucketed_join_revenue")
    assert(full.contains("SortMergeJoin"), s"expected the merge-hinted join:\n${full.take(800)}")
    // the layout contract itself: the join-only plan over the two bucket
    // trees needs NO shuffle on either side
    val joined = spark.table("lineitem_bktrev")
      .join(spark.table("orders_bktrev"),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
    val saved = Seq("spark.sql.autoBroadcastJoinThreshold", "spark.sql.adaptive.enabled")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p.take(500))
      assert(!p.contains("Exchange"), s"bucketed join must not shuffle:\n${p.take(1200)}")
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("AQE splits a runtime-skewed sort-merge join (adaptive counterpart of the manual salt)") {
    // tightened thresholds stand in for 100 TB partition sizes: a key
    // holding 90% of the left side must come out of AQE's runtime
    // re-plan as a skew-split join (skew=true), not one giant task
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor")
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      val left = spark.range(0, 200000).selectExpr(
        "CASE WHEN id % 10 < 9 THEN 0 ELSE id END AS k", "repeat('x', 32) AS pad")
      val right = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS v")
      val joined = left.join(right, "k")
      // AQE decides from MEASURED sizes: execute THIS queryExecution
      // (count() would plan and run a different one)
      joined.queryExecution.toRdd.count()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"runtime skew split missing from the final adaptive plan:\n${p.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("plan lint over EVERY query: no cartesian; nested-loop only on broadcast-bounded sides") {
    // corpus-wide guard: the per-operator tests above pin known shapes,
    // this sweep catches a scale-killer sneaking into ANY of the ~80
    // queries. BroadcastNestedLoopJoin is allowed only where the
    // broadcast side is bounded by construction (listed with its bound).
    val nlAllowed = Map(
      "mixture_weights" -> "1-row totals broadcast",
      "mixture_sample_temperature" -> "1-row totals broadcast (w_total, then m_total)",
      "text_token_rarity" -> "1-row corpus-token-total broadcast",
      "token_heavy_hitters" -> "1-row token-total broadcast onto a cap-bounded candidate count",
      "zorder_cluster_stats" -> "1-row domain min/max broadcast (16-bit normalization)",
      "join_key_skew_stats" -> "1-row table-total broadcast onto a k-bounded top-k",
      "table_column_stats" -> "two 1-row string-extreme aggregates broadcast onto the 1-row wide profile",
      "token_rarity_against" -> "1-row reference-total broadcast",
      "lm_bigram_surprisal" -> "1-row vocabulary-size broadcast",
      "perplexity_buckets" -> "1-row vocabulary-size broadcast (rides the surprisal scorer)",
      "lm_surprisal_against" -> "1-row vocabulary-size broadcast",
      "dsir_weights" -> "two 1-row vocabulary-size broadcasts (target + base LM)",
      "dsir_sample" -> "two 1-row vocabulary-size broadcasts (target + base LM)",
      "order_value_percentiles" -> "20 percentile targets broadcast",
      "order_value_percentiles_approx_check" ->
        "percentile targets broadcast (3 instances of the bounded percentile machinery)",
      "ann_ivf_topk" -> "nCells=16 centroid table broadcast",
      "ann_ivf_after_remove" -> "nCells=16 centroid table broadcast (persisted-tree probe stage)",
      "ann_ivfpq_topk" -> "nCells=16 centroid table broadcast (probe stage; ADC tables ride the same bounded query set)",
      "doc_lexical_ann_pq" -> "nCells=16 centroid table broadcast (probe stage; ADC tables + refine cut ride the bounded query set)",
      "bm25_search" -> "1-row corpus-totals broadcast (N, sum dl)",
      "bm25_search_indexed" -> "1-row merged-totals broadcast (N, sum dl from the partial rows)",
      "bm25_after_remove" -> "1-row merged-totals broadcast (post-takedown partials)",
      "substring_gram_stats" -> "1-row dropped-gram-total broadcast onto a k-bounded top-k",
      "events_resample_gapfill" ->
        "time-domain-bounded minute grid × 5-row event-type table (both bounded by construction)",
      "event_funnel" -> "4-row step table × 1-row reached-counts aggregate",
      "event_funnel_sessionized" -> "4-row step table × 1-row reached-counts aggregate",
      "ann_bruteforce_topk" -> "nQueries=5 query set broadcast (brute force scans corpus once)",
      "embedding_truncation_recall" ->
        "nQueries=5 query set broadcast (two brute-force passes: full-dim + truncated)",
      "ann_lsh_recall" -> "nQueries=5 query set broadcast (brute-force exact side)",
      "ann_bruteforce_sql" -> "nQueries=5 query set broadcast (brute force scans corpus once)",
      "media_feature_ann" -> "nQueries=5 query set broadcast (brute force scans corpus once)",
      "doc_lexical_ann" -> "nQueries=5 query set broadcast (brute force scans corpus once)",
      "audience_overlap_check" ->
        "per-type sketch aggregate self-joined (|event_type| rows of sketch blobs — audience-count-bounded, never data-bounded)",
      "graph_triangles" -> "1-row triangle-count aggregate broadcast onto the 1-row degree sums",
      "part_cooccurrence" -> "1-row basket-total broadcast onto a support-filtered top-k",
      "token_distribution_shift" -> "1-row corpus-total (n_c, v) broadcast onto vocab-bounded aggregates",
      "mixture_budget_rates" -> "1-row corpus-totals broadcast onto |sources| rows",
      "event_paths_top" -> "1-row path-total broadcast onto a k-bounded top-k",
      "orders_price_histogram" ->
        "1-row total + 1-row fence aggregates broadcast onto the bounded value-domain histogram",
      "daily_revenue_cusum" ->
        "1-row median + 1-row MAD broadcasts onto the day-domain-bounded aggregate",
      "daily_revenue_seasonal" ->
        "1-row residual-MAD broadcast onto the day-domain-bounded aggregate (7-row weekday medians hash-join)",
      "shipping_delay_histogram" ->
        "1-row total broadcast onto the delay-domain-bounded histogram",
      "user_rfm_segments" ->
        "1-row broadcasts only: corpus max date + three quartile-fence rows + histogram totals",
      "user_stickiness_daily" -> "1-row max-day broadcast (trailing-window clip)",
      "uu_wau_sketch_check" ->
        "1-row max-day broadcasts (trailing-window clip, sketch + exact sides)",
      "q11_brand_share" ->
        "1-row all-brand totals broadcast onto the brand-domain-bounded relation",
      "q22_dormant_customers" -> "1-row positive-balance average broadcast",
      "orders_benford_audit" ->
        "9-row Benford-constant table outer-joined to the digit-domain histogram + 1-row total broadcast")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val p = fn(spark, Sf0001).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian product")
      if (!nlAllowed.contains(name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"$name plans a nested-loop join on an unbounded side")
    }
  }

  test("plan lint over EVERY query: unpartitioned windows only over domain-bounded aggregates") {
    // the executable form of PLANS.md's round-11 unpartitioned-window
    // audit: a window with no partitionBy collapses its input to ONE
    // task, which is fine over a day/hour/value-bucket/step domain and a
    // scale-killer over fact rows. Each allowlisted query routes through
    // an audited site (PLANS.md inventory) whose window input is bounded
    // by construction; a NEW unpartitioned window anywhere else fails
    // here and must either partition or justify itself in the audit.
    val unpartAllowed = Map(
      "daily_revenue_cusum" -> "day-domain revenue rows (MAD fences + CUSUM recursion)",
      "daily_revenue_range7d" -> "day-domain revenue rows (7d range frame)",
      "daily_revenue_rank_stats" -> "day-domain revenue rows (rank/ntile/pct)",
      "daily_revenue_running" -> "day-domain revenue rows (running total)",
      "daily_revenue_seasonal" -> "day-domain residuals (weekday medians join)",
      "event_funnel_windowed" -> "one row per funnel step (model-sized)",
      "ivf_cell_stats" -> "per-cell counts (nCells=16 domain, med2 cum counts)",
      "orders_price_histogram" -> "counts per coarsened price value (bounded range)",
      "pareto_days" -> "one row per distinct daily order count (≤ day domain)",
      "revenue_forecast_eval" -> "day-domain revenue rows (forecast lag)",
      "session_concurrency" -> "per-hour start/end deltas (hour domain)",
      "user_rfm_segments" -> "counts per RFM bucket value (bucket domains)",
      "vocab_growth" -> "per-bucket doc/token counts (VocabGrowthBucket domain)")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      val unpart = fn(spark, Sf0001).queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => w
      }
      if (!unpartAllowed.contains(name))
        assert(unpart.isEmpty,
          s"$name plans ${unpart.size} unpartitioned window(s) outside the audited allowlist — " +
            "partition it, or bound its input and add it to PLANS.md's audit + this allowlist")
    }
  }

  test("rarity-score joins are skew-proof: reference model broadcasts, self-scoring splits the Zipf head") {
    // a plain hash join keyed on `tok` piles every occurrence of the
    // Zipf head ("the" ≈ percent of ALL occurrences) onto one reducer;
    // the deployable gate broadcasts its bounded reference artifact, and
    // the self-scoring variant joins its bounded hot set map-side
    assert(plan("token_rarity_against").contains("BroadcastHashJoin"),
      "reference freq artifact must broadcast (no shuffle of the exploded tokens)")
    val self = plan("text_token_rarity")
    assert(self.contains("BroadcastHashJoin"), "Zipf-head tf rows must join broadcast")
    assert(self.contains("TakeOrderedAndProject"), "the hot set must be a bounded top-k")
    // the bigram LM takes the same two shapes: model relations broadcast
    // in the deployable gate, Zipf-head split in the self-scored form
    assert(plan("lm_surprisal_against").contains("BroadcastHashJoin"),
      "bigram LM artifacts must broadcast (no shuffle of the exploded bigrams)")
    val lmSelf = plan("lm_bigram_surprisal")
    assert(lmSelf.contains("BroadcastHashJoin"), "hot-bigram rows must join broadcast")
    assert(lmSelf.contains("TakeOrderedAndProject"), "the hot set must be a bounded top-k")
  }

  test("per-source moments broadcast back over the scan, not the reverse") {
    assert(plan("length_outlier_stats").contains("BroadcastHashJoin"))
  }

  test("distinctive-terms ranking prunes map-side (WindowGroupLimit) with no broadcast hint") {
    // the window input is the vocab-bounded aggregate; Spark 4's group
    // limit must prune to top-k before the shuffle, and the tf⋈df join
    // must stay AQE-decided (a forced broadcast of a vocabulary-sized
    // table would OOM at corpus scale)
    val p = plan("distinctive_terms")
    assert(p.contains("WindowGroupLimit"), "map-side top-k pruning missing")
    // exchange reuse is an AQE runtime decision — assert on the FINAL plan
    val df = SparkEntry.queries("distinctive_terms")(spark, Sf0001)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("ReusedExchange"),
      "tf/df branches must share the exploded-token exchange, not scan twice")
  }
}
