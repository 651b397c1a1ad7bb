package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline extensions) has one entry in `queries`, and — when
  * SQL-expressible — an exactly-equivalent DuckDB oracle in `oracleSql`.
  * Column names and row ordering match between the two by construction;
  * floating-point aggregates are emitted as exact integer cents and window
  * keys as unix epoch seconds so results are bit-stable across engines and
  * partitionings.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's single query: distinct users per 1-minute window
    * (/root/reference/README.md:2-3). */
  def entry(spark: SparkSession): DataFrame =
    UniqueUsers.perMinute(Tables.events(spark, "/root/testdata/sf0.001"))

  /** dedup_semantic's registered threshold — shared by query and oracle
    * so the two cannot drift (see the registry comment for why 0.4). */
  private val SemanticGateThreshold = 0.4

  /** Scratch location for doc_lexical_ann_pq's persisted index — a
    * deterministic per-sfDir path under the JVM temp dir (savePqIndex
    * overwrites, so repeated runs reuse the same tree). The index build
    * is part of the registered query on purpose: the composition under
    * test is build-then-search, and its bench time should price both. */
  private def lexPqIndexPath(sfDir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_lexpq_${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}"

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference-parity family (events): SURVEY.md §2 S1-S3/O1-O7 ----
    "uu_per_minute" -> ((s, d) => UniqueUsers.perMinute(Tables.events(s, d))),
    "uu_per_minute_twophase" -> ((s, d) => UniqueUsers.perMinuteTwoPhase(Tables.events(s, d))),
    // the keyed generalization: state per (event_type, window), the
    // production form of the reference's constant-key topology
    "uu_per_minute_by_type" -> ((s, d) => UniqueUsers.perMinuteByType(Tables.events(s, d))),
    // the counter's own monitoring view: minutes per distinct-count value
    "uu_minute_histogram" -> ((s, d) => UniqueUsers.perMinuteHistogram(Tables.events(s, d))),
    "uu_per_minute_collect_set" -> ((s, d) => UniqueUsers.perMinuteCollectSet(Tables.events(s, d))),
    // the HLL sketch's registered face is its BOUND GATE: exact anchor
    // + 0/1 verdict, fully oracle-checked. The raw estimate relation
    // ([[graft.operators.UniqueUsers.perMinuteApprox]] — executed
    // INSIDE this gate) stays library API with its own error spec
    // (UniqueUsersSpec): its values are engine-specific, so a registry
    // row for them could never be more than rows-only.
    "uu_per_minute_approx_check" -> ((s, d) => UniqueUsers.perMinuteApproxCheck(Tables.events(s, d))),
    // Count-Min point-count sketch, bound-gated like the HLL check
    "user_count_cms_check" -> ((s, d) => UniqueUsers.userCountCmsCheck(Tables.events(s, d))),
    // mergeable DataSketches rollup (per-hour HLL sketches UNIONED to
    // daily distincts), registered as its oracle-gated bound check —
    // the rollup itself ([[graft.operators.UniqueUsers.dailySketchRollup]],
    // executed inside the gate) is engine-specific-valued API, audited
    // for hour/day algebra in AuditSpec
    "uu_daily_sketch_check" -> ((s, d) => UniqueUsers.dailySketchCheck(Tables.events(s, d))),
    // rolling 7-day WAU from per-day sketch blobs, bound-gated against
    // the exact pair-relation form (user_stickiness_daily semantics)
    "uu_wau_sketch_check" -> ((s, d) => UniqueUsers.wauSketchCheck(Tables.events(s, d))),
    // sketch set algebra: pairwise audience intersection by
    // inclusion-exclusion over stored per-type sketches, bound-gated
    "audience_overlap_check" -> ((s, d) => UniqueUsers.audienceOverlapCheck(Tables.events(s, d))),
    "uu_per_minute_udaf" -> ((s, d) => UniqueUsers.perMinuteUdaf(Tables.events(s, d))),
    "uu_per_minute_sql" -> ((s, d) => GraftSql.uuPerMinuteSql(s, d)),
    "sales_grouping_sets" -> ((s, d) => GraftSql.salesGroupingSets(s, d)),
    "order_value_percentiles" -> ((s, d) =>
      Relational.percentilesBySegment(Tables.orders(s, d), Tables.customer(s, d))),
    // sketch percentiles, registered as the oracle-gated bound check;
    // the raw estimate relation (Relational.percentilesBySegmentApprox,
    // executed inside the gate) is engine-specific-valued API,
    // error-bounded against the exact op in OperatorSpec
    "order_value_percentiles_approx_check" -> ((s, d) =>
      Relational.percentilesBySegmentApproxCheck(Tables.orders(s, d), Tables.customer(s, d))),
    "customer_order_counts" -> ((s, d) =>
      Relational.customerOrderCounts(Tables.customer(s, d), Tables.orders(s, d))),
    "daily_revenue_range7d" -> ((s, d) => Relational.dailyRevenueRange7d(Tables.orders(s, d))),
    "top_tokens_per_source" -> ((s, d) => TextAnalysis.topTokensPerSource(Tables.documents(s, d))),
    // Misra-Gries sketch proposes candidates, exact count verifies
    "token_heavy_hitters" -> ((s, d) => TextAnalysis.tokenHeavyHitters(Tables.documents(s, d))),
    "uu_sliding_5m_1m" -> ((s, d) => UniqueUsers.slidingDistinct(Tables.events(s, d))),
    "events_filter_project" -> ((s, d) => UniqueUsers.filterProject(Tables.events(s, d))),
    "events_json_extract" -> ((s, d) => UniqueUsers.jsonExtractStats(Tables.events(s, d))),
    // Spark 4 VARIANT: parse once, typed variant_get extraction
    "events_variant_extract" -> ((s, d) =>
      UniqueUsers.variantExtractStats(Tables.events(s, d))),
    "events_props_map_stats" -> ((s, d) => UniqueUsers.propsMapStats(Tables.events(s, d))),
    // Spark 4 recursive CTE: engine-fixpoint bounded reachability
    "reachability_recursive" -> ((s, d) => GraftSql.reachabilityRecursiveSql(s, d)),
    // Spark 4 LISTAGG: ordered string aggregate over a total-ordered top-k
    "priority_top_orders_listagg" -> ((s, d) => GraftSql.priorityTopOrdersListagg(s, d)),
    // runtime Bloom-filter join pruning (DPP's row-level cousin)
    "bloomjoin_segment_revenue" -> ((s, d) =>
      graft.operators.Star.bloomSegmentRevenue(s, d)),
    "event_type_stats" -> ((s, d) => UniqueUsers.eventTypeStats(Tables.events(s, d))),
    // ---- relational coverage (SURVEY.md §2 category checklist) ----
    "q1_pricing_summary" -> ((s, d) => Relational.pricingSummary(Tables.lineitem(s, d))),
    "q3_top_orders" -> ((s, d) =>
      Relational.topOrders(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q5_nation_revenue" -> ((s, d) =>
      Relational.nationRevenue(Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
        Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d))),
    "top100_items" -> ((s, d) => Relational.topItems(Tables.lineitem(s, d))),
    "customers_topn_per_segment" -> ((s, d) => Relational.topCustomersPerSegment(Tables.customer(s, d))),
    "semi_join_customers" -> ((s, d) =>
      Relational.customersWithOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "anti_join_customers" -> ((s, d) =>
      Relational.customersWithoutOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "custkeys_intersect" -> ((s, d) =>
      Relational.keyIntersect(Tables.customer(s, d), Tables.orders(s, d))),
    "custkeys_except" -> ((s, d) =>
      Relational.keyExcept(Tables.customer(s, d), Tables.orders(s, d))),
    "sales_rollup" -> ((s, d) => Relational.salesRollup(Tables.lineitem(s, d))),
    "orders_enriched" -> ((s, d) => Relational.ordersEnriched(Tables.orders(s, d), Tables.customer(s, d))),
    "sales_cube" -> ((s, d) => Relational.salesCube(Tables.lineitem(s, d))),
    "latest_order_per_customer" -> ((s, d) => Relational.latestOrderPerCustomer(Tables.orders(s, d))),
    "order_value_histogram" -> ((s, d) => Relational.orderValueHistogram(Tables.orders(s, d))),
    "events_pivot" -> ((s, d) => Relational.eventsPivot(Tables.events(s, d))),
    // time-series resample: dense 15-min grid, zero-fill + LOCF
    "events_resample_gapfill" -> ((s, d) => Relational.eventsResampleGapfill(Tables.events(s, d))),
    // ANALYZE primitive: long-format per-column profile (nulls/NDV/min/max)
    "table_column_stats" -> ((s, d) => Relational.tableColumnStats(Tables.orders(s, d))),
    // ordered-funnel conversion over first-occurrence step times
    "event_funnel" -> ((s, d) => Relational.eventFunnel(Tables.events(s, d))),
    // the TIME-BOUNDED funnel: each transition must land within
    // FunnelHorizonSec of the previous step's completion
    "event_funnel_windowed" -> ((s, d) => Relational.eventFunnelWindowed(Tables.events(s, d))),
    // time-to-convert percentiles per transition (same greedy chain)
    "funnel_time_to_convert" -> ((s, d) => Relational.funnelTimeToConvert(Tables.events(s, d))),
    // the SESSIONIZED funnel: conversion must complete within one
    // 30-min-gap session (strictest of the three funnel semantics)
    "event_funnel_sessionized" -> ((s, d) => Relational.eventFunnelSessionized(Tables.events(s, d))),
    // weekly first-activity cohorts × distinct-active-week offsets
    "user_retention_cohorts" -> ((s, d) => Relational.retentionCohorts(Tables.events(s, d))),
    // Markov next-event matrix with integer-ppm row shares
    "event_transition_matrix" -> ((s, d) => Relational.eventTransitionMatrix(Tables.events(s, d))),
    // top 3-event user journeys (path analysis one step past pairs)
    "event_paths_top" -> ((s, d) => Relational.eventPathsTop(Tables.events(s, d))),
    // market-basket pair mining: same-order part pairs + integer lift
    "part_cooccurrence" -> ((s, d) => Relational.partCooccurrence(Tables.lineitem(s, d))),
    "user_sessions" -> ((s, d) => Sessionize.userSessions(Tables.events(s, d))),
    // sweep-line peak-concurrency per hour (two-phase prefix sum, no
    // interval × timeline range join)
    "session_concurrency" -> ((s, d) => Sessionize.sessionConcurrency(Tables.events(s, d))),
    "asof_join_orders" -> ((s, d) => Sessionize.asofJoinOrders(Tables.events(s, d), Tables.orders(s, d))),
    // bucketized point-in-interval join: purchases within 1h after a
    // click, same user — time-bucket expansion, never a theta join
    "click_purchase_range_join" -> ((s, d) =>
      Sessionize.clickPurchaseRangeJoin(Tables.events(s, d))),
    // leakage-free trailing-window lag features per entity (RANGE frame)
    "customer_trailing_features" -> ((s, d) =>
      Relational.customerTrailingFeatures(Tables.orders(s, d))),
    // last-touch attribution: every purchase credited to exactly one
    // channel (latest in-horizon click/view, else 'direct')
    "attribution_last_touch" -> ((s, d) =>
      Sessionize.lastTouchAttribution(Tables.events(s, d))),
    // Pregel-style iterative graph: integer-lattice PageRank over the
    // customer-supplier trading graph (one dst-shuffle per superstep)
    "graph_pagerank" -> ((s, d) =>
      graft.operators.Graph.pagerank(Tables.orders(s, d), Tables.lineitem(s, d))),
    // degree-ordered triangle census of the co-purchase graph
    "graph_triangles" -> ((s, d) =>
      graft.operators.Graph.triangleStats(Tables.lineitem(s, d))),
    // deterministic synchronous label propagation: co-purchase communities
    "graph_communities" -> ((s, d) =>
      graft.operators.Graph.labelPropagation(Tables.lineitem(s, d))),
    // common-neighbor link prediction, hub mediators capped
    "graph_link_prediction" -> ((s, d) =>
      graft.operators.Graph.linkPrediction(Tables.lineitem(s, d))),
    // data-contract audit: one bounded report row per expectation
    "data_expectations" -> ((s, d) => graft.operators.Audit.expectations(
      Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d),
      Tables.events(s, d), Tables.documents(s, d))),
    // privacy-release gate: quasi-identifier equivalence-class histogram
    "kanon_risk" -> ((s, d) => graft.operators.Audit.kAnonymityRisk(Tables.customer(s, d))),
    // forensic first-digit screen (Nigrini): fabricated/capped amounts tripwire
    "orders_benford_audit" -> ((s, d) => graft.operators.Audit.benfordAudit(Tables.orders(s, d))),
    // A/A split sanity: the hash assignment must NOT read significant
    "ab_split_check" -> ((s, d) => graft.operators.Audit.abSplitCheck(Tables.events(s, d))),
    // robust (median/MAD, integer-exact) hourly rate-spike detection
    "event_rate_anomaly" -> ((s, d) => graft.operators.Audit.eventRateAnomaly(Tables.events(s, d))),
    // CUSUM slow-drift detection via the prefix-sum/running-min closed form
    "daily_revenue_cusum" -> ((s, d) => graft.operators.Audit.dailyRevenueCusum(Tables.orders(s, d))),
    // naive vs seasonal-naive forecast backtest, integer WAPE
    "revenue_forecast_eval" -> ((s, d) => graft.operators.Audit.revenueForecastEval(Tables.orders(s, d))),
    "salted_event_segment_stats" -> ((s, d) =>
      Skew.saltedEventSegmentStats(Tables.events(s, d), Tables.customer(s, d))),
    // the same join left to AQE's runtime skew split (result-invariant;
    // PlanShapeSpec drives the skewed case and asserts the skew=true split)
    "aqe_skew_event_segment_stats" -> ((s, d) =>
      Skew.aqeEventSegmentStats(Tables.events(s, d), Tables.customer(s, d))),
    // pre-shuffle diagnostic: top-k heaviest values of a prospective key
    "join_key_skew_stats" -> ((s, d) => Skew.joinKeySkewStats(Tables.events(s, d), "user_id")),
    "median_order_by_segment" -> ((s, d) =>
      Relational.medianOrderValueBySegment(Tables.orders(s, d), Tables.customer(s, d))),
    // Z-order (Morton) locality audit: per-Z-bucket bounding boxes
    "zorder_cluster_stats" -> ((s, d) => Layout.zorderClusterStats(Tables.orders(s, d))),
    // dynamic partition pruning end-to-end: write the month-partitioned
    // fact layout, then star-join it through a filtered calendar dim —
    // the scan's PartitionFilters carry a dynamicpruningexpression
    // (PlanShapeSpec asserts it) and the oracle recomputes the quarter
    // from the unpartitioned facts, so pruning is hash-gated lossless
    "dpp_quarter_revenue" -> ((s, d) => {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_dppfact_${d.replaceAll("[^A-Za-z0-9.]", "_")}"
      Star.writeMonthPartitionedOrders(Tables.orders(s, d), path)
      Star.dppQuarterRevenue(s, path)
    }),
    // MERGE INTO semantics on plain parquet relations (CDC apply)
    "orders_upsert_apply" -> ((s, d) => Relational.ordersUpsertApply(Tables.orders(s, d))),
    // change log -> SCD2 interval dimension via per-key lead()
    "scd2_orders" -> ((s, d) => Relational.scd2FromOrders(Tables.orders(s, d))),
    // RFM quartile segmentation via bounded-histogram fences (no ntile)
    "user_rfm_segments" -> ((s, d) => Relational.rfmSegments(Tables.orders(s, d))),
    // equi-depth 20-bucket value histogram (CBO selectivity stats)
    "orders_price_histogram" -> ((s, d) => Relational.ordersPriceHistogram(Tables.orders(s, d))),
    // order->ship latency distribution (delay-domain-bounded histogram)
    "shipping_delay_histogram" -> ((s, d) =>
      Relational.shippingDelayHistogram(Tables.lineitem(s, d), Tables.orders(s, d))),
    // slowest suppliers by integer 2x-median delay, k-bounded
    "supplier_delay_ranking" -> ((s, d) =>
      Relational.supplierDelayRanking(Tables.lineitem(s, d), Tables.orders(s, d))),
    // per-month p50/p90/p99 delay SLA curve (nearest-rank == quantile_disc)
    "shipping_delay_percentiles" -> ((s, d) =>
      Relational.shippingDelayPercentiles(Tables.lineitem(s, d), Tables.orders(s, d))),
    // weekday-seasonal residual anomaly (each weekday vs its own median)
    "daily_revenue_seasonal" -> ((s, d) =>
      graft.operators.Audit.dailyRevenueSeasonalResidual(Tables.orders(s, d))),
    // rank/ntile/integer-percent-rank over the bounded daily aggregate
    "daily_revenue_rank_stats" -> ((s, d) => Relational.dailyRevenueRankStats(Tables.orders(s, d))),
    // materialized-aggregate maintenance, hash-gated END TO END: init
    // from the even-keyed facts, apply the odd-keyed batch as a delta,
    // REPLAY the same batch (must be a ledgered no-op), and the read-back
    // must equal the oracle's full recompute over all facts — a broken
    // merge or a double-applied replay is a hash mismatch, not a log line
    "daily_revenue_incremental" -> ((s, d) => {
      val orders = Tables.orders(s, d)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_dailyrev_${d.replaceAll("[^A-Za-z0-9.]", "_")}"
      Relational.saveDailyRevenue(orders.filter("o_orderkey % 2 = 0"), path)
      Relational.applyDailyRevenueDelta(s, path, orders.filter("o_orderkey % 2 = 1"), batchId = 1L)
      Relational.applyDailyRevenueDelta(s, path, orders.filter("o_orderkey % 2 = 1"), batchId = 1L)
      Relational.loadDailyRevenue(s, path).orderBy("day_sec")
    }),
    "parts_above_brand_avg" -> ((s, d) => Relational.partsAboveBrandAverage(Tables.part(s, d))),
    // ---- correlated-subquery suite (TPC-H Q4/Q11/Q13/Q17/Q21/Q22
    // analogues), every correlation decorrelated to aggregate-then-join ----
    "q4_late_priority" -> ((s, d) =>
      Relational.latePriorityDistribution(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q11_brand_share" -> ((s, d) =>
      Relational.brandRevenueAboveAverage(Tables.lineitem(s, d), Tables.part(s, d))),
    "q13_order_distribution" -> ((s, d) =>
      Relational.customerOrderDistribution(Tables.customer(s, d), Tables.orders(s, d))),
    "q17_small_qty_revenue" -> ((s, d) =>
      Relational.smallQuantityRevenue(Tables.lineitem(s, d), Tables.part(s, d))),
    "q21_waiting_supplier" -> ((s, d) =>
      Relational.soleLateSupplier(Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d))),
    "q22_dormant_customers" -> ((s, d) =>
      Relational.dormantRichCustomers(Tables.customer(s, d), Tables.orders(s, d))),
    // ---- TPC-H remainder: scan-bound, star-join, and disjunctive shapes ----
    "q6_discount_band" -> ((s, d) => Relational.discountBandRevenue(Tables.lineitem(s, d))),
    "q7_nation_trade" -> ((s, d) =>
      Relational.nationTradeMatrix(Tables.nation(s, d), Tables.customer(s, d),
        Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d))),
    "q8_market_share" -> ((s, d) =>
      Relational.nationMarketShare(Tables.region(s, d), Tables.nation(s, d),
        Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d),
        Tables.supplier(s, d))),
    "q10_returned_customers" -> ((s, d) =>
      Relational.returnedItemCustomers(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d))),
    "q14_promo_share" -> ((s, d) =>
      Relational.promoRevenueShare(Tables.lineitem(s, d), Tables.part(s, d))),
    "q19_bracket_revenue" -> ((s, d) =>
      Relational.bracketRevenue(Tables.lineitem(s, d), Tables.part(s, d))),
    "q15_top_supplier" -> ((s, d) =>
      Relational.topQuarterSupplier(Tables.supplier(s, d), Tables.lineitem(s, d))),
    "q18_large_orders" -> ((s, d) =>
      Relational.largeVolumeOrders(Tables.customer(s, d), Tables.orders(s, d),
        Tables.lineitem(s, d))),
    // ---- derived-partsupp completion: the five TPC-H shapes the driver
    // schema could not express (no partsupp table, no shipmode/commit
    // dates). The missing attributes are key-derived md5 integers the
    // DuckDB oracle reconstructs identically from the same parquet —
    // with these EVERY TPC-H query shape has a green correctness entry.
    "q2_min_cost_supp" -> ((s, d) =>
      Relational.minCostSupplier(Tables.part(s, d), Tables.supplier(s, d),
        Tables.nation(s, d), Tables.region(s, d), Tables.lineitem(s, d))),
    "q9_product_profit" -> ((s, d) =>
      Relational.productTypeProfit(Tables.part(s, d), Tables.supplier(s, d),
        Tables.nation(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q12_shipmode_priority" -> ((s, d) =>
      Relational.shipmodePriority(Tables.orders(s, d), Tables.lineitem(s, d))),
    "q16_supplier_cnt" -> ((s, d) =>
      Relational.supplierCountByPart(Tables.part(s, d), Tables.supplier(s, d),
        Tables.lineitem(s, d))),
    "q20_promo_suppliers" -> ((s, d) =>
      Relational.promoSuppliers(Tables.part(s, d), Tables.supplier(s, d),
        Tables.nation(s, d), Tables.lineitem(s, d))),
    // out-of-fold categorical target encoding: one aggregate, K-fold
    // exclusion by subtraction — the leakage-safe ML prep step
    "segment_target_encoding" -> ((s, d) =>
      Relational.segmentTargetEncoding(Tables.orders(s, d), Tables.customer(s, d))),
    // lead-lag analysis: integer-scaled covariance per day shift
    "event_lag_correlation" -> ((s, d) =>
      Relational.eventLagCorrelation(Tables.events(s, d))),
    // ---- AQP: deterministic 1/16 md5-sample estimates, HT-variance
    // gated; the oracle recomputes estimate AND gate ----
    "aqp_revenue_estimate_check" -> ((s, d) =>
      graft.operators.Approx.revenueEstimateCheck(Tables.orders(s, d))),
    "aqp_segment_revenue_check" -> ((s, d) =>
      graft.operators.Approx.segmentRevenueEstimateCheck(
        Tables.orders(s, d), Tables.customer(s, d))),
    // 2D skyline: days no other day beats on both (orders, revenue)
    "pareto_days" -> ((s, d) => graft.operators.Approx.paretoDays(Tables.orders(s, d))),
    // full changelog semantics: I/U/D ops, highest-seq wins, D removes
    "cdc_apply_changes" -> ((s, d) => Relational.cdcApplyChanges(Tables.orders(s, d))),
    // consumption side of SCD2: facts joined to the version valid at t
    "scd2_temporal_join" -> ((s, d) =>
      Relational.scd2TemporalJoin(Tables.orders(s, d), Tables.events(s, d))),
    // wide→long reshape: Spark native unpivot (melt), the inverse of pivot
    "lineitem_metrics_unpivot" -> ((s, d) =>
      Relational.lineitemMetricsUnpivot(Tables.lineitem(s, d))),
    // DAU / rolling-7d WAU / stickiness via the exploded distinct-pair relation
    "user_stickiness_daily" -> ((s, d) => Relational.userStickinessDaily(Tables.events(s, d))),
    // per-segment p5/p95 winsorization over the quantized value-domain histogram
    "order_value_winsorized" -> ((s, d) =>
      Relational.orderValueWinsorized(Tables.orders(s, d), Tables.customer(s, d))),
    // incident blast-radius: sessions overlapping any spike-flagged hour
    "anomaly_session_impact" -> ((s, d) =>
      graft.operators.Audit.anomalySessionImpact(Tables.events(s, d))),
    // observe(): audit metrics collected during the main query's own scan
    "observed_order_audit" -> ((s, d) =>
      graft.operators.Audit.observedOrderAudit(Tables.orders(s, d))),
    // co-located bucketed fact⋈fact join: shuffle paid once at write time
    "bucketed_join_revenue" -> ((s, d) =>
      graft.operators.Layout.bucketedJoinRevenue(s, Tables.orders(s, d), Tables.lineitem(s, d))),
    "daily_revenue_running" -> ((s, d) => Relational.dailyRevenueRunning(Tables.orders(s, d))),
    "customer_name_parse" -> ((s, d) => Relational.customerNameParse(Tables.customer(s, d))),
    "events_by_weekday" -> ((s, d) => Relational.eventsByWeekday(Tables.events(s, d))),
    "text_top_bigrams" -> ((s, d) => TextAnalysis.topBigrams(Tables.documents(s, d))),
    // ---- deduplication (training-data pipeline) ----
    "dedup_exact" -> ((s, d) => Dedup.exact(Tables.documents(s, d))),
    "dedup_exact_norm" -> ((s, d) => Dedup.exactNormalized(Tables.documents(s, d))),
    "dedup_exact_norm_sql" -> ((s, d) => GraftSql.dedupExactNormSql(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => Dedup.minhashLsh(Tables.documents(s, d))),
    "dedup_minhash_sql" -> ((s, d) => GraftSql.dedupMinhashSql(s, d)),
    "dedup_simhash" -> ((s, d) => Dedup.simhashPairs(Tables.documents(s, d))),
    "dedup_ngram_jaccard" -> ((s, d) => Dedup.ngramJaccard(Tables.documents(s, d))),
    // weighted lexical near-dup: inverted-index all-pairs TF-cosine,
    // integer-exact (25·dot² >= 16·na2·nb2 for cos >= 0.8)
    "dedup_sparse_cosine" -> ((s, d) => Dedup.sparseCosine(Tables.documents(s, d))),
    // verbatim-passage overlap (exact-substring dedup, positional grams)
    "dedup_substring" -> ((s, d) => Dedup.substringDup(Tables.documents(s, d))),
    // hot-gram disclosure monitor for dedup_substring's df cut
    "substring_gram_stats" -> ((s, d) => Dedup.substringGramStats(Tables.documents(s, d))),
    "dedup_levenshtein" -> ((s, d) => Dedup.levenshteinPrefix(Tables.documents(s, d))),
    "dedup_embedding_cosine" -> ((s, d) => Dedup.embeddingNearDup(Tables.embeddings(s, d))),
    // threshold 0.5, like the adaptive ladder: the synthetic embeddings
    // are isotropic — no pair anywhere reaches cos 0.8 — so a 0.9 gate
    // would compare empty-vs-empty at every decade
    "dedup_embedding_hyperplane" -> ((s, d) => Dedup.embeddingNearDup(
      Tables.embeddings(s, d), threshold = 0.5,
      bands = Dedup.EmbHyperBands, bits = 8, hyperplane = true)),
    // SemDeDup: cluster-scoped semantic dedup sharing the session IVF
    // quantizer (oracle inlines the same centroid table post-run).
    // Registered at threshold 0.4: the synthetic embeddings are
    // near-isotropic (ONE pair corpus-wide reaches the 0.5 default at
    // sf0.01), and 0.4 exercises the in-cell verify + keeper logic on
    // real rows at both gate scales
    "dedup_semantic" -> ((s, d) =>
      Dedup.semanticDedup(Tables.embeddings(s, d), threshold = SemanticGateThreshold)),
    "dedup_clusters" -> ((s, d) => Dedup.dedupClusters(Tables.documents(s, d))),
    // ingestion-time cross-corpus dedup: odd doc_ids arrive as the new
    // batch, even doc_ids are the already-ingested corpus. The orderBy is
    // THIS query's oracle-hash determinism, not the operator's — the
    // production path returns the admitted set unordered.
    "incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.incrementalDedup(docs.filter("doc_id % 2 = 1"), docs.filter("doc_id % 2 = 0"))
        .orderBy("doc_id")
    }),
    // the DELTA-MERGE path end-to-end: persist the even-id corpus's
    // index, apply a corpus diff (every 6th even id removed, every 10th
    // content-bumped), then dedup the odd-id batch against the MERGED
    // index — the oracle recomputes the same semantics over the
    // post-diff corpus, so removal/change propagation is hash-gated
    // cross-engine, not just spec-pinned
    "incremental_dedup_after_diff" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, expr}
      val docs = Tables.documents(s, d)
      val existing = docs.filter("doc_id % 2 = 0")
      // a previous session (other SF dir, same warehouse) may have left
      // this index's managed locations behind — rebuild from scratch
      Dedup.dropDedupIndex(s, "dix_diffq")
      Dedup.saveDedupIndex(existing, "dix_diffq")
      Dedup.applyCorpusDiff(s, "dix_diffq",
        removed = existing.filter("doc_id % 6 = 0").select(col("doc_id")),
        // %6 != 0: a doc can't be both removed and changed — removal wins
        // (the oracle's post-diff corpus excludes removed ids entirely)
        changed = existing.filter("doc_id % 10 = 4 AND doc_id % 6 != 0")
          .withColumn("text", expr("concat(text, ' v2')")))
      Dedup.incrementalDedup(docs.filter("doc_id % 2 = 1"),
        Dedup.loadDedupIndex(s, "dix_diffq")).orderBy("doc_id")
    }),
    // the SHARD-MERGE path end-to-end: the even-id corpus is ingested as
    // TWO disjoint shard indexes (the N-pipelines deployment shape
    // StreamShardBench measures), merged via Dedup.mergeDedupIndexes,
    // then the odd-id batch dedups against the MERGED index. The oracle
    // is the plain union-corpus incremental-dedup SQL — identical to
    // incremental_dedup's — so merge ≡ fresh-save-over-union is
    // hash-gated cross-engine on real data, not just spec-pinned
    "incremental_dedup_shard_merge" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      for (n <- Seq("dix_shaq", "dix_shbq", "dix_shmq")) Dedup.dropDedupIndex(s, n)
      // the two shard builds are independent pipelines writing disjoint
      // tables — exactly the deployment shape this query models (one
      // ingest pipeline per shard), so run them as CONCURRENT Spark jobs
      // (optimization-guide §2.6: overlap independent jobs so one
      // build's serial commit tail back-fills with the other's tasks)
      graft.Par.runAll(
        () => Dedup.saveDedupIndex(docs.filter("doc_id % 4 = 0"), "dix_shaq"),
        () => Dedup.saveDedupIndex(docs.filter("doc_id % 4 = 2"), "dix_shbq"))
      Dedup.mergeDedupIndexes(s, Seq("dix_shaq", "dix_shbq"), "dix_shmq")
      Dedup.incrementalDedup(docs.filter("doc_id % 2 = 1"),
        Dedup.loadDedupIndex(s, "dix_shmq")).orderBy("doc_id")
    }),
    "cross_source_dup_matrix" -> ((s, d) => Dedup.crossSourceDupMatrix(Tables.documents(s, d))),
    // near-dup family-size histogram (mega-family = leaked template)
    "dedup_cluster_sizes" -> ((s, d) => Dedup.clusterSizeHistogram(Tables.documents(s, d))),
    // exact inner-join cardinality + hot-key bound WITHOUT the join
    "join_size_estimate" -> ((s, d) =>
      Skew.joinSizeEstimate(Tables.events(s, d), "user_id", Tables.customer(s, d), "c_custkey")),
    // quality-ranked canonical per near-dup family (keep the cleanest
    // copy, not the first-ingested one)
    "dedup_keep_best" -> ((s, d) => Dedup.keepBestPerCluster(Tables.documents(s, d))),
    // bloom first-stage acceptance gate: exact counts + machine-checked
    // no-false-negative / fp-rate booleans (bound-gate oracle pattern)
    "dedup_bloom_check" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.bloomCheck(docs.filter("doc_id % 2 = 1"), docs.filter("doc_id % 2 = 0"))
    }),
    "minhash_band_stats" -> ((s, d) => Dedup.minhashBandStats(Tables.documents(s, d))),
    "simhash_band_stats" -> ((s, d) => Dedup.simhashBandStats(Tables.documents(s, d))),
    "benchmark_contamination" -> ((s, d) => Dedup.benchmarkContamination(Tables.documents(s, d))),
    // per-doc recycled-text score (fraction of shingles seen elsewhere)
    "doc_shingle_novelty" -> ((s, d) => Dedup.shingleNovelty(Tables.documents(s, d))),
    "mixture_weights" -> ((s, d) => TextAnalysis.mixtureWeights(Tables.documents(s, d))),
    // token-budget planning: per-source target share, sampling rate,
    // and disclosed deficit before any sampling runs
    "mixture_budget_rates" -> ((s, d) =>
      TextAnalysis.mixtureBudgetRates(Tables.documents(s, d))),
    "top_repeated_shingles" -> ((s, d) => TextAnalysis.topRepeatedShingles(Tables.documents(s, d))),
    // ---- similarity search ----
    "ann_bruteforce_topk" -> ((s, d) => Similarity.bruteForceTopK(Tables.embeddings(s, d))),
    // matryoshka truncation audit: is a 16-of-64-dim prefilter safe?
    "embedding_truncation_recall" -> ((s, d) =>
      Similarity.truncationRecall(Tables.embeddings(s, d))),
    // LSH layout trust audit: bucketed top-k hits inside the exact top-k
    "ann_lsh_recall" -> ((s, d) => Similarity.lshRecall(Tables.embeddings(s, d))),
    "ann_bruteforce_sql" -> ((s, d) => GraftSql.annBruteForceSql(s, d)),
    "ann_lsh_topk" -> ((s, d) => Similarity.lshTopK(Tables.embeddings(s, d))),
    "ann_lsh_multiprobe_topk" -> ((s, d) => Similarity.lshMultiProbeTopK(Tables.embeddings(s, d))),
    "ann_ivf_topk" -> ((s, d) => Similarity.ivfTopK(Tables.embeddings(s, d))),
    // IVF drift/skew monitor: per-cell occupancy under the same session
    // quantizer ann_ivf_topk searches with (same (corpus, nCells) model
    // key, so the oracle inlines one shared centroid table)
    "ivf_cell_stats" -> ((s, d) => Similarity.cellStats(Tables.embeddings(s, d))),
    // vector-side delta-merge end-to-end: persist the IVF layout, remove
    // every 7th-congruent vector from the cell tree, search the pruned
    // index — the oracle runs the identical search restricted to the
    // post-diff corpus, so removal is hash-gated (a removed vector can
    // never surface). Shares ann_ivf_topk's quantizer key, so the
    // inlined-model oracle family stays unambiguous.
    "ann_ivf_after_remove" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val emb = Tables.embeddings(s, d)
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_ivfrm_${d.replaceAll("[^A-Za-z0-9.]", "_")}"
      Similarity.saveIvfIndex(emb, path)
      Similarity.removeFromIvfIndex(s, path,
        emb.filter("vec_id % 7 = 4").select(col("vec_id")))
      Similarity.ivfSearchIndexed(s, path,
        emb.filter(col("vec_id") < 5)
          .select(col("vec_id").as("query_id"), col("embedding")))
    }),
    // IVF-PQ: coarse-cell probing + product-quantized ADC scoring +
    // exact re-rank of the top-PqRefine candidates (32x memory compression)
    "ann_ivfpq_topk" -> ((s, d) => Similarity.pqTopK(Tables.embeddings(s, d))),
    // PQ codebook occupancy: dead-centroid / drift monitor per subspace
    "pq_code_stats" -> ((s, d) => Similarity.pqCodeStats(Tables.embeddings(s, d))),
    "ann_bucket_stats" -> ((s, d) => Similarity.bucketStats(Tables.embeddings(s, d))),
    "embedding_norm_stats" -> ((s, d) => Similarity.normStats(Tables.embeddings(s, d))),
    // int8 scalar-quantization reconstruction-error audit (the 4x tier)
    "embedding_int8_stats" -> ((s, d) => Similarity.int8QuantStats(Tables.embeddings(s, d))),
    // ---- text analysis ----
    "text_stats" -> ((s, d) => TextAnalysis.stats(Tables.documents(s, d))),
    "text_token_counts" -> ((s, d) => TextAnalysis.tokenCounts(Tables.documents(s, d))),
    "text_langid" -> ((s, d) => TextAnalysis.langId(Tables.documents(s, d))),
    "text_quality" -> ((s, d) => TextAnalysis.quality(Tables.documents(s, d))),
    // distilled linear quality classifier (margin scoring; oracle inlines
    // the fitted coefficients post-run, like the IVF centroids)
    "quality_classifier" -> ((s, d) =>
      QualityModel.trainedQualityScores(Tables.documents(s, d))),
    "doc_fingerprint" -> ((s, d) => TextAnalysis.fingerprints(Tables.documents(s, d))),
    // winnowing: rolling-hash (Karp-Rabin) k-gram fingerprints with
    // window-min selection — the LOCAL fingerprint family (MOSS-style)
    "doc_winnow_fingerprint" -> ((s, d) => TextAnalysis.winnowFingerprints(Tables.documents(s, d))),
    "corpus_summary" -> ((s, d) => TextAnalysis.corpusSummary(Tables.documents(s, d))),
    "corpus_sample_stratified" -> ((s, d) => TextAnalysis.stratifiedSample(Tables.documents(s, d))),
    // α=0.5 temperature mixture (downsample-only; integer-exact after
    // the correctly-rounded sqrt). The test corpus is source-uniform —
    // where the α-mix is the identity — so the query runs over a
    // deterministically SKEWED subset (per-source modulus filter, same
    // expression in the oracle): tail sources keep all their docs, head
    // sources give up theirs, and the oracle checks that arithmetic.
    "mixture_sample_temperature" -> ((s, d) => TextAnalysis.temperatureSample(
      Tables.documents(s, d)
        .filter("doc_id % (2 + CAST(substring(source, 4, 10) AS INT) % 4) = 0"))),
    // per-source cap, two-phase (hash-threshold prefilter + bounded
    // row_number) so no source ever lands whole on one reducer
    "source_cap_sample" -> ((s, d) => TextAnalysis.sourceCap(Tables.documents(s, d))),
    "train_test_split" -> ((s, d) => TextAnalysis.trainTestSplit(Tables.documents(s, d))),
    // cluster-keyed holdout: near-dup families never straddle the
    // train/test fence (the naive per-doc hash leaks near-dups across it)
    "leakage_safe_split" -> ((s, d) => TextAnalysis.leakageSafeSplit(Tables.documents(s, d))),
    // hashing-trick TF vectors: text → fixed-dim count vector, no
    // vocabulary artifact; the bridge from documents into the ANN family
    "doc_vector_hash" -> ((s, d) => TextAnalysis.hashedTfCounts(Tables.documents(s, d))),
    // lexical ANN: cosine top-k over the hashed-TF vectors (integer-exact
    // cross-engine cosine — see lexicalAnn's scaladoc)
    "doc_lexical_ann" -> ((s, d) => TextAnalysis.lexicalAnn(Tables.documents(s, d))),
    // the INDEXED form: hashed-TF vectors persisted through the cell-
    // partitioned PQ layout, searched via the partition-pruned codes-only
    // ADC path — the end-to-end 100 TB text-ANN composition (oracle
    // inlines the doclex slot's quantizer + codebooks post-run)
    // k-means topic clusters over the hashed-TF vectors, each cluster
    // summarized by size + top distinctive tokens
    "doc_topic_clusters" -> ((s, d) =>
      TextAnalysis.docTopicClusters(Tables.documents(s, d))),
    "doc_lexical_ann_pq" -> ((s, d) =>
      TextAnalysis.lexicalAnnPq(Tables.documents(s, d), lexPqIndexPath(d))),
    // snapshot-versioning audit: per-source added/removed/changed/unchanged
    // between two simulated corpus snapshots (old = id%3!=0; new = id%5!=0
    // with id%7==0 docs content-bumped)
    "corpus_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.corpusDiff(
        docs.filter("doc_id % 3 != 0"),
        docs.filter("doc_id % 5 != 0").withColumn("text",
          org.apache.spark.sql.functions.expr(
            "CASE WHEN doc_id % 7 = 0 THEN concat(text, ' v2') ELSE text END")))
    }),
    // fixed-token-window chunking with stride — the doc → context-window
    // training-row transform; emits chunk fingerprints for chunk-level dedup
    "chunk_documents" -> ((s, d) => TextAnalysis.chunkDocuments(Tables.documents(s, d))),
    // the composition those fingerprints exist for: context windows
    // recycled across documents (chunk-level exact dedup)
    "dedup_chunks" -> ((s, d) => TextAnalysis.chunkDedup(Tables.documents(s, d))),
    "pack_shards" -> ((s, d) => TextAnalysis.packShards(Tables.documents(s, d))),
    // deterministic hash-keyed training-order shuffle (epoch-salted)
    "train_order_shuffle" -> ((s, d) => TextAnalysis.trainOrderShuffle(Tables.documents(s, d))),
    // padding waste: shuffle-order vs length-bucketed batch assembly
    "batch_padding_stats" -> ((s, d) => TextAnalysis.batchPaddingStats(Tables.documents(s, d))),
    "dedup_rate_by_source" -> ((s, d) => TextAnalysis.dedupRateBySource(Tables.documents(s, d))),
    // integer-bits KL(source || corpus) over smoothed unigram models —
    // the domain-drift / mixture-skew monitor
    "token_distribution_shift" -> ((s, d) =>
      TextAnalysis.tokenDistributionShift(Tables.documents(s, d))),
    "corpus_curated" -> ((s, d) => TextAnalysis.curatedCorpus(Tables.documents(s, d))),
    // per-(source, first-failing-gate) attribution with ppm shares —
    // which gate started eating a source's admit rate
    "curation_kill_reasons" -> ((s, d) =>
      TextAnalysis.curationKillReasons(Tables.documents(s, d))),
    "text_repetition" -> ((s, d) => TextAnalysis.repetitionSignals(Tables.documents(s, d))),
    "text_token_rarity" -> ((s, d) => TextAnalysis.tokenRarity(Tables.documents(s, d))),
    // LM-gate deployable form: odd docs scored against the even docs'
    // reference frequency model (orderBy is this query's oracle-hash
    // determinism — the operator is unordered)
    "token_rarity_against" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.tokenRarityAgainst(
        docs.filter("doc_id % 2 = 1"),
        TextAnalysis.tokenFreqs(docs.filter("doc_id % 2 = 0")))
        .orderBy("doc_id")
    }),
    // bigram-LM fluency filter (integer floor-log2 surprisal), self-scored
    "lm_bigram_surprisal" -> ((s, d) => TextAnalysis.bigramSurprisal(Tables.documents(s, d))),
    // CCNet-style per-source head/middle/tail perplexity terciles
    "perplexity_buckets" -> ((s, d) => TextAnalysis.perplexityBuckets(Tables.documents(s, d))),
    // deployable perplexity gate: odd docs scored under the even docs'
    // bigram LM (orderBy = oracle-hash determinism, operator unordered)
    "lm_surprisal_against" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.bigramSurprisalAgainst(
        docs.filter("doc_id % 2 = 1"), docs.filter("doc_id % 2 = 0"))
        .orderBy("doc_id")
    }),
    // DSIR importance weights: whole pool weighted by base-vs-target
    // surprisal difference (target domain = src0, base = the raw pool)
    "dsir_weights" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      TextAnalysis.dsirWeights(docs, docs.filter("source = 'src0'"), docs)
        .orderBy("doc_id")
    }),
    // deterministic greedy form of DSIR's resampling step: top-100 by
    // importance weight (tie-break doc_id — no lottery at the boundary)
    "dsir_sample" -> ((s, d) => {
      import org.apache.spark.sql.functions.col
      val docs = Tables.documents(s, d)
      TextAnalysis.dsirWeights(docs, docs.filter("source = 'src0'"), docs)
        .orderBy(col("dsir_milli").desc, col("doc_id"))
        .select(col("doc_id"), col("dsir_milli"))
        .limit(100)
    }),
    // per-source calibrated quality gate (top-25% within each source)
    "quality_calibrated" -> ((s, d) => TextAnalysis.qualityCalibrated(Tables.documents(s, d))),
    // Heaps-law vocabulary growth curve at 50-doc bucket granularity
    "vocab_growth" -> ((s, d) => TextAnalysis.vocabGrowth(Tables.documents(s, d))),
    "tokenizer_fertility" -> ((s, d) => TextAnalysis.tokenizerFertility(Tables.documents(s, d))),
    "pii_scrub_stats" -> ((s, d) =>
      TextAnalysis.piiScrubStats(Tables.documents(s, d), Tables.events(s, d))),
    "distinctive_terms" -> ((s, d) => TextAnalysis.distinctiveTerms(Tables.documents(s, d))),
    "length_outlier_stats" -> ((s, d) => TextAnalysis.lengthOutlierStats(Tables.documents(s, d))),
    // integer-BM25 retrieval: the corpus-inspection / decontamination
    // lookup side of the pipeline
    "bm25_search" -> ((s, d) => Search.bm25TopK(Tables.documents(s, d))),
    // the PERSISTED-index path end-to-end: build the postings/totals
    // tables, search via bucket-pruned term lookup — hash-gated against
    // the same from-scratch oracle (result identity by construction)
    "bm25_search_indexed" -> ((s, d) => {
      Search.dropSearchIndex(s, "srchq")
      Search.saveSearchIndex(Tables.documents(s, d), "srchq")
      Search.bm25Indexed(s, "srchq")
    }),
    // right-to-be-forgotten across ALL THREE index families in one verb;
    // the contract oracle catches both under- and over-deletion
    "forget_cascade" -> ((s, d) =>
      graft.operators.Lifecycle.forgetCascadeReport(s, d)),
    // the TAKEDOWN gate: index the full corpus, remove every 3rd doc,
    // search — hash-gated against fresh BM25 over the remaining corpus
    "bm25_after_remove" -> ((s, d) => {
      Search.dropSearchIndex(s, "srchr")
      Search.saveSearchIndex(Tables.documents(s, d), "srchr")
      Search.removeFromSearchIndex(s, "srchr",
        Tables.documents(s, d).filter("doc_id % 3 = 0"))
      Search.bm25Indexed(s, "srchr")
    }),
    // ---- multimodal plumbing ----
    "media_bytes_stats" -> ((s, d) => Multimodal.bytesStats(Tables.documents(s, d))),
    // banded perceptual-hash near-dup pairs over media payloads; the
    // corpus is unioned with a deterministic RE-CRAWL slice (same
    // payload, new id — the situation payload dedup exists for, and the
    // synthetic corpus ships no byte-identical payloads of its own)
    "media_phash_dedup" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, lit}
      val docs = Tables.documents(s, d)
      val recrawl = docs.filter(col("doc_id") % 97 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
      Multimodal.phashDedup(docs.unionByName(recrawl))
    }),
    "media_frame_sample" -> ((s, d) => Multimodal.frameSample(Tables.documents(s, d))),
    "image_meta_stub" -> ((s, d) => Multimodal.imageMeta(s, Tables.documents(s, d))),
    // multimodal → ANN composition: stub-extracted per-payload features
    // feed the similarity operator unchanged
    "media_feature_ann" -> ((s, d) =>
      Similarity.bruteForceTopK(
        Multimodal.featureExtract(s, Tables.documents(s, d))
          .selectExpr("doc_id AS vec_id", "features AS embedding"),
        nQueries = 3, k = 5)),
  )

  // ---- generated oracle-SQL fragments (kept in Scala so the SQL mirrors
  // the Spark column expressions term for term) ----

  /** Normalized text → distinct word-3-gram shingles with per-doc counts,
    * as DuckDB CTEs (mirrors Dedup.shingles). */
  private val ShingleCte =
    """norm AS (SELECT doc_id, source, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
      |tk AS (SELECT doc_id, source, string_split(t, ' ') AS toks FROM norm),
      |shl AS (SELECT doc_id, source, CASE WHEN len(toks) >= 3
      |    THEN list_distinct(list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' ')))
      |    ELSE []::VARCHAR[] END AS gs FROM tk),
      |ex AS (SELECT doc_id, source, len(gs) AS n_g, unnest(gs) AS g FROM shl)""".stripMargin

  private def minhashOracle: String = {
    val sigCols = (0 until Dedup.MinhashSeeds)
      .map(i => s"min(md5('$i:' || g)) AS h$i").mkString(", ")
    val bandKeys = (0 until Dedup.MinhashBands)
      .map(b => s"md5(h${2 * b} || h${2 * b + 1})").mkString("[", ", ", "]")
    val bandIdxs = (0 until Dedup.MinhashBands).mkString("[", ", ", "]")
    s"""WITH $ShingleCte,
       |sig AS (SELECT doc_id, $sigCols FROM ex GROUP BY doc_id),
       |bands AS (SELECT doc_id, unnest($bandKeys) AS band_key, unnest($bandIdxs) AS band_idx FROM sig),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a
       |  JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
       |shr AS (SELECT doc_a, doc_b, ta.n_g AS na, tb.n_g AS nb, count(*) AS shared FROM cand
       |  JOIN ex ta ON doc_a = ta.doc_id JOIN ex tb ON doc_b = tb.doc_id AND ta.g = tb.g
       |  GROUP BY 1, 2, 3, 4)
       |SELECT doc_a, doc_b FROM shr
       |WHERE shared * 3 >= na + nb ORDER BY 1, 2""".stripMargin
  }

  /** Mirrors Dedup.incrementalDedup with the query's parity split: exact
    * fingerprint anti-join, then new-side × existing-side band collisions
    * verified at Jaccard >= 1/2. Band keys are computed over the shared
    * shingle CTE and restricted by side — identical to per-side band
    * tables because every key is per-doc. */
  private def incrementalDedupOracle: String =
    incrementalDedupOracleOver("", "documents")

  /** The incremental-dedup oracle core over an arbitrary corpus
    * relation `docsRel(doc_id, source, text)` (optionally defined by a
    * leading `docsCte`): odd doc_ids are the new batch, even doc_ids the
    * existing corpus — exact fingerprint anti-join, then new-side ×
    * existing-side band collisions verified at Jaccard >= 1/2. Band keys
    * are computed over the shared shingle CTE and restricted by side —
    * identical to per-side band tables because every key is per-doc. */
  private def incrementalDedupOracleOver(docsCte: String, docsRel: String): String = {
    val sigCols = (0 until Dedup.MinhashSeeds)
      .map(i => s"min(md5('$i:' || g)) AS h$i").mkString(", ")
    val bandKeys = (0 until Dedup.MinhashBands)
      .map(b => s"md5(h${2 * b} || h${2 * b + 1})").mkString("[", ", ", "]")
    val bandIdxs = (0 until Dedup.MinhashBands).mkString("[", ", ", "]")
    val lead = if (docsCte.isEmpty) "" else docsCte + ",\n"
    s"""WITH $lead${ShingleCte.replace("FROM documents", s"FROM $docsRel")},
       |fp AS (SELECT doc_id, md5(t) AS fp FROM norm),
       |newok AS (SELECT doc_id FROM fp WHERE doc_id % 2 = 1
       |  AND fp NOT IN (SELECT fp FROM fp WHERE doc_id % 2 = 0)),
       |sig AS (SELECT doc_id, $sigCols FROM ex GROUP BY doc_id),
       |bands AS (SELECT doc_id, unnest($bandKeys) AS band_key, unnest($bandIdxs) AS band_idx FROM sig),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       |  WHERE a.doc_id IN (SELECT doc_id FROM newok) AND b.doc_id % 2 = 0),
       |shr AS (SELECT doc_a, doc_b, ta.n_g AS na, tb.n_g AS nb, count(*) AS shared FROM cand
       |  JOIN ex ta ON doc_a = ta.doc_id JOIN ex tb ON doc_b = tb.doc_id AND ta.g = tb.g
       |  GROUP BY 1, 2, 3, 4),
       |neardup AS (SELECT DISTINCT doc_a FROM shr WHERE shared * 3 >= na + nb)
       |SELECT d.doc_id, d.source FROM $docsRel d
       |WHERE d.doc_id IN (SELECT doc_id FROM newok)
       |  AND d.doc_id NOT IN (SELECT doc_a FROM neardup)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Mirrors the incremental_dedup_after_diff registration: the
    * remaining corpus after the diff (removed evens gone, changed evens
    * re-fingerprinted under their new text) IS a corpus relation, and
    * the oracle runs the standard incremental logic over it — so the
    * persisted-index delta-merge path is checked end-to-end against
    * fresh-corpus semantics (the equivalence [[Dedup.applyCorpusDiff]]'s
    * spec pins, here enforced cross-engine per round). */
  private def incrementalDedupAfterDiffOracle: String = {
    val docs2 =
      """docs2 AS (SELECT doc_id, source,
        |    CASE WHEN doc_id % 2 = 0 AND doc_id % 10 = 4 THEN text || ' v2' ELSE text END AS text
        |  FROM documents WHERE NOT (doc_id % 2 = 0 AND doc_id % 6 = 0))""".stripMargin
    incrementalDedupOracleOver(docs2, "docs2")
  }

  private def benchmarkContaminationOracle: String =
    s"""WITH $ShingleCte,
       |ev AS (SELECT DISTINCT g, doc_id AS eval_id FROM ex WHERE doc_id < 5),
       |co AS (SELECT e.doc_id, ev.eval_id, CAST(count(*) AS BIGINT) AS shared
       |  FROM ex e JOIN ev ON e.g = ev.g AND e.doc_id >= 5 GROUP BY 1, 2)
       |SELECT doc_id, eval_id, shared FROM co WHERE shared >= 2 ORDER BY doc_id, eval_id""".stripMargin

  private def mixtureWeightsOracle: String =
    """WITH s AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
      |t AS (SELECT sum(n) AS total, count(*) AS n_sources FROM s)
      |SELECT source, CAST(n AS BIGINT) AS n_docs,
      |  CAST((n * 1000000) // total AS BIGINT) AS actual_ppm,
      |  CAST((total * 1000) // (n_sources * n) AS BIGINT) AS weight_milli
      |FROM s, t ORDER BY source""".stripMargin

  /** Two add-1-smoothed integer bigram LMs (target = src0, base = the
    * whole pool) scored in one pass, mirroring TextAnalysis.dsirCore —
    * the t-/b-prefixed CTE pairs are the lm_surprisal_against oracle's
    * chain instantiated twice over different subsets. Non-interpolated
    * string: regex backslashes stay single. */
  private val DsirCte =
    """norm AS (SELECT doc_id, source, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
      |tl AS (SELECT doc_id, source, string_split(t, ' ') AS l FROM norm),
      |bgq AS (SELECT doc_id, source, unnest(list_transform(generate_series(1, len(l) - 1),
      |    i -> l[i] || ' ' || l[i + 1])) AS bg FROM tl WHERE len(l) >= 2),
      |tc2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bgq WHERE source = 'src0' GROUP BY 1),
      |tc1 AS (SELECT string_split(bg, ' ')[1] AS prev, CAST(sum(c2) AS BIGINT) AS c1 FROM tc2 GROUP BY 1),
      |tvt AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      |  FROM (SELECT unnest(string_split(t, ' ')) AS tok FROM norm WHERE source = 'src0') WHERE len(tok) > 0),
      |tlm AS (SELECT bg, CAST(length(bin((c1 + v) // (c2 + 1))) - 1 AS BIGINT) AS bits
      |  FROM tc2 JOIN tc1 ON string_split(tc2.bg, ' ')[1] = tc1.prev, tvt),
      |tlmp AS (SELECT prev, CAST(length(bin(c1 + v)) - 1 AS BIGINT) AS miss_bits FROM tc1, tvt),
      |bc2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bgq GROUP BY 1),
      |bc1 AS (SELECT string_split(bg, ' ')[1] AS prev, CAST(sum(c2) AS BIGINT) AS c1 FROM bc2 GROUP BY 1),
      |bvt AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      |  FROM (SELECT unnest(string_split(t, ' ')) AS tok FROM norm) WHERE len(tok) > 0),
      |blm AS (SELECT bg, CAST(length(bin((c1 + v) // (c2 + 1))) - 1 AS BIGINT) AS bits
      |  FROM bc2 JOIN bc1 ON string_split(bc2.bg, ' ')[1] = bc1.prev, bvt),
      |blmp AS (SELECT prev, CAST(length(bin(c1 + v)) - 1 AS BIGINT) AS miss_bits FROM bc1, bvt),
      |dbg AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS prev FROM bgq),
      |dsc AS (SELECT doc_id,
      |    COALESCE(tlm.bits, tlmp.miss_bits, (SELECT CAST(length(bin(v)) - 1 AS BIGINT) FROM tvt)) AS st,
      |    COALESCE(blm.bits, blmp.miss_bits, (SELECT CAST(length(bin(v)) - 1 AS BIGINT) FROM bvt)) AS sb
      |  FROM dbg LEFT JOIN tlm ON dbg.bg = tlm.bg LEFT JOIN tlmp ON dbg.prev = tlmp.prev
      |    LEFT JOIN blm ON dbg.bg = blm.bg LEFT JOIN blmp ON dbg.prev = blmp.prev),
      |dw AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    CAST(sum(st) AS BIGINT) AS target_bits,
      |    CAST(sum(sb) AS BIGINT) AS base_bits,
      |    CAST(((sum(sb) - sum(st)) * 1000) // count(*) AS BIGINT) AS dsir_milli
      |  FROM dsc GROUP BY 1)""".stripMargin

  private def topRepeatedShinglesOracle: String =
    s"""WITH $ShingleCte
       |SELECT g AS shingle, CAST(count(*) AS BIGINT) AS df FROM ex
       |GROUP BY 1 HAVING count(*) > 1 ORDER BY df DESC, shingle LIMIT 20""".stripMargin

  private def minhashBandStatsOracle: String = {
    val sigCols = (0 until Dedup.MinhashSeeds)
      .map(i => s"min(md5('$i:' || g)) AS h$i").mkString(", ")
    val bandKeys = (0 until Dedup.MinhashBands)
      .map(b => s"md5(h${2 * b} || h${2 * b + 1})").mkString("[", ", ", "]")
    val bandIdxs = (0 until Dedup.MinhashBands).mkString("[", ", ", "]")
    s"""WITH $ShingleCte,
       |sig AS (SELECT doc_id, $sigCols FROM ex GROUP BY doc_id),
       |bands AS (SELECT doc_id, unnest($bandKeys) AS band_key, unnest($bandIdxs) AS band_idx FROM sig)
       |SELECT CAST(band_idx AS BIGINT) AS band_idx, band_key, CAST(count(*) AS BIGINT) AS n_docs
       |FROM bands GROUP BY 1, 2 HAVING count(*) > 1
       |ORDER BY n_docs DESC, band_idx, band_key LIMIT 20""".stripMargin
  }

  /** tm→votes→sig→bands CTE chain mirroring Dedup.simhashSignatures +
    * simhashBandTable bit-for-bit: 64-bit signature (two vote bits per md5
    * nibble), bit 63 entering as the signed two's-complement constant
    * (DuckDB rejects 1::BIGINT << 63 as overflow; Long.MinValue is the
    * same bit pattern), 4 × 16-bit pigeonhole bands extracted by
    * arithmetic shift + mask (sign-safe in both engines). Ascending-j
    * addition keeps every partial sum inside BIGINT range. Appended after
    * ShingleCte. */
  private def simhashBandsCte: String = {
    val votes = (0 until Dedup.SimhashBits).map { j =>
      s"sum(CASE WHEN (((strpos('0123456789abcdef', substr(m, ${(j >> 1) + 1}, 1)) - 1) >> ${j & 1}) & 1) = 1 THEN 1 ELSE -1 END) AS s$j"
    }.mkString(", ")
    val sig = (0 until Dedup.SimhashBits).map { j =>
      if (j == Dedup.SimhashBits - 1)
        s"(CASE WHEN s$j >= 0 THEN (-9223372036854775807 - 1)::BIGINT ELSE 0::BIGINT END)"
      else s"(CASE WHEN s$j >= 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END)"
    }.mkString(" + ")
    val mask = (1L << Dedup.SimhashBandBits) - 1
    val bandKeys = (0 until Dedup.SimhashBands)
      .map(b => s"(simhash >> ${Dedup.SimhashBandBits * b}) & $mask").mkString("[", ", ", "]")
    val bandIdxs = (0 until Dedup.SimhashBands).mkString("[", ", ", "]")
    s"""tm AS (SELECT doc_id, md5(g) AS m FROM ex),
       |votes AS (SELECT doc_id, $votes FROM tm GROUP BY doc_id),
       |sig AS (SELECT doc_id, $sig AS simhash FROM votes),
       |bands AS (SELECT doc_id, simhash, unnest($bandKeys) AS band_key, unnest($bandIdxs) AS band_idx FROM sig)""".stripMargin
  }

  private def simhashOracle: String =
    s"""WITH $ShingleCte,
       |$simhashBandsCte,
       |keep AS (SELECT band_idx, band_key FROM bands GROUP BY 1, 2 HAVING count(*) <= ${Dedup.SimhashMaxBucket}),
       |kept AS (SELECT b.* FROM bands b JOIN keep k USING (band_idx, band_key)),
       |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
       |  FROM kept a JOIN kept b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, hamming FROM pairs WHERE hamming <= 3 ORDER BY 1, 2""".stripMargin

  private def simhashBandStatsOracle: String =
    s"""WITH $ShingleCte,
       |$simhashBandsCte
       |SELECT CAST(band_idx AS BIGINT) AS band_idx, CAST(band_key AS BIGINT) AS band_key,
       |  CAST(count(*) AS BIGINT) AS n_docs
       |FROM bands GROUP BY 1, 2 HAVING count(*) > 1
       |ORDER BY n_docs DESC, band_idx, band_key LIMIT 20""".stripMargin

  /** Connected components over the MinHash pair graph via a recursive
    * CTE: every node starts as its own label, labels flood along edges,
    * min per node = smallest doc_id in the component (the cluster rep).
    * Mirrors Dedup.dedupClusters' min-label-propagation fixpoint. */
  private def dedupClustersOracle: String =
    s"""WITH RECURSIVE pairs AS ($minhashOracle),
       |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(doc_id, lbl) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.doc_id)
       |SELECT doc_id, CAST(min(lbl) AS BIGINT) AS cluster_rep
       |FROM reach GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Mirrors TextAnalysis.leakageSafeSplit: the recursive-CTE components
    * give each doc its cluster rep; the split bucket is the same salted
    * 4-nibble md5 arithmetic as the trainTestSplit oracle, keyed by
    * coalesce(rep, doc_id). */
  private def leakageSafeSplitOracle: String = {
    def nib(m: String, i: Int) = s"(strpos('0123456789abcdef', substr($m, $i, 1)) - 1)"
    def hb(m: String) = s"(${nib(m, 1)}*4096 + ${nib(m, 2)}*256 + ${nib(m, 3)}*16 + ${nib(m, 4)}) % 100"
    s"""WITH RECURSIVE pairs AS ($minhashOracle),
       |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(rdoc, lbl) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.rdoc),
       |mem AS (SELECT rdoc AS doc_id, min(lbl) AS rep FROM reach GROUP BY rdoc),
       |k AS (SELECT d.doc_id, d.source, d.text, m.rep,
       |        coalesce(m.rep, d.doc_id) AS skey
       |      FROM documents d LEFT JOIN mem m ON d.doc_id = m.doc_id),
       |h AS (SELECT source, text, rep,
       |        md5('split:' || CAST(skey AS VARCHAR)) AS mh,
       |        md5('split:' || CAST(doc_id AS VARCHAR)) AS mn FROM k),
       |b AS (SELECT source, text, rep, ${hb("mh")} AS hb, ${hb("mn")} AS nb FROM h),
       |a AS (SELECT source, text, rep,
       |        CASE WHEN hb < ${TextAnalysis.TestPct} THEN 'test'
       |             WHEN hb < ${TextAnalysis.TestPct + TextAnalysis.ValidPct} THEN 'valid'
       |             ELSE 'train' END AS split,
       |        CASE WHEN nb < ${TextAnalysis.TestPct} THEN 'test'
       |             WHEN nb < ${TextAnalysis.TestPct + TextAnalysis.ValidPct} THEN 'valid'
       |             ELSE 'train' END AS naive_split FROM b)
       |SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens,
       |  CAST(sum(CASE WHEN rep IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_clustered,
       |  CAST(sum(CASE WHEN rep IS NOT NULL AND split != naive_split THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
       |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Mirrors Dedup.keepBestPerCluster: components → per-family
    * quality-ranked row_number (same rounded-double quality expression
    * as the curation oracle, ties by doc_id). */
  private def dedupKeepBestOracle: String =
    s"""WITH RECURSIVE pairs AS ($minhashOracle),
       |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(rdoc, lbl) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.rdoc),
       |mem AS (SELECT rdoc AS doc_id, min(lbl) AS rep FROM reach GROUP BY rdoc),
       |sc AS (SELECT m.rep AS cluster_rep, d.doc_id, $QualityScoreSql AS q
       |       FROM mem m JOIN documents d ON m.doc_id = d.doc_id),
       |rw AS (SELECT cluster_rep, doc_id, q,
       |        row_number() OVER (PARTITION BY cluster_rep ORDER BY q DESC, doc_id) AS rk,
       |        count(*) OVER (PARTITION BY cluster_rep) AS nm FROM sc)
       |SELECT CAST(cluster_rep AS BIGINT) AS cluster_rep,
       |  CAST(doc_id AS BIGINT) AS kept_doc, q AS kept_quality,
       |  CAST(nm AS BIGINT) AS n_members
       |FROM rw WHERE rk = 1 ORDER BY cluster_rep""".stripMargin

  private def ngramJaccardOracle: String =
    s"""WITH $ShingleCte,
       |shr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_g AS na, b.n_g AS nb, count(*) AS shared
       |  FROM ex a JOIN ex b ON a.source = b.source AND a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2, 3, 4)
       |SELECT doc_a, doc_b, (shared * 100) // (na + nb - shared) AS jaccard_pct
       |FROM shr WHERE shared * 2 >= na + nb - shared ORDER BY 1, 2""".stripMargin

  /** Integer-lattice PageRank replica: p1..pN chained CTEs, one per
    * superstep — same floor-division transfer and damped re-base as
    * [[graft.operators.Graph.pagerank]]. */
  private def pagerankOracle(iters: Int = 5): String = {
    val steps = (1 to iters).map { i =>
      s"""p$i AS (SELECT dst AS node,
         |    CAST(150000 + (85 * CAST(sum(pr // outdeg) AS BIGINT)) // 100 AS BIGINT) AS pr
         |  FROM ed JOIN p${i - 1} ON ed.src = p${i - 1}.node GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH e0 AS (SELECT DISTINCT o_custkey * 2 AS c, l_suppkey * 2 + 1 AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS (SELECT c AS src, s AS dst FROM e0 UNION ALL SELECT s, c FROM e0),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1),
       |ed AS (SELECT e.src, e.dst, outdeg FROM e JOIN deg ON e.src = deg.src),
       |p0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS pr FROM deg),
       |$steps
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |  CAST(node // 2 AS BIGINT) AS entity_id, CAST(pr AS BIGINT) AS pr_milli
       |FROM p$iters ORDER BY pr_milli DESC, kind, entity_id LIMIT 100""".stripMargin
  }

  /** Triangle-census replica: same lexicographic (degree, id)
    * orientation, wedge enumeration among out-edges, closure against
    * oriented edges. */
  private def triangleOracle: String =
    """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |e AS (SELECT a.l_partkey AS u, bb.l_partkey AS v
      |  FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey AND a.l_partkey < bb.l_partkey
      |  GROUP BY 1, 2 HAVING count(*) >= 2),
      |deg AS (SELECT x, CAST(count(*) AS BIGINT) AS d
      |  FROM (SELECT u AS x FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
      |o AS (SELECT CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v) THEN u ELSE v END AS s,
      |             CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v) THEN v ELSE u END AS t,
      |             CASE WHEN (du.d < dv.d) OR (du.d = dv.d AND u < v) THEN dv.d ELSE du.d END AS dt
      |  FROM e JOIN deg du ON u = du.x JOIN deg dv ON v = dv.x),
      |w AS (SELECT a.t AS wv, b.t AS ww FROM o a JOIN o b ON a.s = b.s
      |  AND ((a.dt < b.dt) OR (a.dt = b.dt AND a.t < b.t))),
      |tri AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles
      |  FROM w JOIN o ON wv = o.s AND ww = o.t),
      |sums AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes,
      |    CAST(coalesce(sum(d) // 2, 0) AS BIGINT) AS n_edges,
      |    CAST(coalesce(sum((d * (d - 1)) // 2), 0) AS BIGINT) AS n_wedges FROM deg)
      |SELECT n_nodes, n_edges, n_wedges, n_triangles,
      |  CAST((3 * n_triangles * 1000000) // greatest(n_wedges, 1) AS BIGINT) AS clustering_ppm
      |FROM sums CROSS JOIN tri""".stripMargin

  /** Label-propagation replica: same bidirectional ≥2-basket co-purchase
    * edges as the triangle oracle, `iters` unrolled synchronous rounds,
    * mode label with (count desc, label asc) tie-break, community census
    * at the horizon. */
  private def labelPropagationOracle(iters: Int = 4): String = {
    val steps = (1 to iters).map { i =>
      s"""c$i AS (SELECT e.dst AS dst, l.label AS label, CAST(count(*) AS BIGINT) AS c
         |  FROM e JOIN l${i - 1} l ON e.src = l.node GROUP BY 1, 2),
         |l$i AS (SELECT dst AS node, label FROM (
         |    SELECT dst, label, row_number() OVER (PARTITION BY dst ORDER BY c DESC, label) AS rn FROM c$i)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       |ue AS (SELECT a.l_partkey AS u, bb.l_partkey AS v
       |  FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey AND a.l_partkey < bb.l_partkey
       |  GROUP BY 1, 2 HAVING count(*) >= 2),
       |e AS (SELECT u AS src, v AS dst FROM ue UNION ALL SELECT v, u FROM ue),
       |l0 AS (SELECT DISTINCT src AS node, src AS label FROM e),
       |$steps
       |SELECT CAST(label AS BIGINT) AS community, CAST(count(*) AS BIGINT) AS n_nodes,
       |  CAST(min(node) AS BIGINT) AS min_node
       |FROM l$iters GROUP BY 1 ORDER BY n_nodes DESC, community LIMIT 50""".stripMargin
  }

  private def sparseCosineOracle: String =
    """WITH toks AS (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS tok FROM documents),
      |tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2),
      |dfreq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      |space AS (SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df
      |  FROM tf JOIN dfreq ON tf.tok = dfreq.tok WHERE df <= 500),
      |norms AS (SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS n2 FROM space GROUP BY 1),
      |idx AS (SELECT tok, doc_id, tf FROM space WHERE df >= 2),
      |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
      |  FROM idx a JOIN idx b ON a.tok = b.tok AND a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT doc_a, doc_b, dot, na.n2 AS na2, nb.n2 AS nb2,
      |  CAST((100 * dot * dot) // (na.n2 * nb.n2) AS BIGINT) AS cos2_pct
      |FROM pairs JOIN norms na ON doc_a = na.doc_id JOIN norms nb ON doc_b = nb.doc_id
      |WHERE 25 * dot * dot >= 16 * na.n2 * nb.n2
      |ORDER BY doc_a, doc_b""".stripMargin

  /** dot/norm fragments over 64-dim float lists, double-accumulated
    * left-to-right (matches VectorFunctions' fold order). */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(64), i -> $a.embedding[i+1]::DOUBLE * $b.embedding[i+1]::DOUBLE))"

  /** Mirrors Dedup.embeddingNearDup EXACTLY, banding included — the same
    * contract style as the minhash/simhash oracles (their bands CTEs
    * replicate the Spark banding too). Gating the banded operator against
    * an exact all-pairs oracle made the gate hinge on LSH recall — it
    * passed only because this corpus's boundary pairs happened to
    * band-collide; regenerated data could flap it. Band keys are pure
    * float sign arithmetic, bit-identical in both engines, so candidates
    * (and therefore results) now match deterministically on ANY corpus.
    * The recall claim is enforced separately by a measured property test
    * (DedupSpec "sign-LSH banding recall").
    *
    * Round-15: the geometry is scale-ADAPTIVE ([[Dedup.embGeometryFor]] —
    * the four-decade audit measured the fixed 12×5 keyspace quadratic at
    * sf1.0), so the oracle's bands CTE is a UNION of the ladder's
    * geometry branches, each gated by the same corpus count the operator
    * switches on: exactly one branch is non-empty for any corpus, and
    * both engines pick it from the identical integer. */
  /** Axis-aligned sign-band key: bit j of band b is the sign of raw
    * component b·bits+j — pure float sign arithmetic, bit-identical in
    * both engines. */
  private def embAxisBandKeySql(b: Int, bits: Int): String = (0 until bits)
    .map(j => s"(CASE WHEN embedding[${b * bits + j + 1}] >= 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END)")
    .mkString(" + ")

  /** Random-hyperplane sign-band key over the quantized lattice `qe`
    * (see [[Dedup.EmbQuantScale]]): bit j is the sign of
    * Σ_d ±qe[d], signs inlined from [[Dedup.embHyperSign]] — all-int64
    * arithmetic, exact and order-independent in both engines. */
  private def embHyperBandKeySql(b: Int, bits: Int): String = (0 until bits).map { j =>
    val terms = (0 until Dedup.EmbDim).map { d =>
      val s = if (Dedup.embHyperSign(b, j, d) > 0) "+" else "-"
      s"$s COALESCE(qe[${d + 1}], 0)"
    }.mkString(" ")
    s"(CASE WHEN ($terms) >= 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END)"
  }.mkString(" + ")

  /** The integer-lattice quantization both engines share: floor(x·1024)
    * per component — exact in IEEE double (power-of-two scale). */
  private def embQuantSql: String =
    s"list_transform(embedding, x -> CAST(FLOOR(x::DOUBLE * ${Dedup.EmbQuantScale}) AS BIGINT))"

  /** The shared LSH-pairs skeleton of the embedding-dedup oracles:
    * `branches` fills bands0 (one SELECT per geometry branch),
    * `threshold` the final cosine gate. */
  private def embPairsOracle(branches: String, threshold: Double): String =
    s"""WITH nz AS (SELECT *, $embQuantSql AS qe FROM embeddings
       |  WHERE ${dotSql("embeddings", "embeddings")} > 0),
       |ncnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings),
       |bands0 AS (
       |$branches
       |),
       |hot AS (SELECT band_idx, band_key FROM bands0
       |  GROUP BY 1, 2 HAVING count(*) > ${Dedup.EmbMaxBucket}),
       |bands AS (SELECT b.vec_id, b.band_key, b.band_idx FROM bands0 b
       |  WHERE NOT EXISTS (SELECT 1 FROM hot h
       |    WHERE h.band_idx = b.band_idx AND h.band_key = b.band_key)),
       |cand AS (SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b FROM bands a
       |  JOIN bands b ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.vec_id < b.vec_id),
       |p AS (SELECT vec_a, vec_b,
       |    ${dotSql("a", "b")} AS dp, ${dotSql("a", "a")} AS na, ${dotSql("b", "b")} AS nb
       |  FROM cand JOIN nz a ON vec_a = a.vec_id JOIN nz b ON vec_b = b.vec_id)
       |SELECT vec_a, vec_b, round(dp / sqrt(na * nb), 4) AS cos_sim
       |FROM p WHERE dp / sqrt(na * nb) >= $threshold ORDER BY 1, 2""".stripMargin

  private def embeddingNearDupOracle: String = {
    // (lo, hi, bands, bits, hyperplane) rungs — mirror embGeometryFor
    // exactly. The hyperplane rung's bits grow with the corpus
    // (embHyperBitsFor); the oracle inlines the two rungs reachable
    // below 102400 vectors — extending the committed decades past that
    // means appending the next (hi·2, bits+1) entry here.
    val ladder = Seq(
      (0L, 6400L, 12, 5, false), (6400L, 12800L, 10, 6, false),
      (12800L, 25600L, 9, 7, false),
      (25600L, 51200L, Dedup.EmbHyperBands, 8, true),
      (51200L, 102400L, Dedup.EmbHyperBands, 9, true))
    val branches = ladder.map { case (lo, hi, bands, bits, hyper) =>
      val keys = (0 until bands)
        .map(b => if (hyper) embHyperBandKeySql(b, bits) else embAxisBandKeySql(b, bits))
        .mkString("[", ", ", "]")
      val idxs = (0 until bands).mkString("[", ", ", "]")
      s"""SELECT vec_id, unnest($keys) AS band_key, unnest($idxs) AS band_idx
         |  FROM nz WHERE (SELECT n FROM ncnt) > $lo AND (SELECT n FROM ncnt) <= $hi""".stripMargin
    }.mkString("\n  UNION ALL\n")
    embPairsOracle(branches, 0.5)
  }

  /** Oracle for the PINNED hyperplane geometry (the fifth-rung key
    * family forced on the gated corpora): a single 12×8 hyperplane
    * branch, no count gating, same 0.5 boundary threshold as the
    * adaptive ladder. */
  private def embeddingHyperplaneOracle: String = {
    val bands = Dedup.EmbHyperBands
    val keys = (0 until bands).map(embHyperBandKeySql(_, 8)).mkString("[", ", ", "]")
    val idxs = (0 until bands).mkString("[", ", ", "]")
    val branch =
      s"""SELECT vec_id, unnest($keys) AS band_key, unnest($idxs) AS band_idx
         |  FROM nz""".stripMargin
    embPairsOracle(branch, 0.5)
  }

  /** Mirrors Search.bm25TopK step for step — same integer units
    * (idf_kilo / x_milli / denom_milli / part_ppm), same rational idf,
    * same tie-break — with the term list generated from the SAME
    * queryTerms() the operator uses, so query and oracle cannot drift. */
  private def bm25Oracle: String = bm25OracleOver("documents")

  /** BM25 oracle over an arbitrary corpus relation — the parameterized
    * form the takedown gate reuses (post-removal index ≡ fresh BM25 over
    * the remaining corpus). */
  private def bm25OracleOver(corpus: String): String = {
    val terms = Search.queryTerms(Search.DefaultQuery)
      .map(t => s"'$t'").mkString("[", ", ", "]")
    val k1 = Search.K1Milli; val b = Search.BMilli
    s"""WITH terms AS (SELECT unnest($terms) AS tok),
       |d AS (SELECT doc_id,
       |    regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nt,
       |    CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS dl
       |  FROM $corpus),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS sum_dl FROM d),
       |toks AS (SELECT doc_id, dl, unnest(string_split(nt, ' ')) AS tok FROM d),
       |m AS (SELECT t.* FROM toks t JOIN terms USING (tok) WHERE length(t.tok) > 0),
       |tf AS (SELECT doc_id, tok, dl, CAST(count(*) AS BIGINT) AS tf FROM m GROUP BY 1, 2, 3),
       |dfx AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
       |sc AS (SELECT doc_id,
       |    ((n_docs - df + 1) * 1000) // (df + 1) AS idf_kilo,
       |    (tf * ${k1 + 1000L} * 1000000) // (tf * 1000 +
       |      ($k1 * (1000 - $b + ($b * ((dl * 1000000) // ((sum_dl * 1000) // n_docs))) // 1000)) // 1000) AS part_ppm
       |  FROM tf JOIN dfx USING (tok) CROSS JOIN stats)
       |SELECT doc_id, CAST(sum((idf_kilo * part_ppm) // 1000) AS BIGINT) AS score_ppm,
       |  CAST(count(*) AS BIGINT) AS n_terms
       |FROM sc GROUP BY 1 ORDER BY score_ppm DESC, doc_id LIMIT ${Search.DefaultK}""".stripMargin
  }

  private def annBruteForceOracle: String =
    s"""WITH s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ${dotSql("a", "b")} AS dp, ${dotSql("a", "a")} AS nq, ${dotSql("b", "b")} AS nn
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND a.vec_id != b.vec_id),
       |r AS (SELECT query_id, neighbor_id, dp / sqrt(nq * nn) AS cs,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dp / sqrt(nq * nn) DESC, neighbor_id) AS rank
       |  FROM s)
       |SELECT query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
       |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

  private val BucketSql: String = (0 until 8)
    .map(j => s"(CASE WHEN embedding[${j + 1}] >= 0 THEN (1::BIGINT << $j) ELSE 0::BIGINT END)")
    .mkString(" + ")

  private def annLshOracle: String =
    s"""WITH bkt AS (SELECT vec_id, embedding, $BucketSql AS bucket FROM embeddings),
       |s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ${dotSql("a", "b")} AS dp, ${dotSql("a", "a")} AS nq, ${dotSql("b", "b")} AS nn
       |  FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < 5 AND a.vec_id != b.vec_id),
       |r AS (SELECT query_id, neighbor_id, dp / sqrt(nq * nn) AS cs,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dp / sqrt(nq * nn) DESC, neighbor_id) AS rank
       |  FROM s)
       |SELECT query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
       |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  private def annLshMultiProbeOracle: String = {
    val probes = (Seq(0) ++ (0 until 8).map(1 << _))
      .map(m => s"xor(bucket, $m)").mkString("[", ", ", "]")
    s"""WITH bkt AS (SELECT vec_id, embedding, $BucketSql AS bucket FROM embeddings),
       |probes AS (SELECT vec_id AS query_id, embedding AS qe, unnest($probes) AS pb
       |  FROM bkt WHERE vec_id < 5),
       |s AS (SELECT p.query_id, b.vec_id AS neighbor_id,
       |    list_sum(list_transform(range(64), i -> p.qe[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)) AS dp,
       |    list_sum(list_transform(range(64), i -> p.qe[i+1]::DOUBLE * p.qe[i+1]::DOUBLE)) AS nq,
       |    list_sum(list_transform(range(64), i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)) AS nn
       |  FROM probes p JOIN bkt b ON b.bucket = p.pb AND b.vec_id != p.query_id),
       |r AS (SELECT query_id, neighbor_id, dp / sqrt(nq * nn) AS cs,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dp / sqrt(nq * nn) DESC, neighbor_id) AS rank
       |  FROM s)
       |SELECT query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
       |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
  }

  /** md5-bucket stratified sample: 4 leading hex nibbles → value mod 100
    * (mirrors conv(substr(md5,1,4),16,10) % 100). */
  /** 16-bit md5-prefix Bernoulli(1/16) membership flag, DuckDB-side:
    * same salted key and nibble arithmetic as `Approx.inSample`. */
  private def aqpSampleFlag: String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
    s"CASE WHEN ${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)} < 4096 THEN 1 ELSE 0 END"
  }

  private def aqpRevenueOracle: String =
    s"""WITH h AS (SELECT CAST(round(o_totalprice) AS BIGINT) AS v,
       |    md5('aqp:' || CAST(o_orderkey AS VARCHAR)) AS m FROM orders),
       |b AS (SELECT v, $aqpSampleFlag AS s FROM h),
       |a AS (SELECT CAST(count(*) AS BIGINT) AS n_exact, CAST(sum(s) AS BIGINT) AS n_s,
       |    CAST(sum(v) AS BIGINT) AS rev_exact, CAST(sum(s*v) AS BIGINT) AS rev_s,
       |    CAST(sum(CAST(s AS HUGEINT)*v*v) AS HUGEINT) AS ssq_s FROM b)
       |SELECT n_exact, CAST(n_s*16 AS BIGINT) AS n_est,
       |  CAST(abs(n_s*16 - n_exact)*1000000 // n_exact AS BIGINT) AS n_err_ppm,
       |  CAST(CASE WHEN CAST(n_s*16 - n_exact AS HUGEINT)*CAST(n_s*16 - n_exact AS HUGEINT)
       |    <= 25*240*CAST(n_s AS HUGEINT)
       |    THEN 1 ELSE 0 END AS BIGINT) AS n_gate_ok,
       |  rev_exact AS rev_exact_dollars, CAST(rev_s*16 AS BIGINT) AS rev_est_dollars,
       |  CAST(abs(rev_s*16 - rev_exact)*1000000 // rev_exact AS BIGINT) AS rev_err_ppm,
       |  CAST(CASE WHEN CAST(rev_s*16 - rev_exact AS HUGEINT)*CAST(rev_s*16 - rev_exact AS HUGEINT)
       |    <= 25*240*ssq_s
       |    THEN 1 ELSE 0 END AS BIGINT) AS rev_gate_ok
       |FROM a""".stripMargin

  private def aqpSegmentOracle: String =
    s"""WITH j AS (SELECT c_mktsegment, CAST(round(o_totalprice) AS BIGINT) AS v,
       |    md5('aqp:' || CAST(o_orderkey AS VARCHAR)) AS m
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |b AS (SELECT c_mktsegment, v, $aqpSampleFlag AS s FROM j),
       |g AS (SELECT c_mktsegment, CAST(sum(v) AS BIGINT) AS rev_exact,
       |    CAST(sum(s*v) AS BIGINT) AS rev_s,
       |    CAST(sum(CAST(s AS HUGEINT)*v*v) AS HUGEINT) AS ssq_s,
       |    CAST(sum(s) AS BIGINT) AS n_s FROM b GROUP BY 1)
       |SELECT c_mktsegment, rev_exact AS rev_exact_dollars,
       |  CAST(rev_s*16 AS BIGINT) AS rev_est_dollars,
       |  CAST(abs(rev_s*16 - rev_exact)*1000000 // rev_exact AS BIGINT) AS rev_err_ppm,
       |  n_s AS n_sampled,
       |  CAST(CASE WHEN CAST(rev_s*16 - rev_exact AS HUGEINT)*CAST(rev_s*16 - rev_exact AS HUGEINT)
       |    <= 25*240*ssq_s
       |    THEN 1 ELSE 0 END AS BIGINT) AS rev_gate_ok
       |FROM g ORDER BY 1""".stripMargin

  /** Truncated-dot variant of [[dotSql]]: first `d` dimensions only. */
  private def dotSqlDims(a: String, b: String, d: Int): String =
    s"list_sum(list_transform(range($d), i -> $a.embedding[i+1]::DOUBLE * $b.embedding[i+1]::DOUBLE))"

  private def truncationRecallOracle: String =
    s"""WITH sf AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ${dotSql("a", "b")} AS dp, ${dotSql("a", "a")} AS nq, ${dotSql("b", "b")} AS nn
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND a.vec_id != b.vec_id),
       |tf AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dp / sqrt(nq * nn) DESC, neighbor_id) AS rank
       |  FROM sf) WHERE rank <= 10),
       |st AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ${dotSqlDims("a", "b", 16)} AS dp, ${dotSqlDims("a", "a", 16)} AS nq, ${dotSqlDims("b", "b", 16)} AS nn
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND a.vec_id != b.vec_id),
       |tt AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dp / sqrt(nq * nn) DESC, neighbor_id) AS rank
       |  FROM st) WHERE rank <= 10)
       |SELECT f.query_id,
       |  CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_10,
       |  CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000 // 10 AS BIGINT) AS recall_ppm
       |FROM tf f LEFT JOIN tt t ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  private def lshRecallOracle: String = {
    val probes = (Seq(0) ++ (0 until 8).map(1 << _))
      .map(m => s"xor(bucket, $m)").mkString("[", ", ", "]")
    s"""WITH sf AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ${dotSql("a", "b")} AS dp, ${dotSql("a", "a")} AS nq, ${dotSql("b", "b")} AS nn
       |  FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND a.vec_id != b.vec_id),
       |tf AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dp / sqrt(nq * nn) DESC, neighbor_id) AS rank
       |  FROM sf) WHERE rank <= 3),
       |bkt AS (SELECT vec_id, embedding, $BucketSql AS bucket FROM embeddings),
       |sl AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ${dotSql("a", "b")} AS dp, ${dotSql("a", "a")} AS nq, ${dotSql("b", "b")} AS nn
       |  FROM bkt a JOIN bkt b ON a.bucket = b.bucket AND a.vec_id < 5 AND a.vec_id != b.vec_id),
       |tl AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dp / sqrt(nq * nn) DESC, neighbor_id) AS rank
       |  FROM sl) WHERE rank <= 3),
       |pr AS (SELECT vec_id AS query_id, embedding AS qe, unnest($probes) AS pb
       |  FROM bkt WHERE vec_id < 5),
       |sm AS (SELECT p.query_id, b.vec_id AS neighbor_id,
       |    list_sum(list_transform(range(64), i -> p.qe[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)) AS dp,
       |    list_sum(list_transform(range(64), i -> p.qe[i+1]::DOUBLE * p.qe[i+1]::DOUBLE)) AS nq,
       |    list_sum(list_transform(range(64), i -> b.embedding[i+1]::DOUBLE * b.embedding[i+1]::DOUBLE)) AS nn
       |  FROM pr p JOIN bkt b ON b.bucket = p.pb AND b.vec_id != p.query_id),
       |tm AS (SELECT query_id, neighbor_id FROM (SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dp / sqrt(nq * nn) DESC, neighbor_id) AS rank
       |  FROM sm) WHERE rank <= 3),
       |sing AS (SELECT 'lsh_single' AS variant, f.query_id,
       |    CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_3,
       |    CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000 // 3 AS BIGINT) AS recall_ppm
       |  FROM tf f LEFT JOIN tl t ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
       |  GROUP BY 2),
       |mult AS (SELECT 'lsh_multiprobe' AS variant, f.query_id,
       |    CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits_at_3,
       |    CAST(sum(CASE WHEN t.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) * 1000000 // 3 AS BIGINT) AS recall_ppm
       |  FROM tf f LEFT JOIN tm t ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
       |  GROUP BY 2)
       |SELECT * FROM (SELECT * FROM sing UNION ALL SELECT * FROM mult)
       |ORDER BY variant, query_id""".stripMargin
  }

  private def targetEncodingOracle: String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
    s"""WITH j AS (SELECT c_mktsegment, CAST(round(o_totalprice*100) AS BIGINT) AS v,
       |    md5('fold:' || CAST(o_orderkey AS VARCHAR)) AS m
       |  FROM orders JOIN customer ON o_custkey = c_custkey),
       |r AS (SELECT c_mktsegment,
       |    CAST((${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)}) % 5 AS BIGINT) AS fold,
       |    v FROM j),
       |cf AS (SELECT c_mktsegment, fold, CAST(count(*) AS BIGINT) AS n_cf,
       |    CAST(sum(v) AS BIGINT) AS s_cf FROM r GROUP BY 1, 2),
       |c AS (SELECT c_mktsegment, CAST(sum(n_cf) AS BIGINT) AS n_c,
       |    CAST(sum(s_cf) AS BIGINT) AS s_c FROM cf GROUP BY 1)
       |SELECT cf.c_mktsegment, fold, n_cf AS n_rows,
       |  CAST(CASE WHEN n_c > n_cf THEN (s_c - s_cf) // (n_c - n_cf) END AS BIGINT) AS encoding_cents
       |FROM cf JOIN c ON cf.c_mktsegment = c.c_mktsegment
       |ORDER BY 1, 2""".stripMargin
  }

  private def lagCorrelationOracle: String =
    """WITH d AS (SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
      |    CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS c,
      |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS p
      |  FROM events GROUP BY 1),
      |l AS (SELECT CAST(unnest(range(-7, 8)) AS BIGINT) AS lag),
      |pairs AS (SELECT l.lag, a.c, b.p
      |  FROM l CROSS JOIN d a JOIN d b ON b.day = a.day + l.lag * 86400)
      |SELECT lag, CAST(count(*) AS BIGINT) AS n_days,
      |  CAST(count(*) * sum(c * p) - sum(c) * sum(p) AS BIGINT) AS cov_scaled
      |FROM pairs GROUP BY 1 ORDER BY 1""".stripMargin

  private def benfordOracle: String =
    """WITH v AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) AS v FROM orders
      |  WHERE round(o_totalprice*100) > 0),
      |d AS (SELECT CAST(substr(CAST(v AS VARCHAR), 1, 1) AS BIGINT) AS digit,
      |    CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
      |e AS (SELECT unnest([1,2,3,4,5,6,7,8,9]) AS digit,
      |    unnest([301029,176091,124938,96910,79181,66946,57991,51152,45757]) AS benford_ppm),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM d)
      |SELECT CAST(e.digit AS BIGINT) AS digit, CAST(coalesce(d.n, 0) AS BIGINT) AS n,
      |  CAST(coalesce(d.n, 0) * 1000000 // tot AS BIGINT) AS obs_ppm,
      |  CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
      |  CAST(abs(coalesce(d.n, 0) * 1000000 // tot - e.benford_ppm) AS BIGINT) AS gap_ppm
      |FROM e LEFT JOIN d ON e.digit = d.digit CROSS JOIN t ORDER BY digit""".stripMargin

  private def abSplitOracle: String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
    s"""WITH conv AS (SELECT user_id,
       |    max(CASE WHEN event_type = 'purchase' AND value > 150 THEN 1 ELSE 0 END) AS converted
       |  FROM events GROUP BY 1),
       |h AS (SELECT converted, md5('ab:' || CAST(user_id AS VARCHAR)) AS m FROM conv),
       |armd AS (SELECT converted,
       |    CASE WHEN (${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)}) % 2 = 0
       |      THEN 'A' ELSE 'B' END AS arm FROM h),
       |w AS (SELECT
       |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS na,
       |    CAST(sum(CASE WHEN arm = 'A' THEN converted ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nb,
       |    CAST(sum(CASE WHEN arm = 'B' THEN converted ELSE 0 END) AS BIGINT) AS cb FROM armd),
       |r AS (SELECT na AS n_a, ca AS conv_a,
       |    CAST(CASE WHEN na > 0 THEN ca*1000000 // na ELSE 0 END AS BIGINT) AS rate_a_ppm,
       |    nb AS n_b, cb AS conv_b,
       |    CAST(CASE WHEN nb > 0 THEN cb*1000000 // nb ELSE 0 END AS BIGINT) AS rate_b_ppm,
       |    CAST(abs(CASE WHEN na > 0 THEN ca*1000000 // na ELSE 0 END -
       |             CASE WHEN nb > 0 THEN cb*1000000 // nb ELSE 0 END) AS BIGINT) AS delta_ppm,
       |    CAST((ca+cb)*1000000 // (na+nb) AS BIGINT) AS pooled_ppm FROM w)
       |SELECT n_a, conv_a, rate_a_ppm, n_b, conv_b, rate_b_ppm, delta_ppm, pooled_ppm,
       |  CAST(CASE WHEN pooled_ppm > 0 AND pooled_ppm < 1000000 AND
       |    CAST(25 AS HUGEINT) * delta_ppm * delta_ppm * n_a * n_b >=
       |    CAST(96 AS HUGEINT) * pooled_ppm * (1000000 - pooled_ppm) * (n_a + n_b)
       |    THEN 1 ELSE 0 END AS BIGINT) AS significant
       |FROM r""".stripMargin
  }

  private def stratifiedSampleOracle: String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
    val rates = TextAnalysis.SampleRates
      .map { case (s, p) => s"WHEN '$s' THEN $p" }.mkString(" ")
    s"""WITH h AS (SELECT doc_id, source,
       |    md5(source || ':' || CAST(doc_id AS VARCHAR)) AS m FROM documents),
       |b AS (SELECT doc_id, source,
       |    (${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)}) % 100 AS hb FROM h)
       |SELECT doc_id, source, CAST(hb AS BIGINT) AS hash_bucket FROM b
       |WHERE hb < CASE source $rates ELSE ${TextAnalysis.SampleDefaultPct} END
       |ORDER BY doc_id""".stripMargin
  }

  /** 5 leading md5 hex nibbles → value mod 1e6 (mirrors
    * conv(substr(md5,1,5),16,10) % 1000000) — the ppm-precision
    * hash-threshold shared by the temperature and source-cap samplers. */
  private def hpPpm(m: String): String = s"${psVal(m)} % 1000000"

  /** 5 leading md5 hex nibbles → long in [0, 16^5) — mirrors
    * Relational.keyHash5 (conv(substr(md5,1,5),16,10)) for the
    * derived-partsupp family. */
  private def psVal(m: String): String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr($m, $i, 1)) - 1)"
    s"(${nib(1)}*65536 + ${nib(2)}*4096 + ${nib(3)}*256 + ${nib(4)}*16 + ${nib(5)})"
  }

  /** Shared oracle fragment reconstructing Relational.derivedPartsupp in
    * DuckDB: distinct (l_partkey, l_suppkey) decorated with the same
    * salted-md5 availqty/supplycost integers. */
  private def partsuppCte: String =
    s"""ps0 AS (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
       |  FROM lineitem),
       |psh AS (SELECT ps_partkey, ps_suppkey,
       |    md5('psa:' || CAST(ps_partkey AS VARCHAR) || ':' || CAST(ps_suppkey AS VARCHAR)) AS ma,
       |    md5('psc:' || CAST(ps_partkey AS VARCHAR) || ':' || CAST(ps_suppkey AS VARCHAR)) AS mc
       |  FROM ps0),
       |partsupp AS (SELECT ps_partkey, ps_suppkey,
       |    CAST(${psVal("ma")} % 10000 + 1 AS BIGINT) AS ps_availqty,
       |    CAST(${psVal("mc")} % 99901 + 100 AS BIGINT) AS ps_supplycost_cents
       |  FROM psh)""".stripMargin

  /** Mirrors TextAnalysis.temperatureSample: sqrt is correctly-rounded
    * IEEE in both engines, floored to milli before any sum, so every
    * share/rate step is the same integer arithmetic. */
  private def temperatureSampleOracle: String =
    s"""WITH d0 AS (SELECT doc_id, source FROM documents
       |      WHERE doc_id % (2 + CAST(substr(source, 4) AS INT) % 4) = 0),
       |stats AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM d0 GROUP BY 1),
       |w AS (SELECT source, n, CAST(floor(sqrt(n) * 1000) AS BIGINT) AS w_milli FROM stats),
       |t AS (SELECT CAST(sum(w_milli) AS BIGINT) AS w_total FROM w),
       |s AS (SELECT source, n, (w_milli * 1000000) // w_total AS share_ppm FROM w, t),
       |m AS (SELECT CAST(min((n * 1000000) // share_ppm) AS BIGINT) AS m_total
       |      FROM s WHERE share_ppm > 0),
       |r AS (SELECT source, CASE WHEN share_ppm = 0 THEN 0
       |        ELSE least(1000000, (((m_total * share_ppm) // 1000000) * 1000000) // n)
       |      END AS rate_ppm FROM s, m),
       |h AS (SELECT doc_id, source, rate_ppm,
       |        md5(source || ':' || CAST(doc_id AS VARCHAR)) AS m5
       |      FROM d0 JOIN r USING (source)),
       |b AS (SELECT doc_id, source, rate_ppm, ${hpPpm("m5")} AS hp FROM h)
       |SELECT doc_id, source, CAST(rate_ppm AS BIGINT) AS rate_ppm FROM b
       |WHERE hp < rate_ppm ORDER BY doc_id""".stripMargin

  /** Mirrors TextAnalysis.sourceCap: the same two phases — ppm
    * hash-threshold prefilter at SourceCapSafety·cap, then row_number
    * over (hp, doc_id) within source, rank ≤ cap. */
  private def sourceCapOracle: String = {
    val budget = TextAnalysis.SourceCapSafety.toLong * 10
    s"""WITH stats AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY 1),
       |r AS (SELECT source, least(1000000, ($budget * 1000000) // n) AS rate_ppm FROM stats),
       |h AS (SELECT doc_id, source, rate_ppm,
       |        md5(source || ':' || CAST(doc_id AS VARCHAR)) AS m5
       |      FROM documents JOIN r USING (source)),
       |b AS (SELECT doc_id, source, rate_ppm, ${hpPpm("m5")} AS hp FROM h),
       |f AS (SELECT doc_id, source, hp FROM b WHERE hp < rate_ppm),
       |k AS (SELECT doc_id, source, CAST(row_number() OVER (
       |        PARTITION BY source ORDER BY hp, doc_id) AS BIGINT) AS rk FROM f)
       |SELECT doc_id, source, rk FROM k WHERE rk <= 10 ORDER BY doc_id""".stripMargin
  }

  /** Mirrors TextAnalysis.splitAssign + trainTestSplit: same salted md5
    * bucket (first 4 hex nibbles % 100), same split thresholds, token
    * count as the \S+ regex both engines share. */
  private def trainTestSplitOracle: String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1)"
    s"""WITH h AS (SELECT source, text,
       |    md5('split:' || CAST(doc_id AS VARCHAR)) AS m FROM documents),
       |b AS (SELECT source, text,
       |    (${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)}) % 100 AS hb FROM h),
       |a AS (SELECT source, text,
       |    CASE WHEN hb < ${TextAnalysis.TestPct} THEN 'test'
       |         WHEN hb < ${TextAnalysis.TestPct + TextAnalysis.ValidPct} THEN 'valid'
       |         ELSE 'train' END AS split FROM b)
       |SELECT split, source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS total_tokens
       |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** Mirrors TextAnalysis.packShards: same block key, same running-offset
    * shard arithmetic (integer div), same doc_id ordering. */
  /** Mirrors TextAnalysis.batchPaddingStats, generated from the same
    * constants (batch 16, len bucket 32, block size): both ranking
    * partitions, batch ids, and the exact padded-token arithmetic. */
  private def batchPaddingStatsOracle: String = {
    val blk = TextAnalysis.PackBlockDocs
    s"""WITH t AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':epoch-0') AS sk,
       |    doc_id // $blk AS block_id,
       |    len(regexp_extract_all(text, '\\S+')) AS toks FROM documents),
       |n1 AS (SELECT substr(sk, 1, 2) AS bucket,
       |    CAST(row_number() OVER (PARTITION BY substr(sk, 1, 2)
       |                            ORDER BY sk, doc_id) AS BIGINT) AS pos, toks FROM t),
       |nb AS (SELECT bucket, (pos - 1) // 16 AS batch,
       |    count(*) AS n, max(toks) AS mx, CAST(sum(toks) AS BIGINT) AS tot
       |  FROM n1 GROUP BY 1, 2),
       |b1 AS (SELECT toks // 32 AS len_bucket, block_id,
       |    CAST(row_number() OVER (PARTITION BY toks // 32, block_id
       |                            ORDER BY doc_id) AS BIGINT) AS pos, toks FROM t),
       |bb AS (SELECT len_bucket, block_id, (pos - 1) // 16 AS batch,
       |    count(*) AS n, max(toks) AS mx, CAST(sum(toks) AS BIGINT) AS tot
       |  FROM b1 GROUP BY 1, 2, 3),
       |r AS (
       |  SELECT 'length_bucketed' AS strategy, CAST(sum(n) AS BIGINT) AS n_docs,
       |    CAST(count(*) AS BIGINT) AS n_batches, CAST(sum(tot) AS BIGINT) AS total_tokens,
       |    CAST(sum(n * mx - tot) AS BIGINT) AS padded_tokens FROM bb
       |  UNION ALL
       |  SELECT 'shuffle_order', CAST(sum(n) AS BIGINT), CAST(count(*) AS BIGINT),
       |    CAST(sum(tot) AS BIGINT), CAST(sum(n * mx - tot) AS BIGINT) FROM nb)
       |SELECT strategy, n_docs, n_batches, total_tokens, padded_tokens,
       |  CAST((padded_tokens * 1000000) // (total_tokens + padded_tokens) AS BIGINT) AS padding_ppm
       |FROM r ORDER BY strategy""".stripMargin
  }

  private def packShardsOracle: String =
    s"""WITH t AS (SELECT doc_id, source, doc_id // ${TextAnalysis.PackBlockDocs} AS block_id,
       |    len(regexp_extract_all(text, '\\S+')) AS toks FROM documents),
       |c AS (SELECT doc_id, source, block_id, toks,
       |    CAST(sum(toks) OVER (PARTITION BY source, block_id ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM t)
       |SELECT source, CAST(block_id AS BIGINT) AS block_id,
       |  CAST((cum - toks) // ${TextAnalysis.PackBudgetTokens} AS BIGINT) AS shard_id,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(toks) AS BIGINT) AS shard_tokens,
       |  CAST(min(doc_id) AS BIGINT) AS first_doc,
       |  CAST(max(doc_id) AS BIGINT) AS last_doc
       |FROM c GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Mirrors Relational.eventFunnel over FunnelSteps, generated from the
    * same step list: first-occurrence pivot, reached-step predicates
    * (presence + non-decreasing order), integer-ppm conversion. */
  private def eventFunnelOracle: String = {
    val steps = Relational.FunnelSteps
    val mins = steps.zipWithIndex.map { case (s, i) =>
      s"min(CASE WHEN event_type = '$s' THEN ts END) AS t$i" }.mkString(",\n    ")
    def reach(i: Int) =
      ((0 to i).map(j => s"t$j IS NOT NULL") ++ (1 to i).map(j => s"t${j - 1} <= t$j"))
        .mkString(" AND ")
    val rs = steps.indices.map(i =>
      s"CAST(coalesce(sum(CASE WHEN ${reach(i)} THEN 1 ELSE 0 END), 0) AS BIGINT) AS r$i")
      .mkString(",\n    ")
    val vals = steps.zipWithIndex.map { case (s, i) => s"(${i + 1}, '$s')" }.mkString(", ")
    val pick = "CASE step " +
      steps.indices.map(i => s"WHEN ${i + 1} THEN r$i").mkString(" ") + " END"
    s"""WITH f AS (SELECT user_id,
       |    $mins
       |  FROM events GROUP BY 1),
       |r AS (SELECT
       |    $rs
       |  FROM f),
       |s AS (SELECT * FROM (VALUES $vals) v(step, step_name))
       |SELECT CAST(step AS BIGINT) AS step, step_name,
       |  $pick AS n_users,
       |  CAST(($pick * 1000000) // greatest(r0, 1) AS BIGINT) AS conv_ppm
       |FROM s, r ORDER BY step""".stripMargin
  }

  /** Mirrors Dedup.substringGramStats, generated from the operator's own
    * geometry constants (gramLen/maxDf stay parameter-locked): same
    * positional md5 grams as the dedup_substring oracle, per-gram
    * distinct-doc df, top-k shared grams with the dropped flag, 1-row
    * dropped-total joined onto every row. */
  private def substringGramStatsOracle: String = {
    val gl = Dedup.SubstringGramLen
    val maxDf = Dedup.SubstringMaxDf
    s"""WITH norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t FROM documents),
       |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
       |grams AS (SELECT doc_id, md5(array_to_string(toks[i:i+${gl - 1}], ' ')) AS g
       |  FROM tk, unnest(generate_series(1, len(toks) - ${gl - 1})) AS u(i)
       |  WHERE len(toks) >= $gl),
       |dfs AS (SELECT g, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM grams GROUP BY 1),
       |drp AS (SELECT CAST(coalesce(sum(CASE WHEN df > $maxDf THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_dropped_grams FROM dfs),
       |top AS (SELECT g, df FROM dfs WHERE df > 1 ORDER BY df DESC, g LIMIT 20)
       |SELECT g, df, df > $maxDf AS dropped, n_dropped_grams
       |FROM top, drp ORDER BY df DESC, g""".stripMargin
  }

  /** Mirrors Relational.eventFunnelWindowed, generated from the same
    * step list + horizon constant: chained greedy earliest-completion
    * CTEs (step i's earliest event inside (t_{i-1}, t_{i-1}+horizon]),
    * one count per stage, integer-ppm conversion. Timestamps travel as
    * whole epoch seconds in BOTH engines (unix_timestamp floors;
    * date_trunc('second') + epoch matches it), so the window comparisons
    * are integer-exact. */
  private def eventFunnelWindowedOracle: String = {
    val steps = Relational.FunnelSteps
    val h = Relational.FunnelHorizonSec
    val c0 =
      s"c0 AS (SELECT user_id, min(tsec) AS t FROM e WHERE event_type = '${steps.head}' GROUP BY 1)"
    val cis = (1 until steps.length).map { i =>
      s"""c$i AS (SELECT e.user_id, min(e.tsec) AS t FROM e
         |  JOIN c${i - 1} p ON e.user_id = p.user_id
         |  WHERE e.event_type = '${steps(i)}' AND e.tsec >= p.t AND e.tsec <= p.t + $h
         |  GROUP BY 1)""".stripMargin
    }
    val counts = steps.indices.map(i =>
      s"SELECT ${i + 1} AS step, (SELECT count(*) FROM c$i) AS n_users").mkString(" UNION ALL ")
    val vals = steps.zipWithIndex.map { case (s, i) => s"(${i + 1}, '$s')" }.mkString(", ")
    s"""WITH e AS (SELECT user_id, event_type,
       |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec FROM events),
       |$c0,
       |${cis.mkString(",\n")},
       |u AS ($counts),
       |s AS (SELECT * FROM (VALUES $vals) v(step, step_name)),
       |b AS (SELECT greatest(max(CASE WHEN step = 1 THEN n_users END), 1) AS base FROM u)
       |SELECT CAST(s.step AS BIGINT) AS step, s.step_name,
       |  CAST(u.n_users AS BIGINT) AS n_users,
       |  CAST((u.n_users * 1000000) // b.base AS BIGINT) AS conv_ppm
       |FROM s JOIN u ON u.step = s.step, b ORDER BY step""".stripMargin
  }

  /** Mirrors Relational.funnelTimeToConvert: the same greedy completion
    * CTE chain as the windowed funnel, delays as completion-time
    * differences per transition, `quantile_disc` = the engine's
    * nearest-rank fences exactly. */
  private def funnelTimeToConvertOracle: String = {
    val steps = Relational.FunnelSteps
    val h = Relational.FunnelHorizonSec
    val c0 =
      s"c0 AS (SELECT user_id, min(tsec) AS t FROM e WHERE event_type = '${steps.head}' GROUP BY 1)"
    val cis = (1 until steps.length).map { i =>
      s"""c$i AS (SELECT e.user_id, min(e.tsec) AS t FROM e
         |  JOIN c${i - 1} p ON e.user_id = p.user_id
         |  WHERE e.event_type = '${steps(i)}' AND e.tsec >= p.t AND e.tsec <= p.t + $h
         |  GROUP BY 1)""".stripMargin
    }
    val delays = (1 until steps.length).map(i =>
      s"SELECT $i AS transition, c$i.t - c${i - 1}.t AS delay_sec " +
        s"FROM c$i JOIN c${i - 1} ON c$i.user_id = c${i - 1}.user_id")
      .mkString(" UNION ALL ")
    val vals = steps.sliding(2).zipWithIndex
      .map { case (Seq(a, b), i) => s"(${i + 1}, '$a->$b')" }.mkString(", ")
    s"""WITH e AS (SELECT user_id, event_type,
       |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec FROM events),
       |$c0,
       |${cis.mkString(",\n")},
       |d AS ($delays),
       |nm AS (SELECT * FROM (VALUES $vals) v(transition, transition_name))
       |SELECT CAST(d.transition AS BIGINT) AS transition, nm.transition_name,
       |  CAST(count(*) AS BIGINT) AS n_converted,
       |  CAST(quantile_disc(delay_sec, 0.50) AS BIGINT) AS p50_sec,
       |  CAST(quantile_disc(delay_sec, 0.90) AS BIGINT) AS p90_sec
       |FROM d JOIN nm ON d.transition = nm.transition
       |GROUP BY 1, 2 ORDER BY 1""".stripMargin
  }

  /** Mirrors Relational.eventFunnelSessionized, generated from the same
    * step list + gap constant: lag/gap cumulative-sum session ids,
    * per-(user, session) first-occurrence funnel, per-user any-session
    * max, integer-ppm roll-up — all integer epoch-second arithmetic. */
  private def eventFunnelSessionizedOracle: String = {
    val steps = Relational.FunnelSteps
    val gap = Relational.FunnelSessionGapSec
    val quoted = steps.map(s => s"'$s'").mkString(", ")
    val mins = steps.map(st =>
      s"min(CASE WHEN event_type = '$st' THEN tsec END) AS t_$st").mkString(",\n    ")
    def reach(i: Int) =
      ((0 to i).map(j => s"t_${steps(j)} IS NOT NULL") ++
        (1 to i).map(j => s"t_${steps(j - 1)} <= t_${steps(j)}")).mkString(" AND ")
    val rs = steps.indices.map(i =>
      s"max(CASE WHEN ${reach(i)} THEN 1 ELSE 0 END) AS r$i").mkString(",\n    ")
    val sums = steps.indices.map(i =>
      s"CAST(coalesce(sum(r$i), 0) AS BIGINT) AS r$i").mkString(",\n    ")
    val vals = steps.zipWithIndex.map { case (s, i) => s"(${i + 1}, '$s')" }.mkString(", ")
    val pick = "CASE step " +
      steps.indices.map(i => s"WHEN ${i + 1} THEN r$i").mkString(" ") + " END"
    s"""WITH e AS (SELECT user_id, event_type,
       |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS tsec
       |  FROM events WHERE event_type IN ($quoted)),
       |lg AS (SELECT user_id, event_type, tsec,
       |    lag(tsec) OVER (PARTITION BY user_id ORDER BY tsec) AS prev FROM e),
       |ns AS (SELECT user_id, event_type, tsec,
       |    CASE WHEN prev IS NULL OR tsec - prev > $gap THEN 1 ELSE 0 END AS new_s FROM lg),
       |sid AS (SELECT user_id, event_type, tsec,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY tsec
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM ns),
       |f AS (SELECT user_id, sid,
       |    $mins
       |  FROM sid GROUP BY 1, 2),
       |pu AS (SELECT user_id,
       |    $rs
       |  FROM f GROUP BY 1),
       |r AS (SELECT
       |    $sums
       |  FROM pu),
       |s AS (SELECT * FROM (VALUES $vals) v(step, step_name))
       |SELECT CAST(step AS BIGINT) AS step, step_name,
       |  $pick AS n_users,
       |  CAST(($pick * 1000000) // greatest(r0, 1) AS BIGINT) AS conv_ppm
       |FROM s, r ORDER BY step""".stripMargin
  }

  /** Mirrors TextAnalysis.winnowFingerprints, generated from the shared
    * winnowing constants: token ints from the first 8 md5 nibbles, the
    * identical Karp-Rabin mod chain (every intermediate < 2^52 — exact
    * in both engines' int64), window minima with leftmost tie-break
    * (array_position ↔ list_position, both first-match), XOR/min/max
    * folds over the distinct selections. */
  private def winnowFingerprintOracle: String = {
    import TextAnalysis.{WinnowK, WinnowW, WinnowB, WinnowM}
    val nibVal = (1 to 8).map { i =>
      val scale = math.pow(16, 8 - i).toLong
      s"(strpos('0123456789abcdef', substr(m, $i, 1)) - 1) * $scale"
    }.mkString(" + ")
    val chain = (1 until WinnowK).foldLeft(s"ti[i] % $WinnowM") {
      (acc, j) => s"(($acc) * $WinnowB + ti[i + $j]) % $WinnowM"
    }
    val win = s"h[j:j+${WinnowW - 1}]"
    val scale = 2147483648L // the pos·2^31 + fp packing (see winnowSelections)
    s"""WITH norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t FROM documents),
       |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
       |tk2 AS (SELECT doc_id, toks FROM tk WHERE len(toks) >= ${WinnowK + WinnowW - 1}),
       |ti AS (SELECT doc_id, list_transform(list_transform(toks, x -> md5(x)),
       |    m -> CAST($nibVal AS BIGINT)) AS ti FROM tk2),
       |h AS (SELECT doc_id, list_transform(range(1, len(ti) - ${WinnowK - 2}), i -> $chain) AS h FROM ti),
       |sel AS (SELECT doc_id, len(h) AS n_kgrams,
       |    list_distinct(list_transform(range(1, len(h) - ${WinnowW - 2}), j ->
       |      (j - 1 + list_position($win, list_min($win))) * $scale + list_min($win))) AS sel
       |  FROM h),
       |u AS (SELECT doc_id, n_kgrams, unnest(sel) % $scale AS fp FROM sel)
       |SELECT doc_id, CAST(n_kgrams AS BIGINT) AS n_kgrams, CAST(count(*) AS BIGINT) AS n_fps,
       |  CAST(bit_xor(fp) AS BIGINT) AS fp_xor,
       |  CAST(min(fp) AS BIGINT) AS fp_min, CAST(max(fp) AS BIGINT) AS fp_max
       |FROM u GROUP BY 1, 2 ORDER BY doc_id""".stripMargin
  }

  /** Shared hashed-TF sparse-count CTE chain (mirrors
    * TextAnalysis.hashedTfCounts: same normalization, same 4-nibble md5
    * bucket mod HashVecDim). */
  private def hashedTfCte: String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(hm, $i, 1)) - 1)"
    s"""hnorm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t FROM documents),
       |htok AS (SELECT doc_id, md5(tk) AS hm FROM
       |  (SELECT doc_id, unnest(string_split(t, ' ')) AS tk FROM hnorm) WHERE length(tk) > 0),
       |hc AS (SELECT doc_id,
       |    CAST((${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)}) % ${TextAnalysis.HashVecDim} AS BIGINT) AS bucket,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM htok GROUP BY 1, 2)""".stripMargin
  }

  private def docVectorHashOracle: String =
    s"""WITH $hashedTfCte
       |SELECT doc_id, bucket, cnt FROM hc ORDER BY doc_id, bucket""".stripMargin

  /** Mirrors TextAnalysis.lexicalAnn: cosine over integer count vectors.
    * Integer dot/norm sums are order-independent (exact ≤ 2^53), so
    * plain SQL aggregates match the codegen'd left-to-right double
    * cosine bit-for-bit; the pair list is DENSE over docs that have any
    * tokens (a zero-overlap pair scores 0.0, same as the dense-array
    * Spark side). */
  private def docLexicalAnnOracle: String =
    s"""WITH $hashedTfCte,
       |dd AS (SELECT DISTINCT doc_id FROM hc),
       |nn AS (SELECT doc_id, CAST(sum(cnt * cnt) AS BIGINT) AS n2 FROM hc GROUP BY 1),
       |prs AS (SELECT q.doc_id AS query_id, d.doc_id AS neighbor_id
       |  FROM dd q JOIN dd d ON d.doc_id != q.doc_id WHERE q.doc_id < 5),
       |dp AS (SELECT a.doc_id AS query_id, b.doc_id AS neighbor_id,
       |    CAST(sum(a.cnt * b.cnt) AS BIGINT) AS dp
       |  FROM hc a JOIN hc b ON a.bucket = b.bucket AND b.doc_id != a.doc_id
       |  WHERE a.doc_id < 5 GROUP BY 1, 2),
       |sc AS (SELECT p.query_id, p.neighbor_id,
       |    CAST(coalesce(dp.dp, 0) AS DOUBLE) / sqrt(CAST(qa.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE)) AS cs
       |  FROM prs p
       |  LEFT JOIN dp ON dp.query_id = p.query_id AND dp.neighbor_id = p.neighbor_id
       |  JOIN nn qa ON qa.doc_id = p.query_id JOIN nn nb ON nb.doc_id = p.neighbor_id),
       |rk AS (SELECT query_id, neighbor_id, cs,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cs DESC, neighbor_id) AS rank
       |  FROM sc)
       |SELECT query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
       |FROM rk WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin

  /** Mirrors TextAnalysis.corpusDiff over the simulated snapshots:
    * presence decides added/removed, IS NOT DISTINCT FROM is the
    * null-safe twin of Spark's <=> fp comparison. */
  private def corpusDiffOracle: String =
    s"""WITH o AS (SELECT doc_id, source,
       |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS ofp, TRUE AS in_old
       |  FROM documents WHERE doc_id % 3 != 0),
       |n AS (SELECT doc_id, source,
       |    md5(regexp_replace(trim(lower(CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END)),
       |        '\\s+', ' ', 'g')) AS nfp, TRUE AS in_new
       |  FROM documents WHERE doc_id % 5 != 0),
       |j AS (SELECT coalesce(n.source, o.source) AS source, o.ofp, n.nfp, o.in_old, n.in_new
       |      FROM o FULL OUTER JOIN n USING (doc_id))
       |SELECT source,
       |  CAST(sum(CASE WHEN in_old IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       |  CAST(sum(CASE WHEN in_new IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       |  CAST(sum(CASE WHEN in_old IS NOT NULL AND in_new IS NOT NULL
       |       AND NOT (ofp IS NOT DISTINCT FROM nfp) THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
       |  CAST(sum(CASE WHEN in_old IS NOT NULL AND in_new IS NOT NULL
       |       AND (ofp IS NOT DISTINCT FROM nfp) THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged
       |FROM j GROUP BY 1 ORDER BY 1""".stripMargin

  /** Mirrors TextAnalysis.chunkDocuments: same \S+ tokenizer, same
    * width/stride window arithmetic (DuckDB list_slice end is inclusive;
    * Spark slice takes a length — i·stride+width ≡ start+width−1+1). */
  private def chunkDocumentsOracle: String = {
    val (w, st) = (TextAnalysis.ChunkWidth, TextAnalysis.ChunkStride)
    s"""WITH t AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents),
       |nn AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
       |c AS (SELECT doc_id, toks, n,
       |        unnest(generate_series(0, (n - 1) // $st)) AS i FROM nn),
       |sl AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       |        list_slice(toks, i * $st + 1, i * $st + $w) AS ct FROM c)
       |SELECT doc_id, chunk_id, CAST(len(ct) AS BIGINT) AS n_chunk_tokens,
       |  md5(array_to_string(ct, ' ')) AS chunk_fp
       |FROM sl ORDER BY doc_id, chunk_id""".stripMargin
  }

  /** Mirrors TextAnalysis.chunkDedup over the chunkDocumentsOracle CTE
    * chain: per-fingerprint distinct-doc / occurrence counts, shared
    * fingerprints only, lowest doc as witness. */
  private def dedupChunksOracle: String = {
    val (w, st) = (TextAnalysis.ChunkWidth, TextAnalysis.ChunkStride)
    s"""WITH t AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS toks FROM documents),
       |nn AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0),
       |c AS (SELECT doc_id, toks, n,
       |        unnest(generate_series(0, (n - 1) // $st)) AS i FROM nn),
       |sl AS (SELECT doc_id, md5(array_to_string(list_slice(toks, i * $st + 1, i * $st + $w), ' ')) AS chunk_fp
       |  FROM c),
       |g AS (SELECT chunk_fp, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |        CAST(count(*) AS BIGINT) AS n_occurrences,
       |        CAST(min(doc_id) AS BIGINT) AS first_doc
       |  FROM sl GROUP BY 1)
       |SELECT chunk_fp, n_docs, n_occurrences, first_doc
       |FROM g WHERE n_docs > 1 ORDER BY chunk_fp""".stripMargin
  }

  /** Mirrors Dedup.bloomCheck's exact side; the two booleans are pinned
    * TRUE — the bloom acceptance bounds the Spark side must meet (the
    * same bound-gate oracle pattern as the HLL/KLL _check queries). */
  private def bloomCheckOracle: String =
    s"""WITH f AS (SELECT doc_id,
       |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp FROM documents),
       |exf AS (SELECT DISTINCT fp FROM f WHERE doc_id % 2 = 0),
       |nw AS (SELECT doc_id, fp IN (SELECT fp FROM exf) AS is_dup FROM f WHERE doc_id % 2 = 1)
       |SELECT CAST(count(*) AS BIGINT) AS n_new,
       |  CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_exact,
       |  CAST(sum(CASE WHEN is_dup THEN 0 ELSE 1 END) AS BIGINT) AS n_clean,
       |  TRUE AS no_false_negatives, TRUE AS fp_rate_ok
       |FROM nw""".stripMargin

  private def dedupRateBySourceOracle: String =
    """WITH f AS (SELECT source,
      |    md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp FROM documents)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(DISTINCT fp) AS BIGINT) AS n_distinct,
      |  CAST((100 * (count(*) - count(DISTINCT fp))) // greatest(count(*), 1) AS BIGINT) AS dup_pct
      |FROM f GROUP BY source ORDER BY source""".stripMargin

  private val QualityScoreSql =
    """round(least(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) / 20.0, 1.0)
      |        * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
      |                       / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)), 6)""".stripMargin

  private val LangIdEnSql =
    """CASE WHEN len(regexp_extract_all(text, '\S+')) = 0 THEN 'unk'
      |     WHEN CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
      |          / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) >= 0.05 THEN 'en'
      |     ELSE 'unk' END""".stripMargin

  /** Curation composite: quality + language filters, anti-joined against
    * near-dup cluster non-representatives (from the recursive-CTE
    * connected components). */
  private def curatedCorpusOracle: String =
    s"""WITH RECURSIVE pairs AS ($minhashOracle),
       |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
       |          UNION ALL SELECT doc_b, doc_a FROM pairs),
       |reach(rdoc, lbl) AS (
       |  SELECT DISTINCT s, s FROM edges
       |  UNION
       |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.rdoc),
       |drops AS (SELECT rdoc FROM reach GROUP BY rdoc HAVING rdoc != min(lbl))
       |SELECT doc_id, source, $QualityScoreSql AS quality_score
       |FROM documents
       |WHERE $QualityScoreSql >= 0.5 AND ($LangIdEnSql) = 'en'
       |  AND doc_id NOT IN (SELECT rdoc FROM drops)
       |ORDER BY doc_id""".stripMargin

  /** Normalized text → whitespace tokens (with duplicates), shared by the
    * repetition / distinctive-terms oracles. */
  private val TokenCte =
    """norm AS (SELECT doc_id, source, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
      |tok AS (SELECT doc_id, source, unnest(string_split(t, ' ')) AS tok FROM norm)""".stripMargin

  private def repetitionOracle: String =
    s"""WITH $TokenCte,
       |cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok WHERE tok != '' GROUP BY 1, 2)
       |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens, CAST(count(*) AS BIGINT) AS n_distinct,
       |  CAST((100 * (sum(c) - count(*))) // greatest(sum(c), 1) AS BIGINT) AS repetition_pct,
       |  CAST((100 * max(c)) // greatest(sum(c), 1) AS BIGINT) AS top_token_share_pct
       |FROM cnt GROUP BY doc_id ORDER BY doc_id""".stripMargin

  private def distinctiveTermsOracle: String =
    s"""WITH $TokenCte,
       |tf AS (SELECT source, tok, count(*) AS tf FROM tok WHERE tok != '' GROUP BY 1, 2),
       |df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tok WHERE tok != '' GROUP BY 1),
       |s AS (SELECT source, tok, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       |    CAST((tf * 1000000) // df AS BIGINT) AS score_ppm FROM tf JOIN df USING (tok)),
       |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY source ORDER BY score_ppm DESC, tok) AS BIGINT) AS rk FROM s)
       |SELECT source, rk, tok, tf, df, score_ppm FROM r WHERE rk <= 5 ORDER BY source, rk""".stripMargin

  /** Mirrors TextAnalysis.piiScrubStats — the pattern strings are the
    * Scala constants interpolated verbatim (Java∩RE2 subset). */
  private def piiScrubOracle: String = {
    import graft.functions.TextFunctions.{EmailRe, Ipv4Re, PhoneRe, LongDigitRe}
    val redacted =
      s"regexp_replace(regexp_replace(regexp_replace(regexp_replace(s, '$EmailRe', '[EMAIL]', 'g'), " +
        s"'$Ipv4Re', '[IP]', 'g'), '$PhoneRe', '[PHONE]', 'g'), '$LongDigitRe', '[NUM]', 'g')"
    s"""WITH f AS (SELECT 'documents.text' AS field, text AS s FROM documents
       |           UNION ALL SELECT 'events.props' AS field, props AS s FROM events)
       |SELECT field, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(sum(len(regexp_extract_all(s, '$EmailRe'))) AS BIGINT) AS email_hits,
       |  CAST(sum(len(regexp_extract_all(s, '$Ipv4Re'))) AS BIGINT) AS ipv4_hits,
       |  CAST(sum(len(regexp_extract_all(s, '$PhoneRe'))) AS BIGINT) AS phone_hits,
       |  CAST(sum(len(regexp_extract_all(s, '$LongDigitRe'))) AS BIGINT) AS digit_run_hits,
       |  CAST(sum(length(s)) AS BIGINT) AS chars,
       |  CAST(sum(length($redacted)) AS BIGINT) AS chars_redacted
       |FROM f GROUP BY field ORDER BY field""".stripMargin
  }

  private def lengthOutlierOracle: String =
    """WITH s AS (SELECT source, count(*) AS n, sum(n_chars) AS s1, sum(n_chars * n_chars) AS s2
      |           FROM documents GROUP BY 1),
      |j AS (SELECT d.source, n, s1, s2, n * d.n_chars - s1 AS dev, n * s2 - s1 * s1 AS nvar
      |      FROM documents d JOIN s ON d.source = s.source)
      |SELECT source, CAST(n AS BIGINT) AS n_docs,
      |  CAST((1000 * s1) // n AS BIGINT) AS mean_chars_milli,
      |  CAST((1000 * nvar) // (n * n) AS BIGINT) AS var_chars_milli,
      |  CAST(sum(CASE WHEN dev > 0 AND dev * dev > 4 * nvar THEN 1 ELSE 0 END) AS BIGINT) AS n_over_2sd,
      |  CAST(sum(CASE WHEN dev < 0 AND dev * dev > 4 * nvar THEN 1 ELSE 0 END) AS BIGINT) AS n_under_2sd
      |FROM j GROUP BY source, n, s1, s2, nvar ORDER BY source""".stripMargin

  private def crossSourceDupOracle: String =
    s"""WITH pairs AS ($minhashOracle),
       |d AS (SELECT doc_id, source FROM documents)
       |SELECT least(da.source, db.source) AS source_a, greatest(da.source, db.source) AS source_b,
       |  CAST(count(*) AS BIGINT) AS dup_pairs
       |FROM pairs JOIN d da ON doc_a = da.doc_id JOIN d db ON doc_b = db.doc_id
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  private def embeddingNormStatsOracle: String =
    s"""WITH b AS (SELECT $BucketSql AS bucket,
       |    round(sqrt(list_sum(list_transform(range(64), i -> embedding[i+1]::DOUBLE * embedding[i+1]::DOUBLE))), 4) AS nrm
       |  FROM embeddings)
       |SELECT CAST(bucket AS BIGINT) AS bucket, CAST(count(*) AS BIGINT) AS n,
       |  min(nrm) AS min_norm, max(nrm) AS max_norm
       |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Mirrors Multimodal.featureExtract + Similarity.bruteForceTopK: the
    * fake features are exact rationals from md5 nibbles, float-rounded
    * identically in both engines, and the cosine accumulates in double
    * left-to-right like every other ANN oracle. */
  private def mediaFeatureAnnOracle: String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(m, ${i + 1}, 1)) - 1)"
    val fList = (0 until 16).map { j =>
      s"CAST((${nib(2 * j)} * 16 + ${nib(2 * j + 1)}) / 255.0 - 0.5 AS FLOAT)"
    }.mkString("[", ", ", "]")
    def dot16(a: String, b: String) =
      s"list_sum(list_transform(range(16), i -> $a.f[i+1]::DOUBLE * $b.f[i+1]::DOUBLE))"
    s"""WITH feat AS (SELECT doc_id AS vec_id, $fList AS f
       |  FROM (SELECT doc_id, md5(text) AS m FROM documents)),
       |s AS (SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |    ${dot16("a", "b")} AS dp, ${dot16("a", "a")} AS nq, ${dot16("b", "b")} AS nn
       |  FROM feat a JOIN feat b ON a.vec_id < 3 AND a.vec_id != b.vec_id),
       |r AS (SELECT query_id, neighbor_id, dp / sqrt(nq * nn) AS cs,
       |    row_number() OVER (PARTITION BY query_id ORDER BY dp / sqrt(nq * nn) DESC, neighbor_id) AS rank
       |  FROM s)
       |SELECT query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
       |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin
  }

  /** ann_ivf_topk oracle, generated AFTER the queries have run (Verify
    * writes every query result BEFORE dumping oracle_sql.json, and running
    * ann_ivf_topk trains + memoizes the quantizer): the session's centroid
    * table is inlined as a (cell, centroid) literal relation — the same
    * replicate-the-internals contract as [[embeddingNearDupOracle]], which
    * inlines band arithmetic — and the SQL mirrors argmax cosine cell
    * assignment, nProbe centroid probing, and the exact per-query top-k,
    * accumulating every dot product in double left-to-right exactly like
    * the codegen'd CosineSimilarity. Centroid floats travel as their
    * shortest round-trip decimal inside a '…'::DOUBLE cast, so DuckDB
    * reconstructs the identical double each Spark-side float widened to.
    * Empty when no quantizer was trained this session — the driver then
    * records its weaker rows-only check, same as before. */
  private def annIvfOracleEntry: Map[String, String] = {
    val model = graft.operators.Similarity.lastQuantizer
    if (model.isEmpty) return Map.empty
    val cells = model.indices.mkString("[", ", ", "]")
    val cents = model
      .map(_.map(f => s"'${f.toDouble}'::DOUBLE").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    // double-accumulated left-to-right dot fragments (qe/embedding are
    // float lists promoted per element; centroid is already a double list)
    def dotEC(e: String, c: String) =
      s"list_sum(list_transform(range(64), i -> $e[i+1]::DOUBLE * $c[i+1]))"
    def dotEE(e: String) =
      s"list_sum(list_transform(range(64), i -> $e[i+1]::DOUBLE * $e[i+1]::DOUBLE))"
    def dotCC(c: String) =
      s"list_sum(list_transform(range(64), i -> $c[i+1] * $c[i+1]))"
    // parameterized over an extra candidate predicate so the
    // delta-merge variant (ann_ivf_after_remove: removed vec_ids must
    // never surface) shares the identical search arithmetic
    def searchSql(extraCand: String) =
      s"""WITH cents AS (SELECT unnest($cells) AS cell, unnest($cents) AS centroid),
         |asgs AS (SELECT e.vec_id, e.embedding, c.cell,
         |    ${dotEC("e.embedding", "c.centroid")} / sqrt(${dotEE("e.embedding")} * ${dotCC("c.centroid")}) AS cs
         |  FROM embeddings e CROSS JOIN cents c),
         |asg AS (SELECT vec_id, embedding, cell FROM (
         |    SELECT vec_id, embedding, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS ark FROM asgs)
         |  WHERE ark = 1),
         |prs AS (SELECT q.vec_id AS query_id, q.embedding AS qe, c.cell,
         |    ${dotEC("q.embedding", "c.centroid")} / sqrt(${dotEE("q.embedding")} * ${dotCC("c.centroid")}) AS cd
         |  FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5),
         |probes AS (SELECT query_id, qe, cell FROM (
         |    SELECT query_id, qe, cell,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cd DESC, cell) AS prk FROM prs)
         |  WHERE prk <= 2),
         |s AS (SELECT p.query_id, a.vec_id AS neighbor_id,
         |    ${dotEC("p.qe", "a.embedding") /* both float lists: cast both sides */
            .replace("a.embedding[i+1]", "a.embedding[i+1]::DOUBLE")} AS dp,
         |    ${dotEE("p.qe")} AS nq, ${dotEE("a.embedding")} AS nn
         |  FROM probes p JOIN asg a ON a.cell = p.cell AND a.vec_id != p.query_id$extraCand),
         |r AS (SELECT query_id, neighbor_id, dp / sqrt(nq * nn) AS cs,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dp / sqrt(nq * nn) DESC, neighbor_id) AS rank
         |  FROM s)
         |SELECT query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
         |FROM r WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    val sql = searchSql("")
    // ivf_cell_stats shares the inlined quantizer: the same asgs/asg
    // argmax-assignment CTEs (ties break to the lowest cell, mirroring
    // array_position-on-max), rolled up to per-cell counts and an
    // integer-ppm share
    val cellStatsSql =
      s"""WITH cents AS (SELECT unnest($cells) AS cell, unnest($cents) AS centroid),
         |asgs AS (SELECT e.vec_id, c.cell,
         |    ${dotEC("e.embedding", "c.centroid")} / sqrt(${dotEE("e.embedding")} * ${dotCC("c.centroid")}) AS cs
         |  FROM embeddings e CROSS JOIN cents c),
         |asg AS (SELECT vec_id, cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS ark FROM asgs)
         |  WHERE ark = 1),
         |g AS (SELECT CAST(cell AS BIGINT) AS cell, CAST(count(*) AS BIGINT) AS n FROM asg GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g)
         |SELECT cell, n, CAST((n * 1000000) // total AS BIGINT) AS share_ppm
         |FROM g, t ORDER BY cell""".stripMargin
    // dedup_semantic inlines its OWN slot's quantizer (the adaptive cell
    // count diverges from the default IVF slot on larger corpora — see
    // Dedup.SemanticSlot): the same argmax assignment (nrm > 0 guard
    // first, as in embeddingNearDup), the SemanticMaxCell participation
    // cap, in-cell pairs at cos >= 0.5, and the min-qualifying-neighbor
    // keeper per dropped vector
    def dotFF(a: String, b: String) =
      s"list_sum(list_transform(range(64), i -> $a.embedding[i+1]::DOUBLE * $b.embedding[i+1]::DOUBLE))"
    val semModel = graft.operators.Similarity.slotQuantizer(graft.operators.Dedup.SemanticSlot)
    val semCells = semModel.indices.mkString("[", ", ", "]")
    val semCents = semModel
      .map(_.map(f => s"'${f.toDouble}'::DOUBLE").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    val semanticSql =
      s"""WITH cents AS (SELECT unnest($semCells) AS cell, unnest($semCents) AS centroid),
         |nz AS (SELECT vec_id, embedding, ${dotEE("embedding")} AS nrm
         |  FROM embeddings WHERE ${dotEE("embedding")} > 0),
         |asgs AS (SELECT e.vec_id, e.embedding, e.nrm, c.cell,
         |    ${dotEC("e.embedding", "c.centroid")} / sqrt(e.nrm * ${dotCC("c.centroid")}) AS cs
         |  FROM nz e CROSS JOIN cents c),
         |asg AS (SELECT vec_id, embedding, nrm, cell FROM (
         |    SELECT vec_id, embedding, nrm, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS ark FROM asgs)
         |  WHERE ark = 1),
         |kept AS (SELECT vec_id, embedding, nrm, cell FROM (
         |    SELECT *, row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS crk FROM asg)
         |  WHERE crk <= ${graft.operators.Dedup.SemanticMaxCell}),
         |p AS (SELECT b.vec_id AS vec_id, a.vec_id AS dup_of, a.cell,
         |    ${dotFF("a", "b")} / sqrt(a.nrm * b.nrm) AS cos
         |  FROM kept a JOIN kept b ON a.cell = b.cell AND a.vec_id < b.vec_id),
         |f AS (SELECT vec_id, dup_of, cell, cos,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dup_of) AS rk
         |  FROM p WHERE cos >= $SemanticGateThreshold)
         |SELECT vec_id, dup_of, CAST(cell AS BIGINT) AS cell, round(cos, 4) AS cos_sim
         |FROM f WHERE rk = 1 ORDER BY vec_id""".stripMargin
    Map("ann_ivf_topk" -> sql, "ivf_cell_stats" -> cellStatsSql,
      // the persisted-tree removal variant: identical search arithmetic,
      // candidates restricted to the post-diff corpus (removal must make
      // a vector UNRETURNABLE — hash-gated, not just spec-pinned)
      "ann_ivf_after_remove" -> searchSql(" AND a.vec_id % 7 != 4")) ++
      (if (semModel.isEmpty) Map.empty[String, String]
       else Map("dedup_semantic" -> semanticSql))
  }

  /** ann_ivfpq_topk / pq_code_stats oracles, generated AFTER the queries
    * have run (same post-run contract as [[annIvfOracleEntry]]): the
    * session's coarse quantizer AND the 8×16×8 PQ codebooks are inlined,
    * and the SQL replicates encoding (per-subspace argmin squared-L2,
    * ties to the lowest code), the per-query ADC tables, the ordered-sum
    * ADC score, the top-[[Similarity.PqRefine]] refine cut, and the
    * exact-cosine re-rank bit-for-bit. Every floating-point sum is an
    * ordered list_sum (never a SQL aggregate sum), so the accumulation
    * order matches the codegen'd left-to-right chains. */
  private def annPqOracleEntry: Map[String, String] = {
    import graft.operators.Similarity.{PqSubspaces, PqSubDim}
    val model = graft.operators.Similarity.lastQuantizer
    val books = graft.operators.Similarity.lastPqBooks
    if (model.isEmpty || books.isEmpty) return Map.empty
    val dim = PqSubspaces * PqSubDim
    val embCte = s"emb AS (SELECT vec_id, embedding FROM embeddings WHERE len(embedding) = $dim)"
    val shared = pqSharedCtes(model, books, embCte)
    val statsSql =
      s"""WITH $shared,
         |g AS (SELECT CAST(m AS BIGINT) AS subspace, CAST(code AS BIGINT) AS code,
         |    CAST(count(*) AS BIGINT) AS n FROM ecode GROUP BY 1, 2),
         |t AS (SELECT subspace, CAST(sum(n) AS BIGINT) AS total FROM g GROUP BY 1)
         |SELECT g.subspace, g.code, g.n, CAST((g.n * 1000000) // t.total AS BIGINT) AS share_ppm
         |FROM g JOIN t USING (subspace) ORDER BY 1, 2""".stripMargin
    Map("ann_ivfpq_topk" -> pqSearchOracleSql(model, books, embCte),
      "pq_code_stats" -> statsSql)
  }

  /** doc_lexical_ann_pq oracle (post-run contract, doclex slot): the
    * hashed-TF dense vectors rebuilt in SQL (sparse counts left-joined
    * onto the full 0..dim-1 bucket range — integer counts are exact in
    * both engines' doubles), then the identical IVF-PQ pipeline as
    * ann_ivfpq_topk against the doclex slot's quantizer + codebooks. */
  private def lexPqOracleEntry: Map[String, String] = {
    val model = graft.operators.Similarity.slotQuantizer(TextAnalysis.LexicalSlot)
    val books = graft.operators.Similarity.slotPqBooks(TextAnalysis.LexicalSlot)
    if (model.isEmpty || books.isEmpty) return Map.empty
    val dim = TextAnalysis.HashVecDim
    val embCte =
      s"""$hashedTfCte,
         |hdd AS (SELECT DISTINCT doc_id FROM hc),
         |hdense AS (SELECT hdd.doc_id, r.i AS bucket, CAST(coalesce(hc.cnt, 0) AS DOUBLE) AS v
         |  FROM hdd CROSS JOIN range($dim) r(i)
         |  LEFT JOIN hc ON hc.doc_id = hdd.doc_id AND hc.bucket = r.i),
         |emb AS (SELECT doc_id AS vec_id, list(v ORDER BY bucket) AS embedding
         |  FROM hdense GROUP BY doc_id)""".stripMargin
    Map("doc_lexical_ann_pq" -> pqSearchOracleSql(model, books, embCte))
  }

  /** doc_topic_clusters oracle (post-run contract, doclex_topics slot):
    * hashed-TF dense vectors rebuilt in SQL, argmax-cosine assignment
    * against the inlined centroids (ties to the lowest cell, mirroring
    * array_position-on-max), then the distinctive-terms scoring over the
    * cluster-keyed token counts. */
  private def docTopicOracleEntry: Map[String, String] = {
    val model = graft.operators.Similarity.slotQuantizer(TextAnalysis.TopicSlot)
    if (model.isEmpty) return Map.empty
    val dim = TextAnalysis.HashVecDim
    val cells = model.indices.mkString("[", ", ", "]")
    val cents = model
      .map(_.map(f => s"'${f.toDouble}'::DOUBLE").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    def dotEC(e: String, c: String) =
      s"list_sum(list_transform(range($dim), i -> $e[i+1]::DOUBLE * $c[i+1]))"
    def dotEE(e: String) =
      s"list_sum(list_transform(range($dim), i -> $e[i+1]::DOUBLE * $e[i+1]::DOUBLE))"
    def dotCC(c: String) =
      s"list_sum(list_transform(range($dim), i -> $c[i+1] * $c[i+1]))"
    val sql =
      s"""WITH $hashedTfCte,
         |hdd AS (SELECT DISTINCT doc_id FROM hc),
         |hdense AS (SELECT hdd.doc_id, r.i AS bucket, CAST(coalesce(hc.cnt, 0) AS DOUBLE) AS v
         |  FROM hdd CROSS JOIN range($dim) r(i)
         |  LEFT JOIN hc ON hc.doc_id = hdd.doc_id AND hc.bucket = r.i),
         |emb AS (SELECT doc_id AS vec_id, list(v ORDER BY bucket) AS embedding
         |  FROM hdense GROUP BY doc_id),
         |cents AS (SELECT unnest($cells) AS cell, unnest($cents) AS centroid),
         |asgs AS (SELECT e.vec_id, c.cell,
         |    ${dotEC("e.embedding", "c.centroid")} / sqrt(${dotEE("e.embedding")} * ${dotCC("c.centroid")}) AS cs
         |  FROM emb e CROSS JOIN cents c),
         |asg AS (SELECT vec_id AS doc_id, CAST(cell AS BIGINT) AS cell FROM (
         |    SELECT vec_id, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS ark FROM asgs)
         |  WHERE ark = 1),
         |toks AS (SELECT doc_id, tk AS tok FROM
         |  (SELECT doc_id, unnest(string_split(t, ' ')) AS tk FROM hnorm) WHERE length(tk) > 0),
         |tf AS (SELECT cell, tok, CAST(count(*) AS BIGINT) AS tf
         |  FROM toks JOIN asg USING (doc_id) GROUP BY 1, 2),
         |dfr AS (SELECT tok, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY 1),
         |sc AS (SELECT cell, tok, tf, df, CAST((tf * 1000000) // df AS BIGINT) AS score_ppm
         |  FROM tf JOIN dfr USING (tok)),
         |rnk AS (SELECT *, CAST(row_number() OVER (PARTITION BY cell
         |    ORDER BY score_ppm DESC, tok) AS BIGINT) AS rk FROM sc),
         |sizes AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_docs FROM asg GROUP BY 1)
         |SELECT r.cell, s.n_docs, r.rk, r.tok, r.tf, r.df, r.score_ppm
         |FROM rnk r JOIN sizes s ON r.cell = s.cell
         |WHERE r.rk <= 3 ORDER BY r.cell, r.rk""".stripMargin
    Map("doc_topic_clusters" -> sql)
  }

  /** The shared IVF-PQ oracle CTE chain over an arbitrary `emb(vec_id,
    * embedding)` corpus definition: inlined centroids + codebooks, then
    * per-(vector, subspace) argmin-L2 codes (ties to the lowest code,
    * mirroring PqEncode's strict-< keep). */
  private def pqSharedCtes(model: Array[Array[Float]],
                           books: Array[Array[Array[Float]]],
                           embCte: String): String = {
    import graft.operators.Similarity.{PqSubDim}
    val cells = model.indices.mkString("[", ", ", "]")
    val cents = model
      .map(_.map(f => s"'${f.toDouble}'::DOUBLE").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    val flat = for (m <- books.indices; j <- books(m).indices) yield (m, j, books(m)(j))
    val ms = flat.map(_._1).mkString("[", ", ", "]")
    val codes = flat.map(_._2).mkString("[", ", ", "]")
    val subs = flat
      .map(_._3.map(f => s"'${f.toDouble}'::DOUBLE").mkString("[", ", ", "]"))
      .mkString("[", ", ", "]")
    val sqDiff = s"(e.embedding[p.m*$PqSubDim+d+1]::DOUBLE - p.sub[d+1])"
    s"""cents AS (SELECT unnest($cells) AS cell, unnest($cents) AS centroid),
       |pq AS (SELECT unnest($ms) AS m, unnest($codes) AS code, unnest($subs) AS sub),
       |$embCte,
       |codesd AS (SELECT e.vec_id, p.m, p.code,
       |    list_sum(list_transform(range($PqSubDim), d -> $sqDiff * $sqDiff)) AS dist
       |  FROM emb e CROSS JOIN pq p),
       |ecode AS (SELECT vec_id, m, code FROM (
       |    SELECT vec_id, m, code,
       |      row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, code) AS drk FROM codesd)
       |  WHERE drk = 1)""".stripMargin
  }

  /** The full IVF-PQ search oracle over [[pqSharedCtes]]'s chain:
    * assignment, probing, per-query ADC tables, cosine-normalized ADC
    * ranking, top-PqRefine refine cut, exact re-rank — every float sum an
    * ordered list_sum mirroring the codegen'd left-to-right chains. */
  private def pqSearchOracleSql(model: Array[Array[Float]],
                                books: Array[Array[Array[Float]]],
                                embCte: String): String = {
    import graft.operators.Similarity.{PqSubspaces, PqSubDim, PqRefine}
    val dim = PqSubspaces * PqSubDim
    val shared = pqSharedCtes(model, books, embCte)
    def dotEC(e: String, c: String) =
      s"list_sum(list_transform(range($dim), i -> $e[i+1]::DOUBLE * $c[i+1]))"
    def dotEE(e: String) =
      s"list_sum(list_transform(range($dim), i -> $e[i+1]::DOUBLE * $e[i+1]::DOUBLE))"
    def dotCC(c: String) =
      s"list_sum(list_transform(range($dim), i -> $c[i+1] * $c[i+1]))"
    val sql =
      s"""WITH $shared,
         |asgs AS (SELECT e.vec_id, e.embedding, c.cell,
         |    ${dotEC("e.embedding", "c.centroid")} / sqrt(${dotEE("e.embedding")} * ${dotCC("c.centroid")}) AS cs
         |  FROM emb e CROSS JOIN cents c),
         |asg AS (SELECT vec_id, embedding, cell FROM (
         |    SELECT vec_id, embedding, cell,
         |      row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS ark FROM asgs)
         |  WHERE ark = 1),
         |prs AS (SELECT q.vec_id AS query_id, q.embedding AS qe, c.cell,
         |    ${dotEC("q.embedding", "c.centroid")} / sqrt(${dotEE("q.embedding")} * ${dotCC("c.centroid")}) AS cd
         |  FROM emb q CROSS JOIN cents c WHERE q.vec_id < 5),
         |probes AS (SELECT query_id, qe, cell FROM (
         |    SELECT query_id, qe, cell,
         |      row_number() OVER (PARTITION BY query_id ORDER BY cd DESC, cell) AS prk FROM prs)
         |  WHERE prk <= 2),
         |qs AS (SELECT DISTINCT query_id, qe FROM probes),
         |qtab AS (SELECT q.query_id, p.m, p.code,
         |    list_sum(list_transform(range($PqSubDim), d -> q.qe[p.m*$PqSubDim+d+1]::DOUBLE * p.sub[d+1])) AS dot,
         |    list_sum(list_transform(range($PqSubDim), d -> p.sub[d+1] * p.sub[d+1])) AS nsq
         |  FROM qs q CROSS JOIN pq p),
         |cand AS (SELECT p.query_id, a.vec_id
         |  FROM probes p JOIN asg a ON a.cell = p.cell AND a.vec_id != p.query_id),
         |adc AS (SELECT c.query_id, c.vec_id,
         |    list_sum(list(t.dot ORDER BY t.m)) AS adcdot,
         |    list_sum(list(t.nsq ORDER BY t.m)) AS adcn
         |  FROM cand c JOIN ecode ec ON ec.vec_id = c.vec_id
         |    JOIN qtab t ON t.query_id = c.query_id AND t.m = ec.m AND t.code = ec.code
         |  GROUP BY 1, 2),
         |ref AS (SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      row_number() OVER (PARTITION BY query_id ORDER BY
         |        CASE WHEN adcn > 0 THEN adcdot / sqrt(adcn) ELSE -2 END DESC, vec_id) AS rrk
         |    FROM adc)
         |  WHERE rrk <= $PqRefine),
         |sx AS (SELECT r.query_id, r.vec_id AS neighbor_id,
         |    list_sum(list_transform(range($dim), i -> q.qe[i+1]::DOUBLE * a.embedding[i+1]::DOUBLE)) AS dp,
         |    ${dotEE("q.qe")} AS nq, ${dotEE("a.embedding")} AS nn
         |  FROM ref r JOIN emb a ON a.vec_id = r.vec_id JOIN qs q ON q.query_id = r.query_id),
         |rx AS (SELECT query_id, neighbor_id, dp / sqrt(nq * nn) AS cs,
         |    row_number() OVER (PARTITION BY query_id ORDER BY dp / sqrt(nq * nn) DESC, neighbor_id) AS rank
         |  FROM sx)
         |SELECT query_id, neighbor_id, rank, round(cs, 4) AS cos_sim
         |FROM rx WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin
    sql
  }

  /** quality_classifier oracle, generated AFTER the query has run (same
    * post-run contract as [[annIvfOracleEntry]]): the fitted logistic
    * coefficients + intercept are inlined as '…'::DOUBLE literals, and
    * the SQL recomputes the hashed-unigram features (md5-nibble bucket,
    * count/dl fractions) and the margin as the SAME left-to-right double
    * chain as the codegen'd DotProduct — term i is coef_i * (s_i / dl),
    * accumulated ascending, intercept added last. Missing buckets
    * contribute an exact +0.0 in both engines. Empty when no model was
    * fit this session (or two were — ambiguity degrades to rows-only). */
  private def qualityModelOracleEntry: Map[String, String] = {
    val (coef, intercept) = graft.operators.QualityModel.lastModel
    if (coef.isEmpty) return Map.empty
    val dim = graft.operators.QualityModel.FeatureDim
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(h, $i, 1)) - 1)"
    val bktExpr = s"CAST((${nib(1)}*4096 + ${nib(2)}*256 + ${nib(3)}*16 + ${nib(4)}) % $dim AS INT)"
    val sums = (0 until dim)
      .map(i => s"sum(CASE WHEN bkt = $i THEN cnt ELSE 0 END) AS s$i").mkString(", ")
    val margin = (0 until dim)
      .map(i => s"'${coef(i)}'::DOUBLE * (CAST(s$i AS DOUBLE) / CAST(dl AS DOUBLE))")
      .mkString(" + ") + s" + '$intercept'::DOUBLE"
    val sql =
      s"""WITH d AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nt FROM documents),
         |tk AS (SELECT doc_id, md5(tok) AS h FROM
         |  (SELECT doc_id, unnest(string_split(nt, ' ')) AS tok FROM d) WHERE length(tok) > 0),
         |hb AS (SELECT doc_id, $bktExpr AS bkt FROM tk),
         |cnts AS (SELECT doc_id, bkt, CAST(count(*) AS BIGINT) AS cnt FROM hb GROUP BY 1, 2),
         |wide AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS dl, $sums FROM cnts GROUP BY 1),
         |sc AS (SELECT doc_id, $margin AS margin_raw FROM wide),
         |hk AS (SELECT doc_id,
         |    round(least(CAST(len(regexp_extract_all(text, '\\S+')) AS DOUBLE) / 20.0, 1.0)
         |      * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE)
         |                     / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)), 6) >= 0.5 AS heur_keep
         |  FROM documents)
         |SELECT sc.doc_id, round(margin_raw, 4) AS margin, margin_raw >= 0 AS model_keep, hk.heur_keep
         |FROM sc JOIN hk USING (doc_id) ORDER BY doc_id""".stripMargin
    Map("quality_classifier" -> sql)
  }

  private def imageMetaOracle: String = {
    def nib(i: Int) = s"(strpos('0123456789abcdef', substr(md5(text), $i, 1)) - 1)"
    s"""SELECT doc_id, CAST(32 * (1 + ${nib(1)}) AS BIGINT) AS width,
       |  CAST(32 * (1 + ${nib(2)}) AS BIGINT) AS height,
       |  (['jpeg', 'png', 'webp'])[(${nib(3)} % 3) + 1] AS media_format
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "uu_per_minute" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "uu_per_minute_by_type" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute, event_type,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "uu_minute_histogram" ->
      """WITH m AS (SELECT date_trunc('minute', ts) AS minute,
        |    CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
        |  FROM events GROUP BY 1)
        |SELECT unique_users, CAST(count(*) AS BIGINT) AS n_minutes
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "uu_per_minute_twophase" ->
      """SELECT minute, CAST(count(*) AS BIGINT) AS unique_users
        |FROM (SELECT DISTINCT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute, user_id FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "uu_per_minute_collect_set" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // the HLL sketch estimate is engine-specific — its registered face
    // is this bound gate (literal-1 verdicts: a bound violation is a
    // hash mismatch)
    "uu_per_minute_approx_check" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS uu_exact,
        |       CAST(1 AS BIGINT) AS within_bound
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "user_count_cms_check" ->
      """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1)
        |SELECT user_id, n, CAST(1 AS BIGINT) AS never_under, CAST(1 AS BIGINT) AS within_bound
        |FROM c ORDER BY n DESC, user_id LIMIT 20""".stripMargin,
    // the DataSketches rollup estimate is engine-specific — registered
    // as its bound gate, same contract as uu_per_minute_approx_check
    "uu_daily_sketch_check" ->
      """SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS uu_exact,
        |       CAST(1 AS BIGINT) AS within_bound
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // exact side recomputed from the (day, user) pair relation — the
    // same semantics user_stickiness_daily hash-gates; estimate bound
    // violations become hash mismatches via the literal-1 verdict
    "uu_wau_sketch_check" ->
      """WITH pairs AS (SELECT DISTINCT CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS d,
        |    user_id FROM events),
        |mx AS (SELECT max(d) AS max_d FROM pairs),
        |w AS (SELECT unnest(generate_series(d, d + 6)) AS day, user_id FROM pairs),
        |wau AS (SELECT day, count(DISTINCT user_id) AS wau7 FROM w, mx
        |  WHERE day <= max_d GROUP BY 1)
        |SELECT CAST(day * 86400 AS BIGINT) AS day, CAST(wau7 AS BIGINT) AS wau7_exact,
        |  CAST(1 AS BIGINT) AS within_bound
        |FROM wau ORDER BY 1""".stripMargin,
    "audience_overlap_check" ->
      """WITH d AS (SELECT DISTINCT event_type, user_id FROM events)
        |SELECT x.event_type AS type_a, y.event_type AS type_b,
        |  CAST(count(*) AS BIGINT) AS inter_exact,
        |  CAST(1 AS BIGINT) AS within_bound
        |FROM d x JOIN d y ON x.user_id = y.user_id AND x.event_type < y.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "uu_per_minute_udaf" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "uu_per_minute_sql" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "uu_sliding_5m_1m" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) - 60*k AS window_start,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
        |FROM events, range(5) t(k) GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_filter_project" ->
      """SELECT event_id, user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec
        |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "events_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type, TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_variant_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k,
        |       CAST(count(*) AS BIGINT) AS n_missing
        |FROM (SELECT event_type, TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "reachability_recursive" ->
      """WITH RECURSIVE
        |b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |ue AS (SELECT a.l_partkey AS u, bb.l_partkey AS v
        |  FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey AND a.l_partkey < bb.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT u AS src, v AS dst FROM ue UNION ALL SELECT v AS src, u AS dst FROM ue),
        |reach AS (
        |  SELECT DISTINCT src AS part, 0 AS hop FROM e WHERE src < 50
        |  UNION ALL
        |  SELECT e.dst AS part, r.hop + 1 AS hop
        |  FROM reach r JOIN e ON e.src = r.part WHERE r.hop < 3)
        |SELECT CAST(part AS BIGINT) AS part, CAST(min(hop) AS BIGINT) AS hops
        |FROM reach GROUP BY 1 ORDER BY 1""".stripMargin,
    "priority_top_orders_listagg" ->
      """WITH v AS (SELECT o_orderpriority AS pri, o_orderkey AS k,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS cents FROM orders),
        |top5 AS (SELECT pri, k, cents FROM (
        |    SELECT pri, k, cents,
        |      row_number() OVER (PARTITION BY pri ORDER BY cents DESC, k) AS rn FROM v)
        |  WHERE rn <= 5)
        |SELECT pri AS o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(cents) AS BIGINT) AS top5_cents,
        |  string_agg(CAST(k AS VARCHAR), ',' ORDER BY cents DESC, k) AS top5_keys
        |FROM top5 GROUP BY pri ORDER BY pri""".stripMargin,
    "bloomjoin_segment_revenue" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(sum(round(o_totalprice*100)) AS BIGINT) AS revenue_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_props_map_stats" ->
      """WITH kv AS (SELECT props, unnest(json_keys(props)) AS key FROM events),
        |v AS (SELECT key, TRY_CAST(json_extract_string(props, '$.' || key) AS BIGINT) AS val FROM kv)
        |SELECT key, CAST(count(*) AS BIGINT) AS n, CAST(sum(val) AS BIGINT) AS sum_val,
        |       CAST(min(val) AS BIGINT) AS min_val, CAST(max(val) AS BIGINT) AS max_val
        |FROM v WHERE val IS NOT NULL GROUP BY key ORDER BY key""".stripMargin,
    "event_type_stats" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS users,
        |       CAST(sum(round(value*100)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       CAST(sum(round(l_extendedprice*100)) AS BIGINT) AS sum_base_cents,
        |       CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS sum_disc_cents,
        |       CAST(sum(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100)) AS BIGINT) AS sum_charge_cents,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_sec,
        |       CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1,2 ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        |       CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "top100_items" ->
      """SELECT l_orderkey, l_linenumber, CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
        |FROM lineitem ORDER BY price_cents DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "customers_topn_per_segment" ->
      """SELECT c_mktsegment, c_custkey, acctbal_cents, rk FROM (
        |  SELECT c_mktsegment, c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents,
        |         row_number() OVER (PARTITION BY c_mktsegment ORDER BY round(c_acctbal*100) DESC, c_custkey) AS rk
        |  FROM customer)
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
    "semi_join_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "anti_join_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 450000)
        |ORDER BY c_custkey""".stripMargin,
    "custkeys_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
        |INTERSECT
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000
        |ORDER BY k""".stripMargin,
    "custkeys_except" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
        |EXCEPT
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 450000
        |ORDER BY k""".stripMargin,
    "sales_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "orders_enriched" ->
      """SELECT o_orderkey, o_custkey, c_mktsegment,
        |       CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""".stripMargin,
    "sales_cube" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "latest_order_per_customer" ->
      """SELECT o_custkey, o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_sec,
        |       CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents
        |FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rk
        |      FROM orders)
        |WHERE rk = 1 ORDER BY o_custkey""".stripMargin,
    "order_value_histogram" ->
      """SELECT CAST(round(o_totalprice*100) AS BIGINT) // 50000 AS bucket, CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_resample_gapfill" ->
      """WITH e AS (SELECT event_type, u - u % 900 AS bucket_sec, value FROM
        |    (SELECT event_type, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS u, value FROM events)),
        |pb AS (SELECT event_type, bucket_sec, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(round(value*100)) AS BIGINT) AS value_cents FROM e GROUP BY 1, 2),
        |span AS (SELECT min(bucket_sec) AS b0, max(bucket_sec) AS b1 FROM e),
        |grid AS (SELECT unnest(generate_series(b0, b1, 900)) AS bucket_sec FROM span),
        |types AS (SELECT DISTINCT event_type FROM events),
        |dense AS (SELECT event_type, bucket_sec FROM grid CROSS JOIN types)
        |SELECT d.event_type, d.bucket_sec,
        |  COALESCE(pb.n, 0) AS n, COALESCE(pb.value_cents, 0) AS value_cents,
        |  COALESCE(last_value(pb.value_cents IGNORE NULLS) OVER (
        |      PARTITION BY d.event_type ORDER BY d.bucket_sec
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0) AS locf_value_cents
        |FROM dense d LEFT JOIN pb ON d.event_type = pb.event_type AND d.bucket_sec = pb.bucket_sec
        |ORDER BY 1, 2""".stripMargin,
    "table_column_stats" ->
      """SELECT * FROM (
        |  SELECT 'o_orderkey' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |    CAST(count(DISTINCT o_orderkey) AS BIGINT) AS ndv,
        |    CAST(min(o_orderkey) AS BIGINT) AS min_num, CAST(max(o_orderkey) AS BIGINT) AS max_num,
        |    CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM orders
        |  UNION ALL
        |  SELECT 'o_custkey', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT o_custkey) AS BIGINT),
        |    CAST(min(o_custkey) AS BIGINT), CAST(max(o_custkey) AS BIGINT),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderstatus', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT o_orderstatus) AS BIGINT),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |    min(o_orderstatus), max(o_orderstatus) FROM orders
        |  UNION ALL
        |  SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT o_totalprice) AS BIGINT),
        |    CAST(min(round(o_totalprice*100)) AS BIGINT), CAST(max(round(o_totalprice*100)) AS BIGINT),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderdate', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT o_orderdate) AS BIGINT),
        |    CAST(epoch(min(o_orderdate)) AS BIGINT), CAST(epoch(max(o_orderdate)) AS BIGINT),
        |    CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM orders
        |  UNION ALL
        |  SELECT 'o_orderpriority', CAST(count(*) AS BIGINT),
        |    CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |    CAST(count(DISTINCT o_orderpriority) AS BIGINT),
        |    CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
        |    min(o_orderpriority), max(o_orderpriority) FROM orders
        |) ORDER BY col_name""".stripMargin,
    "events_pivot" ->
      """SELECT CAST(epoch(date_trunc('day', ts)) AS BIGINT) AS day,
        |  CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
        |  CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "event_funnel" -> eventFunnelOracle,
    "user_retention_cohorts" ->
      """WITH w AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
        |c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1),
        |cells AS (SELECT CAST(epoch(cohort_week) AS BIGINT) AS cohort_epoch,
        |    CAST(date_diff('day', cohort_week, week) // 7 AS BIGINT) AS week_offset,
        |    CAST(count(*) AS BIGINT) AS n_users
        |  FROM w JOIN c USING (user_id) GROUP BY 1, 2),
        |sz AS (SELECT cohort_epoch, n_users AS cohort_size FROM cells WHERE week_offset = 0)
        |SELECT cohort_epoch, week_offset, n_users,
        |  CAST((n_users * 1000000) // cohort_size AS BIGINT) AS retention_ppm
        |FROM cells JOIN sz USING (cohort_epoch) ORDER BY 1, 2""".stripMargin,
    "event_transition_matrix" ->
      """WITH s AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
        |  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
        |SELECT c.from_type, to_type, n,
        |  CAST((n * 1000000) // n_from AS BIGINT) AS share_ppm
        |FROM c JOIN t ON c.from_type = t.from_type ORDER BY 1, 2""".stripMargin,
    "event_paths_top" ->
      """WITH s AS (SELECT event_type AS e1,
        |    lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |    lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        |  FROM events),
        |p AS (SELECT e1 || '>' || e2 || '>' || e3 AS path FROM s
        |  WHERE e2 IS NOT NULL AND e3 IS NOT NULL),
        |c AS (SELECT path, CAST(count(*) AS BIGINT) AS n FROM p GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS n_paths FROM c),
        |k AS (SELECT path, n FROM c ORDER BY n DESC, path LIMIT 20)
        |SELECT path, n, n_paths, CAST((n * 1000000) // n_paths AS BIGINT) AS share_ppm
        |FROM k, t ORDER BY n DESC, path""".stripMargin,
    "part_cooccurrence" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM b),
        |pp AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_part FROM b GROUP BY 1),
        |pr AS (SELECT a.l_partkey AS part_a, bb.l_partkey AS part_b,
        |    CAST(count(*) AS BIGINT) AS n_pairs
        |  FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey AND a.l_partkey < bb.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2)
        |SELECT part_a, part_b, n_pairs, pa.n_part AS n_a, pb.n_part AS n_b,
        |  CAST((n_pairs * n_baskets * 1000000) // (pa.n_part * pb.n_part) AS BIGINT) AS lift_ppm
        |FROM pr JOIN pp pa ON part_a = pa.l_partkey JOIN pp pb ON part_b = pb.l_partkey
        |CROSS JOIN nb
        |ORDER BY n_pairs DESC, part_a, part_b LIMIT 100""".stripMargin,
    "user_sessions" ->
      """WITH o AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events),
        |f AS (SELECT user_id, event_id, ts,
        |    CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM o),
        |s AS (SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f)
        |SELECT user_id,
        |  CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS session_start_sec,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(epoch(date_trunc('second', max(ts))) - epoch(date_trunc('second', min(ts))) AS BIGINT) AS duration_sec
        |FROM s GROUP BY user_id, sid ORDER BY 1, 2""".stripMargin,
    // sessionization CTEs replicate the user_sessions oracle verbatim,
    // then sweep: global running open-count ordered (t, starts-first,
    // user) — identical total order to the Spark two-phase form, so the
    // per-hour peak/carry columns are integer-exact cross-engine.
    "session_concurrency" ->
      """WITH o AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events),
        |f AS (SELECT user_id, event_id, ts,
        |    CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM o),
        |s AS (SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f),
        |sess AS (SELECT user_id,
        |    CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS start_sec,
        |    CAST(epoch(date_trunc('second', max(ts))) AS BIGINT) AS end_sec
        |  FROM s GROUP BY user_id, sid),
        |d AS (SELECT start_sec AS t, 1 AS d, user_id FROM sess
        |      UNION ALL SELECT end_sec AS t, -1 AS d, user_id FROM sess),
        |r AS (SELECT t, d, user_id, t - (t % 3600) AS hour,
        |    sum(d) OVER (ORDER BY t, d DESC, user_id
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run FROM d),
        |h AS (SELECT hour,
        |    CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
        |    CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends,
        |    CAST(max(run) AS BIGINT) AS max_run, sum(d) AS hd
        |  FROM r GROUP BY 1),
        |oo AS (SELECT hour, n_starts, n_ends, max_run,
        |    CAST(coalesce(sum(hd) OVER (ORDER BY hour
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS open_at_start
        |  FROM h)
        |SELECT hour, n_starts, n_ends, open_at_start,
        |  CAST(greatest(open_at_start, max_run) AS BIGINT) AS peak_concurrent
        |FROM oo ORDER BY hour""".stripMargin,
    "asof_join_orders" ->
      """WITH ord AS (SELECT o_custkey AS k, CAST(epoch(o_orderdate) AS BIGINT) AS t, 0 AS tag,
        |    o_orderkey AS orderkey, NULL::BIGINT AS event_id FROM orders),
        |ev AS (SELECT user_id AS k, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t, 1 AS tag,
        |    NULL::BIGINT AS orderkey, event_id FROM events),
        |u AS (SELECT * FROM ord UNION ALL SELECT * FROM ev),
        |w AS (SELECT k, tag, event_id,
        |    last_value(orderkey IGNORE NULLS) OVER (PARTITION BY k ORDER BY t, tag, orderkey
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_orderkey FROM u)
        |SELECT event_id, k AS user_id, asof_orderkey FROM w WHERE tag = 1 ORDER BY event_id""".stripMargin,
    // the oracle states the SEMANTICS as a plain inequality join — the
    // Spark side's bucketization must be invisible in the result
    "click_purchase_range_join" ->
      """WITH c AS (SELECT event_id, user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS click_sec
        |  FROM events WHERE event_type = 'click'),
        |p AS (SELECT user_id AS k,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS p_sec,
        |    CAST(round(value*100) AS BIGINT) AS v_cents
        |  FROM events WHERE event_type = 'purchase')
        |SELECT event_id, user_id, click_sec,
        |  CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(sum(v_cents) AS BIGINT) AS purchase_cents,
        |  CAST(min(p_sec - click_sec) AS BIGINT) AS first_purchase_gap_sec
        |FROM c JOIN p ON user_id = k
        |  AND p_sec >= click_sec AND p_sec < click_sec + 3600
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "attribution_last_touch" ->
      """WITH u AS (
        |  SELECT user_id AS k, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t,
        |    0 AS tag, event_id, event_type AS touch_ch, NULL::BIGINT AS v_cents
        |  FROM events WHERE event_type IN ('click', 'view')
        |  UNION ALL
        |  SELECT user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT),
        |    1, event_id, NULL::VARCHAR, CAST(round(value*100) AS BIGINT)
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (SELECT k, t, tag, v_cents,
        |    last_value(touch_ch IGNORE NULLS) OVER pw AS last_ch,
        |    last_value(CASE WHEN tag = 0 THEN t END IGNORE NULLS) OVER pw AS last_t
        |  FROM u WINDOW pw AS (PARTITION BY k ORDER BY t, tag, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |a AS (SELECT CASE WHEN last_ch IS NOT NULL AND t - last_t <= 86400
        |    THEN last_ch ELSE 'direct' END AS channel, v_cents
        |  FROM w WHERE tag = 1)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_conversions,
        |  CAST(sum(v_cents) AS BIGINT) AS value_cents
        |FROM a GROUP BY 1 ORDER BY 1""".stripMargin,
    "customer_trailing_features" ->
      """WITH b AS (SELECT o_orderkey, o_custkey,
        |    CAST(epoch(o_orderdate) AS BIGINT) AS order_sec,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS price_cents FROM orders)
        |SELECT o_orderkey, o_custkey, order_sec,
        |  CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY order_sec
        |    RANGE BETWEEN 7776000 PRECEDING AND 1 PRECEDING) AS BIGINT) AS prev_n_90d,
        |  CAST(coalesce(sum(price_cents) OVER (PARTITION BY o_custkey ORDER BY order_sec
        |    RANGE BETWEEN 7776000 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev_cents_90d,
        |  CAST((order_sec - lag(order_sec) OVER (PARTITION BY o_custkey
        |    ORDER BY order_sec, o_orderkey)) // 86400 AS BIGINT) AS days_since_prev
        |FROM b ORDER BY o_orderkey""".stripMargin,
    "orders_upsert_apply" ->
      """WITH upd AS (SELECT o_orderkey, o_orderstatus, o_totalprice + 1000 AS o_totalprice
        |    FROM orders WHERE o_orderkey % 10 = 0),
        |ins AS (SELECT o_orderkey + 100000000 AS o_orderkey, o_orderstatus, o_totalprice
        |    FROM orders WHERE o_orderkey % 1000 = 1),
        |delta AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
        |merged AS (
        |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
        |  UNION ALL SELECT * FROM delta)
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(round(o_totalprice*100)) AS BIGINT) AS total_cents
        |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin,
    "scd2_orders" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS valid_from_sec,
        |  CAST(lead(epoch(o_orderdate)) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) - 1 AS BIGINT) AS valid_to_sec
        |FROM orders ORDER BY o_custkey, valid_from_sec, o_orderkey""".stripMargin,
    "orders_price_histogram" -> {
      val b = 20
      val fenceCols = (1 until b).map(k =>
        s"min(CASE WHEN cum*$b >= n*$k THEN v END) AS f$k").mkString(", ")
      val bucketExpr = "1 + " + (1 until b).map(k =>
        s"CASE WHEN v > f$k THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH h AS (SELECT CAST(round(o_totalprice*100) AS BIGINT) // 10000 AS v,
         |    CAST(count(*) AS BIGINT) AS cnt FROM orders GROUP BY 1),
         |c AS (SELECT v, cnt, sum(cnt) OVER (ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM h),
         |t AS (SELECT sum(cnt) AS n FROM h),
         |f AS (SELECT $fenceCols FROM c, t),
         |a AS (SELECT CAST($bucketExpr AS BIGINT) AS bucket, cnt, v FROM c, f)
         |SELECT bucket, CAST(sum(cnt) AS BIGINT) AS n_orders,
         |  CAST(min(v) AS BIGINT) AS v_lo_100usd, CAST(max(v) AS BIGINT) AS v_hi_100usd
         |FROM a GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "shipping_delay_histogram" ->
      """WITH j AS (SELECT CAST((epoch(l_shipdate) - epoch(o_orderdate)) // 86400 AS BIGINT) AS delay_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h AS (SELECT delay_days, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY 1),
        |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h)
        |SELECT delay_days, n, CAST((n * 1000000) // total AS BIGINT) AS share_ppm
        |FROM h, t ORDER BY delay_days""".stripMargin,
    "supplier_delay_ranking" ->
      """WITH j AS (SELECT l_suppkey,
        |    CAST((epoch(l_shipdate) - epoch(o_orderdate)) // 86400 AS BIGINT) AS delay_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |a AS (SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_lineitems,
        |    CAST(2 * median(delay_days) AS BIGINT) AS med2_delay_days
        |  FROM j GROUP BY 1)
        |SELECT l_suppkey, n_lineitems, med2_delay_days
        |FROM a ORDER BY med2_delay_days DESC, l_suppkey LIMIT 20""".stripMargin,
    "shipping_delay_percentiles" ->
      """WITH j AS (SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS month_key,
        |    CAST((epoch(l_shipdate) - epoch(o_orderdate)) // 86400 AS BIGINT) AS delay_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT month_key, CAST(count(*) AS BIGINT) AS n_lineitems,
        |  CAST(quantile_disc(delay_days, 0.50) AS BIGINT) AS p50,
        |  CAST(quantile_disc(delay_days, 0.90) AS BIGINT) AS p90,
        |  CAST(quantile_disc(delay_days, 0.99) AS BIGINT) AS p99
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // the observed metrics are the same aggregates a separate audit scan
    // would compute — the point is they rode the main job's one pass
    "observed_order_audit" ->
      """SELECT CAST(count(DISTINCT CAST(epoch(o_orderdate) - epoch(o_orderdate) % 86400 AS BIGINT)) AS BIGINT) AS main_days,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_custkey,
        |  CAST(sum(round(o_totalprice*100)) AS BIGINT) AS revenue_cents
        |FROM orders""".stripMargin,
    "cdc_apply_changes" ->
      """WITH log AS (
        |  SELECT o_orderkey AS k, 'U' AS op, 2 AS seq, o_orderstatus,
        |    o_totalprice + 1000 AS p FROM orders WHERE o_orderkey % 10 = 0
        |  UNION ALL SELECT o_orderkey, 'D', 3, o_orderstatus, o_totalprice
        |    FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL SELECT o_orderkey + 100000000, 'I', 1, o_orderstatus, o_totalprice
        |    FROM orders WHERE o_orderkey % 1000 = 1),
        |latest AS (SELECT * FROM (
        |    SELECT *, row_number() OVER (PARTITION BY k ORDER BY seq DESC, op) AS rn FROM log)
        |  WHERE rn = 1),
        |applied AS (
        |  SELECT o_orderstatus, o_totalprice AS p FROM orders
        |    WHERE o_orderkey NOT IN (SELECT k FROM latest)
        |  UNION ALL SELECT o_orderstatus, p FROM latest WHERE op != 'D')
        |SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(round(p*100)) AS BIGINT) AS total_cents
        |FROM applied GROUP BY 1 ORDER BY 1""".stripMargin,
    "scd2_temporal_join" ->
      """WITH dim AS (SELECT o_custkey, o_orderkey,
        |    CAST(round(o_totalprice*100) AS BIGINT) AS price_cents,
        |    CAST(epoch(o_orderdate) AS BIGINT) AS vf,
        |    CAST(lead(epoch(o_orderdate)) OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) - 1 AS BIGINT) AS vt
        |  FROM orders),
        |ev AS (SELECT event_id, user_id,
        |    CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS t FROM events)
        |SELECT event_id, user_id, o_orderkey AS version_orderkey, price_cents
        |FROM ev JOIN dim ON user_id = o_custkey AND t >= vf AND (vt IS NULL OR t <= vt)
        |ORDER BY event_id""".stripMargin,
    // the oracle states the melt as the portable UNION ALL form; the
    // engine's native unpivot is the same relation by construction
    "lineitem_metrics_unpivot" ->
      """WITH m AS (
        |  SELECT l_returnflag, 'l_quantity' AS metric, CAST(round(l_quantity*100) AS BIGINT) AS v FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_extendedprice', CAST(round(l_extendedprice*100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_discount', CAST(round(l_discount*100) AS BIGINT) FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'l_tax', CAST(round(l_tax*100) AS BIGINT) FROM lineitem)
        |SELECT l_returnflag, metric, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(v) AS BIGINT) AS sum_centi,
        |  CAST(min(v) AS BIGINT) AS min_centi, CAST(max(v) AS BIGINT) AS max_centi
        |FROM m GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "user_stickiness_daily" ->
      """WITH pairs AS (SELECT DISTINCT CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 AS d,
        |    user_id FROM events),
        |mx AS (SELECT max(d) AS max_d FROM pairs),
        |w AS (SELECT unnest(generate_series(d, d + 6)) AS day, user_id FROM pairs),
        |wau AS (SELECT day, count(DISTINCT user_id) AS wau7 FROM w, mx
        |  WHERE day <= max_d GROUP BY 1),
        |dau AS (SELECT d AS day, count(*) AS dau FROM pairs GROUP BY 1)
        |SELECT wau.day AS day, CAST(coalesce(dau, 0) AS BIGINT) AS dau,
        |  CAST(wau7 AS BIGINT) AS wau7,
        |  CAST((coalesce(dau, 0) * 1000000) // wau7 AS BIGINT) AS stickiness_ppm
        |FROM wau LEFT JOIN dau ON wau.day = dau.day ORDER BY 1""".stripMargin,
    "order_value_winsorized" ->
      """WITH j AS (SELECT c_mktsegment, CAST(round(o_totalprice*100) AS BIGINT) AS cents_v
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |f AS (SELECT c_mktsegment,
        |    quantile_disc(cents_v // 10000, 0.05) * 10000 AS lo,
        |    quantile_disc(cents_v // 10000, 0.95) * 10000 AS hi
        |  FROM j GROUP BY 1)
        |SELECT j.c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(cents_v) AS BIGINT) AS sum_cents,
        |  CAST(sum(greatest(lo, least(hi, cents_v))) AS BIGINT) AS sum_winsorized_cents,
        |  CAST(sum(CASE WHEN cents_v < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_lo,
        |  CAST(sum(CASE WHEN cents_v > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped_hi,
        |  CAST(min(lo) AS BIGINT) AS lo_cents, CAST(min(hi) AS BIGINT) AS hi_cents
        |FROM j JOIN f ON j.c_mktsegment = f.c_mktsegment
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // the bucketed layout is a scan/shuffle optimization, never a
    // semantics change: the oracle is the plain join
    "bucketed_join_revenue" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
        |  CAST(sum(round(l_extendedprice*100)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // spike CTEs replicate the event_rate_anomaly oracle; session CTEs
    // replicate the user_sessions oracle; overlap is the plain interval
    // predicate (the engine's hour-bucket expansion is provably the same
    // relation: bucket containment == interval overlap on integer secs)
    "anomaly_session_impact" ->
      """WITH h AS (SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(2 * median(n) AS BIGINT) AS med2 FROM h GROUP BY 1),
        |d AS (SELECT h.event_type, hour, n, med2, abs(2 * n - med2) AS dev2
        |  FROM h JOIN m ON h.event_type = m.event_type),
        |md AS (SELECT event_type, CAST(2 * median(dev2) AS BIGINT) AS mad4 FROM d GROUP BY 1),
        |spikes AS (SELECT DISTINCT hour FROM d JOIN md ON d.event_type = md.event_type
        |  WHERE 2 * dev2 > 3 * mad4),
        |o AS (SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events),
        |f AS (SELECT user_id, event_id, ts,
        |    CASE WHEN prev IS NULL OR ts >= prev + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s FROM o),
        |s AS (SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid FROM f),
        |sess AS (SELECT user_id,
        |    CAST(epoch(date_trunc('second', min(ts))) AS BIGINT) AS start_sec,
        |    CAST(epoch(date_trunc('second', max(ts))) AS BIGINT) AS end_sec,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM s GROUP BY user_id, sid)
        |SELECT hour, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  CAST(sum(n_events) AS BIGINT) AS n_session_events
        |FROM spikes JOIN sess ON start_sec < hour + 3600 AND end_sec >= hour
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "daily_revenue_seasonal" ->
      """WITH d AS (SELECT CAST(epoch(o_orderdate) - epoch(o_orderdate) % 86400 AS BIGINT) AS day_sec,
        |    CAST(sum(round(o_totalprice*100)) AS BIGINT) AS x FROM orders GROUP BY 1),
        |w AS (SELECT day_sec, x, (day_sec // 86400) % 7 AS weekday FROM d),
        |m AS (SELECT weekday, CAST(2 * median(x) AS BIGINT) AS med2_wd FROM w GROUP BY 1),
        |r AS (SELECT day_sec, x, w.weekday, med2_wd, 2*x - med2_wd AS residual2
        |  FROM w JOIN m ON w.weekday = m.weekday),
        |md AS (SELECT CAST(2 * median(abs(residual2)) AS BIGINT) AS mad4 FROM r)
        |SELECT day_sec, x AS revenue_cents, CAST(weekday AS BIGINT) AS weekday, med2_wd,
        |  CAST(residual2 AS BIGINT) AS residual2, md.mad4,
        |  CAST(CASE WHEN 2*abs(residual2) > 3*md.mad4 THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
        |FROM r, md ORDER BY day_sec""".stripMargin,
    "daily_revenue_rank_stats" ->
      """WITH d AS (SELECT CAST(epoch(o_orderdate) - epoch(o_orderdate) % 86400 AS BIGINT) AS day_sec,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(round(o_totalprice*100)) AS BIGINT) AS revenue_cents
        |  FROM orders GROUP BY 1),
        |r AS (SELECT day_sec, n_orders, revenue_cents,
        |    CAST(rank() OVER w AS BIGINT) AS rk,
        |    CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |    CAST(count(*) OVER () AS BIGINT) AS n_days
        |  FROM d WINDOW w AS (ORDER BY revenue_cents DESC, day_sec))
        |SELECT day_sec, n_orders, revenue_cents, rk, quartile,
        |  CAST(((rk - 1) * 1000) // greatest(n_days - 1, 1) AS BIGINT) AS pct_milli
        |FROM r ORDER BY day_sec""".stripMargin,
    // the oracle recomputes the aggregate over ALL facts — equality
    // gates both the merge arithmetic and the replay ledger
    "daily_revenue_incremental" ->
      """SELECT CAST(epoch(o_orderdate) - epoch(o_orderdate) % 86400 AS BIGINT) AS day_sec,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(round(o_totalprice*100)) AS BIGINT) AS revenue_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "user_rfm_segments" -> {
      def fenceCte(src: String, pre: String) =
        s"""${pre}h AS (SELECT $src AS v, count(*) AS cnt FROM b GROUP BY 1),
           |${pre}c AS (SELECT v, sum(cnt) OVER (ORDER BY v
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM ${pre}h),
           |${pre}t AS (SELECT sum(cnt) AS n FROM ${pre}h),
           |${pre}f AS (SELECT min(CASE WHEN cum*4 >= n THEN v END) AS f1,
           |    min(CASE WHEN cum*4 >= 2*n THEN v END) AS f2,
           |    min(CASE WHEN cum*4 >= 3*n THEN v END) AS f3 FROM ${pre}c, ${pre}t)""".stripMargin
      s"""WITH per AS (SELECT o_custkey,
         |    CAST(max(epoch(o_orderdate)) AS BIGINT) AS last_sec,
         |    CAST(count(*) AS BIGINT) AS f_n,
         |    CAST(sum(round(o_totalprice*100)) AS BIGINT) AS m_cents
         |  FROM orders GROUP BY 1),
         |mx AS (SELECT CAST(max(epoch(o_orderdate)) AS BIGINT) AS maxd FROM orders),
         |b AS (SELECT o_custkey, (maxd - last_sec) // 86400 AS r_days, f_n,
         |    m_cents // 100000 AS m_bucket FROM per, mx),
         |${fenceCte("r_days", "r")},
         |${fenceCte("f_n", "q")},
         |${fenceCte("m_bucket", "m")},
         |seg AS (SELECT
         |    1 + CASE WHEN r_days > rf.f1 THEN 1 ELSE 0 END
         |      + CASE WHEN r_days > rf.f2 THEN 1 ELSE 0 END
         |      + CASE WHEN r_days > rf.f3 THEN 1 ELSE 0 END AS r_q,
         |    1 + CASE WHEN f_n > qf.f1 THEN 1 ELSE 0 END
         |      + CASE WHEN f_n > qf.f2 THEN 1 ELSE 0 END
         |      + CASE WHEN f_n > qf.f3 THEN 1 ELSE 0 END AS f_q,
         |    1 + CASE WHEN m_bucket > mf.f1 THEN 1 ELSE 0 END
         |      + CASE WHEN m_bucket > mf.f2 THEN 1 ELSE 0 END
         |      + CASE WHEN m_bucket > mf.f3 THEN 1 ELSE 0 END AS m_q
         |  FROM b, rf, qf, mf)
         |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
         |  CAST(m_q AS BIGINT) AS m_q, CAST(count(*) AS BIGINT) AS n_customers
         |FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin
    },
    // the star join through the filtered month dim is, by construction,
    // a month-range filter on the facts — the oracle states it that way
    "dpp_quarter_revenue" ->
      """SELECT CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS month_key,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(round(o_totalprice*100)) AS BIGINT) AS revenue_cents
        |FROM orders
        |WHERE year(o_orderdate) = 1996 AND month(o_orderdate) BETWEEN 4 AND 6
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "zorder_cluster_stats" -> {
      // the 32-term Morton interleave, generated to match Layout.zValue16
      val zTerms = (0 until 16).map(i =>
        s"(((a >> $i) & 1) << ${2 * i}) + (((b >> $i) & 1) << ${2 * i + 1})").mkString(" + ")
      s"""WITH base AS (SELECT o_custkey AS ck,
         |    CAST(epoch(o_orderdate) AS BIGINT) // 86400 AS day FROM orders),
         |dom AS (SELECT min(ck) AS ck_lo, max(ck) AS ck_hi,
         |    min(day) AS day_lo, max(day) AS day_hi FROM base),
         |m AS (SELECT ck, day,
         |    ((ck - ck_lo) * 65535) // greatest(ck_hi - ck_lo, 1) AS a,
         |    ((day - day_lo) * 65535) // greatest(day_hi - day_lo, 1) AS b
         |  FROM base CROSS JOIN dom),
         |z AS (SELECT ck, day, ($zTerms) AS zv FROM m)
         |SELECT CAST(zv >> 22 AS BIGINT) AS z_bucket, CAST(count(*) AS BIGINT) AS n,
         |  CAST(min(ck) AS BIGINT) AS ck_min, CAST(max(ck) AS BIGINT) AS ck_max,
         |  CAST(max(ck) - min(ck) AS BIGINT) AS ck_span,
         |  CAST(min(day) AS BIGINT) AS day_min, CAST(max(day) AS BIGINT) AS day_max,
         |  CAST(max(day) - min(day) AS BIGINT) AS day_span
         |FROM z GROUP BY 1 ORDER BY 1""".stripMargin
    },
    "join_key_skew_stats" ->
      """WITH c AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1),
        |t AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM events)
        |SELECT key, n, n_rows, CAST((n * 1000000) // n_rows AS BIGINT) AS share_ppm
        |FROM c CROSS JOIN t ORDER BY n DESC, key LIMIT 20""".stripMargin,
    "kanon_risk" ->
      """WITH g AS (SELECT c_nationkey, c_mktsegment, CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
        |    CAST(count(*) AS BIGINT) AS group_size
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT group_size, CAST(count(*) AS BIGINT) AS n_groups,
        |  CAST(sum(group_size) AS BIGINT) AS n_rows,
        |  CAST(group_size < 5 AS BIGINT) AS at_risk
        |FROM g GROUP BY 1 ORDER BY 1""".stripMargin,
    "data_expectations" ->
      """WITH u AS (
        |  SELECT 'customer_pk_unique' AS check_name, CAST(count(*) AS BIGINT) AS n_rows,
        |    CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT) AS n_bad FROM customer
        |  UNION ALL
        |  SELECT 'orders_custkey_fk', CAST(count(*) AS BIGINT),
        |    CAST(count(CASE WHEN c_custkey IS NULL THEN 1 END) AS BIGINT)
        |  FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) ON o_custkey = c_custkey
        |  UNION ALL
        |  SELECT 'lineitem_orderkey_fk', CAST(count(*) AS BIGINT),
        |    CAST(count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS BIGINT)
        |  FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) ON l_orderkey = o_orderkey
        |  UNION ALL
        |  SELECT 'orders_totalprice_positive', CAST(count(*) AS BIGINT),
        |    CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'lineitem_discount_range', CAST(count(*) AS BIGINT),
        |    CAST(count(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END) AS BIGINT) FROM lineitem
        |  UNION ALL
        |  SELECT 'events_user_nonnull', CAST(count(*) AS BIGINT),
        |    CAST(count(CASE WHEN user_id IS NULL THEN 1 END) AS BIGINT) FROM events
        |  UNION ALL
        |  SELECT 'documents_nchars_consistent', CAST(count(*) AS BIGINT),
        |    CAST(count(CASE WHEN n_chars <> length(text) THEN 1 END) AS BIGINT) FROM documents)
        |SELECT check_name, n_rows, n_bad,
        |  CAST(CASE WHEN n_bad = 0 THEN 1 ELSE 0 END AS BIGINT) AS ok
        |FROM u ORDER BY check_name""".stripMargin,
    "daily_revenue_cusum" ->
      """WITH d AS (SELECT CAST(epoch(o_orderdate) - epoch(o_orderdate) % 86400 AS BIGINT) AS day_sec,
        |    CAST(sum(round(o_totalprice*100)) AS BIGINT) AS x FROM orders GROUP BY 1),
        |m AS (SELECT CAST(2 * median(x) AS BIGINT) AS med2 FROM d),
        |v AS (SELECT day_sec, x, 2*x - med2 AS d2, med2 FROM d, m),
        |md AS (SELECT CAST(2 * median(abs(d2)) AS BIGINT) AS mad4 FROM v),
        |p AS (SELECT day_sec, x, med2, d2,
        |    sum(d2) OVER (ORDER BY day_sec ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS p
        |  FROM v),
        |c AS (SELECT day_sec, x, med2, p,
        |    p - least(0, min(p) OVER (ORDER BY day_sec
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cusum2
        |  FROM p)
        |SELECT day_sec, x AS revenue_cents, med2, md.mad4, CAST(cusum2 AS BIGINT) AS cusum2,
        |  CAST(CASE WHEN 2*cusum2 > 10*md.mad4 THEN 1 ELSE 0 END AS BIGINT) AS is_drift
        |FROM c, md ORDER BY day_sec""".stripMargin,
    "revenue_forecast_eval" ->
      """WITH d AS (SELECT CAST(epoch(o_orderdate) - epoch(o_orderdate) % 86400 AS BIGINT) AS day_sec,
        |    CAST(sum(round(o_totalprice*100)) AS BIGINT) AS x FROM orders GROUP BY 1),
        |s AS (SELECT d.day_sec, d.x,
        |    lag(d.x, 1) OVER (ORDER BY d.day_sec) AS f_naive,
        |    p.x AS f_snaive
        |  FROM d LEFT JOIN d p ON p.day_sec = d.day_sec - 604800),
        |e AS (
        |  SELECT 'naive' AS method, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(abs(x - f_naive)) AS BIGINT) AS abs_err_cents,
        |    CAST(sum(x) AS BIGINT) AS actual FROM s WHERE f_naive IS NOT NULL
        |  UNION ALL
        |  SELECT 'seasonal_naive', CAST(count(*) AS BIGINT),
        |    CAST(sum(abs(x - f_snaive)) AS BIGINT),
        |    CAST(sum(x) AS BIGINT) FROM s WHERE f_snaive IS NOT NULL)
        |SELECT method, n_days, abs_err_cents,
        |  CAST((abs_err_cents * 1000) // actual AS BIGINT) AS wape_milli
        |FROM e ORDER BY method""".stripMargin,
    "event_rate_anomaly" ->
      """WITH h AS (SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS hour,
        |    CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, CAST(2 * median(n) AS BIGINT) AS med2 FROM h GROUP BY 1),
        |d AS (SELECT h.event_type, hour, n, med2, abs(2 * n - med2) AS dev2
        |  FROM h JOIN m ON h.event_type = m.event_type),
        |md AS (SELECT event_type, CAST(2 * median(dev2) AS BIGINT) AS mad4 FROM d GROUP BY 1)
        |SELECT d.event_type, hour, n, med2, mad4, CAST(dev2 AS BIGINT) AS dev2,
        |  CAST(CASE WHEN 2 * dev2 > 3 * mad4 THEN 1 ELSE 0 END AS BIGINT) AS is_spike
        |FROM d JOIN md ON d.event_type = md.event_type
        |ORDER BY 1, 2""".stripMargin,
    "salted_event_segment_stats" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(round(value*100)) AS BIGINT) AS value_cents
        |FROM events JOIN customer ON user_id = c_custkey GROUP BY 1 ORDER BY 1""".stripMargin,
    // identical oracle to the salted form: skew handling (manual or AQE)
    // is a shuffle-layout choice, never a semantics change
    "aqe_skew_event_segment_stats" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(round(value*100)) AS BIGINT) AS value_cents
        |FROM events JOIN customer ON user_id = c_custkey GROUP BY 1 ORDER BY 1""".stripMargin,
    "customer_order_counts" ->
      """SELECT c_custkey,
        |       CAST(coalesce(cnt, 0) AS BIGINT) AS n_orders,
        |       CAST(coalesce(tot, 0) AS BIGINT) AS total_cents
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS cnt, CAST(sum(round(o_totalprice*100)) AS BIGINT) AS tot
        |  FROM orders GROUP BY 1) ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "daily_revenue_range7d" ->
      """WITH d AS (SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS day,
        |    CAST(sum(round(o_totalprice*100)) AS BIGINT) AS revenue_cents FROM orders GROUP BY 1)
        |SELECT day, revenue_cents,
        |  CAST(sum(revenue_cents) OVER (ORDER BY day RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing7d_cents
        |FROM d ORDER BY day""".stripMargin,
    "sales_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "order_value_percentiles" ->
      """WITH j AS (SELECT c_mktsegment, CAST(round(o_totalprice*100) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT c_mktsegment, v,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY v) AS rk,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS cnt FROM j),
        |pct(p) AS (VALUES (25), (50), (75), (90))
        |SELECT c_mktsegment, CAST(p AS BIGINT) AS p, v AS value
        |FROM r, pct WHERE rk = greatest(1, (cnt * p + 99) // 100)
        |ORDER BY 1, 2""".stripMargin,
    // the KLL-ish sketch's bound gate: the p±1-percent nearest-rank
    // bracket is recomputed here independently; within_bound is literal 1
    // (the Spark side computes the real verdict — a sketch outside its
    // bracket hash-mismatches)
    "order_value_percentiles_approx_check" ->
      """WITH j AS (SELECT c_mktsegment, CAST(round(o_totalprice*100) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT c_mktsegment, v,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY v) AS rk,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS cnt FROM j),
        |pct(p) AS (VALUES (25), (50), (75), (90)),
        |lo AS (SELECT c_mktsegment, CAST(p AS BIGINT) AS p, min(v) AS lo_value
        |  FROM r, pct WHERE rk = greatest(1, (cnt * (p-1) + 99) // 100) GROUP BY 1, 2),
        |hi AS (SELECT c_mktsegment, CAST(p AS BIGINT) AS p, min(v) AS hi_value
        |  FROM r, pct WHERE rk = greatest(1, (cnt * (p+1) + 99) // 100) GROUP BY 1, 2)
        |SELECT lo.c_mktsegment AS c_mktsegment, lo.p AS p,
        |       CAST(lo_value AS BIGINT) AS lo_value, CAST(hi_value AS BIGINT) AS hi_value,
        |       CAST(1 AS BIGINT) AS within_bound
        |FROM lo JOIN hi ON lo.c_mktsegment = hi.c_mktsegment AND lo.p = hi.p
        |ORDER BY 1, 2""".stripMargin,
    "top_tokens_per_source" ->
      """WITH norm AS (SELECT source, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
        |tok AS (SELECT source, unnest(string_split(t, ' ')) AS tok FROM norm),
        |cnt AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n FROM tok WHERE tok != '' GROUP BY 1, 2),
        |rnk AS (SELECT source, tok, n,
        |    row_number() OVER (PARTITION BY source ORDER BY n DESC, tok) AS rk FROM cnt)
        |SELECT source, tok, n, rk FROM rnk WHERE rk <= 5 ORDER BY source, rk""".stripMargin,
    "token_heavy_hitters" ->
      """WITH norm AS (SELECT regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
        |tok AS (SELECT unnest(string_split(t, ' ')) AS tok FROM norm WHERE t != ''),
        |cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS n FROM tok WHERE tok != '' GROUP BY 1),
        |tt AS (SELECT CAST(count(*) AS BIGINT) AS total FROM tok WHERE tok != '')
        |SELECT tok, n, total FROM cnt CROSS JOIN tt
        |WHERE n * 500 > total ORDER BY n DESC, tok""".stripMargin,
    "median_order_by_segment" ->
      """WITH j AS (SELECT c_mktsegment, o_orderkey, CAST(round(o_totalprice*100) AS BIGINT) AS v
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |r AS (SELECT c_mktsegment, v,
        |    row_number() OVER (PARTITION BY c_mktsegment ORDER BY v, o_orderkey) AS rk,
        |    count(*) OVER (PARTITION BY c_mktsegment) AS cnt FROM j),
        |m AS (SELECT c_mktsegment, cnt, v,
        |    (CASE WHEN rk = (cnt+1)//2 THEN 1 ELSE 0 END) +
        |    (CASE WHEN rk = (cnt+2)//2 THEN 1 ELSE 0 END) AS matched FROM r)
        |SELECT c_mktsegment, CAST(min(cnt) AS BIGINT) AS n_orders,
        |       CAST(sum(v * matched) AS BIGINT) AS median_x2_cents
        |FROM m WHERE matched > 0 GROUP BY 1 ORDER BY 1""".stripMargin,
    "parts_above_brand_avg" ->
      """WITH b AS (SELECT p_brand AS bb, CAST(sum(round(p_retailprice*100)) AS BIGINT) AS sum_cents,
        |    CAST(count(*) AS BIGINT) AS n FROM part GROUP BY 1)
        |SELECT p_partkey, p_brand, CAST(round(p_retailprice*100) AS BIGINT) AS price_cents
        |FROM part JOIN b ON p_brand = bb
        |WHERE CAST(round(p_retailprice*100) AS BIGINT) * n * 20 > sum_cents * 21
        |ORDER BY p_partkey""".stripMargin,
    // ---- correlated-subquery suite: the oracles keep the CORRELATED
    // form (EXISTS / NOT EXISTS / scalar subquery) so DuckDB's own
    // decorrelation independently checks the hand-decorrelated plans ----
    "q4_late_priority" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q11_brand_share" ->
      """WITH pb AS (
        |  SELECT p_brand, CAST(sum(round(l_extendedprice*100)) AS BIGINT) AS revenue_cents
        |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1),
        |t AS (SELECT CAST(sum(revenue_cents) AS BIGINT) AS tot,
        |             CAST(count(*) AS BIGINT) AS nb FROM pb)
        |SELECT p_brand, revenue_cents,
        |  CAST(revenue_cents * 1000000 // tot AS BIGINT) AS share_ppm
        |FROM pb CROSS JOIN t
        |WHERE revenue_cents * nb > tot
        |ORDER BY p_brand""".stripMargin,
    "q13_order_distribution" ->
      """WITH c AS (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders
        |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |  GROUP BY 1)
        |SELECT n_orders, CAST(count(*) AS BIGINT) AS n_customers
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_small_lines,
        |       CAST(sum(round(l_extendedprice*100)) AS BIGINT) AS revenue_cents
        |FROM lineitem l JOIN part ON l.l_partkey = p_partkey
        |WHERE CAST(floor(l.l_quantity) AS BIGINT) * 2 *
        |      (SELECT count(*) FROM lineitem li WHERE li.l_partkey = l.l_partkey)
        |    < (SELECT sum(CAST(floor(l_quantity) AS BIGINT)) FROM lineitem li
        |       WHERE li.l_partkey = l.l_partkey)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q21_waiting_supplier" ->
      """WITH l AS (
        |  SELECT l_orderkey, l_suppkey,
        |         (l_shipdate > o_orderdate + INTERVAL 30 DAY) AS late
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'),
        |po AS (
        |  SELECT l_orderkey,
        |         count(DISTINCT l_suppkey) AS n_supp,
        |         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late,
        |         min(CASE WHEN late THEN l_suppkey END) AS late_supp
        |  FROM l GROUP BY 1),
        |w AS (SELECT late_supp, CAST(count(*) AS BIGINT) AS n_waiting_orders
        |      FROM po WHERE n_supp > 1 AND n_late = 1 GROUP BY 1)
        |SELECT s_suppkey, s_name, n_waiting_orders
        |FROM w JOIN supplier ON late_supp = s_suppkey
        |ORDER BY n_waiting_orders DESC, s_suppkey""".stripMargin,
    "q22_dormant_customers" ->
      """WITH a AS (
        |  SELECT CAST(sum(round(c_acctbal*100)) AS BIGINT) AS s,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(sum(round(c_acctbal*100)) AS BIGINT) AS balance_cents
        |FROM customer CROSS JOIN a
        |WHERE CAST(round(c_acctbal*100) AS BIGINT) * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2001-01-01')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q6_discount_band" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(round(l_extendedprice*l_discount*100)) AS BIGINT) AS uplift_cents
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_nation_trade" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |       CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE s_nationkey <> c_nationkey
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q8_market_share" ->
      """SELECT r_name, CAST(year(o_orderdate) AS BIGINT) AS order_year,
        |  CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS total_cents,
        |  CAST(CAST(sum(CASE WHEN sn.n_name = 'NATION_0'
        |        THEN round(l_extendedprice*(1-l_discount)*100) ELSE 0 END) AS BIGINT) * 1000000
        |    // CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS BIGINT) AS share_ppm
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation cnn ON c_nationkey = cnn.n_nationkey
        |JOIN region ON cnn.n_regionkey = r_regionkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q10_returned_customers" ->
      """SELECT c_custkey, c_mktsegment,
        |       CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS returned_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2 ORDER BY returned_cents DESC, c_custkey LIMIT 20""".stripMargin,
    "q14_promo_share" ->
      """SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |        THEN round(l_extendedprice*(1-l_discount)*100) ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS total_cents,
        |  CAST(CAST(sum(CASE WHEN p_type = 'PROMO'
        |        THEN round(l_extendedprice*(1-l_discount)*100) ELSE 0 END) AS BIGINT) * 1000000
        |    // CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS BIGINT) AS promo_ppm
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q19_bracket_revenue" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey, CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, revenue_cents
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE revenue_cents = (SELECT max(revenue_cents) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        |  SELECT l_orderkey, CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 150)
        |SELECT o_orderkey, c_custkey, c_mktsegment,
        |       CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_sec, total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey LIMIT 20""".stripMargin,
    "q2_min_cost_supp" ->
      s"""WITH $partsuppCte,
         |cand AS (
         |  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         |         ps_supplycost_cents
         |  FROM partsupp
         |  JOIN part ON ps_partkey = p_partkey
         |    AND p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
         |  JOIN supplier ON ps_suppkey = s_suppkey
         |  JOIN nation ON s_nationkey = n_nationkey
         |  JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'),
         |mc AS (SELECT p_partkey AS mk, min(ps_supplycost_cents) AS min_cost
         |       FROM cand GROUP BY 1)
         |SELECT CAST(round(s_acctbal*100) AS BIGINT) AS s_acctbal_cents,
         |       s_name, n_name, p_partkey, p_name, ps_supplycost_cents
         |FROM cand JOIN mc ON p_partkey = mk AND ps_supplycost_cents = min_cost
         |ORDER BY s_acctbal_cents DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,
    "q9_product_profit" ->
      s"""WITH $partsuppCte
         |SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         |  CAST(sum(CAST(round(l_extendedprice*(1-l_discount)*100) AS BIGINT)
         |       - ps_supplycost_cents * CAST(floor(l_quantity) AS BIGINT)) AS BIGINT)
         |    AS profit_cents
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey AND p_name LIKE '%widget%'
         |JOIN partsupp ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin,
    "q12_shipmode_priority" ->
      s"""WITH h AS (
         |  SELECT l_orderkey, l_shipdate,
         |    md5('sm:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS msm,
         |    md5('cd:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS mcd,
         |    md5('rd:' || CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)) AS mrd
         |  FROM lineitem),
         |d AS (
         |  SELECT l_orderkey, l_shipdate,
         |    CASE ${psVal("msm")} % 7 WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP'
         |      WHEN 2 THEN 'AIR' WHEN 3 THEN 'RAIL' WHEN 4 THEN 'TRUCK'
         |      WHEN 5 THEN 'REG AIR' ELSE 'FOB' END AS shipmode,
         |    ${psVal("mcd")} % 61 - 30 AS commit_d,
         |    ${psVal("mrd")} % 30 + 1 AS receipt_d
         |  FROM h),
         |f AS (
         |  SELECT shipmode, l_orderkey FROM d
         |  WHERE shipmode IN ('MAIL', 'SHIP') AND commit_d > 0 AND commit_d < receipt_d
         |    AND CAST(epoch(l_shipdate) AS BIGINT) + receipt_d * 86400
         |        >= CAST(epoch(TIMESTAMP '1996-01-01') AS BIGINT)
         |    AND CAST(epoch(l_shipdate) AS BIGINT) + receipt_d * 86400
         |        < CAST(epoch(TIMESTAMP '1997-01-01') AS BIGINT))
         |SELECT shipmode,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
         |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
         |       THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
         |FROM f JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q16_supplier_cnt" ->
      s"""WITH $partsuppCte
         |SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
         |  CAST(count(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
         |FROM partsupp
         |JOIN part ON ps_partkey = p_partkey
         |WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
         |  AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
         |  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q20_promo_suppliers" ->
      s"""WITH $partsuppCte,
         |shipped AS (
         |  SELECT l_partkey, l_suppkey,
         |         CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS qty
         |  FROM lineitem
         |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         |    AND l_shipdate < TIMESTAMP '1997-01-01'
         |  GROUP BY 1, 2),
         |qual AS (
         |  SELECT DISTINCT ps_suppkey FROM partsupp
         |  JOIN shipped ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
         |  WHERE ps_availqty * 2 > qty
         |    AND ps_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%'))
         |SELECT s_suppkey, s_name FROM supplier
         |WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_1')
         |  AND s_suppkey IN (SELECT ps_suppkey FROM qual)
         |ORDER BY s_suppkey""".stripMargin,
    "daily_revenue_running" ->
      """WITH d AS (SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS day,
        |    CAST(sum(round(o_totalprice*100)) AS BIGINT) AS revenue_cents FROM orders GROUP BY 1)
        |SELECT day, revenue_cents,
        |  CAST(sum(revenue_cents) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents,
        |  CAST(sum(revenue_cents) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS trailing7_cents,
        |  revenue_cents - coalesce(lag(revenue_cents, 1) OVER (ORDER BY day), 0) AS delta_cents
        |FROM d ORDER BY day""".stripMargin,
    "customer_name_parse" ->
      """SELECT c_custkey, CAST(regexp_extract(c_name, '#(\d+)$', 1) AS BIGINT) AS name_id,
        |  upper(substr(lower(c_mktsegment), 1, 1)) || substr(lower(c_mktsegment), 2)
        |    || ': ' || ltrim(regexp_extract(c_name, '#(\d+)$', 1), '0') AS label,
        |  CAST(length(c_name) AS BIGINT) AS name_len
        |FROM customer
        |WHERE CAST(regexp_extract(c_name, '#(\d+)$', 1) AS BIGINT) = c_custkey
        |ORDER BY c_custkey""".stripMargin,
    "events_by_weekday" ->
      """SELECT (CAST(epoch(date_trunc('second', ts)) AS BIGINT) // 86400 + 4) % 7 AS weekday,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "text_top_bigrams" ->
      """WITH norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
        |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
        |bg AS (SELECT unnest(CASE WHEN len(toks) >= 2
        |    THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |    ELSE []::VARCHAR[] END) AS bigram FROM tk)
        |SELECT bigram, CAST(count(*) AS BIGINT) AS n FROM bg
        |GROUP BY 1 ORDER BY n DESC, bigram LIMIT 50""".stripMargin,
    // ---- deduplication ----
    "dedup_exact" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS doc_id FROM documents GROUP BY text ORDER BY 1""",
    "dedup_exact_norm" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
        |FROM documents GROUP BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |ORDER BY 1""".stripMargin,
    // the SQL-surface twin shares the DataFrame operator's oracle
    "dedup_exact_norm_sql" ->
      """SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS dup_count
        |FROM documents GROUP BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
        |ORDER BY 1""".stripMargin,
    "dedup_levenshtein" ->
      """WITH n AS (SELECT doc_id, source,
        |    substr(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), 1, 40) AS p FROM documents)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       CAST(levenshtein(a.p, b.p) AS BIGINT) AS lev_dist
        |FROM n a JOIN n b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE levenshtein(a.p, b.p) <= 5 ORDER BY 1, 2""".stripMargin,
    "dedup_minhash_lsh" -> minhashOracle,
    // the SQL-surface twin (native word_shingles through spark.sql)
    // shares the DataFrame operator's oracle
    "dedup_minhash_sql" -> minhashOracle,
    "incremental_dedup" -> incrementalDedupOracle,
    // merge ≡ fresh-save-over-union: the shard-merge query's oracle IS
    // the plain union-corpus dedup SQL (same relation, same semantics) —
    // any merge defect shows as a hash mismatch against it
    "incremental_dedup_shard_merge" -> incrementalDedupOracle,
    "dedup_clusters" -> dedupClustersOracle,
    "dedup_cluster_sizes" ->
      s"""WITH RECURSIVE pairs AS ($minhashOracle),
         |edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |reach(doc_id, lbl) AS (
         |  SELECT DISTINCT s, s FROM edges
         |  UNION
         |  SELECT e.d, r.lbl FROM reach r JOIN edges e ON e.s = r.doc_id),
         |labels AS (SELECT doc_id, min(lbl) AS lab FROM reach GROUP BY doc_id),
         |fam AS (SELECT lab, CAST(count(*) AS BIGINT) AS family_size FROM labels GROUP BY 1)
         |SELECT family_size, CAST(count(*) AS BIGINT) AS n_families
         |FROM fam GROUP BY 1 ORDER BY 1""".stripMargin,
    "join_size_estimate" ->
      """WITH a AS (SELECT user_id AS key, CAST(count(*) AS BIGINT) AS na FROM events GROUP BY 1),
        |b AS (SELECT c_custkey AS key, CAST(count(*) AS BIGINT) AS nb FROM customer GROUP BY 1),
        |j AS (SELECT na, nb FROM a JOIN b USING (key))
        |SELECT CAST(count(*) AS BIGINT) AS n_matching_keys,
        |  CAST(sum(na * nb) AS BIGINT) AS join_rows,
        |  CAST(max(na * nb) AS BIGINT) AS max_key_rows
        |FROM j""".stripMargin,
    "dedup_simhash" -> simhashOracle,
    "simhash_band_stats" -> simhashBandStatsOracle,
    "dedup_ngram_jaccard" -> ngramJaccardOracle,
    "dedup_sparse_cosine" -> sparseCosineOracle,
    "graph_pagerank" -> pagerankOracle(),
    "graph_triangles" -> triangleOracle,
    "graph_link_prediction" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        |ue AS (SELECT a.l_partkey AS u, bb.l_partkey AS v
        |  FROM b a JOIN b bb ON a.l_orderkey = bb.l_orderkey AND a.l_partkey < bb.l_partkey
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |adj AS (SELECT u AS ctr, v AS nbr FROM ue UNION ALL SELECT v, u FROM ue),
        |deg AS (SELECT nbr AS x, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY 1),
        |ctrs AS (SELECT adj.ctr, adj.nbr FROM adj JOIN deg ON adj.ctr = deg.x WHERE deg.d <= 64),
        |pairs AS (SELECT a.nbr AS pu, b.nbr AS pv, CAST(count(*) AS BIGINT) AS cn
        |  FROM ctrs a JOIN ctrs b ON a.ctr = b.ctr AND a.nbr < b.nbr GROUP BY 1, 2),
        |np AS (SELECT pu, pv, cn FROM pairs
        |  WHERE NOT EXISTS (SELECT 1 FROM ue WHERE u = pu AND v = pv))
        |SELECT CAST(pu AS BIGINT) AS u, CAST(pv AS BIGINT) AS v,
        |  cn AS common_neighbors,
        |  CAST(cn * 1000000 // (du.d + dv.d - cn) AS BIGINT) AS jaccard_ppm
        |FROM np JOIN deg du ON pu = du.x JOIN deg dv ON pv = dv.x
        |ORDER BY common_neighbors DESC, jaccard_ppm DESC, u, v LIMIT 50""".stripMargin,
    "graph_communities" -> labelPropagationOracle(),
    // exact-substring overlap: identical positional-gram construction
    // (md5 of 8-token slices), aligned-offset runs, contiguity by
    // count==span, longest run per pair in tokens
    "dedup_substring" ->
      """WITH norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
        |tk AS (SELECT doc_id, string_split(t, ' ') AS toks FROM norm),
        |grams AS (SELECT doc_id, i AS pos, md5(array_to_string(toks[i:i+7], ' ')) AS g
        |  FROM tk, unnest(generate_series(1, len(toks) - 7)) AS u(i)
        |  WHERE len(toks) >= 8),
        |rare AS (SELECT g FROM (SELECT g, count(DISTINCT doc_id) AS df FROM grams GROUP BY 1) WHERE df <= 1000),
        |idx AS (SELECT grams.* FROM grams JOIN rare USING (g)),
        |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb
        |  FROM idx a JOIN idx b ON a.g = b.g AND a.doc_id < b.doc_id),
        |runs AS (SELECT doc_a, doc_b, pa - pb AS off,
        |    count(DISTINCT pa) AS n, max(pa) - min(pa) + 1 AS span
        |  FROM p GROUP BY 1, 2, 3)
        |SELECT doc_a, doc_b, CAST(max(span + 7) AS BIGINT) AS overlap_tokens
        |FROM runs WHERE n = span AND span >= 5 GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "dedup_embedding_cosine" -> embeddingNearDupOracle,
    "dedup_embedding_hyperplane" -> embeddingHyperplaneOracle,
    // ---- similarity search ----
    "ann_bruteforce_topk" -> annBruteForceOracle,
    // the SQL-surface spelling computes the identical result, so it shares
    // the DataFrame operator's oracle verbatim
    "ann_bruteforce_sql" -> annBruteForceOracle,
    "ann_lsh_topk" -> annLshOracle,
    "embedding_truncation_recall" -> truncationRecallOracle,
    "ann_lsh_recall" -> lshRecallOracle,
    "ann_lsh_multiprobe_topk" -> annLshMultiProbeOracle,
    "ann_bucket_stats" ->
      s"""SELECT bucket, CAST(count(*) AS BIGINT) AS n
         |FROM (SELECT $BucketSql AS bucket FROM embeddings) GROUP BY 1 ORDER BY 1""".stripMargin,
    // ---- text analysis ----
    "text_stats" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_tokens,
        |  CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT) AS content_chars,
        |  round(CAST(length(regexp_replace(text, '\s+', '', 'g')) AS DOUBLE)
        |        / greatest(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE), 1.0), 4) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_token_counts" ->
      """SELECT doc_id, CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_langid" ->
      """SELECT doc_id, lang AS label_lang,
        |  CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS BIGINT) AS en_stopwords,
        |  CASE WHEN len(regexp_extract_all(text, '\S+')) = 0 THEN 'unk'
        |       WHEN CAST(len(regexp_extract_all(lower(text), '\b(the|a|an|and|of|to|in|is|it)\b')) AS DOUBLE)
        |            / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) >= 0.05 THEN 'en'
        |       ELSE 'unk' END AS predicted
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" ->
      """SELECT doc_id,
        |  round(least(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) / 20.0, 1.0)
        |        * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
        |                       / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)), 6) AS quality_score,
        |  round(least(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) / 20.0, 1.0)
        |        * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
        |                       / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)), 6) >= 0.5 AS keep
        |FROM documents ORDER BY doc_id""".stripMargin,
    "doc_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp,
        |  substr(md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')), 1, 8) AS fp_prefix
        |FROM documents ORDER BY doc_id""".stripMargin,
    "corpus_sample_stratified" -> stratifiedSampleOracle,
    "aqp_revenue_estimate_check" -> aqpRevenueOracle,
    "orders_benford_audit" -> benfordOracle,
    "segment_target_encoding" -> targetEncodingOracle,
    "event_lag_correlation" -> lagCorrelationOracle,
    "ab_split_check" -> abSplitOracle,
    "aqp_segment_revenue_check" -> aqpSegmentOracle,
    "pareto_days" ->
      """WITH d AS (SELECT CAST(epoch(date_trunc('day', o_orderdate)) AS BIGINT) AS day_sec,
        |    CAST(count(*) AS BIGINT) AS n_orders,
        |    CAST(sum(round(o_totalprice)) AS BIGINT) AS revenue_dollars
        |  FROM orders GROUP BY 1)
        |SELECT day_sec, n_orders, revenue_dollars FROM d a
        |WHERE NOT EXISTS (SELECT 1 FROM d b
        |  WHERE b.n_orders >= a.n_orders AND b.revenue_dollars >= a.revenue_dollars
        |    AND (b.n_orders > a.n_orders OR b.revenue_dollars > a.revenue_dollars))
        |ORDER BY n_orders DESC, day_sec""".stripMargin,
    "train_test_split" -> trainTestSplitOracle,
    "leakage_safe_split" -> leakageSafeSplitOracle,
    "event_funnel_windowed" -> eventFunnelWindowedOracle,
    "funnel_time_to_convert" -> funnelTimeToConvertOracle,
    "event_funnel_sessionized" -> eventFunnelSessionizedOracle,
    "substring_gram_stats" -> substringGramStatsOracle,
    "incremental_dedup_after_diff" -> incrementalDedupAfterDiffOracle,
    "corpus_diff" -> corpusDiffOracle,
    "doc_vector_hash" -> docVectorHashOracle,
    "doc_lexical_ann" -> docLexicalAnnOracle,
    "chunk_documents" -> chunkDocumentsOracle,
    "dedup_chunks" -> dedupChunksOracle,
    "doc_winnow_fingerprint" -> winnowFingerprintOracle,
    "dedup_keep_best" -> dedupKeepBestOracle,
    "dedup_bloom_check" -> bloomCheckOracle,
    "pack_shards" -> packShardsOracle,
    // the md5 hex string is identical across engines; the bucket is its
    // 2-char prefix and positions rank (key, doc_id) within the bucket
    "train_order_shuffle" ->
      """WITH k AS (SELECT doc_id,
        |    md5(CAST(doc_id AS VARCHAR) || ':epoch-0') AS sk FROM documents)
        |SELECT substr(sk, 1, 2) AS bucket,
        |       CAST(row_number() OVER (PARTITION BY substr(sk, 1, 2)
        |                               ORDER BY sk, doc_id) AS BIGINT) AS pos,
        |       doc_id
        |FROM k ORDER BY bucket, pos""".stripMargin,
    "batch_padding_stats" -> batchPaddingStatsOracle,
    "dedup_rate_by_source" -> dedupRateBySourceOracle,
    "token_distribution_shift" ->
      """WITH norm AS (SELECT source, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
        |tok AS (SELECT source, unnest(string_split(t, ' ')) AS tok FROM norm),
        |sc AS (SELECT source, tok, CAST(count(*) AS BIGINT) AS n_st
        |  FROM tok WHERE tok != '' GROUP BY 1, 2),
        |cc AS (SELECT tok, CAST(sum(n_st) AS BIGINT) AS n_ct FROM sc GROUP BY 1),
        |st AS (SELECT source, CAST(sum(n_st) AS BIGINT) AS n_s,
        |  CAST(count(*) AS BIGINT) AS vocab_s FROM sc GROUP BY 1),
        |ct AS (SELECT CAST(sum(n_ct) AS BIGINT) AS n_c, CAST(count(*) AS BIGINT) AS v FROM cc),
        |terms AS (SELECT sc.source, sc.n_st,
        |    CAST(length(bin((sc.n_st + 1) * (ct.n_c + ct.v))) - 1 AS BIGINT)
        |      - CAST(length(bin((cc.n_ct + 1) * (st.n_s + ct.v))) - 1 AS BIGINT) AS d_bits
        |  FROM sc JOIN cc USING (tok) JOIN st ON sc.source = st.source CROSS JOIN ct),
        |agg AS (SELECT source, CAST(sum(n_st * d_bits) AS BIGINT) AS shift_bits
        |  FROM terms GROUP BY 1)
        |SELECT st.source, st.n_s AS n_tokens, st.vocab_s AS vocab, agg.shift_bits,
        |  CAST((1000 * agg.shift_bits) // st.n_s AS BIGINT) AS milli_bits_per_token
        |FROM agg JOIN st ON agg.source = st.source ORDER BY st.source""".stripMargin,
    "text_token_rarity" ->
      """WITH norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
        |tk AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm),
        |tk2 AS (SELECT doc_id, tok FROM tk WHERE len(tok) > 0),
        |tf AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM tk2 GROUP BY 1),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS n_total FROM tf),
        |sc AS (SELECT doc_id, (tf * 1000000) // n_total AS p_ppm, tf FROM tk2 JOIN tf USING (tok), tot)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(p_ppm) // count(*) AS BIGINT) AS mean_prob_ppm,
        |  CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "token_rarity_against" ->
      """WITH norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
        |tk AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm),
        |tk2 AS (SELECT doc_id, tok FROM tk WHERE len(tok) > 0),
        |rtf AS (SELECT tok, CAST(count(*) AS BIGINT) AS tf FROM tk2 WHERE doc_id % 2 = 0 GROUP BY 1),
        |tot AS (SELECT CAST(sum(tf) AS BIGINT) AS n_total FROM rtf),
        |sc AS (SELECT b.doc_id, COALESCE((rtf.tf * 1000000) // tot.n_total, 0) AS p_ppm, rtf.tf
        |  FROM tk2 b LEFT JOIN rtf ON b.tok = rtf.tok CROSS JOIN tot
        |  WHERE b.doc_id % 2 = 1)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_toks,
        |  CAST(sum(p_ppm) // count(*) AS BIGINT) AS mean_prob_ppm,
        |  CAST(sum(CASE WHEN tf IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "lm_bigram_surprisal" ->
      """WITH norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
        |tl AS (SELECT doc_id, string_split(t, ' ') AS l FROM norm),
        |bgq AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 1),
        |    i -> l[i] || ' ' || l[i + 1])) AS bg FROM tl WHERE len(l) >= 2),
        |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bgq GROUP BY 1),
        |c1 AS (SELECT string_split(bg, ' ')[1] AS prev, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        |vt AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
        |  FROM (SELECT unnest(string_split(t, ' ')) AS tok FROM norm) WHERE len(tok) > 0),
        |lm AS (SELECT bg, CAST(length(bin((c1 + v) // (c2 + 1))) - 1 AS BIGINT) AS bits
        |  FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.prev, vt),
        |sc AS (SELECT doc_id, bits FROM bgq JOIN lm USING (bg))
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(bits) AS BIGINT) AS total_bits,
        |  CAST((sum(bits) * 1000) // count(*) AS BIGINT) AS bits_per_bigram_milli
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "perplexity_buckets" ->
      """WITH norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
        |tl AS (SELECT doc_id, string_split(t, ' ') AS l FROM norm),
        |bgq AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 1),
        |    i -> l[i] || ' ' || l[i + 1])) AS bg FROM tl WHERE len(l) >= 2),
        |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM bgq GROUP BY 1),
        |c1 AS (SELECT string_split(bg, ' ')[1] AS prev, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        |vt AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
        |  FROM (SELECT unnest(string_split(t, ' ')) AS tok FROM norm) WHERE len(tok) > 0),
        |lm AS (SELECT bg, CAST(length(bin((c1 + v) // (c2 + 1))) - 1 AS BIGINT) AS bits
        |  FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.prev, vt),
        |sc AS (SELECT doc_id, bits FROM bgq JOIN lm USING (bg)),
        |sco AS (SELECT sc.doc_id, d.source,
        |    CAST((sum(bits) * 1000) // count(*) AS BIGINT) AS bpb
        |  FROM sc JOIN documents d ON sc.doc_id = d.doc_id GROUP BY 1, 2),
        |hist AS (SELECT source, bpb, CAST(count(*) AS BIGINT) AS n FROM sco GROUP BY 1, 2),
        |marks AS (SELECT source, bpb,
        |    sum(n) OVER (PARTITION BY source ORDER BY bpb
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(n) OVER (PARTITION BY source) AS n_src FROM hist),
        |t1 AS (SELECT source, min(bpb) AS t1_milli FROM marks
        |  WHERE cum >= (n_src + 2) // 3 GROUP BY 1),
        |t2 AS (SELECT source, min(bpb) AS t2_milli FROM marks
        |  WHERE cum >= (2 * n_src + 2) // 3 GROUP BY 1)
        |SELECT sco.doc_id, sco.source, sco.bpb AS bits_per_bigram_milli,
        |  t1_milli, t2_milli,
        |  CASE WHEN bpb <= t1_milli THEN 'head'
        |       WHEN bpb <= t2_milli THEN 'middle' ELSE 'tail' END AS bucket
        |FROM sco JOIN t1 USING (source) JOIN t2 USING (source)
        |ORDER BY doc_id""".stripMargin,
    "lm_surprisal_against" ->
      """WITH norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
        |tl AS (SELECT doc_id, string_split(t, ' ') AS l FROM norm),
        |rbg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 1),
        |    i -> l[i] || ' ' || l[i + 1])) AS bg FROM tl WHERE len(l) >= 2 AND doc_id % 2 = 0),
        |c2 AS (SELECT bg, CAST(count(*) AS BIGINT) AS c2 FROM rbg GROUP BY 1),
        |c1 AS (SELECT string_split(bg, ' ')[1] AS prev, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        |vt AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
        |  FROM (SELECT unnest(string_split(t, ' ')) AS tok FROM norm WHERE doc_id % 2 = 0) WHERE len(tok) > 0),
        |lm AS (SELECT bg, CAST(length(bin((c1 + v) // (c2 + 1))) - 1 AS BIGINT) AS bits
        |  FROM c2 JOIN c1 ON string_split(c2.bg, ' ')[1] = c1.prev, vt),
        |lmp AS (SELECT prev, CAST(length(bin(c1 + v)) - 1 AS BIGINT) AS miss_bits FROM c1, vt),
        |dbg AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS prev
        |  FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 1),
        |      i -> l[i] || ' ' || l[i + 1])) AS bg FROM tl WHERE len(l) >= 2 AND doc_id % 2 = 1)),
        |sc AS (SELECT doc_id,
        |    COALESCE(lm.bits, lmp.miss_bits, CAST(length(bin(vt.v)) - 1 AS BIGINT)) AS s,
        |    lm.bits AS b
        |  FROM dbg LEFT JOIN lm USING (bg) LEFT JOIN lmp ON dbg.prev = lmp.prev CROSS JOIN vt)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(s) AS BIGINT) AS total_bits,
        |  CAST((sum(s) * 1000) // count(*) AS BIGINT) AS bits_per_bigram_milli,
        |  CAST(sum(CASE WHEN b IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unseen
        |FROM sc GROUP BY 1 ORDER BY 1""".stripMargin,
    "dsir_weights" ->
      s"""WITH $DsirCte
         |SELECT doc_id, n_bigrams, target_bits, base_bits, dsir_milli
         |FROM dw ORDER BY doc_id""".stripMargin,
    "dsir_sample" ->
      s"""WITH $DsirCte
         |SELECT doc_id, dsir_milli FROM dw
         |ORDER BY dsir_milli DESC, doc_id LIMIT 100""".stripMargin,
    "quality_calibrated" ->
      """WITH s AS (SELECT doc_id, source,
        |    CAST(floor(round(least(CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) / 20.0, 1.0)
        |      * (1.0 - least(CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\s]', '', 'g')) AS DOUBLE)
        |                     / greatest(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0)), 6) * 1000) AS BIGINT) AS q_milli
        |  FROM documents),
        |h AS (SELECT source, q_milli, CAST(count(*) AS BIGINT) AS n FROM s GROUP BY 1, 2),
        |c AS (SELECT source, q_milli,
        |    sum(n) OVER (PARTITION BY source ORDER BY q_milli DESC
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        |    sum(n) OVER (PARTITION BY source) AS n_src FROM h),
        |thr AS (SELECT source, max(q_milli) AS src_threshold_milli FROM c
        |  WHERE cum >= (n_src * 25 + 99) // 100 GROUP BY 1)
        |SELECT s.doc_id, s.source, s.q_milli,
        |  CAST(thr.src_threshold_milli AS BIGINT) AS src_threshold_milli,
        |  s.q_milli >= thr.src_threshold_milli AS keep
        |FROM s JOIN thr ON s.source = thr.source ORDER BY s.doc_id""".stripMargin,
    "vocab_growth" ->
      """WITH norm AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t FROM documents),
        |tk AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tok FROM norm),
        |tk2 AS (SELECT doc_id, tok FROM tk WHERE len(tok) > 0),
        |occ AS (SELECT doc_id // 50 AS bucket, CAST(count(*) AS BIGINT) AS n_occ FROM tk2 GROUP BY 1),
        |fd AS (SELECT tok, min(doc_id) AS fdoc FROM tk2 GROUP BY 1),
        |nw AS (SELECT fdoc // 50 AS bucket, CAST(count(*) AS BIGINT) AS n_new FROM fd GROUP BY 1),
        |d AS (SELECT doc_id // 50 AS bucket, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1)
        |SELECT d.bucket AS bucket, d.n_docs,
        |  CAST(sum(COALESCE(occ.n_occ, 0)) OVER (ORDER BY d.bucket
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
        |  CAST(sum(COALESCE(nw.n_new, 0)) OVER (ORDER BY d.bucket
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
        |FROM d LEFT JOIN occ ON d.bucket = occ.bucket LEFT JOIN nw ON d.bucket = nw.bucket
        |ORDER BY bucket""".stripMargin,
    "tokenizer_fertility" ->
      s"""WITH a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(length(text)) AS BIGINT) AS chars,
         |    CAST(sum(len(regexp_extract_all(text, '\\S+'))) AS BIGINT) AS ws_tokens,
         |    CAST(sum(len(regexp_extract_all(text, '${graft.functions.TextFunctions.BpePattern}'))) AS BIGINT) AS bpe_tokens
         |  FROM documents GROUP BY 1)
         |SELECT source, n_docs,
         |  CAST((1000 * chars) // greatest(bpe_tokens, 1) AS BIGINT) AS chars_per_bpe_milli,
         |  CAST((1000 * bpe_tokens) // greatest(ws_tokens, 1) AS BIGINT) AS bpe_per_ws_milli
         |FROM a ORDER BY source""".stripMargin,
    "corpus_curated" -> curatedCorpusOracle,
    "curation_kill_reasons" ->
      s"""WITH f AS (SELECT doc_id, source, text,
         |    coalesce(md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')), '') AS fp
         |  FROM documents),
         |k AS (SELECT fp, min(doc_id) AS keeper FROM f GROUP BY 1),
         |t AS (SELECT f.source,
         |    CASE WHEN $QualityScoreSql < 0.5 THEN 'quality'
         |         WHEN ($LangIdEnSql) != 'en' THEN 'lang'
         |         WHEN doc_id != keeper THEN 'exact_dup'
         |         ELSE 'admitted' END AS reason
         |  FROM f JOIN k USING (fp)),
         |s AS (SELECT source, CAST(count(*) AS BIGINT) AS n_src FROM t GROUP BY 1)
         |SELECT t.source, reason, CAST(count(*) AS BIGINT) AS n, s.n_src,
         |  CAST((count(*) * 1000000) // s.n_src AS BIGINT) AS share_ppm
         |FROM t JOIN s ON t.source = s.source GROUP BY t.source, reason, s.n_src
         |ORDER BY t.source, reason""".stripMargin,
    "text_repetition" -> repetitionOracle,
    "distinctive_terms" -> distinctiveTermsOracle,
    "pii_scrub_stats" -> piiScrubOracle,
    "length_outlier_stats" -> lengthOutlierOracle,
    "bm25_search" -> bm25Oracle,
    "bm25_search_indexed" -> bm25Oracle,
    "bm25_after_remove" ->
      bm25OracleOver("(SELECT * FROM documents WHERE doc_id % 3 != 0)"),
    "forget_cascade" ->
      """WITH c AS (SELECT CAST(count(*) AS BIGINT) AS total,
        |    CAST(sum(CASE WHEN doc_id % 10 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS gone
        |  FROM documents)
        |SELECT family, total - gone AS n_remaining,
        |       CAST(0 AS BIGINT) AS n_forgotten_present
        |FROM c CROSS JOIN
        |  (SELECT unnest(['bm25_postings', 'dedup_fp', 'ivf_cells']) AS family)
        |ORDER BY family""".stripMargin,
    "cross_source_dup_matrix" -> crossSourceDupOracle,
    "minhash_band_stats" -> minhashBandStatsOracle,
    "benchmark_contamination" -> benchmarkContaminationOracle,
    "mixture_weights" -> mixtureWeightsOracle,
    "mixture_budget_rates" ->
      """WITH per AS (SELECT source,
        |    CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t_total,
        |    CAST(count(*) AS BIGINT) AS n_sources FROM per),
        |b AS (SELECT source, n_tokens,
        |    CAST((t_total // 2) // n_sources AS BIGINT) AS target_tokens FROM per, t),
        |r AS (SELECT source, n_tokens, target_tokens,
        |    CAST(least(1000000, (target_tokens * 1000000) // greatest(n_tokens, 1)) AS BIGINT) AS rate_ppm
        |  FROM b)
        |SELECT source, n_tokens, target_tokens, rate_ppm,
        |  CAST((n_tokens * rate_ppm) // 1000000 AS BIGINT) AS expected_tokens,
        |  CAST(greatest(0, target_tokens - (n_tokens * rate_ppm) // 1000000) AS BIGINT) AS deficit_tokens
        |FROM r ORDER BY source""".stripMargin,
    "mixture_sample_temperature" -> temperatureSampleOracle,
    "source_cap_sample" -> sourceCapOracle,
    "top_repeated_shingles" -> topRepeatedShinglesOracle,
    "doc_shingle_novelty" ->
      s"""WITH $ShingleCte,
         |sdf AS (SELECT g, CAST(count(*) AS BIGINT) AS df FROM ex GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
         |  CAST(((count(*) - sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)) * 1000) // count(*) AS BIGINT) AS novelty_milli
         |FROM ex JOIN sdf ON ex.g = sdf.g GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "embedding_norm_stats" -> embeddingNormStatsOracle,
    // per-ELEMENT micro-rounded errors, then integer sums only — no
    // ordered-float-sum machinery needed anywhere in this oracle
    "embedding_int8_stats" ->
      """WITH d AS (SELECT i AS pos, min(embedding[i+1]::DOUBLE) AS mn, max(embedding[i+1]::DOUBLE) AS mx
        |  FROM embeddings, unnest(range(64)) AS u(i) GROUP BY 1),
        |e AS (SELECT vec_id, label, i, embedding[i+1]::DOUBLE AS x
        |  FROM embeddings, unnest(range(64)) AS u(i)),
        |er AS (SELECT vec_id, label,
        |    CAST(floor(abs(x - (mn + (CASE WHEN mx = mn THEN 0 ELSE floor((x - mn) * 255.0 / (mx - mn) + 0.5) END) * (mx - mn) / 255.0)) * 1000000.0 + 0.5) AS BIGINT) AS em
        |  FROM e JOIN d ON e.i = d.pos),
        |v AS (SELECT vec_id, label, CAST(sum(em) AS BIGINT) AS err_micro FROM er GROUP BY 1, 2)
        |SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n_vecs,
        |  CAST(sum(err_micro) AS BIGINT) AS sum_err_micro,
        |  CAST(max(err_micro) AS BIGINT) AS max_err_micro
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "corpus_summary" ->
      """SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS total_chars,
        |  CAST(sum(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // ---- multimodal plumbing ----
    // recomputes the FULL fixed-point 2D-DCT pHash relationally: the
    // 8×32 weight table is inlined from Multimodal.DctW (one source of
    // truth), bytes come from hex(encode(text)) nibble parsing (this
    // DuckDB can't substring a BLOB), and the transform is exact long
    // arithmetic end-to-end — so signature, banding, cap, and hamming
    // verify are all hash-gated cross-engine, no inlined results. The
    // whole transform runs as per-ROW list lambdas (decode each byte
    // once, separable row/column DCT passes over 256/64-element lists):
    // the relational join-and-aggregate formulation of the same math
    // measured 178 s at sf0.1 where this reads 16 s
    "media_phash_dedup" -> {
      val wList = (for (u <- 0 until 8; x <- 0 until 32)
        yield operators.Multimodal.DctW(u)(x)).mkString("[", ",", "]")
      def band(b: Int) =
        s"""CAST(list_sum(list_transform(range(${16 * b}, ${16 * (b + 1)}), k ->
           |    CASE WHEN k > 0 AND f[k+1] > med THEN 1 << (k % 16) ELSE 0 END)) AS BIGINT) AS k$b""".stripMargin
      val bandsUnion = (0 until 4).map(b =>
        s"SELECT doc_id, $b AS band_idx, k$b AS band_key FROM sigw").mkString(" UNION ALL ")
      val hamSum = (0 until 4).map(b => s"bit_count(xor(wa.k$b, wb.k$b))").mkString(" + ")
      s"""WITH corpus AS (SELECT doc_id, text FROM documents
         |  UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 97 = 0),
         |wconst AS (SELECT $wList AS wl),
         |hx AS (SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS len FROM corpus),
         |bts AS (SELECT doc_id, len, list_transform(range(0, len), j ->
         |    strpos('0123456789ABCDEF', substr(h, 2*j+1, 1)) * 16
         |    + strpos('0123456789ABCDEF', substr(h, 2*j+2, 1)) - 17) AS bs
         |  FROM hx),
         |px AS (SELECT doc_id, list_transform(range(0, 1024), i ->
         |    CASE WHEN len = 0 THEN 0 ELSE bs[(i*len)//1024 + 1] END) AS p
         |  FROM bts),
         |tt AS (SELECT doc_id, list_transform(range(0, 256), j ->
         |    list_sum(list_transform(range(0, 32), r ->
         |      p[r * 32 + (j % 32) + 1] * wl[(j // 32) * 32 + r + 1]))) AS t
         |  FROM px, wconst),
         |cf AS (SELECT doc_id, list_transform(range(0, 64), k ->
         |    CAST(list_sum(list_transform(range(0, 32), c ->
         |      t[(k // 8) * 32 + c + 1] * wl[(k % 8) * 32 + c + 1])) AS BIGINT)) AS f
         |  FROM tt, wconst),
         |cfm AS (SELECT doc_id, f, list_sort(f[2:64])[32] AS med FROM cf),
         |sigw AS (SELECT doc_id, ${band(0)}, ${band(1)}, ${band(2)}, ${band(3)} FROM cfm),
         |sig AS ($bandsUnion),
         |keep AS (SELECT band_idx, band_key FROM sig GROUP BY 1, 2 HAVING count(*) <= 1000),
         |kept AS (SELECT s.* FROM sig s JOIN keep USING (band_idx, band_key)),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM kept a JOIN kept b ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |    AND a.doc_id < b.doc_id),
         |s AS (SELECT doc_a, doc_b, CAST($hamSum AS BIGINT) AS hamming
         |  FROM cand JOIN sigw wa ON cand.doc_a = wa.doc_id JOIN sigw wb ON cand.doc_b = wb.doc_id)
         |SELECT doc_a, doc_b, hamming FROM s WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin
    },
    "media_bytes_stats" ->
      """SELECT doc_id, CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
        |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS header_byte
        |FROM documents ORDER BY doc_id""".stripMargin,
    "media_frame_sample" ->
      """SELECT doc_id,
        |  array_to_string(list_transform(range(1, length(text) + 1, 16), i -> substr(text, i, 1)), '') AS frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "image_meta_stub" -> imageMetaOracle,
    "media_feature_ann" -> mediaFeatureAnnOracle,
  ) ++ annIvfOracleEntry ++ annPqOracleEntry ++ lexPqOracleEntry ++ qualityModelOracleEntry ++
    docTopicOracleEntry

  /** Queries whose DuckDB oracle is generated POST-RUN by inlining the
    * session-trained model artifact (IVF centroids, PQ codebooks, LR
    * coefficients, k-means centers): `oracleSql` contains them only
    * after the matching query has executed in this JVM — Verify runs
    * queries first, then dumps oracles, so the driver always sees them.
    * Listed statically so the catalog can label them `sql_inlined_model`
    * instead of mistaking a pre-run empty slot for a rows-only query. */
  def postRunOracleQueries: Set[String] = Set(
    "ann_ivf_topk", "ann_ivf_after_remove", "ivf_cell_stats", "dedup_semantic",
    "ann_ivfpq_topk", "pq_code_stats", "doc_lexical_ann_pq", "doc_topic_clusters",
    "quality_classifier")

  /** EXPLICIT family per registered query — the machine-readable catalog
    * axis ([[graft.tools.QueryCatalog]] emits it into QUERIES.json, the
    * catalog spec asserts it covers `queries.keySet` exactly). Explicit
    * name lists, not prefix regexes: a new query that lands in no family
    * fails the spec instead of silently mis-classifying. */
  def queryFamilies: Map[String, String] = Seq(
    "reference-parity" -> Seq(
      "uu_per_minute", "uu_per_minute_by_type", "uu_minute_histogram",
      "uu_per_minute_twophase", "uu_per_minute_collect_set",
      "uu_per_minute_approx_check", "uu_per_minute_udaf",
      "uu_per_minute_sql", "uu_sliding_5m_1m",
      "uu_daily_sketch_check", "uu_wau_sketch_check", "user_count_cms_check",
      "audience_overlap_check",
      "events_filter_project", "events_json_extract", "events_variant_extract",
      "events_props_map_stats", "event_type_stats"),
    "relational" -> Seq(
      "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue", "top100_items",
      "customers_topn_per_segment", "semi_join_customers", "anti_join_customers",
      "custkeys_intersect", "custkeys_except", "sales_rollup", "sales_cube",
      "sales_grouping_sets", "orders_enriched", "latest_order_per_customer",
      "order_value_histogram", "order_value_percentiles",
      "order_value_percentiles_approx_check", "customer_order_counts",
      "customer_name_parse", "events_by_weekday", "events_pivot",
      "events_resample_gapfill", "parts_above_brand_avg", "median_order_by_segment",
      "orders_price_histogram", "asof_join_orders", "click_purchase_range_join",
      "priority_top_orders_listagg",
      "part_cooccurrence", "shipping_delay_histogram", "supplier_delay_ranking",
      "shipping_delay_percentiles", "lineitem_metrics_unpivot", "order_value_winsorized"),
    "subquery-decorrelation" -> Seq(
      "q4_late_priority", "q11_brand_share", "q13_order_distribution",
      "q17_small_qty_revenue", "q21_waiting_supplier", "q22_dormant_customers"),
    "tpch-remainder" -> Seq(
      "q6_discount_band", "q7_nation_trade", "q8_market_share",
      "q10_returned_customers", "q14_promo_share", "q15_top_supplier",
      "q18_large_orders", "q19_bracket_revenue",
      "q2_min_cost_supp", "q9_product_profit", "q12_shipmode_priority",
      "q16_supplier_cnt", "q20_promo_suppliers"),
    "aqp" -> Seq("aqp_revenue_estimate_check", "aqp_segment_revenue_check",
      "pareto_days"),
    "window-functions" -> Seq(
      "daily_revenue_range7d", "daily_revenue_running", "daily_revenue_rank_stats",
      "customer_trailing_features"),
    "ml-feature-prep" -> Seq("segment_target_encoding"),
    "materialized-view" -> Seq("daily_revenue_incremental"),
    "cdc" -> Seq("orders_upsert_apply", "scd2_orders", "cdc_apply_changes",
      "scd2_temporal_join"),
    "product-analytics" -> Seq(
      "event_funnel", "event_funnel_windowed", "event_funnel_sessionized",
      "funnel_time_to_convert",
      "user_retention_cohorts", "event_transition_matrix", "event_paths_top",
      "user_sessions", "session_concurrency", "attribution_last_touch",
      "user_rfm_segments", "user_stickiness_daily"),
    "ops-audit" -> Seq(
      "data_expectations", "event_rate_anomaly", "daily_revenue_cusum",
      "daily_revenue_seasonal", "revenue_forecast_eval", "table_column_stats",
      "join_key_skew_stats", "join_size_estimate", "salted_event_segment_stats",
      "aqe_skew_event_segment_stats", "length_outlier_stats",
      "anomaly_session_impact", "observed_order_audit", "kanon_risk",
      "orders_benford_audit", "ab_split_check", "event_lag_correlation"),
    "layout-scan" -> Seq("zorder_cluster_stats", "dpp_quarter_revenue", "pack_shards",
      "bucketed_join_revenue", "bloomjoin_segment_revenue"),
    "graph" -> Seq("graph_pagerank", "graph_triangles", "graph_communities",
      "graph_link_prediction", "reachability_recursive"),
    "dedup" -> Seq(
      "dedup_exact", "dedup_exact_norm", "dedup_exact_norm_sql", "dedup_minhash_lsh",
      "dedup_minhash_sql", "dedup_simhash", "dedup_ngram_jaccard", "dedup_sparse_cosine",
      "dedup_substring", "substring_gram_stats", "dedup_levenshtein",
      "dedup_embedding_cosine", "dedup_embedding_hyperplane",
      "dedup_semantic", "dedup_clusters", "dedup_cluster_sizes",
      "dedup_keep_best", "dedup_bloom_check", "dedup_chunks", "incremental_dedup",
      "incremental_dedup_after_diff", "incremental_dedup_shard_merge",
      "corpus_diff", "cross_source_dup_matrix",
      "minhash_band_stats", "simhash_band_stats", "benchmark_contamination",
      "doc_shingle_novelty"),
    "similarity" -> Seq(
      "ann_bruteforce_topk", "ann_bruteforce_sql", "ann_lsh_topk",
      "ann_lsh_multiprobe_topk", "ann_ivf_topk", "ann_ivf_after_remove",
      "ann_ivfpq_topk", "ivf_cell_stats", "pq_code_stats", "ann_bucket_stats",
      "embedding_truncation_recall", "ann_lsh_recall",
      "embedding_norm_stats", "embedding_int8_stats", "doc_vector_hash", "doc_lexical_ann",
      "doc_lexical_ann_pq", "media_feature_ann"),
    "text-analysis" -> Seq(
      "text_stats", "text_token_counts", "text_langid", "text_quality",
      "text_repetition", "text_token_rarity", "text_top_bigrams",
      "token_heavy_hitters", "token_rarity_against", "tokenizer_fertility",
      "lm_bigram_surprisal", "lm_surprisal_against", "perplexity_buckets",
      "pii_scrub_stats", "doc_fingerprint", "doc_winnow_fingerprint",
      "corpus_summary", "top_tokens_per_source", "top_repeated_shingles",
      "distinctive_terms", "doc_topic_clusters", "chunk_documents"),
    "sampling-mixing" -> Seq(
      "corpus_sample_stratified", "mixture_weights", "mixture_budget_rates",
      "mixture_sample_temperature", "source_cap_sample", "train_test_split",
      "leakage_safe_split", "dsir_weights", "dsir_sample", "train_order_shuffle",
      "batch_padding_stats"),
    "curation-observability" -> Seq(
      "curation_kill_reasons", "token_distribution_shift", "dedup_rate_by_source",
      "vocab_growth", "corpus_curated"),
    "quality-model" -> Seq("quality_calibrated", "quality_classifier"),
    "search" -> Seq("bm25_search", "bm25_search_indexed", "bm25_after_remove"),
    "lifecycle" -> Seq("forget_cascade"),
    "multimodal" -> Seq(
      "media_bytes_stats", "media_frame_sample", "media_phash_dedup", "image_meta_stub")
  ).flatMap { case (fam, names) => names.map(_ -> fam) }.toMap
}
