package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Pin.PinnedOps

/** Relational operator coverage the reference lacks (SURVEY.md §2 category
  * checklist: no joins, no sorts/limits, no set ops, no window functions).
  * Each builder is a declarative DataFrame plan so Catalyst applies
  * pushdown/pruning/join-selection. Broadcast hints are reserved for
  * sides that are BOUNDED regardless of scale factor (nation=25 rows,
  * region=5, per-brand aggregates); any table that grows with SF
  * (customer, supplier) is left to AQE, which broadcasts it while it
  * fits and falls back to a shuffled join when it doesn't — a forced
  * broadcast of an SF-scaled table is an executor OOM at 100 TB.
  *
  * Money sums are emitted as exact integer cents (`sum(round(x*100))` cast
  * to long): per-row rounding happens before the sum, so the aggregate is
  * order-independent and bit-identical to the DuckDB oracle regardless of
  * partitioning.
  */
object Relational {

  private[operators] def cents(c: org.apache.spark.sql.Column) = round(c * 100)

  /** TPC-H Q1-style pricing summary: scan-heavy group-by over lineitem.
    * Filter reaches the parquet scan; aggregate is two-phase hash. */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(cents(col("l_extendedprice"))).cast("long").as("sum_base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("long").as("sum_disc_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))).cast("long").as("sum_charge_cents"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-style: 3-way join (customer ⋈ orders ⋈ lineitem), revenue
    * per order, top 10. orders ⋈ lineitem shuffles on orderkey (the
    * natural key at scale); the filtered customer side is left to AQE —
    * it broadcasts while small but is still 1/5 of an SF-scaled table,
    * so no forced hint. */
  def topOrders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                segment: String = "BUILDING"): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer.filter(col("c_mktsegment") === segment),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("long").as("revenue_cents"))
      .select(col("l_orderkey"), unix_timestamp(col("o_orderdate")).as("o_orderdate_sec"), col("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey"))
      .limit(10)

  /** TPC-H Q5-style: revenue per nation where customer and supplier share
    * the nation. Only nation (25 rows) and region (5) carry broadcast
    * hints — they're bounded regardless of scale factor. customer and
    * supplier GROW with SF (1.5 B / 100 M rows at SF10k), so their join
    * strategy is left to AQE: broadcast when small, shuffle-hash when not.
    * A forced broadcast of an SF-scaled table is an executor OOM at the
    * 100 TB target. */
  def nationRevenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                    orders: DataFrame, lineitem: DataFrame, supplier: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("long").as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("n_name"))

  /** Global top-k with a total (tie-free) order: TakeOrderedAndProject —
    * no full sort at scale, each partition keeps k rows then the driver
    * merges. */
  def topItems(lineitem: DataFrame, k: Int = 100): DataFrame =
    lineitem
      .select(col("l_orderkey"), col("l_linenumber"),
        cents(col("l_extendedprice")).cast("long").as("price_cents"))
      .orderBy(col("price_cents").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(k)

  /** SQL window function (rank per group) — absent from the reference's
    * category list. Top-3 customers by balance per market segment. */
  def topCustomersPerSegment(customer: DataFrame, n: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("acctbal_cents").desc, col("c_custkey"))
    customer
      .select(col("c_mktsegment"), col("c_custkey"),
        cents(col("c_acctbal")).cast("long").as("acctbal_cents"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= n)
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  /** High-value order threshold: ~p90 of o_totalprice, so the semi/anti
    * pair splits the customer base non-trivially at every scale factor. */
  val HighValueOrder = 450000.0

  /** Left-semi join: customers with at least one high-value order (EXISTS). */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_totalprice") > HighValueOrder),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")

  /** Left-anti join: customers with no high-value order (NOT EXISTS). */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders.filter(col("o_totalprice") > HighValueOrder),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy("c_custkey")

  /** Set ops: positive-balance customer keys ∩ / − high-value-order
    * customer keys — both plan as hash aggregates/joins. */
  def keyIntersect(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.filter(col("c_acctbal") > 0).select(col("c_custkey").as("k"))
      .intersect(orders.filter(col("o_totalprice") > HighValueOrder).select(col("o_custkey").as("k")))
      .orderBy("k")

  def keyExcept(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.filter(col("c_acctbal") > 0).select(col("c_custkey").as("k"))
      .except(orders.filter(col("o_totalprice") > HighValueOrder).select(col("o_custkey").as("k")))
      .orderBy("k")

  /** ROLLUP grouping sets over (returnflag, linestatus). */
  def salesRollup(lineitem: DataFrame): DataFrame =
    lineitem
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** CUBE grouping sets over (returnflag, linestatus) — all 4 grouping
    * combinations in one pass (Expand + single shuffle). */
  def salesCube(lineitem: DataFrame): DataFrame =
    lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("l_quantity")).cast("long").as("sum_qty"))
      .orderBy(asc_nulls_first("l_returnflag"), asc_nulls_first("l_linestatus"))

  /** Latest order per customer (deduplicate-to-latest): the canonical
    * changelog-compaction pattern, as a rank-1 window. */
  def latestOrderPerCustomer(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    orders
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(
        col("o_custkey"),
        col("o_orderkey"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_sec"),
        cents(col("o_totalprice")).cast("long").as("totalprice_cents"))
      .orderBy("o_custkey")
  }

  /** Fixed-width histogram of order values. Buckets are computed on exact
    * integer cents (cents div 50000 = $500 buckets) so bucket edges are
    * engine-independent — no float boundary ambiguity. */
  def orderValueHistogram(orders: DataFrame): DataFrame =
    orders
      .select(expr("CAST(round(o_totalprice * 100) AS LONG) div 50000").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
      .orderBy("bucket")

  /** Pivot: daily event counts, one column per event type. */
  val EventTypes = Seq("click", "error", "purchase", "signup", "view")
  def eventsPivot(events: DataFrame): DataFrame =
    events
      .select(unix_timestamp(date_trunc("day", col("ts"))).as("day"), col("event_type"))
      .groupBy(col("day"))
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
      .na.fill(0L, EventTypes)
      .orderBy("day")

  /** Ordered funnel steps for [[eventFunnel]] (shared with the oracle
    * generator so both engines walk the identical funnel). */
  val FunnelSteps: Seq[String] = Seq("signup", "view", "click", "purchase")

  /** Ordered-funnel conversion: per funnel step, how many users reached
    * it — where "reached step i" means the user's FIRST occurrence of
    * every step ≤ i exists and is in non-decreasing time order (the
    * classic product-analytics funnel over an event stream; ties allowed
    * since distinct event types can share a timestamp). One shuffle on
    * user_id into a pivot of first-occurrence times, then a
    * steps-bounded roll-up — at any scale the heavy relation is
    * (users × steps), never raw events. `conv_ppm` is integer ppm of
    * step 1's population. */
  def eventFunnel(events: DataFrame, steps: Seq[String] = FunnelSteps): DataFrame = {
    val firsts = events
      .filter(col("event_type").isin(steps: _*))
      .groupBy(col("user_id"))
      .pivot("event_type", steps)
      .agg(min(col("ts")))
    val reached = steps.indices.map { i =>
      // all first-times through step i present and ordered
      val ord = (1 to i).map(j => col(steps(j - 1)) <= col(steps(j)))
      val present = (0 to i).map(j => col(steps(j)).isNotNull)
      (present ++ ord).reduce(_ && _)
    }
    // coalesce: sum over ZERO users is SQL-null — an empty stream should
    // report an honest 0-user funnel, not a null one (oracle mirrors)
    val agg = firsts.agg(
      count(lit(1)).as("n0"),
      reached.zipWithIndex.map { case (c, i) =>
        coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L)).as(s"r$i") }: _*)
    val spark = events.sparkSession
    import spark.implicits._
    val stepRows = steps.zipWithIndex
      .map { case (s, i) => (i + 1L, s) }.toDF("step", "step_name")
    stepRows.crossJoin(broadcast(agg))
      .select(col("step"), col("step_name"),
        steps.indices.map(i =>
          when(col("step") === (i + 1L), col(s"r$i"))).reduce(coalesce(_, _)).as("n_users"),
        greatest(col("r0"), lit(1L)).as("base"))
      .select(col("step"), col("step_name"),
        col("n_users").cast("long").as("n_users"),
        expr("(n_users * 1000000) div base").as("conv_ppm"))
      .orderBy("step")
  }

  /** Per-transition horizon for [[eventFunnelWindowed]], in seconds —
    * shared with the oracle generator so both engines bound the funnel
    * identically (the same parameter-lock contract as
    * [[FunnelSteps]] / Dedup's gramLen/maxDf). One day: on this event
    * stream (sparse per-user activity over ~a week) a 1-hour horizon
    * zeroes every stage past `view`, while a day leaves all four stages
    * populated AND meaningfully below the unbounded form — the regime
    * where the correctness gate actually exercises the window logic. */
  val FunnelHorizonSec = 86400L

  /** TIME-BOUNDED ordered funnel — the standard product-analytics form:
    * step i+1 counts only when it happens within `horizonSec` of the
    * user's step-i completion time. [[eventFunnel]]'s unbounded
    * first-occurrence form silently overstates conversion on long event
    * histories (a purchase a month after the click still "converts");
    * this form expires each transition.
    *
    * Semantics: greedy earliest-completion — t_0 is the user's first
    * step-0 event, and t_{i+1} is the user's EARLIEST step-(i+1) event
    * inside (t_i, t_i + horizon] (ties allowed at t_i, matching
    * [[eventFunnel]]'s non-decreasing contract). Greedy-earliest is the
    * funnel convention (and what a per-user sequential scan computes);
    * it is deliberately not the maximal-window matching — a user who
    * could only convert by SKIPPING their first step-i event does not
    * count, and the oracle replicates exactly that.
    *
    * Scale shape: one shuffle on user_id per TRANSITION (steps-bounded,
    * never data-bounded) — each stage equi-joins the step's events
    * against the shrinking per-user completion-time relation and
    * re-aggregates to one row per user; the heavy relation is always
    * (users × 1), never raw events paired with themselves. The final
    * roll-up unions `steps` one-row aggregates — the unpartitioned
    * window below runs over ≤ steps rows, bounded by construction. */
  /** The greedy earliest-completion chain shared by
    * [[eventFunnelWindowed]] and [[funnelTimeToConvert]]: element i is
    * the one-row-per-user relation (user_id, t) of step-i completion
    * times under the horizon rule. */
  private def windowedCompletions(events: DataFrame, steps: Seq[String],
                                  horizonSec: Long): Seq[DataFrame] = {
    // PIN the filtered projection and every chain element (guide §2.4):
    // step i's plan contains steps 0..i-1, and both consumers read
    // several elements — unpinned, the step-0 subtree executed
    // steps-many times per query (the funnel_time_to_convert initial
    // plan carried 15 scans of events; one after). Each element is one
    // narrow row per user — index-sized at any scale — and `e` is the
    // funnel-step event slice every element filters from.
    val e = events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("tsec"))
      .pinned()
    steps.indices.foldLeft(Vector.empty[DataFrame]) { (acc, i) =>
      val cur =
        if (i == 0)
          e.filter(col("event_type") === steps.head)
            .groupBy(col("user_id")).agg(min(col("tsec")).as("t"))
        else
          e.filter(col("event_type") === steps(i))
            .join(acc.last.select(col("user_id"), col("t").as("prev_t")), Seq("user_id"))
            .filter(col("tsec") >= col("prev_t") &&
              col("tsec") <= col("prev_t") + lit(horizonSec))
            .groupBy(col("user_id")).agg(min(col("tsec")).as("t"))
      acc :+ cur.pinned()
    }
  }

  def eventFunnelWindowed(events: DataFrame, steps: Seq[String] = FunnelSteps,
                          horizonSec: Long = FunnelHorizonSec): DataFrame = {
    // per-user completion time of each successive step, within horizon
    val completions = windowedCompletions(events, steps, horizonSec)
    // coalesce: an empty population must report an honest 0, not null
    // (same contract as eventFunnel)
    val counted = completions.zipWithIndex.map { case (c, i) =>
      c.agg(coalesce(count(lit(1)), lit(0L)).cast("long").as("n_users"))
        .withColumn("step", lit(i + 1L))
    }.reduce(_.unionByName(_))
    val spark = events.sparkSession
    import spark.implicits._
    val stepRows = steps.zipWithIndex
      .map { case (s, i) => (i + 1L, s) }.toDF("step", "step_name")
    // the unpartitioned window runs over the ≤ steps counted rows — a
    // model-sized relation, bounded by construction
    val base = greatest(max(when(col("step") === 1L, col("n_users")))
      .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)), lit(1L))
    counted.join(broadcast(stepRows), Seq("step"))
      .withColumn("base", base)
      .select(col("step"), col("step_name"),
        col("n_users").cast("long").as("n_users"),
        expr("(n_users * 1000000) div base").as("conv_ppm"))
      .orderBy("step")
  }

  /** HOW FAST users convert, not just whether: nearest-rank p50/p90 of
    * the delay between consecutive funnel-step completions, per
    * transition — the time-to-convert curve product teams read next to
    * the conversion rate. Rides the same greedy chain as
    * [[eventFunnelWindowed]] (delays are differences of the SAME
    * completion times the conversion counts come from, so the two
    * reports can never disagree about who converted); percentiles via
    * [[Median.nearestRankByKey]], whose per-transition histogram is
    * bounded by the HORIZON domain (delay ∈ [0, horizonSec]) — no
    * per-transition sort of converters at any scale. */
  def funnelTimeToConvert(events: DataFrame, steps: Seq[String] = FunnelSteps,
                          horizonSec: Long = FunnelHorizonSec): DataFrame = {
    val completions = windowedCompletions(events, steps, horizonSec)
    val delays = (1 until steps.length).map { i =>
      completions(i).select(col("user_id"), col("t").as("t_cur"))
        .join(completions(i - 1).select(col("user_id"), col("t").as("t_prev")), Seq("user_id"))
        .select(lit(i.toLong).as("transition"), (col("t_cur") - col("t_prev")).as("delay_sec"))
    }.reduce(_.unionByName(_))
    val spark = events.sparkSession
    import spark.implicits._
    val names = steps.sliding(2).zipWithIndex
      .map { case (Seq(a, b), i) => (i + 1L, s"$a->$b") }.toSeq
      .toDF("transition", "transition_name")
    Median.nearestRankByKey(delays, Seq("transition"), col("delay_sec"), Seq(50, 90))
      .join(broadcast(names), Seq("transition"))
      .select(col("transition"), col("transition_name"),
        col("n").cast("long").as("n_converted"),
        col("p50").as("p50_sec"), col("p90").as("p90_sec"))
      .orderBy("transition")
  }

  /** Session gap for [[eventFunnelSessionized]], in seconds — the same
    * 30-minute inactivity gap as [[Sessionize.userSessions]], shared
    * with the oracle generator. */
  val FunnelSessionGapSec = 1800L

  /** SESSIONIZED ordered funnel — the third funnel semantics (after
    * all-time [[eventFunnel]] and horizon-bounded
    * [[eventFunnelWindowed]]): a user reaches step i iff SOME single
    * session (30-min inactivity gap) contains first-occurrences of
    * steps 0..i in non-decreasing order. The strictest product form —
    * conversion must happen within one visit.
    *
    * Sessionization is the lag/gap cumulative-sum form (not
    * `session_window`) because every piece is engine-portable integer
    * arithmetic the DuckDB oracle replicates exactly; tie rows (equal
    * epoch seconds) land in the same session regardless of intra-tie
    * order, and first-occurrence mins are order-independent, so the
    * result is partitioning-stable.
    *
    * Shuffle shape: ONE exchange on user_id serves everything — the
    * session-id window partitions by user, and the (user, session) /
    * per-user aggregates cluster on supersets of user_id so no further
    * exchange is required; per-user window width is the user's own
    * event count (the [[Sessionize.asofJoinOrders]] class). The final
    * roll-up is steps-bounded. */
  def eventFunnelSessionized(events: DataFrame, steps: Seq[String] = FunnelSteps,
                             gapSec: Long = FunnelSessionGapSec): DataFrame = {
    val e = events
      .filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), col("event_type"), unix_timestamp(col("ts")).as("tsec"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("tsec"))
    val sess = e
      .withColumn("prev", lag(col("tsec"), 1).over(byUser))
      .withColumn("new_s",
        when(col("prev").isNull || col("tsec") - col("prev") > gapSec, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_s"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val minCols = steps.map(st =>
      min(when(col("event_type") === st, col("tsec"))).as(s"t_$st"))
    val firsts = sess.groupBy(col("user_id"), col("sid"))
      .agg(minCols.head, minCols.tail: _*)
    val reached = steps.indices.map { i =>
      val present = (0 to i).map(j => col(s"t_${steps(j)}").isNotNull)
      val ord = (1 to i).map(j => col(s"t_${steps(j - 1)}") <= col(s"t_${steps(j)}"))
      (present ++ ord).reduce(_ && _)
    }
    val rCols = reached.zipWithIndex.map { case (c, i) =>
      max(when(c, 1L).otherwise(0L)).as(s"r$i") }
    val perUser = firsts.groupBy(col("user_id")).agg(rCols.head, rCols.tail: _*)
    val agg = perUser.agg(
      coalesce(sum(col("r0")), lit(0L)).as("r0"),
      steps.indices.tail.map(i =>
        coalesce(sum(col(s"r$i")), lit(0L)).as(s"r$i")): _*)
    val spark = events.sparkSession
    import spark.implicits._
    val stepRows = steps.zipWithIndex
      .map { case (s, i) => (i + 1L, s) }.toDF("step", "step_name")
    stepRows.crossJoin(broadcast(agg))
      .select(col("step"), col("step_name"),
        steps.indices.map(i =>
          when(col("step") === (i + 1L), col(s"r$i"))).reduce(coalesce(_, _)).as("n_users"),
        greatest(col("r0"), lit(1L)).as("base"))
      .select(col("step"), col("step_name"),
        col("n_users").cast("long").as("n_users"),
        expr("(n_users * 1000000) div base").as("conv_ppm"))
      .orderBy("step")
  }

  /** Market-basket CO-OCCURRENCE mining — top part pairs bought in the
    * same order, with integer-ppm LIFT against independence: the
    * classic association-rule primitive (the support/lift half of
    * Apriori) as one self-equi-join on the basket key. The quadratic
    * fan-out is bounded per KEY, not per table: an order with m items
    * emits C(m,2) pairs, and m is capped by basket mechanics (≤13 here,
    * single digits in any order system) — the disclosed contrast to the
    * document-side pair generators, where no such natural cap exists
    * and the df-cut/banding guards do that job. Lift is
    * floor((n_pair · n_baskets · 10⁶) / (n_a · n_b)) — exact integer,
    * > 10⁶ means the pair co-occurs MORE than independent purchase
    * would predict. Output is a TakeOrdered top-k, never a full sort.
    * Disclosed range bound: the int64 lift numerator is exact while
    * n_pair · n_baskets < ~9·10¹² (any realistic basket corpus); beyond
    * that, promote the numerator to DECIMAL(38,0) on both engines. */
  def partCooccurrence(lineitem: DataFrame, minSupport: Long = 2, k: Int = 100): DataFrame = {
    // four consumers (basket count, per-part counts, both sides of the
    // pair self-join) — one distinct pass over lineitem instead of four
    // (guide §2.4; Graph.coPurchasePairs pins its basket build the same
    // way via its memo)
    val baskets = lineitem.select(col("l_orderkey"), col("l_partkey")).distinct().pinned()
    val nBaskets = baskets.select(col("l_orderkey")).distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val perPart = baskets.groupBy(col("l_partkey")).agg(count(lit(1)).as("n_part"))
    val pairs = baskets.as("a")
      .join(baskets.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_partkey") < col("b.l_partkey"))
      .groupBy(col("a.l_partkey").as("part_a"), col("b.l_partkey").as("part_b"))
      .agg(count(lit(1)).as("n_pairs"))
      .filter(col("n_pairs") >= minSupport)
    pairs
      .join(perPart.select(col("l_partkey").as("part_a"), col("n_part").as("n_a")), "part_a")
      .join(perPart.select(col("l_partkey").as("part_b"), col("n_part").as("n_b")), "part_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("part_a"), col("part_b"), col("n_pairs"), col("n_a"), col("n_b"),
        expr("(n_pairs * n_baskets * 1000000) div (n_a * n_b)").cast("long").as("lift_ppm"))
      .orderBy(col("n_pairs").desc, col("part_a"), col("part_b"))
      .limit(k)
  }

  /** Event-to-event TRANSITION MATRIX — the Markov-chain view of the
    * event stream (which action follows which, with integer-ppm row
    * shares), the companion to the funnel family: a funnel checks one
    * prescribed path, this surfaces ALL observed paths. One `lead`
    * window per user (input bounded per user, exactly the funnel's
    * shuffle key) feeds a (from, to)-keyed two-phase agg — the output is
    * bounded by |event_type|², never by the event count. The share
    * denominator is transitions OUT of `from_type`, so each row of the
    * matrix sums to ~1e6 ppm (floor division, disclosed). Ordering at
    * equal timestamps is (ts, event_id) — the same deterministic
    * tiebreak the funnel and sessionization use. */
  def eventTransitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = steps
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum(col("n")).as("n_from"))
    counts.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        expr("(n * 1000000) div n_from").cast("long").as("share_ppm"))
      .orderBy("from_type", "to_type")
  }

  /** Weekly retention cohorts: users grouped by their first-activity
    * week, tracked by distinct-active weeks since — THE
    * stickiness/engagement view over an event stream. `retention_ppm`
    * is each cell's share of its cohort's size (offset 0 always holds
    * the whole cohort — a user's first event is in the cohort week by
    * definition). Shuffles carry (user_id, week) pairs — events
    * deduplicate map-side to one row per user-week before the joins;
    * week keys travel as epoch seconds for cross-engine stability. */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val weeks = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("week")).distinct()
    val cohorts = weeks.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    val cells = weeks.join(cohorts, "user_id")
      .groupBy(unix_timestamp(col("cohort_week")).as("cohort_epoch"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
    val sizes = cells.filter(col("week_offset") === 0L)
      .select(col("cohort_epoch"), col("n_users").as("cohort_size"))
    cells.join(sizes, "cohort_epoch")
      .select(col("cohort_epoch"), col("week_offset"),
        col("n_users").cast("long").as("n_users"),
        expr("(n_users * 1000000) div cohort_size").as("retention_ppm"))
      .orderBy("cohort_epoch", "week_offset")
  }

  /** Scalar string-function surface: parse the numeric id out of
    * `Customer#000000042`, normalize case, build a display label — all
    * codegen'd column expressions, verified against the same functions in
    * the oracle dialect. */
  def customerNameParse(customer: DataFrame): DataFrame =
    customer
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "#(\\d+)$", 1).cast("long").as("name_id"),
        concat(
          upper(substring(lower(col("c_mktsegment")), 1, 1)),
          expr("substring(lower(c_mktsegment), 2)"),
          lit(": "),
          ltrim(regexp_extract(col("c_name"), "#(\\d+)$", 1), "0")).as("label"),
        length(col("c_name")).cast("long").as("name_len"))
      .filter(col("name_id") === col("c_custkey")) // parse must round-trip
      .orderBy("c_custkey")

  /** Analytic window frames over the daily revenue series: cumulative
    * revenue, trailing-7-row moving sum, and day-over-day delta (lag).
    * All integer cents — frame math is engine-exact. */
  def dailyRevenueRunning(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(unix_timestamp(date_trunc("day", col("o_orderdate"))).as("day"))
      .agg(sum(cents(col("o_totalprice"))).cast("long").as("revenue_cents"))
    val byDay = Window.orderBy(col("day"))
    daily
      .withColumn("cum_cents",
        sum(col("revenue_cents")).over(byDay.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("trailing7_cents",
        sum(col("revenue_cents")).over(byDay.rowsBetween(-6, 0)))
      .withColumn("delta_cents",
        col("revenue_cents") - coalesce(lag(col("revenue_cents"), 1).over(byDay), lit(0L)))
      .orderBy("day")
  }

  /** Date arithmetic with engine-independent integer math: weekday from
    * the epoch-day (1970-01-01 was a Thursday → (days+4) % 7, 0=Sunday) —
    * no reliance on per-engine DOW numbering conventions. */
  def eventsByWeekday(events: DataFrame): DataFrame =
    events
      .select(expr("(unix_timestamp(ts) div 86400 + 4) % 7").as("weekday"))
      .groupBy(col("weekday"))
      .agg(count(lit(1)).as("n"))
      .orderBy("weekday")

  /** Correlated-aggregate pattern (TPC-H Q17-style): parts priced above
    * 1.05× their brand's average (retail prices are uniform 900-1000, so
    * the classic 2× would select nothing). The comparison is integer
    * cross-multiplied (price_cents * n * 20 > sum_cents * 21) so no
    * division — exact in any engine. Plans as agg + broadcast join back. */
  def partsAboveBrandAverage(part: DataFrame): DataFrame = {
    val brandAgg = part.groupBy(col("p_brand").as("b"))
      .agg(
        sum(cents(col("p_retailprice"))).cast("long").as("sum_cents"),
        count(lit(1)).as("n"))
    part
      .join(broadcast(brandAgg), col("p_brand") === col("b"))
      .filter(cents(col("p_retailprice")).cast("long") * col("n") * 20 > col("sum_cents") * 21)
      .select(col("p_partkey"), col("p_brand"),
        cents(col("p_retailprice")).cast("long").as("price_cents"))
      .orderBy("p_partkey")
  }

  /** Exact median order value per market segment, in integers: emits
    * lo+hi middle elements' sum (median×2) so odd/even group sizes and
    * engine rounding can't diverge.
    *
    * Two-pass order-statistic, NOT a window over the raw fact rows: with
    * only 5 segment values, a per-segment row_number would sort the whole
    * orders⋈customer output in 5 tasks — a scale killer. Instead:
    *  pass 1: count per (segment, coarse value-bucket) — a normal
    *          two-phase hash aggregate; the per-segment running bucket
    *          totals (a window over ≤ |value domain|/bucket_width rows,
    *          bounded by the DOMAIN, not the data) locate the one or two
    *          buckets containing ranks (n+1)/2 and (n+2)/2.
    *  pass 2: re-scan only rows in those target buckets (a semi-join
    *          pushed into the aggregate's output), rank WITHIN the bucket
    *          (window input = one bucket's rows, not the corpus), add the
    *          bucket's preceding-count offset to recover the global rank,
    *          and pick the median element(s).
    * The median is selected by value order alone (the o_orderkey tiebreak
    * of a naive rank cannot change WHICH VALUES sit at the middle ranks),
    * so the result is bit-identical to the single-window form. */
  def medianOrderValueBySegment(orders: DataFrame, customer: DataFrame): DataFrame = {
    val BucketCents = 100000L // $1000 buckets over o_totalprice
    val joined = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        cents(col("o_totalprice")).cast("long").as("v"))
      .withColumn("bkt", expr(s"v div $BucketCents"))

    // pass 1: bucket histogram + running totals (tiny, domain-bounded)
    val wBkt = Window.partitionBy(col("c_mktsegment")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val hist = joined.groupBy(col("c_mktsegment"), col("bkt"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wBkt))
      .withColumn("cnt", sum(col("c")).over(Window.partitionBy(col("c_mktsegment"))))
      .withColumn("m1", expr("(cnt + 1) div 2"))
      .withColumn("m2", expr("(cnt + 2) div 2"))
    // buckets holding rank m1 or m2; prev = rows before this bucket
    val targets = hist
      .filter((col("cum") - col("c") < col("m1") && col("cum") >= col("m1")) ||
              (col("cum") - col("c") < col("m2") && col("cum") >= col("m2")))
      .select(col("c_mktsegment").as("t_seg"), col("bkt").as("t_bkt"),
        (col("cum") - col("c")).as("prev"), col("cnt"), col("m1"), col("m2"))

    // pass 2: rank only within the target buckets (broadcast: ≤ 2 rows/segment)
    val wIn = Window.partitionBy(col("c_mktsegment"), col("bkt")).orderBy(col("v"))
    joined
      .join(broadcast(targets),
        col("c_mktsegment") === col("t_seg") && col("bkt") === col("t_bkt"))
      .withColumn("rk", row_number().over(wIn) + col("prev"))
      .withColumn("matched",
        (col("rk") === col("m1")).cast("long") + (col("rk") === col("m2")).cast("long"))
      .filter(col("matched") > 0)
      .groupBy(col("c_mktsegment"))
      .agg(
        first(col("cnt")).as("n_orders"),
        sum(col("v") * col("matched")).as("median_x2_cents"))
      .orderBy("c_mktsegment")
  }

  /** Left-outer join + aggregate: every customer with their order count
    * and total, zero-filled for customers who never ordered — the outer
    * side of the join surface (inner/semi/anti are covered elsewhere).
    * Aggregate-then-join: orders collapses to one row per custkey BEFORE
    * the join, so the outer join matches at most one row per customer —
    * no fact-side row explosion at any scale. */
  def customerOrderCounts(customer: DataFrame, orders: DataFrame): DataFrame = {
    val agg = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"),
        sum(cents(col("o_totalprice"))).cast("long").as("tot"))
    customer
      .join(agg, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"),
        coalesce(col("cnt"), lit(0L)).as("n_orders"),
        coalesce(col("tot"), lit(0L)).as("total_cents"))
      .orderBy("c_custkey")
  }

  /** RANGE-frame analytic: trailing-7-DAY revenue sum over the daily
    * series — a VALUE-range frame (correct across gaps in the day
    * sequence), vs [[dailyRevenueRunning]]'s ROWS frame (positional). */
  def dailyRevenueRange7d(orders: DataFrame): DataFrame = {
    val daily = orders
      .groupBy(unix_timestamp(date_trunc("day", col("o_orderdate"))).as("day"))
      .agg(sum(cents(col("o_totalprice"))).cast("long").as("revenue_cents"))
    val w = Window.orderBy(col("day")).rangeBetween(-6L * 86400L, 0L)
    daily
      .withColumn("trailing7d_cents", sum(col("revenue_cents")).over(w))
      .orderBy("day")
  }

  /** Exact percentiles per segment (nearest-rank: value at rank
    * ceil(p·n/100)), by the same two-pass bucket-histogram order
    * statistic as [[medianOrderValueBySegment]] — pass 1 locates each
    * percentile's bucket in a domain-bounded histogram, pass 2 ranks only
    * inside the target buckets. The window never sees raw fact rows. */
  /** Sketch-based percentiles — the 100 TB scale path next to
    * [[percentilesBySegment]]'s exact two-pass: one aggregation with
    * O(accuracy) state per group (Spark's KLL-style quantile sketch),
    * no second pass, mergeable map-side. The VALUES are not
    * oracle-checked (sketch internals are engine-specific — rows-only
    * gate); the BOUND is: [[percentilesBySegmentApproxCheck]] is the
    * oracle-checked gate, and OperatorSpec asserts the tighter 2%
    * relative error against the exact operator. */
  def percentilesBySegmentApprox(orders: DataFrame, customer: DataFrame,
                                 ps: Seq[Int] = Seq(25, 50, 75, 90),
                                 accuracy: Int = 10000): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), cents(col("o_totalprice")).cast("long").as("v"))
      .groupBy(col("c_mktsegment"))
      .agg(percentile_approx(col("v"),
        array(ps.map(p => lit(p / 100.0)): _*), lit(accuracy)).as("vals"))
      .select(col("c_mktsegment"), posexplode(col("vals")).as(Seq("pos", "value")))
      .select(col("c_mktsegment"),
        element_at(typedLit(ps.map(_.toLong)), col("pos").cast("int") + 1).as("p"),
        col("value"))
      .orderBy("c_mktsegment", "p")

  /** The machine-checked error gate for [[percentilesBySegmentApprox]]:
    * per (segment, percentile) it emits the exact nearest-rank values at
    * p−1 and p+1 percent (both recomputed independently by the DuckDB
    * oracle — the bracket is cross-engine-verified) and a 0/1 verdict
    * that the sketch value lands inside that bracket. One percentage
    * point of rank slack is ~100× the sketch's documented rank error
    * (1/accuracy = 0.0001·n) yet still a real gate — a sketch returning
    * a value from the wrong region of the distribution cannot pass. The
    * oracle emits literal 1 everywhere, so a bound violation
    * hash-mismatches; the tighter 2% relative-error assertion lives in
    * the sbt suite. Reuses the two-pass exact operator for the bracket —
    * no window over raw fact rows. */
  def percentilesBySegmentApproxCheck(orders: DataFrame, customer: DataFrame,
                                      ps: Seq[Int] = Seq(25, 50, 75, 90),
                                      accuracy: Int = 10000): DataFrame = {
    val approx = percentilesBySegmentApprox(orders, customer, ps, accuracy)
      .withColumnRenamed("value", "v_approx")
    // ONE exact-percentile pipeline for both bounds (per-p results are
    // independent of the requested list, so splitting a combined run is
    // value-identical), pinned because both bound relations read it —
    // previously the whole exact pipeline ran twice (guide §2.4)
    val bounds = percentilesBySegment(orders, customer,
      (ps.map(_ - 1) ++ ps.map(_ + 1)).distinct).pinned()
    val lo = bounds.filter(col("p").isin(ps.map(p => (p - 1).toLong): _*))
      .select(col("c_mktsegment"), (col("p") + 1).as("p"), col("value").as("lo_value"))
    val hi = bounds.filter(col("p").isin(ps.map(p => (p + 1).toLong): _*))
      .select(col("c_mktsegment"), (col("p") - 1).as("p"), col("value").as("hi_value"))
    approx.join(lo, Seq("c_mktsegment", "p")).join(hi, Seq("c_mktsegment", "p"))
      .select(col("c_mktsegment"), col("p"), col("lo_value"), col("hi_value"),
        (col("v_approx") >= col("lo_value") && col("v_approx") <= col("hi_value"))
          .cast("long").as("within_bound"))
      .orderBy("c_mktsegment", "p")
  }

  def percentilesBySegment(orders: DataFrame, customer: DataFrame,
                           ps: Seq[Int] = Seq(25, 50, 75, 90)): DataFrame = {
    val BucketCents = 100000L
    // consumed twice (bucket histogram + the in-bucket rank probe) —
    // materialize the narrow per-order relation once instead of running
    // the orders ⋈ customer join per consumer (guide §2.4)
    val joined = orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        cents(col("o_totalprice")).cast("long").as("v"))
      .withColumn("bkt", expr(s"v div $BucketCents"))
      .pinned()

    val wBkt = Window.partitionBy(col("c_mktsegment")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val hist = joined.groupBy(col("c_mktsegment"), col("bkt"))
      .agg(count(lit(1)).as("c"))
      .withColumn("cum", sum(col("c")).over(wBkt))
      .withColumn("cnt", sum(col("c")).over(Window.partitionBy(col("c_mktsegment"))))
    val spark = orders.sparkSession
    import spark.implicits._
    val psDf = ps.toDF("p")
    val targets = hist.crossJoin(broadcast(psDf))
      .withColumn("rk", greatest(lit(1L), expr("(cnt * p + 99) div 100")))
      .filter(col("cum") - col("c") < col("rk") && col("cum") >= col("rk"))
      .select(col("c_mktsegment").as("t_seg"), col("bkt").as("t_bkt"),
        col("p"), col("rk"), (col("cum") - col("c")).as("prev"))

    val wIn = Window.partitionBy(col("c_mktsegment"), col("bkt"), col("p")).orderBy(col("v"))
    joined
      .join(broadcast(targets),
        col("c_mktsegment") === col("t_seg") && col("bkt") === col("t_bkt"))
      .withColumn("irk", row_number().over(wIn) + col("prev"))
      .filter(col("irk") === col("rk"))
      .select(col("c_mktsegment"), col("p").cast("long").as("p"), col("v").as("value"))
      .orderBy("c_mktsegment", "p")
  }

  /** Fact ⋈ dimension enrichment: every order with its customer's
    * segment. No forced broadcast — customer scales with SF, so AQE picks
    * broadcast while it fits and a shuffled hash join beyond that. */
  def ordersEnriched(orders: DataFrame, customer: DataFrame): DataFrame =
    orders
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(
        col("o_orderkey"),
        col("o_custkey"),
        col("c_mktsegment"),
        cents(col("o_totalprice")).cast("long").as("totalprice_cents"))
      .orderBy("o_orderkey")

  /** MERGE/upsert semantics without a table format: apply a keyed
    * update batch to a base table as anti-join(base, updates) ∪ updates
    * — the CDC-apply primitive (matched rows replaced, unmatched
    * inserted) that Delta/Iceberg spell MERGE INTO, expressed as the
    * two-relation plan a plain-parquet lake runs. The update batch here
    * is derived deterministically from the base so the operation is
    * oracle-checkable: every orderkey divisible by 10 gets its price
    * raised by $1000 (an update), and every orderkey ≡ 1 (mod 1000)
    * spawns a shifted new order (an insert). Output is the per-status
    * rollup of the merged table — row counts and exact cent sums — so
    * both halves of the merge are visible in the checksum.
    *
    * Scale shape: one shuffle on the merge key for the anti-join (the
    * semantically required exchange — at a deployment the base side is
    * bucketed on the key and the exchange disappears), then a two-phase
    * rollup. The staged-rewrite half of a real upsert (write the merged
    * relation, swap) is the same machinery `compactDedupIndex` /
    * `applyCorpusDiff` already exercise against persisted tables. */
  def ordersUpsertApply(orders: DataFrame): DataFrame = {
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    val inserts = orders.filter(col("o_orderkey") % 1000 === 1)
      .withColumn("o_orderkey", col("o_orderkey") + lit(100000000L))
    val delta = updates.unionByName(inserts)
    val merged = orders.join(delta.select(col("o_orderkey").as("k")),
        col("o_orderkey") === col("k"), "left_anti")
      .unionByName(delta)
    merged.groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(cents(col("o_totalprice"))).cast("long").as("total_cents"))
      .orderBy("o_orderstatus")
  }

  /** CDC APPLY-CHANGES — the full changelog semantics [[ordersUpsertApply]]
    * stops short of: a feed of (key, op ∈ {I, U, D}, seq, payload) rows
    * where per key the HIGHEST-seq op wins and a winning D removes the
    * row — the Debezium/DLT `apply_changes` contract. The synthesized
    * feed overlaps deliberately (keys divisible by 70 get an update AND
    * a later delete, so seq resolution is exercised, not just unioned).
    * Scale shape: latest-per-key is a rank-1 window over the CHANGELOG
    * (changelog-sized partitions, never the base table); the apply is
    * the same anti-join ∪ survivors as MERGE; output is the
    * status-bounded rollup. */
  def cdcApplyChanges(orders: DataFrame): DataFrame = {
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey").as("k"), lit("U").as("op"), lit(2L).as("seq"),
        col("o_orderstatus"), (col("o_totalprice") + 1000.0).as("o_totalprice"))
    val deletes = orders.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey").as("k"), lit("D").as("op"), lit(3L).as("seq"),
        col("o_orderstatus"), col("o_totalprice"))
    val inserts = orders.filter(col("o_orderkey") % 1000 === 1)
      .select((col("o_orderkey") + lit(100000000L)).as("k"), lit("I").as("op"),
        lit(1L).as("seq"), col("o_orderstatus"), col("o_totalprice"))
    val log = updates.unionByName(deletes).unionByName(inserts)
    val wk = Window.partitionBy(col("k")).orderBy(col("seq").desc, col("op"))
    val latest = log.withColumn("rn", row_number().over(wk)).filter(col("rn") === 1)
    val applied = orders
      .join(latest.select(col("k")), col("o_orderkey") === col("k"), "left_anti")
      .select(col("o_orderstatus"), col("o_totalprice"))
      .unionByName(latest.filter(col("op") =!= "D")
        .select(col("o_orderstatus"), col("o_totalprice")))
    applied.groupBy(col("o_orderstatus"))
      .agg(
        count(lit(1)).as("n"),
        sum(cents(col("o_totalprice"))).cast("long").as("total_cents"))
      .orderBy("o_orderstatus")
  }

  /** SCD2 build: turn a keyed change log into a slowly-changing
    * dimension with [valid_from, valid_to) intervals — each customer's
    * orders, ordered by date, become versioned rows where a version's
    * validity ends the moment the next one begins (open-ended for the
    * current version). The warehouse move that makes point-in-time
    * joins (`fact.ts BETWEEN valid_from AND valid_to`) and the as-of
    * join ([[Sessionize.asofJoinOrders]]) interchangeable.
    *
    * Scale shape: one window keyed by the dimension key (millions of
    * small partitions, never a global sort) computing `lead`; the
    * output order is a final TakeOrdered-free sort only because the
    * oracle compares sorted — a deployment writes unsorted. */
  def scd2FromOrders(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders.select(
        col("o_custkey"),
        col("o_orderkey"),
        cents(col("o_totalprice")).cast("long").as("price_cents"),
        unix_timestamp(col("o_orderdate")).as("valid_from_sec"),
        (lead(unix_timestamp(col("o_orderdate")), 1).over(w) - 1L).as("valid_to_sec"))
      .orderBy("o_custkey", "valid_from_sec", "o_orderkey")
  }

  /** SCD2 TEMPORAL JOIN — the consumption side of [[scd2FromOrders]]:
    * each event enriched with the dimension version VALID AT its time
    * (`valid_from ≤ t ≤ valid_to`, open-ended last version). The plan is
    * an equi-join on the dimension KEY with the validity range as the
    * residual condition: a key's reducer input is its events × its
    * versions — bounded by that entity's own activity, never by the
    * corpus (the disclosed contrast to a keyless interval join). The
    * intervals partition time per key, so every event matches at most
    * one version; and because `valid_to = next_from − 1`, the matched
    * version is EXACTLY the as-of join's answer
    * ([[Sessionize.asofJoinOrders]]) — the interchangeability the SCD2
    * scaladoc promises, spec-pinned as row equality. */
  def scd2TemporalJoin(orders: DataFrame, events: DataFrame): DataFrame = {
    val dim = scd2FromOrders(orders)
    val ev = events.select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("t"))
    ev.join(dim, ev("user_id") === dim("o_custkey") &&
        col("t") >= col("valid_from_sec") &&
        (col("valid_to_sec").isNull || col("t") <= col("valid_to_sec")))
      .select(col("event_id"), col("user_id"),
        col("o_orderkey").as("version_orderkey"), col("price_cents"))
      .orderBy("event_id")
  }

  /** Top user JOURNEYS — the path-analysis companion of
    * [[eventTransitionMatrix]]: every consecutive 3-event sequence per
    * user (ordered by (ts, event_id), the funnel family's tie-break),
    * counted corpus-wide, top-k by frequency with integer-ppm shares.
    * The "what do users actually do in order" view one step deeper than
    * pairwise transitions — a Markov matrix cannot distinguish
    * view→click→purchase from view→click→error beyond its pairs.
    *
    * Scale shape: two `lead`s over per-user windows (millions of small
    * partitions), a (path)-keyed two-phase count agg bounded by
    * |event_type|³, TakeOrdered top-k, 1-row total broadcast. */
  def eventPathsTop(events: DataFrame, k: Int = 20): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val paths = events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("e2", lead(col("event_type"), 1).over(w))
      .withColumn("e3", lead(col("event_type"), 2).over(w))
      .filter(col("e2").isNotNull && col("e3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
    val counts = paths.groupBy(col("path")).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("n_paths"))
    counts
      .orderBy(col("n").desc, col("path"))
      .limit(k)
      .crossJoin(broadcast(total))
      .select(col("path"), col("n"), col("n_paths"),
        expr("(n * 1000000) div n_paths").as("share_ppm"))
      .orderBy(col("n").desc, col("path"))
  }

  /** The mergeable daily-revenue aggregate behind the MATERIALIZED-VIEW
    * lifecycle below: (day_sec, n_orders, revenue_cents) with integer
    * epoch-day keys. Count and sum are both mergeable, which is the
    * entire point — a maintained aggregate must re-aggregate its own
    * rows with a batch's partial rows and land on the full recompute. */
  private[operators] def dailyRevenueAgg(orders: DataFrame): DataFrame = {
    val u = unix_timestamp(col("o_orderdate"))
    orders
      .groupBy((u - u % lit(86400L)).as("day_sec"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).cast("long").as("revenue_cents"))
  }

  /** Initialize the persisted daily-revenue MATERIALIZED AGGREGATE — the
    * fourth persisted-artifact family after the dedup / IVF-PQ / BM25
    * indexes: a fact-table aggregate a pipeline maintains INCREMENTALLY
    * instead of recomputing over the full fact history per refresh. The
    * live tree holds the aggregate plus a batch-id LEDGER; both are
    * replaced together by one directory rename in
    * [[applyDailyRevenueDelta]], so the "which batches are in here"
    * record can never drift from the numbers (the search-index
    * commit-point idea, directory edition). */
  def saveDailyRevenue(orders: DataFrame, path: String): Unit = {
    val spark = orders.sparkSession
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(path), true)
    dailyRevenueAgg(orders).write.parquet(s"$path/live/agg")
    Seq.empty[Long].toDF("batch_id").write.parquet(s"$path/live/ledger")
  }

  /** Apply one fact batch to the maintained aggregate, REPLAY-SAFE: a
    * batch id already in the ledger is a re-delivery and the call is a
    * no-op (at-least-once ingestion double-counts a merged aggregate —
    * unlike an anti-join index, the damage is silent and permanent, so
    * the ledger is load-bearing here, not hygiene). The merge cost is
    * aggregate-table + batch-sized — the fact history is never re-read.
    * Staged-then-swap: the new agg AND the extended ledger are written
    * to a staging tree and take effect via the two-rename swap
    * (live→old, stage→live). A crash before the FIRST rename leaves the
    * live tree untouched; a crash between the two renames leaves no
    * `live` but a complete pre-apply `old` — [[recoverDailyRevenue]]
    * (run by both load and apply before touching the tree) restores it,
    * after which the re-delivered batch applies cleanly. Caveat for
    * object stores: directory "rename" is copy+delete there, so the
    * swap's crash window widens — on S3-class storage this family wants
    * a table format with a real commit log (the recovery hook is the
    * filesystem-tree stand-in for that commit protocol). */
  def applyDailyRevenueDelta(spark: org.apache.spark.sql.SparkSession, path: String,
                             batch: DataFrame, batchId: Long): Unit = {
    import spark.implicits._
    recoverDailyRevenue(spark, path)
    val applied = spark.read.parquet(s"$path/live/ledger")
      .filter(col("batch_id") === batchId).limit(1).count() > 0
    if (applied) return
    val merged = spark.read.parquet(s"$path/live/agg")
      .unionByName(dailyRevenueAgg(batch))
      .groupBy(col("day_sec"))
      .agg(
        sum(col("n_orders")).cast("long").as("n_orders"),
        sum(col("revenue_cents")).cast("long").as("revenue_cents"))
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$path/live")
    val stage = new org.apache.hadoop.fs.Path(s"$path/stage")
    val old = new org.apache.hadoop.fs.Path(s"$path/old")
    fs.delete(stage, true)
    merged.write.parquet(s"$path/stage/agg")
    spark.read.parquet(s"$path/live/ledger")
      .unionByName(Seq(batchId).toDF("batch_id"))
      .write.parquet(s"$path/stage/ledger")
    fs.delete(old, true)
    if (!fs.rename(live, old)) sys.error(s"applyDailyRevenueDelta: could not stage out $live")
    if (!fs.rename(stage, live)) {
      fs.rename(old, live)
      sys.error(s"applyDailyRevenueDelta: could not swap in $stage")
    }
    fs.delete(old, true)
    spark.catalog.refreshByPath(live.toString)
  }

  /** Crash recovery for the two-rename swap: a failure between
    * rename(live→old) and rename(stage→live) leaves no live tree but a
    * complete pre-apply `old` — roll it back so readers and the next
    * apply see the last committed state (the re-delivered batch then
    * re-applies on top). No-op whenever `live` exists. */
  def recoverDailyRevenue(spark: org.apache.spark.sql.SparkSession, path: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$path/live")
    val old = new org.apache.hadoop.fs.Path(s"$path/old")
    if (!fs.exists(live) && fs.exists(old)) {
      if (!fs.rename(old, live))
        sys.error(s"recoverDailyRevenue: could not restore $old to $live")
      spark.catalog.refreshByPath(live.toString)
    }
  }

  def loadDailyRevenue(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    recoverDailyRevenue(spark, path)
    spark.read.parquet(s"$path/live/agg")
  }

  /** Order→ship latency distribution — the supply-chain SLA view: whole
    * days between order date and each line item's ship date, as a
    * histogram with ppm shares. One join on the order key (the
    * semantically-required shuffle q3/q5 already pay), one two-phase agg
    * bounded by the DELAY DOMAIN (days), a 1-row total broadcast. */
  def shippingDelayHistogram(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val delays = lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(expr(
        "(unix_timestamp(l_shipdate) - unix_timestamp(o_orderdate)) div 86400")
        .as("delay_days"))
    val hist = delays.groupBy(col("delay_days")).agg(count(lit(1)).as("n"))
    hist.crossJoin(broadcast(hist.agg(sum(col("n")).as("total"))))
      .select(col("delay_days"), col("n").cast("long").as("n"),
        expr("(n * 1000000) div total").as("share_ppm"))
      .orderBy("delay_days")
  }

  /** Slowest suppliers by MEDIAN order→ship delay — the ranking that
    * decides who gets the procurement call. med2 = 2×median keeps the
    * even-count midpoint integer (the [[graft.operators.Audit]] family's
    * trick), computed via [[Median.med2ByKey]]'s nearest-rank histogram —
    * per-(supplier, delay-day) counts, never a per-group raw-value buffer
    * — so per-task rows are bounded by the DELAY DOMAIN at any fact
    * scale; the output is a k-bounded TakeOrdered. */
  def supplierDelayRanking(lineitem: DataFrame, orders: DataFrame, k: Int = 20): DataFrame = {
    val delays = lineitem.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey"), expr(
        "(unix_timestamp(l_shipdate) - unix_timestamp(o_orderdate)) div 86400")
        .as("delay_days"))
    Median.med2ByKey(delays, Seq("l_suppkey"), col("delay_days"))
      .select(col("l_suppkey"), col("n").as("n_lineitems"),
        col("med2").as("med2_delay_days"))
      .orderBy(col("med2_delay_days").desc, col("l_suppkey"))
      .limit(k)
  }

  /** Order→ship delay SLA percentiles per order month — the latency
    * curve an ops dashboard tracks (p50 says "typical", p99 says "who
    * is about to churn"): nearest-rank p50/p90/p99 of whole-day delays
    * via [[Median.nearestRankByKey]] — per-(month, delay-day) histogram
    * counts, so per-task rows are bounded by months × the delay domain
    * at any fact scale, and rank-ceil semantics hash-match DuckDB's
    * `quantile_disc` exactly (no interpolation anywhere). */
  def shippingDelayPercentiles(lineitem: DataFrame, orders: DataFrame): DataFrame = {
    val delays = lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("month_key"),
        expr("(unix_timestamp(l_shipdate) - unix_timestamp(o_orderdate)) div 86400")
          .as("delay_days"))
    Median.nearestRankByKey(delays, Seq("month_key"), col("delay_days"), Seq(50, 90, 99))
      .select(col("month_key"), col("n").as("n_lineitems"),
        col("p50"), col("p90"), col("p99"))
      .orderBy("month_key")
  }

  /** Equi-depth (equal-count) HISTOGRAM of order values — the other half
    * of the ANALYZE stats family next to [[tableColumnStats]]'s min/max:
    * 20 buckets each holding ~5% of orders, with per-bucket bounds and
    * counts. This is the column-statistics shape a cost-based optimizer
    * consumes for selectivity (equi-WIDTH histograms lie under skew).
    *
    * Same machinery as [[rfmSegments]]: values quantize to a bounded
    * $100 domain, the 19 fences come from nearest-rank cuts
    * (`min{v : 20·cum ≥ k·n}`) over the value-domain histogram, and
    * bucket assignment + rollup run ON the histogram (bounded), never
    * re-scanning facts. Ties cannot straddle a fence, so bucket counts
    * deviate from n/20 exactly where duplicate values force it —
    * disclosed by the counts themselves. */
  def ordersPriceHistogram(orders: DataFrame, buckets: Int = 20): DataFrame = {
    val v = expr("cast(round(o_totalprice*100) as bigint) div 10000")
    val hist = orders.select(v.as("v")).groupBy(col("v")).agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = hist.agg(sum(col("cnt")).as("n"))
    val fenceExprs = (1 until buckets).map(k =>
      min(when(col("cum") * buckets >= col("n") * k, col("v"))).as(s"f$k"))
    val fences = cum.crossJoin(broadcast(tot))
      .agg(fenceExprs.head, fenceExprs.tail: _*)
    val bucket = (1 until buckets)
      .map(k => when(col("v") > col(s"f$k"), 1).otherwise(0))
      .reduce(_ + _) + lit(1)
    cum.crossJoin(broadcast(fences))
      .select(col("v"), col("cnt"), bucket.cast("long").as("bucket"))
      .groupBy(col("bucket"))
      .agg(
        sum(col("cnt")).cast("long").as("n_orders"),
        min(col("v")).as("v_lo_100usd"),
        max(col("v")).as("v_hi_100usd"))
      .orderBy("bucket")
  }

  /** Integer rank analytics over the DAILY revenue aggregate — the
    * rank / ntile / cumulative-position window functions demonstrated
    * where they are scale-safe: the window input is the day-keyed
    * aggregate (bounded by the TIME DOMAIN, never by fact volume — the
    * `daily_revenue_running` contract), so the single ordered window is
    * bounded by construction. `pct_milli` is the integer percent-rank
    * ((rank−1)·1000 div (n−1)) — no float `percent_rank` in the output,
    * so the result hashes identically cross-engine. */
  def dailyRevenueRankStats(orders: DataFrame): DataFrame = {
    val daily = dailyRevenueAgg(orders)
    val w = Window.orderBy(col("revenue_cents").desc, col("day_sec"))
    daily
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("n_days", count(lit(1)).over(Window.partitionBy()))
      .select(col("day_sec"), col("n_orders"), col("revenue_cents"),
        col("rk"), col("quartile"),
        expr("((rk - 1) * 1000) div greatest(n_days - 1, 1)").as("pct_milli"))
      .orderBy("day_sec")
  }

  /** RFM (recency / frequency / monetary) quartile segmentation of the
    * customer base — the classic product-analytics cube: each customer
    * scored 1–4 on days-since-last-order, order count, and lifetime
    * spend, rolled up to segment cells. Quartile FENCES use the
    * nearest-rank rule `fence_k = min{v : 4·cum(v) ≥ k·n}` so ties never
    * straddle a fence (a value sits entirely in one quartile) and the
    * result is partitioning/engine-stable with zero float arithmetic.
    *
    * Scale shape — the [[graft.operators.TextAnalysis.qualityCalibrated]]
    * histogram pattern, not an `ntile` over customers: each dimension's
    * fences derive from a bounded VALUE-DOMAIN histogram (days span the
    * date domain, counts are small integers, spend is bucketed to $1000
    * — the disclosed granularity), a cumulative window over that bounded
    * table, and a 1-row broadcast of the three fences back over the
    * per-customer relation. An `ntile` would sort every customer through
    * one ordered window; here no per-customer sort exists anywhere. */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val sec = unix_timestamp(col("o_orderdate"))
    val maxd = orders.agg(max(sec).as("maxd"))
    val per = orders.groupBy(col("o_custkey"))
      .agg(
        max(sec).as("last_sec"),
        count(lit(1)).as("f_n"),
        sum(cents(col("o_totalprice"))).cast("long").as("m_cents"))
      .crossJoin(broadcast(maxd))
      .select(
        col("o_custkey"),
        expr("(maxd - last_sec) div 86400").as("r_days"),
        col("f_n"),
        expr("m_cents div 100000").as("m_bucket"))
      // one row per customer, consumed by three fence derivations (each
      // reading it twice: histogram + total) plus the final segment
      // pass — unpinned, the orders aggregate executed ~7x per query
      // (guide §2.4); a per-customer RFM relation is index-sized
      .pinned()
    def fences(c: String): DataFrame = {
      val hist = per.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
      val cum = hist.withColumn("cum",
        sum(col("cnt")).over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      cum.crossJoin(broadcast(hist.agg(sum(col("cnt")).as("n"))))
        .agg(
          min(when(col("cum") * 4 >= col("n"), col("v"))).as(s"${c}_f1"),
          min(when(col("cum") * 4 >= col("n") * 2, col("v"))).as(s"${c}_f2"),
          min(when(col("cum") * 4 >= col("n") * 3, col("v"))).as(s"${c}_f3"))
    }
    def seg(c: String): Column =
      (lit(1) + when(col(c) > col(s"${c}_f1"), 1).otherwise(0)
        + when(col(c) > col(s"${c}_f2"), 1).otherwise(0)
        + when(col(c) > col(s"${c}_f3"), 1).otherwise(0)).cast("long")
    per
      .crossJoin(broadcast(fences("r_days")))
      .crossJoin(broadcast(fences("f_n")))
      .crossJoin(broadcast(fences("m_bucket")))
      .select(seg("r_days").as("r_q"), seg("f_n").as("f_q"), seg("m_bucket").as("m_q"))
      .groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("r_q", "f_q", "m_q")
  }

  /** Per-entity trailing-window features — the lag-feature builder of an
    * ML feature pipeline: for every order, the same customer's order count
    * and spend over the preceding 90 days (STRICTLY before, so the
    * feature is leakage-free for a model predicting the current order)
    * plus whole days since the previous order. The RANGE frame is
    * value-based on epoch seconds, so same-timestamp peers are excluded
    * identically in both engines (no ROWS-frame tie ambiguity).
    *
    * Scale shape: one exchange on the entity key serves both windows
    * (millions of small per-customer partitions, never a global sort);
    * the RANGE frame is Spark's native sliding-frame implementation —
    * state bounded by one key's rows inside the span. `div` (not `/`)
    * keeps the day arithmetic integer-exact cross-engine. */
  def customerTrailingFeatures(orders: DataFrame, trailingDays: Int = 90): DataFrame = {
    val base = orders.select(
      col("o_orderkey"), col("o_custkey"),
      unix_timestamp(col("o_orderdate")).as("order_sec"),
      cents(col("o_totalprice")).cast("long").as("price_cents"))
    val trail = Window.partitionBy(col("o_custkey")).orderBy(col("order_sec"))
      .rangeBetween(-trailingDays.toLong * 86400L, -1L)
    val seq = Window.partitionBy(col("o_custkey"))
      .orderBy(col("order_sec"), col("o_orderkey"))
    base.select(
        col("o_orderkey"), col("o_custkey"), col("order_sec"),
        count(lit(1)).over(trail).as("prev_n_90d"),
        coalesce(sum(col("price_cents")).over(trail), lit(0L)).as("prev_cents_90d"),
        (col("order_sec") - lag(col("order_sec"), 1).over(seq)).as("gap_sec"))
      .withColumn("days_since_prev", expr("gap_sec div 86400"))
      .drop("gap_sec")
      .orderBy("o_orderkey")
  }

  /** Time-series resample + gap-fill over the event stream: fixed-width
    * buckets per event_type, zero-filled where no events landed, plus a
    * last-observation-carried-forward (LOCF) reading of the bucket's
    * value sum — the dashboard/feature-engineering primitive a plain
    * `groupBy` cannot produce, because buckets with no events simply
    * don't exist in grouped output. (The reference's event-stream domain
    * implies exactly this downsampling step before charting/alerting.)
    *
    * Scale shape: the per-bucket aggregate is an ordinary two-phase
    * hash-agg keyed finer than the corpus. The dense grid derives from a
    * ONE-ROW (min,max) aggregate exploded by `sequence`, so its size is
    * bounded by the TIME DOMAIN (span/bucket × |event types|), never by
    * the data — a year of 15-min buckets x 100 types is 3.5 M rows. The
    * grid×types nested-loop join broadcasts the bounded type table, and
    * the LOCF window partitions by type over the bounded grid. Bucketing
    * is integer epoch arithmetic (`u - u % bucketSec`), immune to
    * truncation-unit drift between engines. */
  def eventsResampleGapfill(events: DataFrame, bucketSec: Long = 900L): DataFrame = {
    val u = unix_timestamp(col("ts"))
    val bucketed = events.select(
      col("event_type"),
      (u - u % lit(bucketSec)).as("bucket_sec"),
      col("value"))
    val perBucket = bucketed
      .groupBy(col("event_type"), col("bucket_sec"))
      .agg(
        count(lit(1)).as("n"),
        sum(cents(col("value"))).cast("long").as("value_cents"))
    val span = bucketed.agg(min(col("bucket_sec")).as("b0"), max(col("bucket_sec")).as("b1"))
    val grid = span.select(explode(sequence(col("b0"), col("b1"), lit(bucketSec))).as("bucket_sec"))
    val types = events.select(col("event_type")).distinct()
    val locf = Window.partitionBy(col("event_type")).orderBy(col("bucket_sec"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(broadcast(types))
      .join(perBucket, Seq("event_type", "bucket_sec"), "left")
      .select(
        col("event_type"),
        col("bucket_sec"),
        coalesce(col("n"), lit(0L)).as("n"),
        coalesce(col("value_cents"), lit(0L)).as("value_cents"),
        coalesce(last(col("value_cents"), ignoreNulls = true).over(locf), lit(0L))
          .as("locf_value_cents"))
      .orderBy("event_type", "bucket_sec")
  }

  /** Column profile of a table — the ANALYZE/statistics primitive a
    * cost-based planner (and any data-quality gate) feeds on: per
    * column, row count, null count, exact NDV, and min/max
    * (integer-normalized for numerics/timestamps, raw for strings).
    *
    * Scale shape, learned the measured way: a STRING min/max buffer is
    * variable-width, which disqualifies HashAggregate and demoted the
    * whole first-cut single aggregate to a SortAggregate over the
    * 7×-Expanded relation (3.3 s at sf0.1 where every comparable agg
    * runs sub-second). So the wide pass keeps only fixed-width buffers
    * — null counts, exact NDVs, numeric min/max — and plans as Expand +
    * two-phase HASH agg (per-column keys dedup map-side; shuffle
    * bounded by Σ NDV); string extremes reduce over each string
    * column's DISTINCT-value relation instead (hash agg on the string
    * KEY, then a min/max over ndv-sized input — sort-aggregating 8 rows,
    * not 700 k). The three one-row results meet in broadcast crossJoins.
    * The Expand factor is the disclosed price of exact NDV; at 100 TB
    * swap `countDistinct` for `approx_count_distinct` (HLL, no Expand)
    * unless exactness is contractual. Output is long-format (one row
    * per column) so the profile is itself joinable/diffable. */
  def tableColumnStats(orders: DataFrame): DataFrame = {
    def nNulls(c: String) = sum(when(col(c).isNull, 1L).otherwise(0L))
    def strExtremes(c: String, lo: String, hi: String) =
      orders.select(col(c).as("v")).groupBy(col("v"))
        .agg(count(lit(1)).as("cnt")).select(col("v"))
        .agg(min(col("v")).as(lo), max(col("v")).as(hi))
    val wide = orders.agg(
      count(lit(1)).as("n_rows"),
      nNulls("o_orderkey").as("nulls_okey"), countDistinct(col("o_orderkey")).as("ndv_okey"),
      min(col("o_orderkey")).as("min_okey"), max(col("o_orderkey")).as("max_okey"),
      nNulls("o_custkey").as("nulls_ckey"), countDistinct(col("o_custkey")).as("ndv_ckey"),
      min(col("o_custkey")).as("min_ckey"), max(col("o_custkey")).as("max_ckey"),
      nNulls("o_orderstatus").as("nulls_stat"), countDistinct(col("o_orderstatus")).as("ndv_stat"),
      nNulls("o_totalprice").as("nulls_price"), countDistinct(col("o_totalprice")).as("ndv_price"),
      min(cents(col("o_totalprice"))).cast("long").as("min_price"),
      max(cents(col("o_totalprice"))).cast("long").as("max_price"),
      nNulls("o_orderdate").as("nulls_date"), countDistinct(col("o_orderdate")).as("ndv_date"),
      min(unix_timestamp(col("o_orderdate"))).as("min_date"),
      max(unix_timestamp(col("o_orderdate"))).as("max_date"),
      nNulls("o_orderpriority").as("nulls_prio"), countDistinct(col("o_orderpriority")).as("ndv_prio"))
    val one = wide
      .crossJoin(broadcast(strExtremes("o_orderstatus", "min_stat", "max_stat")))
      .crossJoin(broadcast(strExtremes("o_orderpriority", "min_prio", "max_prio")))
    one.selectExpr(
      """stack(6,
        |  'o_orderkey',      n_rows, nulls_okey,  ndv_okey,  min_okey,  max_okey,  CAST(NULL AS STRING), CAST(NULL AS STRING),
        |  'o_custkey',       n_rows, nulls_ckey,  ndv_ckey,  min_ckey,  max_ckey,  CAST(NULL AS STRING), CAST(NULL AS STRING),
        |  'o_orderstatus',   n_rows, nulls_stat,  ndv_stat,  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), min_stat, max_stat,
        |  'o_totalprice',    n_rows, nulls_price, ndv_price, min_price, max_price, CAST(NULL AS STRING), CAST(NULL AS STRING),
        |  'o_orderdate',     n_rows, nulls_date,  ndv_date,  min_date,  max_date,  CAST(NULL AS STRING), CAST(NULL AS STRING),
        |  'o_orderpriority', n_rows, nulls_prio,  ndv_prio,  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT), min_prio, max_prio
        |) AS (col_name, n_rows, n_nulls, ndv, min_num, max_num, min_str, max_str)""".stripMargin)
      .orderBy("col_name")
  }

  /** Wide→long reshape via Spark's native `unpivot` (melt) — the inverse
    * of `pivot` and the one relational reshape the surface lacked. Each
    * lineitem row's four measure columns become (metric, v_centi) rows
    * AFTER integer centi-unit conversion (quantity in centi-units,
    * money/rates in cents/bp — exact in both engines), then a two-phase
    * agg by (returnflag, metric). Scale shape: `unpivot` plans as a
    * map-side Expand over the scan (×4 rows, no shuffle — same family as
    * the NDV Expand in [[tableColumnStats]]); the only exchange is the
    * (flag × metric)-bounded rollup, so the reshape itself never moves
    * data. The oracle states the identical melt as the portable
    * UNION ALL formulation. */
  def lineitemMetricsUnpivot(lineitem: DataFrame): DataFrame =
    lineitem.select(
        col("l_returnflag"),
        cents(col("l_quantity")).cast("long").as("l_quantity"),
        cents(col("l_extendedprice")).cast("long").as("l_extendedprice"),
        cents(col("l_discount")).cast("long").as("l_discount"),
        cents(col("l_tax")).cast("long").as("l_tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "v_centi")
      .groupBy("l_returnflag", "metric")
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("v_centi")).cast("long").as("sum_centi"),
        min(col("v_centi")).cast("long").as("min_centi"),
        max(col("v_centi")).cast("long").as("max_centi"))
      .orderBy("l_returnflag", "metric")

  /** DAU / trailing-7-day rolling distinct users (WAU) / integer
    * stickiness ppm — the engagement curve next to
    * [[retentionCohorts]]. Rolling DISTINCT over a sliding window is
    * not derivable from per-day distincts (users repeat across days),
    * and re-scanning the trailing week per day reads the facts 7×; the
    * scale shape is the (day, user) DISTINCT pair relation (map-side
    * partial dedup; rows bounded by users × active days, far below
    * event count) exploded to the ≤ 7 trailing windows each pair
    * serves, then ONE two-phase countDistinct per window day. DAU rides
    * the same pair relation (already distinct, so a plain count). The
    * window clip joins a 1-row max-day aggregate (broadcast). Output is
    * bounded by the day domain. */
  def userStickinessDaily(events: DataFrame): DataFrame = {
    val pairs = events
      .select(expr("unix_timestamp(ts) div 86400").as("d"), col("user_id"))
      .distinct()
    val maxDay = pairs.agg(max(col("d")).as("max_d"))
    val wau = pairs
      .select(explode(sequence(col("d"), col("d") + 6)).as("day"), col("user_id"))
      .crossJoin(broadcast(maxDay))
      .filter(col("day") <= col("max_d"))
      .groupBy("day")
      .agg(countDistinct(col("user_id")).as("wau7"))
    val dau = pairs.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau"))
    wau.join(dau, Seq("day"), "left")
      .select(
        col("day"),
        coalesce(col("dau"), lit(0L)).cast("long").as("dau"),
        col("wau7").cast("long").as("wau7"),
        expr("(coalesce(dau, 0) * 1000000) div wau7").as("stickiness_ppm"))
      .orderBy("day")
  }

  /** Winsorized order values per market segment — the outlier-clamping
    * feature-engineering op: per-segment p5/p95 fences from
    * [[Median.nearestRankByKey]] over the $100-quantized value domain
    * (fences land on bucket edges — the disclosed quantization that
    * keeps the fence histogram bounded by segments × price-range/$100
    * instead of per-order-unique cents), every order clamped into
    * [lo, hi], and a per-segment report comparing raw vs winsorized
    * sums plus clamp counts. No per-segment sort of orders anywhere;
    * the fence rule is DuckDB `quantile_disc` exactly, and the
    * |segments|-row fence relation broadcasts back over the scan. */
  def orderValueWinsorized(orders: DataFrame, customer: DataFrame): DataFrame = {
    val j = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), cents(col("o_totalprice")).cast("long").as("cents_v"))
      // fence derivation + clamp pass both read it: one join, not two
      .pinned()
    val fences = Median.nearestRankByKey(j, Seq("c_mktsegment"),
        expr("cents_v div 10000"), Seq(5, 95))
      .select(col("c_mktsegment"), (col("p5") * 10000L).as("lo"), (col("p95") * 10000L).as("hi"))
    j.join(broadcast(fences), "c_mktsegment")
      .withColumn("w", greatest(col("lo"), least(col("hi"), col("cents_v"))))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).cast("long").as("n_orders"),
        sum(col("cents_v")).cast("long").as("sum_cents"),
        sum(col("w")).cast("long").as("sum_winsorized_cents"),
        sum(when(col("cents_v") < col("lo"), 1L).otherwise(0L)).cast("long").as("n_clamped_lo"),
        sum(when(col("cents_v") > col("hi"), 1L).otherwise(0L)).cast("long").as("n_clamped_hi"),
        min(col("lo")).cast("long").as("lo_cents"),
        min(col("hi")).cast("long").as("hi_cents"))
      .orderBy("c_mktsegment")
  }

  // --------------------------------------------------------------------
  // Correlated-subquery suite (TPC-H Q4/Q11/Q13/Q17/Q21/Q22 analogues,
  // adapted to the reduced synthetic schema — no partsupp/commitdate).
  // The reference has no subqueries at all; at 100 TB the thing that
  // matters is that every correlated form below is DECORRELATED by
  // construction: expressed as aggregate-then-join plans that shuffle
  // each fact table once, never as a per-row re-scan. Spark's optimizer
  // performs the same rewrites on SQL-form subqueries (RewriteCorrelated
  // ScalarSubquery etc.); writing the decorrelated shape directly makes
  // the plan explicit and assertable.
  // --------------------------------------------------------------------

  /** Q4 analogue — EXISTS-style semi-join with a non-equi residual:
    * orders that had at least one lineitem shipped more than 30 days
    * after the order date, counted per priority bucket.
    *
    * The EXISTS is a LEFT SEMI hash join on orderkey with the lateness
    * predicate as the join residual — lineitem is never aggregated or
    * deduplicated first (the semi join short-circuits on first match),
    * and only (l_orderkey, l_shipdate) is read from the fact scan.
    * Output is bounded by the 5-value priority domain. */
  def latePriorityDistribution(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(
        lineitem.select(col("l_orderkey"), col("l_shipdate")),
        col("o_orderkey") === col("l_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("long").as("n_late_orders"))
      .orderBy("o_orderpriority")

  /** Q11 analogue — HAVING against a global scalar subquery: brands
    * whose lineitem revenue exceeds the all-brand average. The scalar
    * subquery decorrelates to a 1-row aggregate of the 25-row per-brand
    * relation, broadcast back via crossJoin — the fact table is scanned
    * and shuffled exactly once (lineitem ⋈ part on partkey, both
    * SF-scaled, so no broadcast hint: AQE picks the strategy). The
    * above-average test is integer cross-multiplication
    * (rc·n_brands > total), never a float division. */
  def brandRevenueAboveAverage(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val perBrand = lineitem
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(cents(col("l_extendedprice"))).cast("long").as("revenue_cents"))
    val total = perBrand.agg(
      sum(col("revenue_cents")).as("tot"), count(lit(1)).as("nb"))
    perBrand
      .crossJoin(broadcast(total))
      .filter(col("revenue_cents") * col("nb") > col("tot"))
      .select(col("p_brand"), col("revenue_cents"),
        expr("revenue_cents * 1000000 div tot").as("share_ppm"))
      .orderBy("p_brand")
  }

  /** Q13 analogue — order-count distribution over ALL customers,
    * including zero-order ones: a left outer join (customer ⋈ orders)
    * counted per customer, then a count-of-counts. The first aggregate
    * is two-phase hash on custkey (the outer join's own shuffle key, so
    * AQE coalesces into one exchange); the second groups the bounded
    * order-count domain. `count(o_orderkey)` counts non-null matches —
    * the standard SQL idiom that makes the unmatched row count as 0
    * instead of 1. */
  def customerOrderDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.select(col("c_custkey"))
      .join(orders.select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
      .groupBy(col("n_orders"))
      .agg(count(lit(1)).cast("long").as("n_customers"))
      .orderBy("n_orders")

  /** Q17 analogue — correlated per-group average: revenue from lineitems
    * whose quantity is below half their part's average quantity,
    * reported per brand. The correlated `avg(l_quantity) WHERE
    * l_partkey = outer.l_partkey` decorrelates to ONE per-part
    * aggregate joined back to the fact scan (both sides shuffle on
    * partkey; AQE reuses the exchange). The below-half-average test is
    * integer cross-multiplication over unit quantities
    * (2·qty·n < Σqty) — exact, no float average anywhere. */
  def smallQuantityRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val perPart = lineitem
      .groupBy(col("l_partkey").as("pk"))
      .agg(
        // floor, not cast: a raw long-cast truncates toward zero in
        // Spark but ROUNDS in a DuckDB double->BIGINT cast — floor is
        // the one conversion both engines define identically, so the
        // gate survives a generator that emits fractional quantities
        sum(floor(col("l_quantity")).cast("long")).as("sum_qty"),
        count(lit(1)).as("n_lines"))
    lineitem
      .join(perPart, col("l_partkey") === col("pk"))
      .filter(floor(col("l_quantity")).cast("long") * 2 * col("n_lines") < col("sum_qty"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).cast("long").as("n_small_lines"),
        sum(cents(col("l_extendedprice"))).cast("long").as("revenue_cents"))
      .orderBy("p_brand")
  }

  /** Q21 analogue — the double-EXISTS query: suppliers who were the
    * SOLE late shipper in a multi-supplier finished order. The classic
    * form needs one EXISTS (another supplier in the order) and one
    * NOT EXISTS (another LATE supplier) — two correlated self-joins of
    * the biggest fact table. Decorrelated here to a single per-order
    * aggregate: distinct suppliers, distinct late suppliers, and
    * min(late supplier) — when the late-count is exactly 1, the min IS
    * the culprit. One orderkey shuffle replaces both self-joins; the
    * blame list then aggregates on the bounded supplier dimension.
    * Late = shipped >30 days after order date; 'F' status only. */
  def soleLateSupplier(orders: DataFrame, lineitem: DataFrame, supplier: DataFrame): DataFrame = {
    val lines = lineitem
      .join(orders.filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("late"))
    val perOrder = lines
      .groupBy(col("l_orderkey"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(when(col("late"), col("l_suppkey"))).as("n_late"),
        min(when(col("late"), col("l_suppkey"))).as("late_supp"))
    perOrder
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .groupBy(col("late_supp"))
      .agg(count(lit(1)).cast("long").as("n_waiting_orders"))
      .join(supplier.select(col("s_suppkey"), col("s_name")),
        col("late_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_waiting_orders"))
      .orderBy(col("n_waiting_orders").desc, col("s_suppkey"))
  }

  /** Q6 analogue — the pure scan-filter-aggregate: revenue uplift from a
    * discount band (1996 shipments, discount 5–7%, quantity < 24). The
    * whole query is ONE parquet scan: all three predicates push to the
    * reader (`PushedFilters` shows the shipdate range, the discount
    * band, and the quantity cap), so at 100 TB row groups outside the
    * year are skipped on min/max stats and nothing but the 3 referenced
    * columns is read. Output is one row. */
  def discountBandRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        sum(cents(col("l_extendedprice") * col("l_discount"))).cast("long").as("uplift_cents"))

  /** Q7 analogue — the cross-nation trade matrix: discounted revenue per
    * (supplier nation, customer nation, ship year), intra-nation trade
    * excluded. The classic Q7 pins one nation pair; grouping the full
    * matrix instead keeps the output bounded by the DIMENSION domain
    * (25·24 pairs × years) while exercising the same 4-way star: the
    * only SF-scaled shuffle is lineitem ⋈ orders on orderkey — customer
    * and supplier enrichments are left to AQE, and the two 25-row
    * nation legs are broadcast. */
  def nationTradeMatrix(nation: DataFrame, customer: DataFrame, orders: DataFrame,
                        lineitem: DataFrame, supplier: DataFrame): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .join(broadcast(nation.select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))),
        col("c_nationkey") === col("cnk"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("long").as("revenue_cents"))
      .orderBy("supp_nation", "cust_nation", "ship_year")

  /** Q8 analogue — market share: the ppm of each customer-region's
    * yearly revenue supplied by `targetNation`'s suppliers. Numerator
    * and denominator ride ONE aggregation (conditional sum vs total —
    * no second pass, no self-join); the share is integer ppm division
    * of two long cent sums. Region/nation legs broadcast; the fact
    * shuffle is the same single orderkey exchange as Q7. */
  def nationMarketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
                        orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
                        targetNation: String = "NATION_0"): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("cnk"), col("n_regionkey"))),
        col("c_nationkey") === col("cnk"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
        col("s_nationkey") === col("snk"))
      .groupBy(col("r_name"), year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("long").as("total_cents"),
        sum(when(col("supp_nation") === targetNation,
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).otherwise(lit(0)))
          .cast("long").as("target_cents"))
      .select(col("r_name"), col("order_year"), col("total_cents"),
        expr("target_cents * 1000000 div total_cents").as("share_ppm"))
      .orderBy("r_name", "order_year")

  /** Q10 analogue — returned-item blame list: top 20 customers by
    * revenue on lineitems flagged 'R'. The returnflag filter pushes to
    * the fact scan (at 100 TB: ~1/3 of row groups survive the min/max
    * cut at worst, dictionary pruning at best); one orderkey shuffle,
    * per-customer aggregate, then TakeOrderedAndProject — no global
    * sort ever materializes. */
  def returnedItemCustomers(customer: DataFrame, orders: DataFrame,
                            lineitem: DataFrame, k: Int = 20): DataFrame =
    lineitem
      .filter(col("l_returnflag") === "R")
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("long").as("returned_cents"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("returned_cents"))
      .orderBy(col("returned_cents").desc, col("c_custkey"))
      .limit(k)

  /** Q14 analogue — promo revenue share per ship year: numerator
    * (PROMO-type parts) and denominator in ONE conditional aggregate
    * over the lineitem ⋈ part join, share as integer ppm. The 6-value
    * p_type never leaves the map side: the join key is partkey and the
    * CASE collapses the type immediately. */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part.select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("long").as("total_cents"),
        sum(when(col("p_type") === "PROMO",
          cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).otherwise(lit(0)))
          .cast("long").as("promo_cents"))
      .select(col("ship_year"), col("promo_cents"), col("total_cents"),
        expr("promo_cents * 1000000 div total_cents").as("promo_ppm"))
      .orderBy("ship_year")

  /** Q19 analogue — disjunctive bracket pricing: revenue from three
    * (brand, quantity-band, size-band) OR-brackets, reported per brand.
    * The disjunction SPLITS BY TABLE by construction: the part side
    * keeps `p_brand IN (…) AND p_size ≤ max` (prunable at its scan —
    * the OR's per-table envelope, which Spark does not derive from a
    * cross-table disjunction on its own), the lineitem side keeps the
    * quantity envelope, and only the residual bracket test rides the
    * partkey join. Writing the envelopes explicitly is the at-scale
    * point: a naive single OR predicate across both tables pushes
    * NOTHING to either scan. */
  def bracketRevenue(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val qty = col("l_quantity")
    val bracket =
      (col("p_brand") === "Brand#1" && qty.between(1, 11) && col("p_size").between(1, 5)) ||
      (col("p_brand") === "Brand#2" && qty.between(10, 20) && col("p_size").between(1, 10)) ||
      (col("p_brand") === "Brand#3" && qty.between(20, 30) && col("p_size").between(1, 15))
    lineitem
      .filter(qty.between(1, 30)) // quantity envelope of the disjunction
      .join(part
          .filter(col("p_brand").isin("Brand#1", "Brand#2", "Brand#3") &&
            col("p_size").between(1, 15)) // part-side envelope
          .select(col("p_partkey"), col("p_brand"), col("p_size")),
        col("l_partkey") === col("p_partkey") && bracket)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).cast("long").as("n_lines"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("long").as("revenue_cents"))
      .orderBy("p_brand")
  }

  /** Leakage-safe (out-of-fold) target encoding — the categorical-
    * feature prep step tabular ML pipelines get wrong at scale: the
    * naive "mean target per category" leaks every row's OWN label into
    * its feature (the model then memorizes rare categories), and the
    * classic fix — K-fold exclusion — is usually coded as K re-
    * aggregations. Here both grains come from ONE bounded aggregate:
    * per (category, fold) sums roll up to per-category totals, and the
    * out-of-fold encoding is pure subtraction,
    * `(s_c − s_cf) div (n_c − n_cf)` — exact integer cents, K passes
    * never happen, shuffle bounded by |categories|·K. The per-fold
    * report is the leakage AUDIT view (a fold whose encoding swings is
    * a category dominated by few rows); serving joins this ≤ |C|·K-row
    * table broadcast onto the facts. A category living entirely in one
    * fold has no out-of-fold rows — encoded NULL, the caller falls back
    * to the global prior. */
  def segmentTargetEncoding(orders: DataFrame, customer: DataFrame,
                            folds: Int = 5): DataFrame = {
    val rows = orders
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"),
        (conv(substring(md5(concat_ws(":", lit("fold"), col("o_orderkey"))), 1, 4), 16, 10)
          .cast("long") % folds).as("fold"),
        cents(col("o_totalprice")).cast("long").as("v"))
    val cf = rows.groupBy(col("c_mktsegment"), col("fold"))
      .agg(count(lit(1)).as("n_cf"), sum(col("v")).as("s_cf"))
    val c = cf.groupBy(col("c_mktsegment"))
      .agg(sum(col("n_cf")).as("n_c"), sum(col("s_cf")).as("s_c"))
    cf.join(c, "c_mktsegment")
      .select(col("c_mktsegment"), col("fold"),
        col("n_cf").cast("long").as("n_rows"),
        expr("CASE WHEN n_c > n_cf THEN (s_c - s_cf) div (n_c - n_cf) END")
          .cast("long").as("encoding_cents"))
      .orderBy("c_mktsegment", "fold")
  }

  /** Lead–lag cross-correlation between two daily event series (clicks
    * vs purchases): for each lag in ±`maxLag` days, the integer-scaled
    * covariance `n·Σxy − Σx·Σy` over the overlapping days — positive
    * peaks locate "purchases follow clicks by k days". Everything runs
    * on the DAY-domain aggregate: the lag expansion is a ≤(2L+1)×
    * explode of that bounded relation and the shift is an EQUI join on
    * the day key (never an inequality join); the scaled-covariance form
    * avoids both float means and the subtraction-of-large-squares trap.
    * Scores are comparable across lags where n is equal (the interior
    * lags); edge lags carry their smaller n visibly. */
  def eventLagCorrelation(events: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = events
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .agg(
        sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("c"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
    val shifted = daily.select(col("day"), col("c"))
      .withColumn("lag", explode(sequence(lit(-maxLag), lit(maxLag))))
      .withColumn("pday", col("day") + col("lag") * 86400L)
    shifted
      .join(daily.select(col("day").as("pday"), col("p")), "pday")
      .groupBy(col("lag").cast("long").as("lag"))
      .agg(
        count(lit(1)).as("n_days"),
        sum(col("c")).as("sc"), sum(col("p")).as("sp"),
        sum(col("c") * col("p")).as("scp"))
      .select(col("lag"), col("n_days").cast("long").as("n_days"),
        (col("n_days") * col("scp") - col("sc") * col("sp")).cast("long").as("cov_scaled"))
      .orderBy("lag")
  }

  /** Q15 analogue — top supplier(s) by quarter revenue, TIES INCLUDED:
    * the view-plus-scalar-max query. One shipdate-pruned fact pass
    * builds the per-supplier revenue relation; the max is a 1-row
    * broadcast joined back with an exact integer equality (no rank
    * window, no second fact scan), so two suppliers at the same cent
    * both win — the tie semantics TPC-H requires and `LIMIT 1` gets
    * wrong. */
  def topQuarterSupplier(supplier: DataFrame, lineitem: DataFrame,
                         qStart: String = "1996-01-01",
                         qEnd: String = "1996-04-01"): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit(qStart).cast("timestamp") &&
        col("l_shipdate") < lit(qEnd).cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).cast("long").as("revenue_cents"))
    rev
      .crossJoin(broadcast(rev.agg(max(col("revenue_cents")).as("best"))))
      .filter(col("revenue_cents") === col("best"))
      .join(supplier.select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_cents"))
      .orderBy("s_suppkey")
  }

  /** Q18 analogue — large-volume orders: the HAVING-driven semi-join.
    * The quantity filter aggregates lineitem ONCE on its natural key
    * (orderkey — the same shuffle every order-grain query pays) and the
    * qualifying keys join orders + customer; at 100 TB the per-order
    * aggregate is two-phase (map-side partials collapse each order's
    * lines within a task) and the top-k is TakeOrdered, so the >150-qty
    * HAVING never materializes a sorted corpus. */
  def largeVolumeOrders(customer: DataFrame, orders: DataFrame,
                        lineitem: DataFrame, minQty: Long = 150,
                        k: Int = 20): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      // floor: the only double->integer conversion Spark and DuckDB
      // agree on (cast truncates here, rounds there)
      .agg(sum(floor(col("l_quantity")).cast("long")).as("total_qty"))
      .filter(col("total_qty") > minQty)
      .join(orders.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_mktsegment"),
        unix_timestamp(col("o_orderdate")).as("o_orderdate_sec"),
        col("total_qty").cast("long").as("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
      .limit(k)

  /** Q22 analogue — scalar subquery + NOT EXISTS: customers with an
    * above-average positive balance who placed no order in the final
    * seven months (dormant high-value accounts), per segment. The
    * scalar average decorrelates to a broadcast 1-row aggregate with an
    * integer cross-multiplied comparison; the NOT EXISTS is a LEFT ANTI
    * hash join against orders PRE-FILTERED to the recency window (the
    * date predicate pushes into the orders scan, so the anti join's
    * build side is the small recent slice, not the full table). */
  def dormantRichCustomers(customer: DataFrame, orders: DataFrame): DataFrame = {
    val cutoff = "2001-01-01"
    val posAvg = customer
      .filter(col("c_acctbal") > 0)
      .agg(sum(cents(col("c_acctbal")).cast("long")).as("s"), count(lit(1)).as("n"))
    customer
      .crossJoin(broadcast(posAvg))
      .filter(cents(col("c_acctbal")).cast("long") * col("n") > col("s"))
      .join(orders.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).cast("long").as("n_customers"),
        sum(cents(col("c_acctbal")).cast("long")).cast("long").as("balance_cents"))
      .orderBy("c_mktsegment")
  }

  // ---- derived-partsupp family (TPC-H Q2/Q9/Q12/Q16/Q20) -------------
  //
  // The driver schema ships no partsupp table and no shipmode/commitdate
  // columns (SURVEY.md §2.1), so the last five TPC-H shapes were
  // unexpressed. Rather than mutate the read-only fixtures, the missing
  // attributes are DERIVED deterministically from the keys with the
  // samplers' md5 idiom: 5 leading md5 hex nibbles of a salted key →
  // integer, bit-identical in Spark (conv/substring/md5) and DuckDB
  // (strpos-nibble expansion), so the oracle reconstructs the identical
  // relation from the same parquet. Derivation is pure column algebra —
  // no extra scan, no fixture writes, and it scales: the attributes
  // travel with the rows they decorate.

  /** 5 leading md5 hex nibbles of the salted ':'-joined key → long in
    * [0, 16^5). Mirrored in the oracle by the strpos-nibble expansion
    * (SparkEntry.psVal); computed natively off the digest bytes
    * (graft.plans.Md5Nibble5 — bit-identical to the
    * conv(substring(md5(x),1,5),16,10) column algebra, spec-pinned). */
  private[operators] def keyHash5(salt: String, cols: Column*): Column =
    graft.plans.Md5Nibble5.md5Nibble5(concat_ws(":", (lit(salt) +: cols): _*))

  /** Deterministic derived partsupp: the distinct (l_partkey, l_suppkey)
    * pairs observed in lineitem, decorated with key-derived availqty in
    * [1, 10000] and supplycost in [100, 100000] integer cents. One
    * shuffle on the composite key (map-side partial distinct collapses
    * the handful of lines per pair within each task), then pure column
    * algebra — at 100 TB this is strictly cheaper than scanning a real
    * partsupp table because the relation is 2 longs wide before
    * decoration and every consumer joins on ps_partkey, a key the fact
    * table already shuffles on. */
  def derivedPartsupp(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .distinct()
      .withColumn("ps_availqty",
        keyHash5("psa", col("ps_partkey"), col("ps_suppkey")) % 10000 + 1)
      .withColumn("ps_supplycost_cents",
        keyHash5("psc", col("ps_partkey"), col("ps_suppkey")) % 99901 + 100)

  /** Q2 analogue — min-cost supplier per part in a region: the classic
    * correlated-min decorrelated to aggregate-then-join. Candidates are
    * partsupp restricted by the selective part filter (type + size band)
    * and the bounded region→nation→supplier chain; the per-part min is a
    * group-by over that small candidate set joined back on exact integer
    * cost equality (ties included, as TPC-H requires). nation/region are
    * bounded (25/5 rows) → broadcast; everything SF-scaled reaches the
    * join pre-filtered. */
  def minCostSupplier(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                      region: DataFrame, lineitem: DataFrame,
                      regionName: String = "ASIA", pType: String = "LARGE",
                      sizeLo: Int = 10, sizeHi: Int = 20, k: Int = 100): DataFrame = {
    val regionNations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)
        .select(col("r_regionkey"))), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val regionSupp = supplier
      .join(broadcast(regionNations), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val cand = derivedPartsupp(lineitem)
      .join(part.filter(col("p_type") === pType &&
          col("p_size").between(sizeLo, sizeHi))
          .select(col("p_partkey"), col("p_name")),
        col("ps_partkey") === col("p_partkey"))
      .join(regionSupp, col("ps_suppkey") === col("s_suppkey"))
    // per-part window min instead of aggregate+join-back: the round-14
    // advice flagged that the un-persisted candidate join subtree was
    // referenced twice (min side + join-back side), recomputing the
    // partsupp+part+supplier+nation join unless AQE exchange reuse fired.
    // The window form reads the candidates ONCE — one shuffle on
    // p_partkey (partition width = suppliers per part within the region,
    // bounded), tie rows kept, identical output algebra.
    cand
      .withColumn("min_cost",
        min(col("ps_supplycost_cents")).over(Window.partitionBy(col("p_partkey"))))
      .filter(col("ps_supplycost_cents") === col("min_cost"))
      .select(cents(col("s_acctbal")).cast("long").as("s_acctbal_cents"),
        col("s_name"), col("n_name"), col("p_partkey"), col("p_name"),
        col("ps_supplycost_cents"))
      .orderBy(col("s_acctbal_cents").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(k)
  }

  /** Q9 analogue — product-type profit by nation and year: profit =
    * revenue minus key-derived supply cost × quantity, over parts whose
    * name carries the token. The part filter prunes the fact join up
    * front; partsupp arrives on the same (partkey, suppkey) the line
    * already carries, so cost decoration is a co-keyed join; nation is
    * broadcast. Per-row integer amounts sum order-independently. */
  def productTypeProfit(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                        orders: DataFrame, lineitem: DataFrame,
                        nameToken: String = "widget"): DataFrame =
    lineitem
      .join(part.filter(col("p_name").contains(nameToken)).select(col("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(derivedPartsupp(lineitem)
          .select(col("ps_partkey"), col("ps_suppkey"), col("ps_supplycost_cents")),
        col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("long")
          - col("ps_supplycost_cents") * floor(col("l_quantity")).cast("long"))
        .cast("long").as("profit_cents"))
      .orderBy(col("nation"), col("o_year").desc)

  /** Q12 analogue — shipmode vs order priority: shipmode and the
    * commit/receipt dates are key-derived (md5 of (orderkey, linenumber)
    * → one of 7 modes; commit offset in [-30, 30] and receipt offset in
    * [1, 30] days relative to shipdate). A line counts when it went by
    * MAIL/SHIP, was received in the window year, shipped before its
    * commit date, and the commit date preceded receipt (the late-commit
    * condition) — exactly Q12's predicate algebra on derived columns.
    * All derivation is codegen'd column algebra on the scan; the only
    * shuffle is the orderkey join for priority. */
  def shipmodePriority(orders: DataFrame, lineitem: DataFrame,
                       yStart: String = "1996-01-01",
                       yEnd: String = "1997-01-01"): DataFrame = {
    val m7 = keyHash5("sm", col("l_orderkey"), col("l_linenumber")) % 7
    val shipmode = when(m7 === 0, "MAIL").when(m7 === 1, "SHIP")
      .when(m7 === 2, "AIR").when(m7 === 3, "RAIL").when(m7 === 4, "TRUCK")
      .when(m7 === 5, "REG AIR").otherwise("FOB")
    val commitD = keyHash5("cd", col("l_orderkey"), col("l_linenumber")) % 61 - 30
    val receiptD = keyHash5("rd", col("l_orderkey"), col("l_linenumber")) % 30 + 1
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lineitem
      .withColumn("shipmode", shipmode)
      .filter(col("shipmode").isin("MAIL", "SHIP"))
      .withColumn("commit_d", commitD)
      .withColumn("receipt_d", receiptD)
      .filter(col("commit_d") > 0 && col("commit_d") < col("receipt_d"))
      .withColumn("receipt_sec",
        unix_timestamp(col("l_shipdate")) + col("receipt_d") * 86400L)
      .filter(col("receipt_sec") >= unix_timestamp(lit(yStart).cast("timestamp")) &&
        col("receipt_sec") < unix_timestamp(lit(yEnd).cast("timestamp")))
      .join(orders.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("shipmode"))
      .agg(sum(when(high, 1L).otherwise(0L)).cast("long").as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).cast("long").as("low_line_count"))
      .orderBy("shipmode")
  }

  /** Q16 analogue — supplier count per (brand, type, size) for parts
    * outside an excluded brand/type, skipping flagged suppliers (TPC-H
    * excludes complaint suppliers via s_comment; the schema's honest
    * stand-in is a negative account balance). The anti join's build side
    * is the tiny flagged-supplier slice; the distinct-count groups on
    * bounded (brand, type, size) cells. */
  def supplierCountByPart(part: DataFrame, supplier: DataFrame,
                          lineitem: DataFrame,
                          excludeBrand: String = "Brand#1",
                          excludeType: String = "PROMO",
                          sizes: Seq[Int] = Seq(5, 10, 15, 20, 25, 30, 35, 40)): DataFrame =
    derivedPartsupp(lineitem)
      .join(part.filter(col("p_brand") =!= excludeBrand &&
          col("p_type") =!= excludeType && col("p_size").isin(sizes.map(Int.box): _*))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size")),
        col("ps_partkey") === col("p_partkey"))
      .join(supplier.filter(col("s_acctbal") < 0).select(col("s_suppkey")),
        col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size").cast("long").as("p_size"))
      .agg(countDistinct(col("ps_suppkey")).cast("long").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))

  /** Q20 analogue — suppliers holding surplus stock of name-prefixed
    * parts in one nation: availqty > half the quantity they shipped in
    * the window year. Decorrelated: the per-(part, supp) shipped
    * quantity aggregates the date-pruned fact ONCE on the composite key,
    * joins partsupp on the same key, and the qualifying supplier set
    * semi-joins the bounded nation slice — no correlated subquery, no
    * second fact scan. */
  def promoSuppliers(part: DataFrame, supplier: DataFrame, nation: DataFrame,
                     lineitem: DataFrame, namePrefix: String = "small",
                     nationName: String = "NATION_1",
                     yStart: String = "1996-01-01",
                     yEnd: String = "1997-01-01"): DataFrame = {
    val shipped = lineitem
      .filter(col("l_shipdate") >= lit(yStart).cast("timestamp") &&
        col("l_shipdate") < lit(yEnd).cast("timestamp"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(floor(col("l_quantity")).cast("long")).as("qty"))
    val qualifying = derivedPartsupp(lineitem)
      .join(part.filter(col("p_name").startsWith(namePrefix)).select(col("p_partkey")),
        col("ps_partkey") === col("p_partkey"), "left_semi")
      .join(shipped, col("ps_partkey") === col("l_partkey") &&
        col("ps_suppkey") === col("l_suppkey"))
      .filter(col("ps_availqty") * 2 > col("qty"))
      .select(col("ps_suppkey"))
      .distinct()
    supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)
        .select(col("n_nationkey"))), col("s_nationkey") === col("n_nationkey"), "left_semi")
      .join(qualifying, col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }
}
