package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Pin.PinnedOps

/** Data-contract and anomaly audits — the validation pass a training-data
  * pipeline runs BEFORE admitting a snapshot (the deequ/Great-Expectations
  * role, expressed as plain declarative aggregates so Catalyst plans it
  * like any other query). Both operators return bounded REPORTS (rows ~
  * number of rules / hour-domain), never row-level violation dumps — at
  * 100 TB the report is what a human or a gate reads; row-level triage is
  * a follow-up filter with the same predicate.
  */
object Audit {

  /** One row per expectation: rule name, rows checked, violations, 0/1
    * verdict. Every rule is a single scan-shaped aggregate (count +
    * conditional count) or one equi-join + aggregate for referential
    * rules — AQE broadcasts the dim side while it fits, and each rule's
    * output is exactly one row, so the union is driver-cheap at any
    * scale. Violations REPORT (ok=0) rather than fail: both engines
    * compute identical numbers either way, and the admit/reject policy
    * stays with the caller. */
  def expectations(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                   events: DataFrame, documents: DataFrame): DataFrame = {
    def report(name: String, nRows: org.apache.spark.sql.Column,
               nBad: org.apache.spark.sql.Column, from: DataFrame): DataFrame =
      from.agg(nRows.cast("long").as("n_rows"), nBad.cast("long").as("n_bad"))
        .select(lit(name).as("check_name"), col("n_rows"), col("n_bad"),
          (col("n_bad") === 0L).cast("long").as("ok"))

    val pkUnique = report("customer_pk_unique",
      count(lit(1)), count(lit(1)) - countDistinct(col("c_custkey")), customer)
    // referential rules join against DISTINCT dim keys: the check is
    // existence-only, and a dirty (duplicated) dim PK must not inflate
    // the fact row count it reports over.
    val ordersFk = report("orders_custkey_fk",
      count(lit(1)), count(when(col("c_custkey").isNull, 1)),
      orders.join(customer.select("c_custkey").distinct(),
        col("o_custkey") === col("c_custkey"), "left"))
    val lineFk = report("lineitem_orderkey_fk",
      count(lit(1)), count(when(col("o_orderkey").isNull, 1)),
      lineitem.select("l_orderkey").join(orders.select("o_orderkey").distinct(),
        col("l_orderkey") === col("o_orderkey"), "left"))
    val pricePos = report("orders_totalprice_positive",
      count(lit(1)), count(when(col("o_totalprice") <= 0, 1)), orders)
    val discRange = report("lineitem_discount_range",
      count(lit(1)), count(when(col("l_discount") < 0 || col("l_discount") > 1, 1)), lineitem)
    val userNn = report("events_user_nonnull",
      count(lit(1)), count(when(col("user_id").isNull, 1)), events)
    val nchars = report("documents_nchars_consistent",
      count(lit(1)), count(when(col("n_chars") =!= length(col("text")), 1)), documents)

    pkUnique.unionAll(ordersFk).unionAll(lineFk).unionAll(pricePos)
      .unionAll(discRange).unionAll(userNn).unionAll(nchars)
      .orderBy("check_name")
  }

  /** Robust per-type event-rate spike detection: hourly counts scored
    * against the type's own median/MAD (the outlier-resistant center and
    * spread — a mean/stddev gate is itself dragged by the spike it is
    * supposed to catch). Everything is INTEGER-exact cross-engine by
    * scaling out the two half-interpolations instead of comparing
    * floats: `med2 = 2·median(n)`, `dev2 = |2n − med2|`,
    * `mad4 = 2·median(dev2)`, and the 3-MAD rule |n−med| > 3·MAD becomes
    * `2·dev2 > 3·mad4` (multiply both sides by 4). A type with
    * constant-rate history has mad4 = 0, so ANY deviation flags — the
    * standard MAD degeneracy, intentionally kept (a perfectly flat
    * source moving at all IS the anomaly).
    *
    * Scale shape: one two-phase hash agg to (type, hour) counts —
    * shuffle bounded by type × hour domain, not the event count — then
    * two [[Median.med2ByKey]] nearest-rank passes whose input is that
    * bounded hourly table (histogram cums, no per-group value buffers). */
  /** CUSUM drift detection over daily revenue — the SLOW-DRIFT
    * complement of [[eventRateAnomaly]]'s spike rule: a sustained small
    * shift never trips a per-point MAD test, but its deviations
    * accumulate. The textbook recursion s_i = max(0, s_{i-1} + dev_i)
    * looks un-relational, but it has the closed form
    * `s_i = P_i − min(0, min_{j≤i} P_j)` over prefix sums P — two
    * ordered windows (running sum, running min) over the DAY-keyed
    * aggregate, bounded by the time domain like every window in the
    * daily family. Integer-exact throughout: deviations are doubled
    * (2x − med2) so the median never introduces a half, and the drift
    * verdict `2·cusum2 > 10·mad4` is a cross-multiplication — flags
    * roughly when accumulated drift exceeds ~2.5 MADs, the contract
    * being the integer formula itself. */
  def dailyRevenueCusum(orders: DataFrame): DataFrame = {
    // ONE definition of the day-bucketed revenue aggregate across the
    // whole daily family (CUSUM, forecast eval, the materialized view)
    // day-domain rows, materialized once: the median, deviation, MAD and
    // CUSUM stages all re-read this relation (and `dev` feeds both the
    // MAD derivation and the windowed tail) — unpinned, the daily
    // aggregation pipeline executed several times per query (guide §2.4;
    // same move revenueForecastEval already made)
    val daily = Relational.dailyRevenueAgg(orders)
      .select(col("day_sec"), col("revenue_cents").as("x"))
      .pinned()
    val med = Median.med2Global(daily, col("x"))
    val dev = daily.crossJoin(broadcast(med))
      .withColumn("d2", lit(2L) * col("x") - col("med2"))
      .pinned()
    val mad = Median.med2Global(dev, abs(col("d2"))).select(col("med2").as("mad4"))
    val wRun = Window.orderBy("day_sec")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dev.crossJoin(broadcast(mad))
      .withColumn("p", sum(col("d2")).over(wRun))
      .withColumn("cusum2", col("p") - least(lit(0L), min(col("p")).over(wRun)))
      .select(col("day_sec"), col("x").as("revenue_cents"), col("med2"),
        col("mad4"), col("cusum2"),
        (lit(2L) * col("cusum2") > lit(10L) * col("mad4")).cast("long").as("is_drift"))
      .orderBy("day_sec")
  }

  /** Forecast BACKTEST over daily revenue: the two no-model baselines
    * every forecasting effort must beat — naive (last OBSERVED day, the
    * standard definition) and seasonal-naive (same CALENDAR day one week
    * earlier, via a day-key self-join so a gap in the series cannot
    * silently misalign the weekday — a `lag(7)` over rows would) —
    * scored with integer WAPE (Σ|err|·1000 div Σactual, weighted so
    * zero-revenue days can't blow up a pointwise MAPE). One day-keyed
    * aggregate, one lag window and one day-key self-join over it, a
    * 2-row report out; each method scores only the days its forecast
    * exists for (`n_days` discloses the coverage). */
  def revenueForecastEval(orders: DataFrame): DataFrame = {
    val daily = Relational.dailyRevenueAgg(orders)
      .select(col("day_sec"), col("revenue_cents").as("x"))
    val w = Window.orderBy("day_sec")
    val snaive = daily.select(
      (col("day_sec") + lit(604800L)).as("day_sec"), col("x").as("f_snaive"))
    val scored = daily
      .withColumn("f_naive", lag(col("x"), 1).over(w))
      .join(snaive, Seq("day_sec"), "left")
      // day-domain rows, materialized once — both method evals below
      // would otherwise re-run the daily aggregation pipeline
      .pinned()
    def eval(f: String, name: String) =
      scored.filter(col(f).isNotNull)
        .agg(
          count(lit(1)).cast("long").as("n_days"),
          sum(abs(col("x") - col(f))).cast("long").as("abs_err_cents"),
          sum(col("x")).cast("long").as("actual_cents"))
        .select(lit(name).as("method"), col("n_days"), col("abs_err_cents"),
          expr("(abs_err_cents * 1000) div actual_cents").as("wape_milli"))
    eval("f_naive", "naive").unionByName(eval("f_snaive", "seasonal_naive"))
      .orderBy("method")
  }

  /** Weekday-seasonal residual anomaly over daily revenue — the
    * decomposition step [[dailyRevenueCusum]] and the MAD spike rule
    * both lack: a Saturday that looks anomalous against the all-week
    * median may be a perfectly normal Saturday. Seasonal center = each
    * weekday's own 2×median of daily revenue ([[Median.med2ByKey]] on
    * the day-domain-bounded aggregate, 7 groups); residual2 = 2x −
    * med2_wd; spread = the 2×median of |residual2| (so mad4 = 4·MAD of
    * the residual), and the 3-MAD flag is the cross-multiplication
    * `2·|residual2| > 3·mad4`. Integer-exact end to end — the weekday
    * key is epoch-day mod 7 (identical arithmetic both engines; which
    * weekday is 0 is irrelevant to grouping). */
  def dailyRevenueSeasonalResidual(orders: DataFrame): DataFrame = {
    // same §2.4 materialization as [[dailyRevenueCusum]]: `daily` feeds
    // the weekday median AND the residual join; `res` feeds the MAD
    // derivation AND the output — both day-domain-bounded
    val daily = Relational.dailyRevenueAgg(orders)
      .select(col("day_sec"), col("revenue_cents").as("x"))
      .withColumn("weekday", expr("(day_sec div 86400) % 7"))
      .pinned()
    val med = Median.med2ByKey(daily, Seq("weekday"), col("x"))
      .select(col("weekday"), col("med2").as("med2_wd"))
    val res = daily.join(broadcast(med), "weekday")
      .withColumn("residual2", lit(2L) * col("x") - col("med2_wd"))
      .pinned()
    val mad = Median.med2Global(res, abs(col("residual2")))
      .select(col("med2").as("mad4"))
    res.crossJoin(broadcast(mad))
      .select(col("day_sec"), col("x").as("revenue_cents"),
        col("weekday").cast("long").as("weekday"), col("med2_wd"),
        col("residual2").cast("long").as("residual2"), col("mad4"),
        (lit(2L) * abs(col("residual2")) > lit(3L) * col("mad4"))
          .cast("long").as("is_anomaly"))
      .orderBy("day_sec")
  }

  def eventRateAnomaly(events: DataFrame): DataFrame = {
    // (event_type × hour)-bounded relations, each consumed twice (median
    // derivation + downstream join) — materialize once per query, same
    // §2.4 move as [[dailyRevenueCusum]]
    val hourly = events
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour"))
      .agg(count(lit(1)).as("n"))
      .pinned()
    val med = Median.med2ByKey(hourly, Seq("event_type"), col("n"))
      .select(col("event_type"), col("med2"))
    val dev = hourly.join(med, "event_type")
      .withColumn("dev2", abs(lit(2L) * col("n") - col("med2")))
      .pinned()
    val mad = Median.med2ByKey(dev, Seq("event_type"), col("dev2"))
      .select(col("event_type"), col("med2").as("mad4"))
    dev.join(mad, "event_type")
      .select(col("event_type"), col("hour"), col("n"), col("med2"),
        col("mad4"), col("dev2"),
        (lit(2L) * col("dev2") > lit(3L) * col("mad4")).cast("long").as("is_spike"))
      .orderBy("event_type", "hour")
  }

  /** In-flight observed metrics — `Dataset.observe` (`CollectMetrics`):
    * audit aggregates computed DURING the main query's own scan, the
    * production alternative to a separate audit pass. Every other
    * monitor here re-reads its input; at 100 TB a second 100 TB scan
    * for row counts is real money, and `observe` rides the main job's
    * one pass for free (the metrics are accumulator-style, collected on
    * the driver at action time). The report row carries the MAIN
    * query's result size next to the observed audit numbers, so the
    * oracle gates both the job and its free metrics; the spec
    * additionally pins the plan to ONE scan (CollectMetrics present, no
    * second FileScan). Like the index-lifecycle queries, the registered
    * form drives its own action — observation is an execution-time
    * artifact, not a plan transform. */
  def observedOrderAudit(orders: DataFrame): DataFrame = {
    val spark = orders.sparkSession
    import spark.implicits._
    val obs = org.apache.spark.sql.Observation()
    val main = Relational.dailyRevenueAgg(
      orders.observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("n_null_custkey"),
        sum(expr("cast(round(o_totalprice*100) as bigint)")).as("revenue_cents")))
    val mainDays = main.count()
    val m = obs.get
    Seq((mainDays, m("n_rows").asInstanceOf[Long],
      m("n_null_custkey").asInstanceOf[Long], m("revenue_cents").asInstanceOf[Long]))
      .toDF("main_days", "n_rows", "n_null_custkey", "revenue_cents")
  }

  /** Incident blast-radius: the user sessions in flight during any hour
    * [[eventRateAnomaly]] flags (any event type) — the "who was
    * affected" view that turns a rate anomaly into a user-facing impact
    * report. The interval-overlap join is the bucket-expansion shape,
    * never a nested loop over the timeline: each session explodes to
    * exactly the hour buckets it spans (bounded by its own duration —
    * 30-min-gap mechanics keep spans short unless activity is truly
    * continuous), spike hours are a DISTINCT time-domain-bounded
    * relation, and the equi-join on the hour key bounds any reducer by
    * one hour's concurrent sessions (the [[Sessionize.sessionConcurrency]]
    * quantity, monitored there). Reported event counts are whole-session
    * totals (the session is the impact unit, not its in-hour slice). */
  def anomalySessionImpact(events: DataFrame): DataFrame = {
    val spikes = eventRateAnomaly(events)
      .filter(col("is_spike") === 1L)
      .select(expr("hour div 3600").as("hb"), col("hour"))
      .distinct()
    val sess = Sessionize.userSessions(events)
      .select(col("user_id"), col("n_events"), col("session_start_sec"),
        (col("session_start_sec") + col("duration_sec")).as("session_end_sec"))
    val exploded = sess.select(col("user_id"), col("n_events"),
      explode(sequence(expr("session_start_sec div 3600"),
        expr("session_end_sec div 3600"))).as("hb"))
    exploded.join(spikes, "hb")
      .groupBy("hour")
      .agg(
        count(lit(1)).cast("long").as("n_sessions"),
        countDistinct(col("user_id")).cast("long").as("n_users"),
        sum(col("n_events")).cast("long").as("n_session_events"))
      .orderBy("hour")
  }

  /** k-anonymity risk audit over a quasi-identifier tuple — the privacy
    * gate a training-data release runs before shipping records that are
    * "anonymous" only until someone joins them to a phone book. A row is
    * k-anonymous when at least k−1 OTHER rows share its quasi-identifier
    * combination (here: nation × market segment × $1000 account-balance
    * band — the classic "zip × birth date × sex" shape on this schema);
    * singleton groups are exactly re-identifiable.
    *
    * Output is the equivalence-CLASS SIZE HISTOGRAM, not a row dump: one
    * row per observed group size with the number of groups and rows at
    * that size and a 0/1 `at_risk` verdict (size < k). The release
    * decision reads three numbers (smallest class, rows below k, total);
    * row-level triage is a follow-up filter with the same grouping.
    *
    * Scale shape: one two-phase hash agg to equivalence classes (shuffle
    * bounded by the quasi-identifier DOMAIN, not the row count — that is
    * the point of generalized quasi-identifiers) and a second bounded agg
    * over class sizes. No windows, no joins; at 100 TB this is a scan
    * plus two domain-bounded aggregates. */
  def kAnonymityRisk(customer: DataFrame, k: Int = 5): DataFrame = {
    val classes = customer
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
      .groupBy("c_nationkey", "c_mktsegment", "bal_band")
      .agg(count(lit(1)).as("group_size"))
    classes.groupBy(col("group_size"))
      .agg(count(lit(1)).cast("long").as("n_groups"),
        sum(col("group_size")).cast("long").as("n_rows"))
      .select(col("group_size").cast("long").as("group_size"), col("n_groups"),
        col("n_rows"), (col("group_size") < k).cast("long").as("at_risk"))
      .orderBy("group_size")
  }

  /** Benford's-law expected leading-digit shares, in integer ppm
    * (floor(log10(1+1/d)·10⁶), d = 1..9). Hard constants, not computed:
    * the oracle must carry the identical table, and a float log at two
    * engines is exactly the nondeterminism this repo bans. */
  private val BenfordPpm = Seq(
    301029L, 176091L, 124938L, 96910L, 79181L,
    66946L, 57991L, 51152L, 45757L)

  /** Benford first-digit audit of order totals — the forensic-accounting
    * screen (Nigrini's test) applied as a data-quality monitor: naturally
    * grown multi-magnitude amounts track Benford's law; fabricated,
    * capped, or generator-defaulted values don't, and a sudden jump in
    * this report's distance column is an upstream-change tripwire even
    * though no single row is wrong. One scan → 9-row digit histogram
    * (two-phase, domain-bounded); per-digit observed ppm vs the Benford
    * expectation and the absolute gap. On THIS synthetic corpus the
    * distance is honestly large (uniform prices are exactly the
    * non-Benford case) — the audit reporting that is the demo. */
  def benfordAudit(orders: DataFrame): DataFrame = {
    val benford = BenfordPpm.zipWithIndex
      .map { case (ppm, i) => (i + 1L, ppm) }
    val expect = orders.sparkSession.createDataFrame(benford)
      .toDF("digit", "benford_ppm")
    val digits = orders
      .select(Relational.cents(col("o_totalprice")).cast("long").as("v"))
      .filter(col("v") > 0)
      .select(substring(col("v").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("tot"))
    // the 9-row constants table is the PRESERVED side (every digit
    // reports even at zero count) and the digit histogram — ≤ 9 rows
    // after its aggregate — is the broadcast build side: a left-outer
    // join can honor that hint, where broadcasting the right side of a
    // right-outer join is silently unsupported
    expect
      .join(broadcast(digits), Seq("digit"), "left_outer")
      .crossJoin(broadcast(total))
      .select(col("digit"),
        coalesce(col("n"), lit(0L)).cast("long").as("n"),
        expr("coalesce(n, 0) * 1000000 div tot").cast("long").as("obs_ppm"),
        col("benford_ppm"),
        expr("abs(coalesce(n, 0) * 1000000 div tot - benford_ppm)")
          .cast("long").as("gap_ppm"))
      .orderBy("digit")
  }

  /** A/A experiment-split sanity check: users hash-split into two arms
    * (the same deterministic md5-ppm bucketing the samplers use), each
    * arm's purchase-conversion rate compared with the pooled
    * two-proportion z-test on the ppm-integer lattice:
    * z² ≥ 3.84 (95%) ⟺ `25·δ²·na·nb ≥ 96·p·(10⁶−p)·(na+nb)` with δ and
    * pooled p as floor-divided ppm (the ±1 ppm floor is deterministic,
    * so both engines land on the same verdict bit); the product chain
    * rides DECIMAL(38,0) / HUGEINT so it cannot wrap at any arm size.
    * On identically distributed arms (this IS one population split by
    * hash) the test must NOT fire — a significant A/A is the canonical
    * symptom of a biased assignment hash or a unit-of-randomization
    * bug, which is what this audit catches before anyone trusts a real
    * A/B readout from the same machinery. One (user, arm, converted)
    * aggregate then a 2-row rollup. */
  def abSplitCheck(events: DataFrame): DataFrame = {
    val users = events
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase" && col("value") > 150.0, 1L)
        .otherwise(0L)).as("converted"))
      .select(
        when(conv(substring(md5(concat_ws(":", lit("ab"), col("user_id"))), 1, 4), 16, 10)
          .cast("long") % 2 === 0, lit("A")).otherwise(lit("B")).as("arm"),
        col("converted"))
    val arms = users.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
    arms.groupBy()
      .agg(
        // explicit zeros, not SQL's sum-over-no-rows NULL: a corpus
        // whose users all hash to one arm must report the empty arm as
        // n=0/rate=0, matching the oracle — never a NULL row shape
        sum(when(col("arm") === "A", col("n")).otherwise(lit(0L))).as("na"),
        sum(when(col("arm") === "A", col("c")).otherwise(lit(0L))).as("ca"),
        sum(when(col("arm") === "B", col("n")).otherwise(lit(0L))).as("nb"),
        sum(when(col("arm") === "B", col("c")).otherwise(lit(0L))).as("cb"))
      .selectExpr(
        "CAST(na AS LONG) AS n_a", "CAST(ca AS LONG) AS conv_a",
        "CAST(CASE WHEN na > 0 THEN ca * 1000000 div na ELSE 0 END AS LONG) AS rate_a_ppm",
        "CAST(nb AS LONG) AS n_b", "CAST(cb AS LONG) AS conv_b",
        "CAST(CASE WHEN nb > 0 THEN cb * 1000000 div nb ELSE 0 END AS LONG) AS rate_b_ppm",
        "CAST(abs(CASE WHEN na > 0 THEN ca * 1000000 div na ELSE 0 END - " +
          "CASE WHEN nb > 0 THEN cb * 1000000 div nb ELSE 0 END) AS LONG) AS delta_ppm",
        "CAST((ca + cb) * 1000000 div (na + nb) AS LONG) AS pooled_ppm")
      .selectExpr(
        "n_a", "conv_a", "rate_a_ppm", "n_b", "conv_b", "rate_b_ppm",
        "delta_ppm", "pooled_ppm",
        // the variance guard: pooled 0 or 10^6 means zero variance AND
        // equal rates — never "significant", not a 0 >= 0 coin flip
        "CAST(CASE WHEN pooled_ppm > 0 AND pooled_ppm < 1000000 AND " +
          "CAST(25 AS DECIMAL(38,0)) * delta_ppm * delta_ppm * n_a * n_b >= " +
          "CAST(96 AS DECIMAL(38,0)) * pooled_ppm * (1000000 - pooled_ppm) * (n_a + n_b) " +
          "THEN 1 ELSE 0 END AS LONG) AS significant")
  }
}
