package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference engine's entire query surface, Spark-first.
  *
  * Reference: `/root/reference/src/main/java/com/isidora/kafka/UniqueUsersCounter.java:63-93`
  * — read JSON events, 1-minute tumbling windows, COUNT(DISTINCT uid) per
  * window. Re-expressed as declarative windowed aggregations so Catalyst
  * plans the two-phase (partial + final) distinct aggregate and Tungsten
  * executes it vectorized — versus the reference's row-at-a-time
  * HashSet-per-window (UniqueUsersCounter.java:80-84), whose serialized
  * state hits Kafka's 1 MiB record cap (reference README.md:27-31). The
  * HLL variant (`perMinuteApprox`) is the fix for that scale wall:
  * constant-size state per (window) at any cardinality.
  *
  * Window keys are emitted as unix epoch seconds — the output format the
  * reference's README.md:43 says it *should* have used (it emitted
  * ISO-8601 `Instant.toString()`, a documented defect).
  */
object UniqueUsers {

  /** Flagship: exact distinct users per 1-minute tumbling window.
    * Scale path: countDistinct plans as Expand + two-phase HashAggregate —
    * partial dedup happens map-side before the shuffle on (window). */
  def perMinute(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 minute"))
      .agg(countDistinct(col("user_id")).as("unique_users"))
      .select(
        unix_timestamp(col("window.start")).as("minute"),
        col("unique_users"))
      .orderBy("minute")

  /** The KEYED generalization of the reference topology: distinct users
    * per (event_type, minute). The reference's constant-key `groupBy`
    * (UniqueUsersCounter.java:74) is the degenerate single-group case
    * of this — the production form almost every deployment actually
    * runs, where state is per (key, window) and the shuffle key is
    * (key, window) hash: hot windows spread across reducers by key
    * instead of landing whole on one. Output bounded by
    * |event-type domain| × minutes. */
  def perMinuteByType(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("unique_users"))
      .select(
        unix_timestamp(col("window.start")).as("minute"),
        col("event_type"), col("unique_users"))
      .orderBy("minute", "event_type")

  /** Distribution of the flagship's own output — the monitoring view an
    * operator watches over the counter: how many minutes carried k
    * distinct users. A shape change here (mass shifting toward the cap,
    * a spike bucket appearing) flags upstream drift without storing the
    * full minute series; the second aggregate's input is bounded by the
    * per-minute-cardinality DOMAIN. */
  def perMinuteHistogram(events: DataFrame): DataFrame =
    perMinute(events)
      .groupBy(col("unique_users"))
      .agg(count(lit(1)).as("n_minutes"))
      .select(col("unique_users"), col("n_minutes").cast("long").as("n_minutes"))
      .orderBy("unique_users")

  /** The reference README's own sketched fix (README.md:60-62): floor ts to
    * the minute, dedup (minute, uid) pairs, then count — two explicit
    * phases. Same result as perMinute; state per phase is smaller (the
    * dedup shuffle carries (minute, uid) keys only). */
  def perMinuteTwoPhase(events: DataFrame): DataFrame =
    events
      .select(date_trunc("minute", col("ts")).as("minute_ts"), col("user_id"))
      .dropDuplicates("minute_ts", "user_id")
      .groupBy(col("minute_ts"))
      .agg(count(lit(1)).as("unique_users"))
      .select(unix_timestamp(col("minute_ts")).as("minute"), col("unique_users"))
      .orderBy("minute")

  /** Exact-parity variant of the reference's HashSet state
    * (UniqueUsersCounter.java:80-88): materialize the distinct set, then
    * take its size. Unbounded state like the reference — kept for parity,
    * not the scale path. */
  def perMinuteCollectSet(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 minute"))
      .agg(size(collect_set(col("user_id"))).as("unique_users"))
      .select(
        unix_timestamp(col("window.start")).as("minute"),
        col("unique_users").cast("long").as("unique_users"))
      .orderBy("minute")

  /** HLL sketch variant — the 100 TB answer to the reference's
    * RecordTooLargeException scale wall (README.md:27-31): O(kB) state per
    * window regardless of distinct-user cardinality, mergeable map-side. */
  def perMinuteApprox(events: DataFrame, rsd: Double = 0.01): DataFrame =
    events
      .groupBy(window(col("ts"), "1 minute"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("unique_users"))
      .select(
        unix_timestamp(col("window.start")).as("minute"),
        col("unique_users"))
      .orderBy("minute")

  /** The machine-checked error gate for [[perMinuteApprox]] — the query
    * that turns the sketch's rows-only correctness status into a real
    * oracle check: per window it emits the EXACT distinct count (which
    * the DuckDB oracle recomputes independently — the anchor is
    * cross-engine-verified in this very query) and a 0/1 verdict that
    * the sketch estimate lies within max(2, 5% of exact) — 5× the
    * sketch's rsd=0.01 with a small-cardinality floor. The floor is 2,
    * not 1: HLL++'s relative-error guarantee is asymptotic, and at tiny
    * cardinalities the sparse-exact mode's only failure is a hash
    * collision, whose error is a COUNT (±1 per collision), not a
    * fraction — the r13 sf0.5 dual-scale sweep measured exactly one
    * minute in 38,859 (uu_exact = 15) off by 2, so a floor of 1 gates
    * the sketch tighter than its own math promises and flaps on
    * corpus-sized inputs. The oracle emits literal 1 for every window,
    * so any window where the sketch strays outside this bound
    * hash-mismatches and the driver goes red. The sketch estimate
    * itself is deliberately NOT a column: its exact value is
    * engine-specific (that's why [[perMinuteApprox]] has no oracle),
    * but whether it honors its bound is not. */
  def perMinuteApproxCheck(events: DataFrame, rsd: Double = 0.01): DataFrame = {
    val exact = perMinute(events).withColumnRenamed("unique_users", "uu_exact")
    val approx = perMinuteApprox(events, rsd).withColumnRenamed("unique_users", "uu_approx")
    exact.join(approx, "minute")
      .select(col("minute"), col("uu_exact").cast("long").as("uu_exact"),
        expr("abs(uu_approx - uu_exact) <= greatest(2, uu_exact div 20)")
          .cast("long").as("within_bound"))
      .orderBy("minute")
  }

  /** Mergeable-sketch ROLLUP — the pattern that makes distinct counting
    * tractable on a 100 TB lake: materialize one DataSketches HLL sketch
    * per fine bucket (hour) ONCE, then answer any coarser-grain distinct
    * question (day here; week/month/all-time identically) by UNIONING the
    * stored sketches — no second pass over the raw events, which is what
    * `approx_count_distinct` alone cannot give you (its per-day run
    * re-reads every event). Built on Spark's DataSketches builtins
    * (`hll_sketch_agg`/`hll_union_agg`/`hll_sketch_estimate`), whose
    * binary sketch column is exactly what a real deployment persists next
    * to each partition. Estimates are engine-specific → rows-only entry;
    * the bound is machine-gated by [[dailySketchCheck]]. */
  def dailySketchRollup(events: DataFrame, lgK: Int = 12): DataFrame =
    events
      .groupBy(unix_timestamp(date_trunc("hour", col("ts"))).as("hour"))
      .agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sk"))
      .withColumn("day", col("hour") - pmod(col("hour"), lit(86400L)))
      .groupBy("day")
      .agg(
        expr("hll_sketch_estimate(hll_union_agg(sk, false))").cast("long").as("uu_est"),
        count(lit(1)).as("n_hours"))
      .orderBy("day")

  /** Trailing-7-day rolling distinct users (WAU) from STORED per-day HLL
    * sketches — the sketch-algebra answer to
    * [[Relational.userStickinessDaily]]'s exact form, and the 100 TB
    * deployment shape: persist ONE ~kB sketch per day (emitted online by
    * `StreamingUniqueUsers.uniqueUsersPerWindowSketch` at day windows),
    * and any trailing window is a union of 7 blobs — no (day, user) pair
    * relation, no raw-event re-read, and HLL union is lossless (the
    * union's error equals one sketch's error over the union). Same
    * ×7 explode-to-served-windows shape as the exact operator, but over
    * the DAY-domain-bounded sketch table instead of the pair relation.
    * Input: `(day_sec, sk)` one sketch blob per day. */
  def wauFromDailySketches(dailySketches: DataFrame): DataFrame =
    dailySketches
      .select(explode(sequence(col("day_sec"), col("day_sec") + 6L * 86400L,
        lit(86400L))).as("day"), col("sk"))
      .crossJoin(broadcast(dailySketches.agg(max(col("day_sec")).as("max_d"))))
      .filter(col("day") <= col("max_d"))
      .groupBy("day")
      .agg(
        expr("hll_sketch_estimate(hll_union_agg(sk, false))").cast("long").as("wau7_est"),
        count(lit(1)).as("n_days"))
      .orderBy("day")

  /** The oracle-checked error gate for [[wauFromDailySketches]] — the
    * [[dailySketchCheck]] contract applied to the ROLLING window: per
    * day, the exact trailing-7-day distinct (the DuckDB oracle
    * recomputes it independently from the (day, user) pair relation —
    * the same semantics `user_stickiness_daily` hash-gates) plus a 0/1
    * verdict that the 7-blob union estimate lands within max(2, 5% of
    * exact). The engine side builds one sketch per day from the events
    * and serves every window from blob unions; a bound violation is a
    * hash mismatch. */
  def wauSketchCheck(events: DataFrame, lgK: Int = 12): DataFrame = {
    val daily = events
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day_sec"))
      .agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sk"))
    val est = wauFromDailySketches(daily).select(col("day"), col("wau7_est"))
    val exact = Relational.userStickinessDaily(events)
      .select((col("day") * 86400L).as("day"), col("wau7").as("wau7_exact"))
    exact.join(est, "day")
      .select(col("day"), col("wau7_exact"),
        expr("abs(wau7_est - wau7_exact) <= greatest(2, wau7_exact div 20)")
          .cast("long").as("within_bound"))
      .orderBy("day")
  }

  /** The oracle-checked error gate for [[dailySketchRollup]] — same
    * contract as [[perMinuteApproxCheck]]: per day, the EXACT distinct
    * count (recomputed independently by the DuckDB oracle) plus a 0/1
    * verdict that the hourly-sketch-union estimate lands within
    * max(2, 5% of exact) — ~3× the lgK=12 sketch's ~1.6% rsd, and the
    * union of sketches is lossless (HLL union error equals the error of
    * one sketch over the union). The oracle emits literal 1s, so a day
    * outside the bound hash-mismatches and the driver goes red. */
  def dailySketchCheck(events: DataFrame, lgK: Int = 12): DataFrame = {
    val est = dailySketchRollup(events, lgK)
    val exact = events
      .groupBy(unix_timestamp(date_trunc("day", col("ts"))).as("day"))
      .agg(countDistinct(col("user_id")).as("uu_exact"))
    exact.join(est, "day")
      .select(col("day"), col("uu_exact").cast("long").as("uu_exact"),
        expr("abs(uu_est - uu_exact) <= greatest(2, uu_exact div 20)")
          .cast("long").as("within_bound"))
      .orderBy("day")
  }

  /** Sketch SET ALGEBRA — audience overlap between event types by
    * inclusion–exclusion over HLL sketches: |A∩B| ≈ est(A) + est(B) −
    * est(A∪B), where the union estimate comes from the scalar
    * `hll_union` of two PRE-AGGREGATED per-type sketches. This is the
    * second half of what mergeable sketches buy at 100 TB (the first —
    * rollup — is [[dailySketchRollup]]): every pairwise overlap among k
    * audiences is answered from k stored sketches, versus k² exact
    * set-intersection joins over raw events. The self-join here is
    * k×k rows of sketch blobs — audience-count-bounded, never
    * data-bounded.
    *
    * Same gate contract as [[perMinuteApproxCheck]]: the EXACT
    * intersection (recomputed independently by the oracle via a
    * (type, user)-distinct self-join) anchors a 0/1 verdict that the
    * sketched estimate lands within max(20, 5% of |A|+|B|) — wide
    * enough for three inclusion–exclusion error terms at lgK=12
    * (~1.6% rsd each), tight enough that a broken union blows it. */
  def audienceOverlapCheck(events: DataFrame, lgK: Int = 12): DataFrame = {
    val perType = events.groupBy(col("event_type"))
      .agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sk"),
        countDistinct(col("user_id")).as("uu"))
    val est = perType.as("a")
      .join(perType.as("b"), col("a.event_type") < col("b.event_type"))
      .select(
        col("a.event_type").as("type_a"), col("b.event_type").as("type_b"),
        col("a.uu").as("uu_a"), col("b.uu").as("uu_b"),
        (expr("hll_sketch_estimate(a.sk) + hll_sketch_estimate(b.sk)") -
          expr("hll_sketch_estimate(hll_union(a.sk, b.sk))")).as("inter_est"))
    val d = events.select(col("event_type"), col("user_id")).distinct()
    val exact = d.as("x")
      .join(d.as("y"),
        col("x.user_id") === col("y.user_id") &&
          col("x.event_type") < col("y.event_type"))
      .groupBy(col("x.event_type").as("type_a"), col("y.event_type").as("type_b"))
      .agg(count(lit(1)).as("inter_exact"))
    est.join(exact, Seq("type_a", "type_b"))
      .select(col("type_a"), col("type_b"),
        col("inter_exact").cast("long").as("inter_exact"),
        expr("abs(inter_est - inter_exact) <= greatest(20, (uu_a + uu_b) div 20)")
          .cast("long").as("within_bound"))
      .orderBy("type_a", "type_b")
  }

  /** Count-Min sketch point-count gate — completes the sketch family
    * (HLL distinct / KLL percentile / MinHash-SimHash similarity /
    * Bloom membership / Misra-Gries heavy hitters) with the mergeable
    * POINT-COUNT summary: O(width×depth) state answering "how many
    * events did key X have" for ANY key, the building block of
    * per-entity rate limits and frequency features when the key space
    * is too wide to materialize. Same machine-checked-bound contract as
    * [[perMinuteApproxCheck]]: per top-k key (exact counts, which the
    * DuckDB oracle recomputes independently) emit 0/1 verdicts that the
    * sketch (a) never underestimates — a structural CMS guarantee — and
    * (b) overshoots by at most ceil(eps·N); the oracle emits literal 1s
    * so a bound violation hash-mismatches and the driver goes red. The
    * estimates themselves are deliberately not columns (engine-specific,
    * like the HLL estimate); the seeded sketch makes the verdicts
    * deterministic. The probe is a driver-built-sketch UDF — the same
    * adjudicated class as the Bloom probe (no public builtin expression
    * surface exists for probing a driver-built CountMinSketch); the
    * sketch build is a bounded model fit, not a corpus collect. */
  def userCountCmsCheck(events: DataFrame, k: Int = 20,
                        eps: Double = 0.0005, confidence: Double = 0.9999,
                        seed: Int = 42): DataFrame = {
    val cms = events.stat.countMinSketch(col("user_id"), eps, confidence, seed)
    val bound = math.ceil(eps * cms.totalCount()).toLong
    val est = udf((u: Long) => cms.estimateCount(u))
    events.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("user_id")).limit(k)
      .select(col("user_id"), col("n"),
        (est(col("user_id")) >= col("n")).cast("long").as("never_under"),
        (est(col("user_id")) <= col("n") + lit(bound)).cast("long").as("within_bound"))
      .orderBy(col("n").desc, col("user_id"))
  }

  /** Reference-mechanism parity: the windowed distinct via a typed
    * Aggregator (set-union state, the reference's own algorithm — see
    * [[graft.functions.DistinctSetAggregator]]). Same result as perMinute. */
  def perMinuteUdaf(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 minute"))
      .agg(graft.functions.DistinctSetAggregator
        .distinctCount(col("user_id").cast("string")).as("unique_users"))
      .select(
        unix_timestamp(col("window.start")).as("minute"),
        col("unique_users"))
      .orderBy("minute")

  /** Hopping/sliding generalization of the reference's
    * `TimeWindows.of(1m).advanceBy(60s)` (UniqueUsersCounter.java:77) with
    * hop < size: 5-minute windows sliding every minute. */
  def slidingDistinct(events: DataFrame, win: String = "5 minutes", slide: String = "1 minute"): DataFrame =
    events
      .groupBy(window(col("ts"), win, slide))
      .agg(countDistinct(col("user_id")).as("unique_users"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("unique_users"))
      .orderBy("window_start")

  /** Filter + projection — the operator category the reference lacks
    * entirely (SURVEY.md §2 checklist: "no filter anywhere"). Predicate and
    * projection both reach the parquet scan (PushedFilters / ReadSchema). */
  def filterProject(events: DataFrame, eventType: String = "purchase"): DataFrame =
    events
      .filter(col("event_type") === eventType)
      .select(col("event_id"), col("user_id"), unix_timestamp(col("ts")).as("ts_sec"))
      .orderBy("event_id")

  /** Schema-on-read JSON extraction (reference S2/O1:
    * JsonSerde + `value.get("uid")`, UniqueUsersCounter.java:20-24,68) —
    * here as `get_json_object` over the `props` JSON column, aggregated per
    * event_type. */
  def jsonExtractStats(events: DataFrame): DataFrame =
    events
      .select(
        col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

  /** VARIANT-typed JSON surface (Spark 4): `props` parsed ONCE into the
    * binary semi-structured type, then extracted with typed
    * `variant_get` paths — the parse-once/extract-many shape that
    * replaces repeated per-path string parsing at scale (VARIANT is the
    * open-lakehouse answer to schema-on-read: the binary encoding skips
    * re-tokenizing the JSON for every path, and shredded storage can
    * push the path reads to the column reader). `try_variant_get` on a
    * path absent from every record exercises the lenient accessor —
    * missing data reads as NULL, never an error. Aggregates mirror
    * [[jsonExtractStats]] so the two surfaces are directly comparable;
    * the oracle extracts the same paths with JSON functions. */
  def variantExtractStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(
        col("event_type"),
        expr("variant_get(v, '$.k', 'long')").as("k"),
        expr("try_variant_get(v, '$.absent_key', 'long')").as("miss"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"),
        sum(when(col("miss").isNull, lit(1L)).otherwise(lit(0L))).as("n_missing"))
      .orderBy("event_type")

  /** MAP-typed JSON surface: `props` parsed as `map<string,long>` (vs
    * [[jsonExtractStats]]' path extraction), exploded into (key, value)
    * entry rows, aggregated per key. Exercises MapType columns and the
    * map generator — schema-on-read for payloads whose keys are NOT known
    * ahead of time, the shape a pipeline meets in practice. */
  def propsMapStats(events: DataFrame): DataFrame =
    events
      // parse as map<string,string> and cast per-ENTRY after the explode:
      // parsing straight to map<string,long> nulls out the WHOLE map when
      // any one value is non-integer, silently dropping the row's other
      // keys — per-key try_cast drops only the offending entry, matching
      // the oracle's json_extract_string + TRY_CAST semantics
      .select(explode(from_json(col("props"), org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)))
        .as(Seq("key", "sval")))
      .withColumn("val", expr("try_cast(sval AS long)"))
      .filter(col("val").isNotNull)
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("val")).as("sum_val"),
        min(col("val")).as("min_val"),
        max(col("val")).as("max_val"))
      .orderBy("key")

  /** Per-type counts + exact cents sum (doubles made order-independent by
    * rounding each value to cents before the integer-exact sum). */
  def eventTypeStats(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users"),
        sum(round(col("value") * 100)).cast("long").as("value_cents"))
      .orderBy("event_type")
}
