package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation patterns. AQE's skew-join handling covers most cases at
  * runtime; this is the explicit deterministic form for when the skew is
  * known a priori (a hot user, a null-heavy key) — the standard 100 TB
  * remedy when one reducer would otherwise receive a whole hot key.
  */
object Skew {

  /** Salted join + aggregate: the fact side's hot keys are spread over
    * `salt` sub-keys (deterministically, from the row id — reproducible,
    * unlike `rand()`), the dim side is replicated `salt` ways, and the
    * aggregate re-merges. Result is IDENTICAL to the unsalted join (the
    * oracle runs the plain join); only the shuffle layout differs: each
    * (key, salt) partition carries ~1/salt of a hot key's rows. */
  def saltedEventSegmentStats(events: DataFrame, customer: DataFrame, salt: Int = 8): DataFrame = {
    val facts = events.select(
      col("user_id"), col("value"),
      pmod(col("event_id"), lit(salt)).as("salt"))
    val dim = customer
      .select(col("c_custkey"), col("c_mktsegment"))
      .withColumn("salt", explode(array((0 until salt).map(lit(_)): _*)))
    facts
      .join(dim, col("user_id") === col("c_custkey") && facts("salt") === dim("salt"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100)).cast("long").as("value_cents"))
      .orderBy("c_mktsegment")
  }

  /** The ADAPTIVE counterpart of [[saltedEventSegmentStats]]: the plain
    * unsalted join, left for AQE's runtime skew-join split
    * (`spark.sql.adaptive.skewJoin.enabled`, on by default) to handle.
    * At execution time AQE reads the actual shuffle-partition sizes; a
    * partition exceeding both the skew threshold and factor×median is
    * split into sub-partitions, each joined against a duplicated copy of
    * the other side — the same replicate-and-split idea as the manual
    * salt, decided from measured sizes instead of a guessed factor.
    * PlanShapeSpec drives a deliberately skewed join under tightened
    * thresholds and asserts the executed plan's `skew=true` marker.
    *
    * WHEN TO RELY ON WHICH — AQE skew-join first: it needs no prior
    * knowledge, adapts per-run, and costs nothing when the data isn't
    * skewed. Reach for the manual salt only where AQE can't act: a
    * BROADCAST join (nothing shuffles, so there is nothing to split —
    * yet the probe side's hot rows still all land in one task's
    * AGGREGATION), skew in a groupBy rather than a join (AQE splits
    * join partitions, not hash-agg groups — the two-phase/salted agg is
    * the fix there), or when reproducible partition layout matters
    * (AQE's splits depend on measured bytes, the salt is
    * deterministic). Results are identical either way — the oracle runs
    * the same plain join for both registrations. */
  def aqeEventSegmentStats(events: DataFrame, customer: DataFrame): DataFrame =
    events.select(col("user_id"), col("value"))
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        sum(round(col("value") * 100)).cast("long").as("value_cents"))
      .orderBy("c_mktsegment")

  /** Join-key skew audit — the diagnostic you run BEFORE picking a
    * shuffle key, a salt factor, or trusting AQE's skew handling: the
    * top-k heaviest values of a prospective key with each value's exact
    * row count and integer-ppm share of the table. A key whose head
    * share is a large multiple of 1/NDV is the one that lands a whole
    * reducer's worth of rows on one task at 100 TB.
    *
    * Scale shape: one two-phase hash agg keyed by the candidate key
    * (partial counts map-side, shuffle bounded by NDV), a k-bounded
    * TakeOrdered, and the 1-row table total riding the allowlisted
    * broadcast-crossJoin shape — the same bounded-monitor contract as
    * `minhash_band_stats`/`substring_gram_stats`, generalized to any
    * relational key. */
  def joinKeySkewStats(df: DataFrame, key: String, k: Int = 20): DataFrame = {
    val counts = df.groupBy(col(key).as("key")).agg(count(lit(1)).as("n"))
    val top = counts
      .orderBy(col("n").desc, col("key"))
      .limit(k)
    val total = df.agg(count(lit(1)).as("n_rows"))
    top.crossJoin(broadcast(total))
      .select(
        col("key"), col("n"), col("n_rows"),
        (col("n") * lit(1000000L) / col("n_rows")).cast("long").as("share_ppm"))
      .orderBy(col("n").desc, col("key"))
  }

  /** EXACT inner-join output cardinality WITHOUT running the join — the
    * pre-flight audit for any prospective equi-join: per-key count
    * aggregates of both sides joined on the key, then
    * `Σ n_a(k)·n_b(k)` (the join's exact row count), the matching-key
    * count, and the largest single-key contribution (the hot-key red
    * flag that says "salt this" before the shuffle melts). A planner
    * estimates this from NDV sketches; at aggregate cost it can simply
    * be computed — both inputs reduce to NDV-bounded count relations
    * before the only (key-keyed, aggregate-sized) join, so the audit
    * costs two scans + one bounded join at ANY fact size. */
  def joinSizeEstimate(left: DataFrame, leftKey: String,
                       right: DataFrame, rightKey: String): DataFrame = {
    val a = left.groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("na"))
    val b = right.groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("nb"))
    a.join(b, "key")
      .agg(
        count(lit(1)).cast("long").as("n_matching_keys"),
        sum(col("na") * col("nb")).cast("long").as("join_rows"),
        max(col("na") * col("nb")).cast("long").as("max_key_rows"))
  }
}
