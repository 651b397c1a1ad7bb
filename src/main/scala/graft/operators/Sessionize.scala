package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Pin.PinnedOps

/** Session windows and as-of (time-travel) joins — event-time operators
  * beyond the reference's tumbling/hopping windows (SURVEY.md §2 streaming
  * row: "session windows not used").
  */
object Sessionize {

  /** Per-user session stats with a 30-minute inactivity gap, via Spark's
    * native `session_window` (merging state machine; works batch +
    * streaming). Output keys are floor-second epochs so the DuckDB
    * lag-partition oracle is integer-exact. */
  def userSessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
      .select(
        col("user_id"),
        unix_timestamp(col("first_ts")).as("session_start_sec"),
        col("n_events"),
        (unix_timestamp(col("last_ts")) - unix_timestamp(col("first_ts"))).as("duration_sec"))
      .orderBy("user_id", "session_start_sec")

  /** As-of join: each event matched to the key's most recent order at or
    * before the event time (ties on time broken by highest orderkey).
    *
    * Implementation is the MERGE form, not a range join: union both sides
    * tagged, one shuffle on the key, a running `last(..., ignoreNulls)`
    * window — O(n log n) per key group and no quadratic range explosion,
    * which is the shape that survives 100 TB (a range join would pair
    * every event with every earlier order). */
  def asofJoinOrders(events: DataFrame, orders: DataFrame): DataFrame = {
    val ord = orders.select(
      col("o_custkey").as("k"),
      unix_timestamp(col("o_orderdate")).as("t"),
      lit(0).as("tag"),
      col("o_orderkey").as("orderkey"),
      lit(null).cast("long").as("event_id"))
    val ev = events.select(
      col("user_id").as("k"),
      unix_timestamp(col("ts")).as("t"),
      lit(1).as("tag"),
      lit(null).cast("long").as("orderkey"),
      col("event_id"))
    // order rows sort before the event at the same timestamp (tag 0 < 1):
    // an order placed exactly at event time matches ("at or before").
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("tag"), col("orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionByName(ev)
      .withColumn("asof_orderkey", last(col("orderkey"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("k").as("user_id"), col("asof_orderkey"))
      .orderBy("event_id")
  }

  /** Point-in-interval RANGE JOIN, bucketized — conversion attribution:
    * each click paired with the same user's purchases inside the 1 h
    * window starting at the click, aggregated per click. The missing
    * member of the join family (inner/semi/anti/outer/as-of/stream are
    * covered elsewhere): `a.key = b.key AND b.t BETWEEN a.t0 AND a.t1`.
    *
    * Scale shape — the TIME-BUCKET EXPANSION trick, not a theta join: a
    * plain `key = key AND ts BETWEEN …` plans as an equi-join on `key`
    * alone with the range as a post-filter, so a hot key pairs ALL its
    * clicks with ALL its purchases before filtering (quadratic per key —
    * the classic interval-join blowup). Here both sides carry an
    * explicit time bucket of width == the window span: purchases land in
    * their bucket, each click explodes to the ≤ 2 buckets its window can
    * touch (bounded ×2, by construction of bucket width == span), and
    * the join key is `(key, bucket)` — strictly finer than `key`, so
    * per-reducer input is bounded by a key's activity per HOUR, not per
    * lifetime. The residual range predicate trims within the bucket.
    * This is the state layout Flink/Kafka-Streams interval joins and
    * Spark's own stream–stream join use, expressed relationally. */
  def clickPurchaseRangeJoin(events: DataFrame, windowSec: Long = 3600L): DataFrame = {
    val pur = events.filter(col("event_type") === "purchase").select(
      col("user_id").as("k"),
      unix_timestamp(col("ts")).as("p_sec"),
      Relational.cents(col("value")).cast("long").as("v_cents"))
      .withColumn("pbucket", col("p_sec") - pmod(col("p_sec"), lit(windowSec)))
    val clk = events.filter(col("event_type") === "click").select(
      col("event_id"), col("user_id"),
      unix_timestamp(col("ts")).as("click_sec"))
      .withColumn("b0", col("click_sec") - pmod(col("click_sec"), lit(windowSec)))
      .withColumn("bucket", explode(array(col("b0"), col("b0") + lit(windowSec))))
    clk.join(pur,
        col("user_id") === col("k") && col("bucket") === col("pbucket") &&
          col("p_sec") >= col("click_sec") &&
          col("p_sec") < col("click_sec") + lit(windowSec))
      .groupBy(col("event_id"), col("user_id"), col("click_sec"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(col("v_cents")).as("purchase_cents"),
        min(col("p_sec") - col("click_sec")).as("first_purchase_gap_sec"))
      .orderBy("event_id")
  }

  /** LAST-TOUCH ATTRIBUTION — the marketing-analytics classic: every
    * purchase credited to the same user's most recent click/view at or
    * before it, provided the touch is within the attribution horizon
    * (24 h); purchases with no touch, or only a stale one, credit
    * 'direct'. Conservation is the audit property: every purchase is
    * attributed to exactly one channel, so the rollup's counts sum to
    * the purchase count (a report that silently drops unattributable
    * conversions overstates every channel).
    *
    * Scale shape — the MERGE form [[asofJoinOrders]] established, not a
    * per-purchase subquery: touches and purchases union tagged, ONE
    * shuffle on user_id, and a running `last(..., ignoreNulls)` window
    * carries the latest touch's channel and time forward; the horizon
    * check is a column comparison on the carried time. The rollup output
    * is |channels|+1 rows. Total order at equal timestamps is
    * (t, touches-first, event_id) — an at-purchase-second touch counts,
    * and among same-second touches the highest event_id wins,
    * deterministically in both engines. */
  def lastTouchAttribution(events: DataFrame, horizonSec: Long = 86400L): DataFrame = {
    val touches = events.filter(col("event_type").isin("click", "view")).select(
      col("user_id").as("k"),
      unix_timestamp(col("ts")).as("t"),
      lit(0).as("tag"),
      col("event_id"),
      col("event_type").as("touch_ch"),
      lit(null).cast("long").as("v_cents"))
    val purchases = events.filter(col("event_type") === "purchase").select(
      col("user_id").as("k"),
      unix_timestamp(col("ts")).as("t"),
      lit(1).as("tag"),
      col("event_id"),
      lit(null).cast("string").as("touch_ch"),
      Relational.cents(col("value")).cast("long").as("v_cents"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("tag"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    touches.unionByName(purchases)
      .withColumn("last_ch", last(col("touch_ch"), ignoreNulls = true).over(w))
      .withColumn("last_t",
        last(when(col("tag") === 0, col("t")), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .withColumn("channel",
        when(col("last_ch").isNotNull && col("t") - col("last_t") <= horizonSec,
          col("last_ch")).otherwise(lit("direct")))
      .groupBy(col("channel"))
      .agg(
        count(lit(1)).as("n_conversions"),
        sum(col("v_cents")).as("value_cents"))
      .orderBy("channel")
  }

  /** Peak concurrent sessions per hour — the SWEEP-LINE form of an
    * interval-vs-timeline question ("how many sessions were open at
    * once?"). The naive relational answer is an interval × time-grid
    * range join whose output grows as (intervals × covered ticks) — a
    * quadratic explosion at 100 TB. The sweep line instead reduces each
    * session ([[userSessions]], so the interval derivation shares its
    * already-oracle-proven semantics) to two delta rows (+1 at start,
    * −1 at end, inclusive), and computes the running open-count with a
    * TWO-PHASE prefix sum — the distributed-scan pattern:
    *
    *  1. per-hour partial: sum of deltas, start/end counts (two-phase
    *     hash agg keyed by hour — shuffle bounded by the hour DOMAIN);
    *  2. cross-hour carry: a running sum over the hour axis gives each
    *     hour's `open_at_start` (window input = one row per hour —
    *     bounded by the time domain, never by the data, same contract
    *     as `daily_revenue_running`);
    *  3. within-hour sweep: running sum over deltas partitioned BY HOUR
    *     (each partition holds only that hour's endpoints) plus the
    *     hour's carry; the hour's peak is `max(open_at_start, running)`
    *     (the open-count holds `open_at_start` until the first delta).
    *
    * Ordering at equal timestamps is a total order (t, +1 before −1,
    * user_id): starts sort before ends, so two sessions touching at one
    * second count as concurrent — the same boundary-inclusive convention
    * replicated in the oracle. All columns are integer-exact. */
  def sessionConcurrency(events: DataFrame, gap: String = "30 minutes"): DataFrame = {
    val s = userSessions(events, gap).select(
      col("user_id"),
      col("session_start_sec").as("start_sec"),
      (col("session_start_sec") + col("duration_sec")).as("end_sec"))
      // one row per session, materialized ONCE before the start/end
      // union — both branches would otherwise re-run the whole
      // sessionization (the graph pair-set rule, event edition)
      .pinned()
    val deltas = s.select(col("start_sec").as("t"), lit(1L).as("d"), col("user_id"))
      .unionAll(s.select(col("end_sec").as("t"), lit(-1L).as("d"), col("user_id")))
      .withColumn("hour", (col("t") - pmod(col("t"), lit(3600L))))
    val perHour = deltas.groupBy("hour").agg(
      sum(col("d")).as("hd"),
      sum(when(col("d") > 0, 1L).otherwise(0L)).as("n_starts"),
      sum(when(col("d") < 0, 1L).otherwise(0L)).as("n_ends"))
    val carry = Window.orderBy("hour")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perHour.withColumn(
      "open_at_start", coalesce(sum(col("hd")).over(carry), lit(0L)))
    val sweep = Window.partitionBy("hour")
      .orderBy(col("t"), col("d").desc, col("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .join(offsets.select("hour", "open_at_start", "n_starts", "n_ends"), "hour")
      .withColumn("run", col("open_at_start") + sum(col("d")).over(sweep))
      .groupBy(col("hour"), col("open_at_start"), col("n_starts"), col("n_ends"))
      .agg(max(col("run")).as("max_run"))
      .select(col("hour"), col("n_starts"), col("n_ends"), col("open_at_start"),
        greatest(col("max_run"), col("open_at_start")).as("peak_concurrent"))
      .orderBy("hour")
  }
}
