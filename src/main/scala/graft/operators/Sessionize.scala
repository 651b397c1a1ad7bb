package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
}
