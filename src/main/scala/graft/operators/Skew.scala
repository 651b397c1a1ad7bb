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
}
