package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
    * two exact-percentile aggs whose input is that bounded hourly table. */
  def eventRateAnomaly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour"))
      .agg(count(lit(1)).as("n"))
    val med = hourly.groupBy("event_type")
      .agg(expr("CAST(2 * percentile(n, 0.5D) AS LONG)").as("med2"))
    val dev = hourly.join(med, "event_type")
      .withColumn("dev2", abs(lit(2L) * col("n") - col("med2")))
    val mad = dev.groupBy("event_type")
      .agg(expr("CAST(2 * percentile(dev2, 0.5D) AS LONG)").as("mad4"))
    dev.join(mad, "event_type")
      .select(col("event_type"), col("hour"), col("n"), col("med2"),
        col("mad4"), col("dev2"),
        (lit(2L) * col("dev2") > lit(3L) * col("mad4")).cast("long").as("is_spike"))
      .orderBy("event_type", "hour")
  }
}
