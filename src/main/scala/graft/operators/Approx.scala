package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate query processing (AQP) and preference queries.
  *
  * The AQP operators answer the 100 TB question "what would this
  * aggregate be, from a 1/16 scan?" with a DETERMINISTIC hash sample
  * (the corpus's md5-bucket idiom — reproducible across runs, engines,
  * and partitionings, unlike `TABLESAMPLE`/`rand()`), a Horvitz–
  * Thompson estimator whose 1/p factor is an exact integer, and a
  * variance-based error gate computed from the sample itself — so the
  * registered queries are *_check-style: the oracle recomputes both the
  * estimate and the gate and a broken estimator is a hash mismatch,
  * not a lucky pass.
  *
  * Everything is integer arithmetic: values are whole DOLLARS
  * (`round(o_totalprice)`), the sampling rate is a power of two over a
  * 16-bit md5 prefix (p = 4096/65536 = 1/16 exactly), and the gate
  * compares SQUARES — `(est − exact)² ≤ z²·V̂` with z² = 25 — instead
  * of taking a square root. The square-sum `Σv²` and both sides of the
  * squared comparison run in DECIMAL(38,0) (DuckDB: HUGEINT — both
  * exact ≥ 10³⁸): per-row v² is ~10¹¹, so int64 would wrap the
  * `6000·Σv²` term silently (non-ANSI) near 10⁶ sampled rows while
  * DuckDB raised on BIGINT overflow — a cross-engine gate break. At
  * 38 digits the term has headroom through ~10²³ sampled rows; the
  * estimator itself (first-power sums and counts) stays int64, which
  * wraps only past ~10¹⁷ sampled dollars-valued rows.
  */
object Approx {

  /** Bernoulli(1/16) membership: 16-bit md5 prefix of the salted key
    * below 4096. Same expression the oracle spells in DuckDB nibbles. */
  private def inSample(key: org.apache.spark.sql.Column) =
    conv(substring(md5(concat_ws(":", lit("aqp"), key)), 1, 4), 16, 10)
      .cast("long") < 4096

  /** Whole-table AQP check: exact order count and revenue vs their
    * 1/16-sample Horvitz–Thompson estimates, in ONE pass — the exact
    * and sampled aggregates are conditional sums over the same scan
    * (production would scan only the sample; the CHECK needs both
    * sides, and fusing them means the gate never reads the table
    * twice). For Bernoulli(p) HT, V̂(Σ̂) = (1−p)/p²·Σ_{i∈S} v_i² =
    * 240·ssq at p = 1/16; the gate is the 5σ squared comparison.
    * Output is one row; `*_err_ppm` makes the realized error
    * observable next to the gate verdict. */
  def revenueEstimateCheck(orders: DataFrame): DataFrame = {
    val v = round(col("o_totalprice")).cast("long")
    val s = inSample(col("o_orderkey"))
    orders
      .agg(
        count(lit(1)).as("n_exact"),
        sum(when(s, lit(1L)).otherwise(lit(0L))).as("n_s"),
        sum(v).as("rev_exact_dollars"),
        sum(when(s, v).otherwise(lit(0L))).as("rev_s"),
        sum(when(s, v * v).otherwise(lit(0L)).cast("decimal(38,0)")).as("ssq_s"))
      .selectExpr(
        "CAST(n_exact AS LONG) AS n_exact",
        "CAST(n_s * 16 AS LONG) AS n_est",
        "CAST(abs(n_s * 16 - n_exact) * 1000000 div n_exact AS LONG) AS n_err_ppm",
        "CAST(CASE WHEN CAST(n_s * 16 - n_exact AS DECIMAL(38,0)) * CAST(n_s * 16 - n_exact AS DECIMAL(38,0)) " +
          "<= 25 * 240 * CAST(n_s AS DECIMAL(38,0)) THEN 1 ELSE 0 END AS LONG) AS n_gate_ok",
        "CAST(rev_exact_dollars AS LONG) AS rev_exact_dollars",
        "CAST(rev_s * 16 AS LONG) AS rev_est_dollars",
        "CAST(abs(rev_s * 16 - rev_exact_dollars) * 1000000 div rev_exact_dollars AS LONG) AS rev_err_ppm",
        "CAST(CASE WHEN CAST(rev_s * 16 - rev_exact_dollars AS DECIMAL(38,0)) * CAST(rev_s * 16 - rev_exact_dollars AS DECIMAL(38,0)) " +
          "<= 25 * 240 * ssq_s THEN 1 ELSE 0 END AS LONG) AS rev_gate_ok")
  }

  /** Grouped AQP check: per-segment revenue estimates from the SAME
    * 1/16 order sample, each group carrying its own HT variance gate —
    * the shape that matters at scale, because a global gate can pass
    * while a small group's estimate is garbage (its sample may be a
    * handful of rows; the per-group V̂ says exactly how wide that
    * uncertainty is). One orders ⋈ customer shuffle, then the same
    * fused conditional aggregate per segment. */
  def segmentRevenueEstimateCheck(orders: DataFrame, customer: DataFrame): DataFrame = {
    val v = round(col("o_totalprice")).cast("long")
    val s = inSample(col("o_orderkey"))
    orders
      .join(customer.select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        sum(v).as("rev_exact_dollars"),
        sum(when(s, v).otherwise(lit(0L))).as("rev_s"),
        sum(when(s, v * v).otherwise(lit(0L)).cast("decimal(38,0)")).as("ssq_s"),
        sum(when(s, lit(1L)).otherwise(lit(0L))).as("n_s"))
      .selectExpr(
        "c_mktsegment",
        "CAST(rev_exact_dollars AS LONG) AS rev_exact_dollars",
        "CAST(rev_s * 16 AS LONG) AS rev_est_dollars",
        "CAST(abs(rev_s * 16 - rev_exact_dollars) * 1000000 div rev_exact_dollars AS LONG) AS rev_err_ppm",
        "CAST(n_s AS LONG) AS n_sampled",
        "CAST(CASE WHEN CAST(rev_s * 16 - rev_exact_dollars AS DECIMAL(38,0)) * CAST(rev_s * 16 - rev_exact_dollars AS DECIMAL(38,0)) " +
          "<= 25 * 240 * ssq_s THEN 1 ELSE 0 END AS LONG) AS rev_gate_ok")
      .orderBy("c_mktsegment")
  }

  /** 2D Pareto frontier (skyline) of days by (order count, revenue):
    * the days no other day beats on both axes — the preference-query
    * primitive (BÖRZSÖNYI et al., ICDE'01) relational engines lack.
    *
    * The naive form is a quadratic NOT-EXISTS self-join; this plan is
    * the sort-sweep: collapse to one (n_orders → max revenue) point
    * per distinct count — anything below its count's max is dominated
    * within the count — then sweep counts in descending order keeping
    * points whose revenue strictly exceeds the running max (every
    * earlier point has a strictly larger count, so a non-increase
    * means domination). The unpartitioned window runs over DISTINCT
    * ORDER-COUNT VALUES — bounded by the day DOMAIN (the aggregate's
    * grain), not by table rows, the same adjudicated shape as the
    * day-axis rank/CUSUM operators. Equal (count, revenue) days tie
    * into the frontier together (neither dominates). Oracle is the
    * quadratic NOT EXISTS over the same day aggregate. */
  def paretoDays(orders: DataFrame): DataFrame = {
    val days = orders
      .groupBy(unix_timestamp(date_trunc("day", col("o_orderdate"))).as("day_sec"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice")).cast("long")).as("revenue_dollars"))
    val byN = days.groupBy(col("n_orders"))
      .agg(max(col("revenue_dollars")).as("max_rev"))
    val sweep = Window.orderBy(col("n_orders").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = byN
      .withColumn("prev_max", max(col("max_rev")).over(sweep))
      .filter(col("prev_max").isNull || col("max_rev") > col("prev_max"))
      .select(col("n_orders").as("fn"), col("max_rev"))
    days
      .join(frontier,
        col("n_orders") === col("fn") && col("revenue_dollars") === col("max_rev"))
      .select(col("day_sec"), col("n_orders").cast("long").as("n_orders"),
        col("revenue_dollars").cast("long").as("revenue_dollars"))
      .orderBy(col("n_orders").desc, col("day_sec"))
  }
}
