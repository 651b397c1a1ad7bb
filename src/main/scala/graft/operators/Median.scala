package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Pin.PinnedOps

/** Integer-exact `2×median` over a bounded VALUE-DOMAIN histogram — the
  * one median definition the whole integer-discipline family now shares
  * (CUSUM, rate anomaly, supplier ranking). `med2` is the SUM OF THE TWO
  * MIDDLE ORDER STATISTICS: for sorted values a_1..a_n it is
  * a_ceil(n/2) + a_(floor(n/2)+1) — identical to `2 · interpolated-median`
  * on any integer domain (odd n: 2·a_mid; even n: the two midpoints'
  * sum), so every existing `2*median(x)` oracle keeps matching bit-for-bit
  * while the engine side stays free of float `percentile()` buffers.
  *
  * Mechanism: the nearest-rank fence rule the repo already uses for
  * quartiles and equi-depth buckets ([[Relational.rfmSegments]],
  * [[Relational.ordersPriceHistogram]]), applied at k = n/2 twice —
  * `lo = min{v : 2·cum(v) ≥ n}` and `hi = min{v : 2·cum(v) > n}` (integer
  * cum makes both equivalences exact; parity makes `>` select rank
  * floor(n/2)+1). Scale shape: one two-phase hash agg to the value-domain
  * histogram (shuffle bounded by NDV, never row count — `percentile()`
  * buffers every raw value per group), one ordered window over that
  * bounded histogram, one bounded agg out.
  */
object Median {

  /** 1-row frame `(med2: long)` over the whole input. The cumulative
    * window is single-partition BY DESIGN and safe: its input is the
    * value-domain histogram (days / cents-buckets / hourly counts), which
    * grows with the DOMAIN, not the row count. */
  def med2Global(df: DataFrame, value: Column): DataFrame = {
    // the histogram feeds the cumulative window AND the 1-row total —
    // unpinned, the caller's whole input subtree executed twice per
    // median (optimization-guide §2.4). Value-domain-bounded, so the
    // materialization is trivially safe at any input scale.
    val hist = df.select(value.as("v")).groupBy("v").agg(count(lit(1)).as("cnt"))
      .pinned()
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.crossJoin(broadcast(hist.agg(sum(col("cnt")).as("n"))))
      .agg((min(when(col("cum") * 2 >= col("n"), col("v"))) +
            min(when(col("cum") * 2 > col("n"), col("v")))).cast("long").as("med2"))
  }

  /** Per-key nearest-rank percentiles over the same bounded histogram
    * machinery: one `p<pct>` long column per requested percent, each the
    * element at rank ceil(pct·n/100) — `min{v : 100·cum ≥ pct·n}`, which
    * is EXACTLY DuckDB's `quantile_disc(pct/100)` (rank-ceil semantics,
    * engine-verified), so percentile reports hash cross-engine with no
    * interpolation anywhere. Same scale shape as [[med2ByKey]]: shuffle
    * bounded by key × value-domain NDV, never by row count. */
  def nearestRankByKey(df: DataFrame, keys: Seq[String], value: Column,
                       pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100), "pcts in 1..100")
    val keyCols = keys.map(col)
    val hist = df.select(keyCols :+ value.as("v"): _*)
      .groupBy(keyCols :+ col("v"): _*).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(keyCols: _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    val pctAggs = pcts.map(p =>
      min(when(col("cum") * 100 >= col("n_all") * p, col("v"))).cast("long").as(s"p$p"))
    hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n_all", sum(col("cnt")).over(wAll))
      .groupBy(keyCols: _*)
      .agg(sum(col("cnt")).cast("long").as("n"), pctAggs: _*)
  }

  /** Per-key form: `keys..., n (rows per key), med2`. The window
    * partitions by the group key, so each partition is one key's
    * value-domain histogram — bounded rows per task at any fact scale. */
  def med2ByKey(df: DataFrame, keys: Seq[String], value: Column): DataFrame = {
    val keyCols = keys.map(col)
    val hist = df.select(keyCols :+ value.as("v"): _*)
      .groupBy(keyCols :+ col("v"): _*).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(keyCols: _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(keyCols: _*)
    hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n_all", sum(col("cnt")).over(wAll))
      .groupBy(keyCols: _*)
      .agg(
        sum(col("cnt")).cast("long").as("n"),
        (min(when(col("cum") * 2 >= col("n_all"), col("v"))) +
         min(when(col("cum") * 2 > col("n_all"), col("v")))).cast("long").as("med2"))
  }
}
