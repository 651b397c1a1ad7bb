package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAggregator
import graft.functions.TextFunctions.normText

/** Streaming trending-token candidates per event-time window with
  * BOUNDED aggregation state — the online sibling of
  * `TextAnalysis.tokenHeavyHitters`, and the same state-design fix the
  * unique-users path applies to the reference's scale wall
  * (/root/reference/README.md:27-31: unbounded per-window
  * `HashSet<String>` state until the 1 MiB record cap kills the job),
  * here for the top-k question instead of the distinct-count one:
  * `collect_set`-style state grows with the vocabulary seen in the
  * window, a Misra-Gries summary holds at most `cap` (token, count)
  * pairs per window no matter how wide the stream's vocabulary runs.
  *
  * Emits, per finalized window, the sketch's candidate array — every
  * token whose in-window frequency exceeds n/(cap+1) is guaranteed
  * present (PODS'12 mergeable-summaries bound, preserved across
  * micro-batch partial merges). Downstream either treats candidates as
  * the trending set directly or re-counts them exactly against the
  * window's archived slice (the batch operator's verify pass) when
  * exact ranks matter. Append mode + watermark: state is dropped once a
  * window passes the horizon, so total store size is O(open windows ×
  * cap), a constant for a fixed horizon. */
object TrendingTokens {

  def trendingTokens(docs: DataFrame, windowSec: Int = 60, cap: Int = 64,
                     watermark: String = "10 seconds"): DataFrame = {
    val mg = udaf(new MisraGriesAggregator(cap))
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(split(normText(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(window(col("ts"), s"$windowSec seconds"))
      .agg(mg(col("tok")).as("candidates"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("candidates"))
  }
}
