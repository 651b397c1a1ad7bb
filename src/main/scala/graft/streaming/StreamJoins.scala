package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream–stream joins with time-bounded state. The interval condition +
  * watermarks on BOTH sides let Spark evict join state once the watermark
  * passes the bound — without it, each side would buffer forever (the same
  * unbounded-state failure mode as the reference's distinct sets,
  * reference README.md:27-31, in join form).
  */
object StreamJoins {

  /** Purchases joined to the same user's clicks within the preceding
    * `window`. Inputs: clicks(uid, click_ts), purchases(uid, purchase_ts).
    * Inner interval join — each side watermarked, state bounded by
    * watermark + interval. */
  def purchasesWithRecentClicks(clicks: DataFrame, purchases: DataFrame,
                                window: String = "10 minutes",
                                watermark: String = "5 seconds"): DataFrame = {
    val c = clicks
      .select(col("uid").as("c_uid"), col("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("uid").as("p_uid"), col("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("p_uid") === col("c_uid") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $window") &&
        col("click_ts") <= col("purchase_ts"))
      .select(col("p_uid").as("uid"), col("purchase_ts"), col("click_ts"))
  }

  /** LEFT-OUTER form of [[purchasesWithRecentClicks]] — every purchase
    * emits, attributed or not. The subtle half is WHEN the unmatched row
    * appears: a purchase with no click so far cannot emit a null-padded
    * row at arrival, because a matching click (late, within watermark)
    * may still come; the row emits exactly once, when the GLOBAL
    * watermark (min across both inputs) passes the purchase's join bound
    * and no click can legally match anymore. That emit-on-expiry
    * semantics is what distinguishes a streaming outer join from "inner
    * join plus a batch anti-join" — and what the spec pins: nothing
    * before watermark passage, one null-padded row after, never two.
    * State stays watermark + interval bounded exactly as the inner form. */
  def purchasesWithRecentClicksOuter(clicks: DataFrame, purchases: DataFrame,
                                     window: String = "10 minutes",
                                     watermark: String = "5 seconds"): DataFrame = {
    val c = clicks
      .select(col("uid").as("c_uid"), col("click_ts"))
      .withWatermark("click_ts", watermark)
    val p = purchases
      .select(col("uid").as("p_uid"), col("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    p.join(c,
      col("p_uid") === col("c_uid") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $window") &&
        col("click_ts") <= col("purchase_ts"),
      "left_outer")
      .select(col("p_uid").as("uid"), col("purchase_ts"), col("click_ts"))
  }
}
