package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{fingerprint, normText}

/** Streaming deduplication — the online half of the training-data dedup
  * story: documents arrive as a stream and only the FIRST occurrence of
  * each (normalized-content) fingerprint within the watermark horizon is
  * emitted downstream.
  *
  * State is the fingerprint set, keyed by the 32-hex md5 — 16 bytes of
  * state per distinct doc seen, NOT the document text, and the event-time
  * watermark bounds it: `dropDuplicates` over a watermarked column evicts
  * fingerprints once the watermark passes them, so state is
  * O(distinct docs per horizon), not O(stream lifetime). An unbounded
  * exact streaming dedup is impossible in finite memory — the horizon is
  * the contract (a real pipeline backs it with the batch exact/sketch
  * passes in [[graft.operators.Dedup]] for cross-horizon dups).
  */
object StreamingDedup {

  /** First-occurrence filter: one output row per distinct normalized
    * fingerprint inside the watermark horizon. Input needs (doc_id, text,
    * ts). */
  def firstOccurrences(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .select(col("doc_id"), col("fp"), col("ts"))

  /** [[firstOccurrences]] with the payload kept: emits the surviving
    * DOCUMENT rows — every input column, unchanged — instead of
    * fingerprint rows, so the dedup stage composes schema-preservingly
    * with downstream transforms in one topology: [[StreamingCuration
    * .curate]] chains directly on this, and payload columns (`source`,
    * media bytes, …) ride through untouched for the sink
    * ([[TrainingPipeline]] needs `source` for shard packing). State is
    * unchanged: only the 16-byte fingerprint per doc in the state store;
    * the text rides the batch, never the state. */
  def firstOccurrenceDocs(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")

  /** Streaming half of [[graft.operators.Dedup.incrementalDedup]]'s exact
    * stage: drop stream docs whose normalized fingerprint already exists
    * in a STATIC index (the fingerprint table of everything previously
    * ingested). Composes BEFORE [[firstOccurrences]]/[[firstOccurrenceDocs]]
    * (which handle within-stream repeats) for the full online ingestion
    * dedup. Structured Streaming's stream-static matrix has no left-anti,
    * so this is the standard emulation: left-outer against the index and
    * keep the null-probe rows. The index side is a static relation —
    * broadcast when small, shuffled-bucketed when it is the whole corpus
    * history. */
  def againstIndex(docs: DataFrame, fpIndex: DataFrame): DataFrame = {
    val idx = fpIndex.select(col("fp").as("idx_fp")).distinct()
    docs
      .withColumn("fp", fingerprint(col("text")))
      .join(idx, col("fp") === col("idx_fp"), "left_outer")
      .filter(col("idx_fp").isNull)
      .drop("fp", "idx_fp") // schema-preserving: all input columns survive
  }

  /** Per-batch dedup stats (update mode): how many raw vs distinct docs
    * per minute — the monitoring view of the online dedup. */
  def dedupRates(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("fp", fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 minute"))
      .agg(
        count(lit(1)).as("n_docs"),
        approx_count_distinct(col("fp")).as("approx_distinct"))
      .select(
        unix_timestamp(col("window.start")).as("minute"),
        col("n_docs"), col("approx_distinct"))
}
