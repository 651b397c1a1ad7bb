package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions.{langIdEn, piiRedact, qualityScore}

/** Streaming curation — the online half of the corpus-curation story
  * ([[graft.operators.TextAnalysis.curatedCorpus]] is the batch pass):
  * documents stream in, low-quality / non-English ones are dropped, and
  * survivors are emitted with their PII scrubbed.
  *
  * Every transform is a stateless column expression (regex counts +
  * chained replaces), so this is a pure map-filter stream — no state
  * store, no watermark required, arbitrary parallelism; it composes with
  * [[StreamingDedup.firstOccurrences]] upstream for the full
  * quality ∧ language ∧ dedup online pipeline.
  */
object StreamingCuration {

  /** Keep docs that clear the quality bar AND language-ID as English;
    * emit them PII-scrubbed with the score attached. Schema-preserving:
    * every input column rides through (text replaced by its scrubbed
    * form, `quality_score` appended — scored on the ORIGINAL text,
    * before redaction tags perturb the token counts), so payload columns
    * like `source` survive for downstream sinks ([[TrainingPipeline]]). */
  def curate(docs: DataFrame, keepAt: Double = 0.5): DataFrame =
    docs
      .filter(qualityScore(col("text")) >= keepAt && langIdEn(col("text")) === "en")
      .withColumn("quality_score", qualityScore(col("text")))
      .withColumn("text", piiRedact(col("text")))
}
