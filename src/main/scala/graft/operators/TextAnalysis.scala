package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Text-analysis operators over the documents table: per-doc statistics,
  * language ID, quality scoring, fingerprinting, token counting. All pure
  * column expressions (codegen'd, no UDFs) — per-doc map work with no
  * shuffle except the explicitly-aggregating queries, which is exactly the
  * shape that scales to 100 TB: the scan is the cost, everything else
  * pipelines inside whole-stage codegen.
  */
object TextAnalysis {

  /** Per-document surface statistics. */
  def stats(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      tokenCount(col("text")).cast("long").as("n_tokens"),
      contentChars(col("text")).cast("long").as("content_chars"),
      round(contentChars(col("text")).cast("double") /
        greatest(tokenCount(col("text")).cast("double"), lit(1.0)), 4).as("avg_token_len"))
      .orderBy("doc_id")

  /** Whitespace vs BPE-ish token counts per doc. */
  def tokenCounts(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      tokenCount(col("text")).cast("long").as("ws_tokens"),
      bpeTokenCount(col("text")).cast("long").as("bpe_tokens"))
      .orderBy("doc_id")

  /** Heuristic language ID + the signal it is based on. */
  def langId(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      col("lang").as("label_lang"),
      enStopwords(col("text")).cast("long").as("en_stopwords"),
      langIdEn(col("text")).as("predicted"))
      .orderBy("doc_id")

  /** Quality score + keep/drop decision per doc. */
  def quality(documents: DataFrame, keepAt: Double = 0.5): DataFrame =
    documents.select(
      col("doc_id"),
      qualityScore(col("text")).as("quality_score"),
      (qualityScore(col("text")) >= keepAt).as("keep"))
      .orderBy("doc_id")

  /** Content fingerprints (md5 of normalized text). */
  def fingerprints(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      fingerprint(col("text")).as("fp"),
      substring(fingerprint(col("text")), 1, 8).as("fp_prefix"))
      .orderBy("doc_id")

  /** Corpus-wide top-k word bigrams by frequency (not distinct per doc) —
    * the n-gram frequency table of a training-data pipeline. Explode →
    * two-phase hash count → TakeOrdered(k); the shuffle carries (bigram,
    * partial_count), never raw text. */
  def topBigrams(documents: DataFrame, k: Int = 50): DataFrame =
    documents
      .select(explode(graft.plans.WordShingles
        .shingles(normText(col("text")), n = 2, distinct = false)).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("bigram"))
      .limit(k)

  /** Corpus roll-up per (lang, source): doc counts and size totals —
    * the partition-level bookkeeping view of a training-data pipeline. */
  def corpusSummary(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col("text"))).cast("long").as("total_chars"),
        sum(tokenCount(col("text"))).cast("long").as("total_tokens"))
      .orderBy("lang", "source")
}
