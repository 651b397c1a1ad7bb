package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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

  /** Deterministic stratified sampling — the training-data MIXING
    * operator: keep `pct(source)`% of each source's docs, selected by an
    * md5 hash bucket of (source, doc_id). Hash-based (not rand()) so the
    * sample is reproducible across runs, engines (md5 is bit-identical in
    * the DuckDB oracle) and partitionings, and it composes: re-running on
    * a grown corpus keeps the same docs it kept before. Pure map + filter:
    * pushes to the scan, no shuffle, any scale. */
  val SampleRates: Map[String, Int] = Map("src0" -> 50, "src1" -> 10)
  val SampleDefaultPct = 25

  def stratifiedSample(documents: DataFrame): DataFrame = {
    val pct = SampleRates.foldLeft(lit(SampleDefaultPct)) { case (acc, (s, p)) =>
      when(col("source") === s, lit(p)).otherwise(acc)
    }
    documents
      .withColumn("hb",
        conv(substring(md5(concat_ws(":", col("source"), col("doc_id"))), 1, 4), 16, 10)
          .cast("long") % 100)
      .filter(col("hb") < pct)
      .select(col("doc_id"), col("source"), col("hb").as("hash_bucket"))
      .orderBy("doc_id")
  }

  /** End-to-end curation pass — the composite query a training-data
    * pipeline actually ships: keep documents that (a) clear the quality
    * threshold, (b) are identified as English, and (c) are their near-dup
    * cluster's representative (or in no cluster at all) — i.e. quality
    * filter + language filter + dedup in one declarative plan. The dedup
    * membership arrives as one broadcast-size anti-join input (cluster
    * non-representatives), so the corpus-side work stays scan-shaped. */
  def curatedCorpus(documents: DataFrame, keepAt: Double = 0.5): DataFrame = {
    val nonReps = Dedup.dedupClusters(documents)
      .filter(col("doc_id") =!= col("cluster_rep"))
      .select(col("doc_id").as("drop_id"))
    documents
      .filter(qualityScore(col("text")) >= keepAt && langIdEn(col("text")) === "en")
      .join(nonReps, col("doc_id") === col("drop_id"), "left_anti")
      .select(col("doc_id"), col("source"),
        qualityScore(col("text")).as("quality_score"))
      .orderBy("doc_id")
  }

  /** Generator (lateral-view) surface + grouped top-k: explode every
    * token, count per (source, token), rank-window to the top `k` per
    * source. The window input is the aggregated count table — bounded by
    * sources × vocabulary, not corpus size — never raw token rows. */
  def topTokensPerSource(documents: DataFrame, k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n").desc, col("tok"))
    documents
      .select(col("source"), explode(split(normText(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .orderBy("source", "rk")
  }

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
