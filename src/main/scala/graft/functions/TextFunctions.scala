package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the large-scale training-data
  * pipeline: token counting, language-ID heuristics, quality scoring,
  * fingerprinting. All built from codegen'd `org.apache.spark.sql.functions`
  * (regexp_count / md5 / length) — no UDFs — and each has an exactly
  * equivalent DuckDB SQL form used by the oracle (see SparkEntry.oracleSql).
  */
object TextFunctions {

  /** Whitespace token count: number of maximal \S+ runs. */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-ish pre-tokenizer count: letter runs | digit runs | single
    * punctuation. The regex is the public GPT-2-style pre-tokenization
    * shape, simplified to ASCII classes. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BpePattern))

  /** Canonical normalization used by near-dup / fingerprint paths:
    * lowercase, trim, collapse internal whitespace. */
  def normText(text: Column): Column =
    regexp_replace(trim(lower(text)), "\\s+", " ")

  /** 128-bit content fingerprint of the normalized text (md5 hex — md5 is
    * bit-identical between Spark and DuckDB, so oracle-checkable). */
  def fingerprint(text: Column): Column = md5(normText(text))

  /** English stopword hits — the language-ID signal. */
  val EnStopRe = "\\b(the|a|an|and|of|to|in|is|it)\\b"
  def enStopwords(text: Column): Column = regexp_count(lower(text), lit(EnStopRe))

  /** Heuristic language ID: stopword density over token count.
    * (On real corpora this would be per-language n-gram tables; the shape —
    * a pure column expression, no shuffle — is the point at 100 TB.) */
  def langIdEn(text: Column): Column = {
    val toks = tokenCount(text)
    when(toks === 0, lit("unk"))
      .when(enStopwords(text).cast("double") / toks.cast("double") >= 0.05, lit("en"))
      .otherwise(lit("unk"))
  }

  /** PII patterns, kept to the Java∩RE2 syntax subset so the DuckDB
    * oracle runs the IDENTICAL pattern strings. Redaction applies them in
    * a fixed order (email → ipv4 → phone → digit-run) — the order is part
    * of the contract since the classes can overlap on dotted digits. */
  val EmailRe     = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re      = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PhoneRe     = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val LongDigitRe = "\\d{4,}"

  /** Scrubbed text: every PII match replaced by a class tag. Pure chained
    * regexp_replace — scan-shaped, codegen'd, no shuffle. */
  def piiRedact(text: Column): Column = {
    val e  = regexp_replace(text, EmailRe, "[EMAIL]")
    val ip = regexp_replace(e, Ipv4Re, "[IP]")
    val ph = regexp_replace(ip, PhoneRe, "[PHONE]")
    regexp_replace(ph, LongDigitRe, "[NUM]")
  }

  /** Non-whitespace character count. */
  def contentChars(text: Column): Column =
    length(regexp_replace(text, "\\s+", ""))

  /** Punctuation-character count. */
  def punctChars(text: Column): Column =
    length(text) - length(regexp_replace(text, "[^A-Za-z0-9\\s]", ""))

  /** Quality score in [0,1]: rewards mid-length docs, penalizes
    * punctuation soup. Pure arithmetic on ints → deterministic across
    * engines (identical IEEE ops in the oracle SQL). */
  def qualityScore(text: Column): Column = {
    val toks     = tokenCount(text).cast("double")
    val punct    = punctChars(text).cast("double")
    val chars    = length(text).cast("double")
    val lenScore = least(toks / lit(20.0), lit(1.0))
    val punctPenalty = least(punct / greatest(chars, lit(1.0)) * lit(4.0), lit(1.0))
    round(lenScore * (lit(1.0) - punctPenalty), 6)
  }
}
