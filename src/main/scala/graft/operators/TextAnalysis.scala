package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Pin.PinnedOps

import graft.functions.MisraGriesAggregator
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

  /** Curation KILL-REASON attribution — the observability twin of
    * [[curatedCorpus]]: every document is assigned the FIRST gate that
    * rejects it, in the pipeline's canonical order (quality → language →
    * exact-dup non-keeper → admitted), rolled up per (source, reason)
    * with integer-ppm shares of the source. A pipeline that only reports
    * "N admitted" is undebuggable at 100 TB — when a source's admit rate
    * drops, this is the view that says WHICH gate started eating it.
    *
    * The dup gate here is the exact normalized-fingerprint family
    * (min-doc_id keeper), not the MinHash graph — attribution wants a
    * cheap deterministic membership, and exact dups dominate kill counts
    * in practice. Scale shape: one fp-keyed join of the corpus against
    * its own 16-byte-fingerprint aggregate (the `dedup_exact` class),
    * one (source, reason) two-phase agg, per-source totals broadcast
    * (|sources| rows). Null-text rows coalesce to the '' fingerprint so
    * they are attributed, not silently dropped by null-key join rules. */
  def curationKillReasons(documents: DataFrame, keepAt: Double = 0.5): DataFrame = {
    val fp = coalesce(fingerprint(col("text")), lit(""))
    val keepers = documents
      .groupBy(fp.as("fp")).agg(min(col("doc_id")).as("keeper"))
    val tagged = documents
      .withColumn("fp", fp)
      .join(keepers, "fp")
      .withColumn("reason",
        when(qualityScore(col("text")) < keepAt, "quality")
          .when(langIdEn(col("text")) =!= "en", "lang")
          .when(col("doc_id") =!= col("keeper"), "exact_dup")
          .otherwise(lit("admitted")))
    val perSource = tagged.groupBy(col("source")).agg(count(lit(1)).as("n_src"))
    tagged.groupBy(col("source"), col("reason"))
      .agg(count(lit(1)).as("n"))
      .join(broadcast(perSource), "source")
      .select(col("source"), col("reason"), col("n"), col("n_src"),
        expr("(n * 1000000) div n_src").as("share_ppm"))
      .orderBy("source", "reason")
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

  /** Corpus heavy-hitter tokens: a mergeable Misra-Gries sketch proposes
    * candidates under O(cap) memory per task, then ONE exact counting
    * pass over just those candidates verifies — output is every token
    * with frequency strictly above total/denom, with its exact count.
    *
    * Determinism: the sketch's surviving SET is partitioning-dependent,
    * but the PODS'12 bound guarantees it contains every token above
    * N/(cap+1) < N/denom, and the exact re-count filters the rest — so
    * the final relation is bit-stable on any partitioning (the same
    * sketch-proposes / exact-disposes composition as the Bloom dedup
    * gate). Scale shape: the sketch pass is a typed partial aggregate
    * (map-side MG summaries merged up, never a vocabulary shuffle); the
    * verify pass semi-joins the ≤cap-row broadcast candidate list BEFORE
    * its groupBy, so the exact shuffle carries only candidate tokens;
    * the 1-row total rides the allowlisted broadcast-crossJoin shape.
    * On this testdata the 31-token vocabulary never saturates the
    * cap=1000 summary (no decrements fire); the decrement/merge-cut
    * mechanics are pinned by GraftProperties on Zipf fixtures with
    * vocab >> cap. */
  def tokenHeavyHitters(documents: DataFrame, denom: Int = 500, cap: Int = 1000): DataFrame = {
    val spark = documents.sparkSession
    val toks = documents
      .select(explode(split(normText(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val mg = udaf(new MisraGriesAggregator(cap))
    val candidates = toks.agg(mg(col("tok")).as("cand")).head().getSeq[String](0)
    val cand = spark.createDataFrame(candidates.map(Tuple1(_))).toDF("tok")
    val total = toks.agg(count(lit(1)).as("total"))
    toks.join(broadcast(cand), Seq("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * denom > col("total"))
      .select(col("tok"), col("n"), col("total"))
      .orderBy(col("n").desc, col("tok"))
  }

  /** Gopher-style repetition signals per document: token volume, distinct
    * tokens, repeated-token fraction and the single most frequent token's
    * share (integer percentages — engine-exact). High repetition / high
    * top-share flags boilerplate and degenerate generations in a
    * training-data quality pass. Two-phase shape: the (doc_id, token)
    * count aggregates map-side before any shuffle, and the per-doc rollup
    * groups on doc_id — both keyed finer than the corpus, so no hot
    * partition at any scale. */
  def repetitionSignals(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("mx"))
      .select(col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_distinct").cast("long").as("n_distinct"),
        expr("(100 * (n_tokens - n_distinct)) div greatest(n_tokens, 1)").as("repetition_pct"),
        expr("(100 * mx) div greatest(n_tokens, 1)").as("top_token_share_pct"))
      .orderBy("doc_id")

  /** PII scrubbing stats over every text-bearing field: match counts per
    * pattern class plus the redaction length delta. chars_redacted ==
    * chars on a clean corpus is the no-false-positive proof (and exactly
    * what the synthetic tables should show); the scrub itself is
    * [[graft.functions.TextFunctions.piiRedact]] — chained
    * regexp_replace, scan-shaped, zero shuffle beyond the tiny per-field
    * rollup. */
  def piiScrubStats(documents: DataFrame, events: DataFrame): DataFrame = {
    val fields = documents
      .select(lit("documents.text").as("field"), col("text").as("s"))
      .unionByName(events.select(lit("events.props").as("field"), col("props").as("s")))
    fields
      .groupBy(col("field"))
      .agg(
        count(lit(1)).as("n_rows"),
        sum(regexp_count(col("s"), lit(EmailRe))).cast("long").as("email_hits"),
        sum(regexp_count(col("s"), lit(Ipv4Re))).cast("long").as("ipv4_hits"),
        sum(regexp_count(col("s"), lit(PhoneRe))).cast("long").as("phone_hits"),
        sum(regexp_count(col("s"), lit(LongDigitRe))).cast("long").as("digit_run_hits"),
        sum(length(col("s"))).cast("long").as("chars"),
        sum(length(piiRedact(col("s")))).cast("long").as("chars_redacted"))
      .orderBy("field")
  }

  /** Distinctive terms per source: integer TF-IDF-style score
    * (tf × 1e6 div corpus df) ranking the tokens that characterize each
    * source against the whole corpus — the mixture-debugging view of a
    * training-data pipeline ("what is src7 actually full of?"). The
    * ranking window reads the aggregated (source, token) table — bounded
    * by sources × vocabulary, never corpus-sized — and the tf/df join
    * shuffles on the token key. */
  def distinctiveTerms(documents: DataFrame, k: Int = 5): DataFrame = {
    val toks = documents
      .select(col("source"), col("doc_id"),
        explode(split(normText(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
    // shared base: one explode + ONE shuffle on (tok, source, doc_id),
    // consumed by both rollups — the branches' first exchange is the same
    // canonical subplan, so Spark plans a ReusedExchange instead of
    // scanning and exploding the corpus twice (asserted in PlanShapeSpec).
    // df counts docs with >= 1 occurrence — referencing c keeps the base
    // aggregate un-pruned and therefore canonically identical in both
    // branches ((tok, doc_id) is already distinct in the base: a doc has
    // exactly one source).
    val base = toks.groupBy(col("tok"), col("source"), col("doc_id"))
      .agg(count(lit(1)).as("c"))
    val tf = base.groupBy(col("source"), col("tok")).agg(sum(col("c")).as("tf"))
    val df = base.groupBy(col("tok"))
      .agg(count(when(col("c") > 0, lit(1))).as("df"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("score_ppm").desc, col("tok"))
    tf.join(df, "tok")
      .withColumn("score_ppm", expr("(tf * 1000000) div df"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("source"), col("rk"), col("tok"), col("tf"), col("df"), col("score_ppm"))
      .orderBy("source", "rk")
  }

  /** Per-source length-distribution stats with integer-exact moments and
    * 2σ outlier counts: mean and population variance computed from the
    * exact integer sums (Σx, Σx²) with cross-multiplied comparisons —
    * (n·x − Σx)² > 4·(n·Σx² − (Σx)²) ⇔ |x − μ| > 2σ — so no float ever
    * enters and the result is bit-stable across engines and
    * partitionings. Two-pass plan: tiny per-source moment table,
    * broadcast back over the scan.
    *
    * The moments and products run in 128-bit integer arithmetic
    * (DECIMAL(38,0)): the squared deviation is ≈ (n·c)² for n rows of c
    * chars per source, which overflows a long already at n ≈ 3·10⁹
    * thousand-char docs; DECIMAL(38) stays exact through n ≈ 10¹² rows
    * of 10⁵-char docs (dev² ≈ 10³⁴ < 10³⁸). Same plan, wider type — the
    * output schema is unchanged (integral division returns long, counts
    * cast back). */
  def lengthOutlierStats(documents: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val stats = documents.groupBy(col("source")).agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("n_chars").cast(dec)).as("s1"),
      sum(col("n_chars").cast(dec) * col("n_chars").cast(dec)).as("s2"))
    documents.select(col("source"), col("n_chars").cast(dec).as("n_chars"))
      .join(broadcast(stats), "source")
      .withColumn("dev", col("n") * col("n_chars") - col("s1"))
      .withColumn("nvar", col("n") * col("s2") - col("s1") * col("s1"))
      .groupBy(col("source"), col("n"), col("s1"), col("s2"))
      .agg(
        sum(when(col("dev") > 0 && col("dev") * col("dev") > lit(4) * col("nvar"), 1)
          .otherwise(0)).as("n_over_2sd"),
        sum(when(col("dev") < 0 && col("dev") * col("dev") > lit(4) * col("nvar"), 1)
          .otherwise(0)).as("n_under_2sd"))
      .select(col("source"),
        col("n").cast("long").as("n_docs"),
        expr("(1000 * s1) div n").as("mean_chars_milli"),
        expr("(1000 * (n * s2 - s1 * s1)) div (n * n)").as("var_chars_milli"),
        col("n_over_2sd").cast("long").as("n_over_2sd"),
        col("n_under_2sd").cast("long").as("n_under_2sd"))
      .orderBy("source")
  }

  /** Mixture reweighting — given the observed per-source doc counts,
    * the integer weight each source's docs need for every source to
    * contribute equally to the training mix (weight_milli =
    * 1000·total ÷ (n_sources·n)). The inverse view of
    * [[stratifiedSample]]: sample rates DOWN to a mixture, weights scale
    * a loss UP to one. Integer-exact; the per-source table is tiny and
    * the corpus is touched once. */
  def mixtureWeights(documents: DataFrame): DataFrame = {
    val stats = documents.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val totals = stats.agg(
      sum(col("n")).as("total"), count(lit(1)).as("n_sources"))
    stats.crossJoin(broadcast(totals))
      .select(col("source"),
        col("n").cast("long").as("n_docs"),
        expr("(n * 1000000) div total").as("actual_ppm"),
        expr("(total * 1000) div (n_sources * n)").as("weight_milli"))
      .orderBy("source")
  }

  /** Temperature-scaled mixture sampling (α = 0.5) — the standard
    * multi-source training mix: target share per source ∝ n^α, which
    * UPWEIGHTS tail sources relative to their raw counts without
    * replicating documents (pure downsampling; the head sources give up
    * docs until the α-mix is met). The achievable mixture size is bounded
    * by the scarcest source relative to its target share —
    * m_total = min_s (n_s / share_s) — and each source keeps
    * k_s = m_total·share_s docs via the same deterministic md5-ppm
    * hash-threshold as [[stratifiedSample]]: a pure map-filter against a
    * broadcast per-source rate table, scan-shaped at any corpus size.
    *
    * Engine-exact by construction: α = 0.5 is IEEE-754 sqrt — correctly
    * rounded, so bit-identical across engines — immediately scaled to an
    * integer (floor·1000) so every downstream step (share_ppm, m_total,
    * k, rate_ppm) is integer arithmetic with no float-summation order
    * anywhere. The keep decision compares a 5-nibble md5 ppm against the
    * source's rate, so membership is a pure function of (source, doc_id),
    * stable under corpus growth — the same reproducibility contract as
    * [[stratifiedSample]] and [[splitAssign]]. The kept count per source
    * is the binomial realization of rate_ppm, not exactly k_s — accepted
    * and disclosed, as for every hash-threshold sampler here. */
  def temperatureSample(documents: DataFrame): DataFrame = {
    val stats = documents.groupBy(col("source")).agg(count(lit(1)).as("n"))
    val w = stats.withColumn("w_milli", floor(sqrt(col("n")) * 1000).cast("long"))
    val tot = w.agg(sum(col("w_milli")).as("w_total"))
    val shares = w.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("(w_milli * 1000000) div w_total"))
    // a source rounded to 0 ppm contributes nothing and must not bound
    // the mixture (and would divide by zero below)
    val mTot = shares.filter(col("share_ppm") > 0)
      .agg(min(expr("(n * 1000000) div share_ppm")).as("m_total"))
    val rates = shares.crossJoin(broadcast(mTot))
      .withColumn("rate_ppm",
        when(col("share_ppm") === 0, lit(0L)).otherwise(
          least(lit(1000000L), expr("(((m_total * share_ppm) div 1000000) * 1000000) div n"))))
      .select(col("source"), col("rate_ppm"))
    documents
      .withColumn("hp",
        conv(substring(md5(concat_ws(":", col("source"), col("doc_id"))), 1, 5), 16, 10)
          .cast("long") % 1000000)
      .join(broadcast(rates), "source")
      .filter(col("hp") < col("rate_ppm"))
      .select(col("doc_id"), col("source"), col("rate_ppm"))
      .orderBy("doc_id")
  }

  /** Per-source document cap — the RefinedWeb-style anti-spam guard: no
    * source may contribute more than `cap` documents, keepers chosen in
    * deterministic md5-hash order (a seeded uniform draw, so the cap is
    * a fair sample, not a doc_id-ordered prefix that would bias toward
    * old documents).
    *
    * Two-phase so it scales: an exact per-source row_number at 100 TB
    * puts an entire source — possibly most of the corpus — on one
    * reducer. Phase 1 is the scan-shaped hash-threshold prefilter at
    * rate ≈ SourceCapSafety·cap/n (keep-all when n is already within the
    * safety budget), which bounds the window input to ~SourceCapSafety·cap
    * rows per source; phase 2 ranks the survivors (row_number over the
    * same md5 order) and keeps rank ≤ cap. Because the prefilter keeps
    * exactly the LOW end of the hash order, the survivors contain the
    * true cap-smallest hashes whenever the binomial draw yields ≥ cap
    * survivors — at safety 4× that failure probability is exp(−Ω(cap));
    * if it ever fires, the source contributes the survivors it has
    * (disclosed; the oracle replicates both phases bit-for-bit, so the
    * result is deterministic either way). */
  val SourceCapSafety = 4

  def sourceCap(documents: DataFrame, cap: Int = 10): DataFrame = {
    val rates = documents.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("rate_ppm",
        least(lit(1000000L), expr(s"(${SourceCapSafety.toLong * cap} * 1000000) div n")))
      .select(col("source"), col("rate_ppm"))
    val w = Window.partitionBy(col("source")).orderBy(col("hp"), col("doc_id"))
    documents
      .withColumn("hp",
        conv(substring(md5(concat_ws(":", col("source"), col("doc_id"))), 1, 5), 16, 10)
          .cast("long") % 1000000)
      .join(broadcast(rates), "source")
      .filter(col("hp") < col("rate_ppm"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= cap)
      .select(col("doc_id"), col("source"), col("rk"))
      .orderBy("doc_id")
  }

  /** Boilerplate detector: the word-3-gram shingles appearing in the
    * most documents (df > 1). Repeated passages across docs are
    * navigation chrome / license headers / template text — the strings a
    * cleaning pass strips. Bounded output: vocabulary-keyed aggregate →
    * TakeOrdered top-k. */
  def topRepeatedShingles(documents: DataFrame, k: Int = 20): DataFrame =
    Dedup.shingles(documents)
      .groupBy(col("g").as("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > 1)
      .orderBy(col("df").desc, col("shingle"))
      .limit(k)

  /** Holdout percentages for [[splitAssign]] (hash buckets 0..TestPct-1 →
    * test, next ValidPct → valid, rest → train). */
  val TestPct = 10
  val ValidPct = 10

  /** Salted md5 hash bucket in [0, 100) over an arbitrary key column —
    * the one split-assignment primitive both [[splitAssign]] (keyed by
    * doc_id) and [[leakageSafeSplit]] (keyed by near-dup cluster rep)
    * share, so the two splits agree wherever leakage lets them. */
  private[graft] def splitBucket(key: Column): Column =
    conv(substring(md5(concat_ws(":", lit("split"), key)), 1, 4), 16, 10)
      .cast("long") % 100

  private[graft] def splitOf(bucket: Column): Column =
    when(bucket < TestPct, lit("test"))
      .when(bucket < TestPct + ValidPct, lit("valid"))
      .otherwise(lit("train"))

  /** Deterministic train/valid/test assignment — the holdout-discipline
    * operator of a training-data pipeline: each doc's split is an md5 hash
    * bucket of a salted doc_id, so the assignment is reproducible across
    * runs, engines, partitionings, AND corpus growth (a doc never changes
    * split when new docs arrive — the property rand()-based splitting
    * loses). The salt ("split:") decorrelates these buckets from
    * [[stratifiedSample]]'s, so sampling and splitting compose without
    * bias. Pure map: pushes to the scan, no shuffle, any scale. */
  def splitAssign(documents: DataFrame): DataFrame =
    documents
      .withColumn("hb", splitBucket(col("doc_id")))
      .withColumn("split", splitOf(col("hb")))

  /** Per-(split, source) roll-up of [[splitAssign]]: doc and token volumes
    * per holdout cell — the table a pipeline checks before training to
    * confirm the holdout actually covers every source. */
  def trainTestSplit(documents: DataFrame): DataFrame =
    splitAssign(documents)
      .groupBy(col("split"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).cast("long").as("total_tokens"))
      .select(col("split"), col("source"),
        col("n_docs").cast("long").as("n_docs"), col("total_tokens"))
      .orderBy("split", "source")

  /** Leakage-safe holdout: [[splitAssign]] hashes each doc independently,
    * so two NEAR-DUPLICATE docs can land on opposite sides of the
    * train/test fence — the eval set then scores memorization, not
    * generalization (the classic train-test contamination failure that
    * benchmark decontamination papers warn about, here applied to the
    * corpus's own holdout). This variant keys the hash bucket by the
    * doc's near-dup CLUSTER REPRESENTATIVE ([[Dedup.dedupClusters]] —
    * MinHash pair graph → large-star/small-star components), so an entire
    * near-dup family always shares one split; singleton docs key by their
    * own doc_id, which makes this split IDENTICAL to [[splitAssign]]'s
    * everywhere leakage permits (same salt, same buckets — only clustered
    * docs can move).
    *
    * Output is the per-(split, source) audit roll-up: doc/token volumes
    * plus `n_clustered` (docs that belong to any near-dup family) and
    * `n_moved` (clustered docs whose naive per-doc split differs from
    * their family's split — the volume of holdout leakage the naive
    * assignment would have shipped).
    *
    * Scale: the cluster map is |paired docs| rows of two longs — orders
    * of magnitude smaller than the corpus (near-dup families are sparse);
    * the join is an equi-join on doc_id that AQE broadcasts while the map
    * fits and shuffles 16-byte keys beyond that. The hash/bucket/roll-up
    * is the same scan-shaped arithmetic as [[trainTestSplit]]. */
  def leakageSafeSplit(documents: DataFrame): DataFrame = {
    val members = Dedup.dedupClusters(documents)
      .select(col("doc_id"), col("cluster_rep"))
    documents
      .select(col("doc_id"), col("source"), col("text"))
      .join(members, Seq("doc_id"), "left_outer")
      .withColumn("split", splitOf(splitBucket(coalesce(col("cluster_rep"), col("doc_id")))))
      .withColumn("naive_split", splitOf(splitBucket(col("doc_id"))))
      .groupBy(col("split"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(col("text"))).cast("long").as("total_tokens"),
        sum(when(col("cluster_rep").isNotNull, 1L).otherwise(0L)).as("n_clustered"),
        sum(when(col("cluster_rep").isNotNull && col("split") =!= col("naive_split"), 1L)
          .otherwise(0L)).as("n_moved"))
      .select(col("split"), col("source"),
        col("n_docs").cast("long").as("n_docs"), col("total_tokens"),
        col("n_clustered").cast("long").as("n_clustered"),
        col("n_moved").cast("long").as("n_moved"))
      .orderBy("split", "source")
  }

  /** Context-window chunking for [[chunkDocuments]]: window width and
    * stride in whitespace tokens (width > stride ⇒ adjacent chunks
    * overlap by width − stride tokens, the standard training-prep shape
    * so no span is ever split across a window boundary unseen). Shared
    * with the oracle SQL generator so both engines cut identically. */
  val ChunkWidth  = 64
  val ChunkStride = 48

  /** Fixed-token-window chunking with stride — the operator that turns
    * variable-length documents into model-context-sized training rows
    * (every LLM data pipeline runs this between curation and shard
    * packing). Chunk i of a doc covers tokens [i·stride, i·stride+width)
    * of the doc's \S+ token sequence (same tokenizer as
    * [[TextFunctions.tokenCount]]); chunks start while i·stride < n, so
    * the tail chunk may be short but no token is dropped. Emits the chunk
    * fingerprint (md5 of the space-joined window) rather than the window
    * text — chunk-level exact dedup composes directly ([[Dedup.exact]]
    * over the fingerprints finds cross-doc recycled windows).
    *
    * Scale: pure per-row explode — tokenize, `sequence` over the chunk
    * count, `slice` per chunk — all codegen'd builtins inside one
    * whole-stage-codegen span, no shuffle (the orderBy is this query's
    * oracle-hash determinism, not the operator's). Output rows ≈
    * corpus_tokens / stride, the same order as the shard-packing input it
    * feeds. */
  def chunkDocuments(documents: DataFrame,
                     width: Int = ChunkWidth,
                     stride: Int = ChunkStride): DataFrame =
    documents
      .select(col("doc_id"),
        regexp_extract_all(col("text"), lit("\\S+"), lit(0)).as("toks"))
      .withColumn("n", size(col("toks")))
      .filter(col("n") > 0)
      .withColumn("chunk_id",
        explode(sequence(lit(0), floor((col("n") - 1) / lit(stride)).cast("int"))))
      .select(
        col("doc_id"),
        col("chunk_id").cast("long").as("chunk_id"),
        size(slice(col("toks"), col("chunk_id") * stride + 1, lit(width)))
          .cast("long").as("n_chunk_tokens"),
        md5(array_join(slice(col("toks"), col("chunk_id") * stride + 1, lit(width)), " "))
          .as("chunk_fp"))
      .orderBy("doc_id", "chunk_id")

  /** Winnowing geometry ([[winnowFingerprints]]): token k-grams hashed
    * with an integer Karp–Rabin chain (base/modulus chosen so every
    * intermediate stays < 2^52 — exact in int64 AND in the oracle's
    * arithmetic), minima selected over windows of `WinnowW` consecutive
    * hashes. Shared with the oracle generator. */
  val WinnowK = 4
  val WinnowW = 4
  val WinnowB = 1000003L
  val WinnowM = 2147483647L

  /** ROLLING-HASH document fingerprinting — winnowing (Schleimer,
    * Wilkerson & Aiken, SIGMOD'03, public literature): hash every
    * k-token gram with a Karp–Rabin-style integer chain, then select
    * the minimum hash in each window of `w` consecutive gram hashes
    * (leftmost minimum on ties), and keep the distinct (position, hash)
    * selections as the document's fingerprint set. The local-selection
    * property is what whole-doc md5 ([[fingerprints]]) can't give:
    * ANY shared token run of length ≥ w + k − 1 guarantees at least one
    * shared selected hash VALUE between two documents (spec-pinned on a
    * planted-run fixture), at ~n/w fingerprints per doc instead of n
    * gram hashes — the MOSS-style local similarity index, density
    * tunable by w.
    *
    * Emits one bounded summary row per doc — gram count, selection
    * count, and the XOR / min / max folds of the selected hashes (XOR
    * is order-independent, so the row is partitioning-stable and
    * engine-exact); docs shorter than w + k − 1 tokens have no full
    * selection window and emit no row by contract. Scale: pure per-row
    * array arithmetic inside the scan (token ints → hash chain →
    * window minima), no shuffle beyond the final per-doc projection —
    * text never leaves the scan un-hashed. */
  def winnowFingerprints(documents: DataFrame, k: Int = WinnowK,
                         w: Int = WinnowW): DataFrame =
    winnowSelections(documents, k, w)
      .select(col("doc_id"),
        size(col("h")).cast("long").as("n_kgrams"),
        size(col("sel")).cast("long").as("n_fps"),
        expr(s"aggregate(sel, 0L, (a, x) -> a ^ (x % $WinnowPosScale))").as("fp_xor"),
        expr(s"array_min(transform(sel, x -> x % $WinnowPosScale))").as("fp_min"),
        expr(s"array_max(transform(sel, x -> x % $WinnowPosScale))").as("fp_max"))
      .orderBy("doc_id")

  /** The exploded (doc_id, pos, fp) fingerprint relation — the
    * join-able form for MOSS-style local matching (two docs sharing a
    * fingerprint VALUE share a k-gram somewhere; the winnowing theorem's
    * guarantee is spec-pinned over this relation). */
  def winnowFingerprintRows(documents: DataFrame, k: Int = WinnowK,
                            w: Int = WinnowW): DataFrame =
    winnowSelections(documents, k, w)
      .select(col("doc_id"), explode(col("sel")).as("s"))
      .select(col("doc_id"),
        expr(s"s div $WinnowPosScale").as("pos"),
        expr(s"s % $WinnowPosScale").as("fp"))

  /** Selections travel as ONE int64 — pos · 2^31 + fp (fp < WinnowM <
    * 2^31, pos bounded by doc length, the product far under 2^63):
    * structs would be the natural shape, but DuckDB's list_distinct
    * can't dedupe struct lists, and a packed integer dedupes and
    * decodes identically in both engines. */
  private val WinnowPosScale = 2147483648L

  private def winnowSelections(documents: DataFrame, k: Int, w: Int): DataFrame = {
    val (b, m) = (WinnowB, WinnowM)
    // Karp-Rabin chain over the k token-ints at gram position i
    val chain = (1 until k).foldLeft(s"element_at(ti, i) % $m") {
      (acc, j) => s"(($acc) * $b + element_at(ti, i + $j)) % $m"
    }
    documents
      .select(col("doc_id"), split(normText(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= k + w - 1)
      // token → 32-bit int via the first 8 md5 nibbles (the same
      // engine-portable trick as the hashing-TF bucket)
      .withColumn("ti",
        expr("transform(toks, t -> CAST(conv(substring(md5(t), 1, 8), 16, 10) AS BIGINT))"))
      .withColumn("h", expr(s"transform(sequence(1, size(ti) - ${k - 1}), i -> $chain)"))
      .withColumn("sel", expr(
        s"""array_distinct(transform(sequence(1, size(h) - ${w - 1}), j ->
           |  (j - 1 + array_position(slice(h, j, $w), array_min(slice(h, j, $w)))) * $WinnowPosScale
           |    + array_min(slice(h, j, $w))))""".stripMargin))
  }

  /** Chunk-level exact dedup — the composition [[chunkDocuments]]'s
    * fingerprints exist for: context windows recycled ACROSS documents
    * (quote chains, boilerplate, licence blocks re-flowed into otherwise
    * distinct docs — visible at window grain even when whole-doc
    * fingerprints all differ). One row per fingerprint shared by more
    * than one distinct doc: distinct-doc count, total occurrences
    * (within-doc repeats included), and the lowest carrying doc as the
    * canonical witness. Scale shape: the chunk explode is scan-side
    * ([[chunkDocuments]] — its oracle-ordering sort is eliminated under
    * this aggregate), then one 16-byte-keyed two-phase aggregate — the
    * exact-dedup class, text never shuffles. */
  def chunkDedup(documents: DataFrame, width: Int = ChunkWidth,
                 stride: Int = ChunkStride): DataFrame =
    chunkDocuments(documents, width, stride)
      .groupBy(col("chunk_fp"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") > 1)
      .select(col("chunk_fp"), col("n_docs").cast("long").as("n_docs"),
        col("n_occurrences").cast("long").as("n_occurrences"),
        col("first_doc").cast("long").as("first_doc"))
      .orderBy("chunk_fp")

  /** Hashed-TF vector dimension for [[hashedTfCounts]]/[[lexicalAnn]] —
    * the hashing-trick dimension (collisions disclosed, same stance as
    * QualityModel.FeatureDim). */
  val HashVecDim = 64

  /** Feature-hashed term-frequency rows: (doc_id, bucket, cnt) where
    * bucket = first-4-md5-nibbles(token) mod [[HashVecDim]] — the
    * engine-portable hashing trick that turns TEXT into a fixed-dim
    * count vector with no vocabulary artifact at all. This is the bridge
    * from the documents table into the whole vector family: lexical ANN
    * ([[lexicalAnn]]), and at scale the IVF/PQ layouts, apply to text
    * corpora without an external embedding model. Sparse output (only
    * non-zero buckets), scalar columns — scan + one integer-keyed
    * aggregate, text never shuffles. Token-less (null/empty) docs have
    * no rows by contract. */
  def hashedTfCounts(documents: DataFrame, dim: Int = HashVecDim): DataFrame =
    documents
      .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long") % dim).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("doc_id"), col("bucket"), col("cnt").cast("long").as("cnt"))
      .orderBy("doc_id", "bucket")

  /** Lexical ANN: cosine top-k over the hashed-TF count vectors —
    * similar-document retrieval with zero model dependencies (the
    * classic hashing-trick/TF baseline). Densifies the sparse counts to
    * `array<double>` and reuses [[Similarity.bruteForceTopK]] unchanged
    * (broadcast query set, salted two-stage top-k, one corpus scan).
    *
    * Oracle-exactness note: every vector component is an integer COUNT,
    * so dot products and norms are integer-exact in both engines no
    * matter the accumulation order (doubles represent ≤2^53 integers
    * exactly) — the DuckDB oracle can use plain SQL sums over the sparse
    * rows plus one final double divide/sqrt, and still match the
    * codegen'd cosine bit-for-bit. */
  def lexicalAnn(documents: DataFrame, nQueries: Int = 5, k: Int = 3,
                 dim: Int = HashVecDim): DataFrame =
    Similarity.bruteForceTopK(lexicalVectors(documents, dim), nQueries, k)

  /** The hashed-TF counts densified to `(vec_id, embedding)` — the exact
    * input shape of the [[Similarity]] family, so documents flow into ANY
    * of its paths (brute force here, the persisted IVF/PQ layouts in
    * [[lexicalAnnPq]]) unchanged. `float` elements on purpose: counts are
    * small integers (exact in float32 up to 2^24), and float is the
    * vector family's storage type, so the persisted index layouts hold
    * text-derived and model-embedding vectors identically. */
  def lexicalVectors(documents: DataFrame, dim: Int = HashVecDim): DataFrame =
    hashedTfCounts(documents, dim)
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("cnt")))).as("m"))
      .select(col("doc_id").as("vec_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          i => coalesce(element_at(col("m"), i.cast("long")), lit(0L)).cast("float"))
          .as("embedding"))

  /** The oracle-model slot [[lexicalAnnPq]] trains into — named so the
    * document-vector quantizer/books never degrade the embeddings
    * table's own IVF/PQ oracle slots (see [[Similarity.slotQuantizer]]). */
  val LexicalSlot = "doclex"

  /** Lexical ANN through the PERSISTED IVF-PQ index — the composition a
    * 100 TB text corpus actually runs: text → hashed-TF vectors
    * ([[lexicalVectors]], no vocabulary or embedding model) → cell-
    * partitioned PQ layout on storage ([[Similarity.savePqIndex]]) →
    * partition-pruned codes-only ADC search with exact re-rank
    * ([[Similarity.pqSearchIndexed]]). The index build is the once-per-
    * snapshot cost (one scan + partitioned write); every search after it
    * reads nProbe/nCells of the bytes and scans 8-byte code rows, not
    * 256-byte vectors. Deterministic end to end — the DuckDB oracle
    * inlines the slot's quantizer + codebooks and replicates the dense
    * vectors, encoding, ADC, refine, and re-rank bit-for-bit (the
    * [[HashVecDim]] = 64 geometry matches the PQ 8×8 layout exactly). */
  def lexicalAnnPq(documents: DataFrame, indexPath: String,
                   nQueries: Int = 5, k: Int = 3): DataFrame = {
    // materialize the dense vectors ONCE: the build consumes this
    // relation four times (two bounded model-sample collects, the
    // cell-partitioned write, the query-set scan), and without the
    // checkpoint each consumer re-runs the tokenize + aggregate over the
    // corpus — measured 11.8 s → ~6 s at sf0.1 for the registered query.
    // The materialized relation is (nDocs × dim) floats — index-sized
    // (the thing being persisted anyway), never wider than the write it
    // feeds; at 100 TB the build is a once-per-snapshot job where this
    // staging is exactly what a pipeline would persist first.
    val vecs = lexicalVectors(documents).pinned()
    Similarity.savePqIndex(vecs, indexPath, slot = LexicalSlot)
    Similarity.pqSearchIndexed(documents.sparkSession, indexPath,
      vecs.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("query_id"), col("embedding")), k)
  }

  /** The oracle-model slot [[docTopicClusters]] trains into — its OWN
    * slot (not [[LexicalSlot]]) because its un-checkpointed vector plan
    * canonicalizes differently from [[lexicalAnnPq]]'s checkpointed one,
    * and two distinct keys in one slot would degrade BOTH oracles to
    * rows-only (the slot ambiguity guard doing its job). */
  val TopicSlot = "doclex_topics"

  /** Unsupervised TOPIC CLUSTERING of the corpus — k-means over the
    * hashed-TF document vectors (the same session-trained spherical
    * quantizer the IVF family uses, trained on [[lexicalVectors]]), each
    * cluster summarized by its size and its top-k DISTINCTIVE tokens
    * (in-cluster tf × 10⁶ div corpus df — the [[distinctiveTerms]] score
    * with clusters standing in for sources). The corpus-exploration /
    * mixture-design view: what is actually IN this corpus, in machine
    * terms, before anyone weights it.
    *
    * Scale shape: cluster assignment is one broadcast-centroid codegen
    * map pass (no shuffle); the token side is one explode feeding a
    * (cell, token) two-phase agg after a doc_id-keyed join with the
    * narrow assignment relation; the score join is between
    * vocabulary-bounded aggregates, the ranking window reads the
    * (cell, token) aggregate (vocab-bounded per cell, Spark 4 prunes to
    * top-k map-side), and cluster sizes are an nCells-row join. */
  def docTopicClusters(documents: DataFrame, k: Int = 3, nCells: Int = 16): DataFrame = {
    val vecs = lexicalVectors(documents)
    val model = Similarity.quantizerFor(vecs, nCells, slot = TopicSlot)
    if (model.isEmpty) {
      import org.apache.spark.sql.types._
      return documents.sparkSession.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(StructField("cell", LongType), StructField("n_docs", LongType),
          StructField("rk", LongType), StructField("tok", StringType),
          StructField("tf", LongType), StructField("df", LongType),
          StructField("score_ppm", LongType))))
    }
    val asg = Similarity.withCell(vecs, model)
      .select(col("vec_id").as("doc_id"), col("cell").cast("long").as("cell"))
    val toks = documents
      .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = toks.join(asg, "doc_id")
      .groupBy(col("cell"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfRel = toks.groupBy(col("tok")).agg(countDistinct(col("doc_id")).as("df"))
    val w = Window.partitionBy(col("cell")).orderBy(col("score_ppm").desc, col("tok"))
    val sizes = asg.groupBy(col("cell")).agg(count(lit(1)).as("n_docs"))
    tf.join(dfRel, "tok")
      .withColumn("score_ppm", expr("(tf * 1000000) div df"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .join(sizes, "cell")
      .select(col("cell"), col("n_docs"), col("rk"), col("tok"),
        col("tf").cast("long").as("tf"), col("df").cast("long").as("df"),
        col("score_ppm"))
      .orderBy("cell", "rk")
  }

  /** Snapshot diff — the dataset-versioning audit between two corpus
    * snapshots: per source, how many docs were ADDED (doc_id new),
    * REMOVED (doc_id gone), CHANGED (same doc_id, different content
    * fingerprint), and UNCHANGED. The table a pipeline prints before
    * retraining on a refreshed crawl: an unexpected removal or change
    * volume is a upstream-feed regression, not training signal.
    *
    * Scale: one full-outer equi-join on doc_id carrying 16-byte md5
    * fingerprints — text never shuffles; the roll-up is a bounded
    * per-source aggregate. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    // presence flags, not fp-nullness, decide added/removed — a null-text
    // doc has a null fingerprint but is still PRESENT in its snapshot;
    // change detection is the null-safe fp comparison for the same reason
    val o = oldDocs.select(col("doc_id"), col("source").as("osrc"),
      fingerprint(col("text")).as("ofp"), lit(true).as("in_old"))
    val n = newDocs.select(col("doc_id"), col("source").as("nsrc"),
      fingerprint(col("text")).as("nfp"), lit(true).as("in_new"))
    o.join(n, Seq("doc_id"), "full_outer")
      .groupBy(coalesce(col("nsrc"), col("osrc")).as("source"))
      .agg(
        sum(when(col("in_old").isNull, 1L).otherwise(0L)).as("n_added"),
        sum(when(col("in_new").isNull, 1L).otherwise(0L)).as("n_removed"),
        sum(when(col("in_old").isNotNull && col("in_new").isNotNull &&
          !(col("ofp") <=> col("nfp")), 1L).otherwise(0L)).as("n_changed"),
        sum(when(col("in_old").isNotNull && col("in_new").isNotNull &&
          (col("ofp") <=> col("nfp")), 1L).otherwise(0L)).as("n_unchanged"))
      .select(col("source"),
        col("n_added").cast("long").as("n_added"),
        col("n_removed").cast("long").as("n_removed"),
        col("n_changed").cast("long").as("n_changed"),
        col("n_unchanged").cast("long").as("n_unchanged"))
      .orderBy("source")
  }

  /** Documents per doc-range block for [[packShards]]: bounds every
    * packing window partition, so no task ever buffers more than this many
    * rows regardless of corpus size. */
  val PackBlockDocs = 1000L

  /** Default shard token budget for [[packShards]] (shared with the
    * oracle SQL generator so both engines pack identically). */
  val PackBudgetTokens = 2000L

  /** Token-budget shard packing — split each source's doc stream into
    * training shards of ≈ `budget` tokens, next-fit by running offset:
    * shard = (tokens before this doc) div budget, docs in doc_id order.
    * The running sum is windowed per (source, doc-range block of
    * [[PackBlockDocs]]), NOT per source: a source at 100 TB is unbounded,
    * a block is ≤ PackBlockDocs docs, so the sort/window buffer is bounded
    * and blocks pack independently in parallel (shard ids are per-block —
    * exactly how a distributed shard writer hands contiguous ranges to
    * workers). Deterministic and integer-exact, so fully oracle-checked. */
  /** Shared packing core: running token offset → shard id over a
    * (source, block)-bounded window. `base` must carry (doc_id, source,
    * block_id, toks) plus whatever payload the caller wants through the
    * window exchange — the stats query passes no text, the shard writer
    * passes text so it needs no second corpus join. */
  private def shardAssignCore(base: DataFrame, budget: Long): DataFrame = {
    val w = Window.partitionBy(col("source"), col("block_id")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("cum", sum(col("toks")).over(w))
      .withColumn("shard_id", expr(s"(cum - toks) div $budget"))
  }

  /** Per-doc shard assignment WITH the document payload — the input of
    * [[graft.sources.FileFormats.writeTrainingShards]]. */
  def shardAssign(documents: DataFrame, budget: Long = PackBudgetTokens): DataFrame =
    shardAssignCore(
      documents.select(col("doc_id"), col("text"), col("source"),
        expr(s"doc_id div $PackBlockDocs").as("block_id"),
        tokenCount(col("text")).cast("long").as("toks")),
      budget)
      .select(col("doc_id"), col("text"), col("source"), col("block_id"), col("shard_id"))

  /** Padding-waste comparison for training-batch assembly — the
    * efficiency question after [[packShards]] decides storage: a batch
    * pads every sequence to its longest member, so batching in shuffle
    * order (length-blind) wastes `Σ(max−len)` tokens of compute per
    * batch, and LENGTH-BUCKETED batching (group by ⌈len/bucket⌉, batch
    * within) is the standard fix. One row per strategy with exact
    * integer padded-token counts and a ppm waste share — the report
    * that justifies (or rejects) the bucketing complexity on a given
    * corpus.
    *
    * Scale shape: both strategies rank inside BOUNDED partitions —
    * shuffle order within md5-prefix buckets (the [[trainOrderShuffle]]
    * contract), length-bucketed within (len_bucket, [[PackBlockDocs]]
    * block) — so no global row_number anywhere; the roll-ups are
    * batch-count-bounded aggregates. Batch boundaries never cross a
    * partition (disclosed, same contract as shard packing: a trailing
    * partial batch per partition). */
  def batchPaddingStats(documents: DataFrame, batchSize: Int = 16,
                        lenBucketTokens: Int = 32): DataFrame = {
    val base = documents.select(col("doc_id"),
      md5(concat(col("doc_id").cast("string"), lit(":epoch-0"))).as("sk"),
      expr(s"doc_id div $PackBlockDocs").as("block_id"),
      tokenCount(col("text")).cast("long").as("toks"))
    val naive = base
      .withColumn("bucket", substring(col("sk"), 1, 2))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("bucket")).orderBy(col("sk"), col("doc_id"))).cast("long"))
      .withColumn("batch", expr(s"(pos - 1) div $batchSize"))
      .groupBy(col("bucket"), col("batch"))
      .agg(count(lit(1)).as("n"), max(col("toks")).as("mx"), sum(col("toks")).as("tot"))
    val bucketed = base
      .withColumn("len_bucket", expr(s"toks div $lenBucketTokens"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("len_bucket"), col("block_id")).orderBy(col("doc_id"))).cast("long"))
      .withColumn("batch", expr(s"(pos - 1) div $batchSize"))
      .groupBy(col("len_bucket"), col("block_id"), col("batch"))
      .agg(count(lit(1)).as("n"), max(col("toks")).as("mx"), sum(col("toks")).as("tot"))
    def roll(batches: DataFrame, name: String) =
      batches
        .agg(
          sum(col("n")).as("n_docs"),
          count(lit(1)).as("n_batches"),
          sum(col("tot")).as("total_tokens"),
          sum(col("n") * col("mx") - col("tot")).as("padded_tokens"))
        .select(lit(name).as("strategy"),
          col("n_docs").cast("long").as("n_docs"),
          col("n_batches").cast("long").as("n_batches"),
          col("total_tokens").cast("long").as("total_tokens"),
          col("padded_tokens").cast("long").as("padded_tokens"),
          expr("(padded_tokens * 1000000) div (total_tokens + padded_tokens)")
            .as("padding_ppm"))
    roll(bucketed, "length_bucketed")
      .unionByName(roll(naive, "shuffle_order"))
      .orderBy("strategy")
  }

  /** Deterministic TRAINING-ORDER shuffle — the randomization step
    * between curation and shard export: training wants the corpus in a
    * pseudorandom order decorrelated from ingest/source order (long runs
    * of one source bias gradients), re-drawable per epoch, and
    * reproducible across reruns. A real random shuffle can't be
    * checkpointed or audited; the standard trick is a HASH-keyed order:
    * shuffle_key = md5(doc_id ‖ salt), new salt per epoch = a fresh
    * permutation, same salt = bit-identical order on any engine
    * (DuckDB-oracle-checked).
    *
    * Scale shape: a global orderBy(shuffle_key) would range-exchange the
    * corpus and a global row_number would funnel it through one task —
    * instead the key's first `prefixLen` hex chars form 16^prefixLen
    * BUCKETS (the md5 prefix is uniform, so buckets are balanced by
    * construction), positions are ranked per bucket (bounded windows, no
    * global sort), and the total order is (bucket, pos). At 100 TB widen
    * prefixLen to 4 (65536 buckets ≈ corpus/65536 rows per window task);
    * the default 2 keeps the oracle output readable at test SF. One
    * codegen'd hash pass + one bounded-window shuffle — text never
    * moves; a training reader consumes (bucket, pos) order directly. */
  def trainOrderShuffle(documents: DataFrame, salt: String = "epoch-0",
                        prefixLen: Int = 2): DataFrame = {
    val w = Window.partitionBy(col("bucket")).orderBy(col("sk"), col("doc_id"))
    documents
      .select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(":" + salt))).as("sk"))
      .withColumn("bucket", substring(col("sk"), 1, prefixLen))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("bucket"), col("pos"), col("doc_id"))
      .orderBy("bucket", "pos")
  }

  def packShards(documents: DataFrame, budget: Long = PackBudgetTokens): DataFrame = {
    shardAssignCore(
      documents.select(col("doc_id"), col("source"),
        expr(s"doc_id div $PackBlockDocs").as("block_id"),
        tokenCount(col("text")).cast("long").as("toks")),
      budget)
      .groupBy(col("source"), col("block_id"), col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("toks")).as("shard_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .select(col("source"), col("block_id"), col("shard_id"),
        col("n_docs").cast("long").as("n_docs"),
        col("shard_tokens").cast("long").as("shard_tokens"),
        col("first_doc"), col("last_doc"))
      .orderBy("source", "block_id", "shard_id")
  }

  /** Per-doc token-RARITY signal — the integer-exact stand-in for an LM
    * perplexity filter (the CCNet-style "does this text look like the
    * corpus" gate, with no float log-prob anywhere): every token
    * occurrence scores its corpus-wide unigram probability in ppm
    * (integer div), and a doc reports its occurrence count, MEAN token
    * probability, and hapax count (tokens occurring exactly once in the
    * whole corpus). Low mean probability = text unlike the corpus
    * (gibberish, other languages, id soup); a high hapax share is the
    * same signal read from the tail. Plan at 100 TB: one token explode;
    * the frequency table is vocabulary-bounded; document text rides in
    * no shuffle. The score join is SKEW-PROOF by construction — a plain
    * hash join on `tok` would put every occurrence of "the" (a few
    * percent of ALL token occurrences under Zipf) on one reducer — via a
    * head/tail split: the [[HotVocab]] highest-frequency tokens (bounded
    * top-k, broadcastable regardless of corpus or vocabulary size) join
    * map-side with no shuffle of their occurrences, and only the tail —
    * where every key's occurrence count is ≤ the HotVocab-th largest,
    * i.e. the skew is capped by the split itself — takes the shuffle
    * join. The two branches are disjoint by key, so the union is exactly
    * the single-join result (oracle unchanged and green; the broadcast
    * shape is plan-asserted in PlanShapeSpec). */
  /** Size of the broadcast Zipf head in [[tokenRarity]]'s skew-proof
    * score join: a bounded top-k, so the broadcast is ≤ HotVocab
    * (tok, tf) rows — a few hundred KB — no matter how large the corpus
    * or its vocabulary grows. Anything hot enough to skew a reducer is
    * by definition in the head; every tail key's occurrence count is
    * capped at the head's smallest member. */
  val HotVocab = 10000

  def tokenRarity(documents: DataFrame): DataFrame = {
    val toks = documents
      .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val tf = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val total = tf.agg(sum(col("tf")).as("n_total"))
    // Zipf head: bounded top-k by frequency (TakeOrderedAndProject, ties
    // broken by token for determinism), broadcast to both branches
    val hot = broadcast(tf.orderBy(col("tf").desc, col("tok")).limit(HotVocab))
    val headScored = toks.join(hot, "tok")
    val tailScored = toks.join(hot.select(col("tok")), Seq("tok"), "left_anti").join(tf, "tok")
    headScored.unionByName(tailScored)
      .crossJoin(broadcast(total)) // one row: the corpus token count
      .withColumn("p_ppm", expr("(tf * 1000000) div n_total"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_toks"),
        expr("sum(p_ppm) div count(1)").as("mean_prob_ppm"),
        sum(when(col("tf") === 1, 1).otherwise(0)).cast("long").as("n_hapax"))
      .orderBy("doc_id")
  }

  /** Persist a REFERENCE token-frequency model — the artifact behind
    * [[tokenRarityAgainst]]'s online/incremental rarity gate: the corpus
    * unigram table `<name>_freq` (tok, tf; bucketed by token so the score
    * join hits a pre-bucketed scan) plus a one-row `<name>_meta` carrying
    * the total token count. The same model-artifact pattern as the IVF
    * quantizer and the dedup index: fit once per reference-corpus
    * snapshot, consumed by every later batch/stream without re-reading
    * the reference. */
  /** The reference unigram table (tok, tf) a rarity gate scores against. */
  def tokenFreqs(documents: DataFrame): DataFrame =
    documents
      .select(explode(split(normText(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("tok")).agg(count(lit(1)).as("tf"))

  /** `minTf` bounds the artifact's vocabulary — the lever that keeps the
    * score join's broadcast assumption true at any corpus size: a web
    * corpus's raw vocabulary is dominated by near-hapax junk whose
    * integer probability is 0 ppm anyway once n_total/1e6 > tf, so
    * cutting at such a minTf changes no mean_prob_ppm score — it only
    * reclassifies those tokens from "seen at 0 ppm" to "unseen" in
    * n_unseen (disclosed; the gate thresholds on mean probability).
    * n_total is computed over ALL occurrences, cut rows included, so
    * surviving probabilities are unchanged by the cut. Default 1 = no
    * cut (small-reference fidelity; the oracle mirrors it exactly). */
  def saveTokenFreqs(documents: DataFrame, name: String, buckets: Int = 8,
                     minTf: Long = 1L): Unit = {
    import graft.sources.FileFormats.writeBucketed
    val tf = tokenFreqs(documents)
    writeBucketed(tf.filter(col("tf") >= minTf), s"${name}_freq", "tok", buckets)
    tf.agg(sum(col("tf")).as("n_total")).write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(s"${name}_meta")
  }

  /** Load the reference frequency model: (freq table, total tokens). */
  def loadTokenFreqs(spark: org.apache.spark.sql.SparkSession, name: String): (DataFrame, Long) = {
    Seq("_freq", "_meta").foreach(s =>
      try spark.catalog.refreshTable(name + s)
      catch { case _: org.apache.spark.sql.AnalysisException => () })
    (spark.table(s"${name}_freq"), spark.table(s"${name}_meta").head.getLong(0))
  }

  /** Score docs against a REFERENCE frequency model ([[saveTokenFreqs]]):
    * per doc, the mean reference-unigram probability of its tokens in
    * integer ppm, with unseen tokens scoring 0 (maximally surprising) and
    * counted in `n_unseen`. This is [[tokenRarity]]'s deployable form —
    * self-scoring re-derives the vocabulary from the corpus being
    * scored, which an ingestion batch can't do honestly (a batch of pure
    * gibberish would look "normal" to itself); scoring against the
    * trusted reference is the CCNet-style LM gate. Integer-exact, so the
    * keep/drop decision is engine- and partitioning-stable. Docs with no
    * tokens are absent (nothing to score — the quality gate owns them). */
  def tokenRarityAgainst(docs: DataFrame, freqs: DataFrame, nTotal: Long): DataFrame =
    tokenRarityAgainstCore(docs, freqs,
      docs.sparkSession.range(1).select(lit(nTotal).as("n_total")))

  /** [[tokenRarityAgainst]] with the total derived from the freq table
    * itself — the fully declarative form the oracle-checked query uses. */
  def tokenRarityAgainst(docs: DataFrame, freqs: DataFrame): DataFrame =
    tokenRarityAgainstCore(docs, freqs, freqs.agg(sum(col("tf")).as("n_total")))

  private def tokenRarityAgainstCore(docs: DataFrame, freqs: DataFrame,
                                     totals: DataFrame): DataFrame = {
    val toks = docs
      .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    // BROADCAST the reference model: it is a fitted artifact (one row
    // per vocab token, [[saveTokenFreqs]]'s minTf lever bounds it), and
    // shipping it to every task removes the shuffle of the exploded
    // (doc_id, token) relation entirely — which is also the skew
    // insurance: a hash join keyed on `tok` would pile every occurrence
    // of the Zipf head ("the", ~percent of ALL occurrences) onto single
    // reducers. Plan-asserted in PlanShapeSpec.
    toks.join(broadcast(freqs.select(col("tok"), col("tf"))), Seq("tok"), "left_outer")
      .crossJoin(broadcast(totals)) // one row: the reference token count
      .withColumn("p_ppm", coalesce(expr("(tf * 1000000) div n_total"), lit(0L)))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_toks"),
        expr("sum(p_ppm) div count(1)").as("mean_prob_ppm"),
        sum(when(col("tf").isNull, 1).otherwise(0)).cast("long").as("n_unseen"))
  }

  /** Per-source tokenizer-fertility stats: milli-characters per BPE-ish
    * token and milli-BPE-tokens per whitespace word — the table a
    * pipeline reads when sizing token budgets and spotting sources that
    * tokenize expensively (code, tables, non-Latin text inflate BPE
    * counts relative to words). Integer-exact; one scan, a tiny
    * per-source aggregate. */
  def tokenizerFertility(documents: DataFrame): DataFrame =
    documents.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      sum(length(col("text")).cast("long")).as("chars"),
      sum(tokenCount(col("text")).cast("long")).as("ws_tokens"),
      sum(bpeTokenCount(col("text")).cast("long")).as("bpe_tokens"))
      .select(col("source"), col("n_docs").cast("long").as("n_docs"),
        expr("(1000 * chars) div greatest(bpe_tokens, 1L)").as("chars_per_bpe_milli"),
        expr("(1000 * bpe_tokens) div greatest(ws_tokens, 1L)").as("bpe_per_ws_milli"))
      .orderBy("source")

  /** Per-source duplication rate: docs vs distinct normalized-content
    * fingerprints, with an integer duplicate percentage — the
    * which-source-is-dirty monitoring view that decides where a dedup
    * pass spends its budget. The shuffle carries 16-byte fingerprints
    * keyed by source; `countDistinct` plans as the two-phase Expand
    * aggregate, so distinct-dedup happens map-side first. */
  def dedupRateBySource(documents: DataFrame): DataFrame =
    documents
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(fingerprint(col("text"))).as("n_distinct"))
      .select(col("source"),
        col("n_docs").cast("long").as("n_docs"),
        col("n_distinct").cast("long").as("n_distinct"),
        expr("(100 * (n_docs - n_distinct)) div greatest(n_docs, 1)").as("dup_pct"))
      .orderBy("source")

  /** Token-BUDGET mixture scheduler — the planning step that runs before
    * any sampling operator: given the corpus's per-source token counts
    * and a total training budget (here `corpus_tokens / BudgetDenom`, so
    * the contract is scale-free), emit each source's target share
    * (equal-contribution policy), the ppm sampling rate that hits it,
    * the tokens actually expected at that rate, and the DEFICIT where a
    * scarce source cannot fill its slot (rate capped at 10⁶ ppm — an
    * under-provisioned source is DISCLOSED, not silently backfilled;
    * re-balancing a deficit is a policy decision the caller owns).
    * Everything is integer arithmetic on non-negative values, so `div`
    * and DuckDB `//` agree.
    *
    * Scale shape: one scan aggregates `tokenCount` per source (pure
    * codegen'd regexp count — no token explode at all), then a 1-row
    * totals broadcast; output is |sources| rows. */
  val BudgetDenom = 2L

  def mixtureBudgetRates(documents: DataFrame): DataFrame = {
    val per = documents.groupBy(col("source"))
      .agg(sum(tokenCount(col("text"))).cast("long").as("n_tokens"))
    val tot = per.agg(
      sum(col("n_tokens")).as("t_total"),
      count(lit(1)).cast("long").as("n_sources"))
    per.crossJoin(broadcast(tot))
      .withColumn("target_tokens", expr(s"(t_total div $BudgetDenom) div n_sources"))
      // greatest(n_tokens, 1): a source whose docs are all empty text
      // still yields a (source, 0) row — it gets the capped rate and a
      // full disclosed deficit instead of a divide-by-zero
      .withColumn("rate_ppm",
        least(lit(1000000L), expr("(target_tokens * 1000000) div greatest(n_tokens, 1)")))
      .withColumn("expected_tokens", expr("(n_tokens * rate_ppm) div 1000000"))
      .withColumn("deficit_tokens",
        greatest(lit(0L), col("target_tokens") - col("expected_tokens")))
      .select(col("source"), col("n_tokens"), col("target_tokens"),
        col("rate_ppm"), col("expected_tokens"), col("deficit_tokens"))
      .orderBy("source")
  }

  /** Per-source token-distribution SHIFT against the corpus — the
    * domain-drift / mixture-skew monitor: an integer-bits KL-style
    * divergence KL(source ‖ corpus) over add-1-smoothed unigram
    * distributions. Each shared token contributes
    * `n_s(t) · (ilog2((n_s(t)+1)·(N_c+V)) − ilog2((n_c(t)+1)·(N_s+V)))`
    * — the floor-log2 of the smoothed probability RATIO (within ±1 bit
    * per term of the real log), summed per source and normalized to
    * milli-bits per token. The metric's CONTRACT is the integer formula
    * itself (same [[floorLog2]] discipline as the surprisal family), so
    * thresholds are engine/partitioning-stable: a source whose milli-bits
    * balloon between snapshots has drifted from the mixture it was
    * weighted for.
    *
    * Scale shape: ONE token explode feeds a (source, token) two-phase
    * hash agg; everything after runs on vocabulary-bounded aggregate
    * tables — corpus counts derive FROM the per-source counts (never a
    * second pass over text), the per-source totals broadcast (|sources|
    * rows), the corpus total is a 1-row broadcast crossJoin, and the
    * only remaining shuffle is the vocab-keyed join of two aggregate
    * relations. Output is |sources| rows. The milli normalization uses
    * `div` (truncation toward zero) — the same semantics as DuckDB's
    * integer `//` — which matters because the floored per-term logs
    * bias each term down by up to a bit, so a source's shift sum CAN
    * land negative; the sign-stable reading is relative (source vs
    * source, snapshot vs snapshot), not absolute. */
  def tokenDistributionShift(documents: DataFrame): DataFrame = {
    val srcCounts = documents
      .select(col("source"), explode(split(normText(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("n_st"))
    val corpusCounts = srcCounts.groupBy(col("tok")).agg(sum(col("n_st")).as("n_ct"))
    val srcTotals = srcCounts.groupBy(col("source"))
      .agg(sum(col("n_st")).as("n_s"), count(lit(1)).cast("long").as("vocab_s"))
    val corpusTotals = corpusCounts
      .agg(sum(col("n_ct")).as("n_c"), count(lit(1)).cast("long").as("v"))
    srcCounts
      .join(corpusCounts, "tok")
      .join(broadcast(srcTotals), "source")
      .crossJoin(broadcast(corpusTotals))
      .withColumn("d_bits",
        floorLog2(expr("(n_st + 1) * (n_c + v)")) -
          floorLog2(expr("(n_ct + 1) * (n_s + v)")))
      .groupBy(col("source"))
      .agg(
        max(col("n_s")).as("n_tokens"),
        max(col("vocab_s")).as("vocab"),
        sum(col("n_st") * col("d_bits")).as("shift_bits"))
      .withColumn("milli_bits_per_token", expr("(1000 * shift_bits) div n_tokens"))
      .orderBy("source")
  }

  /** One bigram-occurrence row (doc_id, bg = "prev next") per adjacent
    * token pair of the normalized text, in position order with
    * multiplicity — the CONTEXT-aware unit the LM filter scores, where
    * [[tokenRarity]]'s unigrams are context-blind ("the the the" is all
    * head-vocab unigrams but all improbable bigrams). Docs with fewer
    * than 2 tokens emit nothing (no bigram to score — the quality gate
    * owns degenerate docs, same contract as [[tokenRarityAgainst]]). */
  private def bigramRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(normText(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(toks) - 1)," +
          " i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))")).as("bg"))

  /** floor(log2(n)) for a positive integer column, computed EXACTLY as
    * bit-length − 1 (`bin` renders the minimal binary string in Spark and
    * DuckDB alike) — no floating log anywhere, so the surprisal metric
    * below is bit-identical across engines, partitionings and platforms
    * (a libm `log2` differing in the last ulp at a power-of-two boundary
    * would flip a floor and break the oracle hash). */
  private def floorLog2(n: Column): Column = (length(bin(n)) - 1).cast("long")

  /** The fitted add-1-smoothed bigram LM over a reference corpus: one row
    * per observed bigram with its integer surprisal
    * `bits = floor(log2((c1 + V) div (c2 + 1)))` — the floor-log2 of the
    * inverted smoothed transition probability
    * p(next|prev) = (c2 + 1)/(c1 + V), where c2 = bigram occurrences,
    * c1 = prev's occurrences as a bigram prefix, V = reference vocabulary
    * size. Integer end to end (see [[floorLog2]]); `c2` is kept so score
    * joins can split off the Zipf head. Both build joins are between
    * vocabulary-bounded aggregate tables — no occurrence row ever joins
    * here. */
  def bigramLm(reference: DataFrame): DataFrame = {
    // MATERIALIZE the fit (optimization-guide §2.4, remove repeated
    // subtrees): c2 feeds both the c1 roll-up and the final join — two
    // executions of the corpus-wide bigram explode+aggregate in one
    // plan — and every scorer then consumes the finished model two to
    // four times (Zipf-head limit, tail join, prev-miss derivation),
    // multiplying the whole fit subtree per consumer (the
    // perplexity_buckets initial plan carried 72 parquet scans / 66
    // explodes before this; exchange reuse did not collapse them —
    // measured 3.5-4.1 s, 2.6 s after). Both relations are
    // vocabulary-bounded model ARTIFACTS — exactly what the deployable
    // path persists via [[saveBigramLm]] — so pinning them is the
    // in-session form of "fit once, score many", never a corpus-sized
    // cache.
    val c2 = bigramRows(reference).groupBy(col("bg")).agg(count(lit(1)).as("c2")).pinned()
    val c1 = c2.groupBy(substring_index(col("bg"), " ", 1).as("prev"))
      .agg(sum(col("c2")).as("c1"))
    c2.withColumn("prev", substring_index(col("bg"), " ", 1))
      .join(c1, "prev")
      .crossJoin(broadcast(vocabSize(reference)))
      .withColumn("bits", floorLog2(expr("(c1 + v) div (c2 + 1)")))
      .select(col("bg"), col("prev"), col("c2"), col("c1"), col("bits"))
      .pinned()
  }

  /** One-row (v) = reference vocabulary size — distinct normalized
    * tokens, the smoothing denominator's additive mass. */
  private def vocabSize(reference: DataFrame): DataFrame =
    reference
      .select(explode(split(normText(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
      .agg(countDistinct(col("tok")).cast("long").as("v"))

  /** CCNet-style LM fluency filter, self-scored: per doc, the mean
    * integer bigram surprisal of its adjacent token pairs under the
    * corpus's own add-1-smoothed bigram model ([[bigramLm]]) — the
    * context-aware upgrade of [[tokenRarity]]: token-salad junk built
    * from common words scores normal on unigram probability but
    * improbable on transitions, which is exactly what a perplexity
    * filter exists to catch. Emits (doc_id, n_bigrams, total_bits,
    * bits_per_bigram_milli); higher bits-per-bigram = less fluent under
    * the model. Integer-exact (floor-log2 surprisal in whole bits,
    * milli-bits via integer division), so keep/drop thresholds are
    * engine- and partitioning-stable and the DuckDB oracle hash-matches.
    *
    * Scale shape: the LM build aggregates to vocabulary-bounded tables;
    * the score join takes [[tokenRarity]]'s Zipf head/tail split — the
    * [[HotVocab]] most frequent bigrams broadcast and join map-side
    * (skew lives in the head by definition), the tail takes the shuffle
    * join with per-key occurrence counts capped at the head's smallest
    * member. Self-scoring re-derives the model from the corpus being
    * scored (outlier detection); the deployable ingestion-gate form is
    * [[bigramSurprisalAgainst]]. */
  def bigramSurprisal(documents: DataFrame): DataFrame = {
    val lm = bigramLm(documents)
    val bg = bigramRows(documents)
    val hot = broadcast(
      lm.orderBy(col("c2").desc, col("bg")).limit(HotVocab)
        .select(col("bg"), col("bits")))
    val head = bg.join(hot, "bg")
    val tail = bg.join(hot.select(col("bg")), Seq("bg"), "left_anti")
      .join(lm.select(col("bg"), col("bits")), "bg")
    head.unionByName(tail)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("bits")).as("total_bits"),
        expr("(sum(bits) * 1000) div count(1)").as("bits_per_bigram_milli"))
      .orderBy("doc_id")
  }

  /** CCNet-style perplexity partitioning (Wenzek et al., LREC 2020):
    * per SOURCE, split documents into head/middle/tail thirds by their
    * bits-per-bigram surprisal under the corpus's own bigram LM — the
    * standard curation move that routes low-perplexity (most fluent)
    * text to the head bucket and leaves the tail for inspection or
    * exclusion, calibrated per source so one domain's baseline fluency
    * doesn't crowd out another's.
    *
    * Integer-exact thresholds via the same bounded-histogram trick as
    * [[qualityCalibrated]]: surprisal milli-bits have a small value
    * DOMAIN, so the tercile cut derives from a (source, milli-bits)
    * histogram (map-side partial agg), a cumulative window over that
    * bounded table, and two one-row-per-source broadcast joins back —
    * no per-source sort of documents anywhere. Docs with fewer than two
    * tokens have no bigram surprisal and are excluded, matching the
    * scorer. Tie semantics: bucket k is every doc at-or-below the
    * smallest milli-bits value whose cumulative count reaches
    * ceil(k·n/3), so ties never straddle a fence and the output is
    * partitioning- and engine-stable. */
  def perplexityBuckets(documents: DataFrame): DataFrame = {
    // `scored` feeds the tercile histogram AND the final bucket join —
    // unpinned, the entire surprisal scoring tree (LM fit + head/tail
    // score + per-doc rollup) executed twice in one plan (guide §2.4).
    // One narrow row per doc: index-sized, safe to materialize at any
    // corpus scale.
    val scored = bigramSurprisal(documents)
      .join(documents.select(col("doc_id"), col("source")), "doc_id")
      .select(col("doc_id"), col("source"), col("bits_per_bigram_milli"))
      .pinned()
    val hist = scored.groupBy(col("source"), col("bits_per_bigram_milli").as("bpb"))
      .agg(count(lit(1)).as("n"))
    val cumW = Window.partitionBy(col("source")).orderBy(col("bpb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val srcW = Window.partitionBy(col("source"))
    val marks = hist
      .withColumn("cum", sum(col("n")).over(cumW))
      .withColumn("n_src", sum(col("n")).over(srcW))
    val t1 = marks.filter(col("cum") >= expr("(n_src + 2) div 3"))
      .groupBy(col("source")).agg(min(col("bpb")).as("t1_milli"))
    val t2 = marks.filter(col("cum") >= expr("(2 * n_src + 2) div 3"))
      .groupBy(col("source")).agg(min(col("bpb")).as("t2_milli"))
    scored
      .join(broadcast(t1), "source")
      .join(broadcast(t2), "source")
      .withColumn("bucket",
        when(col("bits_per_bigram_milli") <= col("t1_milli"), "head")
          .when(col("bits_per_bigram_milli") <= col("t2_milli"), "middle")
          .otherwise("tail"))
      .select(col("doc_id"), col("source"), col("bits_per_bigram_milli"),
        col("t1_milli"), col("t2_milli"), col("bucket"))
      .orderBy("doc_id")
  }

  /** Score docs against a REFERENCE bigram LM — the deployable
    * perplexity gate ([[tokenRarityAgainst]]'s context-aware sibling):
    * an ingestion batch is scored under the TRUSTED corpus's transition
    * model, never its own (a batch of fluent-looking token salad would
    * score itself normal). Unseen events take the add-1-smoothed
    * fallback chain, each one exact floor-log2 integer bits:
    * bigram seen → bits; bigram unseen, prev seen →
    * floor(log2(c1 + V)) (p = 1/(c1+V)); prev unseen → floor(log2(V))
    * (p = 1/V). `n_unseen` counts unseen bigrams — the OOV-rate signal
    * alongside the surprisal score.
    *
    * Plan shape: all three model relations are fitted vocabulary-bounded
    * artifacts and BROADCAST, so scoring is one scan of the batch with
    * map-side joins plus the per-doc rollup — no shuffle of the exploded
    * bigram relation at all (same argument, and the same PlanShapeSpec
    * assertion pattern, as the token-rarity gate). */
  def bigramSurprisalAgainst(docs: DataFrame, reference: DataFrame): DataFrame = {
    // fit + vocab are independent eager builds: overlap them (§2.6).
    // The vocab pin means one reference token-explode pass, not two (the
    // 1-row (v) relation feeds the prev-miss derivation AND the
    // fallback column)
    val (lm, vrow) = graft.Par.run2(
      () => bigramLm(reference), () => vocabSize(reference).pinned())
    bigramSurprisalAgainstCore(docs,
      lm.select(col("bg"), col("bits")),
      prevMissTable(lm, vrow),
      vrow)
  }

  /** (prev, miss_bits = floor(log2(c1 + V))) — the unseen-bigram
    * fallback surprisal per seen prefix token, derived from the fitted
    * LM's own rows (one per prev after the distinct; vocabulary-bounded
    * like everything else in the model). */
  private def prevMissTable(lm: DataFrame, vrow: DataFrame): DataFrame =
    lm.select(col("prev"), col("c1")).distinct()
      .crossJoin(broadcast(vrow))
      .withColumn("miss_bits", floorLog2(col("c1") + col("v")))
      .select(col("prev"), col("miss_bits"))

  /** Persist the reference bigram LM as catalog tables — `<name>_bg`
    * (bg, bits; bucketed by bg), `<name>_prev` (prev, miss_bits;
    * bucketed by prev), `<name>_meta` (one row: v) — the same
    * model-artifact pattern as [[saveTokenFreqs]]: fit once per trusted
    * reference snapshot, scored against by every later ingestion batch
    * without re-reading the reference. */
  def saveBigramLm(reference: DataFrame, name: String, buckets: Int = 8): Unit = {
    import graft.sources.FileFormats.writeBucketed
    val lm = bigramLm(reference)
    val vrow = vocabSize(reference).pinned() // feeds _prev AND _meta: one vocab pass
    writeBucketed(lm.select(col("bg"), col("bits")), s"${name}_bg", "bg", buckets)
    writeBucketed(prevMissTable(lm, vrow), s"${name}_prev", "prev", buckets)
    vrow.write.mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(s"${name}_meta")
  }

  /** Load a persisted bigram LM: (bg table, prev table, meta). Same
    * refresh-on-read as [[loadTokenFreqs]] — appends/rewrites from other
    * sessions must be visible to this one. */
  def loadBigramLm(spark: org.apache.spark.sql.SparkSession,
                   name: String): (DataFrame, DataFrame, DataFrame) = {
    Seq("_bg", "_prev", "_meta").foreach(s =>
      try spark.catalog.refreshTable(name + s)
      catch { case _: org.apache.spark.sql.AnalysisException => () })
    (spark.table(s"${name}_bg"), spark.table(s"${name}_prev"), spark.table(s"${name}_meta"))
  }

  /** [[bigramSurprisalAgainst]] over a persisted model
    * ([[loadBigramLm]]'s triple) — the per-batch deployment path. */
  def bigramSurprisalAgainst(docs: DataFrame, lmBg: DataFrame,
                             lmPrev: DataFrame, meta: DataFrame): DataFrame =
    bigramSurprisalAgainstCore(docs, lmBg, lmPrev, meta)

  private def bigramSurprisalAgainstCore(docs: DataFrame, lmBg: DataFrame,
                                         lmPrev: DataFrame, vrow: DataFrame): DataFrame = {
    val bg = bigramRows(docs)
      .withColumn("prev", substring_index(col("bg"), " ", 1))
    bg
      .join(broadcast(lmBg), Seq("bg"), "left_outer")
      .join(broadcast(lmPrev), Seq("prev"), "left_outer")
      .crossJoin(broadcast(vrow)) // one row: the reference vocabulary size
      .withColumn("s", coalesce(col("bits"), col("miss_bits"), floorLog2(col("v"))))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("s")).as("total_bits"),
        expr("(sum(s) * 1000) div count(1)").as("bits_per_bigram_milli"),
        sum(when(col("bits").isNull, 1).otherwise(0)).cast("long").as("n_unseen"))
  }

  /** DSIR-style importance weights (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): per doc, the
    * integer milli-bits-per-bigram surprisal DIFFERENCE between a BASE
    * model (fit on the raw pool) and a TARGET model (fit on the
    * high-quality target domain) — `dsir_milli > 0` means the doc is
    * more probable under the target distribution than under the raw
    * pool, i.e. target-domain-like, and should be up-weighted when
    * selecting pretraining data. Both models are the same
    * add-1-smoothed integer bigram LM as [[bigramSurprisalAgainst]]
    * (floor-log2 bits, unseen fallback chain), so the weight is exact
    * and engine-stable; the published method's exp-weighted sampling
    * step is [[stratifiedSample]]-style hash sampling over these
    * weights — the deterministic greedy form (rank by weight) is the
    * `dsir_sample` query.
    *
    * Plan shape: ONE scan of the pool's exploded bigrams, scored
    * against both models in the same pipeline — all six model
    * relations are vocabulary-bounded fitted artifacts and BROADCAST,
    * so no occurrence row ever shuffles on a token key (the same
    * skew-proof argument, and the same plan-lint coverage, as the
    * rarity gate). Emits (doc_id, n_bigrams, target_bits, base_bits,
    * dsir_milli); docs with < 2 tokens are absent (nothing to score). */
  def dsirWeights(pool: DataFrame, target: DataFrame, base: DataFrame): DataFrame = {
    // the four model builds (two LM fits, two vocab sizes) are
    // independent and now EAGER (pinned artifacts) — build them as
    // concurrent Spark jobs (guide §2.6) so the fits overlap instead of
    // serializing at construction time; each vocab pin means that
    // reference corpus pays its token-explode pass once (it feeds two
    // model relations)
    val ((tLm, bLm), (tV, bV)) = graft.Par.run2(
      () => graft.Par.run2(() => bigramLm(target), () => bigramLm(base)),
      () => graft.Par.run2(() => vocabSize(target).pinned(),
        () => vocabSize(base).pinned()))
    dsirCore(pool,
      tLm.select(col("bg"), col("bits")), prevMissTable(tLm, tV), tV,
      bLm.select(col("bg"), col("bits")), prevMissTable(bLm, bV), bV)
  }

  /** [[dsirWeights]] over two persisted models ([[loadBigramLm]]
    * triples) — the deployable form: fit the target and base LMs once
    * per snapshot, weight every later ingestion batch without
    * re-reading either reference corpus. */
  def dsirWeightsAgainst(pool: DataFrame,
                         t: (DataFrame, DataFrame, DataFrame),
                         b: (DataFrame, DataFrame, DataFrame)): DataFrame =
    dsirCore(pool,
      t._1, t._2, t._3.select(col("v")),
      b._1, b._2, b._3.select(col("v")))

  private def dsirCore(pool: DataFrame,
                       tBg: DataFrame, tPrev: DataFrame, tV: DataFrame,
                       bBg: DataFrame, bPrev: DataFrame, bV: DataFrame): DataFrame = {
    val bg = bigramRows(pool).withColumn("prev", substring_index(col("bg"), " ", 1))
    bg
      .join(broadcast(tBg.select(col("bg"), col("bits").as("t_bits"))), Seq("bg"), "left_outer")
      .join(broadcast(tPrev.select(col("prev"), col("miss_bits").as("t_miss"))), Seq("prev"), "left_outer")
      .crossJoin(broadcast(tV.select(col("v").as("t_v")))) // one row: target vocab size
      .join(broadcast(bBg.select(col("bg"), col("bits").as("b_bits"))), Seq("bg"), "left_outer")
      .join(broadcast(bPrev.select(col("prev"), col("miss_bits").as("b_miss"))), Seq("prev"), "left_outer")
      .crossJoin(broadcast(bV.select(col("v").as("b_v")))) // one row: base vocab size
      .withColumn("st", coalesce(col("t_bits"), col("t_miss"), floorLog2(col("t_v"))))
      .withColumn("sb", coalesce(col("b_bits"), col("b_miss"), floorLog2(col("b_v"))))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_bigrams"),
        sum(col("st")).as("target_bits"),
        sum(col("sb")).as("base_bits"),
        // div truncates toward zero in Spark AND DuckDB (`//`), so the
        // sign-carrying mean is engine-exact with no floor-div shim
        expr("((sum(sb) - sum(st)) * 1000) div count(1)").as("dsir_milli"))
  }

  /** Per-source CALIBRATED quality gate: keep each source's top
    * `QualityCalibratedTopPct`% by quality score, not a single global
    * cutoff — a fixed threshold applied across domains keeps almost
    * everything from clean sources and almost nothing from noisy ones,
    * skewing the mixture; calibrating per source decouples "how much of
    * each domain" (the mixture policy) from "which docs within it" (this
    * gate). Scores are floored to integer milli ([[qualityScore]] is
    * 6-dp-rounded, so `floor(q*1000)` is bit-identical across engines);
    * the per-source threshold is the k-th-largest score with
    * k = ceil(n_src · pct/100), i.e. `keep` admits AT LEAST the top
    * pct% (score ties at the boundary all pass — deterministic, no
    * tie-break lottery).
    *
    * Scale shape: NO per-source sort of docs. q_milli has ≤ 1001
    * distinct values, so the threshold comes from a (source, q_milli)
    * histogram — corpus-scale input aggregates map-side to ≤ 1001
    * rows/source, the cumulative window runs over that bounded table,
    * and the one-row-per-source threshold broadcasts back. */
  val QualityCalibratedTopPct = 25

  def qualityCalibrated(documents: DataFrame): DataFrame = {
    // scored feeds the threshold histogram AND the final keep join —
    // pin so the regex-heavy quality scoring pass runs once, not twice
    // (one narrow row per doc; same §2.4 move as [[perplexityBuckets]])
    val scored = documents.select(
      col("doc_id"), col("source"),
      floor(qualityScore(col("text")) * 1000).cast("long").as("q_milli"))
      .pinned()
    val hist = scored.groupBy(col("source"), col("q_milli")).agg(count(lit(1)).as("n"))
    val cumW = Window.partitionBy(col("source"))
      .orderBy(col("q_milli").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val srcW = Window.partitionBy(col("source"))
    val thresholds = hist
      .withColumn("cum", sum(col("n")).over(cumW))
      .withColumn("n_src", sum(col("n")).over(srcW))
      .filter(col("cum") >= expr(s"(n_src * $QualityCalibratedTopPct + 99) div 100"))
      .groupBy(col("source")).agg(max(col("q_milli")).as("src_threshold_milli"))
    scored.join(broadcast(thresholds), "source")
      .withColumn("keep", col("q_milli") >= col("src_threshold_milli"))
      .select(col("doc_id"), col("source"), col("q_milli"),
        col("src_threshold_milli"), col("keep"))
      .orderBy("doc_id")
  }

  /** Vocabulary growth curve (Heaps' law) at doc-bucket granularity:
    * cumulative distinct tokens and cumulative token occurrences after
    * each block of [[VocabGrowthBucket]] docs in doc_id order — the
    * corpus analytic that says whether a source is still contributing
    * new vocabulary or re-treading old text (a flattening curve is the
    * data-driven "this domain is mined out" signal when deciding how
    * much more of a source to crawl).
    *
    * No distinct-over-window anywhere: a token's contribution to the
    * cumulative vocabulary is fully determined by its FIRST occurrence,
    * so `min(doc_id) per token` (a vocabulary-bounded hash aggregate)
    * converts the cumulative-distinct problem into a cumulative SUM of
    * per-bucket first-occurrence counts. The only window runs over the
    * bucket aggregate — n_docs/[[VocabGrowthBucket]] rows, a bounded
    * single-partition frame that is deliberate, not a scale leak. */
  val VocabGrowthBucket = 50

  def vocabGrowth(documents: DataFrame): DataFrame = {
    val tk = documents
      .select(col("doc_id"), explode(split(normText(col("text")), " ")).as("tok"))
      .filter(length(col("tok")) > 0)
    val b = s"div $VocabGrowthBucket"
    val occ = tk.groupBy(expr(s"doc_id $b").as("bucket"))
      .agg(count(lit(1)).as("n_occ"))
    val firsts = tk.groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
      .groupBy(expr(s"first_doc $b").as("bucket"))
      .agg(count(lit(1)).as("n_new"))
    val docs = documents.groupBy(expr(s"doc_id $b").as("bucket"))
      .agg(count(lit(1)).cast("long").as("n_docs"))
    val cumW = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .join(occ, Seq("bucket"), "left_outer")
      .join(firsts, Seq("bucket"), "left_outer")
      .withColumn("cum_tokens", sum(coalesce(col("n_occ"), lit(0L))).over(cumW).cast("long"))
      .withColumn("cum_vocab", sum(coalesce(col("n_new"), lit(0L))).over(cumW).cast("long"))
      .select(col("bucket"), col("n_docs"), col("cum_tokens"), col("cum_vocab"))
      .orderBy("bucket")
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
