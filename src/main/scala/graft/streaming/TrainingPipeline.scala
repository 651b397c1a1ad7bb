package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The end-to-end ONLINE training-data pipeline — the composition the
  * individual stages exist for: documents stream in and flow through
  *
  *   1. [[StreamingDedup.againstIndex]] — drop anything already in the
  *      persisted corpus fingerprint index (the streaming mirror of
  *      [[graft.operators.Dedup.incrementalDedup]]'s exact stage);
  *   2. [[StreamingDedup.firstOccurrenceDocs]] — watermark-bounded
  *      within-stream dedup (16-byte fingerprint state, text never enters
  *      the state store);
  *   3. [[StreamingCuration.curate]] — quality/language gate + PII scrub;
  *   4. [[graft.sources.FileFormats.writeTrainingShards]] — token-budget
  *      shard export, partitioned by (source, block, shard), inside an
  *      idempotent batchId-keyed `foreachBatch`.
  *
  * Every stage is schema-preserving, so the `source` column (and any
  * other payload) rides from ingest to the shard tree untouched.
  *
  * Exactly-once: the aggregation/dedup state lives in the checkpoint; the
  * sink writes each micro-batch under its own `batch_id=<id>/` directory
  * with overwrite, so a replayed batch overwrites itself instead of
  * duplicating output (the same contract as
  * [[StreamingUniqueUsers.startIdempotentParquetSink]]). A restart from
  * the same checkpoint resumes the dedup state and never reprocesses
  * consumed input (StreamingSpec's restart case drives this end to end).
  *
  * At 100 TB-a-day ingest this is the whole online topology: the only
  * shuffle is the per-batch shard-packing window (bounded by the
  * (source, block) key), the index join is a static-side join the
  * optimizer can broadcast or bucket, and state is O(distinct docs per
  * watermark horizon) × 16 bytes.
  */
object TrainingPipeline {

  /** Per-family ASYNC compaction slots — the off-critical-path form of
    * the cadence compaction (round-11 streambench finding: the in-sink
    * `compactEvery` stalled the trigger ~25%; quiet8 1288 rows/s
    * cadence-off vs 961 cadence-4). A cadence boundary now SCHEDULES the
    * family's compaction on a background thread and returns; the rewrite
    * overlaps (a) the same trigger's sibling-family appends still inside
    * `Par.runAll`, and (b) the next trigger's source read, watermark
    * dedup, gates and admitted materialization — everything up to the
    * moment that family is touched again, where [[await]] joins it.
    *
    * Safety is the single-writer argument, per family: at most ONE
    * compaction is in flight per key ([[schedule]] awaits the previous),
    * and every same-family touch — the next append, the sink-side fresh
    * fp read — awaits first, so no append can land under a rewrite that
    * would discard it and no scan can pin a listing the swap is about to
    * move. A compaction failure surfaces at the next await (the
    * following trigger, or the drain), exactly one batch later than the
    * sequential form — and the recovery is the same documented one
    * (torn swaps heal at the next verb entry; re-compaction is a no-op
    * rewrite). */
  private[graft] final class AsyncCompactions {
    private val pending =
      new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.FutureTask[Unit]]()
    def await(key: String): Unit = {
      // JOIN without removing, remove only after the join lands: removing
      // first made two concurrent awaiters of one family non-exclusive —
      // the second saw an empty slot and proceeded while the rewrite was
      // still in flight. (Current call sites are all on the sequential
      // stream thread, but the "every same-family touch awaits" invariant
      // shouldn't depend on that.) remove(key, f) is value-matched, so a
      // slot already replaced by a newer schedule is left alone; a failed
      // task is cleared too — the failure surfaces at every await that
      // was already waiting, then the slot is empty (re-await is a no-op).
      val f = pending.get(key)
      if (f != null) {
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            pending.remove(key, f)
            throw e.getCause
        }
        pending.remove(key, f)
        ()
      }
    }
    def schedule(key: String)(body: => Unit): Unit = {
      await(key) // never two in flight for one family
      val task = new java.util.concurrent.FutureTask[Unit](() => body)
      pending.put(key, task)
      val t = new Thread(task, s"graft-compact-$key")
      t.setDaemon(true)
      t.start()
    }
    def drainAll(): Unit = {
      val keys = java.util.Collections.list(pending.keys())
      keys.forEach(k => await(k))
    }
  }

  /** The returned handle: delegates everything to the real query, and
    * DRAINS pending async compactions at every termination point — so
    * `start(...).awaitTermination()` still means "all maintenance has
    * landed", the contract every caller and spec relied on when
    * compaction was synchronous. */
  private final class DrainingQuery(inner: StreamingQuery, comps: AsyncCompactions)
      extends StreamingQuery {
    override def name: String = inner.name
    override def id: java.util.UUID = inner.id
    override def runId: java.util.UUID = inner.runId
    override def sparkSession: org.apache.spark.sql.SparkSession = inner.sparkSession
    override def isActive: Boolean = inner.isActive
    override def exception: Option[org.apache.spark.sql.streaming.StreamingQueryException] =
      inner.exception
    override def status: org.apache.spark.sql.streaming.StreamingQueryStatus = inner.status
    override def recentProgress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] =
      inner.recentProgress
    override def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress =
      inner.lastProgress
    // drain EVEN WHEN the inner call throws (query failed): the caller's
    // natural recovery is a same-JVM restart replaying the batch, and an
    // undrained orphan compaction thread would overlap that restart's
    // appends — its staged rewrite, snapshotted before the replayed
    // append, would discard it at swap time. Draining first means the
    // restart never shares a table with a prior run's writer. A drain
    // failure rides as suppressed; the query's own failure stays primary.
    private def drainAfter[A](body: => A): A = {
      val out =
        try body
        catch { case e: Throwable =>
          try comps.drainAll()
          catch { case d: Throwable => if (d ne e) e.addSuppressed(d) }
          throw e
        }
      comps.drainAll()
      out
    }
    override def awaitTermination(): Unit = drainAfter { inner.awaitTermination() }
    override def awaitTermination(timeoutMs: Long): Boolean = {
      val done =
        try inner.awaitTermination(timeoutMs)
        catch { case e: Throwable =>
          try comps.drainAll()
          catch { case d: Throwable => if (d ne e) e.addSuppressed(d) }
          throw e
        }
      // drain only when the query actually terminated — a timed-out wait
      // leaves the query running and its pending compactions in flight
      if (done) comps.drainAll()
      done
    }
    override def processAllAvailable(): Unit = drainAfter { inner.processAllAvailable() }
    override def stop(): Unit = drainAfter { inner.stop() }
    override def explain(): Unit = inner.explain()
    override def explain(extended: Boolean): Unit = inner.explain(extended)
  }

  /** The transform chain (stages 1–3), sink-agnostic — reusable against
    * a memory sink in tests or the shard exporter in [[start]]. Input
    * needs (doc_id, text, source, ts); any extra column survives. */
  def transforms(docs: DataFrame, fpIndex: DataFrame,
                 watermark: String = "10 minutes", keepAt: Double = 0.5): DataFrame =
    transformsWithOriginal(docs, Some(fpIndex), watermark, keepAt).drop("orig_text")

  /** [[transforms]] plus an `orig_text` column holding each doc's
    * PRE-redaction text. Every dedup fingerprint in this topology —
    * the index side ([[StreamingDedup.againstIndex]]), the watermark
    * state, and [[graft.operators.Dedup.saveDedupIndex]] itself — hashes
    * the RAW text, so index MAINTENANCE must too: appending
    * md5(normText(redacted)) would silently re-admit every later raw
    * duplicate of a PII-bearing doc (the redacted fingerprint matches
    * nothing that ever arrives). The original rides the micro-batch
    * only — [[StreamingDedup.firstOccurrenceDocs]] keys its state on the
    * 16-byte fingerprint, so the extra column never enters the state
    * store. */
  private def transformsWithOriginal(docs: DataFrame, fpIndex: Option[DataFrame],
                                     watermark: String, keepAt: Double): DataFrame =
    StreamingCuration.curate(
      StreamingDedup.firstOccurrenceDocs(
        fpIndex.fold(docs)(StreamingDedup.againstIndex(docs, _)), watermark)
        .withColumn("orig_text", org.apache.spark.sql.functions.col("text")),
      keepAt)

  /** Start the full pipeline with the idempotent batchId-keyed
    * shard-export sink: each micro-batch's admitted docs become a
    * training-shard tree under `<outDir>/batch_id=<id>/`.
    *
    * With `maintainIndexName` set, the sink also APPENDS each admitted
    * batch to that persisted dedup index
    * ([[graft.operators.Dedup.appendToDedupIndex]]) — pass the same
    * index's fp table as `fpIndex`, and the stream maintains its own
    * cross-horizon dedup state: watermark state handles the near-term
    * repeats, the growing index handles everything ever admitted —
    * including duplicates arriving AFTER their original's watermark
    * state evicted, WITHIN the same run. That within-run visibility is
    * load-bearing and subtle: the static side resolves to a catalog
    * table whose files are listed per EXECUTION (not pinned at query
    * start), and [[graft.operators.Dedup.appendToDedupIndex]] refreshes
    * the listing caches of every session it can see after each append —
    * so micro-batch N+1's static-join scan includes what batch N
    * appended. StreamingSpec pins this end to end (a duplicate arriving
    * hours past its original's watermark eviction is still rejected);
    * if a Spark upgrade or session topology ever re-pins static-side
    * listings, that spec is the tripwire, and the fallback is an
    * explicit per-batch anti-join inside the sink.
    * The append is at-least-once under batch
    * replay, which is safe: duplicate index rows cannot change an
    * anti-join/candidate-distinct outcome, only add bytes. Those bytes —
    * one file set per bucket per micro-batch, plus any replay rows — are
    * reclaimed by [[graft.operators.Dedup.compactDedupIndex]]: run it on
    * the maintained index at snapshot cadence (nightly, or whenever
    * per-bucket file counts pass the warehouse's small-file threshold),
    * while the pipeline is between batches. Results are identical before
    * and after (spec-pinned); only scan cost changes. */
  /** With `rarityGate = Some((freqModelName, minMeanPpm))`, each batch is
    * additionally scored against the persisted reference frequency model
    * ([[graft.operators.TextAnalysis.saveTokenFreqs]]) and docs whose
    * mean reference-unigram probability falls below `minMeanPpm` are
    * dropped — the CCNet-style LM gate, applied per micro-batch as a
    * batch op (the score is a per-doc aggregate of that doc's own
    * tokens, so it needs no stream state; the reference model is the
    * static side). */
  /** With `lmGate = Some((lmModelName, maxMilliBits))`, each batch is
    * also scored against the persisted bigram LM
    * ([[graft.operators.TextAnalysis.saveBigramLm]]) and docs whose
    * milli-bits-per-bigram surprisal EXCEEDS `maxMilliBits` are dropped —
    * the context-aware perplexity gate that kills common-word token
    * salad the unigram rarity gate admits. Same contracts as the rarity
    * gate: pre-redaction text is scored, docs with no bigram to score
    * (< 2 tokens) ride through (the quality gate owns degenerate docs),
    * and the model relations are broadcast static sides — no stream
    * state. */
  /** With `dsirGate = Some((targetLmName, baseLmName, minDsirMilli))`,
    * each batch is DSIR-scored ([[graft.operators.TextAnalysis.dsirWeightsAgainst]])
    * against TWO persisted bigram LMs — a target-domain model and a
    * raw-pool baseline — and docs whose importance weight (milli-bits
    * per bigram of base-minus-target surprisal) falls below
    * `minDsirMilli` are dropped: the rarity and perplexity gates ask "is
    * this fluent text", this one asks "is it the KIND of text we want
    * more of". Same contracts as the other two gates: pre-redaction
    * text is scored, docs with < 2 tokens ride through to the quality
    * gate, both models are broadcast static sides — no stream state. */
  /** With `compactEvery = Some(n)` (requires a maintain*Index* option),
    * the sink SCHEDULES each maintained family's compaction after every
    * n-th micro-batch's append — asynchronously, off the trigger's
    * critical path (see [[AsyncCompactions]]): the rewrite overlaps the
    * sibling families' appends and the next trigger's work, and the next
    * same-family touch (or the returned handle's termination drain)
    * joins it before proceeding, which preserves exactly the
    * between-batches safety the old in-line form had — no append under a
    * rewrite, no scan across a swap. Keyed on batchId (monotonic across
    * restarts), so the cadence survives checkpoint recovery; a replayed
    * batch at a cadence boundary just re-compacts — a no-op rewrite.
    * Results are unaffected either way (spec-pinned); the cadence only
    * bounds the per-bucket small-file pileup at O(n) instead of O(total
    * batches).
    *
    * Under a cadence the index anti-join MOVES from the query plan's
    * static side into the sink, re-resolved from the catalog each batch:
    * the streaming plan pins its static relations at query start, and a
    * pinned relation tolerates appended files but NOT a compaction
    * rewrite — the next micro-batch scans the pre-rewrite listing and
    * dies on FAILED_READ_FILE.FILE_NOT_EXIST (observed, and pinned by
    * the cadence spec). This is precisely the per-batch-anti-join
    * fallback the visibility note above documents, applied automatically
    * exactly when in-run rewrites make it necessary. Final admitted set
    * is identical: the index filter is a per-doc predicate, so it
    * commutes with the watermark dedup and curation it now follows
    * (an index-dup that transiently occupies watermark state only
    * shadows LATER copies of itself — docs the index filter would drop
    * anyway). */
  /** With `vacuumEvery = Some(m)` (requires a maintain*Index* option),
    * each maintained family's storage-generation residue is additionally
    * reclaimed after every m-th micro-batch ([[graft.operators.Lifecycle
    * .vacuumSome]]), scheduled on the SAME per-family async slot as the
    * cadence compaction — so a vacuum can never race an in-flight rewrite
    * of its own family (the slot serializes append → compact → vacuum; a
    * vacuum that saw a compaction's live `__staged` mid-build would
    * delete the generation about to be swapped in). Runs with
    * keepGenerations = 1: the pipeline is not the only possible reader,
    * and a concurrent scan may still hold the newest superseded listing —
    * residue therefore stays bounded at O(1) generations per family
    * instead of O(crashes), and a standalone keep=0 [[graft.operators
    * .Lifecycle.vacuum]] at maintenance windows reclaims the last one.
    * Results are unaffected (vacuum touches superseded generations only
    * — spec-pinned mid-stream). */
  def start(docs: DataFrame, fpIndex: DataFrame, outDir: String, checkpointDir: String,
            budget: Long = graft.operators.TextAnalysis.PackBudgetTokens,
            watermark: String = "10 minutes", keepAt: Double = 0.5,
            maintainIndexName: Option[String] = None,
            maintainSearchIndexName: Option[String] = None,
            maintainVectorIndexPath: Option[String] = None,
            rarityGate: Option[(String, Long)] = None,
            lmGate: Option[(String, Long)] = None,
            dsirGate: Option[(String, String, Long)] = None,
            compactEvery: Option[Int] = None,
            vacuumEvery: Option[Int] = None): StreamingQuery = {
    require(compactEvery.isEmpty || maintainIndexName.isDefined ||
      maintainSearchIndexName.isDefined || maintainVectorIndexPath.isDefined,
      "compactEvery compacts the maintained index(es) — set at least one maintain*Index* option")
    require(vacuumEvery.isEmpty || maintainIndexName.isDefined ||
      maintainSearchIndexName.isDefined || maintainVectorIndexPath.isDefined,
      "vacuumEvery vacuums the maintained index(es) — set at least one maintain*Index* option")
    // under a compaction cadence the plan may not pin the DEDUP index
    // relation (see the docstring above): stage 1 moves into the sink.
    // Search-index-only cadences don't trigger this — postings are never
    // in the streaming plan, so the fp relation can stay plan-pinned.
    val dedupCompacts = compactEvery.isDefined && maintainIndexName.isDefined
    val planIndex = if (dedupCompacts) None else Some(fpIndex)
    // PER-BATCH CACHES, filled on the first batch from the stream's own
    // session (the same clone serves every micro-batch of this query) and
    // persisted: the gate models are STATIC reference artifacts — loading
    // and re-scanning them per batch taxed every trigger with catalog
    // lookups and parquet scans the models' immutability never required.
    // (The dedup fp index is NOT cached here: the sink maintains it, so
    // its freshness contract is per-batch by design.)
    var freqModel: Option[(DataFrame, Long)] = None
    var lmModel: Option[(DataFrame, DataFrame, DataFrame)] = None
    var dsirModels: Option[((DataFrame, DataFrame, DataFrame), (DataFrame, DataFrame, DataFrame))] = None
    // per-family async compaction slots (see AsyncCompactions) — the
    // query handle returned below drains them at termination
    val comps = new AsyncCompactions
    def cacheLm(t: (DataFrame, DataFrame, DataFrame)) = {
      t._1.persist(); t._2.persist(); t._3.persist(); t
    }
    transformsWithOriginal(docs, planIndex, watermark, keepAt).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // PERSIST the micro-batch: the body runs several actions (export,
        // three index appends, the gate joins' ground truth) and an
        // unpersisted foreachBatch Dataset re-executes the whole upstream
        // chain (source read → dedup → curation) once per action — the
        // dominant per-trigger cost the round-9 throughput profile found
        val batch = batch0.persist()
        try {
        // skip no-data batches (watermark-advance ticks): an empty shard
        // tree and three empty index appends would cost a write each
        if (!batch.isEmpty) {
          import org.apache.spark.sql.functions.col
          import graft.operators.TextAnalysis
          // both gates score the PRE-redaction text (the reference models
          // never saw redaction tags — scoring the scrubbed form would
          // charge every PII-bearing doc phantom unseen-event surprise,
          // the same original-text rule StreamingCuration.curate applies
          // to the quality score)
          val original = batch.select(
            col("doc_id"), col("orig_text").as("text"), col("source"))
          // the per-batch form of stage 1 under a compaction cadence:
          // resolved from the catalog HERE, each batch, on the clone
          // session whose caches append/compact refresh — never from the
          // query plan's pinned listing
          val curated = if (!dedupCompacts) batch.select("doc_id", "text", "source")
          else {
            // any in-flight dedup compaction must land before this
            // trigger touches the fp table (resolution here, scan at the
            // admitted materialization below — both must see a settled
            // table, never a mid-swap absent window or a listing the
            // swap is about to move)
            comps.await("dedup")
            val fresh = batch.sparkSession.table(s"${maintainIndexName.get}_fp")
            batch.select("doc_id", "text", "source").join(
              StreamingDedup.againstIndex(original, fresh).select(col("doc_id")),
              Seq("doc_id"), "left_semi")
          }
          val rarityOk = rarityGate.fold(curated) { case (freqName, minMeanPpm) =>
            val (freqs, nTotal) = freqModel.getOrElse {
              val m = TextAnalysis.loadTokenFreqs(batch.sparkSession, freqName)
              m._1.persist(); freqModel = Some(m); m
            }
            val scores = TextAnalysis.tokenRarityAgainst(original, freqs, nTotal)
              .select(col("doc_id"), col("mean_prob_ppm"))
            // LEFT join: a doc with zero tokens after normalization has no
            // score row — that is "unscorable", not "below threshold"; the
            // quality gate owns token-less docs, so they ride through
            curated.join(scores, Seq("doc_id"), "left_outer")
              .filter(col("mean_prob_ppm").isNull || col("mean_prob_ppm") >= minMeanPpm)
              .drop("mean_prob_ppm")
          }
          val lmOk = lmGate.fold(rarityOk) { case (lmName, maxMilliBits) =>
            val (bgT, prevT, metaT) = lmModel.getOrElse {
              val m = cacheLm(TextAnalysis.loadBigramLm(batch.sparkSession, lmName))
              lmModel = Some(m); m
            }
            val scores = TextAnalysis.bigramSurprisalAgainst(original, bgT, prevT, metaT)
              .select(col("doc_id"), col("bits_per_bigram_milli"))
            // same LEFT-join contract: a doc with < 2 tokens has no bigram
            // to score and rides through to the quality gate's verdict
            rarityOk.join(scores, Seq("doc_id"), "left_outer")
              .filter(col("bits_per_bigram_milli").isNull ||
                col("bits_per_bigram_milli") <= maxMilliBits)
              .drop("bits_per_bigram_milli")
          }
          val admitted0 = dsirGate.fold(lmOk) { case (tName, bName, minDsirMilli) =>
            val (tLm, bLm) = dsirModels.getOrElse {
              val m = (cacheLm(TextAnalysis.loadBigramLm(batch.sparkSession, tName)),
                cacheLm(TextAnalysis.loadBigramLm(batch.sparkSession, bName)))
              dsirModels = Some(m); m
            }
            val scores = TextAnalysis.dsirWeightsAgainst(original, tLm, bLm)
              .select(col("doc_id"), col("dsir_milli"))
            // same LEFT-join ride-through for docs with nothing to score
            lmOk.join(scores, Seq("doc_id"), "left_outer")
              .filter(col("dsir_milli").isNull || col("dsir_milli") >= minDsirMilli)
              .drop("dsir_milli")
          }
          // admitted feeds the export plus up to three index appends —
          // persist it too, and size the export's writer width from the
          // ADMITTED count (~1 task per 1000 rows, capped: each writer
          // owns whole (source, block, shard) directories, so the tree
          // stays one-file-per-directory at any width — see
          // writeTrainingShards; the batch-mode export keeps the full
          // shuffle width)
          val admitted = admitted0.persist()
          val nAdmitted = admitted.count() // materializes the cache the sinks below share
          // the export and each index-maintenance family are INDEPENDENT
          // consumers of the (already materialized) admitted cache, each
          // writing its own path/tables: run them as concurrent Spark
          // jobs rather than four sequential job-commit rounds per
          // trigger — the sequential form left most of the 8 cores idle
          // during each small write's planning/commit tail (the
          // dominant per-trigger cost after round 10's persist fix).
          // Order INSIDE a family (append, then cadence compaction) is
          // preserved by keeping the family inside one thunk (graft.Par). Crash
          // atomicity is unchanged: a batch that dies with some families
          // landed and others not is exactly the sequential form's crash
          // state, and the at-least-once replay re-runs all four (export
          // overwrites its batch_id dir; each index family has its own
          // replay contract — ledger skip, duplicate-tolerant rows).
          val exportT = () => {
            graft.sources.FileFormats.writeTrainingShards(
              admitted, s"$outDir/batch_id=$batchId", budget,
              writerTasks = Some(math.min(32, 1 + (nAdmitted / 1000)).toInt))
          }
          // maintenance entries hash the ORIGINAL text (see
          // [[transformsWithOriginal]]): the index must fingerprint what
          // future raw arrivals will hash, not the redacted export form.
          // Bucket spec is derived from the index's own catalog metadata
          // inside appendToDedupIndex, so a non-default-bucket index
          // maintains correctly too.
          val forIndex = admitted.select(col("doc_id")).join(
            batch.select(col("doc_id"), col("orig_text").as("text"), col("source")), Seq("doc_id"))
          val dedupT = () => { maintainIndexName.foreach { name =>
            comps.await("dedup") // no-op when the fresh-read above already joined it
            graft.operators.Dedup.appendToDedupIndex(forIndex, name)
            // cadence boundary: SCHEDULE the rewrite off the trigger's
            // critical path (see AsyncCompactions — the next same-family
            // touch or the terminal drain joins it)
            if (compactEvery.exists(n => (batchId + 1) % n == 0))
              comps.schedule("dedup") {
                graft.operators.Dedup.compactDedupIndex(batch.sparkSession, name)
              }
            // vacuum rides the same slot AFTER any compaction scheduled
            // above (schedule() awaits the previous task on this key), so
            // it only ever sees settled generations of its own family
            if (vacuumEvery.exists(n => (batchId + 1) % n == 0))
              comps.schedule("dedup") {
                graft.operators.Lifecycle.vacuumSome(batch.sparkSession,
                  dedupName = Some(name), keepGenerations = 1)
                ()
              }
          } }
          // search-index maintenance indexes the EXPORTED (redacted)
          // text — what the shards actually contain and what a corpus
          // search should retrieve — the deliberate asymmetry with the
          // dedup index above, which must hash the raw form future
          // arrivals will hash. Keyed on batchId: the postings ledger
          // skips a re-delivered batch, so the at-least-once foreachBatch
          // replay cannot double tf/df (Search.appendToSearchIndex).
          val searchT = () => { maintainSearchIndexName.foreach { name =>
            comps.await("search") // postings are never in the streaming plan;
            // the append is this family's only in-run touch point
            graft.operators.Search.appendToSearchIndex(
              admitted.select(col("doc_id"), col("text"), col("source")),
              name, Some(batchId))
            // the cadence compacts this index too: postings are never a
            // static side of the streaming plan (reads happen outside the
            // query), so the rewrite needs no per-batch anti-join fallback
            // — it only reclaims append-born files and crash orphans
            if (compactEvery.exists(n => (batchId + 1) % n == 0))
              comps.schedule("search") {
                graft.operators.Search.compactSearchIndex(batch.sparkSession, name)
              }
            if (vacuumEvery.exists(n => (batchId + 1) % n == 0))
              comps.schedule("search") {
                graft.operators.Lifecycle.vacuumSome(batch.sparkSession,
                  searchName = Some(name), keepGenerations = 1)
                ()
              }
          } }
          // vector-index maintenance: admitted docs become ANN-searchable
          // online — hashed-TF lexical vectors (no model, no vocabulary)
          // encoded with the index's FROZEN quantizer/codebooks and
          // appended into the cell tree. Same redacted-text rule as the
          // search index (what the corpus ships is what search returns).
          // Replay contract is the PQ family's own duplicate-until-
          // compacted (adjudicated on the batch append path): a replayed
          // batch's duplicate rows can transiently occupy extra rank
          // slots in a top-k tail until the cadence compaction's
          // dropDuplicates(vec_id) folds them — run a cadence when
          // replays are possible.
          val vectorT = () => { maintainVectorIndexPath.foreach { path =>
            comps.await("vector")
            graft.operators.Similarity.appendToPqIndex(
              graft.operators.TextAnalysis.lexicalVectors(
                admitted.select(col("doc_id"), col("text"))), path)
            if (compactEvery.exists(n => (batchId + 1) % n == 0))
              comps.schedule("vector") {
                graft.operators.Similarity.compactIvfIndex(batch.sparkSession, path)
              }
            if (vacuumEvery.exists(n => (batchId + 1) % n == 0))
              comps.schedule("vector") {
                graft.operators.Lifecycle.vacuumSome(batch.sparkSession,
                  ivfPath = Some(path), keepGenerations = 1)
                ()
              }
          } }
          // the trigger does not complete until every family has landed
          // (same completion point as the sequential form); Inf is the
          // foreachBatch contract — the streaming engine owns timeouts
          graft.Par.runAll(exportT, dedupT, searchT, vectorT)
          admitted.unpersist()
          ()
        }
        } finally { batch.unpersist(); () }
      }
      .trigger(Trigger.AvailableNow())
      .start() match { case inner => new DrainingQuery(inner, comps) }
  }
}
