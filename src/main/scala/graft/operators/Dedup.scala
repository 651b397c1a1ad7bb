package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.Pin.PinnedOps

import graft.functions.TextFunctions.{normText, qualityScore}

/** Deduplication operators for a large-scale training-data pipeline:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard, edit-distance, and
  * embedding-cosine near-dup.
  *
  * All content sketches are built over DISTINCT WORD-3-GRAM SHINGLES, not
  * unigram tokens: over a small vocabulary, unigram token sets of any two
  * documents overlap heavily (measured J ≈ 0.65 on the synthetic corpus —
  * every pair became a "near-dup" candidate and the LSH join degenerated
  * toward all-pairs). Shingle space is |vocab|^3, so unrelated docs share
  * ~3% of shingles while true near-dups stay at J ≥ 0.9.
  *
  * Scale stance: nothing here is all-pairs over the corpus — not even the
  * embedding path. Every near-dup operator is (cheap per-doc sketch) →
  * (band/bucket equi-join on a small key) → (verify only within
  * candidates). The exploded shingle relation is computed once per session
  * and persisted ([[shinglesCached]]) — round 1 recomputed it three times
  * per MinHash run.
  *
  * Oracle stance: all hashing is md5 (bit-identical in Spark and DuckDB),
  * MinHash takes the lexicographic min of salted md5 hex digests, and
  * Jaccard thresholds are integer cross-multiplications — no
  * floating-point anywhere except the embedding path, whose codegen'd
  * cosine accumulates in double in the same left-to-right order as the
  * oracle SQL.
  */
object Dedup {

  /** DataFrames this object persisted into the CacheManager, so
    * [[clearSessionState]] can actually evict them — unpersist is keyed by
    * the DataFrame's plan, so holding the handles is the only way to clear
    * entries we created without nuking caches we don't own. Keyed by
    * (session, canonicalized plan): the CacheManager already resolves
    * same-plan persists to one entry, so re-persisting must be idempotent
    * here too — an append-only buffer grew one duplicate handle per call
    * in a Verify-length session that never clears. */
  private val tracked = scala.collection.mutable.Map[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan),
    DataFrame]()

  /** Drop the session-scoped memoized artifacts: pair graph, cluster maps,
    * AND the persisted shingle cache (pre-round-6 this left the
    * CacheManager entry pinned for the session — a 100 TB leak, and it
    * made Bench's "cold" retries ride a warm shingle cache). Benchmark
    * hygiene: lets a re-measurement start cold, so repeated timings are
    * comparable to first runs. */
  def clearSessionState(): Unit = {
    graft.Memo.clear(pairCache, pairLocks)
    graft.Memo.clear(clusterCache, clusterLocks)
    bloomCache.clear()
    synchronized {
      tracked.values.foreach(df => try df.unpersist(blocking = false) catch { case _: Throwable => () })
      tracked.clear()
    }
  }

  /** Distinct whitespace tokens of the normalized text, one row per
    * (doc_id, token) — the unigram view (used by text-level ops, NOT by
    * the sketches; see class doc). */
  def tokens(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      explode(array_distinct(split(normText(col("text")), " "))).as("tok"))

  /** Per-doc distinct word-3-gram shingle array + its size, computed once
    * (native WordShingles expression — see graft.plans.WordShingles for
    * why not the higher-order-function chain). */
  def shingleArrays(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), col("source"),
        graft.plans.WordShingles.shingles(normText(col("text"))).as("gs"))
      // hs: the sorted xxhash64 view of the same shingle set, computed
      // once into the cache — the verify joins count overlap with a
      // native long merge instead of per-pair string intersection
      // (graft.plans.ShingleHashes), and ngram candidate generation
      // explodes these 8-byte keys instead of the shingle strings
      .select(col("doc_id"), col("source"), size(col("gs")).as("n_g"), col("gs"),
        graft.plans.ShingleHashes.sortedHashArray(col("gs")).as("hs"))

  /** [[shingleArrays]], persisted MEMORY_AND_DISK. The per-doc shingle
    * relation is the shared input of the MinHash signature build, the
    * SimHash votes, the n-gram inverted index, and every verify join —
    * without persistence each consumer re-scans and re-shingles the
    * corpus (round 1 paid that three times per MinHash run). Spark's
    * CacheManager keys cache entries by canonicalized logical plan, so
    * every call for the same `documents` plan (across queries in one
    * session) resolves to the SAME cache entry: one shingle pass per
    * corpus, not one per use. The compact array form is cached (one row
    * per doc); consumers that need exploded rows explode FROM the cache.
    * MEMORY_AND_DISK spills instead of evicting under pressure. */
  /** Persist `df` and track the handle (idempotent per canonicalized
    * plan). Re-checks the storage level on every call, not just on
    * insert: an external `spark.catalog.clearCache()` evicts the
    * CacheManager entry while the tracked handle lives on — storageLevel
    * reads the CacheManager, so this re-persists exactly when the entry
    * is actually gone. */
  private def persistTracked(df: DataFrame): DataFrame = {
    val (chosen, fresh) = synchronized {
      val key = (df.sparkSession, df.queryExecution.analyzed.canonicalized)
      val handle = tracked.getOrElseUpdate(key, df)
      if (handle.storageLevel == StorageLevel.NONE) {
        // the entry is gone (clearCache, or a DROP TABLE uncached it).
        // Re-persist the CALLER's df, not the stale handle: two plans can
        // canonicalize equal while pinning DIFFERENT file-listing
        // instances of the same table (drop → rebuild → swap leaves the
        // old handle listing files that no longer exist — re-persisting
        // it replays FileNotFound on the next materialization; this was a
        // real bug the N-invocation-per-JVM path hit, not a theoretical)
        tracked.put(key, df)
        df.persist(StorageLevel.MEMORY_AND_DISK)
        (df, true)
      } else (handle, false)
    }
    // eager timed fill on a fresh persist (outside the monitor — a slow
    // fill must not convoy unrelated artifacts): the build cost lands in
    // ONE attributable job instead of fusing invisibly into whichever
    // consumer acts first, and Bench discloses it per query as
    // query_cache_build_sec — the round-14 dedup_substring cold-retry
    // adjudication channel. Total work is unchanged (the first consumer
    // paid this exact pass before; now it reads cached blocks).
    // KNOWN LAZINESS TRADE (advisor, round 16): the fill makes
    // plan-BUILDER calls (shingleArraysCached etc.) run a materialization
    // job at DataFrame-construction time, fill failures surface from the
    // builder rather than the first consumer, and a concurrent same-plan
    // caller returns before the fill completes (it re-scans uncached
    // blocks — correct, just unshared work). All current callers are
    // serial per plan; if construction-time jobs ever become a problem,
    // the fix is awaiting an in-flight fill per key, not dropping the
    // eager fill (the attribution it buys is load-bearing for BenchDiff's
    // wall−build axis).
    if (fresh) graft.CacheBuild.timed { chosen.count(); () }
    chosen
  }

  def shingleArraysCached(documents: DataFrame): DataFrame =
    persistTracked(shingleArrays(documents))

  /** Exploded shingle rows (doc_id, source, n_g, g), derived from the
    * cached array relation. */
  def shingles(documents: DataFrame): DataFrame =
    shingleArraysCached(documents)
      .select(col("doc_id"), col("source"), col("n_g"), explode(col("gs")).as("g"))

  /** Exact dedup: keep the smallest doc_id per identical text, keyed by
    * the 16-byte md5 of the RAW text — the shuffle key is the digest,
    * never the document (grouping by `text` directly would ship every
    * distinct doc across the wire whole; at 100 TB the shuffle IS the
    * corpus). Assumes md5 is collision-free over the corpus: a collision
    * would merge two distinct texts into one keeper — at 2^-64-scale
    * probability for even a trillion docs, the accepted trade everywhere
    * else in this engine ([[exactNormalized]], the dedup index, the
    * streaming fingerprint state). The raw-text digest preserves exact
    * (un-normalized) semantics, so the oracle's GROUP BY text is
    * value-identical. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
      .orderBy("doc_id")

  /** Exact dedup after normalization (lower/trim/collapse-ws), keyed by
    * md5 fingerprint — the form that scales: the shuffle key is 16 bytes,
    * not the document. */
  def exactNormalized(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(normText(col("text"))).as("fp"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_count"))
      .select(col("doc_id"), col("dup_count"))
      .orderBy("doc_id")

  /** MinHash signature hashes: h_i(doc) = min over shingles of
    * md5(i ":" shingle) — lexicographic min of hex digests, a valid
    * minwise hash family reproducible in any engine with md5. */
  val MinhashSeeds = 8
  val MinhashBands = 4 // 2 rows per band

  /** Signature build from a (doc_id, …, gs) shingle-ARRAY relation —
    * shared by the corpus path (the cached arrays) and the streaming
    * append path (a batch-local array relation, see
    * [[appendToDedupIndex]]). One native pass per document
    * (graft.plans.MinHashHex), zero shuffle — replacing the exploded
    * k-column min aggregate (min(md5(i":"g)) per seed over
    * (docs × shingles) rows), which profiled at ~1.1-1.6 s of the
    * minhash family's cost at sf0.1 (tools/ProfileSimhash). The
    * size > 0 filter keeps the exploded form's contract: a zero-shingle
    * doc produced no vote rows and so no signature. The 8 element_at
    * projections collapse to ONE compute call via whole-stage codegen's
    * subexpression elimination (timing-checked in tools/ProfileSimhash:
    * the build reads ~0.5 s, not 8× the single-pass md5 work). */
  private def minhashSignaturesFrom(arrRows: DataFrame): DataFrame = {
    val mh = graft.plans.MinHashHex.minhashHex(col("gs"), MinhashSeeds)
    val cols = (0 until MinhashSeeds).map(i => element_at(mh, i + 1).as(s"h$i"))
    arrRows.filter(size(col("gs")) > 0)
      .select(col("doc_id") +: cols: _*)
  }

  def minhashSignatures(documents: DataFrame): DataFrame =
    minhashSignaturesFrom(shingleArraysCached(documents))

  /** Exact-overlap verify: attach both docs' cached shingle arrays to each
    * candidate pair and count the intersection in-place
    * (`array_intersect`, codegen'd, arrays already distinct) — one row per
    * candidate, instead of re-exploding both shingle sets into a
    * pair × shingle join (round 1's verify was the most expensive part of
    * both sketch paths). Emits (doc_a, doc_b, na, nb, shared). */
  private def verifyOverlap(candidates: DataFrame, documents: DataFrame): DataFrame = {
    val arr = shingleArraysCached(documents)
    candidates
      .join(arr.select(col("doc_id"), col("n_g").as("na"), col("hs").as("ha")),
        col("doc_a") === col("doc_id")).drop("doc_id")
      .join(arr.select(col("doc_id"), col("n_g").as("nb"), col("hs").as("hb")),
        col("doc_b") === col("doc_id")).drop("doc_id")
      // native sorted-long merge (see graft.plans.ShingleHashes): exact
      // modulo xxhash64 collisions within one pair's shingle sets, the
      // documented trade; the string-array intersection this replaces
      // re-hashed every shingle of both docs per candidate pair
      .withColumn("shared",
        graft.plans.ShingleHashes.intersectCount(col("ha"), col("hb")))
      .select(col("doc_a"), col("doc_b"), col("na"), col("nb"), col("shared"))
  }

  /** Verified MinHash pair graphs keyed by (session, canonicalized corpus
    * plan): the pair graph is THE shared dedup artifact — the pairs query,
    * the connected-components clustering, the cross-source matrix and the
    * curation pass all consume it, and each would otherwise re-run the
    * signature build + band join + verify. localCheckpointed (session
    * state → session-scoped key, like [[clusterCache]]); at 100 TB this is
    * the pair list a pipeline materializes to storage once per corpus
    * snapshot. */
  private val pairCache = scala.collection.concurrent.TrieMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan), DataFrame]()
  private val pairLocks = scala.collection.concurrent.TrieMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan), AnyRef]()

  /** Unordered verified near-dup pair graph (doc_a < doc_b), memoized per
    * corpus per session with per-key build serialization (graft.Memo —
    * build-once without convoying unrelated corpora behind one lock). */
  def minhashPairs(documents: DataFrame): DataFrame = {
    val key = (documents.sparkSession, documents.queryExecution.analyzed.canonicalized)
    graft.Memo.buildOnce(pairCache, pairLocks, key)(computeMinhashPairs(documents))
  }

  /** (doc_id, band_idx, band_key) — the LSH band table both the pair
    * join and the skew monitor read. Input is the shingle-ARRAY
    * relation (doc_id, …, gs), same contract as
    * [[minhashSignaturesFrom]]. */
  private def bandTableFrom(arrRows: DataFrame): DataFrame = {
    val sig = minhashSignaturesFrom(arrRows)
    val bandCols = array((0 until MinhashBands).map { b =>
      md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}")))
    }: _*)
    sig.select(col("doc_id"), posexplode(bandCols))
      .toDF("doc_id", "band_idx", "band_key")
  }

  private def bandTable(documents: DataFrame): DataFrame =
    bandTableFrom(shingleArraysCached(documents))

  /** LSH bucket-skew monitor: the most-populated colliding band buckets.
    * A hot bucket generates O(n²) candidate pairs — this is the view a
    * pipeline alerts on before a skewed shard melts the verify join
    * (the dedup-side analogue of [[Similarity.bucketStats]]). Bounded
    * output: aggregate per (band, key), keep colliding buckets, top-k by
    * occupancy via TakeOrdered. */
  def minhashBandStats(documents: DataFrame, k: Int = 20): DataFrame =
    bandTable(documents)
      .groupBy(col("band_idx").cast("long").as("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .orderBy(col("n_docs").desc, col("band_idx"), col("band_key"))
      .limit(k)

  /** Per-doc shingle NOVELTY score: the fraction of a doc's distinct
    * word-3-gram shingles that occur in NO other document, in integer
    * milli — the per-document duplication metric (RefinedWeb-style) that
    * complements the pairwise dedup family: pairwise ops answer "which
    * docs are near-copies of each other", this answers "how much of THIS
    * doc is recycled text" — a doc can pass every near-dup gate while
    * being stitched entirely from widely-repeated passages, and this is
    * the score that catches it (low novelty, no single dominant match).
    * Emits (doc_id, n_shingles, n_shared, novelty_milli); docs with < 3
    * tokens emit nothing (no shingle to score — the quality gate owns
    * degenerate docs, same contract as the LM scores).
    *
    * Scale shape: shingle document-frequency is a hash aggregate over
    * the cached shingle relation (partial agg map-side; the shuffle
    * carries (shingle, count), never text), and the score join back is
    * keyed on the shingle — the Zipf head lives in boilerplate shingles,
    * so the df table's hot head (bounded top-[[TextAnalysis.HotVocab]]
    * rows) broadcasts and joins map-side while only the long tail takes
    * the shuffle join, the same skew split as the token-rarity scores. */
  def shingleNovelty(documents: DataFrame): DataFrame = {
    val ex = shingles(documents).select(col("doc_id"), col("g"))
    val df_ = ex.groupBy(col("g")).agg(count(lit(1)).as("df"))
    val hot = broadcast(
      df_.orderBy(col("df").desc, col("g")).limit(TextAnalysis.HotVocab))
    val head = ex.join(hot, "g")
    val tail = ex.join(hot.select(col("g")), Seq("g"), "left_anti").join(df_, "g")
    head.unionByName(tail)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast("long").as("n_shingles"),
        sum(when(col("df") > 1, 1).otherwise(0)).cast("long").as("n_shared"),
        expr("((count(1) - sum(CASE WHEN df > 1 THEN 1 ELSE 0 END)) * 1000) div count(1)")
          .as("novelty_milli"))
      .orderBy("doc_id")
  }

  private def computeMinhashPairs(documents: DataFrame): DataFrame = {
    val bands = bandTable(documents)
    val candidates = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verifyOverlap(candidates, documents)
      .filter(col("shared") * 3 >= col("na") + col("nb"))
      .select(col("doc_a"), col("doc_b"))
      .pinned()
  }

  /** MinHash + LSH near-dup pairs, with an exact-Jaccard verify step.
    * Banding: 4 bands × 2 rows; a pair is a candidate if any band's
    * concatenated digest collides. Candidates are then verified at
    * Jaccard >= 1/2 via integer math (3*shared >= |A|+|B|). */
  def minhashLsh(documents: DataFrame): DataFrame =
    minhashPairs(documents).orderBy("doc_a", "doc_b")

  /** Incremental (cross-corpus) dedup — the INGESTION-time operator:
    * admit only the docs of a NEW batch that duplicate nothing in the
    * EXISTING corpus, without ever pairing the existing corpus against
    * itself (its own dedup already ran when it was ingested). Stage 1
    * drops exact matches with a 16-byte normalized-fingerprint anti-join;
    * stage 2 equi-joins the new batch's MinHash band keys against the
    * existing side's band table only (never new × new or existing ×
    * existing), verifies candidates at Jaccard >= 1/2 by exact shingle
    * intersection, and anti-joins the confirmed near-dups away.
    *
    * At 100 TB the existing side's fingerprint set, band table and
    * shingle arrays are the persistent dedup INDEX a pipeline maintains
    * incrementally — [[saveDedupIndex]] materializes them as bucketed
    * tables and the [[DedupIndex]] overload consumes them without ever
    * re-reading or re-shingling the corpus; the new batch (hours of
    * ingest) is orders of magnitude smaller, so every join here is
    * (small batch) × (bucketed index) on short hash keys — existing
    * document text never shuffles. */
  def incrementalDedup(newDocs: DataFrame, existing: DataFrame): DataFrame =
    incrementalDedupCore(newDocs, DedupIndex(
      existing.select(md5(normText(col("text"))).as("fp")).distinct(),
      bandTable(existing),
      shingleArraysCached(existing).select(col("doc_id"), col("n_g"), col("gs"))))

  /** [[incrementalDedup]] against a PERSISTED index ([[loadDedupIndex]]) —
    * the deployment path: the existing corpus is never re-read, never
    * re-shingled; every existing-side relation is a bucketed table scan. */
  def incrementalDedup(newDocs: DataFrame, index: DedupIndex): DataFrame =
    incrementalDedupCore(newDocs, index)

  /** The plan both overloads share. UNORDERED on purpose: the admitted
    * set is a production output (it feeds a writer), and a total-order
    * exchange over the batch buys nothing there — the oracle-facing query
    * (SparkEntry "incremental_dedup") adds the orderBy for hash
    * determinism, the same pattern as the other oracle-ordered outputs. */
  private def incrementalDedupCore(newDocs: DataFrame, ix: DedupIndex): DataFrame = {
    val exactOk = newDocs
      .withColumn("fp", md5(normText(col("text"))))
      .join(ix.fp.select(col("fp")), Seq("fp"), "left_anti")
      .select(col("doc_id"), col("text"), col("source"))
    val exBands = ix.bands
      .select(col("doc_id").as("doc_b"), col("band_idx").as("bi"), col("band_key").as("bk"))
    val candidates = bandTable(exactOk)
      .join(exBands, col("band_idx") === col("bi") && col("band_key") === col("bk"))
      .select(col("doc_id").as("doc_a"), col("doc_b"))
      .distinct()
    val nearDup = candidates
      .join(shingleArraysCached(exactOk)
        .select(col("doc_id").as("doc_a"), col("n_g").as("na"), col("gs").as("ga")), Seq("doc_a"))
      .join(ix.shingles
        .select(col("doc_id").as("doc_b"), col("n_g").as("nb"), col("gs").as("gb")), Seq("doc_b"))
      .withColumn("shared", size(array_intersect(col("ga"), col("gb"))).cast("long"))
      .filter(col("shared") * 3 >= col("na") + col("nb"))
      .select(col("doc_a"))
      .distinct()
    exactOk
      .join(nearDup, col("doc_id") === col("doc_a"), "left_anti")
      .select(col("doc_id"), col("source"))
  }

  /** The persistent incremental-dedup INDEX of an already-ingested
    * corpus: the three relations [[incrementalDedup]] consumes from the
    * existing side — exact-content fingerprints, MinHash band keys, and
    * per-doc shingle arrays for the Jaccard verify. At 100 TB this is the
    * artifact an ingestion pipeline maintains instead of re-sketching the
    * corpus per batch: materialized once per corpus snapshot, appended as
    * batches are admitted. */
  final case class DedupIndex(fp: DataFrame, bands: DataFrame, shingles: DataFrame)

  /** Materialize `existing`'s dedup index as three bucketed catalog
    * tables — `<name>_fp` (bucketed by fp), `<name>_bands` (by band_key),
    * `<name>_shingles` (by doc_id) — via
    * [[graft.sources.FileFormats.writeBucketed]]: the write pays each
    * table's shuffle once, and the per-batch joins of
    * [[incrementalDedup]] then hit pre-bucketed scans on exactly their
    * join keys. The model-artifact pattern of
    * [[Similarity.saveQuantizer]], applied to the dedup state. */
  def saveDedupIndex(existing: DataFrame, name: String, buckets: Int = 8): Unit = {
    import graft.sources.FileFormats.writeBucketed
    // fp rows carry doc_id (one row per doc, not one per distinct fp):
    // the anti-join consumers only read the fp column — multiplicity is
    // invisible to them — but doc_id is what lets [[applyCorpusDiff]]
    // remove exactly one document's fingerprint while an identical-text
    // SURVIVOR's row keeps blocking that content
    writeBucketed(existing.select(md5(normText(col("text"))).as("fp"), col("doc_id")).distinct(),
      s"${name}_fp", "fp", buckets)
    // the cached array relation feeds BOTH band derivation (via
    // bandTable → shingles → shingleArraysCached) and the _shingles
    // table: shingling — the expensive normalize+split+3-gram pass —
    // runs once per corpus snapshot, not once per output table.
    // Materialize it BEFORE the concurrent writers (racing the cache
    // fill would duplicate that pass), then write the two
    // shingle-derived tables as concurrent jobs — same disjoint-table
    // argument as the appendToDedupIndex fast path, same idempotent
    // rebuild-on-crash story (the fp write above runs first and alone:
    // it scans the raw corpus, not the cache, and keeping one writer
    // serial bounds the build's peak concurrent shuffle footprint)
    shingleArraysCached(existing).count()
    graft.Par.runAll(
      () => writeBucketed(bandTable(existing), s"${name}_bands", "band_key", buckets),
      () => writeBucketed(
        shingleArraysCached(existing).select(col("doc_id"), col("n_g"), col("gs")),
        s"${name}_shingles", "doc_id", buckets))
  }

  /** Drop a persisted index completely — catalog entries AND any
    * orphaned managed-table locations a PREVIOUS session left under the
    * same warehouse dir (a fresh in-memory catalog doesn't know the
    * table, but `saveAsTable` still refuses to reuse its leftover
    * location). The lifecycle complement of [[saveDedupIndex]]; callers
    * that rebuild an index from scratch in a new session run this
    * first. */
  def dropDedupIndex(spark: org.apache.spark.sql.SparkSession, name: String): Unit =
    for (s <- Seq("_fp", "_bands", "_shingles")) {
      val t = name + s
      try spark.sql(s"DROP TABLE IF EXISTS `$t`")
      catch { case _: Throwable => () }
      try {
        val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
        val loc = new org.apache.hadoop.fs.Path(wh, t.toLowerCase(java.util.Locale.ROOT))
        val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(loc, true)
      } catch { case _: Throwable => () }
    }

  def loadDedupIndex(spark: org.apache.spark.sql.SparkSession, name: String): DedupIndex = {
    // refresh-on-read: appends may have landed from OTHER sessions (a
    // streaming foreachBatch runs under a cloned session) and table
    // relations cache per session — invalidate this session's entries so
    // a load always sees the current files. Best-effort: a missing table
    // surfaces as a meaningful error from spark.table below, not here.
    Seq("_fp", "_bands", "_shingles").foreach { s =>
      graft.sources.FileFormats.healTornSwap(spark, name + s)
      try spark.catalog.refreshTable(name + s)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    DedupIndex(
      spark.table(s"${name}_fp"),
      spark.table(s"${name}_bands"),
      spark.table(s"${name}_shingles"))
  }

  /** The MAINTENANCE half of the incremental contract: after
    * [[incrementalDedup]] admits a batch, append the batch's
    * fingerprints, band keys and shingle arrays to the persisted index so
    * the NEXT batch is deduped against them too — the index grows with
    * the corpus, and no batch ever re-sketches what came before it.
    * Appends use the tables' existing bucketing spec, so the layout keeps
    * serving bucket-aligned joins; each append costs one shuffle of the
    * BATCH (not the corpus). Each append adds one file set per bucket, so
    * after many small batches the index wants the standard warehouse
    * compaction (rewrite via [[saveDedupIndex]] over the full corpus at
    * the next snapshot) — the dedup RESULTS are unaffected either way
    * (duplicate/fragmented index rows cannot change an anti-join or
    * candidate-distinct outcome).
    *
    * Schema evolution (see [[IndexSchemaException]]): the batch must
    * carry `doc_id` and `text`; anything else it grew is ignored (the
    * fp/bands/shingles writers project their canonical columns), and a
    * missing required column throws the named contract error before any
    * table is touched. */
  def appendToDedupIndex(admitted: DataFrame, name: String): Unit = {
    IndexSchema.requireColumns(admitted, "dedup", Seq("doc_id", "text"))
    // the append MUST use the existing tables' own bucket spec — Spark
    // rejects an Append whose bucketBy disagrees with the table's — so
    // read the bucket count out of each table's catalog metadata instead
    // of trusting a caller-supplied number to match whatever
    // [[saveDedupIndex]] was called with (an index saved at buckets=32
    // would otherwise fail every maintenance append at runtime)
    val catalog = admitted.sparkSession.sessionState.catalog
    // a compaction crash between swap renames must not wedge the
    // streaming maintenance path: the replayed trigger appends FIRST
    // (before the cadence compaction that would heal), so the append
    // verb itself restores a torn table before reading its metadata
    for (s <- Seq("_fp", "_bands", "_shingles"))
      graft.sources.FileFormats.healTornSwap(admitted.sparkSession, name + s)
    def bucketsOf(table: String): Int =
      catalog.getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
        .bucketSpec.map(_.numBuckets).getOrElse(8)
    // repartition on the bucket key to EXACTLY the bucket count before
    // writing: repartition's hash partitioning is the same murmur3-pmod
    // the bucketed write assigns bucket ids with, so each task holds one
    // bucket's rows and the append lands ONE file per bucket — without
    // it, every writer task touches every bucket it has rows for
    // (tasks × buckets files per append; observed 4622 files across an
    // 8-batch streamed run pre-compaction). The extra shuffle is
    // batch-sized — trivial next to the file-creation overhead it kills.
    def app(df: DataFrame, table: String, key: String): Unit = {
      val n = bucketsOf(table)
      df.repartition(n, col(key))
        .write.mode(org.apache.spark.sql.SaveMode.Append)
        .bucketBy(n, key).sortBy(key).saveAsTable(table)
    }
    // ONE shingle pass feeds both the bands and shingles appends,
    // persisted batch-locally and dropped at the end: the per-plan
    // tracked cache would grow by one never-reused entry per micro-batch
    // in a streaming sink (each batch is a fresh plan), and the uncached
    // path would shingle the batch twice
    // prune to the columns the two consumers read BEFORE persisting:
    // the bands append needs (doc_id, gs), the shingles append
    // (doc_id, n_g, gs) — without the select every micro-batch would
    // compute and cache the hashed-shingle view (hs) no appended table
    // stores (the persisted index schema stays gs-only on purpose)
    val sh = shingleArrays(admitted).select(col("doc_id"), col("n_g"), col("gs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      sh.count() // materialize once before the three writers race to fill it
      // the three appends hit three DIFFERENT tables: run them as
      // concurrent Spark jobs instead of paying three sequential write
      // commits per micro-batch (the scheduler interleaves their stages
      // across the same executors; catalog mutations are per-table).
      // Crash atomicity is unchanged from the sequential form — a batch
      // that dies mid-append leaves some tables appended and some not,
      // and the at-least-once replay re-appends all three; duplicate
      // index rows cannot change an anti-join/candidate outcome.
      graft.Par.runAll(
        () => app(
          admitted.select(md5(normText(col("text"))).as("fp"), col("doc_id")).distinct(),
          s"${name}_fp", "fp"),
        () => app(bandTableFrom(sh.select(col("doc_id"), col("gs"))),
          s"${name}_bands", "band_key"),
        () => app(sh.select(col("doc_id"), col("n_g"), col("gs")),
          s"${name}_shingles", "doc_id"))
    } finally sh.unpersist()
    // readers cache a table's resolved relation (file listing included)
    // PER SESSION — and a streaming foreachBatch hands this code a CLONED
    // session, so refreshing only `admitted.sparkSession` would leave the
    // parent session (whose spark.table the pipeline's static side and
    // the next caller resolve) serving the pre-append listing. Refresh
    // every session we can see: the writer's, the default, the active.
    refreshIndexAcrossSessions(admitted.sparkSession, name)
  }

  /** Invalidate the three index tables' cached relations on every session
    * this code can see (writer's, default, active) — required after any
    * in-place mutation (append or compaction rewrite) performed from a
    * foreachBatch CLONE, whose writes the parent session's per-session
    * listing cache would otherwise never notice. Best-effort per session:
    * one that cannot resolve the table (a concurrent writer mid-overwrite,
    * a thread-local session with a different view) has no stale entry to
    * refresh — never let the refresh fail a mutation whose writes already
    * committed. */
  private def refreshIndexAcrossSessions(
      writer: org.apache.spark.sql.SparkSession, name: String): Unit = {
    val sessions = (Seq(writer) ++
      org.apache.spark.sql.SparkSession.getDefaultSession.toSeq ++
      org.apache.spark.sql.SparkSession.getActiveSession.toSeq).distinct
    for (s <- Seq("_fp", "_bands", "_shingles"); ss <- sessions)
      try ss.catalog.refreshTable(name + s)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
  }

  /** COMPACTION — the missing half of the append story: every
    * [[appendToDedupIndex]] adds one file set per bucket, so after many
    * small batches each bucket is a pile of tiny files and the
    * bucket-aligned scans the layout exists for spend their time in
    * per-file open cost. Rewrite all three tables in place — one
    * bucketed write each (the same shuffle a fresh [[saveDedupIndex]]
    * pays, WITHOUT re-reading or re-sketching the corpus: the inputs are
    * the index tables themselves), via
    * [[graft.sources.FileFormats.writeBucketedSwap]]: the new content is
    * written ONCE to a staged table and swapped into place with catalog
    * renames (1× write IO; a naive earlier rename attempt died on stale
    * cached listings — the swap's explicit `refreshByPath` plus the
    * fresh-plan re-persist in the tracked shingle cache are what make
    * the rename form safe, both spec-pinned). A crash between the two
    * renames leaves `<t>__old`, which every rewrite/append verb heals at
    * entry. Each table keeps its own catalog bucket spec.
    *
    * Compaction also folds the duplicate rows at-least-once maintenance
    * may have appended (a replayed micro-batch appends its rows twice):
    * `fp`/`bands` dedupe whole rows, `shingles` by doc_id (replay rows
    * are identical, so any survivor is the right one). Duplicates never
    * affected RESULTS — an anti-join/candidate-distinct can't see
    * multiplicity — they only cost bytes, which is exactly what
    * compaction reclaims. Recommended cadence: per corpus snapshot, or
    * whenever per-bucket file counts pass the warehouse's small-file
    * threshold ([[TrainingPipeline]]'s maintained index after N
    * micro-batches is the canonical caller). */
  /** The staged-swap rewrite all three index tables share: `canon` is
    * the per-table canonicalization the caller wants folded into the
    * rewrite. */
  private def rewriteIndexTables(spark: org.apache.spark.sql.SparkSession, name: String,
                                 canon: String => DataFrame => DataFrame): Unit = {
    val catalog = spark.sessionState.catalog
    def rewriteOne(suffix: String, key: String): Unit = {
      val t = name + suffix
      // a prior rewrite's crash between swap renames leaves t missing —
      // restore before reading it as this rewrite's input
      graft.sources.FileFormats.healTornSwap(spark, t)
      try spark.catalog.refreshTable(t)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
      val buckets = catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
        .bucketSpec.map(_.numBuckets).getOrElse(8)
      // staged SWAP, not staged copy-back: the rewrite pays its IO once
      // and the swap is two catalog renames (see writeBucketedSwap for
      // the torn-swap recovery contract)
      graft.sources.FileFormats.writeBucketedSwap(
        canon(suffix)(spark.table(t)), t, key, buckets)
    }
    // three disjoint tables, three independent staged swaps — the same
    // concurrent-families discipline as every other multi-table verb
    graft.Par.runAll(
      () => rewriteOne("_fp", "fp"),
      () => rewriteOne("_bands", "band_key"),
      () => rewriteOne("_shingles", "doc_id"))
    // same cross-session visibility contract as the append path: a
    // rewrite run from a foreachBatch clone must not leave the parent
    // session's listing cache serving the pre-rewrite files
    refreshIndexAcrossSessions(spark, name)
  }

  /** Replay-fold canonicalization per table: `fp`/`bands` dedupe whole
    * rows, `shingles` by doc_id (replay rows are identical, so any
    * survivor is the right one). */
  private def indexCanon(suffix: String): DataFrame => DataFrame = suffix match {
    case "_shingles" => _.dropDuplicates("doc_id")
    case _ => _.distinct()
  }

  /** Removal-only rewrite with TOUCHED-BUCKET pruning: when the doomed
    * set is small enough that probing pays (see the coupon-collector
    * gate below), locate the buckets actually holding doomed rows and
    * rewrite ONLY those via
    * [[graft.sources.FileFormats.writeBucketedSwapPartial]] — untouched
    * buckets' files MOVE, unread and unwritten, so a takedown of k docs
    * costs IO proportional to the buckets they touch, not the index.
    * `_shingles` buckets on doc_id, so its affected set comes straight
    * from the diff (no scan); `_fp`/`_bands` bucket on content keys a
    * doc_id-only diff can't hash, so those locate by one broadcast
    * semi-join scan (read-only — the expensive half of a rewrite is the
    * shuffle+write, which partial pruning skips). Falls back to the full
    * staged swap when every bucket is touched. */
  private def removalRewrite(spark: org.apache.spark.sql.SparkSession, name: String,
                             gone: DataFrame, goneCount: Long): Unit = {
    import graft.sources.FileFormats
    val catalog = spark.sessionState.catalog
    def one(suffix: String, key: String): Unit = {
      val t = name + suffix
      FileFormats.healTornSwap(spark, t)
      try spark.catalog.refreshTable(t)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
      val buckets = catalog
        .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(t))
        .bucketSpec.map(_.numBuckets).getOrElse(8)
      def dropGone(df: DataFrame): DataFrame = {
        val cols = df.columns.map(col)
        indexCanon(suffix)(df).join(gone, Seq("doc_id"), "left_anti").select(cols: _*)
      }
      // coupon-collector gate: ≥ 16×buckets random keys hit every bucket
      // with probability ≈ 1 − buckets·(1−1/buckets)^(16·buckets) — the
      // probe job would be a wasted scan, go straight to the full swap
      val affected: Option[Set[Int]] =
        if (goneCount >= buckets.toLong * 16) None
        else Some(suffix match {
          case "_shingles" => gone
            .select(FileFormats.bucketIdCol(col("doc_id"), buckets).as("b"))
            .distinct().collect().map(_.getInt(0)).toSet
          case _ => spark.table(t)
            .join(broadcast(gone), Seq("doc_id"), "left_semi")
            .select(FileFormats.bucketIdCol(col(key), buckets).as("b"))
            .distinct().collect().map(_.getInt(0)).toSet
        })
      affected match {
        case Some(a) if a.isEmpty => () // the diff touches nothing here
        case Some(a) if a.size < buckets =>
          FileFormats.writeBucketedSwapPartial(
            dropGone(FileFormats.readBuckets(spark, t, a)), t, key, buckets, a)
        case _ =>
          FileFormats.writeBucketedSwap(dropGone(spark.table(t)), t, key, buckets)
      }
    }
    graft.Par.runAll(
      () => one("_fp", "fp"),
      () => one("_bands", "band_key"),
      () => one("_shingles", "doc_id"))
    refreshIndexAcrossSessions(spark, name)
  }

  def compactDedupIndex(spark: org.apache.spark.sql.SparkSession, name: String): Unit =
    rewriteIndexTables(spark, name, indexCanon)

  /** Consolidate N shard-local indexes into ONE — the merge half of the
    * scale-out story the streaming measurements prescribe: past the
    * per-query driver ceiling (STREAMSCALE_r16), ingestion runs as N
    * pipelines over disjoint input shards, each maintaining its own
    * index ([[graft.tools.StreamShardBench]] measures that shape), and
    * the global dedup view comes from merging the SHARD INDEXES — never
    * from re-sketching the corpus. Every table is a row-level function
    * of (doc_id, text) (fp = md5 of normalized text; bands = banded
    * minhash of the doc's own shingles; shingles = the doc's own gram
    * arrays — no corpus-dependent statistic anywhere), so the merge is a
    * bucketed union of index ROWS: cost = index size, one shuffle per
    * table, corpus text never re-read or re-shingled. Rows fold under
    * the same replay canonicalization compaction applies
    * ([[indexCanon]]): a doc two shards both ingested collapses to one
    * row set.
    *
    * Contract (spec-pinned in DedupSpec): merge(shards) produces
    * row-identical tables to a fresh [[saveDedupIndex]] over the union
    * of the shards' corpora, so every downstream consumer
    * ([[incrementalDedup]], [[applyCorpusDiff]], takedowns, compaction,
    * vacuum) sees a single-index world. Precondition: shards' doc_id
    * spaces are disjoint, or colliding ids carry identical text (a
    * doc_id reused for DIFFERENT text would fold arbitrarily — the same
    * rule the append path lives by). The target must be a new name
    * ([[dropDedupIndex]] it first to rebuild); sources stay untouched
    * and fully readable throughout — at a deployment the merge runs
    * beside live shard pipelines and cuts over readers by name. */
  def mergeDedupIndexes(spark: org.apache.spark.sql.SparkSession, sources: Seq[String],
                        target: String, buckets: Int = 8): Unit = {
    require(sources.nonEmpty, "mergeDedupIndexes needs at least one source index")
    require(!sources.contains(target),
      s"merge target '$target' must not be a source — sources stay readable during the merge")
    val idxs = sources.map(loadDedupIndex(spark, _)) // heals + refreshes each source
    def merged(pick: DedupIndex => DataFrame): DataFrame =
      idxs.map(pick).reduce(_ unionByName _)
    import graft.sources.FileFormats.writeBucketed
    // three disjoint target tables — the standard concurrent-families
    // discipline; each write is ONE bucketed shuffle of union-of-indexes
    graft.Par.runAll(
      () => writeBucketed(indexCanon("_fp")(merged(_.fp)), s"${target}_fp", "fp", buckets),
      () => writeBucketed(indexCanon("_bands")(merged(_.bands)), s"${target}_bands", "band_key", buckets),
      () => writeBucketed(indexCanon("_shingles")(merged(_.shingles)),
        s"${target}_shingles", "doc_id", buckets))
    refreshIndexAcrossSessions(spark, target)
  }

  /** DELTA-MERGE a corpus diff into the persisted index — the maintenance
    * operation [[corpusDiff]]-style snapshot audits imply but appends
    * alone can't deliver: REMOVED docs' fingerprints/bands/shingles must
    * leave the index (a takedown obligation at 100 TB — an appended-only
    * index blocks re-ingestion of content the corpus no longer contains
    * and keeps matching against deleted text forever), and CHANGED docs
    * must be re-sketched under their new content.
    *
    * `removed` needs (doc_id); `changed` needs (doc_id, text, source) with
    * the NEW content. Mechanics: one staged rewrite of the three tables
    * (the [[compactDedupIndex]] machinery) with BOTH halves of the diff
    * folded into the same pass — the doc_id anti-join drops
    * removed/changed rows and the changed docs' NEW sketches are unioned
    * into the staged write, so the whole merge costs exactly a
    * compaction (no separate append pass). All three
    * tables carry doc_id, so removal is an exact per-document operation:
    * an identical-text SURVIVOR keeps its own fp row and continues to
    * block that content — which is what makes
    * N-append + M-remove + compact ≡ fresh-save over the remaining corpus
    * hold EXACTLY (spec-pinned in DedupSpec, including the shared-text
    * case). Shuffle shape: the anti-join keys are doc_ids against a
    * diff-sized relation; corpus text is never re-read or re-shingled. */
  def applyCorpusDiff(spark: org.apache.spark.sql.SparkSession, name: String,
                      removed: DataFrame, changed: DataFrame): Unit = {
    // checkpoint the diff inputs: both are diff-sized, and pinning them
    // guarantees the three table rewrites (and a caller whose diff
    // derives from the index itself) all see one consistent snapshot
    val gone = removed.select(col("doc_id"))
      .union(changed.select(col("doc_id"))).distinct().pinned()
    val changedC = changed.pinned()
    // removal-only fast path (the takedown/forget shape): with no changed
    // docs, skip the fresh-sketch branches entirely — unioning an empty
    // frame still costs each table rewrite the whole shingling/banding
    // plan (scan, normalize, explode, hash) for zero rows, a fixed tax
    // the forget cascade paid three times per call. The pin above makes
    // the emptiness probe a metadata-cheap read of the materialized diff.
    val hasChanged = changedC.limit(1).count() > 0
    if (!hasChanged) {
      // removal-only diffs additionally get touched-bucket pruning (the
      // changed-doc path keeps the full rewrite: fresh sketches land in
      // buckets only their own hashing can name, and a diff that big is
      // compaction-adjacent anyway)
      removalRewrite(spark, name, gone, gone.count())
      return
    }
    rewriteIndexTables(spark, name,
      suffix => df => {
        // the equi-join hoists doc_id to the front — re-select the
        // table's own column order so the rewrite never changes schema
        val cols = df.columns.map(col)
        val kept = indexCanon(suffix)(df)
          .join(gone, Seq("doc_id"), "left_anti").select(cols: _*)
        val fresh = suffix match {
          case "_fp" =>
            changedC.select(md5(normText(col("text"))).as("fp"), col("doc_id")).distinct()
          case "_bands" => bandTable(changedC)
          case _ => shingleArrays(changedC).select(col("doc_id"), col("n_g"), col("gs"))
        }
        kept.unionByName(fresh.select(cols: _*))
      })
  }

  /** SimHash geometry: a 64-bit signature banded as 4 × 16-bit for
    * candidate generation. Pigeonhole: hamming ≤ 3 flips damage at most 3
    * of the 4 bands, so at least one band survives intact — recall 1 for
    * the hamming ≤ 3 contract, same argument as the old 4 × 8-bit banding
    * but over a 4 × 65536-key space instead of 4 × 256. The keyspace is
    * the scale property: with ≤ 1024 distinct join keys (the 32-bit
    * layout), every corpus doc landed in 4 of ~256 buckets per band, so
    * bucket population grew LINEARLY with corpus size and candidate pairs
    * QUADRATICALLY — ~10⁶ rows per bucket at 10⁹ docs, ~5·10¹¹ pairs per
    * bucket before the hamming filter, guaranteed by the keyspace no
    * matter how uniform the signatures. At 65536 keys per band a uniform
    * 10⁹-doc corpus holds ~15k rows per bucket (~10⁸ pairs — large but
    * shuffle-tractable and falling quadratically as the keyspace widens);
    * the residual skew risk (near-constant corpora vote the same way) is
    * handled by [[SimhashMaxBucket]] below, not by hoping. */
  val SimhashBits = 64
  val SimhashBands = 4
  val SimhashBandBits = 16 // 64 / 4; key mask below is (1<<16)-1

  /** Disclosed hot-bucket cap for [[simhashPairs]] candidate generation —
    * the same guard class as [[ngramJaccard]]'s df cut: a band bucket
    * holding more than this many docs is dropped from candidate
    * generation (bounding per-bucket pairs at cap²/2 ≈ 5·10⁵), and
    * [[simhashBandStats]] is the monitoring view that DISCLOSES which
    * buckets were hot instead of silently melting the join. A bucket that
    * hot means ≥ cap docs share 16 identical signature bits — on real
    * corpora that is boilerplate/near-constant text, exactly the
    * population exact-dedup and the minhash path already handle. */
  val SimhashMaxBucket = 1000

  /** 64-bit SimHash over the distinct word-3-gram shingles: bit j is the
    * sign of the sum over shingles of (+1/−1) votes from bit (j mod 2) of
    * md5 nibble (j div 2) — 64 independent md5 bits (two per hex nibble,
    * 32 nibbles). The signature lives in a signed long: bit 63 enters as
    * Long.MinValue (two's complement), so band extraction and hamming are
    * pure bit arithmetic, reproducible in any engine with signed 64-bit
    * ints (the DuckDB oracle mirrors this bit-for-bit). */
  def simhashSignatures(documents: DataFrame): DataFrame =
    // one native pass per document over the cached shingle ARRAY
    // (graft.plans.SimHash64) — zero shuffle, replacing the exploded
    // md5-hex-string + 32 substring/conv casts per shingle row + the
    // 64-column grouped vote sum (profiled as dedup_simhash's dominant
    // cost: tools/ProfileSimhash). The n_g > 0 filter keeps the exploded
    // form's contract: a zero-shingle doc produced no vote rows and so
    // no signature (the native form would otherwise emit the all-ties
    // signature for it).
    shingleArraysCached(documents)
      .filter(col("n_g") > 0)
      .select(col("doc_id"),
        graft.plans.SimHash64.simhash64(col("gs")).as("simhash"))

  /** (doc_id, simhash, band_idx, band_key) — the 4 × 16-bit band table
    * [[simhashPairs]] joins on and [[simhashBandStats]] monitors.
    * Arithmetic shift + mask extracts exact bit ranges regardless of the
    * signature's sign. */
  private def simhashBandTable(documents: DataFrame): DataFrame = {
    // the signature table is 16 bytes per doc and feeds this band table
    // THREE times per pairs query (keep list + both join sides) plus the
    // band-stats monitor — persist it (same session-tracked cache as the
    // shingle arrays) so the shingle explode + 64-vote aggregation runs
    // once per corpus, not once per consumer
    val sig = persistTracked(simhashSignatures(documents))
    val mask = (1L << SimhashBandBits) - 1
    val bandCols = array((0 until SimhashBands).map { b =>
      shiftright(col("simhash"), SimhashBandBits * b).bitwiseAND(lit(mask))
    }: _*)
    sig.select(col("doc_id"), col("simhash"), posexplode(bandCols))
      .toDF("doc_id", "simhash", "band_idx", "band_key")
  }

  /** SimHash bucket-skew monitor — the simhash twin of
    * [[minhashBandStats]]: the most-populated colliding (band, key)
    * buckets. Any bucket approaching [[SimhashMaxBucket]] is about to be
    * dropped from candidate generation; this is the view a pipeline
    * alerts on to see it happen. */
  def simhashBandStats(documents: DataFrame, k: Int = 20): DataFrame =
    simhashBandTable(documents)
      .groupBy(col("band_idx").cast("long").as("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") > 1)
      .orderBy(col("n_docs").desc, col("band_idx"), col("band_key"))
      .limit(k)

  /** SimHash near-dup pairs: band the 64-bit signature 4 × 16-bit
    * (pigeonhole: hamming ≤ 3 ⇒ at least one band equal — recall 1 within
    * capped buckets), equi-join per band over buckets holding ≤
    * `maxBucket` docs (disclosed drop, see [[SimhashMaxBucket]]), verify
    * exact hamming ≤ `maxHamming` on the full signatures. */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 3,
                   maxBucket: Int = SimhashMaxBucket): DataFrame = {
    val bands = simhashBandTable(documents)
    val keep = bands
      .groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBucket)
      .select(col("band_idx"), col("band_key"))
    val kept = bands.join(keep, Seq("band_idx", "band_key"))
    kept.as("a")
      .join(kept.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy("doc_a", "doc_b")
  }

  /** N-gram Jaccard dedup, blocked by `source` (the blocking key a real
    * pipeline would have: crawl/shard/domain). Emits pairs with
    * jaccard >= 1/2 plus an exact integer jaccard percentage
    * ((100*shared) div union — no floats).
    *
    * Candidate generation runs over a DF-CUT inverted index: a shingle
    * appearing in more than `maxDf` docs of one source is boilerplate — it
    * cannot discriminate near-dups but contributes O(df²) candidate pairs
    * (the quadratic hot-key blowup on skewed corpora). The cut applies
    * ONLY to candidate generation; the verify join counts shared shingles
    * over the FULL sets, so any pair that shares at least one sub-cutoff
    * shingle gets its exact Jaccard. A true near-dup (J ≥ 1/2) shares
    * half its shingles; for it to be missed, every one of those would
    * have to be boilerplate — on this corpus the max df is 25, so the
    * result is identical to the exact all-pairs oracle (and checked
    * against it). */
  def ngramJaccard(documents: DataFrame, maxDf: Int = 1000): DataFrame = {
    // candidate generation runs over the HASHED shingle view (the hs
    // column of the shingle cache — sorted distinct xxhash64 longs, see
    // graft.plans.ShingleHashes): every shuffle below ships 8-byte keys
    // instead of ~25-byte shingle strings. A hash collision can only
    // MERGE two buckets — extra candidate pairs that the exact verify
    // join filters, and (theoretically) a merged df crossing the cut;
    // at df ≤ 25 measured vs cutoff 1000 that would take ~40 colliding
    // boilerplate shingles, probability ~2⁻⁶⁴-scale — the documented
    // trade, and the DuckDB oracle still computes the exact all-pairs
    // answer the result is gated against.
    val sh = shingleArraysCached(documents)
      .select(col("doc_id"), col("source"), explode(col("hs")).as("hk"))
    // bucket-local pair generation: group the exploded hashed-shingle
    // rows by (source, hash), collect each sub-cutoff bucket's doc list,
    // and emit its C(n,2) ordered pairs from the sorted list in place.
    // The join formulation this replaced shuffled the exploded relation
    // TWICE (df aggregate, then the index re-shuffle feeding a
    // self-join) for the same pair set; here the full-volume shuffle
    // happens ONCE (the collect), and pair emission is an in-place
    // explode bounded by Σ C(min(df, maxDf), 2) — row-for-row the old
    // join output (measured 62.6k at sf0.1).
    //
    // The df cut is applied BEFORE the collect, not after: the cheap
    // map-reduced df aggregate yields the over-cutoff shingle head —
    // boilerplate, tiny by the same Zipf argument as the
    // [[TextAnalysis.HotVocab]] split and the [[SimhashMaxBucket]] hot
    // list — which anti-joins the exploded rows. Filtering after the
    // collect instead would materialize an UNBOUNDED doc list per hot
    // bucket inside the aggregation buffer (df ~10⁷ boilerplate
    // shingles at corpus scale ⇒ ~100 MB single buffers) just to throw
    // it away.
    val hot = sh.groupBy(col("source"), col("hk"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("source"), col("hk"))
    // No forced broadcast on the hot head: its COUNT is corpus-dependent
    // (the Zipf argument bounds its mass share, not its cardinality), so
    // the anti join is left to AQE — it broadcasts the head while it fits
    // (the measured shape at every tested scale) and falls back to a
    // shuffled anti join past the driver-safe bound, the safety valve a
    // forced hint removes. Blocking key contract: `source` is NON-NULL
    // (generated data and the oracle share this); the old inner-join
    // formulation silently dropped null-source rows, the grouped form
    // would bucket them together — the explicit filter pins the contract
    // instead of leaving it to data luck.
    val buckets = sh
      .filter(col("source").isNotNull)
      .join(hot, Seq("source", "hk"), "left_anti")
      .groupBy(col("source"), col("hk"))
      .agg(array_sort(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val candidates = buckets
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids) - i - 1), y -> " +
          "named_struct('doc_a', x, 'doc_b', y))))")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
    verifyOverlap(candidates, documents)
      .withColumn("union_n", col("na") + col("nb") - col("shared"))
      .filter(col("shared") * 2 >= col("union_n"))
      .select(col("doc_a"), col("doc_b"),
        expr("(shared * 100) div union_n").cast("long").as("jaccard_pct"))
      .orderBy("doc_a", "doc_b")
  }

  /** Sparse TF-cosine near-dup pairs via a term-at-a-time INVERTED INDEX —
    * the all-pairs-similarity shape of Bayardo et al., "Scaling Up All
    * Pairs Similarity Search" (WWW'07, public literature): partial dot
    * products are generated per TERM (an equi-join of each term's posting
    * list against itself) and summed per pair, so no document pair is
    * ever formed unless it shares at least one indexed term. Completes
    * the similarity-mechanism family: set-Jaccard ([[ngramJaccard]]),
    * sketched Jaccard (MinHash), Hamming (SimHash), edit distance
    * (PassJoin), dense-embedding cosine — this is the WEIGHTED lexical
    * form, exact where MinHash is probabilistic.
    *
    * Everything is INTEGER-exact cross-engine: vectors are raw unigram
    * term frequencies (lowercased whitespace tokens), and the threshold
    * cos >= 4/5 is evaluated as 25·dot² >= 16·‖a‖²·‖b‖² — no float ever
    * materializes (`cos2_pct` = squared-cosine percent, integer).
    *
    * Scale: the vector SPACE is df-cut (df <= maxDf) — a term in
    * thousands of docs is boilerplate that cannot push a pair over a 0.8
    * cosine by itself but contributes O(df²) partials (the same
    * disclosed-cut class as [[ngramJaccard]]; Σdf² over kept terms is
    * the exact candidate bound, monitored the same way). df=1 terms stay
    * IN the space (they weight the norms — exactness of the cosine over
    * the cut space) but are dropped from the posting-list join, where
    * they cannot match. The upgrade path at 10⁹ docs is Bayardo prefix
    * filtering (index only each vector's heaviest terms); the df cut is
    * the simpler guard with the same worst-case discipline.
    *
    * Disclosed range bound: the 25·dot² comparison is int64-exact while
    * ‖a‖²·‖b‖² < ~3.7·10¹⁷ — comfortably true for documents up to tens
    * of thousands of tokens; longer docs should flow through
    * [[TextAnalysis.chunkDocuments]] first (which a training pipeline
    * does anyway) or promote the gate to DECIMAL(38) on both engines. */
  def sparseCosine(documents: DataFrame, maxDf: Int = 500): DataFrame = {
    val tf = documents
      .select(col("doc_id"),
        explode(expr("regexp_extract_all(lower(text), '\\\\S+', 0)")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val space = tf.join(df.filter(col("df") <= maxDf), "tok")
    val norms = space.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("n2"))
    val idx = space.filter(col("df") >= 2)
      .select(col("tok"), col("doc_id"), col("tf"))
    val pairs = idx.as("a")
      .join(idx.as("b"),
        col("a.tok") === col("b.tok") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(sum(col("a.tf") * col("b.tf")).as("dot"))
    pairs
      .join(norms.select(col("doc_id").as("doc_a"), col("n2").as("na2")), "doc_a")
      .join(norms.select(col("doc_id").as("doc_b"), col("n2").as("nb2")), "doc_b")
      .filter(lit(25L) * col("dot") * col("dot") >= lit(16L) * col("na2") * col("nb2"))
      .select(col("doc_a"), col("doc_b"), col("dot"), col("na2"), col("nb2"),
        expr("(100 * dot * dot) div (na2 * nb2)").cast("long").as("cos2_pct"))
      .orderBy("doc_a", "doc_b")
  }

  /** EXACT-SUBSTRING overlap detection — the verbatim-duplication
    * operator of Lee et al., "Deduplicating Training Data Makes Language
    * Models Better" (ACL'22, public literature), re-shaped for Spark:
    * instead of a suffix array (a global sorted structure that doesn't
    * distribute), detect a verbatim run of >= `minRunGrams + gramLen - 1`
    * tokens shared between two docs via a POSITIONAL gram index:
    *
    *   1. each doc emits md5 digests of its `gramLen`-token grams at
    *      every position (one codegen'd transform over the token array —
    *      text leaves the scan only as 16-byte digests + positions);
    *   2. a df-cut inverted index joins aligned gram hits
    *      (same digest, doc_a < doc_b) — the same boilerplate cut as
    *      [[ngramJaccard]], since a gram in thousands of docs is
    *      template noise that contributes O(df²) pairs;
    *   3. hits group by (doc_a, doc_b, pos_a − pos_b): a shared VERBATIM
    *      run of R grams at one alignment offset is exactly a group
    *      whose distinct positions tile an interval —
    *      count = max − min + 1 — so the contiguity test is integer
    *      arithmetic on the group, no re-reading of text;
    *   4. per pair, report the longest such run in TOKENS
    *      (span + gramLen − 1).
    *
    * Finds pairs sharing long verbatim passages even when the docs as a
    * WHOLE are dissimilar (quote chains, boilerplate headers, licence
    * blocks) — the case Jaccard/MinHash miss by design because global
    * overlap stays below any whole-doc threshold. Fully deterministic:
    * md5 grams, integer spans; the DuckDB oracle replicates the gram
    * construction bit-for-bit. */
  /** [[substringDup]]'s geometry, promoted to shared constants so the
    * operator, its [[substringGramStats]] monitor, and the oracle
    * generators stay parameter-locked. */
  val SubstringGramLen = 8
  val SubstringMinRun = 5
  val SubstringMaxDf = 1000

  /** (doc_id, pos, g): md5 digests of the `gramLen`-token grams at every
    * position — one codegen'd transform over the token array; text
    * leaves the scan only as 16-byte digests + positions. Shared by
    * [[substringDup]] and its hot-gram monitor, and persisted through
    * the same session-tracked cache as the shingle arrays: the pairs
    * query alone consumes this relation three times (the df-cut
    * aggregate and both sides of the aligned-hit self-join), and the
    * monitor query re-derives it from scratch — one gram pass per
    * corpus, not one per consumer. */
  private def positionalGrams(documents: DataFrame, gramLen: Int): DataFrame =
    persistTracked(documents
      .select(col("doc_id"),
        // native one-pass digest array (hex-for-hex the HOF chain the
        // oracle mirrors — see graft.plans.PositionalGramHashes; a
        // sub-gramLen doc yields an empty array, which posexplode drops,
        // the same contract as the size filter this replaces)
        graft.plans.PositionalGramHashes.grams(normText(col("text")), gramLen).as("gsh"))
      .select(col("doc_id"), posexplode(col("gsh")).as(Seq("pos0", "g")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"), col("g")))

  def substringDup(documents: DataFrame, gramLen: Int = SubstringGramLen,
                   minRunGrams: Int = SubstringMinRun, maxDf: Int = SubstringMaxDf): DataFrame = {
    // the df cut and the aligned self-join key on xxhash64 of the md5
    // digest, not the 32-char hex string: both shuffles ship 8-byte
    // keys (the hex digests stay in the shared gram cache — the
    // substringGramStats monitor reports them verbatim, oracle-mirrored).
    // Collision honesty — a merged pair of gram digests can err in BOTH
    // directions, each needing the 2⁻⁶⁴-scale collision first: (a) a
    // false aligned hit inside an existing (doc_a, doc_b, off) group
    // inflates span without count, FAILING the n == span tiling test for
    // a genuinely tiling run (drops a true pair); (b) a merged df
    // crossing maxDf drops a genuinely rare gram from the index (can
    // break a true run below minRunGrams). Same accepted md5/xxhash
    // trade as the fingerprints, and the DuckDB oracle computes the
    // exact hex-keyed answer, so an actual collision surfaces as a hash
    // mismatch rather than passing silently.
    val grams = positionalGrams(documents, gramLen)
      .select(col("doc_id"), col("pos"), xxhash64(col("g")).as("hk"))
    // df cut as an anti join against the HOT head (df > maxDf), not an
    // inner join against the rare set: the two are the same set algebra,
    // but the rare set is nearly ALL grams (a full shuffle join of the
    // gram relation against itself-sized keys) while the hot head is
    // Zipf-tiny — AQE broadcasts it (usually empty) and the gram
    // relation reaches the self-join without an extra exchange. Same
    // discipline as ngramJaccard's hot head.
    val hot = grams.groupBy(col("hk"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") > maxDf)
      .select(col("hk"))
    val idx = grams.join(hot, Seq("hk"), "left_anti")
    val hits = idx.as("a")
      .join(idx.as("b"), col("a.hk") === col("b.hk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    hits
      .groupBy(col("doc_a"), col("doc_b"), (col("pa") - col("pb")).as("off"))
      // count, not countDistinct: within a (doc_a, doc_b, off) group pa
      // is distinct by construction — each position holds exactly one
      // gram and pb = pa − off is determined, so a duplicate (pa, pb)
      // hit cannot exist — and dropping the distinct removes a full
      // dedup pass over the hits relation, the largest intermediate here
      .agg(count(lit(1)).as("n"),
        (max(col("pa")) - min(col("pa")) + 1).as("span"))
      .filter(col("n") === col("span") && col("span") >= minRunGrams)
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(max(col("span") + lit(gramLen - 1)).cast("long").as("overlap_tokens"))
      .orderBy("doc_a", "doc_b")
  }

  /** Hot-gram monitor for [[substringDup]]'s `maxDf` cut — the disclosure
    * twin of [[simhashBandStats]]: the df cap bounds per-gram pair volume
    * (a gram at the cap contributes ~df²/2 hits), and ΣdF² over the hot
    * grams is the operator's real cost envelope, so the monitor reports
    * the top shared grams by document frequency with a `dropped` flag
    * (past the cap — excluded from pairing, the disclosed recall cut)
    * plus the corpus-wide dropped-gram count on every row. A ballooning
    * top df or dropped count means template/boilerplate growth — the
    * signal to tighten normalization or lower the cap BEFORE the pair
    * stage degrades. One gram-df aggregate + a k-bounded top-k + a 1-row
    * broadcast total: scan-shaped, no pair join anywhere. */
  def substringGramStats(documents: DataFrame, gramLen: Int = SubstringGramLen,
                         maxDf: Int = SubstringMaxDf, k: Int = 20): DataFrame = {
    val dfs = positionalGrams(documents, gramLen)
      .groupBy(col("g")).agg(countDistinct(col("doc_id")).as("df"))
    // coalesce: an empty/gram-less corpus reports an honest 0, not null
    val droppedTotal = dfs.agg(
      coalesce(sum(when(col("df") > maxDf, 1L).otherwise(0L)), lit(0L)).as("n_dropped_grams"))
    dfs.filter(col("df") > 1)
      .orderBy(col("df").desc, col("g")).limit(k)
      .crossJoin(broadcast(droppedTotal))
      .select(col("g"), col("df").cast("long").as("df"),
        (col("df") > maxDf).as("dropped"),
        col("n_dropped_grams").cast("long").as("n_dropped_grams"))
      .orderBy(col("df").desc, col("g"))
  }

  /** Edit-distance near-dup: Levenshtein over normalized `prefixLen`-char
    * prefixes, at distance <= `maxDist`, blocked by `source`. The prefix
    * bound caps per-pair cost at prefixLen² cells; PIGEONHOLE SEGMENT
    * BLOCKING caps the pair count — round 1's (source)-only blocking was
    * an all-pairs nested loop inside each source shard.
    *
    * The PassJoin-style argument: split a prefix into maxDist+1 segments;
    * each of the <= maxDist edit operations damages at most one segment,
    * so at least one segment survives intact and appears verbatim in the
    * other string, shifted by at most maxDist (the net indel drift).
    * Candidates are therefore an EQUI-join of (segment_idx, segment_text)
    * against the other side's window substrings at starts(i) ± maxDist —
    * linear explode (6 segments / ~56 windows per doc), never a pair loop.
    * Prefixes shorter than prefixLen (where absolute segment positions
    * don't cover the string) take a length-band fallback: lev <= maxDist
    * forces |len(a)-len(b)| <= maxDist, so banding length by maxDist+1 and
    * probing adjacent bands is exhaustive; on this corpus every normalized
    * prefix is exactly prefixLen chars, so that path is empty.
    * Both paths over-generate and the verify step computes the exact
    * distance, so the result is identical to the all-pairs form (and
    * checked against the unchanged exact oracle). */
  def levenshteinPrefix(documents: DataFrame, prefixLen: Int = 40, maxDist: Int = 5): DataFrame = {
    val segs = maxDist + 1
    require(prefixLen >= 2 * segs, "segments must be non-trivial")
    // segment bounds: first (prefixLen % segs) segments get the extra char
    val baseLen = prefixLen / segs
    val segDefs: Seq[(Int, Int, Int)] = {
      var pos = 1
      (0 until segs).map { i =>
        val len = baseLen + (if (i < prefixLen % segs) 1 else 0)
        val d = (i, pos, len); pos += len; d
      }
    }

    val n = documents
      .select(col("doc_id"), col("source"),
        substring(normText(col("text")), 1, prefixLen).as("p"))
      .withColumn("plen", length(col("p")))
    val full = n.filter(col("plen") === prefixLen)

    val segCol = array(segDefs.map { case (i, st, ln) =>
      struct(lit(i).as("i"), substring(col("p"), st, ln).as("s"))
    }: _*)
    val segSide = full
      .select(col("doc_id"), col("source"), explode(segCol).as("sg"))
      .select(col("doc_id"), col("source"), col("sg.i").as("i"), col("sg.s").as("s"))

    val winCol = array((for {
      (i, st, ln) <- segDefs
      s <- (st - maxDist) to (st + maxDist)
      if s >= 1 && s + ln - 1 <= prefixLen
    } yield struct(lit(i).as("i"), substring(col("p"), s, ln).as("s"))): _*)
    val winSide = full
      .select(col("doc_id"), col("source"), explode(winCol).as("wn"))
      .select(col("doc_id"), col("source"), col("wn.i").as("i"), col("wn.s").as("s"))
      .distinct()

    val candSeg = segSide.as("a")
      .join(winSide.as("b"),
        col("a.source") === col("b.source") &&
          col("a.i") === col("b.i") &&
          col("a.s") === col("b.s") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))

    // short-prefix fallback: band by length, probe adjacent bands
    val banded = n.withColumn("bkt", expr(s"plen div $segs"))
    val shortProbe = banded.filter(col("plen") < prefixLen)
      .select(col("doc_id").as("s_doc"), col("source").as("s_source"),
        explode(array(col("bkt") - 1, col("bkt"), col("bkt") + 1)).as("pb"))
    val candShort = shortProbe
      .join(banded,
        col("s_source") === col("source") && col("pb") === col("bkt") &&
          col("s_doc") =!= col("doc_id"))
      .select(least(col("s_doc"), col("doc_id")).as("doc_a"),
        greatest(col("s_doc"), col("doc_id")).as("doc_b"))

    val candidates = candSeg.union(candShort).distinct()
    candidates
      .join(n.select(col("doc_id"), col("p").as("pa")), col("doc_a") === col("doc_id")).drop("doc_id")
      .join(n.select(col("doc_id"), col("p").as("pb")), col("doc_b") === col("doc_id")).drop("doc_id")
      // BOUNDED verify (round-15): the threshold form early-exits the DP
      // above maxDist — O(maxDist·len) banded cells instead of len² per
      // candidate. Measured NEUTRAL at the synthetic top decade (11.2 →
      // 11.6 s, inside noise): the stage there is bound by the 3.27M-pair
      // distinct + payload joins, not the DP (SCALEAUDIT_r15
      // adjudication) — kept because it is strictly less work per pair
      // at any scale where the DP does dominate (longer prefixes, CPU-
      // bound executors). Returns −1 above the bound, so the keep-filter
      // is between(0, maxDist); kept rows carry the exact distance —
      // output identical to the unbounded form, and the exact all-pairs
      // oracle is unchanged.
      .withColumn("lev_dist", levenshtein(col("pa"), col("pb"), maxDist).cast("long"))
      .filter(col("lev_dist").between(0, maxDist))
      .select(col("doc_a"), col("doc_b"), col("lev_dist"))
      .orderBy("doc_a", "doc_b")
  }

  /** Benchmark DECONTAMINATION — the eval-leak check every LLM training
    * pipeline runs before shipping a corpus: find training docs that
    * share at least `minShared` distinct word-3-gram shingles with any
    * doc of the eval set (here: doc_id < evalMaxId as the stand-in
    * benchmark). Plan shape at 100 TB: the eval set's shingles are
    * benchmark-sized (MBs) and BROADCAST; the corpus side stays
    * scan-shaped with a map-side hash join and aggregates on
    * (doc_id, eval_id) — no corpus shuffle of text, ever. Emits the
    * contaminated (train_doc, eval_doc, shared) evidence rows. */
  def benchmarkContamination(documents: DataFrame, evalMaxId: Long = 5,
                             minShared: Int = 2): DataFrame = {
    val sh = shingles(documents)
    val evalSh = sh.filter(col("doc_id") < evalMaxId)
      .select(col("g").as("eg"), col("doc_id").as("eval_id")).distinct()
    sh.filter(col("doc_id") >= evalMaxId)
      .join(broadcast(evalSh), col("g") === col("eg"))
      .groupBy(col("doc_id"), col("eval_id"))
      .agg(count(lit(1)).as("shared")) // per-doc shingles are distinct
      .filter(col("shared") >= minShared)
      .orderBy("doc_id", "eval_id")
  }

  /** Near-dup FAMILY-SIZE distribution — the monitoring view over the
    * connected components ([[dedupClusters]], memoized, so this costs one
    * extra bounded aggregate when the pair graph already exists): how
    * many 2-doc families vs how many giants. The histogram is what a
    * pipeline alerts on — one mega-family usually means boilerplate or a
    * template leaked past the shingle df cut, and its size bounds the
    * worst-case work of any per-family operator (keep-best, leakage
    * split). Output is bounded by the DISTINCT family sizes. */
  def clusterSizeHistogram(documents: DataFrame): DataFrame =
    dedupClusters(documents)
      .groupBy(col("cluster_rep")).agg(count(lit(1)).as("family_size"))
      .groupBy(col("family_size")).agg(count(lit(1)).as("n_families"))
      .select(col("family_size").cast("long").as("family_size"),
        col("n_families").cast("long").as("n_families"))
      .orderBy("family_size")

  /** Cross-source duplication matrix: verified MinHash near-dup pairs
    * rolled up by (source, source) — the "which crawls duplicate each
    * other" view a pipeline checks before weighting its data mixture.
    * Reuses the memoized [[minhashPairs]] graph (and therefore the cached
    * shingle relation); the joins attach two small (doc_id, source)
    * projections to an already-verified pair list, and the final rollup
    * is bounded by sources², not docs. */
  def crossSourceDupMatrix(documents: DataFrame): DataFrame = {
    val src = documents.select(col("doc_id"), col("source"))
    minhashPairs(documents)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("dup_pairs"))
      .orderBy("source_a", "source_b")
  }

  /** Near-dup CLUSTERS from the MinHash pair graph: connected components
    * by alternating large-star / small-star contraction, emitting
    * (doc_id, cluster_rep) for every doc in at least one verified
    * near-dup pair. The representative is the component's smallest
    * doc_id — the doc a dedup pass KEEPS. Pairs alone don't dedup a
    * corpus: {A,B} and {B,C} must collapse to one keeper, which is
    * exactly a connected-components pass.
    *
    * The contraction (the MapReduce-CC construction of Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14 — public
    * literature) rewires, per round, every node's larger neighbors to
    * its neighborhood minimum (large-star), then its smaller neighbors
    * to theirs (small-star); components collapse toward their minimum
    * from EVERY side at once, so a component converges in O(log n)
    * rounds regardless of SHAPE — where one-hop min-label propagation
    * is O(diameter), fine for clique-like near-dup blobs but linear on
    * chain-shaped pair graphs (boilerplate gradients: doc i overlaps
    * i±1 only). Each half-round is one join + min-aggregate on the
    * (doc_a, doc_b) edge list — the same plan shape, just fewer rounds.
    * Convergence is checked EXACTLY: a round whose output edge set
    * equals its input is the paper's fixpoint (star graphs per
    * component), verified with a count + except over the
    * localCheckpointed edge frames, not a heuristic stall counter.
    * Deterministic — checked against a DuckDB recursive-CTE oracle; the
    * O(log n) round bound is spec-pinned on a 128-node path graph. */
  /** Converged cluster maps keyed by (session, canonicalized corpus
    * plan, maxRounds): the result is a materialized artifact
    * (localCheckpointed at every round), so re-deriving it for each
    * consumer — the clusters query AND the curation pass — would re-run
    * the whole MinHash + propagation pipeline. The key carries the FULL
    * canonicalized PLAN OBJECT — structural case-class equality over the
    * whole tree, data included, so a hit proves plan equality (a 32-bit
    * plan hash could collide and silently hand back another corpus's
    * cluster map; a plan STRING is just as wrong the other way, e.g.
    * LocalRelation.toString prints only the schema) — and the owning
    * SparkSession (localCheckpoint RDDs die with their session — a cache
    * hit across a session restart would return unusable frames). */
  private val clusterCache = scala.collection.concurrent.TrieMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), DataFrame]()
  private val clusterLocks = scala.collection.concurrent.TrieMap[
    (org.apache.spark.sql.SparkSession, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, Int), AnyRef]()

  def dedupClusters(documents: DataFrame, maxRounds: Int = 50): DataFrame = {
    val key = (documents.sparkSession,
      documents.queryExecution.analyzed.canonicalized, maxRounds)
    // build-once per key (graft.Memo): the contraction pins per-round
    // checkpoints a losing duplicate build would strand until GC
    graft.Memo.buildOnce(clusterCache, clusterLocks, key)(
      computeClusters(documents, maxRounds))
  }

  private def computeClusters(documents: DataFrame, maxRounds: Int): DataFrame =
    // the memoized pair graph is already checkpointed — the contraction
    // canonicalizes it once and every round joins only its own edges
    starContract(minhashPairs(documents), maxRounds)

  /** Rounds the last [[starContract]] ran — observability for the
    * O(log n) convergence bound (read by the path-graph spec). */
  @volatile private[graft] var lastClusterRounds: Int = 0

  /** Large-star/small-star connected components over an undirected pair
    * list (doc_a, doc_b) → (doc_id, cluster_rep = component min).
    * Edges live canonically as (hi, lo), hi > lo, distinct; the edge
    * count never grows (each rewire replaces an edge one-for-one, then
    * dedupes), so every round costs at most the first round's shuffle. */
  private[graft] def starContract(pairs0: DataFrame, maxRounds: Int): DataFrame = {
    // large-star: for every node u, connect each LARGER neighbor v to
    // m = min(N(u) ∪ {u}) — each edge is seen from its smaller
    // endpoint's perspective (the union makes both directions visible),
    // so no edge is dropped and every output edge has hi > lo
    def largeStar(e: DataFrame): DataFrame = {
      val und = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = und.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      und.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .distinct()
    }
    // small-star: for every node u, rewire its SMALLER neighbors (and u
    // itself) to m = min of those neighbors — m < every emitted hi
    def smallStar(e: DataFrame): DataFrame = {
      val mins = e.groupBy("hi").agg(min("lo").as("m"))
      e.join(mins, "hi")
        .filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .union(mins.select(col("hi"), col("m").as("lo")))
        .distinct()
    }
    var edges = pairs0
      .select(greatest(col("doc_a"), col("doc_b")).as("hi"),
        least(col("doc_a"), col("doc_b")).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct().pinned()
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      val next = smallStar(largeStar(edges)).pinned()
      // exact fixpoint test on two checkpointed frames: equal counts +
      // empty difference ⟺ identical edge sets (both are distinct) ⟺
      // the star-graph fixpoint — no stall heuristic to mis-fire
      converged = next.count() == edges.count() && next.except(edges).isEmpty
      edges = next
      round += 1
    }
    lastClusterRounds = round
    // at the fixpoint every component is a star: non-roots carry exactly
    // one edge (to the component min), roots carry none
    val nodes = pairs0.select(col("doc_a").as("doc_id"))
      .union(pairs0.select(col("doc_b").as("doc_id"))).distinct()
    nodes
      .join(edges.select(col("hi").as("doc_id"), col("lo").as("rep")), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("rep"), col("doc_id")).as("cluster_rep"))
      .orderBy("doc_id")
  }

  /** Quality-ranked canonical selection per near-dup cluster — the
    * keep-policy upgrade over min-doc_id: within each near-dup family
    * ([[dedupClusters]] components) keep the member with the HIGHEST
    * [[TextFunctions.qualityScore]] (ties broken by lowest doc_id, so
    * the choice is total and engine-portable). Min-id keeps whichever
    * copy happened to be ingested first; a curation pass wants the
    * cleanest copy — the boilerplate-wrapped or truncated variants are
    * the ones to drop. Emits one row per multi-member family: the
    * representative, the kept doc, its quality, and the family size.
    *
    * Scale: the window partitions by cluster_rep, so partition width is
    * the near-dup family size (bounded by the LSH candidate cap upstream,
    * never corpus-shaped); the join against the cluster map is the same
    * doc_id equi-join as [[dedupClusters]]'s consumers. Quality is a
    * scan-side column — no extra pass over the text. */
  def keepBestPerCluster(documents: DataFrame): DataFrame = {
    val members = dedupClusters(documents)
      .select(col("doc_id"), col("cluster_rep"))
    val scored = documents
      .select(col("doc_id"), qualityScore(col("text")).as("q"))
      .join(members, Seq("doc_id"))
    val byBest = Window.partitionBy(col("cluster_rep"))
      .orderBy(col("q").desc, col("doc_id").asc)
    val family = Window.partitionBy(col("cluster_rep"))
    scored
      .withColumn("rk", row_number().over(byBest))
      .withColumn("n_members", count(lit(1)).over(family))
      .filter(col("rk") === 1)
      .select(col("cluster_rep"), col("doc_id").as("kept_doc"),
        col("q").as("kept_quality"), col("n_members").cast("long").as("n_members"))
      .orderBy("cluster_rep")
  }

  /** Bloom-filter first-stage for incremental exact dedup, with its
    * acceptance check. The persisted fp-table anti-join
    * ([[incrementalDedup]]) prices every new doc at one bucketed-join
    * probe; a Bloom filter over the index's fingerprints prices it at a
    * map-side bit probe — the right first stage when the batch is small
    * and the index is remote: definite-clean docs (bloom miss)
    * short-circuit without touching the index at all, and only bloom
    * HITS
    * (true dups + the fp-rate's false positives) proceed to the exact
    * join. No false negatives by construction (Bloom never misses an
    * inserted element), so the composition is result-identical to the
    * plain anti-join — DedupSpec pins that equality.
    *
    * Sizing: bits ≈ −n·ln(fpp)/ln(2)² — 1e9 fingerprints at 1% fpp is
    * ≈1.2 GB, the broadcast ceiling; beyond that, shard the filter by
    * fp prefix and probe the matching shard (same plan, partitioned
    * artifact), or raise fpp — every false positive only costs one
    * probe of the exact path, never a wrong answer.
    *
    * [[bloomCheck]] is the oracle-checkable acceptance surface (the same
    * bound-gate pattern as the HLL/KLL sketch checks): one row with the
    * exact dup/clean counts plus two machine-checked booleans —
    * `no_false_negatives` (every exact dup was a bloom hit; MUST be
    * true) and `fp_rate_ok` (observed false-positive count ≤ 3× the
    * configured fpp over the clean population, with a small-count
    * floor). The DuckDB oracle recomputes the exact counts and pins both
    * booleans TRUE, so a broken filter breaks the hash. The builder's
    * two driver actions (fp count + filter build) produce a model-sized
    * artifact — bits, not corpus. */
  val BloomFpp = 0.01

  /** Built filters keyed by canonicalized existing-corpus plan — the same
    * memoization discipline as the quantizer/cluster caches: running
    * [[bloomCheck]] alongside [[bloomedExactDedup]] over the same corpus
    * builds the filter ONCE (one count job + one build job), not once per
    * DataFrame construction. Cleared by [[clearSessionState]]. */
  private val bloomCache = scala.collection.concurrent.TrieMap[
    org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
    org.apache.spark.util.sketch.BloomFilter]()

  def bloomFingerprintFilter(existing: DataFrame): org.apache.spark.util.sketch.BloomFilter =
    bloomCache.getOrElseUpdate(existing.queryExecution.analyzed.canonicalized, {
      // null-text docs have no fingerprint: nothing to insert (and nothing
      // a probe could ever match) — filter them out of the build
      val exFp = existing.select(fingerprintCol(col("text")).as("fp"))
        .filter(col("fp").isNotNull)
      exFp.stat.bloomFilter("fp", math.max(exFp.count(), 1L), BloomFpp)
    })

  private def fingerprintCol(text: Column): Column = md5(normText(text))

  def bloomCheck(newDocs: DataFrame, existing: DataFrame): DataFrame = {
    val spark = newDocs.sparkSession
    val bf = spark.sparkContext.broadcast(bloomFingerprintFilter(existing))
    // null-safe: a null-text doc has a null fingerprint — it cannot match
    // anything in the index, so it probes as a miss instead of NPEing
    val bloomHit = udf((fp: String) => fp != null && bf.value.mightContainString(fp))
    val exFps = existing.select(fingerprintCol(col("text")).as("fp")).distinct()
    val probed = newDocs
      .select(col("doc_id"), fingerprintCol(col("text")).as("fp"))
      .withColumn("bloom_hit", bloomHit(col("fp")))
      .join(exFps.withColumn("is_dup", lit(true)), Seq("fp"), "left_outer")
      .withColumn("is_dup", coalesce(col("is_dup"), lit(false)))
    probed
      .agg(
        count(lit(1)).as("n_new"),
        sum(when(col("is_dup"), 1L).otherwise(0L)).as("n_dup_exact"),
        sum(when(!col("is_dup"), 1L).otherwise(0L)).as("n_clean"),
        sum(when(col("is_dup") && !col("bloom_hit"), 1L).otherwise(0L)).as("missed"),
        sum(when(!col("is_dup") && col("bloom_hit"), 1L).otherwise(0L)).as("false_pos"))
      .select(
        col("n_new").cast("long").as("n_new"),
        col("n_dup_exact").cast("long").as("n_dup_exact"),
        col("n_clean").cast("long").as("n_clean"),
        (col("missed") === 0L).as("no_false_negatives"),
        // 3× the configured fpp, integer arithmetic (the bound is DERIVED
        // from BloomFpp so retuning the filter retunes the gate with it:
        // false_pos/n_clean <= 3·fpp, cross-multiplied through a ppm
        // scale), floored at 20 false positives so tiny clean populations
        // can't flake the gate
        (col("false_pos") * 1000000L <=
          greatest(lit(20L * 1000000L), col("n_clean") * math.round(3 * BloomFpp * 1000000L)))
          .as("fp_rate_ok"))
  }

  /** The composition [[bloomCheck]] certifies: definite-clean docs skip
    * the index entirely; bloom hits go through the exact anti-join.
    * Result-identical to `newDocs` anti-joined against the index fps
    * (spec-pinned), cheaper whenever the miss rate is high — the steady
    * state of a crawl frontier, where most arrivals are novel. */
  def bloomedExactDedup(newDocs: DataFrame, existing: DataFrame): DataFrame = {
    val spark = newDocs.sparkSession
    val bf = spark.sparkContext.broadcast(bloomFingerprintFilter(existing))
    // null-safe: a null-text doc has a null fingerprint — it cannot match
    // anything in the index, so it probes as a miss instead of NPEing
    val bloomHit = udf((fp: String) => fp != null && bf.value.mightContainString(fp))
    val probed = newDocs.withColumn("fp", fingerprintCol(col("text")))
      .withColumn("bloom_hit", bloomHit(col("fp")))
    val definiteClean = probed.filter(!col("bloom_hit"))
    val candidates = probed.filter(col("bloom_hit"))
      .join(existing.select(fingerprintCol(col("text")).as("fp")),
        Seq("fp"), "left_anti")
    definiteClean.unionByName(candidates).drop("fp", "bloom_hit")
  }

  /** Sign-LSH banding for the embedding near-dup: `EmbBands` bands of
    * `EmbBandBits` axis-aligned sign bits each (band b reads dims
    * [b*bits, (b+1)*bits)). Deterministic and engine-portable — the same
    * bit arithmetic runs in the DuckDB oracle.
    *
    * Band sizing is a recall/selectivity dial: P[sign bits agree] for a
    * pair at angle θ is (1-θ/π) per bit, so at cos 0.5 (θ=60°) a 5-bit
    * band collides with p≈0.13 and 12 bands catch ≈81% of such
    * boundary pairs in expectation (higher-cos pairs approach 1 fast:
    * ≈99.94% at cos 0.9), while admitting ~32% of pairs as candidates.
    * The DuckDB oracle REPLICATES the banding (like the minhash/simhash
    * oracles), so the correctness gate checks the banded-LSH semantics
    * deterministically on any corpus; the ≈81% boundary-recall claim is
    * enforced by a measured property test over synthetic pairs planted
    * just above the threshold (DedupSpec), not by corpus luck. A
    * production near-dup pass at cos ≥ 0.9 (θ=26°: per-bit p≈0.86)
    * widens to 8×8-bit bands for ~3% candidate volume at ≥93% recall —
    * same plan, different constants, exposed as the `bands`/`bits`
    * parameters of [[embeddingNearDup]] (both configurations are
    * recall-property-tested in DedupSpec). Threshold 0.5 on isotropic
    * vectors is the worst case for any LSH family; the point is the plan
    * SHAPE: sketch → band equi-join → verify, no nested-loop pair join
    * anywhere. */
  val EmbBandBits = 5
  val EmbBands = 12

  /** Scale-ADAPTIVE band geometry for [[embeddingNearDup]] (round-15):
    * the r15 four-decade scale audit caught the fixed 12×5 keyspace
    * going quadratic at the new sf1.0 point — 384 buckets with
    * near-uniform occupancy (sign bits on isotropic vectors) means
    * per-bucket population ∝ N and candidate pairs ∝ N² (measured:
    * 18.7M pairs at 10k vectors → 75.0M at 20k, top-interval exponent
    * 2.2), while the [[EmbMaxBucket]] skew cap never fires because ALL
    * buckets grow together — and once they cross it, recall cliffs to
    * zero. Same cure as [[semanticCellsFor]]: grow the KEYSPACE with the
    * corpus. Within the 64-dim sign-bit budget the ladder widens bands
    * (fewer, longer) to hold per-bucket occupancy ≤ ~200:
    *
    *   n ≤ 6400   → 12×5 (32 keys/band)  boundary recall ≈81% at cos 0.5
    *   n ≤ 12800  → 10×6 (64 keys/band)  ≈60%
    *   n ≤ 25600  →  9×7 (128 keys/band) ≈40%
    *   n > 25600  → 12 RANDOM-HYPERPLANE bands × [[embHyperBitsFor]] bits
    *                (round-16 fifth rung — see below)
    *
    * The declining BOUNDARY recall is LSH theory, not a defect: at a
    * fixed dimension budget no sign-LSH family is simultaneously
    * selective and complete at cos 0.5 — near-dup recall (the operator's
    * purpose) stays ≥93% at the wide rungs (DedupSpec pins both ends of
    * the ladder), and the scalable low-threshold path is
    * [[semanticDedup]]'s density-adaptive cells. The DuckDB oracle
    * replicates the ladder (each geometry branch gated by the same
    * corpus count), so every decade stays hash-gated; sf0.01/sf0.1
    * resolve to 12×5 — adaptivity changes nothing the driver gate or
    * the round-over-round bench compares.
    *
    * ROUND-16 fifth rung — the ladder's last axis-aligned rung (8×8, 64
    * sign bits total) exhausted the dimension budget: past ~25.6k
    * vectors per-bucket occupancy grows ∝ N again and nothing wider is
    * expressible with axis signs. The fifth rung switches to RANDOM
    * HYPERPLANES (Charikar 2002, STOC — sign of 〈w, x〉 for a random w),
    * which are not confined to 64 planes: bands stay at 12 (recall
    * headroom) and bits grow with the corpus so per-bucket occupancy
    * stays ≤ ~[[EmbHyperTarget]] FOREVER. Cross-engine exactness — the
    * reason this was deferred in r15 — comes from the INTEGER lattice:
    * components quantize to `floor(x·1024)` (exact in IEEE double: the
    * scale is a power of two), hyperplane weights are ±1 from a
    * deterministic integer mix ([[embHyperSign]]), and the projection is
    * a pure int64 sum — associative, overflow-free, bit-identical in
    * Spark and DuckDB regardless of evaluation order. Same discipline as
    * pagerank's and BM25's integer units. */
  def embGeometryFor(n: Long): EmbGeometry =
    if (n <= 6400L) EmbAxisGeometry(12, 5)
    else if (n <= 12800L) EmbAxisGeometry(10, 6)
    else if (n <= 25600L) EmbAxisGeometry(9, 7)
    else EmbHyperGeometry(EmbHyperBands, embHyperBitsFor(n))

  /** Band geometry resolved by [[embGeometryFor]]: axis-aligned sign
    * bits (rungs 1–3, ≤ 64 total bits) or random-hyperplane sign bits
    * (rung 4+, unbounded keyspace). */
  sealed trait EmbGeometry { def bands: Int; def bits: Int }
  final case class EmbAxisGeometry(bands: Int, bits: Int) extends EmbGeometry
  final case class EmbHyperGeometry(bands: Int, bits: Int) extends EmbGeometry

  /** Fifth-rung targets: hold per-band bucket occupancy near
    * [[EmbHyperTarget]] by growing band LENGTH — smallest bits ≥ 8 with
    * n ≤ target·2^bits (8 bits ≤ 51.2k vectors, 9 ≤ 102.4k, 10 ≤ 204.8k,
    * …). Boundary recall at cos 0.5 declines with bits (12 bands × 8
    * bits ≈ 38%); near-dup recall at cos 0.9 stays ≥86% even at 12 bits
    * (per-bit sign-agreement p≈0.856 ⇒ 1−(1−p^bits)^12). */
  val EmbHyperBands = 12
  val EmbHyperTarget = 200L
  def embHyperBitsFor(n: Long): Int = {
    var b = 8
    while (b < 62 && n > (EmbHyperTarget << b)) b += 1
    b
  }

  /** Fixed-point scale for the hyperplane integer lattice: a power of
    * two, so `x.toDouble * 1024` is EXACT for every float x and
    * `floor` of it is engine-independent. */
  val EmbQuantScale: Int = graft.plans.HyperplaneBands.QuantScale

  /** Embedding dimension budget the hyperplane signs span. Shorter
    * vectors contribute 0 for the missing dims (coalesce) — mirrored in
    * the oracle. */
  val EmbDim: Int = graft.plans.HyperplaneBands.Dim

  /** Deterministic ±1 hyperplane weight for (band, bit, dim) — the
    * single source of truth lives with the native expression
    * ([[graft.plans.HyperplaneBands.sign]], avalanche-mixed; see its
    * scaladoc for why a cheap LCG bit correlated the planes); this alias
    * is what the oracle generator and the spec replica consume. */
  def embHyperSign(band: Int, bit: Int, d: Int): Int =
    graft.plans.HyperplaneBands.sign(band, bit, d)

  private def embBandKey(emb: Column, band: Int, bits: Int): Column =
    (0 until bits)
      // try_element_at: a vector shorter than the band range contributes 0
      // bits (null comparison is falsy) instead of an ANSI index error
      .map(j => when(try_element_at(emb, lit(band * bits + j + 1)) >= 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)


  /** Disclosed hot-bucket cap for [[embeddingNearDup]] — the sign-LSH
    * edition of [[SimhashMaxBucket]] (same mechanism: a bucket holding
    * more than this many vectors is DROPPED from candidate generation),
    * added when the round-13 three-point scale audit measured the fixed
    * 12×5 keyspace going quadratic (top-interval exponent ≈ 1.07 at 5×
    * sf0.1): a (band, key) bucket's population grows ∝ N under a fixed
    * keyspace, so per-bucket pairs grow ∝ N². A bucket that hot means
    * ≥ cap vectors share one band's sign pattern — a near-constant
    * direction mode whose pairs the OTHER eleven bands still recall
    * individually, and whose population is exactly what
    * [[semanticDedup]]'s density-adaptive cells handle. Implemented as a
    * broadcast anti-join against the (usually empty) hot-bucket list —
    * one cheap aggregate, no per-row window — and mirrored in the DuckDB
    * oracle; `ann_bucket_stats` is the occupancy monitor that says when
    * to widen the band geometry (cos ≥ 0.9 passes run 8×8 = 256
    * keys/band) rather than lean on the cap. The low-threshold (0.5)
    * contract is inherently candidate-heavy — at that boundary LSH needs
    * short bands for recall, so the cap is the honest scale bound, not a
    * free lunch. */
  val EmbMaxBucket = 1000

  /** Embedding-cosine near-dup pairs: banded sign-LSH candidate
    * generation (equi-join on 1-byte band keys), then exact cosine verify
    * (codegen'd fused dot, double accumulation) within candidates only.
    * Norms are computed once per vector, before the pair join.
    * `bands`×`bits` is the recall/selectivity dial (see the banding note
    * above): the 12×5 default suits boundary recall at cos 0.5; a
    * cos ≥ 0.9 production pass should pass bands=8, bits=8. Buckets
    * holding more than `maxBucket` vectors are dropped from candidate
    * generation (see [[EmbMaxBucket]]).
    *
    * Pinning a geometry requires BOTH `bands` and `bits` (a half-pinned
    * call fails loudly rather than silently falling through to the
    * adaptive ladder); `hyperplane = true` pins the RANDOM-HYPERPLANE
    * key family instead of axis signs (see [[embGeometryFor]]'s fifth
    * rung) and is only meaningful with a pinned geometry. */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double = 0.5,
                       bands: Int = -1, bits: Int = -1,
                       maxBucket: Int = EmbMaxBucket,
                       hyperplane: Boolean = false): DataFrame = {
    import graft.plans.DotProduct.dot
    require((bands > 0) == (bits > 0),
      s"pin both bands and bits or neither (got bands=$bands, bits=$bits)")
    require(!hyperplane || bands > 0,
      "hyperplane=true pins the key family — pass bands and bits with it")
    // adaptive geometry unless the caller pins one: the corpus count is
    // a parquet-metadata job (no column read), the same eager-model-
    // artifact class as semanticCellsFor's count — oracle mirrors the
    // count-gated ladder branch selection
    val geom: EmbGeometry =
      if (bands > 0) {
        if (hyperplane) EmbHyperGeometry(bands, bits) else EmbAxisGeometry(bands, bits)
      } else embGeometryFor(embeddings.count())
    val base = embeddings.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nrm"))
      // zero/null vectors have no direction — excluded by contract (and
      // the cosine division would be an ANSI divide-by-zero). The oracle
      // mirrors the nrm > 0 guard.
      .filter(col("nrm") > 0)
    val bandCols = geom match {
      case EmbAxisGeometry(bnd, bts) =>
        array((0 until bnd).map(b => embBandKey(col("embedding"), b, bts)): _*)
      case EmbHyperGeometry(bnd, bts) =>
        // one native codegen'd pass per row — quantize once, all
        // bands×bits integer projections in a JIT loop (the column-
        // algebra zip_with/aggregate form ran as interpreted HOFs:
        // ~28 s at the 100× decade vs the cosine query's 16 s, and
        // ~3 s of fixed lambda-plan cost at ANY scale)
        graft.plans.HyperplaneBands.hyperplaneBands(col("embedding"), bnd, bts)
    }
    val bandRows0 = base.select(col("vec_id"), posexplode(bandCols))
      .toDF("vec_id", "band_idx", "band_key")
    // hot-bucket cut (see [[EmbMaxBucket]]): the hot list is tiny —
    // usually empty — so the cut is a broadcast anti-join, never a
    // per-row window sort
    val hot = bandRows0.groupBy(col("band_idx"), col("band_key"))
      .agg(count(lit(1)).as("bn")).filter(col("bn") > maxBucket)
      .select(col("band_idx"), col("band_key"))
    val bandRows = bandRows0.join(broadcast(hot), Seq("band_idx", "band_key"), "left_anti")
    val candidates = bandRows.as("a")
      .join(bandRows.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    candidates
      .join(base.select(col("vec_id"), col("embedding").as("ea"), col("nrm").as("na")),
        col("vec_a") === col("vec_id")).drop("vec_id")
      .join(base.select(col("vec_id"), col("embedding").as("eb"), col("nrm").as("nb")),
        col("vec_b") === col("vec_id")).drop("vec_id")
      .withColumn("cos_sim", dot(col("ea"), col("eb")) / sqrt(col("na") * col("nb")))
      .filter(col("cos_sim") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos_sim"), 4).as("cos_sim"))
      .orderBy("vec_a", "vec_b")
  }

  /** Hot-cell participation cap for [[semanticDedup]] — same disclosed
    * mechanism as [[SimhashMaxBucket]]: a quantizer cell holding the
    * corpus's densest mode would otherwise go quadratic in the in-cell
    * pair join. Only the first `maxCell` vec_ids of a cell participate in
    * pairing (deterministic, oracle-mirrored); `ivf_cell_stats` is the
    * monitor that shows when a cell approaches the cap — the signal to
    * re-train with more cells rather than to raise the cap. */
  val SemanticMaxCell = 1000

  /** Data-adaptive cell count for [[semanticDedup]]: hold per-cell
    * occupancy near `SemanticTargetPerCell` so in-cell pairs grow
    * LINEARLY with the corpus instead of quadratically. The round-13
    * three-point scale audit caught exactly this: at a FIXED 16 cells,
    * 5× the vectors meant 5× per cell and 25× the pairs (measured
    * top-interval exponent 1.31 — the audit's first real flag). The cell
    * count is the SemDeDup paper's own scale knob (k ∝ corpus size);
    * [[SemanticMaxCell]] stays as the skew backstop for a density mode
    * that outgrows its cell between re-trainings. The floor keeps tiny
    * corpora at the 16-cell geometry the oracle gates (sf0.01 and sf0.1
    * both resolve to 16, so adaptivity changes nothing the oracle or the
    * round-over-round bench compares). */
  val SemanticTargetPerCell = 125L
  def semanticCellsFor(n: Long, minCells: Int = 16): Int =
    math.max(minCells.toLong,
      (n + SemanticTargetPerCell - 1) / SemanticTargetPerCell).toInt

  /** [[semanticDedup]]'s own oracle slot: with the ADAPTIVE cell count
    * its quantizer key (plan, nCells) diverges from the embeddings
    * table's default IVF slot on larger corpora, and a shared slot with
    * two keys reports empty — which silently degraded six post-run
    * inlined-model oracles to rows-only at sf0.5 (caught by the r13
    * dual-scale sweep). Same isolation rule as
    * [[TextAnalysis.LexicalSlot]]. */
  val SemanticSlot = "semdedup"

  /** SemDeDup-style CLUSTER-SCOPED semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540 — public literature): coarse-quantize the
    * embedding space with the SAME spherical k-means quantizer the IVF
    * index uses ([[Similarity.quantizerFor]] — one model per corpus
    * snapshot serves search AND dedup), then verify exact cosine only
    * WITHIN each cell and drop every vector that has a smaller-id in-cell
    * neighbor above `threshold`. Emits one row per DROPPED vector:
    * (vec_id, dup_of = its smallest qualifying in-cell neighbor, cell,
    * cos_sim to that neighbor).
    *
    * Versus [[embeddingNearDup]]'s sign-LSH banding: the blocking here is
    * DATA-ADAPTIVE — cells follow the corpus's own density modes instead
    * of fixed axis-aligned hyperplanes, which is what the SemDeDup recipe
    * exploits (semantic duplicates concentrate inside clusters). The
    * trade is quantizer recall at cell boundaries (a pair split across
    * cells is never compared — by design, same as the paper), bounded
    * skew via [[SemanticMaxCell]], and ZERO extra model cost when an IVF
    * index already exists. Plan shape at 100 TB: assignment is a
    * broadcast-centroid codegen map pass; the pair join is an equi-join
    * on `cell` over capped cells; norms computed once per vector before
    * pairing; no nested loops, no all-pairs. */
  def semanticDedup(embeddings: DataFrame, nCells: Int = 0,
                    threshold: Double = 0.5,
                    maxCell: Int = SemanticMaxCell): DataFrame = {
    import graft.plans.DotProduct.dot
    // nCells = 0 (the default) is DATA-ADAPTIVE: see [[semanticCellsFor]]
    // — a fixed cell count makes in-cell pairs quadratic in the corpus
    val cells = if (nCells > 0) nCells else semanticCellsFor(embeddings.count())
    val model = Similarity.quantizerFor(embeddings, cells, slot = SemanticSlot)
    val spark = embeddings.sparkSession
    if (model.isEmpty) {
      import org.apache.spark.sql.types._
      return spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        StructType(Seq(
          StructField("vec_id", LongType), StructField("dup_of", LongType),
          StructField("cell", LongType), StructField("cos_sim", DoubleType))))
    }
    val base = embeddings.select(col("vec_id"), col("embedding"),
      dot(col("embedding"), col("embedding")).as("nrm"))
      .filter(col("nrm") > 0) // directionless rows excluded, as in embeddingNearDup
    val kept = Similarity.withCell(base, model)
      .withColumn("crk",
        row_number().over(Window.partitionBy(col("cell")).orderBy(col("vec_id"))))
      .filter(col("crk") <= maxCell)
      .drop("crk")
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_sim",
        dot(col("a.embedding"), col("b.embedding")) / sqrt(col("a.nrm") * col("b.nrm")))
      .filter(col("cos_sim") >= threshold)
      .select(col("b.vec_id").as("vec_id"), col("a.vec_id").as("dup_of"),
        col("a.cell").cast("long").as("cell"), col("cos_sim"))
    // one row per dropped vector: keep the smallest qualifying neighbor
    pairs
      .withColumn("rk",
        row_number().over(Window.partitionBy(col("vec_id")).orderBy(col("dup_of"))))
      .filter(col("rk") === 1)
      .select(col("vec_id"), col("dup_of"), col("cell"),
        round(col("cos_sim"), 4).as("cos_sim"))
      .orderBy("vec_id")
  }
}
