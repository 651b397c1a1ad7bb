package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.Pin.PinnedOps

import graft.functions.TextFunctions.{normText, tokenCount}

/** Full-text retrieval over the documents table — the lookup side of a
  * training-data pipeline (inspecting what the corpus says about a topic,
  * spot-checking decontamination hits, pulling exemplars for eval curation).
  *
  * BM25 scoring in pure integer arithmetic: every quantity is scaled to
  * milli/kilo/ppm units and combined with integer division, so the score —
  * and therefore the top-k cut — is bit-identical across engines and
  * partitionings (same contract as the token-rarity ppm scores; DuckDB
  * mirrors each step with `//`). The classical `log`-based idf is replaced
  * by the rational `(N - df + 1) / (df + 1)` (the argument of the standard
  * BM25+ idf, un-logged): log implementations are not IEEE-exact across
  * libms, and for RANKING the un-logged ratio orders candidates by the
  * same per-term dominance. The trade-off is disclosed: rare terms weigh
  * relatively more than under log-idf; the familiar k1/b saturation
  * machinery is untouched.
  *
  * Scale shape: the only corpus-wide shuffle is the per-(doc, term) tf
  * count over QUERY-TERM OCCURRENCES ONLY — the exploded token relation is
  * semi-joined against the broadcast query-term set before anything
  * shuffles, so a 5-term query over 100 TB moves only the docs that
  * mention those terms. Document length (dl) is a per-row column
  * expression (no groupBy); corpus totals (N, sum dl) are a 1-row
  * aggregate broadcast to the scorer. Final top-k is TakeOrdered — k rows
  * per partition funnel to the driver, never a global sort.
  *
  * Overflow bound: contrib_ppm <= idf_kilo * part_ppm / 1000 with
  * idf_kilo <= 1000 * (N + 1) and part_ppm <= (k1 + 1) * 1e6, so scores
  * stay inside Long for corpora up to ~4e11 documents — disclosed, far
  * past the 100 TB design point (~1e11 docs at 1 KB/doc).
  */
object Search {

  /** BM25 k1 (term-frequency saturation) in milli: 1.2. */
  val K1Milli = 1200L
  /** BM25 b (length normalization) in milli: 0.75. */
  val BMilli = 750L

  /** Ledger id of the base (save/compact) segment — RESERVED below any
    * streaming micro-batch id (those start at 0), so a maintained
    * stream's very first batch can never collide with the base segment
    * and be skipped as already-committed. */
  val BaseSegment = -1L

  val DefaultQuery = "spark stream window join"
  val DefaultK = 10

  /** Deterministic query-term list: normalized, deduped, order-free. */
  def queryTerms(query: String): Seq[String] =
    query.toLowerCase.trim.split("\\s+").toSeq.filter(_.nonEmpty).distinct.sorted

  /** The shared scoring tail: (doc_id, tok, dl, tf) match rows + a 1-row
    * (n_docs, sum_dl) totals relation → top-k integer-BM25. One
    * definition serves the from-scratch and the indexed path, so the two
    * are identical BY CONSTRUCTION (and spec-pinned equal). df derives
    * from the match rows with a groupBy, not a window: partition-by-tok
    * would funnel every hit of a common term onto one reducer, while the
    * groupBy partial-aggregates map-side (the shared tf subtree dedups
    * via AQE ReuseExchange — verified: one corpus scan for the tf/df
    * pair in the from-scratch plan). */
  private def scoreBm25(tf: DataFrame, stats: DataFrame, k: Int): DataFrame = {
    val dfT = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(dfT), "tok")
      .crossJoin(broadcast(stats)) // one row: N and sum(dl)
      .withColumn("avgdl_milli", expr("(sum_dl * 1000) div n_docs"))
      .withColumn("idf_kilo", expr("((n_docs - df + 1) * 1000) div (df + 1)"))
      .withColumn("x_milli", expr("(dl * 1000000) div avgdl_milli"))
      .withColumn("denom_milli", expr(
        s"tf * 1000 + ($K1Milli * (1000 - $BMilli + ($BMilli * x_milli) div 1000)) div 1000"))
      .withColumn("part_ppm", expr(s"(tf * ${K1Milli + 1000L} * 1000000) div denom_milli"))
      .withColumn("contrib_ppm", expr("(idf_kilo * part_ppm) div 1000"))
      .groupBy(col("doc_id"))
      .agg(sum(col("contrib_ppm")).as("score_ppm"),
        count(lit(1)).cast("long").as("n_terms"))
      .orderBy(col("score_ppm").desc, col("doc_id"))
      .limit(k)
  }

  /** (doc_id, nt, dl) projection shared by search + index build. dl (the
    * per-doc token count) is a column expression on the scan — NOT a
    * groupBy over exploded tokens: normText collapses whitespace, so the
    * \S+ run count IS the post-split token count. */
  private def docsProjected(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"), normText(col("text")).as("nt"),
      tokenCount(col("text")).cast("long").as("dl"))

  private def explodedTokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("dl"), explode(split(col("nt"), " ")).as("tok"))
      .filter(length(col("tok")) > 0)

  /** Top-k documents by integer BM25 against a whitespace-tokenized query.
    * Returns (doc_id, score_ppm, n_terms) — n_terms = distinct query terms
    * the doc matched (coordination count, useful for AND-ish filtering). */
  def bm25TopK(documents: DataFrame, query: String = DefaultQuery,
               k: Int = DefaultK): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val qterms = broadcast(queryTerms(query).toDF("tok"))
    val docs = docsProjected(documents)
    // 1-row corpus totals; avgdl kept in milli. Docs with NULL text have
    // NULL dl: count(*) still counts them, sum skips them — both engines.
    val stats = docs.agg(
      count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    // explode AFTER carrying dl, semi-join against the broadcast query
    // terms BEFORE any shuffle: only query-term occurrences survive.
    // the one shuffle: (doc_id, tok, dl) → tf, over matched rows only;
    // dl rides in the grouping key (functionally dependent on doc_id).
    val tf = explodedTokens(docs).join(qterms, "tok")
      .groupBy(col("doc_id"), col("tok"), col("dl"))
      .agg(count(lit(1)).as("tf"))
    scoreBm25(tf, stats, k)
  }

  /** PERSIST the inverted index — the search-family member of the index
    * lifecycle (dedup fingerprints, IVF cells, PQ codes, now postings):
    * a query should not re-tokenize 100 TB of text when the postings
    * already exist.
    *
    *  - `<name>_postings` (tok, doc_id, dl, tf), bucketed AND sorted by
    *    `tok`: a query-term IN-filter prunes to the matching BUCKETS
    *    (SelectedBucketsCount — spec-asserted), so a 5-term query reads
    *    ~5/buckets of the postings bytes without any shuffle.
    *  - `<name>_totals`: one PARTIAL (n_docs, sum_dl) row PER
    *    save/append — the mergeable-statistics trick (same shape as the
    *    sketch tier): totals at query time are a sum over O(appends)
    *    rows, so an append never rewrites global state.
    *
    * Append contract — REPLAY-SAFE via a batch LEDGER, because unlike
    * the dedup index a replayed posting row is NOT harmless (it doubles
    * tf/df). Every row carries a `batch_id`; the totals table doubles as
    * the COMMIT LEDGER (its partial row is written LAST per append). A
    * re-delivered batch id is skipped outright; a crash between the
    * postings append and the ledger write leaves ORPHAN postings that
    * [[bm25Indexed]] makes invisible (it reads only ledgered batches)
    * and [[compactSearchIndex]] physically folds out — the same
    * duplicate-until-compacted REPAIR contract as the IVF append path. */
  def saveSearchIndex(documents: DataFrame, name: String, buckets: Int = 8): Unit = {
    import graft.sources.FileFormats.writeBucketed
    val docs = docsProjected(documents)
    writeBucketed(
      explodedTokens(docs).groupBy(col("tok"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf")).withColumn("batch_id", lit(BaseSegment)),
      s"${name}_postings", "tok", buckets)
    docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .withColumn("batch_id", lit(BaseSegment))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .saveAsTable(s"${name}_totals")
  }

  /** Committed batch ids — the ledger read both the search and the
    * append-skip paths use. O(appends) rows. */
  private def ledger(spark: org.apache.spark.sql.SparkSession, name: String): DataFrame = {
    try spark.catalog.refreshTable(s"${name}_totals") catch { case _: Throwable => () }
    spark.table(s"${name}_totals").select(col("batch_id")).distinct()
  }

  /** Append a doc batch under `batchId`: skipped entirely if that id is
    * already ledgered (re-delivered micro-batch), otherwise postings
    * first, ledger row LAST as the commit point. `batchId = None` takes
    * max(ledger)+1 (an unkeyed manual append — still ledgered, just not
    * replay-addressable).
    *
    * Schema evolution (see [[IndexSchemaException]]): the batch must
    * carry `doc_id` and `text`; added columns are ignored (the postings
    * writer projects tok/doc_id/dl/tf/batch_id), a missing required
    * column throws the named contract error before the ledger or any
    * table is touched. */
  def appendToSearchIndex(documents: DataFrame, name: String,
                          batchId: Option[Long] = None): Unit = {
    IndexSchema.requireColumns(documents, "search", Seq("doc_id", "text"))
    val spark = documents.sparkSession
    // heal BEFORE the ledger read: a compaction crash between swap
    // renames must not wedge the replayed trigger's append (which runs
    // before the cadence compaction that would otherwise heal)
    graft.sources.FileFormats.healTornSwap(spark, s"${name}_postings")
    val committed = ledger(spark, name).collect().map(_.getLong(0)).toSet
    val id = batchId.getOrElse(if (committed.isEmpty) 1L else committed.max + 1L)
    if (committed.contains(id)) return
    val catalog = spark.sessionState.catalog
    val nb = catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(s"${name}_postings"))
      .bucketSpec.map(_.numBuckets).getOrElse(8)
    val docs = docsProjected(documents)
    // repartition to the bucket count on the bucket key before writing:
    // one file per bucket per append instead of tasks × buckets (the
    // dedup-index append's small-file discipline, postings edition)
    explodedTokens(docs).groupBy(col("tok"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("tf")).withColumn("batch_id", lit(id))
      .repartition(nb, col("tok"))
      .write.mode(org.apache.spark.sql.SaveMode.Append)
      .bucketBy(nb, "tok").sortBy("tok").saveAsTable(s"${name}_postings")
    docs.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      .withColumn("batch_id", lit(id))
      .write.mode(org.apache.spark.sql.SaveMode.Append).saveAsTable(s"${name}_totals")
    Seq(s"${name}_postings", s"${name}_totals")
      .foreach(t => try spark.catalog.refreshTable(t) catch { case _: Throwable => () })
  }

  /** Fold the index back to fresh-save shape: only LEDGERED postings
    * survive (crash-orphaned batches physically leave), everything lands
    * as batch 0 with one merged totals row, and append-born small files
    * are reclaimed — the staged-rewrite-then-swap machinery of the other
    * index families. Result-identical before and after (spec-pinned). */
  def compactSearchIndex(spark: org.apache.spark.sql.SparkSession, name: String): Unit = {
    import graft.sources.FileFormats.writeBucketed
    val catalog = spark.sessionState.catalog
    val pt = s"${name}_postings"
    val tt = s"${name}_totals"
    graft.sources.FileFormats.healTornSwap(spark, pt)
    Seq(pt, tt).foreach(t => try spark.catalog.refreshTable(t) catch { case _: Throwable => () })
    val buckets = catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(pt))
      .bucketSpec.map(_.numBuckets).getOrElse(8)
    val led = ledger(spark, name)
    // staged swap: 1x postings IO + two renames (writeBucketedSwap)
    graft.sources.FileFormats.writeBucketedSwap(
      spark.table(pt).join(broadcast(led), "batch_id")
        .select(col("tok"), col("doc_id"), col("dl"), col("tf"))
        .withColumn("batch_id", lit(BaseSegment)),
      pt, "tok", buckets)
    // same single-row collect-and-write as the removal path: the folded
    // totals are one row, the staged-table two-step was pure catalog tax
    val tot = spark.table(tt)
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("sum_dl")).cast("long").as("sum_dl"))
      .head()
    writeTotalsRow(spark, tt,
      if (tot.isNullAt(0)) 0L else tot.getLong(0),
      if (tot.isNullAt(1)) 0L else tot.getLong(1))
    Seq(pt, tt).foreach(t => try spark.catalog.refreshTable(t) catch { case _: Throwable => () })
  }

  /** Consolidate N shard-local postings indexes into ONE — the search
    * family's member of the shard-merge story
    * ([[graft.operators.Dedup.mergeDedupIndexes]] documents the
    * N-pipelines-over-disjoint-shards deployment shape this serves).
    * Postings rows (tok, doc_id, dl, tf) are per-doc deterministic, df
    * is derived at query time, and the totals are MERGEABLE partial
    * sums — so the merge is a union of each source's LEDGERED postings
    * (crash orphans stay dark, the same visibility rule
    * [[bm25Indexed]] applies) re-stamped to the base segment, plus one
    * totals row summing the sources' committed partials. The result is
    * fresh-save shape: merge ≡ [[saveSearchIndex]] over the union
    * corpus EXACTLY (spec-pinned), and every later append/compact/
    * remove/vacuum sees a single-index world. Sources stay untouched
    * and readable throughout.
    *
    * Contract: unlike the dedup merge, doc OVERLAP is not tolerated — a
    * doc two shards both ingested would double its tf rows and the
    * totals (df/avgdl corruption), so the verb asserts token-bearing
    * doc_id disjointness across sources (one aggregate over the
    * postings' doc sets) and fails loudly before any write. Disclosed
    * corner (same witness gap as [[removeFromSearchIndex]]): a
    * token-LESS doc has no posting to witness it, so an empty doc
    * ingested by two shards double-counts in n_docs undetected — shard
    * corpora by doc_id and neither case can arise. */
  def mergeSearchIndexes(spark: org.apache.spark.sql.SparkSession, sources: Seq[String],
                         target: String, buckets: Int = 8): Unit = {
    import graft.sources.FileFormats.writeBucketed
    require(sources.nonEmpty, "mergeSearchIndexes needs at least one source index")
    require(!sources.contains(target),
      s"merge target '$target' must not be a source — sources stay readable during the merge")
    sources.foreach { n =>
      graft.sources.FileFormats.healTornSwap(spark, s"${n}_postings")
      Seq(s"${n}_postings", s"${n}_totals")
        .foreach(t => try spark.catalog.refreshTable(t) catch { case _: Throwable => () })
    }
    val ledgered = sources.map { n =>
      spark.table(s"${n}_postings").join(broadcast(ledger(spark, n)), "batch_id")
        .select(col("tok"), col("doc_id"), col("dl"), col("tf"))
    }
    // the disjointness guard: per-shard distinct doc sets (dl-grain,
    // bounded by corpus size, not postings size) unioned with a shard
    // tag — any doc_id seen under two tags is the double-count bug
    val overlap = ledgered.zipWithIndex
      .map { case (p, i) => p.select(col("doc_id")).distinct().withColumn("shard", lit(i)) }
      .reduce(_ unionByName _)
      .groupBy(col("doc_id")).agg(countDistinct(col("shard")).as("n_shards"))
      .filter(col("n_shards") > 1).count()
    require(overlap == 0L,
      s"mergeSearchIndexes: $overlap doc_id(s) present in more than one source index — " +
        "tf/df would double; shard corpora by doc_id")
    writeBucketed(
      ledgered.reduce(_ unionByName _).withColumn("batch_id", lit(BaseSegment)),
      s"${target}_postings", "tok", buckets)
    val tot = sources.map(n => spark.table(s"${n}_totals")).reduce(_ unionByName _)
      .agg(sum(col("n_docs")).cast("long").as("n_docs"),
        sum(col("sum_dl")).cast("long").as("sum_dl"))
      .head()
    writeTotalsRow(spark, s"${target}_totals",
      if (tot.isNullAt(0)) 0L else tot.getLong(0),
      if (tot.isNullAt(1)) 0L else tot.getLong(1))
    Seq(s"${target}_postings", s"${target}_totals")
      .foreach(t => try spark.catalog.refreshTable(t) catch { case _: Throwable => () })
  }

  /** TAKEDOWN delta-merge — the removal half of index maintenance, search
    * edition (the dedup fp tables and IVF/PQ cell trees already have
    * theirs): an append-only postings index keeps retrieving deleted
    * content forever, which at 100 TB is a compliance bug, not a
    * nuisance. `removed` needs (doc_id, text) — text because the TOTALS
    * delta (n_docs, sum_dl) is recomputed from the same projection that
    * built them, so remove ≡ fresh-save over the remaining corpus holds
    * EXACTLY (spec-pinned and hash-gated cross-engine).
    *
    * Mechanics: one compaction-with-filter (the applyCorpusDiff shape) —
    * the postings rewrite keeps ledgered ∧ not-removed rows folded to
    * the base segment, and the totals table collapses to a single base
    * row equal to old-totals − removed-delta. IDEMPOTENT for any doc
    * that has at least one posting: the delta is computed over removed
    * docs STILL PRESENT in the ledgered postings, so a replayed removal
    * subtracts nothing. Disclosed corner: a token-LESS doc has no
    * posting to witness its presence, so removing one adjusts n_docs on
    * every call — don't replay removals of empty documents. */
  def removeFromSearchIndex(spark: org.apache.spark.sql.SparkSession, name: String,
                            removed: DataFrame): Unit = {
    import graft.sources.FileFormats.writeBucketed
    val catalog = spark.sessionState.catalog
    val pt = s"${name}_postings"
    val tt = s"${name}_totals"
    graft.sources.FileFormats.healTornSwap(spark, pt)
    Seq(pt, tt).foreach(t => try spark.catalog.refreshTable(t) catch { case _: Throwable => () })
    val buckets = catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(pt))
      .bucketSpec.map(_.numBuckets).getOrElse(8)
    val led = ledger(spark, name)
    // ONE diff-sized materialization instead of three (toDrop /
    // emptyRemoved / delta each paid their own eager job — at takedown
    // sizes the fixed job cost dominated the removal): probe which
    // removed docs still have ledgered postings (semi-join the postings
    // scan down to the removal set FIRST — distinct runs over removed-
    // sized rows, not the whole corpus), tag the projection once, pin
    // once, and derive the drop set and the totals delta from the pin.
    val rmProj = docsProjected(removed)
    val presentIds = spark.table(pt).join(broadcast(led), "batch_id")
      .join(broadcast(rmProj.select(col("doc_id"))), Seq("doc_id"), "left_semi")
      .select(col("doc_id")).distinct()
    val rm = rmProj
      .join(presentIds.withColumn("present", lit(true)), Seq("doc_id"), "left_outer")
      .withColumn("present", coalesce(col("present"), lit(false)))
      .filter(col("present") || col("dl").isNull || col("dl") === 0L)
      .select(col("doc_id"), col("dl"), col("present")).pinned()
    val toDropIds = rm.filter(col("present")).select(col("doc_id"))
    // ONE aggregate job over the pin for everything the driver needs —
    // path choice (nRemoved/nPresent) AND the totals delta (rm_docs/
    // rm_dl). These were two separate head() jobs over the same
    // checkpointed relation; at takedown sizes each job is dominated by
    // its fixed dispatch, so folding them halves that tax (the
    // forget_search floor the round-14 profile flagged).
    val cnt = rm.agg(count(lit(1)).as("all"),
      coalesce(sum(when(col("present"), 1L).otherwise(0L)), lit(0L)).as("p"),
      coalesce(sum(when(col("present"), col("dl"))), lit(0L)).as("rm_dl")).head()
    val (nRemoved, nPresent) = (cnt.getLong(0), cnt.getLong(1))
    if (nRemoved == 0) return // replayed/absent removal: index already clean
    // TOUCHED-BUCKET pruning: a removed doc's postings live exactly in
    // the buckets of its own tokens, which the removal's text names
    // without any index scan — probe those (gated by the same
    // coupon-collector bound the dedup family uses) and rewrite only the
    // touched buckets, moving the rest's files unread. The partial path
    // deliberately does NOT fold batch_ids or drop unledgered orphans
    // (that is compaction's job); the full path keeps the fold.
    val affected: Option[Set[Int]] =
      if (nPresent == 0) Some(Set.empty)
      else if (nPresent >= buckets.toLong * 16) None
      else Some(explodedTokens(docsProjected(removed))
        .join(broadcast(toDropIds), Seq("doc_id"), "left_semi")
        .select(graft.sources.FileFormats.bucketIdCol(col("tok"), buckets).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet)
    affected match {
      case Some(a) if a.isEmpty => () // nothing ledgered to drop — totals-only
      case Some(a) if a.size < buckets =>
        val base = graft.sources.FileFormats.readBuckets(spark, pt, a)
        val cols = base.columns.map(col)
        graft.sources.FileFormats.writeBucketedSwapPartial(
          base.join(broadcast(toDropIds), Seq("doc_id"), "left_anti").select(cols: _*),
          pt, "tok", buckets, a)
      case _ =>
        // full staged swap: 1x postings IO + two renames, ledger folded
        graft.sources.FileFormats.writeBucketedSwap(
          spark.table(pt).join(broadcast(led), "batch_id")
            .join(broadcast(toDropIds), Seq("doc_id"), "left_anti")
            .select(col("tok"), col("doc_id"), col("dl"), col("tf"))
            .withColumn("batch_id", lit(BaseSegment)),
          pt, "tok", buckets)
    }
    val (rmDocs, rmDl) = (nRemoved, if (cnt.isNullAt(2)) 0L else cnt.getLong(2))
    if (affected.exists(_.size < buckets)) {
      // partial path: the ledger (distinct batch_id of totals) must keep
      // every id the untouched buckets' rows still carry — adjust the
      // base row in place instead of collapsing (totals are O(appends)
      // rows by construction, a bounded driver-side rewrite)
      val totRows = spark.table(tt)
        .select(col("n_docs").cast("long"), col("sum_dl").cast("long"), col("batch_id").cast("long"))
        .collect().toSeq
      val hasBase = totRows.exists(_.getLong(2) == BaseSegment)
      val adjusted = totRows.map { r =>
        if (r.getLong(2) == BaseSegment)
          (r.getLong(0) - rmDocs, r.getLong(1) - rmDl, BaseSegment)
        else (r.getLong(0), r.getLong(1), r.getLong(2))
      } ++ (if (hasBase) Nil else Seq((-rmDocs, -rmDl, BaseSegment)))
      import spark.implicits._
      adjusted.toDF("n_docs", "sum_dl", "batch_id").coalesce(1)
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(tt)
    } else {
      // full path: the merged totals row is ONE row by construction —
      // collect it and write from the driver-side literal instead of the
      // staged-table two-step (three catalog round-trips for a
      // single-row table; the crash window is the same final overwrite
      // either way)
      val tot = spark.table(tt)
        .agg(sum(col("n_docs")).cast("long").as("n_docs"),
          sum(col("sum_dl")).cast("long").as("sum_dl"))
        .head()
      writeTotalsRow(spark, tt,
        (if (tot.isNullAt(0)) 0L else tot.getLong(0)) - rmDocs,
        (if (tot.isNullAt(1)) 0L else tot.getLong(1)) - rmDl)
    }
    Seq(pt, tt).foreach(t => try spark.catalog.refreshTable(t) catch { case _: Throwable => () })
  }

  /** Overwrite the totals table with its single folded base row (used by
    * compaction and removal, whose merged totals are one row by
    * construction). */
  private def writeTotalsRow(spark: org.apache.spark.sql.SparkSession, tt: String,
                             nDocs: Long, sumDl: Long): Unit = {
    import spark.implicits._
    Seq((nDocs, sumDl, BaseSegment)).toDF("n_docs", "sum_dl", "batch_id")
      .coalesce(1)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite).saveAsTable(tt)
  }

  /** Drop the persisted search index (catalog + leftover managed
    * locations — same lifecycle contract as `Dedup.dropDedupIndex`). */
  def dropSearchIndex(spark: org.apache.spark.sql.SparkSession, name: String): Unit =
    for (s <- Seq("_postings", "_totals")) {
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

  /** Search the PERSISTED index: the query's term set becomes an
    * IN-filter on the bucketed `tok` column (bucket pruning, no corpus
    * re-tokenization), totals merge from the partial rows, and the
    * SHARED scoring tail guarantees result identity with [[bm25TopK]]
    * (spec-pinned, and the registered query is hash-gated against the
    * from-scratch oracle). */
  def bm25Indexed(spark: org.apache.spark.sql.SparkSession, name: String,
                  query: String = DefaultQuery, k: Int = DefaultK): DataFrame = {
    Seq(s"${name}_postings", s"${name}_totals")
      .foreach(t => try spark.catalog.refreshTable(t) catch { case _: Throwable => () })
    val terms = queryTerms(query)
    // only LEDGERED batches are visible — postings from a crashed append
    // (orphans) stay dark until compaction folds them out
    val tf = spark.table(s"${name}_postings")
      .filter(col("tok").isin(terms: _*))
      .join(broadcast(ledger(spark, name)), "batch_id")
    val stats = spark.table(s"${name}_totals")
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    scoreBm25(tf, stats, k)
  }
}
