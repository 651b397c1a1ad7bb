package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.functions._

/** The crash contract of [[Par.runAll]] and the heal-on-re-run recovery
  * every caller's documentation leans on: a failure must propagate only
  * after EVERY sibling thunk has settled (no orphan writer can outlive
  * the call and race the idempotent re-run), and each index family's
  * rewrite verbs must recover a crash injected into a concurrent
  * fan-out — including the torn-swap window between
  * `writeBucketedSwap`'s two renames. */
class ParSpec extends SparkSpec {
  import spark.implicits._

  test("runAll propagates a failure only after every sibling thunk settled") {
    val slowDone = new AtomicBoolean(false)
    val ex = intercept[RuntimeException] {
      Par.runAll(
        () => throw new RuntimeException("boom"),
        () => { Thread.sleep(500); slowDone.set(true) })
    }
    assert(ex.getMessage === "boom")
    assert(slowDone.get,
      "runAll returned while a sibling thunk was still in flight — " +
        "an idempotent re-run could race the orphan writer")
  }

  test("runAll rethrows the first failure in ARGUMENT order, later ones suppressed") {
    // the temporally-first failure is the second argument; argument
    // order wins so the rethrown exception is deterministic
    val ex = intercept[RuntimeException] {
      Par.runAll(
        () => { Thread.sleep(300); throw new RuntimeException("first-arg") },
        () => throw new IllegalStateException("second-arg"))
    }
    assert(ex.getMessage === "first-arg")
    assert(ex.getSuppressed.map(_.getMessage).toSeq === Seq("second-arg"))
  }

  test("runAll with no failures runs every thunk exactly once") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    Par.runAll((1 to 5).map(_ => () => { hits.incrementAndGet(); () }): _*)
    assert(hits.get === 5)
  }

  test("crash injected into the three-family forget fan-out: survivors commit, re-run completes all three") {
    import graft.operators.{Dedup, Lifecycle, Search, Similarity, TextAnalysis}
    val docs = Tables.documents(spark, Sf0001)
    val ivfPath = java.nio.file.Files.createTempDirectory("parspec_ivf").toString
    Dedup.dropDedupIndex(spark, "par_dix")
    Search.dropSearchIndex(spark, "par_srch")
    Dedup.saveDedupIndex(docs, "par_dix")
    Search.saveSearchIndex(docs, "par_srch")
    Similarity.saveIvfIndex(TextAnalysis.lexicalVectors(docs), ivfPath, slot = "parspec")
    val doomed = docs.filter("doc_id % 5 = 1").localCheckpoint()
    // the forget() fan-out with the third family's thunk crashing: the
    // two real rewrites must COMMIT (settle-all), the failure must
    // surface, and the documented recovery — run the verb again — must
    // leave all three families exactly as a clean forget would
    val ex = intercept[RuntimeException] {
      Par.runAll(
        () => Dedup.applyCorpusDiff(spark, "par_dix", doomed, doomed.filter(lit(false))),
        () => Search.removeFromSearchIndex(spark, "par_srch", doomed),
        () => throw new RuntimeException("ivf-crash"))
    }
    assert(ex.getMessage === "ivf-crash")
    val ids = doomed.select("doc_id")
    // survivors committed before the failure propagated
    assert(spark.table("par_dix_fp").join(ids, "doc_id").count() === 0L)
    assert(spark.table("par_srch_postings").join(ids, "doc_id").count() === 0L)
    // recovery: the full verb re-runs idempotently and completes the
    // crashed family too
    Lifecycle.forget(spark, doomed, "par_dix", "par_srch", ivfPath)
    assert(spark.read.parquet(s"$ivfPath/cells")
      .join(ids.withColumnRenamed("doc_id", "vec_id"), "vec_id").count() === 0L)
    val expected = docs.count() - doomed.count()
    assert(spark.table("par_dix_fp").select("doc_id").distinct().count() === expected)
    assert(spark.table("par_srch_postings").select("doc_id").distinct().count() === expected)
    assert(spark.read.parquet(s"$ivfPath/cells").count() === expected)
    // housekeeping rides the cascade: after a CLEAN forget every swap
    // already reclaimed its own old generation, so vacuum finds nothing —
    // and the families it healed/inspected still answer identically
    assert(Lifecycle.vacuum(spark, "par_dix", "par_srch", ivfPath).isEmpty)
    assert(spark.table("par_dix_fp").select("doc_id").distinct().count() === expected)
    assert(spark.read.parquet(s"$ivfPath/cells").count() === expected)
    Dedup.dropDedupIndex(spark, "par_dix")
    Search.dropSearchIndex(spark, "par_srch")
  }

  test("small takedown rides the TOUCHED-BUCKET path in all three families: contract holds, untouched files move verbatim") {
    import graft.operators.{Dedup, Lifecycle, Search, Similarity, TextAnalysis}
    import graft.sources.FileFormats
    val docs = Tables.documents(spark, Sf0001)
    val ivfPath = java.nio.file.Files.createTempDirectory("parspec_tb_ivf").toString
    Dedup.dropDedupIndex(spark, "tb_dix")
    Search.dropSearchIndex(spark, "tb_srch")
    Dedup.saveDedupIndex(docs, "tb_dix")
    // postings bucket by TOKEN: a single doc's ~100 distinct tokens cover
    // any 8-bucket layout entirely (correctly forcing the full path), so
    // the partial-path evidence needs a production-shaped bucket count
    // where 2 docs' tokens cannot touch everything
    Search.saveSearchIndex(docs, "tb_srch", buckets = 256)
    Similarity.saveIvfIndex(TextAnalysis.lexicalVectors(docs), ivfPath, slot = "parspec_tb")
    def files(table: String): Map[String, Long] = {
      val loc = FileFormats.tableLocation(spark, table)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(loc).filter(_.isFile)
        .filter(st => FileFormats.bucketIdOfFile(st.getPath.getName).isDefined)
        .map(st => st.getPath.getName -> st.getLen).toMap
    }
    def cellDirs(): Map[String, Long] = {
      val root = new org.apache.hadoop.fs.Path(s"$ivfPath/cells")
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(root).filter(_.isDirectory).map { d =>
        d.getPath.getName -> fs.listStatus(d.getPath).filter(_.isFile).map(_.getLen).sum
      }.toMap
    }
    val fpBefore = files("tb_dix_fp")
    val postBefore = files("tb_srch_postings")
    val cellsBefore = cellDirs()
    // a 2-document takedown — far under every family's coupon-collector
    // gate, so all three MUST take the partial path
    val doomed = docs.filter(col("doc_id").isin(11L, 23L)).localCheckpoint()
    Lifecycle.forget(spark, doomed, "tb_dix", "tb_srch", ivfPath)
    val ids = doomed.select("doc_id")
    // the contract oracle: forgotten-present == 0 and remaining == docs − 2
    val expected = docs.count() - 2
    assert(spark.table("tb_dix_fp").join(ids, "doc_id").count() === 0L)
    assert(spark.table("tb_srch_postings").join(ids, "doc_id").count() === 0L)
    assert(spark.read.parquet(s"$ivfPath/cells")
      .join(ids.withColumnRenamed("doc_id", "vec_id"), "vec_id").count() === 0L)
    assert(spark.table("tb_dix_fp").select("doc_id").distinct().count() === expected)
    assert(spark.table("tb_srch_postings").select("doc_id").distinct().count() === expected)
    assert(spark.read.parquet(s"$ivfPath/cells").count() === expected)
    // touched-bucket evidence: at least one bucket/cell in each family
    // kept its ORIGINAL file (name and size — moved, never rewritten)
    val fpAfter = files("tb_dix_fp")
    val postAfter = files("tb_srch_postings")
    val cellsAfter = cellDirs()
    assert((fpAfter.toSet & fpBefore.toSet).nonEmpty,
      "fp: a 2-doc takedown must leave most buckets' files untouched")
    assert((postAfter.toSet & postBefore.toSet).nonEmpty,
      "postings: untouched token buckets must move verbatim")
    assert((cellsAfter.toSet & cellsBefore.toSet).nonEmpty,
      "ivf: untouched cells must keep their directories byte-identical")
    // and the verb stays idempotent on the partial path
    Lifecycle.forget(spark, doomed, "tb_dix", "tb_srch", ivfPath)
    assert(spark.table("tb_dix_fp").select("doc_id").distinct().count() === expected)
    Dedup.dropDedupIndex(spark, "tb_dix")
    Search.dropSearchIndex(spark, "tb_srch")
  }

  test("IVF partial cell swap heals FORWARD from its marker after a crash in the move window") {
    import graft.operators.{Similarity, TextAnalysis}
    val docs = Tables.documents(spark, Sf0001)
    val ivfPath = java.nio.file.Files.createTempDirectory("parspec_heal_ivf").toString
    Similarity.saveIvfIndex(TextAnalysis.lexicalVectors(docs), ivfPath, slot = "parspec_heal")
    val live = new org.apache.hadoop.fs.Path(s"$ivfPath/cells")
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val before = spark.read.parquet(live.toString)
    val total = before.count()
    // pick a victim vector and its cell; stage a rewrite of that one cell
    // with the victim dropped, write the marker, and "crash" before any
    // move — the torn state a partial rewrite's move window can leave
    val victim = before.select("vec_id", "cell").head()
    val victimId = victim.getLong(0)
    val cellDir = s"cell=${victim.get(1)}"
    val staged = new org.apache.hadoop.fs.Path(s"$ivfPath/cells__pstaged")
    spark.read.option("basePath", live.toString).parquet(s"$live/$cellDir")
      .filter(col("vec_id") =!= victimId)
      .repartition(col("cell"))
      .write.partitionBy("cell").parquet(staged.toString)
    val out = fs.create(new org.apache.hadoop.fs.Path(staged, Similarity.CellMarker), true)
    out.write(s"$cellDir:1".getBytes("UTF-8")); out.close()
    // next verb entry heals forward: the victim is gone, bystanders stay
    Similarity.healPartialCells(spark, ivfPath)
    val after = spark.read.parquet(live.toString)
    assert(after.count() === total - 1)
    assert(after.filter(col("vec_id") === victimId).count() === 0L)
    assert(!fs.exists(staged) && !fs.exists(new org.apache.hadoop.fs.Path(s"$ivfPath/cells__pold")))
    // and a second heal is a no-op
    Similarity.healPartialCells(spark, ivfPath)
    assert(spark.read.parquet(live.toString).count() === total - 1)
  }

  test("AsyncCompactions: one in flight per family, awaits join, failures surface at the next touch") {
    val comps = new graft.streaming.TrainingPipeline.AsyncCompactions
    val done = new AtomicBoolean(false)
    comps.schedule("fam") { Thread.sleep(300); done.set(true) }
    // a second schedule for the SAME family joins the first before starting
    val secondSawFirst = new AtomicBoolean(false)
    comps.schedule("fam") { secondSawFirst.set(done.get) }
    comps.await("fam")
    assert(done.get && secondSawFirst.get,
      "schedule must join the family's in-flight compaction before starting the next")
    // a failing compaction surfaces at the NEXT await of that family…
    comps.schedule("boom") { throw new IllegalStateException("compaction failed") }
    val ex = intercept[IllegalStateException] { comps.await("boom") }
    assert(ex.getMessage === "compaction failed")
    // …and the slot is then clear: the family is re-usable (heal-on-re-run)
    comps.await("boom") // no-op, does not rethrow
    // drainAll joins every family
    val a = new AtomicBoolean(false); val b = new AtomicBoolean(false)
    comps.schedule("fa") { Thread.sleep(150); a.set(true) }
    comps.schedule("fb") { Thread.sleep(150); b.set(true) }
    comps.drainAll()
    assert(a.get && b.get, "drainAll must join every pending family")
  }

  test("AsyncCompactions: concurrent awaiters of one family are BOTH excluded until the rewrite lands") {
    // the round-12 advisor finding: await used to remove-then-join, so a
    // second concurrent awaiter saw an empty slot and proceeded while the
    // rewrite was still in flight. Now both join; removal happens after.
    val comps = new graft.streaming.TrainingPipeline.AsyncCompactions
    val done = new AtomicBoolean(false)
    comps.schedule("fam") { Thread.sleep(300); done.set(true) }
    val sawDone = new java.util.concurrent.atomic.AtomicInteger(0)
    val awaiters = (1 to 2).map { _ =>
      new Thread(() => { comps.await("fam"); if (done.get) sawDone.incrementAndGet(); () })
    }
    awaiters.foreach(_.start()); awaiters.foreach(_.join())
    assert(sawDone.get === 2,
      "every concurrent awaiter must observe the completed rewrite, not an empty slot")
    // and a failure still clears the slot after surfacing (heal-on-re-run)
    comps.schedule("fam") { throw new IllegalStateException("x") }
    intercept[IllegalStateException] { comps.await("fam") }
    comps.await("fam") // no-op
  }

  test("search-index swap torn mid-crash heals at the next verb entry") {
    import graft.operators.Search
    val docs = Tables.documents(spark, Sf0001)
    Search.dropSearchIndex(spark, "par_torn")
    Search.saveSearchIndex(docs, "par_torn")
    val before = spark.table("par_torn_postings").count()
    // simulate the crash window between writeBucketedSwap's two renames:
    // the live table is gone, only __old remains
    spark.sql("ALTER TABLE par_torn_postings RENAME TO par_torn_postings__old")
    assert(!spark.catalog.tableExists("par_torn_postings"))
    // the removal verb heals at entry and completes against the restored
    // pre-swap state
    val doomed = docs.filter("doc_id % 9 = 4").localCheckpoint()
    Search.removeFromSearchIndex(spark, "par_torn", doomed)
    val ids = doomed.select("doc_id")
    assert(spark.table("par_torn_postings").join(ids, "doc_id").count() === 0L)
    assert(spark.table("par_torn_postings").count() < before)
    // and the healed index equals a clean remove: same doc set as a
    // fresh save over the surviving corpus
    val survivors = docs.join(ids, Seq("doc_id"), "left_anti")
    assert(spark.table("par_torn_postings").select("doc_id").distinct().count()
      === survivors.count())
    Search.dropSearchIndex(spark, "par_torn")
  }

  test("forget-cascade family torn at entry: the cascade heals and completes") {
    import graft.operators.{Dedup, Lifecycle, Search, Similarity, TextAnalysis}
    val docs = Tables.documents(spark, Sf0001)
    val ivfPath = java.nio.file.Files.createTempDirectory("parspec_ivf2").toString
    Dedup.dropDedupIndex(spark, "par_cx")
    Search.dropSearchIndex(spark, "par_cxs")
    Dedup.saveDedupIndex(docs, "par_cx")
    Search.saveSearchIndex(docs, "par_cxs")
    Similarity.saveIvfIndex(TextAnalysis.lexicalVectors(docs), ivfPath, slot = "parspec2")
    // tear TWO families at once (dedup fp + search postings) — the
    // cascade's per-family verbs each heal their own table at entry
    spark.sql("ALTER TABLE par_cx_fp RENAME TO par_cx_fp__old")
    spark.sql("ALTER TABLE par_cxs_postings RENAME TO par_cxs_postings__old")
    val doomed = docs.filter("doc_id % 6 = 3").localCheckpoint()
    Lifecycle.forget(spark, doomed, "par_cx", "par_cxs", ivfPath)
    val ids = doomed.select("doc_id")
    assert(spark.table("par_cx_fp").join(ids, "doc_id").count() === 0L)
    assert(spark.table("par_cxs_postings").join(ids, "doc_id").count() === 0L)
    assert(spark.read.parquet(s"$ivfPath/cells")
      .join(ids.withColumnRenamed("doc_id", "vec_id"), "vec_id").count() === 0L)
    val expected = docs.count() - doomed.count()
    assert(spark.table("par_cx_fp").select("doc_id").distinct().count() === expected)
    assert(spark.table("par_cxs_postings").select("doc_id").distinct().count() === expected)
    Dedup.dropDedupIndex(spark, "par_cx")
    Search.dropSearchIndex(spark, "par_cxs")
  }
}
