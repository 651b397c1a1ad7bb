package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Lifecycle, Relational, Search, Similarity, TextAnalysis}

/** Lifecycle.vacuum — the storage-generation housekeeping verb. The
  * spec fabricates the superseded locations a crashed swap strands
  * (`__old`/`__staged` table dirs, `cells__old`/`cells__compact` trees,
  * the revenue `stage`/`old` dirs) and pins the verb's contract:
  * live generations are never touched, reclaim is idempotent, a torn
  * swap is HEALED (data restored) rather than classified as garbage,
  * keepGenerations retains the newest residue, and a crash mid-vacuum
  * heals by re-running. */
class VacuumSpec extends SparkSpec {

  private def fs = new org.apache.hadoop.fs.Path("/tmp")
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def mkResidue(path: String, mtime: Long = -1L): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    fs.mkdirs(p)
    val f = fs.create(new org.apache.hadoop.fs.Path(p, "junk.parquet"), true)
    try f.write("superseded".getBytes("UTF-8")) finally f.close()
    if (mtime >= 0) fs.setTimes(p, mtime, -1)
  }

  private def whLoc(table: String): String = {
    val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
    new org.apache.hadoop.fs.Path(wh, table.toLowerCase(java.util.Locale.ROOT)).toString
  }

  test("vacuum reclaims fabricated crash residue in all four artifact trees; live generations untouched; idempotent") {
    val docs = Tables.documents(spark, Sf0001)
    val orders = Tables.orders(spark, Sf0001)
    val ivfPath = java.nio.file.Files.createTempDirectory("vacspec_ivf").toString
    val revPath = java.nio.file.Files.createTempDirectory("vacspec_rev").toString + "/tree"
    Dedup.dropDedupIndex(spark, "vac_dix")
    Search.dropSearchIndex(spark, "vac_srch")
    Dedup.saveDedupIndex(docs, "vac_dix")
    Search.saveSearchIndex(docs, "vac_srch")
    Similarity.saveIvfIndex(TextAnalysis.lexicalVectors(docs), ivfPath, slot = "vacspec")
    Relational.saveDailyRevenue(orders.filter("o_orderkey % 2 = 0"), revPath)
    Relational.applyDailyRevenueDelta(spark, revPath, orders.filter("o_orderkey % 2 = 1"), 1L)

    val liveFp = spark.table("vac_dix_fp").count()
    val livePost = spark.table("vac_srch_postings").count()
    val liveCells = spark.read.parquet(s"$ivfPath/cells").count()
    val liveRev = Relational.loadDailyRevenue(spark, revPath).count()

    // crash residue: a stranded __old dir per family, a stranded staged
    // cell tree, and stranded revenue stage/old trees
    val residues = Seq(
      whLoc("vac_dix_fp__old"), whLoc("vac_srch_postings__staged"),
      s"$ivfPath/cells__old", s"$ivfPath/cells__compact",
      s"$revPath/stage", s"$revPath/old")
    residues.foreach(mkResidue(_))

    val reclaimed = Lifecycle.vacuum(spark, "vac_dix", "vac_srch", ivfPath, Some(revPath))
    assert(reclaimed.map(_._2).toSet === residues.map(r =>
      new org.apache.hadoop.fs.Path(r).toString).toSet,
      "every fabricated residue reclaimed, nothing else")
    assert(reclaimed.forall(_._3 > 0L), "reclaimed bytes reported")
    residues.foreach(r => assert(!fs.exists(new org.apache.hadoop.fs.Path(r)), s"$r must be gone"))

    // live generations byte-for-byte usable: same counts, verbs still run
    assert(spark.table("vac_dix_fp").count() === liveFp)
    assert(spark.table("vac_srch_postings").count() === livePost)
    assert(spark.read.parquet(s"$ivfPath/cells").count() === liveCells)
    assert(Relational.loadDailyRevenue(spark, revPath).count() === liveRev)

    // idempotence (and the crash-mid-vacuum contract: deletes are
    // independent, so a partial first pass is just "fewer residues" —
    // the re-run reclaims the rest and then nothing)
    assert(Lifecycle.vacuum(spark, "vac_dix", "vac_srch", ivfPath, Some(revPath)).isEmpty)

    Dedup.dropDedupIndex(spark, "vac_dix")
    Search.dropSearchIndex(spark, "vac_srch")
  }

  test("vacuum heals a torn swap instead of deleting the only copy, and keepGenerations retains the newest residue") {
    val docs = Tables.documents(spark, Sf0001)
    val ivfPath = java.nio.file.Files.createTempDirectory("vacspec_torn_ivf").toString
    Search.dropSearchIndex(spark, "vac_torn")
    Search.saveSearchIndex(docs, "vac_torn")
    Similarity.saveIvfIndex(TextAnalysis.lexicalVectors(docs), ivfPath, slot = "vactorn")
    val livePost = spark.table("vac_torn_postings").count()
    val liveCells = spark.read.parquet(s"$ivfPath/cells").count()

    // torn FULL swap on both artifact kinds: live renamed out, swap-in
    // never happened — __old is the ONLY copy of the data
    spark.sql("ALTER TABLE `vac_torn_postings` RENAME TO `vac_torn_postings__old`")
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$ivfPath/cells"),
      new org.apache.hadoop.fs.Path(s"$ivfPath/cells__old")))

    val reclaimed = Lifecycle.vacuum(spark, "vac_torn", "vac_torn", ivfPath)
    // heal-first: the data came BACK as the live generation, nothing of
    // it was reclaimed as garbage
    assert(spark.table("vac_torn_postings").count() === livePost)
    assert(spark.read.parquet(s"$ivfPath/cells").count() === liveCells)
    assert(!reclaimed.exists(_._3 > 100L),
      s"a torn swap's data must be healed, not reclaimed: $reclaimed")

    // keepGenerations: two residues with ordered mtimes — keep=1 retains
    // the newest, reclaims the oldest
    val older = whLoc("vac_torn_postings__old")
    val newer = whLoc("vac_torn_postings__staged")
    mkResidue(older, mtime = 1000000L)
    mkResidue(newer) // now-mtime: the newest
    val kept = Lifecycle.vacuum(spark, "vac_torn", "vac_torn", ivfPath, keepGenerations = 1)
    assert(kept.map(_._2).contains(new org.apache.hadoop.fs.Path(older).toString))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(older)))
    assert(fs.exists(new org.apache.hadoop.fs.Path(newer)), "keep=1 retains the newest residue")
    // a second keep=0 pass reclaims the retained one
    assert(Lifecycle.vacuum(spark, "vac_torn", "vac_torn", ivfPath)
      .map(_._2).contains(new org.apache.hadoop.fs.Path(newer).toString))

    Search.dropSearchIndex(spark, "vac_torn")
  }

  test("vacuumEvery: the online pipeline reclaims crash residue mid-stream, results unaffected, residue bounded") {
    // four micro-batches with vacuumEvery=2 (and NO compaction cadence —
    // the swap verbs wipe __staged/__old at their own entry, so a
    // compaction cadence would reclaim the planted residue itself; the
    // vacuum cadence is what covers deployments that DON'T compact every
    // few batches) over a maintained dedup index AND a maintained search
    // index, with crash residue planted BEFORE the stream starts. Pins
    // the round-16 contract: (a) the per-family async slot serializes
    // append → vacuum, so reclamation runs mid-stream without touching a
    // live generation; (b) admitted results are identical to the
    // vacuum-less run (the maintained-index dup rejection still works
    // while vacuums interleave); (c) residue stays BOUNDED — the
    // in-pipeline keepGenerations=1 retains at most one superseded
    // generation per table instead of letting crash debris accumulate
    // over batches.
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    import graft.streaming.TrainingPipeline
    val w0 = 1700000040L
    val good = "the quick brown fox jumps over a lazy dog and then it runs " +
      "to the barn where the farmer is reading the morning mail today"
    val other = "a second fine document in the english language with the usual " +
      "collection of stopwords and a perfectly reasonable length for a test"
    val third = "yet another wholly original piece of text where the writer is " +
      "in a hurry but the sentences still read like the plain english they are"
    def docJson(id: Long, text: String, sec: Long): String =
      s"""{"doc_id": $id, "text": "$text", "source": "s0", "ts_sec": $sec}"""
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")
    val inDir = java.nio.file.Files.createTempDirectory("graft-vace-in").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft-vace-cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-vace-out").toString
    import spark.implicits._
    val seed = Seq((0L, "seed corpus doc", "s0")).toDF("doc_id", "text", "source")
    Dedup.dropDedupIndex(spark, "vace_dix")
    Search.dropSearchIndex(spark, "vace_srch")
    Dedup.saveDedupIndex(seed, "vace_dix")
    Search.saveSearchIndex(seed, "vace_srch")
    // crash residue, planted with OLD mtimes so the in-pipeline keep=1
    // retention (newest survives) deterministically reclaims the oldest
    val doomedResidue = Seq(whLoc("vace_dix_fp__old"), whLoc("vace_srch_postings__old"))
    val keptResidue = Seq(whLoc("vace_dix_fp__staged"), whLoc("vace_srch_postings__staged"))
    doomedResidue.foreach(mkResidue(_, mtime = 1000000L))
    keptResidue.foreach(mkResidue(_, mtime = 2000000L))
    Seq(
      "f0.jsonl" -> docJson(1, good, w0),
      "f1.jsonl" -> docJson(2, other, w0 + 7200),
      "f2.jsonl" -> docJson(3, third, w0 + 14400),
      "f3.jsonl" -> docJson(4, good, w0 + 21600) // dup of doc 1, post-vacuum
    ).zipWithIndex.foreach { case ((name, line), i) =>
      val p = java.nio.file.Paths.get(inDir, name)
      java.nio.file.Files.writeString(p, line + "\n")
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 10000L))
    }
    val docs = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(inDir)
      .select(col("doc_id"), col("text"), col("source"),
        timestamp_seconds(col("ts_sec")).as("ts"))
    TrainingPipeline.start(docs, Dedup.loadDedupIndex(spark, "vace_dix").fp, outDir, cpDir,
      maintainIndexName = Some("vace_dix"),
      maintainSearchIndexName = Some("vace_srch"),
      vacuumEvery = Some(2)).awaitTermination()
    // results unaffected by mid-stream vacuums: same admitted set as the
    // vacuum-less cadence run
    val admitted = new java.io.File(outDir).listFiles().filter(_.isDirectory).toSeq
      .flatMap(d => try spark.read.parquet(d.getPath).collect() catch { case _: Throwable => Nil })
      .map(_.getAs[Long]("doc_id")).sorted
    assert(admitted === Seq(1L, 2L, 3L),
      "mid-stream vacuums must not change what the maintained index rejects")
    // the oldest planted residue is reclaimed, the newest retained
    // (keep=1 — a reader may still hold the newest superseded listing)
    doomedResidue.foreach(r =>
      assert(!fs.exists(new org.apache.hadoop.fs.Path(r)), s"$r must be reclaimed mid-stream"))
    keptResidue.foreach(r =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(r)), s"$r must be retained (keep=1)"))
    // residue bounded: at most keepGenerations=1 superseded generation
    // per table survives N batches of cadence maintenance
    Seq("vace_dix_fp", "vace_dix_bands", "vace_dix_shingles",
        "vace_srch_postings", "vace_srch_totals").foreach { t =>
      val n = Seq("__staged", "__old")
        .count(s => fs.exists(new org.apache.hadoop.fs.Path(whLoc(t + s))))
      assert(n <= 1, s"$t residue unbounded: $n superseded generations survived")
    }
    // the maintained indexes still serve: fp holds seed + admitted docs,
    // postings search the admitted corpus
    assert(spark.table("vace_dix_fp").select("doc_id").distinct().count() === 4L)
    assert(spark.table("vace_srch_postings").count() > 0L)
    Dedup.dropDedupIndex(spark, "vace_dix")
    Search.dropSearchIndex(spark, "vace_srch")
  }
}
