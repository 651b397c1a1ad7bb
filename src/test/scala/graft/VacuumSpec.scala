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
}
