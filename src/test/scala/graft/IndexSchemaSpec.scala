package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, IndexSchemaException, Lifecycle, Search, Similarity, TextAnalysis}

/** The index schema-evolution contract (round-16 verdict task 6), per
  * family: an append whose batch GREW a column succeeds and the
  * persisted schema never drifts (added columns are projected away);
  * an append MISSING a required column fails with the named
  * [[IndexSchemaException]] — before any table, ledger or file is
  * touched — and the index keeps serving. Each family is then driven
  * through its full lifecycle on the evolved history: append →
  * search/read → compact → vacuum. */
class IndexSchemaSpec extends SparkSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "text", "source")

  test("dedup index: added column ignored, missing column is a named contract error; compact+vacuum after evolution") {
    Dedup.dropDedupIndex(spark, "ixs_dix")
    Dedup.saveDedupIndex(docsDf(
      (1L, "alpha beta gamma delta epsilon", "s0"),
      (2L, "one two three four five six", "s0")), "ixs_dix")
    // ADDED column: appends cleanly, fp schema stays canonical
    val grown = docsDf((3L, "seven eight nine ten eleven", "s1"))
      .withColumn("quality_milli", lit(750L))
    Dedup.appendToDedupIndex(grown, "ixs_dix")
    assert(spark.table("ixs_dix_fp").columns.sorted === Array("doc_id", "fp"),
      "fp schema must not drift when the batch grows a column")
    assert(spark.table("ixs_dix_fp").select("doc_id").distinct().count() === 3L)
    // MISSING required column: named error, index untouched
    val before = spark.table("ixs_dix_fp").count()
    val e = intercept[IndexSchemaException] {
      Dedup.appendToDedupIndex(
        Seq((4L, "s1")).toDF("doc_id", "source"), "ixs_dix")
    }
    assert(e.family === "dedup" && e.missing === Seq("text"))
    assert(spark.table("ixs_dix_fp").count() === before,
      "a contract failure must leave the index exactly as it was")
    // the evolved history survives the rest of the lifecycle
    Dedup.compactDedupIndex(spark, "ixs_dix")
    assert(spark.table("ixs_dix_fp").select("doc_id").distinct().count() === 3L)
    assert(Lifecycle.vacuumSome(spark, dedupName = Some("ixs_dix")).isEmpty)
    Dedup.dropDedupIndex(spark, "ixs_dix")
  }

  test("search index: added column ignored, missing column is a named contract error; compact+vacuum after evolution") {
    Search.dropSearchIndex(spark, "ixs_srch")
    Search.saveSearchIndex(docsDf(
      (1L, "the quick brown fox jumps", "s0"),
      (2L, "a lazy dog sleeps in the sun", "s0")), "ixs_srch")
    val grown = docsDf((3L, "the fox and the dog are friends", "s1"))
      .withColumn("lang", lit("en"))
    Search.appendToSearchIndex(grown, "ixs_srch", Some(7L))
    assert(spark.table("ixs_srch_postings").columns.sorted ===
      Array("batch_id", "dl", "doc_id", "tf", "tok"),
      "postings schema must not drift when the batch grows a column")
    assert(spark.table("ixs_srch_postings")
      .filter(col("tok") === "fox").select("doc_id").distinct().count() === 2L,
      "the appended doc must be searchable")
    val before = spark.table("ixs_srch_postings").count()
    val e = intercept[IndexSchemaException] {
      Search.appendToSearchIndex(
        Seq((4L, "s1")).toDF("doc_id", "source"), "ixs_srch", Some(8L))
    }
    assert(e.family === "search" && e.missing === Seq("text"))
    assert(spark.table("ixs_srch_postings").count() === before)
    assert(spark.table("ixs_srch_totals").filter(col("batch_id") === 8L).count() === 0L,
      "a contract failure must not ledger the batch id")
    Search.compactSearchIndex(spark, "ixs_srch")
    assert(spark.table("ixs_srch_postings")
      .filter(col("tok") === "fox").select("doc_id").distinct().count() === 2L)
    assert(Lifecycle.vacuumSome(spark, searchName = Some("ixs_srch")).isEmpty)
    Search.dropSearchIndex(spark, "ixs_srch")
  }

  test("ivf index: added column never reaches the cell tree, missing column is a named contract error; compact+vacuum after evolution") {
    val path = java.nio.file.Files.createTempDirectory("ixs_ivf").toString
    val base = TextAnalysis.lexicalVectors(docsDf(
      (1L, "alpha beta gamma delta", "s0"),
      (2L, "one two three four", "s0"),
      (3L, "red green blue yellow", "s0")))
    try {
      Similarity.saveIvfIndex(base, path, slot = "ixsspec")
      // ADDED column: the cell tree's file schemas must stay canonical —
      // this is the family where a raw parquet Append would otherwise
      // commit per-file schema drift
      val grown = TextAnalysis.lexicalVectors(
        docsDf((4L, "five six seven eight", "s1")))
        .withColumn("ingest_day", lit("2026-08-16"))
      Similarity.appendToIvfIndex(grown, path)
      val cells = spark.read.parquet(s"$path/cells")
      assert(cells.columns.sorted === Array("cell", "embedding", "vec_id"),
        "cell-tree schema must not drift when the batch grows a column")
      assert(cells.select("vec_id").distinct().count() === 4L)
      val e = intercept[IndexSchemaException] {
        Similarity.appendToIvfIndex(
          Seq((5L, "x")).toDF("vec_id", "payload"), path)
      }
      assert(e.family === "ivf" && e.missing === Seq("embedding"))
      assert(spark.read.parquet(s"$path/cells").select("vec_id").distinct().count() === 4L)
      Similarity.compactIvfIndex(spark, path)
      assert(spark.read.parquet(s"$path/cells").select("vec_id").distinct().count() === 4L)
      assert(Lifecycle.vacuumSome(spark, ivfPath = Some(path)).isEmpty)
    } finally Similarity.clearSessionState()
  }
}
