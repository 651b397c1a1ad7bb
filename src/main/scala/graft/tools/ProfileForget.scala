package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the forget-cascade lifecycle at a given SF —
  * where do the seconds go: the three index builds, the three family
  * removals, or the report? `runMain graft.tools.ProfileForget <sfDir>`.
  * One line per stage; run twice in-JVM for a warm reading. */
object ProfileForget {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val docs = graft.Tables.documents(spark, sfDir)
      val dedupName = "pf_dix"; val searchName = "pf_srch"
      val ivfPath = s"${System.getProperty("java.io.tmpdir")}/graft_pf_ivf"
      t("drop") {
        Dedup.dropDedupIndex(spark, dedupName)
        Search.dropSearchIndex(spark, searchName)
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(); ()
        }
        rm(new java.io.File(ivfPath))
      }
      t("shingleCache")(Dedup.shingleArraysCached(docs).count())
      t("build_dedup")(Dedup.saveDedupIndex(docs, dedupName))
      t("build_search")(Search.saveSearchIndex(docs, searchName))
      val lex = TextAnalysis.lexicalVectors(docs)
      t("ivf_quantizer")(Similarity.quantizerFor(lex, 16, slot = "pfcascade"))
      t("ivf_lex_count")(lex.count())
      t("build_ivf")(Similarity.saveIvfIndex(lex, ivfPath, slot = "pfcascade"))
      val doomed = t("doomed_pin")(docs.filter(col("doc_id") % 10 === 3).localCheckpoint())
      t("forget_dedup")(Dedup.applyCorpusDiff(spark, dedupName, doomed, doomed.filter(lit(false))))
      t("forget_search")(Search.removeFromSearchIndex(spark, searchName, doomed))
      t("forget_ivf")(Similarity.removeFromIvfIndex(spark, ivfPath,
        doomed.select(col("doc_id").as("vec_id"))))
      t("report") {
        val forgotten = doomed.select(col("doc_id"))
        def rep(ids: org.apache.spark.sql.DataFrame): Long =
          ids.select(col("doc_id")).distinct()
            .join(broadcast(forgotten.withColumn("hit", lit(1L))), Seq("doc_id"), "left_outer")
            .agg(count(lit(1))).head().getLong(0)
        rep(spark.table(s"${dedupName}_fp")) +
          rep(spark.table(s"${searchName}_postings")) +
          rep(spark.read.parquet(s"$ivfPath/cells").select(col("vec_id").as("doc_id")))
      }
    }
    spark.stop()
  }
}
