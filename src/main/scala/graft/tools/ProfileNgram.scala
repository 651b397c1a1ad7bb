package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Stage profiler for ngramJaccard + substringDup (scratch): df-cut
  * aggregate vs candidate self-join vs array verify. */
object ProfileNgram {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name%-16s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }

    for (r <- 1 to reps) {
      println(s"--- rep $r (cold) ---")
      spark.catalog.clearCache()
      Dedup.clearSessionState()
      time("shingle_cache")(Dedup.shingleArraysCached(docs).count())
      val sh = Dedup.shingles(docs)
      val rare = sh.groupBy(col("source"), col("g"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") <= 1000)
        .select(col("source").as("r_source"), col("g").as("r_g"))
      val idx = sh
        .join(rare, col("source") === col("r_source") && col("g") === col("r_g"))
        .select(col("doc_id"), col("source"), col("g"))
      val candidates = idx.as("a")
        .join(idx.as("b"),
          col("a.source") === col("b.source") &&
            col("a.g") === col("b.g") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val preDistinct = idx.as("a")
        .join(idx.as("b"),
          col("a.source") === col("b.source") &&
            col("a.g") === col("b.g") &&
            col("a.doc_id") < col("b.doc_id"))
      time("pre_distinct")(preDistinct.count())
      time("candidates")(candidates.count())
      time("ngram_full")(Dedup.ngramJaccard(docs).count())
      time("substring_full")(Dedup.substringDup(docs).count())
      time("substr_stats")(Dedup.substringGramStats(docs).count())
    }
    spark.stop()
  }
}
