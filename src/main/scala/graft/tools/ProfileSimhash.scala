package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** One-off stage profiler for the simhash pipeline (scratch): where does
  * dedup_simhash's time go — the shingle cache, the 64-vote signature
  * aggregation, or the banded pair join? */
object ProfileSimhash {
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
      println(f"[prof] $name%-14s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }

    for (r <- 1 to reps) {
      println(s"--- rep $r (cold) ---")
      spark.catalog.clearCache()
      Dedup.clearSessionState()
      time("shingle_cache")(Dedup.shingleArraysCached(docs).count())
      time("signatures")(Dedup.simhashSignatures(docs).count())
      // staged decomposition of simhashPairs
      val sig = Dedup.simhashSignatures(docs).persist()
      time("sig_cache")(sig.count())
      val mask = (1L << 16) - 1
      val bandCols = array((0 until 4).map { b =>
        shiftright(col("simhash"), 16 * b).bitwiseAND(lit(mask))
      }: _*)
      val bands = sig.select(col("doc_id"), col("simhash"), posexplode(bandCols))
        .toDF("doc_id", "simhash", "band_idx", "band_key")
      val keep = bands.groupBy(col("band_idx"), col("band_key"))
        .agg(count(lit(1)).as("bn")).filter(col("bn") <= 1000)
        .select(col("band_idx"), col("band_key"))
      val kept = bands.join(keep, Seq("band_idx", "band_key"))
      time("kept")(kept.count())
      val joined = kept.as("a")
        .join(kept.as("b"),
          col("a.band_idx") === col("b.band_idx") &&
            col("a.band_key") === col("b.band_key") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      time("band_join")(joined.count())
      time("dist_filter")(joined.distinct().filter(col("hamming") <= 3).count())
      sig.unpersist()
      time("full_pairs")(Dedup.simhashPairs(docs).count())
      // minhash signature honest cost (persist defeats count's pruning)
      val msig = Dedup.minhashSignatures(docs).persist()
      time("minhash_sig")(msig.count())
      msig.unpersist()
      time("minhash_pairs")(Dedup.minhashPairs(docs).count())
    }
    spark.stop()
  }
}
