package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** One-off stage profiler for the minhash pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[prof] $name: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("shingles")(Dedup.shingles(docs).count())
    time("signatures")(Dedup.minhashSignatures(docs).count())
    val sig = Dedup.minhashSignatures(docs)
    val bandCols = array((0 until Dedup.MinhashBands).map { b =>
      md5(concat(col(s"h${2 * b}"), col(s"h${2 * b + 1}")))
    }: _*)
    val bands = sig.select(col("doc_id"), posexplode(bandCols))
      .toDF("doc_id", "band_idx", "band_key")
    time("bands")(bands.count())
    val candidates = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    time("candidates")(candidates.count())
    time("full")(Dedup.minhashLsh(docs).count())
    spark.stop()
  }
}
