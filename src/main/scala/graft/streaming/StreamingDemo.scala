package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Runnable end-to-end streaming demo: stages the sf0.001 events fixture
  * as JSON files, streams them through the reference topology
  * (parse → watermark → windowed distinct → JSON sink records), and prints
  * the finalized windows. Usage: `runMain graft.streaming.StreamingDemo
  * [sfDir]`. */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-streaming-demo")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage the fixture as the reference's wire format: JSON {"uid","ts"}
    val stage = Files.createTempDirectory("graft-stream-in").toString
    Tables.events(spark, sfDir)
      .select(to_json(struct(
        col("user_id").cast("string").as("uid"),
        unix_timestamp(col("ts")).as("ts"))).as("value"))
      .write.mode("overwrite").text(stage)

    val raw = spark.readStream
      .schema("value STRING")
      .option("maxFilesPerTrigger", "1")
      .text(stage)

    val counts = StreamingUniqueUsers.uniqueUsersPerWindow(
      StreamingUniqueUsers.parseEvents(raw))
    val q = StreamingUniqueUsers.startMemorySink(
      StreamingUniqueUsers.toSinkRecords(counts), "demo_out")
    q.awaitTermination()

    val out = spark.table("demo_out").orderBy("key")
    println(s"[demo] finalized windows: ${out.count()}")
    out.show(5, false)

    // part 2: the online TRAINING-DATA pipeline — documents stream through
    // persisted-index dedup → within-stream dedup → curation → token-budget
    // shard export (graft.streaming.TrainingPipeline)
    val docStage = Files.createTempDirectory("graft-docs-in").toString
    Tables.documents(spark, sfDir)
      .select(to_json(struct(col("doc_id"), col("text"), col("source"),
        (lit(1700000000L) + col("doc_id")).as("ts_sec"))).as("value"))
      .write.mode("overwrite").text(docStage)
    // pretend the first five docs were already ingested: their fingerprints
    // form the persisted index the stream dedups against
    val fpIndex = Tables.documents(spark, sfDir).filter(col("doc_id") < 5)
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val docsIn = spark.readStream
      .schema("doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")
      .json(docStage)
      .select(col("doc_id"), col("text"), col("source"),
        timestamp_seconds(col("ts_sec")).as("ts"))
    val shardDir = Files.createTempDirectory("graft-shards-out").toString
    val cpDir = Files.createTempDirectory("graft-demo-cp").toString
    TrainingPipeline.start(docsIn, fpIndex, shardDir, cpDir).awaitTermination()
    val exported = new java.io.File(shardDir).listFiles().filter(_.isDirectory).toSeq
      .flatMap(d => try Some(spark.read.parquet(d.getPath)) catch { case _: Throwable => None })
      .map(_.count()).sum
    println(s"[demo] training shards exported under $shardDir: $exported docs " +
      "(index dups, stream dups and low-quality docs dropped)")
    spark.stop()
  }
}
