package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profiler for the streaming sink's per-batch cost (dev
  * tool, the microscope behind the round-10 throughput work): times each
  * foreachBatch stage standalone on one synthetic micro-batch, so a
  * trigger-time regression can be attributed to a stage instead of
  * guessed at. Findings it exists to reproduce: an unpersisted
  * foreachBatch Dataset re-runs the upstream chain per action; a
  * single-task shard export serializes ~100 directory writes (the
  * repartition-on-partition-columns form parallelizes them at the same
  * file count); the second appendToDedupIndex call is the steady-state
  * cost (the first pays table-metadata first-touch). */
object ProfileSink {
  def main(args: Array[String]): Unit = {
    val warehouse = java.nio.file.Files.createTempDirectory("graft-ps-wh").toString
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def goodText(seed: Int): String = {
      val r = new scala.util.Random(seed)
      (0 until 60).map(_ => s"w${r.nextInt(2000)}").mkString(" ")
    }
    val docs = (0 until 4400).map(i => (i.toLong, goodText(i), s"s${i % 4}"))
      .toDF("doc_id", "text", "source")
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + col("doc_id") / 10))
    val seedDocs = (0 until 1000).map(i => (i.toLong, goodText(5000000 + i), "seed"))
      .toDF("doc_id", "text", "source")
    graft.operators.Dedup.saveDedupIndex(seedDocs, "ps_dix")
    def timed(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val b = docs.persist(); b.count()
    graft.streaming.StreamingCuration.curate(b).count() // JIT/codegen warmup
    timed("curate")(graft.streaming.StreamingCuration.curate(b).count())
    val fp = graft.operators.Dedup.loadDedupIndex(spark, "ps_dix").fp
    timed("index_antijoin")(graft.streaming.StreamingDedup.againstIndex(b, fp).count())
    val exp1 = java.nio.file.Files.createTempDirectory("ps-exp1").toString
    timed("shard_export_1_task")(
      graft.sources.FileFormats.writeTrainingShards(b, exp1, writerTasks = Some(1)))
    val exp8 = java.nio.file.Files.createTempDirectory("ps-exp8").toString
    timed("shard_export_8_tasks")(
      graft.sources.FileFormats.writeTrainingShards(b, exp8, writerTasks = Some(8)))
    timed("appendToDedupIndex_cold")(
      graft.operators.Dedup.appendToDedupIndex(b, "ps_dix"))
    timed("appendToDedupIndex_steady")(graft.operators.Dedup.appendToDedupIndex(
      b.withColumn("doc_id", col("doc_id") + 10000), "ps_dix"))
    spark.stop()
  }
}
