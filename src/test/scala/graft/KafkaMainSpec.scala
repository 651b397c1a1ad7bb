package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{KafkaMain, StreamingUniqueUsers}

/** The deployment contract (reference UniqueUsersCounter.java:49-56):
  *   - KafkaMain's topology round-trips events → sink records through
  *     the SAME `pipeline` function the Kafka main wires;
  *   - both Kafka edges (S1 source, S3 sink) execute as far as this
  *     sandbox can take them — data-source resolution — since no broker
  *     or connector jar exists here;
  *   - the consumer-side key-dedup sink collapses at-least-once
  *     redeliveries to one logical row per key (the end-to-end
  *     exactly-once completion of the reference's EXACTLY_ONCE claim).
  */
class KafkaMainSpec extends SparkSpec {

  import spark.implicits._

  private def jsonEvent(uid: String, sec: Long): String =
    s"""{"uid": "$uid", "ts": $sec}"""

  private val w0 = 1700000040L

  test("KafkaMain.pipeline: memory-stream round trip emits the reference's fixed record shape") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val q = KafkaMain.pipeline(in.toDF())
      .writeStream.format("memory").queryName("kafka_main_rt")
      .outputMode("append").start()
    try {
      in.addData(jsonEvent("a", w0 + 1), jsonEvent("b", w0 + 2),
        jsonEvent("a", w0 + 5))
      q.processAllAvailable()
      in.addData(jsonEvent("z", w0 + 400)) // advance watermark past w0
      q.processAllAvailable()
      val rows = spark.table("kafka_main_rt")
        .where(col("key") === w0.toString).collect()
      assert(rows.length === 1)
      // proper JSON value, unix-seconds key (reference README.md:42-43)
      assert(rows.head.getString(1) ===
        s"""{"window_start":$w0,"unique_users":2}""")
    } finally q.stop()
  }

  test("S1 kafka source edge executes to data-source resolution (connector absent here)") {
    val e = intercept[Exception] {
      StreamingUniqueUsers.kafkaSource(spark, "localhost:9092", "events_in")
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }

  test("S3 kafka-to-kafka writer wiring executes to the source-resolution point") {
    // kafkaWriter builds source → pipeline → sink eagerly; with no
    // connector on the classpath the FIRST edge (S1 load) must be what
    // fails — proving main's wiring runs, not just compiles
    val e = intercept[Exception] {
      KafkaMain.kafkaWriter(spark, "localhost:9092", "in_t", "out_t",
        Files.createTempDirectory("graft_km_ckpt").toString)
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
  }

  test("consumer-side key dedup: replayed deliveries collapse to one row per key, last wins") {
    val out = Files.createTempDirectory("graft_eo_out").toString
    val d1 = Seq((w0.toString, """{"unique_users":2}"""),
      ((w0 + 60).toString, """{"unique_users":1}""")).toDF("key", "value")
    // delivery 1, then the SAME batch redelivered (at-least-once retry),
    // then an update-mode re-emission superseding w0's count
    StreamingUniqueUsers.writeKeyDeduped(d1, out)
    StreamingUniqueUsers.writeKeyDeduped(d1, out)
    val d2 = Seq((w0.toString, """{"unique_users":3}""")).toDF("key", "value")
    StreamingUniqueUsers.writeKeyDeduped(d2, out)
    val got = spark.read.parquet(out)
      .select(col("key").cast("string"), col("value"))
      .as[(String, String)].collect().toMap
    assert(got.size === 2)
    assert(got(w0.toString) === """{"unique_users":3}""")      // last wins
    assert(got((w0 + 60).toString) === """{"unique_users":1}""") // untouched partition survives
  }

  test("key dedup with an ordering column: the highest-offset record wins WITHIN one delivery") {
    val out = Files.createTempDirectory("graft_eo_ord").toString
    // one consumer micro-batch spanning a window's original record AND
    // its later re-emission (real Kafka consumers see both; offset is
    // the true last-wins order)
    val d = Seq(
      (w0.toString, """{"unique_users":2}""", 10L),
      (w0.toString, """{"unique_users":3}""", 11L),
      ((w0 + 60).toString, """{"unique_users":1}""", 12L)
    ).toDF("key", "value", "offset")
    StreamingUniqueUsers.writeKeyDeduped(d, out, orderCol = Some("offset"))
    val got = spark.read.parquet(out)
      .select(col("key").cast("string"), col("value"))
      .as[(String, String)].collect().toMap
    assert(got.size === 2)
    assert(got(w0.toString) === """{"unique_users":3}""")
  }

  test("streaming key-dedup sink: full reprocessing replay leaves one logical row per window") {
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("graft_eo_stream").toString
    def runOnce(): Unit = {
      // fresh checkpoint each run = a from-scratch reprocessing replay
      // (the worst redelivery case: every batch re-delivered)
      val in = MemoryStream[String]
      in.addData(jsonEvent("a", w0 + 1), jsonEvent("b", w0 + 2))
      in.addData(jsonEvent("z", w0 + 400))
      val q = StreamingUniqueUsers.startKeyDedupedParquetSink(
        KafkaMain.pipeline(in.toDF()),
        out, Files.createTempDirectory("graft_eo_ckpt").toString)
      q.awaitTermination()
    }
    runOnce()
    runOnce()
    val rows = spark.read.parquet(out)
      .where(col("key") === w0.toString).collect()
    assert(rows.length === 1)
  }
}
