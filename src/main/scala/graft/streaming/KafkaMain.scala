package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.DataStreamWriter

/** The reference's deployment contract as a runnable main: a two-arg
  * `(inputTopic, outputTopic)` CLI that wires the Kafka source through
  * the windowed distinct to the Kafka sink — the exact surface of
  * `/root/reference/src/main/java/com/isidora/kafka/UniqueUsersCounter.java:49-55`
  * (its `main(String[] args)` takes the two topics; its Dockerfile passes
  * `$INPUT_TOPIC $OUTPUT_TOPIC`; bootstrap hard-codes `localhost:9092` at
  * :55 — here that is the default, overridable by arg 3 or
  * `KAFKA_BOOTSTRAP`).
  *
  * The topology is source/sink-agnostic through [[pipeline]], so tests
  * drive the identical dataflow from a MemoryStream into a memory sink
  * (no broker exists in this build sandbox, and no kafka-clients jar is
  * packaged, so the `format("kafka")` edges resolve only at runtime on a
  * cluster with the spark-sql-kafka connector deployed — the spec pins
  * that both edges execute up to exactly that data-source-resolution
  * point).
  *
  * Semantics notes vs the reference:
  *  - event-time windows + watermark (the reference windows on ingest
  *    time with unbounded per-window HashSet state; see
  *    [[StreamingUniqueUsers.uniqueUsersPerWindowIngest]] for the
  *    faithful time-domain variant);
  *  - `append` output mode: one final record per window once the
  *    watermark passes — the fixed emission the reference author
  *    wanted (README.md:45-52) and the only mode Spark permits for the
  *    chained two-phase exact distinct (multi-aggregation streams are
  *    append-only); the reference's per-update changelog behavior
  *    survives in the single-aggregation
  *    [[StreamingUniqueUsers.uniqueUsersPerWindowApprox]] update-mode
  *    path;
  *  - delivery: Spark's Kafka sink is at-least-once; checkpointed state
  *    plus the consumer-side key dedup pattern
  *    ([[StreamingUniqueUsers.startKeyDedupedParquetSink]], spec-proven
  *    replay-idempotent) completes the end-to-end exactly-once the
  *    reference claimed via `EXACTLY_ONCE` (UniqueUsersCounter.java:56).
  */
object KafkaMain {

  /** UniqueUsersCounter.java:55. */
  val DefaultBootstrap = "localhost:9092"

  /** raw `value`-bytes frame → sink-record frame: the reference's whole
    * operator chain (S2 parse → O1-O5 windowed distinct → O7 key
    * projection), independent of what the frame reads from or writes
    * to. One function so the Kafka main and the broker-less tests run
    * byte-identical dataflow. */
  def pipeline(raw: DataFrame,
               windowLen: String = "1 minute",
               watermark: String = "5 seconds"): DataFrame =
    StreamingUniqueUsers.toSinkRecords(
      StreamingUniqueUsers.uniqueUsersPerWindow(
        StreamingUniqueUsers.parseEvents(raw), windowLen, watermark))

  /** The fully-wired (unstarted) Kafka-to-Kafka writer. Building this
    * value executes S1's data-source resolution (`readStream.format
    * ("kafka").load()`), so it fails fast — not at `start()` — when the
    * connector is missing from the classpath. */
  def kafkaWriter(spark: SparkSession, bootstrap: String,
                  inputTopic: String, outputTopic: String,
                  checkpoint: String,
                  outputMode: String = "append"): DataStreamWriter[Row] =
    StreamingUniqueUsers.kafkaSink(
      pipeline(StreamingUniqueUsers.kafkaSource(spark, bootstrap, inputTopic)),
      bootstrap, outputTopic, checkpoint)
      .outputMode(outputMode)

  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println(
        "usage: KafkaMain <inputTopic> <outputTopic> [bootstrap] [checkpointDir]")
      sys.exit(2)
    }
    val Array(inputTopic, outputTopic) = args.take(2)
    val bootstrap = args.lift(2)
      .orElse(sys.env.get("KAFKA_BOOTSTRAP"))
      .getOrElse(DefaultBootstrap)
    val checkpoint = args.lift(3).getOrElse(
      s"${System.getProperty("java.io.tmpdir")}/graft_kafka_ckpt_" +
        s"${inputTopic}_$outputTopic")
    // standalone-run default ONLY when the ambient conf (spark-submit
    // --conf / spark-defaults) didn't set it: builder().config() would
    // otherwise take precedence over spark-submit and silently defeat
    // the documented cluster-side override path. SPARK_GRAFT_CPUS
    // remains the env-var override for bare `java -cp` runs.
    val builder = SparkSession.builder()
      .appName(s"graft-unique-users $inputTopic->$outputTopic")
      .config("spark.sql.session.timeZone", "UTC")
    val ambient = new org.apache.spark.SparkConf(true)
    if (!ambient.contains("spark.sql.shuffle.partitions"))
      builder.config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val spark = builder.getOrCreate()
    val query = kafkaWriter(spark, bootstrap, inputTopic, outputTopic,
      checkpoint).start()
    query.awaitTermination()
  }
}
