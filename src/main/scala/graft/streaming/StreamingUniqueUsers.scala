package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming layer: the reference's topology
  * (`/root/reference/src/main/java/com/isidora/kafka/UniqueUsersCounter.java:63-93`)
  * re-expressed as a streaming DataFrame pipeline, fixing its three
  * documented defects (reference README.md:42-52):
  *
  *  1. continuous per-update emission with no suppression → `append` mode
  *     + watermark emits exactly one final row per window (`updateMode`
  *     retains the reference's faithful update-stream behavior);
  *  2. non-JSON output → `to_json(struct(...))`;
  *  3. ISO-8601 window keys → unix epoch seconds.
  *
  * The watermark default is 5 seconds — the problem statement's own bound
  * ("99.9% of frames arrive with a maximum latency of 5 seconds",
  * reference README.md:56).
  *
  * The same logical aggregation runs on batch and streaming frames
  * (Spark's unified API), which is how the DuckDB-oracle-checked batch
  * queries in [[graft.operators.UniqueUsers]] certify this streaming path.
  */
object StreamingUniqueUsers {

  /** The reference's input event schema
    * (`UniqueUsersCounter.java:65-66`): {"uid": string, "ts": unix-sec}. */
  val EventSchema: StructType = StructType(Seq(
    StructField("uid", StringType),
    StructField("ts", LongType)))

  /** JSON bytes/strings → typed columns: the S2 deserialization step
    * (reference JsonSerde, UniqueUsersCounter.java:20-24) as schema-on-read
    * with an explicit corrupt-record policy instead of a runtime NPE. */
  def parseEvents(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(from_json(col(valueCol).cast("string"), EventSchema).as("e"))
      .select(col("e.uid").as("uid"), timestamp_seconds(col("e.ts")).as("ts"))
      .filter(col("uid").isNotNull && col("ts").isNotNull)

  /** The event record's Avro wire schema — Avro is the CONVENTIONAL
    * Kafka value encoding the reference's pass-through JsonSerde stands
    * in for (a schema-registry deployment serializes exactly this
    * record). The serde below uses Spark's NATIVE `to_avro`/`from_avro`
    * column expressions: this distribution bundles the whole Avro
    * connector but omits the two thin expression classes the functions
    * resolve to by reflection, so those are vendored at
    * `org.apache.spark.sql.avro.AvroExpressions.scala` — the native
    * path stays inside whole-stage codegen where the previous
    * `mapPartitions` stand-in (kept below as the `*ViaMapPartitions`
    * interop twins) broke the codegen span. */
  val EventAvroSchemaJson: String =
    """{"type":"record","name":"event","fields":[
      |  {"name":"uid","type":"string"},{"name":"ts","type":"long"}]}""".stripMargin

  private def eventAvroSchema(): org.apache.avro.Schema =
    new org.apache.avro.Schema.Parser().parse(EventAvroSchemaJson)

  /** S3 in Avro: `(uid, ts)` columns → one binary Avro `value` per
    * record (single-record wire form, no container framing — what a
    * Kafka producer puts on the topic). Null-field rows are filtered
    * up front: the declared non-union schema requires both fields, and
    * the reference's NPE-on-missing-uid is exactly the failure mode
    * this engine refuses to reproduce. The schema is DECLARED on the
    * encode side too — inference from the nullable catalyst struct
    * would emit union-framed bytes no plain consumer expects. */
  def toAvroRecords(events: DataFrame): DataFrame =
    events.filter(col("uid").isNotNull && col("ts").isNotNull)
      .select(org.apache.spark.sql.avro.functions.to_avro(
        struct(col("uid"), unix_timestamp(col("ts")).as("ts")),
        EventAvroSchemaJson).as("value"))

  /** S2 in Avro: binary Avro `value` → typed columns, the
    * [[parseEvents]] twin for Avro-encoded topics. Same corrupt-record
    * policy as the JSON path: an undecodable payload becomes a null row
    * (PERMISSIVE mode) and DROPS at the filter — never a downstream
    * NPE. */
  def parseAvroEvents(raw: DataFrame, valueCol: String = "value"): DataFrame =
    raw.select(org.apache.spark.sql.avro.functions.from_avro(
        col(valueCol).cast("binary"), EventAvroSchemaJson,
        java.util.Map.of("mode", "PERMISSIVE")).as("e"))
      .select(col("e.uid").as("uid"), timestamp_seconds(col("e.ts")).as("ts"))
      .filter(col("uid").isNotNull && col("ts").isNotNull)

  /** The pre-vendoring `mapPartitions` serde pair, kept as the
    * INTEROP WITNESS: FileFormatsSpec decodes the native expressions'
    * bytes with this independent avro-1.12 reader (and vice versa), so
    * a regression in either implementation is a cross-decode mismatch,
    * not a silent self-consistent drift. Also the documented fallback
    * for a deployment whose spark-sql jar lacks the connector
    * classes entirely. */
  def toAvroRecordsViaMapPartitions(events: DataFrame): DataFrame = {
    val session = events.sparkSession
    import session.implicits._
    events.filter(col("uid").isNotNull && col("ts").isNotNull)
      .select(col("uid"), unix_timestamp(col("ts")).as("ts"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val schema = eventAvroSchema()
        val writer = new org.apache.avro.generic.GenericDatumWriter[
          org.apache.avro.generic.GenericRecord](schema)
        val out = new java.io.ByteArrayOutputStream()
        var encoder: org.apache.avro.io.BinaryEncoder = null
        it.map { case (uid, ts) =>
          out.reset()
          encoder = org.apache.avro.io.EncoderFactory.get().binaryEncoder(out, encoder)
          val rec = new org.apache.avro.generic.GenericData.Record(schema)
          rec.put("uid", uid)
          rec.put("ts", ts)
          writer.write(rec, encoder)
          encoder.flush()
          out.toByteArray
        }
      }.toDF("value")
  }

  def parseAvroEventsViaMapPartitions(raw: DataFrame, valueCol: String = "value"): DataFrame = {
    val session = raw.sparkSession
    import session.implicits._
    raw.select(col(valueCol).cast("binary")).as[Array[Byte]]
      .mapPartitions { it =>
        val schema = eventAvroSchema()
        val reader = new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord](schema)
        var decoder: org.apache.avro.io.BinaryDecoder = null
        it.flatMap { bytes =>
          try {
            decoder = org.apache.avro.io.DecoderFactory.get().binaryDecoder(bytes, decoder)
            val rec = reader.read(null, decoder)
            Some((rec.get("uid").toString, rec.get("ts").asInstanceOf[Long]))
          } catch { case _: Exception => None }
        }
      }.toDF("uid", "ts_sec")
      .select(col("uid"), timestamp_seconds(col("ts_sec")).as("ts"))
  }

  /** The windowed COUNT(DISTINCT) with watermark. Streaming exact
    * distinct: dropDuplicates inside the watermark then count — state per
    * (window, uid) is bounded and evicted by the watermark, unlike the
    * reference's unbounded HashSet state (README.md:27-31). */
  def uniqueUsersPerWindow(events: DataFrame,
                           windowLen: String = "1 minute",
                           watermark: String = "5 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("uid"))
      .agg(count(lit(1)).as("hits"))
      .groupBy(col("window"))
      .agg(count(lit(1)).as("unique_users"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("unique_users"))

  /** The KEYED streaming form: distinct users per (event_type, window) —
    * the batch [[graft.operators.UniqueUsers.perMinuteByType]] twin and
    * the production generalization of the reference's constant-key
    * topology. Same two-phase shape as [[uniqueUsersPerWindow]] (dedup
    * state keyed (window, type, uid), count keyed (window, type)), so
    * the watermark finalizes and evicts BOTH state stores and hot
    * windows spread across reducers by key. Unified-API: applied to a
    * batch frame it computes the identical relation (spec-pinned equal
    * to the batch operator). */
  def uniqueUsersPerWindowByType(events: DataFrame,
                                 windowLen: String = "1 minute",
                                 watermark: String = "5 seconds"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"), col("uid"))
      .agg(count(lit(1)).as("hits"))
      .groupBy(col("window"), col("event_type"))
      .agg(count(lit(1)).as("unique_users"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("event_type"), col("unique_users"))

  /** HLL variant: approx distinct per window — constant state, the scale
    * default. Works in update/complete mode (sketches don't need the
    * two-phase dedup). */
  def uniqueUsersPerWindowApprox(events: DataFrame,
                                 windowLen: String = "1 minute",
                                 watermark: String = "5 seconds",
                                 rsd: Double = 0.01): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(approx_count_distinct(col("uid"), rsd).as("unique_users"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("unique_users"))

  /** Mergeable-sketch EMISSION — the online half of
    * [[graft.operators.UniqueUsers.dailySketchRollup]]: each finalized
    * window emits its DataSketches HLL sketch BLOB (not just the
    * estimate), so the persisted per-window sketches answer any
    * coarser-grain distinct question later (daily/weekly rollups,
    * audience overlap via `hll_union`) WITHOUT re-reading raw events —
    * the lake pattern where the stream maintains the fine-grain sketch
    * tier and batch queries merge upward. Append mode after the
    * watermark, constant O(2^lgK) state per window like the approx
    * variant; the estimate column rides along for direct dashboards. */
  def uniqueUsersPerWindowSketch(events: DataFrame,
                                 windowLen: String = "1 minute",
                                 watermark: String = "5 seconds",
                                 lgK: Int = 12): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(expr(s"hll_sketch_agg(uid, $lgK)").as("sk"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("sk"),
        expr("hll_sketch_estimate(sk)").as("unique_users_est"))

  /** Ingestion-time stamp — the reference's ACTUAL time domain: it
    * deliberately windows on broker ingestion time, not the payload `ts`
    * (reference README.md:54-58, justified by its ≤5 s arrival bound).
    * From a Kafka source the stamp is the broker-populated `timestamp`
    * metadata column (log-append time); from any other source it is the
    * processing time at ingest (`current_timestamp()` = micro-batch
    * timestamp, constant within a batch). */
  def stampIngest(raw: DataFrame): DataFrame =
    if (raw.columns.contains("timestamp"))
      raw.withColumn("ingest_ts", col("timestamp"))
    else raw.withColumn("ingest_ts", current_timestamp())

  /** Windowed distinct users in the INGESTION-time domain (the reference's
    * semantics, vs [[uniqueUsersPerWindow]]'s event-time fix): an event
    * carrying an ancient payload `ts` still counts in the window it
    * ARRIVES in, and nothing is ever "too late" — the watermark over
    * ingest time only bounds state, it cannot drop data that has already
    * been stamped at or ahead of it. */
  def uniqueUsersPerWindowIngest(raw: DataFrame,
                                 windowLen: String = "1 minute",
                                 watermark: String = "5 seconds",
                                 valueCol: String = "value"): DataFrame =
    stampIngest(raw)
      .select(from_json(col(valueCol).cast("string"), EventSchema).as("e"),
        col("ingest_ts"))
      .select(col("e.uid").as("uid"), col("ingest_ts"))
      .filter(col("uid").isNotNull)
      .withWatermark("ingest_ts", watermark)
      .groupBy(window(col("ingest_ts"), windowLen), col("uid"))
      .agg(count(lit(1)).as("hits"))
      .groupBy(col("window"))
      .agg(count(lit(1)).as("unique_users"))
      .select(
        unix_timestamp(col("window.start")).as("window_start"),
        col("unique_users"))

  /** Output records shaped as the reference's sink expects — but with the
    * documented fixes: proper JSON value, unix-seconds key. */
  def toSinkRecords(counts: DataFrame): DataFrame =
    counts.select(
      col("window_start").cast("string").as("key"),
      to_json(struct(col("window_start"), col("unique_users"))).as("value"))

  /** S1: Kafka topic source (reference `builder.stream(inputTopic)`,
    * UniqueUsersCounter.java:63). Requires the spark-sql-kafka connector on
    * the classpath at runtime. */
  def kafkaSource(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .load()

  /** S3: Kafka sink (reference `uniqueUsers.to(outputTopic)`,
    * UniqueUsersCounter.java:93). Spark's Kafka sink is at-least-once; the
    * checkpoint gives effective exactly-once for the aggregation state, and
    * downstream dedup on `key` completes the end-to-end guarantee the
    * reference claimed via EXACTLY_ONCE (UniqueUsersCounter.java:56). */
  def kafkaSink(records: DataFrame, bootstrap: String, topic: String,
                checkpoint: String): DataStreamWriter[org.apache.spark.sql.Row] =
    records.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)
      .outputMode("append")

  /** Stream–static join: enrich the event stream with a static dimension.
    * The static side is broadcast per micro-batch — no stream state, no
    * shuffle of the stream; at scale the dimension is re-read each batch
    * (picking up dim updates) while the stream only maps. */
  def enrichWithSegments(events: DataFrame, customer: DataFrame): DataFrame =
    events.join(
      broadcast(customer.select(col("c_custkey"), col("c_mktsegment"))),
      col("uid").cast("long") === col("c_custkey"), "left")
      .select(col("uid"), col("ts"), col("c_mktsegment").as("segment"))

  /** Exactly-once-to-files pattern the reference could not provide
    * (its EXACTLY_ONCE was broker-transactional only): foreachBatch with
    * a batchId-keyed overwrite — a replayed batch overwrites its own
    * directory, making the sink idempotent under retries. */
  def startIdempotentParquetSink(counts: DataFrame, outDir: String,
                                 checkpoint: String): StreamingQuery =
    counts.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        batch.write.mode("overwrite").parquet(s"$outDir/batch_id=$batchId")
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** CONSUMER-side half of the end-to-end exactly-once story
    * (UniqueUsersCounter.java:56 claims broker-transactional
    * EXACTLY_ONCE; Spark's Kafka sink is at-least-once, so the consumer
    * must collapse redeliveries): land each sink record in a
    * `key=<window_start>` partition directory under DYNAMIC partition
    * overwrite — a replayed or re-emitted record rewrites ITS OWN
    * partition and no other, so any number of deliveries of one key
    * leaves exactly one logical row, and the LAST delivery wins (the
    * correct fold for update-mode re-emissions, where later rows
    * supersede earlier counts for the same window). Key cardinality is
    * windows-within-retention — bounded — so the per-key directory
    * layout holds at scale; on a lakehouse table the same verb is
    * `MERGE INTO ... ON t.key = s.key` (this form needs no table-format
    * dependency). */
  def writeKeyDeduped(batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                      outDir: String, orderCol: Option[String] = None): Unit = {
    // WITHIN a delivery: keep the max-orderCol row per key when the
    // records carry an ordering column (a Kafka consumer has offset/
    // timestamp — that is the true last-wins fold); with no ordering
    // column, same-key rows within one delivery are collapsed
    // arbitrarily, which is exact for this pipeline's append-mode
    // output (one final row per key per query run) — cross-delivery
    // supersession is what the partition overwrite provides either way
    val one = orderCol match {
      case Some(c) =>
        import org.apache.spark.sql.expressions.Window
        batch.withColumn("__rn", row_number().over(
          Window.partitionBy(col("key")).orderBy(col(c).desc)))
          .filter(col("__rn") === 1).drop("__rn", c)
      case None => batch.dropDuplicates("key")
    }
    // writer-scoped option, NOT a session-conf mutation: concurrent
    // writers on this session must not race a global overwrite mode
    one.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("key").parquet(outDir)
  }

  /** [[writeKeyDeduped]] as a streaming sink: the at-least-once →
    * exactly-once adapter a Kafka consumer of [[kafkaSink]]'s topic
    * runs. Append mode (the chained two-phase distinct only finalizes
    * rows there; Spark rejects multi-aggregation streams in update
    * mode) — redelivery is exercised by crash/reprocessing replay,
    * where every batch is delivered again from a fresh checkpoint, and
    * the update-supersession fold is unit-proven on [[writeKeyDeduped]]
    * directly. */
  def startKeyDedupedParquetSink(records: DataFrame, outDir: String,
                                 checkpoint: String): StreamingQuery =
    records.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        writeKeyDeduped(batch, outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()

  /** End-to-end topology, file/memory-testable: parse → window-distinct →
    * sink records. `outputMode` "append" (fixed semantics: one row per
    * finalized window) or "update" (reference-faithful re-emission). */
  def topology(raw: DataFrame): DataFrame =
    toSinkRecords(uniqueUsersPerWindow(parseEvents(raw)))

  /** Run against a memory sink for tests/demos: returns the started query.
    * `streams.cleanUp()` in the reference ≈ a fresh checkpoint dir here. */
  def startMemorySink(counts: DataFrame, queryName: String,
                      mode: String = "append"): StreamingQuery =
    counts.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
}
