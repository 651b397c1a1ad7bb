package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StreamingCdc, StreamingUniqueUsers}

/** Streaming semantics: the reference's documented defects, fixed and
  * regression-tested (reference README.md:42-52).
  *   - append mode emits exactly ONE row per finalized window;
  *   - late data within the 5 s watermark is counted;
  *   - data later than the watermark is dropped;
  *   - output records are proper JSON with unix-seconds keys.
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._

  private def jsonEvent(uid: String, sec: Long): String =
    s"""{"uid": "$uid", "ts": $sec}"""

  private val w0 = 1700000040L // some whole minute (17:34:00)

  test("append mode: one final row per window, late-within-watermark counted, too-late dropped") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val counts = StreamingUniqueUsers.uniqueUsersPerWindow(
      StreamingUniqueUsers.parseEvents(in.toDF(), "value"))
    val q = counts.writeStream.format("memory").queryName("uu_append")
      .outputMode("append").start()
    try {
      // batch 1: two users in window w0, one in w0+60
      in.addData(jsonEvent("a", w0 + 1), jsonEvent("b", w0 + 2), jsonEvent("a", w0 + 61))
      q.processAllAvailable()
      // batch 2: late-but-within-watermark event for w0 (4s behind max ts)
      in.addData(jsonEvent("c", w0 + 58), jsonEvent("d", w0 + 62))
      q.processAllAvailable()
      // nothing final yet — watermark (max_ts - 5s) hasn't passed w0+60
      assert(spark.table("uu_append").isEmpty)
      // batch 3: advance event time far past w0's end + watermark → w0 finalizes
      in.addData(jsonEvent("z", w0 + 200))
      q.processAllAvailable()
      // batch 4: an event for w0 arriving after the watermark passed → dropped
      in.addData(jsonEvent("ghost", w0 + 3))
      q.processAllAvailable()
      in.addData(jsonEvent("z2", w0 + 400)) // finalize w0+60 too
      q.processAllAvailable()
      val rows = spark.table("uu_append").collect()
        .map { case Row(ws: Long, n: Long) => ws -> n }.toMap
      assert(rows(w0) === 3L)        // a, b, c — ghost dropped, c counted
      assert(rows(w0 + 60) === 2L)   // a, d
      // exactly one emission per window
      val all = spark.table("uu_append").collect().map(_.getLong(0))
      assert(all.length === all.distinct.length)
    } finally q.stop()
  }

  test("streamed per-window HLL sketches union offline to the exact coarse distinct") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val sk = StreamingUniqueUsers.uniqueUsersPerWindowSketch(
      StreamingUniqueUsers.parseEvents(in.toDF(), "value"))
    val q = sk.writeStream.format("memory").queryName("uu_sketches")
      .outputMode("append").start()
    try {
      // w0: users a,b (a twice); w0+60: users a,c — union over both = {a,b,c}
      in.addData(jsonEvent("a", w0 + 1), jsonEvent("b", w0 + 2), jsonEvent("a", w0 + 10))
      in.addData(jsonEvent("a", w0 + 61), jsonEvent("c", w0 + 62))
      q.processAllAvailable()
      in.addData(jsonEvent("zz", w0 + 400)) // advance watermark, finalize both
      q.processAllAvailable()
      val t = spark.table("uu_sketches").where(col("window_start") < w0 + 120)
      // per-window estimates are exact at these cardinalities
      val perWin = t.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(perWin === Map(w0 -> 2L, (w0 + 60L) -> 2L))
      // THE point: the persisted blobs merge to the cross-window distinct
      // without touching raw events (3, not 2+2)
      val merged = t.agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))"))
        .head().getLong(0)
      assert(merged === 3L)
    } finally q.stop()
  }

  test("streaming observe(): per-batch audit metrics surface in query progress, no extra pass") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    // observe the parsed stream inside the live topology: every
    // micro-batch reports its own row count + distinct-ish audit columns
    val parsed = StreamingUniqueUsers.parseEvents(in.toDF(), "value")
      .observe("batch_audit", count(lit(1)).as("n_rows"),
        sum(unix_timestamp(col("ts"))).as("ts_sum"))
    val q = StreamingUniqueUsers.uniqueUsersPerWindow(parsed)
      .writeStream.format("memory").queryName("uu_observed")
      .outputMode("append").start()
    try {
      in.addData(jsonEvent("a", w0 + 1), jsonEvent("b", w0 + 2))
      q.processAllAvailable()
      in.addData(jsonEvent("c", w0 + 300))
      q.processAllAvailable()
      val metrics = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("batch_audit")))
        .filter(r => !r.isNullAt(1)) // empty batches observe sum = NULL
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter(_._1 > 0)
      // batch 1: two rows summing 2*w0+3; batch 2: one row at w0+300
      assert(metrics.contains((2L, 2 * w0 + 3)))
      assert(metrics.contains((1L, w0 + 300)))
    } finally q.stop()
  }

  test("streaming CDC sink maintains a keyed snapshot: seq resolution, deletes, replayed batch is a no-op") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-ckpt").toString
    // base snapshot: k1 -> a, k2 -> b
    StreamingCdc.saveSnapshot(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val in = MemoryStream[(Long, String, Long, String)]
    val q = StreamingCdc.sink(in.toDF().toDF("k", "op", "seq", "v"), dir, ckpt)
    try {
      // batch: update k1, insert k3, delete k2, and k4 gets I(seq 1) then
      // D(seq 2) — the delete must win WITHIN the batch
      in.addData((1L, "U", 1L, "a2"), (3L, "I", 1L, "c"),
        (2L, "D", 1L, "b"), (4L, "I", 1L, "d"), (4L, "D", 2L, "d"))
      q.processAllAvailable()
      val snap1 = StreamingCdc.loadSnapshot(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(snap1 === Map(1L -> "a2", 3L -> "c"))
      // a later batch applies ON TOP: re-insert k2
      in.addData((2L, "I", 1L, "b2"))
      q.processAllAvailable()
      val snap2 = StreamingCdc.loadSnapshot(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(snap2 === Map(1L -> "a2", 2L -> "b2", 3L -> "c"))
      // checkpoint-style re-delivery of an applied batch id: ledgered no-op
      StreamingCdc.applyCdcBatch(spark, dir,
        Seq((2L, "D", 9L, "b2")).toDF("k", "op", "seq", "v"), batchId = 1L)
      val snap3 = StreamingCdc.loadSnapshot(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(snap3 === snap2)
    } finally q.stop()
  }

  test("versioned CDC snapshots time-travel by batch id; expiry bounds history, never live") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc-v").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cdc-v-ckpt").toString
    StreamingCdc.saveSnapshot(Seq((1L, "a")).toDF("k", "v"), dir)
    val in = MemoryStream[(Long, String, Long, String)]
    val q = StreamingCdc.sink(in.toDF().toDF("k", "op", "seq", "v"), dir, ckpt,
      retainVersions = true)
    try {
      in.addData((2L, "I", 1L, "b")); q.processAllAvailable()   // batch 0
      in.addData((1L, "U", 1L, "a2")); q.processAllAvailable()  // batch 1
      in.addData((2L, "D", 1L, "b")); q.processAllAvailable()   // batch 2
      def m(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      // every historical state is addressable by the batch that made it
      assert(m(StreamingCdc.loadSnapshotAsOf(spark, dir, -1L)) === Map(1L -> "a"))
      assert(m(StreamingCdc.loadSnapshotAsOf(spark, dir, 0L)) === Map(1L -> "a", 2L -> "b"))
      assert(m(StreamingCdc.loadSnapshotAsOf(spark, dir, 1L)) === Map(1L -> "a2", 2L -> "b"))
      // at-or-past the newest applied batch reads live
      assert(m(StreamingCdc.loadSnapshotAsOf(spark, dir, 99L)) === Map(1L -> "a2"))
      StreamingCdc.expireSnapshots(spark, dir, keepLast = 2)
      // the base (v=-1) is gone: asking below retained history must ERROR
      assert(intercept[IllegalArgumentException] {
        StreamingCdc.loadSnapshotAsOf(spark, dir, -1L)
      }.getMessage.contains("expired"))
      // surviving versions and live still serve
      assert(m(StreamingCdc.loadSnapshotAsOf(spark, dir, 0L)) === Map(1L -> "a", 2L -> "b"))
      assert(m(StreamingCdc.loadSnapshot(spark, dir)) === Map(1L -> "a2"))
    } finally q.stop()
  }

  test("streamed daily sketches answer the trailing-7-day rolling distinct (WAU) offline") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val day0 = 20000L * 86400L
    def d(k: Long, off: Long) = day0 + k * 86400L + off
    val sk = StreamingUniqueUsers.uniqueUsersPerWindowSketch(
      StreamingUniqueUsers.parseEvents(in.toDF(), "value"), windowLen = "1 day")
    val q = sk.writeStream.format("memory").queryName("uu_day_sketches")
      .outputMode("append").start()
    try {
      // day 0: {a, b}; day 2: {b, c}; day 9: {d}
      in.addData(jsonEvent("a", d(0, 10)), jsonEvent("b", d(0, 20)),
        jsonEvent("b", d(2, 10)), jsonEvent("c", d(2, 20)), jsonEvent("d", d(9, 10)))
      q.processAllAvailable()
      in.addData(jsonEvent("zz", d(30, 0))) // advance watermark, finalize all three
      q.processAllAvailable()
      val blobs = spark.table("uu_day_sketches")
        .where(col("window_start") < d(20, 0))
        .select(col("window_start").as("day_sec"), col("sk"))
      // the persisted per-day blobs answer every trailing window with no
      // raw-event re-read; estimates are exact at these cardinalities
      val got = graft.operators.UniqueUsers.wauFromDailySketches(blobs).collect()
        .map(r => (r.getLong(0) - day0) / 86400L -> ((r.getLong(1), r.getLong(2)))).toMap
      val expected = Map(
        0L -> ((2L, 1L)), 1L -> ((2L, 1L)),            // {a,b}
        2L -> ((3L, 2L)), 3L -> ((3L, 2L)), 4L -> ((3L, 2L)),
        5L -> ((3L, 2L)), 6L -> ((3L, 2L)),            // {a,b}∪{b,c}
        7L -> ((2L, 1L)), 8L -> ((2L, 1L)),            // {b,c} only in reach
        9L -> ((1L, 1L)))                              // {d}; clip at max day
      assert(got === expected)
    } finally q.stop()
  }

  test("Avro-encoded topic: the wire serde feeds the same windowed distinct under streaming execution") {
    implicit val sqlCtx = spark.sqlContext
    // pre-encode wire payloads with the batch half of the serde
    def avro(uid: String, sec: Long): Array[Byte] = {
      import org.apache.spark.sql.functions.{col, lit, timestamp_seconds}
      StreamingUniqueUsers.toAvroRecords(
        spark.range(1).select(lit(uid).as("uid"), timestamp_seconds(lit(sec)).as("ts")))
        .collect().head.getAs[Array[Byte]](0)
    }
    val in = MemoryStream[Array[Byte]] // implicit newByteArrayEncoder
    val counts = StreamingUniqueUsers.uniqueUsersPerWindow(
      StreamingUniqueUsers.parseAvroEvents(in.toDF(), "value"))
    val q = counts.writeStream.format("memory").queryName("uu_avro")
      .outputMode("append").start()
    try {
      in.addData(avro("a", w0 + 1), avro("b", w0 + 2), avro("a", w0 + 31))
      q.processAllAvailable()
      in.addData(avro("z", w0 + 300)) // advance watermark, finalize w0
      q.processAllAvailable()
      val rows = spark.table("uu_avro").collect()
        .map { case Row(ws: Long, n: Long) => ws -> n }.toMap
      assert(rows(w0) === 2L) // a deduped across its two events, b
    } finally q.stop()
  }

  test("update mode (reference-faithful): windows re-emit as counts grow") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val counts = StreamingUniqueUsers.uniqueUsersPerWindowApprox(
      StreamingUniqueUsers.parseEvents(in.toDF(), "value"))
    val q = counts.writeStream.format("memory").queryName("uu_update")
      .outputMode("update").start()
    try {
      in.addData(jsonEvent("a", w0 + 1))
      q.processAllAvailable()
      in.addData(jsonEvent("b", w0 + 2))
      q.processAllAvailable()
      val emissions = spark.table("uu_update").collect()
        .map { case Row(ws: Long, n: Long) => ws -> n }
      // same window emitted twice with growing counts — the reference's
      // KTable.toStream behavior (its README.md:45-52 "defect")
      assert(emissions.count(_._1 == w0) === 2)
      assert(emissions.filter(_._1 == w0).map(_._2).sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("sink records are proper JSON with unix-second keys") {
    val counts = Seq((w0, 7L)).toDF("window_start", "unique_users")
    val rec = StreamingUniqueUsers.toSinkRecords(counts).collect().head
    assert(rec.getString(0) === w0.toString)
    assert(rec.getString(1) === s"""{"window_start":$w0,"unique_users":7}""")
  }

  test("malformed and schema-violating events are filtered, not NPE (reference defect)") {
    val raw = Seq("not json at all", """{"uid": "u1"}""", """{"ts": 5}""",
      jsonEvent("ok", w0)).toDF("value")
    val parsed = StreamingUniqueUsers.parseEvents(raw)
    assert(parsed.collect().map(_.getString(0)).toSeq === Seq("ok"))
  }

  test("stream-static join enriches with a broadcast dimension") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val enriched = StreamingUniqueUsers.enrichWithSegments(
      StreamingUniqueUsers.parseEvents(in.toDF()),
      Tables.customer(spark, Sf0001))
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      in.addData(jsonEvent("1", w0), jsonEvent("999999", w0))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
      assert(rows.length === 2)
      val byUid = rows.map(r => r.getString(0) -> Option(r.getString(2))).toMap
      assert(byUid("1").isDefined)    // dim hit
      assert(byUid("999999").isEmpty) // left join preserves unmatched stream rows
    } finally q.stop()
  }

  test("idempotent foreachBatch sink writes batch-keyed parquet") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-cp").toString
    val counts = StreamingUniqueUsers.uniqueUsersPerWindowApprox(
      StreamingUniqueUsers.parseEvents(in.toDF()))
    in.addData(jsonEvent("a", w0), jsonEvent("b", w0 + 2))
    val q = StreamingUniqueUsers.startIdempotentParquetSink(counts, dir, cp)
    q.awaitTermination()
    val out = spark.read.parquet(dir)
    assert(out.filter(col("window_start") === w0).head().getLong(1) === 2L)
  }

  test("materialized aggregate maintained from a stream: foreachBatch deltas, re-delivery is a ledgered no-op") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Relational
    val day0 = 1704067200L // 2024-01-01, a whole epoch day
    val in = MemoryStream[(Long, Long, Double)] // (orderkey, epoch sec, price)
    val path = java.nio.file.Files.createTempDirectory("graft-magg").toString
    val cp = java.nio.file.Files.createTempDirectory("graft-magg-cp").toString
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.select(col("_1").as("o_orderkey"),
        timestamp_seconds(col("_2")).as("o_orderdate"), col("_3").as("o_totalprice"))
    Relational.saveDailyRevenue(shape(
      Seq.empty[(Long, Long, Double)].toDF()), path) // empty init
    val q = in.toDF().writeStream.option("checkpointLocation", cp)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Row], id: Long) =>
        Relational.applyDailyRevenueDelta(spark, path, shape(batch.toDF()), id)
        // at-least-once: the SAME micro-batch delivered again must not
        // double-count — the ledger, not luck, makes this a no-op
        Relational.applyDailyRevenueDelta(spark, path, shape(batch.toDF()), id)
        ()
      }.start()
    try {
      in.addData((1L, day0 + 10L, 10.0), (2L, day0 + 20L, 20.0))
      q.processAllAvailable()
      in.addData((3L, day0 + 86400L + 30L, 40.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = Relational.loadDailyRevenue(spark, path).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((day0, 2L, 3000L), (day0 + 86400L, 1L, 4000L)))
  }

  test("streaming session_window closes sessions past the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val sessions = StreamingUniqueUsers.parseEvents(in.toDF())
      .withWatermark("ts", "5 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("uid"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("session_window.start")).as("start_sec"),
        col("uid"), col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("sw")
      .outputMode("append").start()
    try {
      in.addData(jsonEvent("a", w0), jsonEvent("a", w0 + 600))
      q.processAllAvailable()
      assert(spark.table("sw").isEmpty) // session still open
      in.addData(jsonEvent("z", w0 + 7200)) // watermark sails past a's gap
      q.processAllAvailable()
      in.addData(jsonEvent("z", w0 + 14400))
      q.processAllAvailable()
      val rows = spark.table("sw").collect()
        .map { case Row(st: Long, uid: String, n: Long) => (uid, st, n) }
      assert(rows.contains(("a", w0, 2L))) // one merged 2-event session
    } finally q.stop()
  }

  test("streaming session_window merges ACROSS micro-batches and equals the batch operator") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val sessions = StreamingUniqueUsers.parseEvents(in.toDF())
      .withWatermark("ts", "5 seconds")
      .groupBy(session_window(col("ts"), "30 minutes"), col("uid"))
      .agg(count(lit(1)).as("n_events"))
      .select(unix_timestamp(col("session_window.start")).as("start_sec"),
        col("uid"), col("n_events"))
    val q = sessions.writeStream.format("memory").queryName("swm")
      .outputMode("append").start()
    try {
      // one session extended across three separate micro-batches (each
      // event within 30 min of the previous) — the merging state machine
      // must fold them into ONE window, not one per batch
      in.addData(jsonEvent("a", w0), jsonEvent("b", w0))
      q.processAllAvailable()
      in.addData(jsonEvent("a", w0 + 1200))
      q.processAllAvailable()
      in.addData(jsonEvent("a", w0 + 2400))
      q.processAllAvailable()
      // a's SECOND session, plus the watermark mover that closes everything
      in.addData(jsonEvent("a", w0 + 9000))
      q.processAllAvailable()
      in.addData(jsonEvent("z", w0 + 50000))
      q.processAllAvailable()
      in.addData(jsonEvent("z", w0 + 90000))
      q.processAllAvailable()
      val online = spark.table("swm").collect()
        .map { case Row(st: Long, uid: String, n: Long) => (uid, st, n) }.toSet
      // the batch operator over the SAME events (only z's LAST session is
      // still open online — nothing moved the watermark past its gap —
      // so compare the closed set)
      val allEvents = Seq(("a", w0), ("b", w0), ("a", w0 + 1200), ("a", w0 + 2400),
        ("a", w0 + 9000), ("z", w0 + 50000), ("z", w0 + 90000))
      import spark.implicits._
      val batch = graft.operators.Sessionize.userSessions(
        allEvents.toDF("user_id", "sec")
          .select(col("user_id"), timestamp_seconds(col("sec")).as("ts")))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val closedBatch = batch.filter { case (_, st, _) => st < w0 + 90000 }
      assert(online === closedBatch)
      assert(online.contains(("a", w0, 3L))) // the cross-batch merged session
    } finally q.stop()
  }

  test("stream-stream OUTER join: unmatched purchase null-pads exactly once, after watermark expiry") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamJoins
    val clicks = MemoryStream[(String, Long)]
    val purchases = MemoryStream[(String, Long)]
    def ts(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col("_1").as("uid"), timestamp_seconds(col("_2")).as(c))
    val joined = StreamJoins.purchasesWithRecentClicksOuter(
      ts(clicks.toDF(), "click_ts"), ts(purchases.toDF(), "purchase_ts"))
    val q = joined.writeStream.format("memory").queryName("ssoj")
      .outputMode("append").start()
    try {
      // u1: click then purchase (matches); u2: purchase, no click ever
      clicks.addData(("u1", w0))
      purchases.addData(("u1", w0 + 300), ("u2", w0 + 300))
      q.processAllAvailable()
      val early = spark.table("ssoj").collect()
        .map(r => (r.getString(0), r.isNullAt(2)))
      // matched row emits; u2's null-padded row must NOT exist yet — a
      // late in-horizon click could still arrive while the watermark
      // allows it
      assert(early.toSet === Set(("u1", false)))
      // move BOTH watermarks far past u2's join bound
      clicks.addData(("wm", w0 + 7200))
      purchases.addData(("wm2", w0 + 7200))
      q.processAllAvailable()
      // and once more: the null-padded row must not re-emit
      clicks.addData(("wm", w0 + 14400))
      purchases.addData(("wm2", w0 + 14400))
      q.processAllAvailable()
      val rows = spark.table("ssoj").collect()
        .map(r => (r.getString(0), r.isNullAt(2)))
      assert(rows.count(_ == ("u2", true)) === 1, s"expected exactly one null-padded u2 row: ${rows.toSeq}")
      assert(rows.count(_._1 == "u1") === 1)
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with recent clicks only") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamJoins
    val clicks = MemoryStream[(String, Long)]
    val purchases = MemoryStream[(String, Long)]
    def ts(df: org.apache.spark.sql.DataFrame, c: String) =
      df.select(col("_1").as("uid"), timestamp_seconds(col("_2")).as(c))
    val joined = StreamJoins.purchasesWithRecentClicks(
      ts(clicks.toDF(), "click_ts"), ts(purchases.toDF(), "purchase_ts"))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      clicks.addData(("u1", w0), ("u2", w0))
      purchases.addData(("u1", w0 + 300), ("u2", w0 + 1200)) // 5 min / 20 min later
      q.processAllAvailable()
      val rows = spark.table("ssj").collect().map(_.getString(0))
      assert(rows.toSeq === Seq("u1")) // u2's click is outside the 10-min bound
    } finally q.stop()
  }

  test("ingestion-time windows count by arrival, ignoring payload ts (reference time domain)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    // 1-second windows + zero watermark so the test only has to let the
    // wall clock (the ingest-time domain) tick past one window
    val counts = StreamingUniqueUsers.uniqueUsersPerWindowIngest(
      in.toDF(), windowLen = "1 second", watermark = "0 seconds")
    val q = counts.writeStream.format("memory").queryName("uu_ingest")
      .outputMode("append").start()
    try {
      val t0 = System.currentTimeMillis() / 1000
      // ancient payload timestamps: event time would window these in 1970
      in.addData(jsonEvent("a", 5), jsonEvent("a", 6), jsonEvent("b", 7))
      q.processAllAvailable()
      Thread.sleep(1600) // let ingest time pass the 1 s window end
      in.addData(jsonEvent("z", 8)) // advances the ingest watermark
      q.processAllAvailable()
      val rows = spark.table("uu_ingest").collect()
        .map { case Row(ws: Long, n: Long) => ws -> n }
      // the batch-1 window finalized: both distinct users landed in an
      // ARRIVAL-time window (now-ish), not in payload-ts 1970 windows
      assert(rows.nonEmpty)
      assert(rows.exists(_._2 === 2L))
      assert(rows.forall(_._1 >= t0 - 5))
    } finally q.stop()
  }

  test("streaming dedup emits one row per fingerprint within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    val in = MemoryStream[(Long, String, Long)]
    val docs = in.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    val q = StreamingDedup.firstOccurrences(docs).writeStream
      .format("memory").queryName("sdedup").outputMode("append").start()
    try {
      // 1 and 2 normalize to the same fingerprint; 10 is distinct
      in.addData((1L, "hello world", w0), (2L, "  Hello   WORLD ", w0 + 1), (10L, "other doc", w0 + 2))
      q.processAllAvailable()
      // 3 repeats the fingerprint within the watermark → dropped
      in.addData((3L, "hello world", w0 + 30))
      q.processAllAvailable()
      val rows = spark.table("sdedup").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.map(_._2).distinct.length === rows.length) // one row per fp
      assert(rows.map(_._2).distinct.length === 2)           // hello-world + other
      assert(!rows.map(_._1).contains(3L))                   // repeat dropped
    } finally q.stop()
  }

  test("streaming dedup-rate monitor reports raw vs distinct per window") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    val in = MemoryStream[(Long, String, Long)]
    val docs = in.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    val q = StreamingDedup.dedupRates(docs).writeStream
      .format("memory").queryName("sdrates").outputMode("update").start()
    try {
      in.addData((1L, "aa", w0), (2L, "aa", w0 + 1), (3L, "bb", w0 + 2))
      q.processAllAvailable()
      val Row(m: Long, n: Long, d: Long) = spark.table("sdrates").collect().last
      assert(m === w0 - w0 % 60)
      assert(n === 3L)
      assert(d === 2L) // two distinct fingerprints (HLL exact at this size)
    } finally q.stop()
  }

  test("streaming curation drops low-quality docs and scrubs PII from survivors") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCuration
    val in = MemoryStream[(Long, String, Long)]
    val docs = in.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    val q = StreamingCuration.curate(docs).writeStream
      .format("memory").queryName("scurate").outputMode("append").start()
    try {
      val good = "the quick brown fox jumps over a lazy dog and then it runs " +
        "to the barn where the farmer is reading mail from bob@example.com today"
      in.addData(
        (1L, good, w0),
        (2L, "!!! ??? ***", w0 + 1),          // punctuation soup → quality drop
        (3L, "mot mot mot mot", w0 + 2))      // no English stopwords → lang drop
      q.processAllAvailable()
      val rows = spark.table("scurate").collect()
        .map(r => (r.getLong(0), r.getAs[String]("text")))
      assert(rows.map(_._1).toSeq === Seq(1L))
      assert(rows.head._2.contains("[EMAIL]") && !rows.head._2.contains("bob@"))
    } finally q.stop()
  }

  test("stream deduped against a static fingerprint index drops previously-ingested docs") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingDedup
    val in = MemoryStream[(Long, String, Long)]
    val docs = in.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    // the static index: fingerprints of everything already ingested
    val index = Seq(Tuple1("known doc")).toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    val q = StreamingDedup.againstIndex(docs, index).writeStream
      .format("memory").queryName("sagainst").outputMode("append").start()
    try {
      in.addData(
        (1L, "KNOWN   doc", w0),  // normalizes to an indexed fingerprint → dropped
        (2L, "fresh doc", w0 + 1))
      q.processAllAvailable()
      val ids = spark.table("sagainst").collect().map(_.getLong(0)).toSeq
      assert(ids === Seq(2L))
    } finally q.stop()
  }

  test("batch-persisted dedup index feeds the streaming stage (full circle)") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.Dedup
    import graft.streaming.StreamingDedup
    // the batch side materializes the index once ...
    val ingested = Seq((0L, "already ingested doc", "s0")).toDF("doc_id", "text", "source")
    Dedup.saveDedupIndex(ingested, "dix_stream")
    // ... and the ONLINE pipeline dedups against exactly that artifact
    val fpIndex = Dedup.loadDedupIndex(spark, "dix_stream").fp
    val in = MemoryStream[(Long, String, Long)]
    val docs = in.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    val q = StreamingDedup.againstIndex(docs, fpIndex).writeStream
      .format("memory").queryName("sfromidx").outputMode("append").start()
    try {
      in.addData(
        (1L, "ALREADY   ingested DOC", w0), // normalizes into the persisted index → dropped
        (2L, "never seen before", w0 + 1))
      q.processAllAvailable()
      assert(spark.table("sfromidx").collect().map(_.getLong(0)).toSeq === Seq(2L))
    } finally q.stop()
  }

  test("composed online pipeline: dedup feeds curation in one topology") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.{StreamingCuration, StreamingDedup}
    val in = MemoryStream[(Long, String, Long)]
    val docs = in.toDF()
      .select(col("_1").as("doc_id"), col("_2").as("text"),
        timestamp_seconds(col("_3")).as("ts"))
    // ONE streaming topology: watermark-bounded first-occurrence dedup
    // chained into quality/language curation + PII scrub
    val fused = StreamingCuration.curate(StreamingDedup.firstOccurrenceDocs(docs))
    val q = fused.writeStream.format("memory").queryName("sfused")
      .outputMode("append").start()
    try {
      val good = "the quick brown fox jumps over a lazy dog and then it runs " +
        "to the barn where the farmer is reading mail from bob@example.com today"
      in.addData(
        (1L, good, w0),
        (2L, good, w0 + 1),            // exact dup → dropped by the dedup stage
        (3L, "!!! ??? ***", w0 + 2))   // unique but punctuation soup → curation drop
      q.processAllAvailable()
      // norm-dup (case/whitespace) within the watermark → dedup stage drops it
      in.addData((4L, "  " + good.toUpperCase + "  ", w0 + 30))
      q.processAllAvailable()
      val rows = spark.table("sfused").collect()
        .map(r => (r.getLong(0), r.getAs[String]("text")))
      assert(rows.map(_._1).toSeq === Seq(1L),
        "exactly the first occurrence of the one high-quality doc survives")
      assert(rows.head._2.contains("[EMAIL]") && !rows.head._2.contains("bob@"))
    } finally q.stop()
  }

  test("checkpoint restart resumes aggregation state without reprocessing old files") {
    import graft.streaming.StreamingUniqueUsers
    val inDir = java.nio.file.Files.createTempDirectory("graft-restart-in").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft-restart-cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-restart-out").toString
    def writeFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(inDir, name), lines.mkString("", "\n", "\n"))
    def runOnce(): Unit = {
      val raw = spark.readStream.text(inDir)
      // the update-mode (single stateful agg) variant — the chained exact
      // form is append-only; HLL is exact at this cardinality
      val counts = StreamingUniqueUsers.uniqueUsersPerWindowApprox(
        StreamingUniqueUsers.parseEvents(raw))
      // AvailableNow: processes what's there, then stops — the restart shape
      val q = StreamingUniqueUsers.startIdempotentParquetSink(counts, outDir, cpDir)
      q.awaitTermination()
    }
    // run 1: two users in window w0
    writeFile("f1.jsonl", Seq(jsonEvent("a", w0 + 1), jsonEvent("b", w0 + 2)))
    runOnce()
    // run 2, SAME checkpoint: one more distinct user for w0 plus a new window
    writeFile("f2.jsonl", Seq(jsonEvent("c", w0 + 3), jsonEvent("d", w0 + 61)))
    runOnce()
    // per-batch emissions, skipping no-data watermark-advance batches
    val emissions: Seq[(Long, Map[Long, Long])] =
      new java.io.File(outDir).listFiles().filter(_.isDirectory).toSeq
        .map(d => d.getName.stripPrefix("batch_id=").toLong -> (try {
          spark.read.parquet(d.getPath).collect()
            .map { case Row(ws: Long, n: Long) => ws -> n }.toMap
        } catch { case _: Throwable => Map.empty[Long, Long] }))
        .filter(_._2.nonEmpty).sortBy(_._1)
    // run 1 saw a+b; run 2 must CONTINUE the state (a,b,c => 3), which is
    // only possible if the restart neither replayed f1 nor lost the store —
    // a fresh state would count only c (1), a reprocess would double-count
    assert(emissions.head._2 === Map(w0 -> 2L))
    assert(emissions.last._2 === Map(w0 -> 3L, (w0 + 60) -> 1L))
    assert(emissions.last._1 > emissions.head._1) // a genuinely later batch
  }

  test("TrainingPipeline maintains the search index online; ledger survives replay") {
    import graft.streaming.TrainingPipeline
    import graft.operators.Search
    val inDir = java.nio.file.Files.createTempDirectory("graft-si-in").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft-si-cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-si-out").toString
    val good1 = "the quick brown fox jumps over a lazy dog and then it runs " +
      "to the barn where the farmer is reading mail from the postman today"
    val good2 = "a second fine document in the english language with the usual " +
      "collection of stopwords and a perfectly reasonable length for a test"
    def docJson(id: Long, text: String, source: String, sec: Long): String =
      s"""{"doc_id": $id, "text": "$text", "source": "$source", "ts_sec": $sec}"""
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")
    val index = Seq(Tuple1("known doc")).toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    try {
      Search.dropSearchIndex(spark, "srch_s")
      // seed the index so the stream has something to append TO
      Search.saveSearchIndex(
        Seq((100L, "seed corpus entry about the farm", "s9")).toDF("doc_id", "text", "source"),
        "srch_s")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir, "f1.jsonl"),
        Seq(docJson(1, good1, "s0", w0), docJson(2, good2, "s0", w0 + 1),
          docJson(3, "!!! ??? ***", "s0", w0 + 2)).mkString("", "\n", "\n"))
      val docs = spark.readStream.schema(schema).json(inDir)
        .select(col("doc_id"), col("text"), col("source"),
          timestamp_seconds(col("ts_sec")).as("ts"))
      // search-only cadence: the dedup fp relation stays plan-pinned
      // (no per-batch anti-join fallback needed), while the postings
      // index compacts in-sink after every batch
      TrainingPipeline.start(docs, index, outDir, cpDir,
        maintainSearchIndexName = Some("srch_s"),
        compactEvery = Some(1)).awaitTermination()
      // the maintained index now answers searches over seed + admitted
      // docs (the quality gate dropped the punctuation soup)
      val hits = Search.bm25Indexed(spark, "srch_s", "farmer barn english", 10)
        .collect().map(_.getLong(0)).toSet
      assert(hits === Set(1L, 2L), "admitted docs must be searchable online")
      // the every-batch cadence compacted in-sink: everything folded to
      // the base segment, append-born files reclaimed
      assert(spark.table("srch_s_postings")
        .filter(col("batch_id") =!= Search.BaseSegment).count() === 0L,
        "in-sink compaction must fold the postings to the base segment")
      // replay safety: re-appending under an already-ledgered id is a
      // no-op (the foreachBatch replay shape; real-id replay is also
      // pinned in PipelineOpsSpec)
      val before = Search.bm25Indexed(spark, "srch_s", "farmer barn english", 10).collect().toSeq
      val admitted = Seq((1L, good1, "s0"), (2L, good2, "s0")).toDF("doc_id", "text", "source")
      val ledgered = spark.table("srch_s_totals").agg(max(col("batch_id"))).head().getLong(0)
      Search.appendToSearchIndex(admitted, "srch_s", Some(ledgered))
      assert(Search.bm25Indexed(spark, "srch_s", "farmer barn english", 10).collect().toSeq === before,
        "a replayed micro-batch must not double tf/df")
    } finally Search.dropSearchIndex(spark, "srch_s")
  }

  test("TrainingPipeline maintains the lexical PQ index online: admitted docs become ANN-retrievable") {
    import graft.streaming.TrainingPipeline
    import graft.operators.{Similarity, TextAnalysis}
    val inDir = java.nio.file.Files.createTempDirectory("graft-vi-in").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft-vi-cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-vi-out").toString
    val ixDir = java.nio.file.Files.createTempDirectory("graft-vi-ix").toString + "/pq"
    // a seed corpus wide enough to train the frozen quantizer/codebooks
    val seedTexts = (0 until 40).map { i =>
      val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta")
      (100L + i, (0 until 12).map(j => words((i * 7 + j * 3) % words.length)).mkString(" "), "seed")
    }
    val seed = seedTexts.toDF("doc_id", "text", "source")
    val good1 = "the quick brown fox jumps over a lazy dog and then it runs " +
      "to the barn where the farmer is reading mail from the postman today"
    def docJson(id: Long, text: String, source: String, sec: Long): String =
      s"""{"doc_id": $id, "text": "$text", "source": "$source", "ts_sec": $sec}"""
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")
    val index = Seq(Tuple1("known doc")).toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    try {
      Similarity.savePqIndex(TextAnalysis.lexicalVectors(seed), ixDir, slot = "vi_test")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir, "f1.jsonl"),
        Seq(docJson(1, good1, "s0", w0)).mkString("", "\n", "\n"))
      val docs = spark.readStream.schema(schema).json(inDir)
        .select(col("doc_id"), col("text"), col("source"),
          timestamp_seconds(col("ts_sec")).as("ts"))
      TrainingPipeline.start(docs, index, outDir, cpDir,
        maintainVectorIndexPath = Some(ixDir),
        compactEvery = Some(1)).awaitTermination()
      // search the maintained index with doc 1's own vector: the frozen
      // geometry must return it as its own nearest neighbor... vec_id ==
      // query_id rows are excluded by the search, so probe with a
      // shifted query id carrying the same embedding
      val probe = TextAnalysis.lexicalVectors(
        Seq((999L, good1)).toDF("doc_id", "text"))
        .select(col("vec_id").as("query_id"), col("embedding"))
      val hits = Similarity.pqSearchIndexed(spark, ixDir, probe, k = 1)
        .collect().map(_.getLong(1))
      assert(hits.toSeq === Seq(1L),
        "the admitted doc must be the nearest neighbor of its own vector")
      // the cadence compacted: a second identical append folds away
      val dupCheck = spark.read.parquet(s"$ixDir/cells")
        .groupBy(col("vec_id")).count().filter(col("count") > 1).count()
      assert(dupCheck === 0L, "cadence compaction must leave unique vec_ids")
    } finally graft.operators.Similarity.clearSessionState()
  }

  test("end-to-end training pipeline: index dedup → curation → shard tree, restart-safe") {
    import graft.streaming.TrainingPipeline
    import graft.operators.TextAnalysis
    val inDir = java.nio.file.Files.createTempDirectory("graft-tp-in").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft-tp-cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-tp-out").toString
    val good1 = "the quick brown fox jumps over a lazy dog and then it runs " +
      "to the barn where the farmer is reading mail from bob@example.com today"
    val good2 = "a second fine document in the english language with the usual " +
      "collection of stopwords and a perfectly reasonable length for a test"
    def docJson(id: Long, text: String, source: String, sec: Long): String =
      s"""{"doc_id": $id, "text": "$text", "source": "$source", "ts_sec": $sec}"""
    def writeFile(name: String, lines: Seq[String]): Unit =
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(inDir, name), lines.mkString("", "\n", "\n"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")
    // the persisted-corpus fingerprint index: "known doc" already ingested
    val index = Seq(Tuple1("known doc")).toDF("text")
      .select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    def runOnce(): Unit = {
      val docs = spark.readStream.schema(schema).json(inDir)
        .select(col("doc_id"), col("text"), col("source"),
          timestamp_seconds(col("ts_sec")).as("ts"))
      TrainingPipeline.start(docs, index, outDir, cpDir).awaitTermination()
    }
    // run 1: an already-indexed dup, one good doc, punctuation soup
    writeFile("f1.jsonl", Seq(
      docJson(1, "KNOWN   doc", "s0", w0),
      docJson(2, good1, "s0", w0 + 1),
      docJson(3, "!!! ??? ***", "s0", w0 + 2)))
    runOnce()
    // run 2, SAME checkpoint: a within-watermark repeat of good1 (must be
    // dropped — only possible if the dedup state survived the restart)
    // plus one genuinely new good doc
    writeFile("f2.jsonl", Seq(
      docJson(4, good1, "s1", w0 + 30),
      docJson(5, good2, "s1", w0 + 31)))
    runOnce()
    // read the shard trees batch by batch (empty batches write no rows)
    val batchDirs = new java.io.File(outDir).listFiles().filter(_.isDirectory).toSeq
    val perBatch = batchDirs.flatMap { d =>
      try Some(spark.read.parquet(d.getPath)) catch { case _: Throwable => None }
    }.filter(_.count() > 0)
    val admitted = perBatch.flatMap(_.collect().map(r =>
      r.getAs[Long]("doc_id") -> r.getAs[String]("text")))
    // exactly docs 2 and 5 survive: 1 killed by the index join, 3 by
    // curation, 4 by cross-restart dedup state; and 2 appears exactly
    // once — run 2 did not reprocess f1
    assert(admitted.map(_._1).sorted === Seq(2L, 5L))
    val scrubbed = admitted.toMap.apply(2L)
    assert(scrubbed.contains("[EMAIL]") && !scrubbed.contains("bob@"))
    // the exported tree IS the packing: per batch, the (source, block,
    // shard) totals reconstructed from the tree equal pack_shards run on
    // that batch's admitted docs
    perBatch.foreach { df =>
      // partition-discovery infers block_id/shard_id as int — cast back
      val fromTree = df.groupBy(col("source"),
          col("block_id").cast("long").as("block_id"),
          col("shard_id").cast("long").as("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(graft.functions.TextFunctions.tokenCount(col("text")).cast("long")).as("shard_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .collect().map(_.toSeq).toSet
      val expected = TextAnalysis.packShards(df.select(col("doc_id"), col("text"), col("source")))
        .collect().map(_.toSeq).toSet
      assert(fromTree === expected, "shard tree totals must match pack_shards")
    }
  }

  test("TrainingPipeline maintains its dedup index online: admitted docs reject later dups") {
    import graft.operators.Dedup
    import graft.streaming.TrainingPipeline
    val good = "the quick brown fox jumps over a lazy dog and then it runs " +
      "to the barn where the farmer is reading the morning mail today"
    def docJson(id: Long, text: String, source: String, sec: Long): String =
      s"""{"doc_id": $id, "text": "$text", "source": "$source", "ts_sec": $sec}"""
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")
    // seed the persisted index from a batch-side corpus
    Dedup.saveDedupIndex(
      Seq((0L, "seed corpus doc", "s0")).toDF("doc_id", "text", "source"), "dix_online")
    // separate outDir per run: fresh checkpoints restart batch ids at 0,
    // and the batchId-keyed overwrite would make run 2 overwrite run 1
    def runOnce(outDir: String, lines: Seq[String]): Unit = {
      // FRESH input dir and FRESH checkpoint per run: any cross-run dedup
      // below is therefore the INDEX's doing, not retained stream state
      val inDir = java.nio.file.Files.createTempDirectory("graft-online-in").toString
      val cpDir = java.nio.file.Files.createTempDirectory("graft-online-cp").toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(inDir, "in.jsonl"), lines.mkString("", "\n", "\n"))
      val docs = spark.readStream.schema(schema).json(inDir)
        .select(col("doc_id"), col("text"), col("source"),
          timestamp_seconds(col("ts_sec")).as("ts"))
      // load through the product API: refresh-on-read picks up appends
      // made by previous runs' foreachBatch (cloned-session) writers
      TrainingPipeline.start(docs, Dedup.loadDedupIndex(spark, "dix_online").fp, outDir, cpDir,
        maintainIndexName = Some("dix_online")).awaitTermination()
    }
    val out1 = java.nio.file.Files.createTempDirectory("graft-online-out1").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft-online-out2").toString
    runOnce(out1, Seq(docJson(1, good, "s0", w0)))          // admitted + appended to the index
    runOnce(out2, Seq(docJson(2, good.toUpperCase, "s1", w0 + 5000))) // exact norm-dup of doc 1
    def admittedIn(dir: String): Seq[Long] =
      new java.io.File(dir).listFiles().filter(_.isDirectory).toSeq
        .flatMap(d => try spark.read.parquet(d.getPath).collect() catch { case _: Throwable => Nil })
        .map(_.getAs[Long]("doc_id"))
    val admitted = admittedIn(out1) ++ admittedIn(out2)
    assert(admitted === Seq(1L),
      "run 2's dup must be rejected by the index run 1 appended — with a fresh checkpoint, " +
        "only the maintained index can know about doc 1")
  }

  test("maintained index rejects duplicates beyond the watermark horizon WITHIN one run") {
    // doc 1 is admitted in batch 0; its exact dup arrives two hours
    // later (batch 2), long after doc 1's watermark state evicted — so
    // ONLY the online-maintained index can reject it, and only if the
    // stream's static-side join actually SEES batch 0's append within
    // the same run. That visibility is the load-bearing subtlety
    // (catalog tables list files per execution + appendToDedupIndex's
    // cross-session cache refresh); this test is the tripwire if a
    // Spark upgrade or refactor ever pins static-side listings at query
    // start — the documented fallback is a per-batch anti-join in the
    // sink (see TrainingPipeline.start's docstring).
    import graft.operators.Dedup
    import graft.streaming.TrainingPipeline
    val good = "the quick brown fox jumps over a lazy dog and then it runs " +
      "to the barn where the farmer is reading the morning mail today"
    val other = "a second fine document in the english language with the usual " +
      "collection of stopwords and a perfectly reasonable length for a test"
    def docJson(id: Long, text: String, sec: Long): String =
      s"""{"doc_id": $id, "text": "$text", "source": "s0", "ts_sec": $sec}"""
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")
    val inDir = java.nio.file.Files.createTempDirectory("graft-hzn-in").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft-hzn-cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-hzn-out").toString
    Dedup.saveDedupIndex(
      Seq((0L, "seed corpus doc", "s0")).toDF("doc_id", "text", "source"), "dix_horizon")
    // one file per micro-batch, mtimes force processing order; each
    // batch's event time advances 2 h, evicting the previous batch's
    // 10-minute watermark state before the dup arrives
    Seq(
      "f0.jsonl" -> docJson(1, good, w0),
      "f1.jsonl" -> docJson(2, other, w0 + 7200),
      "f2.jsonl" -> docJson(3, good, w0 + 14400) // horizon-crossing dup of doc 1
    ).zipWithIndex.foreach { case ((name, line), i) =>
      val p = java.nio.file.Paths.get(inDir, name)
      java.nio.file.Files.writeString(p, line + "\n")
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 10000L))
    }
    val docs = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(inDir)
      .select(col("doc_id"), col("text"), col("source"),
        timestamp_seconds(col("ts_sec")).as("ts"))
    TrainingPipeline.start(docs, Dedup.loadDedupIndex(spark, "dix_horizon").fp, outDir, cpDir,
      maintainIndexName = Some("dix_horizon")).awaitTermination()
    val admitted = new java.io.File(outDir).listFiles().filter(_.isDirectory).toSeq
      .flatMap(d => try spark.read.parquet(d.getPath).collect() catch { case _: Throwable => Nil })
      .map(_.getAs[Long]("doc_id")).sorted
    assert(admitted === Seq(1L, 2L),
      "the horizon-crossing dup must be rejected by the per-batch fresh-index anti-join")
  }

  test("compactEvery: in-sink compaction bounds index files and preserves dedup results") {
    // four micro-batches with compactEvery=2 → the sink compacts after
    // batches 1 and 3. The dup of doc 1 arrives in batch 3, AFTER the
    // batch-1 compaction rewrote all three tables in place — so the
    // rejection proves the rewritten index serves the static-side join
    // correctly from a foreachBatch clone (the cross-session refresh in
    // compactDedupIndex is what this pins). The final state is
    // fully-compacted (batch 3 is a cadence boundary), so the file bound
    // is exact: ≤ 1 file per bucket per table, versus one file SET per
    // append without the cadence.
    import graft.operators.Dedup
    import graft.streaming.TrainingPipeline
    val good = "the quick brown fox jumps over a lazy dog and then it runs " +
      "to the barn where the farmer is reading the morning mail today"
    val other = "a second fine document in the english language with the usual " +
      "collection of stopwords and a perfectly reasonable length for a test"
    val third = "yet another wholly original piece of text where the writer is " +
      "in a hurry but the sentences still read like the plain english they are"
    def docJson(id: Long, text: String, sec: Long): String =
      s"""{"doc_id": $id, "text": "$text", "source": "s0", "ts_sec": $sec}"""
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")
    val inDir = java.nio.file.Files.createTempDirectory("graft-cmp-in").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft-cmp-cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-cmp-out").toString
    Dedup.saveDedupIndex(
      Seq((0L, "seed corpus doc", "s0")).toDF("doc_id", "text", "source"), "dix_cadence")
    Seq(
      "f0.jsonl" -> docJson(1, good, w0),
      "f1.jsonl" -> docJson(2, other, w0 + 7200),
      "f2.jsonl" -> docJson(3, third, w0 + 14400),
      "f3.jsonl" -> docJson(4, good, w0 + 21600) // dup of doc 1, post-compaction
    ).zipWithIndex.foreach { case ((name, line), i) =>
      val p = java.nio.file.Paths.get(inDir, name)
      java.nio.file.Files.writeString(p, line + "\n")
      java.nio.file.Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000000000000L + i * 10000L))
    }
    val docs = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").json(inDir)
      .select(col("doc_id"), col("text"), col("source"),
        timestamp_seconds(col("ts_sec")).as("ts"))
    TrainingPipeline.start(docs, Dedup.loadDedupIndex(spark, "dix_cadence").fp, outDir, cpDir,
      maintainIndexName = Some("dix_cadence"), compactEvery = Some(2)).awaitTermination()
    val admitted = new java.io.File(outDir).listFiles().filter(_.isDirectory).toSeq
      .flatMap(d => try spark.read.parquet(d.getPath).collect() catch { case _: Throwable => Nil })
      .map(_.getAs[Long]("doc_id")).sorted
    assert(admitted === Seq(1L, 2L, 3L),
      "the post-compaction dup must still be rejected by the maintained index")
    val catalog = spark.sessionState.catalog
    val nFiles = Seq("_fp", "_bands", "_shingles").map { s =>
      val loc = java.nio.file.Paths.get(catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("dix_cadence" + s)).location)
      val st = java.nio.file.Files.walk(loc)
      try st.filter(p => p.getFileName.toString.startsWith("part-")).count()
      finally st.close()
    }.sum
    assert(nFiles <= 24,
      s"a cadence-boundary final batch leaves a fully-compacted index (≤ 8 buckets × 3 " +
        s"tables), got $nFiles files — the in-sink compaction did not run or did not rewrite")
  }

  test("maintained index rejects raw duplicates of PII-bearing docs (pre-redaction fingerprints)") {
    // regression: the index append must hash the PRE-redaction text. If a
    // batch's entries were fingerprinted AFTER piiRedact, a later raw
    // duplicate of any PII-bearing doc would hash differently and be
    // silently re-admitted — the dup below only gets caught when the
    // appended fingerprint matches what raw arrivals hash.
    import graft.operators.Dedup
    import graft.streaming.TrainingPipeline
    val pii = "the quick brown fox jumps over a lazy dog and then it runs " +
      "to the barn where the farmer is reading mail from bob@example.com today"
    def docJson(id: Long, text: String, source: String, sec: Long): String =
      s"""{"doc_id": $id, "text": "$text", "source": "$source", "ts_sec": $sec}"""
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")
    Dedup.saveDedupIndex(
      Seq((0L, "seed corpus doc", "s0")).toDF("doc_id", "text", "source"), "dix_pii")
    def runOnce(outDir: String, lines: Seq[String]): Unit = {
      // fresh input + checkpoint per run: cross-run dedup is the index's
      val inDir = java.nio.file.Files.createTempDirectory("graft-pii-in").toString
      val cpDir = java.nio.file.Files.createTempDirectory("graft-pii-cp").toString
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(inDir, "in.jsonl"), lines.mkString("", "\n", "\n"))
      val docs = spark.readStream.schema(schema).json(inDir)
        .select(col("doc_id"), col("text"), col("source"),
          timestamp_seconds(col("ts_sec")).as("ts"))
      TrainingPipeline.start(docs, Dedup.loadDedupIndex(spark, "dix_pii").fp, outDir, cpDir,
        maintainIndexName = Some("dix_pii")).awaitTermination()
    }
    val out1 = java.nio.file.Files.createTempDirectory("graft-pii-out1").toString
    val out2 = java.nio.file.Files.createTempDirectory("graft-pii-out2").toString
    runOnce(out1, Seq(docJson(1, pii, "s0", w0)))          // admitted; text redacts on export
    runOnce(out2, Seq(docJson(2, pii, "s1", w0 + 5000)))   // identical RAW arrival
    def admittedIn(dir: String): Seq[(Long, String)] =
      new java.io.File(dir).listFiles().filter(_.isDirectory).toSeq
        .flatMap(d => try spark.read.parquet(d.getPath).collect() catch { case _: Throwable => Nil })
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
    val run1 = admittedIn(out1)
    assert(run1.map(_._1) === Seq(1L))
    assert(run1.head._2.contains("[EMAIL]") && !run1.head._2.contains("bob@"),
      "the exported shard must carry the REDACTED text")
    assert(admittedIn(out2).isEmpty,
      "a raw duplicate of a PII-bearing doc must be rejected by the maintained index")
  }

  test("TrainingPipeline rarity gate drops reference-unseen gibberish online") {
    import graft.operators.TextAnalysis
    import graft.streaming.TrainingPipeline
    val good = "the quick brown fox jumps over a lazy dog and then it runs " +
      "to the barn where the farmer is reading the morning mail today"
    // passes quality (20 tokens, no punctuation soup) and language-ID
    // (2/20 stopwords = 0.1 ≥ 0.05), but its content words are unseen in
    // the reference — exactly the doc only an LM-style gate catches.
    // Exact scores vs the 25-token reference (p(the) = 160000 ppm):
    // sneaky = (2×160000) div 20 = 16000; good = 1480000 div 25 = 59200.
    val sneaky = "the xqzjv vvbnw qqplx zzrty wwkjh ttmnb ccxyz ppqrs ddfgh " +
      "the mmnop rrstu aabbc ddeef gghhi jjkkl mmnno ppqqr sstt"
    TextAnalysis.saveTokenFreqs(
      Seq((0L, good, "s0")).toDF("doc_id", "text", "source"), "rfreq_gate")
    val inDir = java.nio.file.Files.createTempDirectory("graft-rg-in").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft-rg-cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-rg-out").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir, "in.jsonl"),
      Seq(
        s"""{"doc_id": 1, "text": "$good", "source": "s1", "ts_sec": $w0}""",
        s"""{"doc_id": 2, "text": "$sneaky", "source": "s1", "ts_sec": ${w0 + 1}}"""
      ).mkString("", "\n", "\n"))
    val docs = spark.readStream
      .schema("doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")
      .json(inDir)
      .select(col("doc_id"), col("text"), col("source"),
        timestamp_seconds(col("ts_sec")).as("ts"))
    val emptyIndex = Seq.empty[Tuple1[String]].toDF("fp")
    TrainingPipeline.start(docs, emptyIndex, outDir, cpDir,
      rarityGate = Some(("rfreq_gate", 30000L))).awaitTermination()
    val admitted = new java.io.File(outDir).listFiles().filter(_.isDirectory).toSeq
      .flatMap(d => try spark.read.parquet(d.getPath).collect() catch { case _: Throwable => Nil })
      .map(_.getAs[Long]("doc_id"))
    assert(admitted === Seq(1L),
      "the stopword-padded unseen-vocabulary doc must fail the rarity gate")
  }

  test("TrainingPipeline LM gate drops common-word token salad the rarity gate admits") {
    import graft.operators.TextAnalysis
    import graft.streaming.TrainingPipeline
    val fluent = "the cat sat on the mat and the dog ran to the rug"
    // every TOKEN is reference vocabulary (the unigram rarity gate scores
    // it normal), every TRANSITION is unattested — only the bigram LM
    // flags it. Stopword count is unchanged by the shuffle, so language-ID
    // and the quality heuristics pass it too.
    val salad = "the the cat mat on and sat dog the ran rug to the"
    val reference = Seq.tabulate(20)(i => (i.toLong, fluent, "s0"))
      .toDF("doc_id", "text", "source")
    TextAnalysis.saveTokenFreqs(reference, "rfreq_lmg")
    TextAnalysis.saveBigramLm(reference, "blm_gate")
    // measure the separation batch-side and gate at the midpoint: the
    // spec pins that the two classes are far apart, not a magic constant
    val batchScores = TextAnalysis.bigramSurprisalAgainst(
      Seq((1L, fluent, "s1"), (2L, salad, "s1")).toDF("doc_id", "text", "source"),
      reference).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("bits_per_bigram_milli")).toMap
    assert(batchScores(2L) > 2 * batchScores(1L),
      s"salad must score well above fluent text (got $batchScores)")
    val thr = (batchScores(1L) + batchScores(2L)) / 2
    val inDir = java.nio.file.Files.createTempDirectory("graft-lmg-in").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft-lmg-cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-lmg-out").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir, "in.jsonl"),
      Seq(
        s"""{"doc_id": 1, "text": "$fluent", "source": "s1", "ts_sec": $w0}""",
        s"""{"doc_id": 2, "text": "$salad", "source": "s1", "ts_sec": ${w0 + 1}}"""
      ).mkString("", "\n", "\n"))
    val docs = spark.readStream
      .schema("doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")
      .json(inDir)
      .select(col("doc_id"), col("text"), col("source"),
        timestamp_seconds(col("ts_sec")).as("ts"))
    val emptyIndex = Seq.empty[Tuple1[String]].toDF("fp")
    // rarity gate ON with a threshold both docs pass (same vocabulary ⇒
    // near-identical unigram scores) — proving the LM gate is the one
    // that discriminates
    TrainingPipeline.start(docs, emptyIndex, outDir, cpDir,
      rarityGate = Some(("rfreq_lmg", 30000L)),
      lmGate = Some(("blm_gate", thr))).awaitTermination()
    val admitted = new java.io.File(outDir).listFiles().filter(_.isDirectory).toSeq
      .flatMap(d => try spark.read.parquet(d.getPath).collect() catch { case _: Throwable => Nil })
      .map(_.getAs[Long]("doc_id"))
    assert(admitted === Seq(1L),
      "the token-salad doc must fail the LM gate while the fluent doc passes every gate")
  }

  test("TrainingPipeline DSIR gate keeps target-domain docs the fluency gates can't distinguish") {
    import graft.operators.TextAnalysis
    import graft.streaming.TrainingPipeline
    // two EQUALLY fluent domains — a perplexity gate can't separate
    // them; only the importance weight (target-vs-base surprisal
    // difference) says which one the pipeline wants MORE of
    val feline = "the cat sat on the mat and the cat ate the fish"
    val finance = "the bank set the rate and the fund held the bond"
    val targetRef = Seq.tabulate(10)(i => (i.toLong, feline, "t")).toDF("doc_id", "text", "source")
    val baseRef = Seq.tabulate(10)(i => (i.toLong, if (i % 2 == 0) feline else finance, "b"))
      .toDF("doc_id", "text", "source")
    TextAnalysis.saveBigramLm(targetRef, "dsir_t")
    TextAnalysis.saveBigramLm(baseRef, "dsir_b")
    // batch-side separation check, then gate at the midpoint — the spec
    // pins the two domains apart, not a magic constant
    val w = TextAnalysis.dsirWeightsAgainst(
      Seq((1L, feline, "s1"), (2L, finance, "s1")).toDF("doc_id", "text", "source"),
      TextAnalysis.loadBigramLm(spark, "dsir_t"),
      TextAnalysis.loadBigramLm(spark, "dsir_b")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("dsir_milli")).toMap
    assert(w(1L) > w(2L), s"feline doc must out-weight finance doc (got $w)")
    val thr = (w(1L) + w(2L)) / 2
    val inDir = java.nio.file.Files.createTempDirectory("graft-dsir-in").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft-dsir-cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft-dsir-out").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir, "in.jsonl"),
      Seq(
        s"""{"doc_id": 1, "text": "$feline", "source": "s1", "ts_sec": $w0}""",
        s"""{"doc_id": 2, "text": "$finance", "source": "s1", "ts_sec": ${w0 + 1}}"""
      ).mkString("", "\n", "\n"))
    val docs = spark.readStream
      .schema("doc_id BIGINT, text STRING, source STRING, ts_sec BIGINT")
      .json(inDir)
      .select(col("doc_id"), col("text"), col("source"),
        timestamp_seconds(col("ts_sec")).as("ts"))
    val emptyIndex = Seq.empty[Tuple1[String]].toDF("fp")
    TrainingPipeline.start(docs, emptyIndex, outDir, cpDir,
      dsirGate = Some(("dsir_t", "dsir_b", thr))).awaitTermination()
    val admitted = new java.io.File(outDir).listFiles().filter(_.isDirectory).toSeq
      .flatMap(d => try spark.read.parquet(d.getPath).collect() catch { case _: Throwable => Nil })
      .map(_.getAs[Long]("doc_id"))
    assert(admitted === Seq(1L),
      "the off-domain doc must fail the DSIR gate while the target-domain doc is admitted")
  }

  test("trending tokens: bounded MG state still surfaces every above-bound token per window") {
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.TrendingTokens
    val in = MemoryStream[(String, Long)]
    val docs = in.toDF()
      .select(col("_1").as("text"), timestamp_seconds(col("_2")).as("ts"))
    // cap=8 but the window sees 100+ distinct tokens -> the per-window
    // state MUST saturate and decrement, yet the hot tokens survive
    val q = TrendingTokens.trendingTokens(docs, windowSec = 60, cap = 8).writeStream
      .format("memory").queryName("trending").outputMode("append").start()
    try {
      // window w0: "breaking" in 40 of 100 docs, "news" in 30, plus 100+
      // singleton noise tokens spread over the same window, split across
      // two micro-batches so partial merges run too
      val noise = (0 until 60).map(i => (s"noise$i unique$i", w0 + 5 + i % 50))
      in.addData((0 until 40).map(i => ("breaking story", w0 + 1 + i % 55)) ++ noise.take(30): _*)
      q.processAllAvailable()
      in.addData((0 until 30).map(i => ("news update", w0 + 2 + i % 55)) ++ noise.drop(30): _*)
      q.processAllAvailable()
      // advance the watermark past w0+60 to finalize the window
      in.addData(("flush", w0 + 300))
      q.processAllAvailable()
      val rows = spark.table("trending").collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val cands = rows(w0)
      assert(cands.length <= 8, s"state exceeded the cap: $cands")
      // n tokens in w0 ~ 40*2+30*2+60*2 = 260; bound n/(cap+1) ~ 29:
      // "breaking"(40) and "news"(30) must be present; "story"(40) and
      // "update"(30) ride the same guarantee
      assert(cands.contains("breaking") && cands.contains("story"), s"hot tokens missing: $cands")
      assert(cands.contains("news") && cands.contains("update"), s"hot tokens missing: $cands")
    } finally q.stop()
  }

  test("batch and streaming agree on the same data") {
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, Sf0001)
      .select(col("user_id").cast("string").as("uid"), col("ts"))
    // batch side of the unified API
    val batch = StreamingUniqueUsers.uniqueUsersPerWindow(events)
      .collect().map { case Row(w: Long, n: Long) => w -> n }.toMap
    val expected = graft.operators.UniqueUsers.perMinute(Tables.events(spark, Sf0001))
      .collect().map { case Row(w: Long, n: Long) => w -> n }.toMap
    assert(batch === expected)
  }

  test("keyed windowed distinct: streaming append finalizes per (type, window); unified API equals batch") {
    implicit val sqlCtx = spark.sqlContext
    // true stream: (window, type)-keyed two-phase dedup in append mode
    val in = MemoryStream[(String, String, Long)] // (uid, type, sec)
    val counts = StreamingUniqueUsers.uniqueUsersPerWindowByType(
      in.toDF().selectExpr("_1 AS uid", "_2 AS event_type",
        "CAST(_3 AS TIMESTAMP) AS ts"))
    val q = counts.writeStream.format("memory").queryName("uu_bytype")
      .outputMode("append").start()
    try {
      in.addData(("a", "click", w0 + 1), ("b", "click", w0 + 2),
        ("a", "click", w0 + 10), ("a", "view", w0 + 3))
      q.processAllAvailable()
      in.addData(("z", "click", w0 + 300)) // advance watermark past w0+60
      q.processAllAvailable()
      val rows = spark.table("uu_bytype").collect()
        .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(rows((w0, "click")) === 2L) // a deduped within its key
      assert(rows((w0, "view")) === 1L)
      // unified API: the same operator over a batch frame equals the
      // batch operator's relation
      val events = Tables.events(spark, Sf0001)
      val viaStreamOp = StreamingUniqueUsers.uniqueUsersPerWindowByType(
        events.select(col("user_id").cast("string").as("uid"),
          col("event_type"), col("ts")))
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      val viaBatch = graft.operators.UniqueUsers.perMinuteByType(events)
        .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
      assert(viaStreamOp === viaBatch)
    } finally q.stop()
  }
}
