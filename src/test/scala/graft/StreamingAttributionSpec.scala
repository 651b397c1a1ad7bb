package graft

import java.sql.Timestamp

import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingAttribution
import graft.streaming.StreamingAttribution.{Attribution, TouchEvent}

/** Online last-touch attribution: constant per-user state, per-purchase
  * emission, and rolled-up equality with the batch operator. */
class StreamingAttributionSpec extends SparkSpec {

  import spark.implicits._

  private val t0 = 1700000000L * 1000 // ms

  private def ev(uid: String, offSec: Long, tpe: String, id: Long, v: Double = 0.0) =
    TouchEvent(uid, new Timestamp(t0 + offSec * 1000), tpe, id, v)

  test("purchases attribute at arrival: in-horizon touch wins, stale and untouched go direct") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TouchEvent]
    val q = StreamingAttribution.attribute(
        in.toDS().withWatermark("ts", "5 seconds"))
      .writeStream.format("memory").queryName("attr1").outputMode("append").start()
    try {
      in.addData(ev("u1", 0, "click", 1), ev("u2", 0, "view", 2),
        ev("u3", 10, "purchase", 3, 3.0)) // no touch ever: direct, same batch
      q.processAllAvailable()
      // cross-batch: the touch state carries into the next trigger
      in.addData(ev("u1", 600, "purchase", 4, 1.0),      // 10 min after the click
        ev("u2", 86401, "purchase", 5, 2.0))             // 1 s past the horizon
      q.processAllAvailable()
      val got = spark.table("attr1").as[Attribution].collect().toSet
      assert(got === Set(
        Attribution("u3", t0 / 1000 + 10, "direct", 300L),
        Attribution("u1", t0 / 1000 + 600, "click", 100L),
        Attribution("u2", t0 / 1000 + 86401, "direct", 200L)))
    } finally q.stop()
  }

  test("a batch that cannot advance the state never re-arms a timeout below the watermark (crash regression)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TouchEvent]
    val q = StreamingAttribution.attribute(
        in.toDS().withWatermark("ts", "5 seconds"))
      .writeStream.format("memory").queryName("attr2").outputMode("append").start()
    try {
      in.addData(ev("u1", 0, "click", 1))
      q.processAllAvailable()
      // keep u1's state alive while another user drags the watermark far
      // past u1's armed timeout (t0 + 24h)
      in.addData(ev("u1", 10, "purchase", 2, 1.0), ev("u9", 200000, "view", 3))
      q.processAllAvailable()
      // now the watermark is ~t0+200000s; u1's stale state gets data
      // again — the un-clamped re-arm used to throw and kill the query
      in.addData(ev("u1", 200001, "purchase", 4, 2.0))
      q.processAllAvailable()
      val got = spark.table("attr2").as[Attribution].collect().toSet
      assert(got === Set(
        Attribution("u1", t0 / 1000 + 10, "click", 100L),
        Attribution("u1", t0 / 1000 + 200001, "direct", 200L)))
    } finally q.stop()
  }

  test("a late cross-batch purchase is never credited to a FUTURE touch (regression)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TouchEvent]
    // wide watermark so the late purchase is processed, not dropped
    val q = StreamingAttribution.attribute(
        in.toDS().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("attr_late").outputMode("append").start()
    try {
      in.addData(ev("u1", 100, "click", 1))
      q.processAllAvailable()
      // purchase at t=50 arrives AFTER the t=100 touch already took the
      // state: the stored touch post-dates it, so the credit must fall
      // back to 'direct' (batch would credit only a touch at or before
      // t=50 — of which there is none)
      in.addData(ev("u1", 50, "purchase", 2, 1.0))
      q.processAllAvailable()
      val got = spark.table("attr_late").as[Attribution].collect().toSet
      assert(got === Set(Attribution("u1", t0 / 1000 + 50, "direct", 100L)))
    } finally q.stop()
  }

  test("same-second touches resolve by eventId like the batch order, not by sub-second millis (regression)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TouchEvent]
    val q = StreamingAttribution.attribute(
        in.toDS().withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("attr_tie").outputMode("append").start()
    try {
      // two touches in the SAME floor-second: id=1 at 10.900s, id=2 at
      // 10.100s. The batch total order (floor-sec, tag, event_id) applies
      // id=2 last, so 'view' must win even though its raw millis are
      // LOWER — the old raw-millis guard rejected it
      in.addData(
        TouchEvent("u1", new Timestamp(t0 + 10900), "click", 1, 0.0),
        TouchEvent("u1", new Timestamp(t0 + 10100), "view", 2, 0.0))
      q.processAllAvailable()
      in.addData(ev("u1", 12, "purchase", 3, 1.0))
      q.processAllAvailable()
      val got = spark.table("attr_tie").as[Attribution].collect().toSet
      assert(got === Set(Attribution("u1", t0 / 1000 + 12, "view", 100L)))
    } finally q.stop()
  }

  test("bootstrap handoff: first-batch purchases credit touches only the backfill saw") {
    implicit val sqlCtx = spark.sqlContext
    // history (never streamed): u1 has a click then a same-second view
    // with a higher eventId — the batch total order makes 'view' the
    // distilled state; u2's only touch is also historical
    val history = Seq(
      ev("u1", 0, "click", 1), TouchEvent("u1", new Timestamp(t0), "view", 3, 0.0),
      ev("u2", 5, "view", 2)).toDS()
    val in = MemoryStream[TouchEvent]
    val q = StreamingAttribution.attributeWithBootstrap(
        in.toDS().withWatermark("ts", "5 seconds"),
        StreamingAttribution.bootstrapState(history))
      .writeStream.format("memory").queryName("attr_boot").outputMode("append").start()
    try {
      in.addData(
        ev("u1", 600, "purchase", 10, 1.0),  // credits the HISTORICAL view
        ev("u3", 610, "purchase", 11, 3.0))  // no state anywhere: direct
      q.processAllAvailable()
      // a post-cutoff touch then overrides the bootstrapped state
      in.addData(ev("u2", 700, "click", 12))
      q.processAllAvailable()
      in.addData(ev("u2", 800, "purchase", 13, 2.0))
      q.processAllAvailable()
      val got = spark.table("attr_boot").as[Attribution].collect().toSet
      assert(got === Set(
        Attribution("u1", t0 / 1000 + 600, "view", 100L),
        Attribution("u3", t0 / 1000 + 610, "direct", 300L),
        Attribution("u2", t0 / 1000 + 800, "click", 200L)))
    } finally q.stop()
  }

  test("bootstrap handoff equals the unbroken full-history run on post-cutoff purchases (real events)") {
    val typed = Tables.events(spark, Sf0001).select(
        col("user_id").cast("string").as("uid"), col("ts"),
        col("event_type").as("eventType"), col("event_id").as("eventId"), col("value"))
      .as[TouchEvent]
    // cutoff at the event-time midpoint (a second boundary)
    val Row(lo: Timestamp, hi: Timestamp) =
      typed.agg(min(col("ts")), max(col("ts"))).head()
    val cutoffSec = (lo.getTime / 1000 + hi.getTime / 1000) / 2
    val pre = typed.filter(col("ts") < lit(new Timestamp(cutoffSec * 1000)))
    val post = typed.filter(col("ts") >= lit(new Timestamp(cutoffSec * 1000)))
    def canon(ds: org.apache.spark.sql.Dataset[Attribution]) =
      ds.collect().map(a => (a.uid, a.purchase_sec, a.channel, a.v_cents)).sorted.toSeq
    val unbroken = canon(StreamingAttribution.attribute(typed)
      .filter(col("purchase_sec") >= cutoffSec).as[Attribution])
    val handoff = canon(StreamingAttribution.attributeWithBootstrap(
      post, StreamingAttribution.bootstrapState(pre)))
    assert(handoff.nonEmpty && handoff === unbroken)
  }

  test("the operator is provider-agnostic: identical output under the RocksDB state store") {
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[TouchEvent]
      val q = StreamingAttribution.attribute(
          in.toDS().withWatermark("ts", "5 seconds"))
        .writeStream.format("memory").queryName("attr_rocks").outputMode("append").start()
      try {
        in.addData(ev("u1", 0, "click", 1), ev("u2", 0, "view", 2),
          ev("u3", 10, "purchase", 3, 3.0))
        q.processAllAvailable()
        in.addData(ev("u1", 600, "purchase", 4, 1.0),
          ev("u2", 86401, "purchase", 5, 2.0))
        q.processAllAvailable()
        // the state backend is a layout/durability choice, never a
        // semantics change: same rows as the HDFS-backed run above
        val got = spark.table("attr_rocks").as[Attribution].collect().toSet
        assert(got === Set(
          Attribution("u3", t0 / 1000 + 10, "direct", 300L),
          Attribution("u1", t0 / 1000 + 600, "click", 100L),
          Attribution("u2", t0 / 1000 + 86401, "direct", 200L)))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("rolled up, the online operator equals the batch lastTouchAttribution on real events") {
    val events = Tables.events(spark, Sf0001)
    val typed = events.select(
        col("user_id").cast("string").as("uid"), col("ts"),
        col("event_type").as("eventType"), col("event_id").as("eventId"), col("value"))
      .as[TouchEvent]
    val online = StreamingAttribution.attribute(typed) // batch execution: full history per key
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("cents"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val batch = graft.operators.Sessionize.lastTouchAttribution(events)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(online === batch)
  }
}
