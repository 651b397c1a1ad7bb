package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.SessionTracker
import graft.streaming.SessionTracker.{Event, Session}

/** Custom keyed state (flatMapGroupsWithState): sessions close on gap
  * within a batch and on event-time timeout across batches. */
class SessionTrackerSpec extends SparkSpec {

  import spark.implicits._

  private val t0 = 1700000000L * 1000 // ms

  private def ev(uid: String, offsetMin: Long): Event =
    Event(uid, new Timestamp(t0 + offsetMin * 60 * 1000))

  test("gap within a batch closes the earlier session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sessions = SessionTracker.trackSessions(
      in.toDS().withWatermark("ts", "5 seconds"))
    val q = sessions.writeStream.format("memory").queryName("sess1")
      .outputMode("append").start()
    try {
      in.addData(ev("u1", 0), ev("u1", 10), ev("u1", 90), ev("u2", 0))
      q.processAllAvailable()
      val got = spark.table("sess1").as[Session].collect()
      // u1's first session (2 events, 10 min) closed by the 90-min event;
      // u2's closed by event-time timeout (watermark reached t0+90min)
      assert(got.toSet === Set(
        Session("u1", t0 / 1000, 2, 600),
        Session("u2", t0 / 1000, 1, 0)))
    } finally q.stop()
  }

  test("event-time timeout flushes the open session") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Event]
    val sessions = SessionTracker.trackSessions(
      in.toDS().withWatermark("ts", "5 seconds"))
    val q = sessions.writeStream.format("memory").queryName("sess2")
      .outputMode("append").start()
    try {
      in.addData(ev("u1", 0), ev("u1", 5))
      q.processAllAvailable()
      assert(spark.table("sess2").isEmpty) // still open
      // another user's much-later event advances the watermark past
      // u1's last+gap -> u1's session times out and flushes
      in.addData(ev("u9", 120))
      q.processAllAvailable()
      in.addData(ev("u9", 240)) // advance watermark again (timeout fires next batch)
      q.processAllAvailable()
      val got = spark.table("sess2").as[Session].collect()
      assert(got.contains(Session("u1", t0 / 1000, 2, 300)))
    } finally q.stop()
  }

  test("batch equivalence: tracker agrees with session_window operator") {
    val events = Tables.events(spark, Sf0001)
      .select(col("user_id").cast("string").as("uid"), col("ts"))
      .as[Event]
    // batch flatMapGroupsWithState processes each key's full history once
    val tracked = SessionTracker.trackSessions(events)
    // in batch mode no timeout fires; only sessions closed by a gap are
    // emitted — compare against the session_window operator's non-final
    // sessions per user
    val viaWindow = graft.operators.Sessionize.userSessions(
      Tables.events(spark, Sf0001))
    val trackedSet = tracked.collect().map(s => (s.uid.toLong, s.session_start_sec, s.n_events, s.duration_sec)).toSet
    val windowSet = viaWindow.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // every tracker-emitted (closed) session must exist identically in the
    // session_window result; the tracker omits each user's final session
    assert(trackedSet.subsetOf(windowSet))
    val omitted = windowSet -- trackedSet
    val users = Tables.events(spark, Sf0001).select("user_id").distinct().count()
    assert(omitted.size === users) // exactly one open session per user
  }
}
