package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via `flatMapGroupsWithState` — the
  * mechanism the reference's `aggregate(initializer, adder)` + state store
  * (UniqueUsersCounter.java:80-84) maps to when the built-in windowed
  * aggregation genuinely can't express the semantics (here: session
  * tracking with mid-stream emission of CLOSED sessions).
  *
  * State per user is three longs (start/last/count) — constant size, unlike
  * the reference's per-window uid set — and is evicted by event-time
  * timeout, so total state is O(active users), watermark-bounded.
  */
object SessionTracker {

  final case class Event(uid: String, ts: java.sql.Timestamp)
  final case class SessionState(start: Long, last: Long, n: Long) // epoch ms
  final case class Session(uid: String, session_start_sec: Long, n_events: Long, duration_sec: Long)

  val DefaultGapMs: Long = 30L * 60 * 1000

  // floor endpoints to seconds independently (matches unix_timestamp
  // semantics in the batch session_window operator)
  private def close(uid: String, s: SessionState): Session =
    Session(uid, s.start / 1000, s.n, s.last / 1000 - s.start / 1000)

  /** The state-transition function: fold this batch's events (sorted by
    * event time) into the open session; emit a closed session whenever the
    * gap is exceeded; arm an event-time timeout to flush the final one. */
  def update(gapMs: Long)(uid: String, events: Iterator[Event],
                          state: GroupState[SessionState]): Iterator[Session] = {
    val out = mutable.Buffer[Session]()
    if (state.hasTimedOut) {
      state.getOption.foreach(s => out += close(uid, s))
      state.remove()
    } else {
      var st = state.getOption
      events.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        st = st match {
          case Some(s) if t >= s.last + gapMs =>
            out += close(uid, s); Some(SessionState(t, t, 1))
          case Some(s) =>
            Some(SessionState(s.start, math.max(s.last, t), s.n + 1))
          case None => Some(SessionState(t, t, 1))
        }
      }
      st.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
    }
    out.iterator
  }

  /** Input must carry a watermark on `ts` (event-time timeout contract). */
  def trackSessions(events: Dataset[Event], gapMs: Long = DefaultGapMs): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[Session]
    implicit val keyEnc = Encoders.STRING
    events
      .groupByKey(_.uid)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update(gapMs))
  }
}
