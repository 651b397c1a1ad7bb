package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONLINE last-touch attribution — the streaming mirror of
  * `Sessionize.lastTouchAttribution`: per-user keyed state holds only the
  * latest touch (channel + event-time), and every purchase is emitted the
  * moment it arrives, credited to that touch if it is within the horizon,
  * else to 'direct'. The batch form answers "what converted last quarter";
  * this form answers it per purchase, at arrival time, which is what a
  * bidding/budgeting loop consumes.
  *
  * State per user is one (channel, epoch-ms) pair — constant size, evicted
  * by event-time timeout once the horizon passes with no new touches, so
  * total state is O(users active within the horizon), watermark-bounded
  * (the same state discipline as [[SessionTracker]]; the reference's
  * per-window uid-set state is the wall both avoid).
  *
  * Within-batch ordering: events fold sorted by (floor-second,
  * touches-before-purchases, eventId) and the horizon compares
  * floor-seconds — the batch operator's EXACT total order and time
  * arithmetic, so a same-second touch+purchase pair (and a pair exactly
  * at the 24 h boundary) attributes identically online and offline; the
  * batch-equivalence spec asserts the rolled-up equality outright.
  */
object StreamingAttribution {

  final case class TouchEvent(uid: String, ts: java.sql.Timestamp,
                              eventType: String, eventId: Long, value: Double)
  final case class TouchState(channel: String, lastMs: Long)
  final case class Attribution(uid: String, purchase_sec: Long,
                               channel: String, v_cents: Long)

  val DefaultHorizonMs: Long = 24L * 3600 * 1000
  private val Touches = Set("click", "view")

  def update(horizonMs: Long)(uid: String, events: Iterator[TouchEvent],
                              state: GroupState[TouchState]): Iterator[Attribution] = {
    val out = mutable.Buffer[Attribution]()
    if (state.hasTimedOut) {
      // the horizon passed with no fresh touch: nothing left to credit
      state.remove()
    } else {
      var st = state.getOption
      val ordered = events.toSeq.sortBy(e =>
        (e.ts.getTime / 1000, if (Touches.contains(e.eventType)) 0 else 1, e.eventId))
      ordered.foreach { e =>
        val sec = e.ts.getTime / 1000
        if (Touches.contains(e.eventType)) {
          // never let a LATE out-of-order touch regress the state: the
          // batch operator attributes to the latest touch by EVENT time,
          // so an older touch arriving after a newer one must lose
          if (st.forall(_.lastMs <= e.ts.getTime))
            st = Some(TouchState(e.eventType, e.ts.getTime))
        } else if (e.eventType == "purchase") {
          val ch = st match {
            case Some(s) if sec - s.lastMs / 1000 <= horizonMs / 1000 => s.channel
            case _ => "direct"
          }
          out += Attribution(uid, sec, ch, math.round(e.value * 100))
        }
      }
      st.foreach { s =>
        state.update(s)
        // +1s: the horizon compares FLOOR seconds, so a purchase up to
        // 999 ms past lastMs+horizon is still in-horizon and the state
        // must outlive it. Clamp above the watermark: a batch whose
        // events do NOT move lastMs forward (late purchases, stale
        // touches) would otherwise re-arm a timestamp the watermark has
        // already passed — Spark rejects that and kills the query.
        // (getCurrentWatermarkMs throws in BATCH execution, where no
        // watermark exists and no clamp is needed.)
        val wm = try state.getCurrentWatermarkMs() catch { case _: Exception => Long.MinValue }
        state.setTimeoutTimestamp(math.max(s.lastMs + horizonMs + 1000, wm + 1))
      }
    }
    out.iterator
  }

  /** Input must carry a watermark on `ts` (event-time timeout contract). */
  def attribute(events: Dataset[TouchEvent],
                horizonMs: Long = DefaultHorizonMs): Dataset[Attribution] = {
    implicit val stateEnc = Encoders.product[TouchState]
    implicit val outEnc = Encoders.product[Attribution]
    implicit val keyEnc = Encoders.STRING
    events
      .groupByKey(_.uid)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update(horizonMs))
  }
}
