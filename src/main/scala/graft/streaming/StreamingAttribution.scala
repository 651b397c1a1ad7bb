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
  * touches-before-purchases, eventId) and BOTH horizon bounds compare
  * floor-seconds — the batch operator's EXACT total order and time
  * arithmetic, so a same-second touch+purchase pair (and a pair exactly
  * at the 24 h boundary) attributes identically online and offline; the
  * batch-equivalence spec asserts the rolled-up equality outright.
  *
  * CROSS-BATCH late data, disclosed divergence: state keeps only the
  * LATEST touch, so a purchase arriving in a later micro-batch than a
  * touch that post-dates it is credited 'direct' (the guard rejects a
  * stored touch that does not precede the purchase — it is never credited
  * to a FUTURE touch), even where batch — seeing all history — would
  * credit an older in-horizon touch the online state has since dropped.
  * Holding the full touch history per user would restore that case at
  * unbounded state cost; 'direct' is the conservative answer an online
  * bidder can live with, and within-watermark ordered delivery (the
  * normal case) attributes identically to batch.
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
          // so an older touch arriving after a newer one must lose.
          // FLOOR-second compare (not raw millis): the batch total order
          // is (floor-second, tag, event_id), so a same-second touch with
          // a higher eventId must win regardless of its sub-second millis
          if (st.forall(_.lastMs / 1000 <= sec))
            st = Some(TouchState(e.eventType, e.ts.getTime))
        } else if (e.eventType == "purchase") {
          // the credited touch must PRECEDE the purchase (floor-second,
          // like the batch window order): a late purchase arriving after
          // a newer touch already took the state must NOT be credited to
          // that future touch — it falls back to 'direct'
          val ch = st match {
            case Some(s) if s.lastMs / 1000 <= sec &&
              sec - s.lastMs / 1000 <= horizonMs / 1000 => s.channel
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

  /** Offline→online HANDOFF, batch half: distill historical events into
    * the per-user initial state [[attributeWithBootstrap]] seeds — latest
    * touch per user under the batch total order (floor-second, event_id).
    * This is how the online operator goes live without replaying the
    * archive through the stream: the backfill job computes state
    * directly (one reduce per user, no shuffle beyond the key), and the
    * streaming query starts attributing from the first post-cutoff
    * micro-batch as if it had seen all history. */
  def bootstrapState(history: Dataset[TouchEvent]): Dataset[(String, TouchState)] = {
    val spark = history.sparkSession
    import spark.implicits._
    history.filter(e => Touches.contains(e.eventType))
      .groupByKey(_.uid)
      .reduceGroups { (a: TouchEvent, b: TouchEvent) =>
        val ka = (a.ts.getTime / 1000, a.eventId)
        val kb = (b.ts.getTime / 1000, b.eventId)
        if (Ordering.Tuple2[Long, Long].gteq(ka, kb)) a else b
      }
      .map { case (uid, e) => (uid, TouchState(e.eventType, e.ts.getTime)) }
  }

  /** Offline→online HANDOFF, streaming half: [[attribute]] seeded with a
    * batch-computed initial state (Spark's `flatMapGroupsWithState`
    * initial-state overload) — purchases in the very first micro-batch
    * credit touches the STREAM never saw, because the backfill already
    * distilled them into state. Exactness contract (spec-pinned): for
    * any cutoff, `attributeWithBootstrap(post-cutoff events,
    * bootstrapState(pre-cutoff events))` equals the full-history
    * operator on post-cutoff purchases — a pre-cutoff touch is always
    * at-or-before a post-cutoff purchase, so the precede/horizon guards
    * see the same state the unbroken run would hold. Caveat: a
    * bootstrapped key that never receives traffic is not timeout-armed
    * until its first invocation, so its one-pair state outlives the
    * horizon until then (bounded by the bootstrap's user count, and the
    * first event or timeout sweep reclaims it). */
  def attributeWithBootstrap(events: Dataset[TouchEvent],
                             initial: Dataset[(String, TouchState)],
                             horizonMs: Long = DefaultHorizonMs): Dataset[Attribution] = {
    implicit val stateEnc = Encoders.product[TouchState]
    implicit val outEnc = Encoders.product[Attribution]
    implicit val keyEnc = Encoders.STRING
    val init = initial.groupByKey(_._1).mapValues(_._2)
    events
      .groupByKey(_.uid)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout, init)(update(horizonMs))
  }
}
