package graft.streaming

import scala.collection.mutable

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** ONLINE horizon-bounded funnel — the streaming mirror of
  * `Relational.eventFunnelWindowed`: per-user state is two longs (current
  * step, completion second), and each step ADVANCE is emitted the moment
  * it happens, so a dashboard reads per-step reach as a running count
  * instead of a nightly batch.
  *
  * Equivalence with the batch operator's min-recursion (step i completes
  * at the MINIMUM step-i event time within [prev, prev+horizon]): a fold
  * in time order that advances greedily IS that minimum — with one
  * subtlety at equal seconds: batch allows same-second chains
  * (signup,view,click at one second complete three steps), and an
  * in-order single pass would miss types that sort before the state was
  * ready for them. The fold therefore processes each SECOND as a unit
  * and re-scans that second's step types until no advance applies —
  * exactly the fixpoint the batch recursion computes. The batch-mode
  * equality spec asserts per-step reach counts equal outright.
  *
  * State honesty: event-time timeout evicts a user once the horizon has
  * passed since their last advance — by then NO event can advance them
  * (the window is closed), so eviction loses nothing EXCEPT that a
  * post-eviction first-step event would restart the user where the
  * all-time batch form (anchored at the global minimum first-step time)
  * would not re-admit them. Bounded state buys that edge; it is the same
  * trade every watermarked operator makes, and it is disclosed here
  * rather than papered over. */
object StreamingFunnel {

  final case class StepEvent(uid: String, ts: java.sql.Timestamp,
                             eventType: String, eventId: Long)
  final case class FunnelState(step: Int, lastSec: Long)
  final case class StepAdvance(uid: String, step: Long, at_sec: Long)

  def update(steps: IndexedSeq[String], horizonSec: Long)(
      uid: String, events: Iterator[StepEvent],
      state: GroupState[FunnelState]): Iterator[StepAdvance] = {
    val out = mutable.Buffer[StepAdvance]()
    if (state.hasTimedOut) {
      state.remove() // horizon closed: nothing can ever advance this user
    } else {
      var st = state.getOption.getOrElse(FunnelState(0, 0L))
      val bySec = events.toSeq
        .filter(e => steps.contains(e.eventType))
        .groupBy(_.ts.getTime / 1000).toSeq.sortBy(_._1)
      bySec.foreach { case (sec, evs) =>
        val types = evs.map(_.eventType).toSet
        var advanced = true
        while (advanced && st.step < steps.length) {
          val ok = types.contains(steps(st.step)) &&
            (st.step == 0 || (sec >= st.lastSec && sec <= st.lastSec + horizonSec))
          if (ok) {
            st = FunnelState(st.step + 1, sec)
            out += StepAdvance(uid, st.step.toLong, sec)
          } else advanced = false
        }
      }
      if (st.step > 0) {
        state.update(st)
        // mid-funnel: past this instant nothing can advance the user;
        // converted: nothing left to advance — either way, evict. Clamp
        // above the watermark: a batch whose events do NOT advance the
        // funnel (e.g. later activity past the horizon) would otherwise
        // re-arm a timestamp the watermark has already passed — Spark
        // rejects that and kills the query. (getCurrentWatermarkMs
        // throws in BATCH execution, where no watermark exists and no
        // clamp is needed.)
        val wm = try state.getCurrentWatermarkMs() catch { case _: Exception => Long.MinValue }
        state.setTimeoutTimestamp(math.max((st.lastSec + horizonSec + 1) * 1000, wm + 1))
      }
    }
    out.iterator
  }

  /** Input must carry a watermark on `ts` (event-time timeout contract). */
  def funnel(events: Dataset[StepEvent],
             steps: Seq[String] = graft.operators.Relational.FunnelSteps,
             horizonSec: Long = graft.operators.Relational.FunnelHorizonSec): Dataset[StepAdvance] = {
    implicit val stateEnc = Encoders.product[FunnelState]
    implicit val outEnc = Encoders.product[StepAdvance]
    implicit val keyEnc = Encoders.STRING
    events
      .groupByKey(_.uid)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(steps.toIndexedSeq, horizonSec))
  }
}
