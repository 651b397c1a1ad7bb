package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingFunnel
import graft.streaming.StreamingFunnel.{StepAdvance, StepEvent}

/** Online horizon-bounded funnel: per-advance emission, bounded state,
  * and per-step equality with the batch eventFunnelWindowed counts. */
class StreamingFunnelSpec extends SparkSpec {

  import spark.implicits._

  private val t0 = 1700000000L * 1000 // ms

  private def ev(uid: String, offSec: Long, tpe: String, id: Long) =
    StepEvent(uid, new Timestamp(t0 + offSec * 1000), tpe, id)

  test("advances emit per step, same-second chains complete, horizon blocks stale steps") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StepEvent]
    val q = StreamingFunnel.funnel(in.toDS().withWatermark("ts", "5 seconds"))
      .writeStream.format("memory").queryName("fun1").outputMode("append").start()
    try {
      in.addData(
        // u1: signup, view, click all at ONE second — three steps at once
        ev("u1", 0, "signup", 1), ev("u1", 0, "view", 2), ev("u1", 0, "click", 3),
        // u2: signup now; the view arrives a batch later, in horizon
        ev("u2", 0, "signup", 4),
        // u3: view before any signup — no advance at all
        ev("u3", 0, "view", 5))
      q.processAllAvailable()
      in.addData(
        ev("u1", 600, "purchase", 6),     // completes u1's funnel
        ev("u2", 86400, "view", 7),       // exactly at the horizon: counts
        ev("u3", 90000, "signup", 8))     // u3 finally signs up (step 1 only)
      q.processAllAvailable()
      val got = spark.table("fun1").as[StepAdvance].collect().toSet
      assert(got === Set(
        StepAdvance("u1", 1, t0 / 1000), StepAdvance("u1", 2, t0 / 1000),
        StepAdvance("u1", 3, t0 / 1000), StepAdvance("u1", 4, t0 / 1000 + 600),
        StepAdvance("u2", 1, t0 / 1000), StepAdvance("u2", 2, t0 / 1000 + 86400),
        StepAdvance("u3", 1, t0 / 1000 + 90000)))
    } finally q.stop()
  }

  test("rolled up per step, the online funnel equals the batch eventFunnelWindowed on real events") {
    val events = Tables.events(spark, Sf0001)
    val typed = events.select(
        col("user_id").cast("string").as("uid"), col("ts"),
        col("event_type").as("eventType"), col("event_id").as("eventId"))
      .as[StepEvent]
    val online = StreamingFunnel.funnel(typed) // batch execution: full history per key
      .groupBy(col("step")).agg(count(lit(1)).as("n_users"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = graft.operators.Relational.eventFunnelWindowed(events)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // batch reports every step (0 allowed); online emits only reached steps
    batch.foreach { case (step, n) =>
      assert(online.getOrElse(step, 0L) === n, s"step $step")
    }
  }
}
