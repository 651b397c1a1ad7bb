package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Audit, UniqueUsers}

/** Data-contract audit, robust rate-anomaly, and sketch-rollup behavior. */
class AuditSpec extends SparkSpec {

  import spark.implicits._

  test("observe(): audit metrics ride the main query's single scan and match a separate audit pass") {
    val orders = Tables.orders(spark, Sf0001)
    val got = Audit.observedOrderAudit(orders).head()
    // the observed numbers equal a dedicated audit scan's
    val expect = orders.agg(
      count(lit(1)), sum(when(col("o_custkey").isNull, 1L).otherwise(0L)),
      sum(expr("cast(round(o_totalprice*100) as bigint)"))).head()
    assert(got.getLong(1) === expect.getLong(0))
    assert(got.getLong(2) === expect.getLong(1))
    assert(got.getLong(3) === expect.getLong(2))
    // and they were collected IN the main plan: CollectMetrics present,
    // exactly one file scan — no second audit pass
    val obs = org.apache.spark.sql.Observation()
    val observed = orders.observe(obs, count(lit(1)).as("n"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)))
    val plan = observed.queryExecution.executedPlan.toString
    assert(plan.contains("CollectMetrics"), plan.take(500))
    assert("FileScan|BatchScan".r.findAllIn(plan).length === 1,
      s"observe must not add a scan:\n${plan.take(1200)}")
  }

  test("expectations report the planted violations and nothing else") {
    val customer = Seq((1L, "a"), (2L, "b"), (2L, "b2")) // dup pk
      .toDF("c_custkey", "name")
    val orders = Seq((10L, 1L, 5.0), (11L, 9L, 7.0), (12L, 2L, 0.0)) // orphan fk + nonpositive price
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val lineitem = Seq((10L, 0.05), (99L, 1.5)) // orphan fk + discount out of range
      .toDF("l_orderkey", "l_discount")
    val events = Seq(
      (1L, Some(5L)), (2L, None) // null user
    ).toDF("event_id", "user_id")
    val documents = Seq(("d1", "abc", 3L), ("d2", "abcd", 3L)) // n_chars drift
      .toDF("doc_id", "text", "n_chars")

    val got = Audit.expectations(customer, orders, lineitem, events, documents)
      .collect()
      .map { case Row(c: String, n: Long, b: Long, ok: Long) => (c, n, b, ok) }
      .toSeq
    assert(got === Seq(
      ("customer_pk_unique", 3L, 1L, 0L),
      ("documents_nchars_consistent", 2L, 1L, 0L),
      ("events_user_nonnull", 2L, 1L, 0L),
      ("lineitem_discount_range", 2L, 1L, 0L),
      ("lineitem_orderkey_fk", 2L, 1L, 0L),
      ("orders_custkey_fk", 3L, 1L, 0L),
      ("orders_totalprice_positive", 3L, 1L, 0L)))
  }

  test("rate anomaly flags the spike hour and only it; MAD is integer-exact") {
    // type A: hourly counts 10,10,10,10,100 -> med2=20, devs 0×4 and 180
    // -> mad4=0 (degenerate: any deviation flags) -> only the spike flags.
    // type B: counts 5,7,9 -> med2=14, dev2 4,0,4 -> mad4=8; rule
    // 2*dev2 > 3*mad4 = 24 -> none flag.
    val rows =
      (0 until 4).flatMap(h => (0 until 10).map(i => ("A", h, i))) ++
        (0 until 100).map(i => ("A", 4, i)) ++
        (0 until 5).map(i => ("B", 0, i)) ++
        (0 until 7).map(i => ("B", 1, i)) ++
        (0 until 9).map(i => ("B", 2, i))
    val ev = rows.toDF("event_type", "h", "i")
      .selectExpr("event_type",
        "CAST('2024-01-01 00:00:00' AS TIMESTAMP) + make_interval(0,0,0,0,h,0,0) AS ts")
    val got = Audit.eventRateAnomaly(ev).collect()
      .map { case Row(t: String, h: Long, n: Long, m2: Long, m4: Long, d2: Long, s: Long) =>
        (t, h, n, m2, m4, d2, s) }
    val spikes = got.filter(_._7 == 1L).toSeq
    assert(spikes.map(r => (r._1, r._3)) === Seq(("A", 100L)))
    val b = got.filter(_._1 == "B").toSeq
    assert(b.map(_._4).distinct === Seq(14L) && b.map(_._5).distinct === Seq(8L))
    assert(b.map(_._6).sorted === Seq(0L, 4L, 4L))
  }

  test("transition matrix: lead ordering (ts, event_id), row shares sum to ~1e6 ppm") {
    // user 1: A -> B -> A ; user 2: A -> B (same ts: event_id breaks the tie)
    val ev = Seq(
      (1L, 1L, "A", "2024-01-01 00:00:00"),
      (2L, 1L, "B", "2024-01-01 00:01:00"),
      (3L, 1L, "A", "2024-01-01 00:02:00"),
      (4L, 2L, "A", "2024-01-01 00:00:00"),
      (5L, 2L, "B", "2024-01-01 00:00:00")
    ).toDF("event_id", "user_id", "event_type", "s")
      .selectExpr("event_id", "user_id", "event_type", "CAST(s AS TIMESTAMP) AS ts")
    val got = graft.operators.Relational.eventTransitionMatrix(ev).collect()
      .map { case Row(f: String, t: String, n: Long, p: Long) => (f, t, n, p) }
    assert(got.toSeq === Seq(
      ("A", "B", 2L, 1000000L),
      ("B", "A", 1L, 1000000L)))
  }

  test("audience overlap: exact anchors and sketch verdicts on known sets") {
    // A users {1..10}, B users {6..15} -> |A∩B| = 5; C disjoint {100..104}
    val ev = ((1 to 10).map(u => ("A", u.toLong)) ++
      (6 to 15).map(u => ("B", u.toLong)) ++
      (100 to 104).map(u => ("C", u.toLong)))
      .toDF("event_type", "user_id")
    val got = graft.operators.UniqueUsers.audienceOverlapCheck(ev).collect()
      .map { case Row(a: String, b: String, n: Long, ok: Long) => ((a, b), (n, ok)) }
      .toMap
    assert(got(("A", "B")) === ((5L, 1L)))
    // fully disjoint pairs never materialize an exact row (inner join) —
    // the report covers overlapping pairs only, by construction
    assert(!got.contains(("A", "C")) && !got.contains(("B", "C")))
  }

  test("hourly HLL sketches unioned to days stay within the gated bound") {
    val ev = Tables.events(spark, Sf0001)
    val bad = UniqueUsers.dailySketchCheck(ev)
      .filter(col("within_bound") === 0L).count()
    assert(bad === 0L)
    // the union is over hours: n_hours per day must match the raw hour count
    val hoursFromRollup = UniqueUsers.dailySketchRollup(ev)
      .agg(sum("n_hours")).as[Long].head()
    val rawHours = ev.select(date_trunc("hour", col("ts"))).distinct().count()
    assert(hoursFromRollup === rawHours)
  }

  private def dailyOrders(xs: Seq[Double]) =
    xs.zipWithIndex.map { case (v, i) =>
      (i.toLong, 1L, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 1).plusDays(i).atStartOfDay()), v)
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")

  test("CUSUM flags a sustained level shift the per-point spike rule never sees") {
    // 14 baseline days at 100, then a +80% shift for 7 days: every single
    // day is unremarkable on its own; the accumulated drift is not
    val orders = dailyOrders(Seq.fill(14)(100.0) ++ Seq.fill(7)(180.0))
    val got = Audit.dailyRevenueCusum(orders).collect()
      .map(r => (r.getLong(4), r.getLong(5))) // (cusum2, is_drift)
    assert(got.take(14).forall(_ == ((0L, 0L))))  // baseline: zero accumulation
    assert(got.drop(14).forall(_._2 === 1L))      // every shifted day flagged
    // the accumulator grows monotonically through the shift
    val drift = got.drop(14).map(_._1)
    assert(drift.zip(drift.tail).forall { case (a, b) => b > a })
  }

  test("forecast backtest: a weekly-periodic series gives seasonal-naive zero WAPE, naive pays") {
    val orders = dailyOrders(Seq(10, 20, 30, 40, 50, 60, 70, 10, 20).map(_.toDouble))
    val got = Audit.revenueForecastEval(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("seasonal_naive") === ((2L, 0L, 0L)))      // perfect on the repeat
    assert(got("naive") === ((8L, 13000L, 433L)))         // pays the day-to-day swing
  }

  test("forecast backtest stays CALENDAR-aligned across a gap in the daily series") {
    // days 0..6, then day 7 missing, then day 8 repeating day 1's value:
    // the calendar self-join scores day 8 against day 1 (error 0); a
    // row-based lag(7) would silently slide to day 0 and report error
    val base = Seq(10, 20, 30, 40, 50, 60, 70).map(_.toDouble)
    val orders = dailyOrders(base).unionByName(
      Seq((100L, 1L, java.sql.Timestamp.valueOf(
        java.time.LocalDate.of(2024, 1, 9).atStartOfDay()), 20.0))
        .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"))
    val got = Audit.revenueForecastEval(orders).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got("seasonal_naive") === ((1L, 0L, 0L)))
  }

  test("k-anonymity histogram: planted group sizes, negative-balance banding, k gate") {
    // groups: size 3 (nation 1/A/band 0), size 5 (nation 3/C/band 2),
    // two singletons — one via a NEGATIVE balance (floor(-50/1000) = -1,
    // not 0: a truncate-toward-zero banding would merge it into band 0)
    val customer = (
      Seq((1L, 1, "A", 100.0), (2L, 1, "A", 200.0), (3L, 1, "A", 900.0)) ++
      (10L to 14L).map(i => (i, 3, "C", 2000.0 + 100 * i)) ++
      Seq((20L, 2, "B", 1500.0), (21L, 4, "D", -50.0))
    ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val got = Audit.kAnonymityRisk(customer).collect()
      .map { case Row(s: Long, g: Long, r: Long, a: Long) => (s, g, r, a) }
    assert(got.toSeq === Seq((1L, 2L, 2L, 1L), (3L, 1L, 3L, 1L), (5L, 1L, 5L, 0L)))
  }
}
