package graft

import org.apache.spark.sql.Row

import graft.operators.UniqueUsers

/** Flagship-family correctness against an independent in-Scala oracle
  * (collections, not Spark) over the real sf0.001 fixture. */
class UniqueUsersSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, Sf0001)

  private lazy val raw: Seq[(Long, Long)] = // (epoch_sec, user_id)
    events.select("ts", "user_id").collect().toSeq
      .map(r => (r.getTimestamp(0).getTime / 1000L, r.getLong(1)))

  test("perMinute matches a collections-based distinct count") {
    val expected = raw.groupBy { case (sec, _) => sec / 60 * 60 }
      .view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    val got = UniqueUsers.perMinute(events).collect()
      .map { case Row(m: Long, n: Long) => m -> n }.toMap
    assert(got === expected)
  }

  test("all exact variants agree; approx within 5%") {
    val exact = UniqueUsers.perMinute(events).collect().map { case Row(m: Long, n: Long) => m -> n }.toMap
    val two = UniqueUsers.perMinuteTwoPhase(events).collect().map { case Row(m: Long, n: Long) => m -> n }.toMap
    val cs = UniqueUsers.perMinuteCollectSet(events).collect().map { case Row(m: Long, n: Long) => m -> n }.toMap
    assert(two === exact)
    assert(cs === exact)
    val approx = UniqueUsers.perMinuteApprox(events).collect().map { case Row(m: Long, n: Long) => m -> n }.toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (m, n) =>
      assert(math.abs(n - exact(m)) <= math.max(1L, (exact(m) * 0.05).toLong), s"window $m")
    }
  }

  test("perMinuteApproxCheck: every window verdict is 1 and the gate genuinely bites") {
    val rows = UniqueUsers.perMinuteApproxCheck(events).collect()
      .map { case Row(m: Long, e: Long, w: Long) => (m, e, w) }
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 === 1L), "rsd=0.01 sketch must sit inside the 5% gate")
    // the exact anchor matches the exact operator (the oracle's anchor)
    val exact = UniqueUsers.perMinute(events).collect().map { case Row(m: Long, n: Long) => m -> n }.toMap
    rows.foreach { case (m, e, _) => assert(e === exact(m)) }
  }

  test("userCountCmsCheck: sketch never underestimates and honors the eps bound on top-k keys") {
    val rows = UniqueUsers.userCountCmsCheck(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 === 1L), "CMS structurally never underestimates")
    assert(rows.forall(_._4 === 1L), "CMS estimate must stay within ceil(eps*N) of exact")
    // the sketch is seeded: a second build yields identical verdicts
    val again = UniqueUsers.userCountCmsCheck(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq === again.toSeq)
  }

  test("sliding windows cover each event 5 times") {
    val rows = UniqueUsers.slidingDistinct(events).collect()
    val expectedWindows = raw.flatMap { case (sec, _) =>
      val base = sec / 60 * 60
      (0 until 5).map(k => base - 60L * k)
    }.distinct.size
    assert(rows.length === expectedWindows)
    // every tumbling-window count is <= its covering sliding-window count
    val slide = rows.map { case Row(w: Long, n: Long) => w -> n }.toMap
    UniqueUsers.perMinute(events).collect().foreach { case Row(m: Long, n: Long) =>
      assert(slide(m) >= n)
    }
  }

  test("window boundary: events at exact minute edges land in one window only") {
    import spark.implicits._
    val df = Seq(
      ("u1", "2024-01-01 00:00:00"),
      ("u2", "2024-01-01 00:00:59.999"),
      ("u3", "2024-01-01 00:01:00")
    ).toDF("user_id", "s").selectExpr("user_id", "CAST(s AS TIMESTAMP) AS ts")
    val got = UniqueUsers.perMinute(df).collect().map { case Row(m: Long, n: Long) => m -> n }.toMap
    assert(got === Map(1704067200L -> 2L, 1704067260L -> 1L))
  }
}
