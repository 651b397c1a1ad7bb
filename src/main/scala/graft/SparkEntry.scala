package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 (plus the training-data
  * pipeline extensions) has one entry in `queries`, and — when
  * SQL-expressible — an exactly-equivalent DuckDB oracle in `oracleSql`.
  * Column names and row ordering match between the two by construction;
  * floating-point aggregates are emitted as exact integer cents and window
  * keys as unix epoch seconds so results are bit-stable across engines and
  * partitionings.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's single query: distinct users per 1-minute window
    * (/root/reference/README.md:2-3). */
  def entry(spark: SparkSession): DataFrame =
    UniqueUsers.perMinute(Tables.events(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- reference-parity family (events): SURVEY.md §2 S1-S3/O1-O7 ----
    "uu_per_minute" -> ((s, d) => UniqueUsers.perMinute(Tables.events(s, d))),
    "uu_per_minute_twophase" -> ((s, d) => UniqueUsers.perMinuteTwoPhase(Tables.events(s, d))),
    "uu_per_minute_collect_set" -> ((s, d) => UniqueUsers.perMinuteCollectSet(Tables.events(s, d))),
    "uu_per_minute_approx" -> ((s, d) => UniqueUsers.perMinuteApprox(Tables.events(s, d))),
    "uu_sliding_5m_1m" -> ((s, d) => UniqueUsers.slidingDistinct(Tables.events(s, d))),
    "events_filter_project" -> ((s, d) => UniqueUsers.filterProject(Tables.events(s, d))),
    "events_json_extract" -> ((s, d) => UniqueUsers.jsonExtractStats(Tables.events(s, d))),
    "event_type_stats" -> ((s, d) => UniqueUsers.eventTypeStats(Tables.events(s, d))),
    // ---- relational coverage (SURVEY.md §2 category checklist) ----
    "q1_pricing_summary" -> ((s, d) => Relational.pricingSummary(Tables.lineitem(s, d))),
    "q3_top_orders" -> ((s, d) =>
      Relational.topOrders(Tables.customer(s, d), Tables.orders(s, d), Tables.lineitem(s, d))),
    "q5_nation_revenue" -> ((s, d) =>
      Relational.nationRevenue(Tables.region(s, d), Tables.nation(s, d), Tables.customer(s, d),
        Tables.orders(s, d), Tables.lineitem(s, d), Tables.supplier(s, d))),
    "top100_items" -> ((s, d) => Relational.topItems(Tables.lineitem(s, d))),
    "customers_topn_per_segment" -> ((s, d) => Relational.topCustomersPerSegment(Tables.customer(s, d))),
    "semi_join_customers" -> ((s, d) =>
      Relational.customersWithOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "anti_join_customers" -> ((s, d) =>
      Relational.customersWithoutOrders(Tables.customer(s, d), Tables.orders(s, d))),
    "custkeys_intersect" -> ((s, d) =>
      Relational.keyIntersect(Tables.customer(s, d), Tables.orders(s, d))),
    "custkeys_except" -> ((s, d) =>
      Relational.keyExcept(Tables.customer(s, d), Tables.orders(s, d))),
    "sales_rollup" -> ((s, d) => Relational.salesRollup(Tables.lineitem(s, d))),
    "orders_enriched" -> ((s, d) => Relational.ordersEnriched(Tables.orders(s, d), Tables.customer(s, d))),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "uu_per_minute" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "uu_per_minute_twophase" ->
      """SELECT minute, CAST(count(*) AS BIGINT) AS unique_users
        |FROM (SELECT DISTINCT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute, user_id FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "uu_per_minute_collect_set" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) AS minute,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    // uu_per_minute_approx: HLL sketch — intentionally no SQL oracle (rows-only check).
    "uu_sliding_5m_1m" ->
      """SELECT CAST(epoch(date_trunc('minute', ts)) AS BIGINT) - 60*k AS window_start,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS unique_users
        |FROM events, range(5) t(k) GROUP BY 1 ORDER BY 1""".stripMargin,
    "events_filter_project" ->
      """SELECT event_id, user_id, CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS ts_sec
        |FROM events WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,
    "events_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |       CAST(min(k) AS BIGINT) AS min_k, CAST(max(k) AS BIGINT) AS max_k
        |FROM (SELECT event_type, TRY_CAST(regexp_extract(props, '"k":\s*(-?\d+)', 1) AS BIGINT) AS k FROM events)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "event_type_stats" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS users,
        |       CAST(sum(round(value*100)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |       CAST(sum(round(l_extendedprice*100)) AS BIGINT) AS sum_base_cents,
        |       CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS sum_disc_cents,
        |       CAST(sum(round(l_extendedprice*(1-l_discount)*(1+l_tax)*100)) AS BIGINT) AS sum_charge_cents,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q3_top_orders" ->
      """SELECT l_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS o_orderdate_sec,
        |       CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1,2 ORDER BY revenue_cents DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_nation_revenue" ->
      """SELECT n_name,
        |       CAST(sum(round(l_extendedprice*(1-l_discount)*100)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "top100_items" ->
      """SELECT l_orderkey, l_linenumber, CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents
        |FROM lineitem ORDER BY price_cents DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "customers_topn_per_segment" ->
      """SELECT c_mktsegment, c_custkey, acctbal_cents, rk FROM (
        |  SELECT c_mktsegment, c_custkey, CAST(round(c_acctbal*100) AS BIGINT) AS acctbal_cents,
        |         row_number() OVER (PARTITION BY c_mktsegment ORDER BY round(c_acctbal*100) DESC, c_custkey) AS rk
        |  FROM customer)
        |WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin,
    "semi_join_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "anti_join_customers" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "custkeys_intersect" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
        |INTERSECT
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 1000
        |ORDER BY k""".stripMargin,
    "custkeys_except" ->
      """SELECT c_custkey AS k FROM customer WHERE c_acctbal > 0
        |EXCEPT
        |SELECT o_custkey AS k FROM orders WHERE o_totalprice > 1000
        |ORDER BY k""".stripMargin,
    "sales_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "orders_enriched" ->
      """SELECT o_orderkey, o_custkey, c_mktsegment,
        |       CAST(round(o_totalprice*100) AS BIGINT) AS totalprice_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey""".stripMargin,
  )
}
