package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL front end: register the driver tables as temp views so queries can
  * be written as ANSI SQL through `spark.sql` — the query-surface the
  * reference never had (its "query" is a hard-coded topology,
  * /root/reference/.../UniqueUsersCounter.java:63-93). Catalyst plans SQL
  * and DataFrame identically, so both surfaces share every optimization.
  */
object GraftSql {

  val TableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def registerAll(spark: SparkSession, sfDir: String): Unit =
    TableNames.foreach { n =>
      val df = if (n == "events") Tables.events(spark, sfDir) else Tables.load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  /** The flagship query through the SQL surface. */
  def uuPerMinuteSql(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark, sfDir)
    spark.sql(
      """SELECT unix_timestamp(w.start) AS minute, unique_users FROM (
        |  SELECT window(ts, '1 minute') AS w, count(DISTINCT user_id) AS unique_users
        |  FROM events GROUP BY window(ts, '1 minute'))
        |ORDER BY minute""".stripMargin)
  }

  /** Explicit GROUPING SETS (the general form rollup/cube specialize) with
    * grouping_id() disambiguating aggregation level from data NULLs —
    * plans as one Expand + a single shuffle, like rollup/cube. */
  def salesGroupingSets(spark: SparkSession, sfDir: String): DataFrame = {
    registerAll(spark, sfDir)
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |       CAST(count(*) AS LONG) AS n,
        |       CAST(sum(l_quantity) AS LONG) AS sum_qty,
        |       CAST(grouping_id() AS LONG) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }
}
