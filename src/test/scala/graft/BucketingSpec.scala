package graft

import org.apache.spark.sql.functions._

/** Storage-layout evidence for the 100 TB co-located join story: two
  * tables bucketed on the join key join WITHOUT a shuffle exchange.
  * At scale this is how a fact ⋈ fact join (orders ⋈ customer when
  * customer outgrows broadcast) avoids re-shuffling petabytes on every
  * query — the shuffle is paid once at write time, amortized across all
  * downstream joins on that key. */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables sort-merge join with zero shuffle exchanges") {
    val orders = Tables.orders(spark, Sf0001)
    val customer = Tables.customer(spark, Sf0001)
    graft.sources.FileFormats.writeBucketed(orders, "orders_bkt", "o_custkey", 4)
    graft.sources.FileFormats.writeBucketed(customer, "customer_bkt", "c_custkey", 4)
    // force the shuffle-exposing path: no broadcast, no AQE re-planning
    val conf = spark.conf
    val prevBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("orders_bkt")
        .join(spark.table("customer_bkt"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(500))
      assert(!plan.contains("Exchange"), s"bucketed join must not shuffle:\n${plan.take(800)}")
      // and it computes the same thing as the plain join
      val expected = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() === expected)
    } finally {
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_bkt")
      spark.sql("DROP TABLE IF EXISTS customer_bkt")
    }
  }
}
