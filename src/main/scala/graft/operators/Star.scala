package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Star-schema fact layout + DYNAMIC PARTITION PRUNING — the single
  * biggest real-cluster scan lever at 100 TB: a fact table written
  * partitioned by a date key, scanned through a dim-side filter the
  * optimizer turns into a RUNTIME partition filter. Static pruning
  * (`WHERE month_key = 199604`) is free; the production query never
  * looks like that — it filters a DIMENSION (`dim_date.quarter = 2`),
  * and without DPP the fact scan reads every partition and throws 95%
  * of the I/O away after the join. With DPP, Catalyst plants a
  * `dynamicpruningexpression(month_key IN <dim subquery>)` into the
  * scan's PartitionFilters — reusing the dim's broadcast exchange, so
  * the pruning costs nothing beyond the join's own broadcast — and a
  * 7-year fact table reads 3 months of files. PlanShapeSpec asserts the
  * dynamic filter is present; the oracle recomputes the same quarter
  * from the unpartitioned facts, so the pruned scan is also hash-gated
  * to lose no rows.
  *
  * The reference has no disk layout at all (its only scan is a Kafka
  * topic subscribe, `UniqueUsersCounter.java:63`); this is the batch
  * engine's counterpart of "only read the offsets you need".
  */
object Star {

  /** Calendar month dimension covering the testdata order domain —
    * generated, not scanned (a real warehouse materializes exactly this
    * table once). month_key = year*100+month as INT to match the
    * inferred type of the fact's partition directory values: an equal
    * join with no cast on the fact side is what lets the optimizer
    * push the dynamic filter into the partition scan. */
  def monthDim(spark: SparkSession, startYear: Int = 1995, endYear: Int = 2001): DataFrame =
    spark.range(0, (endYear - startYear + 1) * 12L)
      .select(
        (expr("id div 12") + startYear).as("year"),
        (expr("id % 12") + 1).as("month"))
      .select(
        (col("year") * 100 + col("month")).cast("int").as("month_key"),
        col("year").cast("long").as("year"),
        expr("(month + 2) div 3").cast("long").as("quarter"))

  /** Write orders as a month-partitioned parquet tree — one directory
    * per order month (`month_key=199604/…`), the layout every
    * date-filtered scan and every DPP join prunes against. ~84
    * directories per 7-year domain: partition count scales with the
    * TIME DOMAIN, not row count, so the tree stays listable at 100 TB
    * (per-partition file counts are what grow, and writers control
    * those). */
  def writeMonthPartitionedOrders(orders: DataFrame, path: String): Unit =
    orders
      .withColumn("month_key",
        (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("int"))
      // repartition ON the partition column first: each month lands whole
      // in one task, so the tree gets one file per directory instead of
      // (writer tasks × months) shards — the same writer discipline as
      // the shard exporter. At 100 TB raise the width per month by
      // repartitioning on (month_key, salt); the layout contract is
      // "file count scales with data per month", never with writer count
      .repartition(col("month_key"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("month_key")
      .parquet(path)

  /** Quarterly revenue via the star join: month-partitioned fact ⋈
    * broadcast month-dim filtered to one (year, quarter). The join key
    * IS the partition column, so DPP rewrites the fact scan to read
    * only the quarter's three directories — asserted in PlanShapeSpec
    * (`dynamicpruningexpression` in PartitionFilters). Result is the
    * plain join's, bit-for-bit: pruning is a scan optimization, never a
    * semantics change, which is exactly what the DuckDB oracle gates. */
  def dppQuarterRevenue(spark: SparkSession, factPath: String,
                        yearFilter: Int = 1996, quarterFilter: Int = 2): DataFrame = {
    val fact = spark.read.parquet(factPath)
    val dim = monthDim(spark)
      .filter(col("year") === yearFilter && col("quarter") === quarterFilter)
    fact.join(broadcast(dim), "month_key")
      .groupBy(col("month_key"))
      .agg(
        count(lit(1)).cast("long").as("n_orders"),
        sum(expr("cast(round(o_totalprice*100) as bigint)")).cast("long").as("revenue_cents"))
      .select(col("month_key").cast("long").as("month_key"),
        col("n_orders"), col("revenue_cents"))
      .orderBy("month_key")
  }

  /** Runtime Bloom-filter join pruning — DPP's row-level cousin, and the
    * scan lever when the join key is NOT the partition column (so DPP
    * cannot fire): the optimizer aggregates a Bloom filter over the
    * FILTERED dim side's join keys and injects `might_contain` into the
    * fact scan, so ~4/5 of orders rows are dropped at the reader instead
    * of riding the shuffle to be discarded by the join.
    *
    * Runs in its OWN child session (`newSession`: shared context,
    * private SQLConf) because the injection preconditions are conf-
    * gated: broadcast joins are disabled to reproduce the 100 TB plan
    * locally — at scale an SF-grown customer table exceeds any
    * broadcast threshold and the join shuffles, which is exactly when
    * the Bloom filter pays; the scan-size threshold is zeroed because
    * the local fact file is far below the 10 GiB production default.
    * Result-invariant by construction (a Bloom filter only SKIPS rows
    * the join would reject — false positives just ride to the join);
    * the DuckDB oracle is the plain join, and PlanShapeSpec asserts
    * `bloom_filter_agg`/`might_contain` in the executed plan. */
  // WEAK keys: a strong parent->child map would pin every parent
  // session's full SessionState for the life of the process; with weak
  // keys the entry (and the child's state) goes when the parent does.
  // The child holds context/sharedState but no reference back to the
  // parent session object, so the entry stays collectable.
  private val bloomSessions =
    new java.util.WeakHashMap[SparkSession, SparkSession]()

  private def bloomSessionFor(parent: SparkSession): SparkSession =
    bloomSessions.synchronized {
      Option(bloomSessions.get(parent)).getOrElse {
        val child = parent.newSession()
        child.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        child.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        child.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
        child.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        bloomSessions.put(parent, child)
        child
      }
    }

  def bloomSegmentRevenue(spark: SparkSession, sfDir: String,
                          segment: String = "BUILDING"): DataFrame = {
    // ONE memoized child session per parent: repeated invocations
    // (bench loops, the corpus-wide plan lint) must not each build a
    // fresh SessionState that stays referenced through plan lineage
    val s2 = bloomSessionFor(spark)
    val fact = graft.Tables.orders(s2, sfDir)
    val dim = graft.Tables.customer(s2, sfDir).filter(col("c_mktsegment") === segment)
    fact.join(dim, col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("order_year"))
      .agg(
        count(lit(1)).cast("long").as("n_orders"),
        sum(expr("cast(round(o_totalprice*100) as bigint)")).cast("long").as("revenue_cents"))
      .orderBy("order_year")
  }
}
