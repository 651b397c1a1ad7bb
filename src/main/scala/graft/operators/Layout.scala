package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout clustering: Morton (Z-order) interleaving for
  * multi-dimensional scan locality — the OPTIMIZE ZORDER primitive of
  * the lakehouse engines, re-expressed as plain codegen'd column
  * arithmetic plus a range-partitioned sorted write.
  *
  * Why it matters at 100 TB: parquet prunes row groups by per-column
  * min/max stats. A table sorted by ONE column prunes only on that
  * column — every file still spans the full domain of the others. A
  * Z-ordered sort interleaves the bits of two keys, so each file covers
  * a small RECTANGLE of the (a, b) domain and predicates on EITHER
  * column skip most files. The interleave is 32 shift/mask terms —
  * whole-stage-codegen'd builtin expressions, no UDF.
  *
  * Domain normalization matters as much as the interleave: raw keys of
  * different magnitudes put one dimension's bits above all of the
  * other's and degrade to a single-column sort. Both entry points
  * therefore min-max-scale each key into the full 16-bit range first
  * (integer arithmetic, so the DuckDB oracle replicates it exactly).
  * The (min, max) pair is a one-row global aggregate — at a deployment
  * it comes free from table statistics.
  */
object Layout {

  /** Morton code of two already-16-bit keys: bit i of `a` lands at
    * position 2i, bit i of `b` at 2i+1. */
  def zValue16(a: Column, b: Column): Column = {
    val am = a.bitwiseAND(lit(0xFFFFL))
    val bm = b.bitwiseAND(lit(0xFFFFL))
    (0 until 16).map { i =>
      shiftleft(shiftright(am, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bm, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Min-max scale a long key into [0, 65535] with pure integer
    * arithmetic: (x - min) * 65535 div max(span, 1). The product stays
    * far below 2^53, so the double-floor is exact and bit-stable
    * cross-engine. */
  def scale16(x: Column, minV: Column, maxV: Column): Column =
    floor(((x - minV) * lit(65535L)) / greatest(maxV - minV, lit(1L))).cast("long")

  private def dayOf(ts: Column): Column = (unix_timestamp(ts) / lit(86400L)).cast("long")

  /** Z-locality audit over orders on (custkey, order epoch-day): bucket
    * the Z-curve into `1 << (32 - shift)` segments and report each
    * non-empty bucket's row count and per-dimension bounding box. The
    * per-bucket spans being small fractions of the global domain on
    * BOTH dimensions is the pruning win a Z-ordered write banks (a
    * single-column sort leaves the off-sort dimension unprunable).
    * Output is bounded by the bucket count (≤ 1024 at the default
    * shift), never by data; the aggregation is an ordinary two-phase
    * hash agg on a derived integer key, and the (min, max) domain pair
    * rides the allowlisted 1-row broadcast shape. */
  def zorderClusterStats(orders: DataFrame, shift: Int = 22): DataFrame = {
    val base = orders.select(col("o_custkey").as("ck"), dayOf(col("o_orderdate")).as("day"))
    val dom = base.agg(
      min(col("ck")).as("ck_lo"), max(col("ck")).as("ck_hi"),
      min(col("day")).as("day_lo"), max(col("day")).as("day_hi"))
    base.crossJoin(broadcast(dom))
      .select(
        shiftright(
          zValue16(
            scale16(col("ck"), col("ck_lo"), col("ck_hi")),
            scale16(col("day"), col("day_lo"), col("day_hi"))),
          shift).as("z_bucket"),
        col("ck"), col("day"))
      .groupBy(col("z_bucket"))
      .agg(
        count(lit(1)).as("n"),
        min(col("ck")).as("ck_min"), max(col("ck")).as("ck_max"),
        min(col("day")).as("day_min"), max(col("day")).as("day_max"))
      .select(
        col("z_bucket"), col("n"),
        col("ck_min"), col("ck_max"), (col("ck_max") - col("ck_min")).as("ck_span"),
        col("day_min"), col("day_max"), (col("day_max") - col("day_min")).as("day_span"))
      .orderBy("z_bucket")
  }

  /** Z-ordered write: scale both keys to 16 bits (one tiny min/max job —
    * free from table stats at a deployment), range-partition on the
    * Morton code (sampled range boundaries — no single-task sort), sort
    * within each partition, and drop the helper column so the layout is
    * invisible to readers. Every output file then covers one compact
    * Z-range = one small (a, b) rectangle, and parquet's min/max stats
    * prune on both dimensions. */
  /** Drop a bucketed table AND its leftover warehouse location — Verify
    * runs per-SF in fresh JVMs sharing `./spark-warehouse`, and a fresh
    * in-memory catalog refuses `saveAsTable` over a location it doesn't
    * know about (the same contract as [[Dedup.dropDedupIndex]]). */
  def dropBucketedTable(spark: org.apache.spark.sql.SparkSession, table: String): Unit = {
    try spark.sql(s"DROP TABLE IF EXISTS `$table`")
    catch { case _: Throwable => () }
    try {
      val wh = new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir"))
      val loc = new org.apache.hadoop.fs.Path(wh, table.toLowerCase(java.util.Locale.ROOT))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(loc, true)
    } catch { case _: Throwable => () }
  }

  /** Co-located fact ⋈ fact join via BUCKETED layout — the shuffle-paid-
    * once-at-write-time lever for the joins broadcast can't serve (both
    * sides grow with the data). Orders and lineitem are written bucketed
    * on the order key with the SAME bucket count; the join then plans as
    * a SortMergeJoin with ZERO Exchange on either side (asserted in
    * PlanShapeSpec): each bucket pair joins locally, and at 100 TB every
    * downstream join on that key amortizes the one write-time shuffle.
    * The `merge` hint pins the sort-merge strategy at any SF so the
    * demonstrated plan is the co-located one rather than a small-scale
    * broadcast (the layout, not the planner's size estimate, is what's
    * under test); semantics are hint-invariant, which is exactly what
    * the plain-join DuckDB oracle gates. Like `dpp_quarter_revenue`, the
    * registered query prices write + join together — a deployment pays
    * the layout once per snapshot. */
  def bucketedJoinRevenue(spark: org.apache.spark.sql.SparkSession,
                          orders: DataFrame, lineitem: DataFrame,
                          buckets: Int = 8): DataFrame = {
    import graft.sources.FileFormats.writeBucketed
    val oT = "orders_bktrev"
    val lT = "lineitem_bktrev"
    dropBucketedTable(spark, oT)
    dropBucketedTable(spark, lT)
    writeBucketed(orders.select("o_orderkey", "o_orderpriority"), oT, "o_orderkey", buckets)
    writeBucketed(lineitem.select("l_orderkey", "l_extendedprice"), lT, "l_orderkey", buckets)
    spark.table(lT).hint("merge")
      .join(spark.table(oT).hint("merge"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        count(lit(1)).cast("long").as("n_items"),
        sum(expr("cast(round(l_extendedprice*100) as bigint)")).cast("long").as("revenue_cents"))
      .orderBy("o_orderpriority")
  }

  def writeZOrdered(df: DataFrame, a: Column, b: Column, path: String, nFiles: Int): Unit = {
    val r = df.agg(min(a), max(a), min(b), max(b)).head()
    val (aLo, aHi, bLo, bHi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    df.withColumn("__z", zValue16(
        scale16(a, lit(aLo), lit(aHi)), scale16(b, lit(bLo), lit(bHi))))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
