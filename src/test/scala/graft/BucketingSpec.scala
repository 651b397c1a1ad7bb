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

  import graft.sources.FileFormats

  private def bucketFiles(table: String): Map[String, Long] = {
    val loc = FileFormats.tableLocation(spark, table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(loc).filter(_.isFile)
      .filter(st => FileFormats.bucketIdOfFile(st.getPath.getName).isDefined)
      .map(st => st.getPath.getName -> st.getLen).toMap
  }

  test("bucketIdCol matches the bucketed writer's actual file placement") {
    import spark.implicits._
    val df = (1L to 500L).map(i => (i, s"v$i")).toDF("k", "v")
    FileFormats.writeBucketed(df, "bkt_parity", "k", 8)
    try {
      val loc = FileFormats.tableLocation(spark, "bkt_parity")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val checked = fs.listStatus(loc).filter(_.isFile).flatMap { st =>
        FileFormats.bucketIdOfFile(st.getPath.getName).map { b =>
          val inFile = spark.read.schema(df.schema).parquet(st.getPath.toString)
            .select(FileFormats.bucketIdCol(col("k"), 8).as("b")).distinct()
            .collect().map(_.getInt(0)).toSet
          (b, inFile)
        }
      }
      assert(checked.nonEmpty)
      for ((fileBucket, computed) <- checked)
        assert(computed === Set(fileBucket),
          s"pmod(hash(k), 8) must equal the writer's bucket id $fileBucket, got $computed")
    } finally spark.sql("DROP TABLE IF EXISTS bkt_parity")
  }

  test("writeBucketedSwapPartial rewrites only touched buckets; the rest MOVE byte-identically") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, s"v$i")).toDF("k", "v")
    FileFormats.writeBucketed(df, "bkt_partial", "k", 8)
    try {
      val before = bucketFiles("bkt_partial")
      // doom two keys → at most two affected buckets
      val doomed = Seq(7L, 13L)
      val affected = df.filter(col("k").isin(doomed: _*))
        .select(FileFormats.bucketIdCol(col("k"), 8).as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      assert(affected.size < 8, "test premise: the doomed keys must not touch every bucket")
      val newContent = FileFormats.readBuckets(spark, "bkt_partial", affected)
        .filter(!col("k").isin(doomed: _*))
      FileFormats.writeBucketedSwapPartial(newContent, "bkt_partial", "k", 8, affected)
      val after = bucketFiles("bkt_partial")
      // contents: doomed rows gone, everything else intact
      val remaining = spark.table("bkt_partial").select("k").as[Long].collect().toSet
      assert(remaining === (1L to 2000L).toSet -- doomed)
      // files: untouched buckets carry the ORIGINAL file names and sizes
      // (a move, not a rewrite); touched buckets were rewritten
      val untouchedBefore = before.filter { case (n, _) =>
        FileFormats.bucketIdOfFile(n).exists(b => !affected.contains(b)) }
      val untouchedAfter = after.filter { case (n, _) =>
        FileFormats.bucketIdOfFile(n).exists(b => !affected.contains(b)) }
      assert(untouchedAfter === untouchedBefore,
        "untouched buckets' files must be moved verbatim, never rewritten")
      val touchedAfter = after.keySet -- untouchedAfter.keySet
      assert(touchedAfter.nonEmpty && (touchedAfter & before.keySet).isEmpty,
        "touched buckets must be fresh files")
      // the table keeps its bucket spec: still joins exchange-free
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier("bkt_partial"))
      assert(meta.bucketSpec.exists(_.numBuckets == 8))
    } finally spark.sql("DROP TABLE IF EXISTS bkt_partial")
  }

  test("healTornSwap resumes a partial swap FORWARD from its marker (crash in the move window)") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, s"v$i")).toDF("k", "v")
    FileFormats.writeBucketed(df, "bkt_torn", "k", 8)
    try {
      // build the torn state by hand, exactly as a crash between the two
      // renames would leave it: staged table complete (bucket 0 rewritten
      // to drop k=16), marker present, live table renamed to __old
      val affected = Set(df.filter(col("k") === 16L)
        .select(FileFormats.bucketIdCol(col("k"), 8)).head().getInt(0))
      val newContent = FileFormats.readBuckets(spark, "bkt_torn", affected)
        .filter(col("k") =!= 16L)
      FileFormats.writeBucketed(newContent, "bkt_torn__staged", "k", 8)
      val stagedLoc = FileFormats.tableLocation(spark, "bkt_torn__staged")
      val fs = stagedLoc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(new org.apache.hadoop.fs.Path(stagedLoc, FileFormats.PartialMarker), true)
      out.write(affected.mkString(",").getBytes("UTF-8")); out.close()
      spark.sql("ALTER TABLE `bkt_torn` RENAME TO `bkt_torn__old`")
      // …crash here. The next verb entry heals forward:
      FileFormats.healTornSwap(spark, "bkt_torn")
      assert(spark.catalog.tableExists("bkt_torn"))
      assert(!spark.catalog.tableExists("bkt_torn__old") &&
        !spark.catalog.tableExists("bkt_torn__staged"))
      val remaining = spark.table("bkt_torn").select("k").as[Long].collect().toSet
      assert(remaining === (1L to 1000L).toSet - 16L,
        "the healed table must carry the staged rewrite plus every untouched bucket")
    } finally Seq("bkt_torn", "bkt_torn__old", "bkt_torn__staged")
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }
}
