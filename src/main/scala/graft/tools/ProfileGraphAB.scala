package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** A/B harness for pagerank build variants (scratch measurement tool).
  * Variant A = the PRE-round-13 shape (pinned pair set + two staged
  * persists). Variant B = single persist (degree aggregate and
  * back-join consume the SAME repartition exchange). Variant C =
  * 2-col edge cache + per-round node-side contribution join (measured
  * WORSE — extra per-round query stage). Variant D = B's loop + the
  * explode both-directions edge build with no pair pin — the shape
  * ADOPTED as production in Graph.pagerank (won every rep).
  * `runMain graft.tools.ProfileGraphAB <sfDir> [reps]`. */
object ProfileGraphAB {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[ab] $name%-14s ${(System.nanoTime() - t0) / 1e9}%7.3f s  (rows=$n)")
    }

    def pairsOf(): DataFrame = {
      val orders = graft.Tables.orders(spark, sfDir)
      val lineitem = graft.Tables.lineitem(spark, sfDir)
      orders.select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
        .localCheckpoint()
    }

    def loop(withDeg: DataFrame): Long = {
      var pr = withDeg.select(col("src").as("node")).distinct()
        .withColumn("pr", lit(1000000L))
      for (i <- 1 to 5) {
        pr = withDeg.join(pr, col("src") === col("node"))
          .groupBy(col("dst"))
          .agg(sum(expr("pr div outdeg")).as("in_mass"))
          .select(col("dst").as("node"),
            (lit(150000L) + expr("(85 * in_mass) div 100")).as("pr"))
        if (i % 2 == 0 || i == 5) pr = pr.localCheckpoint()
      }
      val n = pr.orderBy(col("pr").desc, col("node")).limit(100).count()
      withDeg.unpersist()
      n
    }

    def variantA(): Long = {
      val pairs = pairsOf()
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
      val edgesP = edges.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
      val deg = edgesP.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val withDeg = edgesP.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
      withDeg.count()
      edgesP.unpersist()
      loop(withDeg)
    }

    def variantB(): Long = {
      val pairs = pairsOf()
      val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
        .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
        .repartition(col("src"))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val withDeg = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
      withDeg.count()
      loop(withDeg)
    }

    // Variant C: 2-col edge cache, degree table pinned separately,
    // per-round contribution precomputed node-side; both edge directions
    // from one explode pass (no pairs pin, no union double-scan).
    def variantC(): Long = {
      val orders = graft.Tables.orders(spark, sfDir)
      val lineitem = graft.Tables.lineitem(spark, sfDir)
      val edges = orders.select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
        .select(explode(array(
          struct(col("c").as("src"), col("s").as("dst")),
          struct(col("s").as("src"), col("c").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .repartition(col("src"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .localCheckpoint() // node-sized; also materializes the edge cache
      var pr = deg.select(col("src").as("node")).withColumn("pr", lit(1000000L))
      for (i <- 1 to 5) {
        val contrib = pr.join(deg, col("node") === col("src"))
          .select(col("node"), expr("pr div outdeg").as("contrib"))
        pr = edges.join(contrib, edges("src") === contrib("node"))
          .groupBy(col("dst"))
          .agg(sum(col("contrib")).as("in_mass"))
          .select(col("dst").as("node"),
            (lit(150000L) + expr("(85 * in_mass) div 100")).as("pr"))
        if (i % 2 == 0 || i == 5) pr = pr.localCheckpoint()
      }
      val n = pr.orderBy(col("pr").desc, col("node")).limit(100).count()
      edges.unpersist()
      n
    }

    // Variant D: B's loop shape (single withDeg cache) + edges derived in
    // ONE pass via explode — pairs appears once in the plan, so its
    // localCheckpoint pin (a full write+read of the pair set) is dropped.
    def variantD(): Long = {
      val orders = graft.Tables.orders(spark, sfDir)
      val lineitem = graft.Tables.lineitem(spark, sfDir)
      val edges = orders.select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
        .distinct()
        .select(explode(array(
          struct(col("c").as("src"), col("s").as("dst")),
          struct(col("s").as("src"), col("c").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
        .repartition(col("src"))
      val deg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val withDeg = edges.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
      withDeg.count()
      loop(withDeg)
    }

    // untimed warmup
    variantA(); spark.catalog.clearCache()
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    for (r <- 1 to reps) {
      graft.Bench.awaitQuietHost(cpus, "ab")
      t(s"B_rep$r")(variantB()); spark.catalog.clearCache()
      graft.Bench.awaitQuietHost(cpus, "ab")
      t(s"D_rep$r")(variantD()); spark.catalog.clearCache()
    }
    spark.stop()
  }
}
