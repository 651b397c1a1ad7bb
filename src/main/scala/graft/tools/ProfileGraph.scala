package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the pagerank build at a given SF, run COLD
  * (cleared caches) per repetition — where do the seconds go: the pair
  * derivation, the edge staging, the supersteps, or the final sort?
  * `runMain graft.tools.ProfileGraph <sfDir> [reps]`. */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      println(f"[graph] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.3f s"); a
    }
    // untimed warmup of scans/codegen
    graft.SparkEntry.queries("graph_pagerank")(spark, sfDir).count()
    for (r <- 1 to reps) {
      println(s"--- rep $r (cold) ---")
      spark.catalog.clearCache()
      val orders = graft.Tables.orders(spark, sfDir)
      val lineitem = graft.Tables.lineitem(spark, sfDir)
      val pairs = t("pairs_pin") {
        orders.select(col("o_orderkey"), col("o_custkey"))
          .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
          .distinct()
          .localCheckpoint()
      }
      val withDeg = t("edge_stage") {
        val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
          .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
        val edgesP = edges.repartition(col("src"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val deg = edgesP.groupBy("src").agg(count(lit(1)).as("outdeg"))
        val w = edgesP.join(deg, "src")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        w.count()
        edgesP.unpersist()
        w
      }
      var pr = t("seed") {
        withDeg.select(col("src").as("node")).distinct()
          .withColumn("pr", lit(1000000L)).localCheckpoint()
      }
      for (i <- 1 to 5) {
        pr = t(s"round_$i") {
          val next = withDeg.join(pr, col("src") === col("node"))
            .groupBy(col("dst"))
            .agg(sum(expr("pr div outdeg")).as("in_mass"))
            .select(col("dst").as("node"),
              (lit(150000L) + expr("(85 * in_mass) div 100")).as("pr"))
          if (i % 2 == 0 || i == 5) next.localCheckpoint() else next
        }
      }
      t("final_sort") {
        pr.select(col("node"), col("pr"))
          .orderBy(col("pr").desc, col("node")).limit(100).count()
      }
      withDeg.unpersist()
    }
    spark.stop()
  }
}
