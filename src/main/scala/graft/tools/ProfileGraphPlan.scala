package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Print the executed physical plan of one pagerank superstep (scratch). */
object ProfileGraphPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val orders = graft.Tables.orders(spark, sfDir)
    val lineitem = graft.Tables.lineitem(spark, sfDir)
    val pairs = orders.select(col("o_orderkey"), col("o_custkey"))
      .join(lineitem.select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("s"))
      .distinct()
      .localCheckpoint()
    println(s"pairs = ${pairs.count()}")
    val edges = pairs.select(col("c").as("src"), col("s").as("dst"))
      .unionAll(pairs.select(col("s").as("src"), col("c").as("dst")))
    val edgesP = edges.repartition(col("src")).persist(StorageLevel.MEMORY_AND_DISK)
    val deg = edgesP.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val withDeg = edgesP.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)
    println(s"withDeg = ${withDeg.count()}")
    val pr0 = withDeg.select(col("src").as("node")).distinct()
      .withColumn("pr", lit(1000000L)).localCheckpoint()
    println(s"nodes = ${pr0.count()}")
    val round1 = withDeg.join(pr0, col("src") === col("node"))
      .groupBy(col("dst"))
      .agg(sum(expr("pr div outdeg")).as("in_mass"))
      .select(col("dst").as("node"),
        (lit(150000L) + expr("(85 * in_mass) div 100")).as("pr"))
    val round2 = withDeg.join(round1, col("src") === col("node"))
      .groupBy(col("dst"))
      .agg(sum(expr("pr div outdeg")).as("in_mass"))
      .select(col("dst").as("node"),
        (lit(150000L) + expr("(85 * in_mass) div 100")).as("pr"))
    round2.collect()
    println("=== two-round job, executed plan ===")
    println(round2.queryExecution.executedPlan.toString.take(8000))
    spark.stop()
  }
}
