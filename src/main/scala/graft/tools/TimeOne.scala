package graft.tools

import org.apache.spark.sql.SparkSession

/** Time named registered queries in one warm JVM: `runMain
  * graft.tools.TimeOne <sfDir> <query>...` — a warmup pass then a timed
  * pass per query (same collect-to-exhaustion contract as Bench, minus
  * the fleet). For profiling a single operator without paying a full
  * Bench sweep. */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(1)) {
      val fn = graft.SparkEntry.queries(q)
      fn(spark, sfDir).collect() // warm
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).collect().length
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[timeone] $q rows=$n sec=$sec%.3f")
    }
    spark.stop()
  }
}
