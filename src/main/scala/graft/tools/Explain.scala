package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Plan inspection: `runMain graft.tools.Explain <sfDir> <query>...` —
  * prints the formatted physical plan and wall time for each named query
  * (all queries if none named). The iterate-on-the-plan loop: check
  * PushedFilters / ReadSchema on scans, broadcast vs shuffle joins, and
  * WholeStageCodegen span coverage. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      // time the BUILDER call too, like Bench does: several operators do
      // real work at DataFrame-build time (localCheckpoint'd cluster
      // loops, persisted-index builds), and count()-only timing misses it
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val n = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"========== $name ==========")
      df.explain("formatted")
      println(f"[explain] $name: $n rows in $sec%.2f s (build + first execution)")
    }
    spark.stop()
  }
}
