package graft.tools

import org.apache.spark.sql.SparkSession

/** Bench-style timing of a named query subset: N attempts each from a
  * CLEARED session (Bench's retry discipline), quiet-host gate before
  * every attempt, min + all attempts printed.
  * `runMain graft.tools.TimeQueries <sfDir> <reps> <name> [name ...]` */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val reps = args(1).toInt; val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // untimed warmup of session infra
    try graft.SparkEntry.queries("uu_per_minute")(spark, sfDir).count()
    catch { case _: Throwable => () }
    def clear(): Unit = {
      spark.catalog.clearCache()
      graft.operators.Dedup.clearSessionState()
      graft.operators.Similarity.clearSessionState()
      graft.operators.QualityModel.clearSessionState()
      graft.operators.Graph.clearSessionState()
    }
    val results = names.map { name =>
      val times = (1 to reps).map { _ =>
        clear()
        graft.Bench.awaitQuietHost(cpus.toInt, "timeq")
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      name -> times
    }
    results.foreach { case (name, times) =>
      println(f"[timeq] $name%-28s min=${times.min}%6.3f  " +
        s"attempts=[${times.map(t => f"$t%.3f").mkString(", ")}]")
    }
    spark.stop()
  }
}
