package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

/** Per-JOB attribution of `graph_pagerank` at its ACTUAL bench slot —
  * the round-14 verdict's outstanding adjudication: the in-bench reading
  * exceeds the standalone one by ~1-2 s, query_gc_sec disproved the GC
  * theory (~0.02 s), and the residual was ATTRIBUTED to fixed job
  * dispatch without ever being measured from inside a bench-shaped
  * session. This tool measures it: replay the bench's exact preamble
  * (same cpus/shuffle config, untimed uu_per_minute warmup, every
  * registered query BEFORE graph_pagerank in the bench's sorted order),
  * then run the pagerank query under a SparkListener that logs, per job:
  *
  *   wall        job completion − submission (driver-observed)
  *   task_sum    Σ task wall across the job's tasks
  *   run_sum     Σ executorRunTime (actual compute)
  *   sched_sum   Σ per-task scheduler delay
  *               (duration − run − deserialize − resultSer − gettingResult)
  *   gap         driver-side time between the previous job's completion
  *               and this job's submission (planning + dispatch — cost
  *               OUTSIDE any job)
  *
  * The dispatch theory's testable claim: Σgap + Σ(wall − ideal span) —
  * the time NOT spent executing tasks — accounts for the in-bench
  * residual, and per-job run_sum stays flat between the aged and cleared
  * runs (the PLAN does the same work; the session costs differ).
  *
  * `runMain graft.tools.ProfileGraphBench [sfDir] [repeats]` — repeats
  * (default 3) pagerank runs AFTER the aged preamble, clearing the graph
  * session state between runs exactly like Bench's slow-tail retries, so
  * run 1 is the aged first pass and runs 2+ are the cleared retries. */
object ProfileGraphBench {

  private class JobLog extends SparkListener {
    case class Job(id: Int, desc: String, submitted: Long) {
      var completed: Long = 0L
      var nTasks: Int = 0
      var taskSumMs: Long = 0L
      var runSumMs: Long = 0L
      var schedSumMs: Long = 0L
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    private val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    @volatile var enabled = false

    override def onJobStart(e: SparkListenerJobStart): Unit = if (enabled) {
      val desc = Option(e.properties)
        .flatMap(p => Option(p.getProperty("spark.job.description")))
        .orElse(Option(e.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
        .getOrElse("?")
      jobs.put(e.jobId, Job(e.jobId, desc, e.time))
      e.stageIds.foreach(s => stageToJob.put(s, e.jobId))
      ()
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit = {
      val j = jobs.get(e.jobId)
      if (j != null) j.completed = e.time
    }
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      // containsKey first: Scala unboxes a missing key's null to job id
      // 0, which would mis-attribute tasks from untracked stages there
      if (!stageToJob.containsKey(e.stageId)) return
      val jid = stageToJob.get(e.stageId)
      val j = jobs.get(jid)
      if (j != null && e.taskInfo != null && e.taskMetrics != null) {
        j.synchronized {
          j.nTasks += 1
          j.taskSumMs += e.taskInfo.duration
          j.runSumMs += e.taskMetrics.executorRunTime
          val sched = e.taskInfo.duration - e.taskMetrics.executorRunTime -
            e.taskMetrics.executorDeserializeTime - e.taskMetrics.resultSerializationTime -
            math.max(0L, e.taskInfo.gettingResultTime)
          j.schedSumMs += math.max(0L, sched)
        }
      }
    }
    def reset(): Unit = { jobs.clear(); stageToJob.clear() }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val log = new JobLog
    spark.sparkContext.addSparkListener(log)

    // the bench preamble, verbatim: untimed warmup then every query
    // strictly before graph_pagerank in sorted order — pagerank's session
    // age at its real slot (heap history, JIT state, cached artifacts)
    try graft.SparkEntry.queries("uu_per_minute")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val before = names.takeWhile(_ != "graph_pagerank")
    println(s"[pgb] aging session: ${before.size} queries before graph_pagerank")
    val t0 = System.nanoTime()
    before.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case e: Throwable => println(s"[pgb] $n FAILED: ${e.getMessage}") }
    }
    println(f"[pgb] preamble done in ${(System.nanoTime() - t0) / 1e9}%.1f s")

    for (r <- 1 to repeats) {
      if (r > 1) {
        // Bench's slow-tail retry hygiene: cleared session, same query
        spark.catalog.clearCache()
        graft.operators.Dedup.clearSessionState()
        graft.operators.Similarity.clearSessionState()
        graft.operators.QualityModel.clearSessionState()
        graft.operators.Graph.clearSessionState()
      }
      log.reset()
      log.enabled = true
      val q0 = System.nanoTime()
      val wallStartMs = System.currentTimeMillis()
      graft.SparkEntry.queries("graph_pagerank")(spark, sfDir).count()
      val wall = (System.nanoTime() - q0) / 1e9
      log.enabled = false
      import scala.jdk.CollectionConverters._
      val jobs = log.jobs.values().asScala.toSeq.sortBy(_.submitted)
      val tag = if (r == 1) "aged-first-pass" else s"cleared-retry-$r"
      println(f"=== $tag: wall ${wall}%6.3f s, ${jobs.size} jobs ===")
      var prevEnd = wallStartMs
      var gapSum = 0.0; var jobWallSum = 0.0; var runSum = 0.0; var schedSum = 0.0; var taskSum = 0.0
      jobs.foreach { j =>
        val gap = math.max(0L, j.submitted - prevEnd) / 1e3
        val jwall = math.max(0L, j.completed - j.submitted) / 1e3
        gapSum += gap; jobWallSum += jwall
        runSum += j.runSumMs / 1e3; schedSum += j.schedSumMs / 1e3; taskSum += j.taskSumMs / 1e3
        println(f"[job ${j.id}%4d] gap ${gap}%6.3f  wall ${jwall}%6.3f  tasks ${j.nTasks}%4d  " +
          f"task_sum ${j.taskSumMs / 1e3}%7.3f  run_sum ${j.runSumMs / 1e3}%7.3f  " +
          f"sched_sum ${j.schedSumMs / 1e3}%7.3f  ${j.desc.take(70)}")
        prevEnd = math.max(prevEnd, j.completed)
      }
      val tailGap = math.max(0.0, wall - (prevEnd - wallStartMs) / 1e3)
      // ideal span = task_sum / cores: what the job walls would be with
      // zero dispatch/skew; wall − jobWallSum − gaps ≈ result fetch
      val idealSpan = taskSum / cpus.toDouble
      println(f"[sum $tag] wall ${wall}%6.3f = job_walls ${jobWallSum}%6.3f + inter-job gaps ${gapSum}%6.3f" +
        f" + tail ${tailGap}%5.3f | task_sum ${taskSum}%7.3f (ideal span ${idealSpan}%6.3f)" +
        f" run_sum ${runSum}%7.3f sched_sum ${schedSum}%7.3f")
      println(f"[attribution $tag] outside-tasks = wall − ideal span = ${wall - idealSpan}%6.3f s" +
        f" (gaps ${gapSum}%5.3f + in-job dispatch/skew ${jobWallSum - idealSpan}%6.3f + tail ${tailGap}%5.3f)")
    }
    spark.stop()
  }
}
