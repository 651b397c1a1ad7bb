package graft.tools

/** Round-over-round bench adjudicator: diff two FULL-map bench records
  * (`BENCH_LOCAL_r{N}_quiet.json` — the reason task "restore the full
  * queries map" exists) and separate real regressions from uniform host
  * noise. Host steal inflates every query by roughly the same factor;
  * a code regression inflates specific queries. So the report centers
  * on the MEDIAN ratio (the noise estimate) and flags queries whose
  * ratio exceeds median × bar — "slower than the run's own noise floor
  * explains". No Spark session; jackson rides the Spark classpath.
  *
  * A second axis (round-14 judge task 7): pass `cpu` as the 4th arg to
  * diff `query_cpu_sec` (process-CPU seconds, steal-proof — host heat
  * inflates wall ratios but not CPU ratios) instead of wall `queries`;
  * `gc` diffs `query_gc_sec`, `build` diffs `query_cache_build_sec`.
  * Round-over-round claims should cite BOTH wall and cpu modes: a real
  * regression moves both, window heat moves only wall.
  *
  * Usage: runMain graft.tools.BenchDiff <baseline.json> <candidate.json> [flagBar] [wall|cpu|gc|build]
  */
object BenchDiff {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchDiff <baseline.json> <candidate.json> [flagBar] [wall|cpu|gc|build]")
    val flagBar = if (args.length > 2) args(2).toDouble else 1.3
    val field = (if (args.length > 3) args(3) else "wall") match {
      case "wall" => "queries"
      case "cpu" => "query_cpu_sec"
      case "gc" => "query_gc_sec"
      case "build" => "query_cache_build_sec"
      case other => sys.error(s"unknown mode '$other' (wall|cpu|gc|build)")
    }
    println(s"[benchdiff] axis: $field")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    def queryMap(path: String): Map[String, Double] = {
      val root = om.readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
      val q = root.get(field)
      require(q != null, s"$path carries no \"$field\" map (compact record, or a pre-r15 artifact without this axis? use the full artifact)")
      val it = q.fields()
      val b = Map.newBuilder[String, Double]
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
      b.result()
    }
    val base = queryMap(args(0))
    val cand = queryMap(args(1))
    // wall mode also loads the cache-build attribution (query_cache_build_sec,
    // 0 when the artifact predates it) so eager-fill PLACEMENT changes —
    // a shared artifact's build landing in a different alphabetically-first
    // consumer slot — can never read as regressions: every wall flag is
    // re-judged on wall − build, and flags that vanish there print as
    // BUILD-MOVED, not REGRESSED (the round-15 benchmark_contamination
    // false flag, made structural).
    def buildMap(path: String): Map[String, Double] =
      try {
        val root = om.readTree(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))
        val q = root.get("query_cache_build_sec")
        if (q == null) Map.empty
        else {
          val it = q.fields()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
          b.result()
        }
      } catch { case _: Exception => Map.empty }
    val (buildBase, buildCand) =
      if (field == "queries") (buildMap(args(0)), buildMap(args(1)))
      else (Map.empty[String, Double], Map.empty[String, Double])
    def adj(m: Map[String, Double], bm: Map[String, Double])(k: String): Double =
      math.max(m(k) - bm.getOrElse(k, 0.0), 0.001)
    val common = (base.keySet & cand.keySet).toSeq
      .filter(k => base(k) > 0 && cand(k) > 0)
    require(common.nonEmpty,
      s"no common positive-time queries between ${args(0)} (${base.size} queries) and " +
        s"${args(1)} (${cand.size} queries) — disjoint query sets, or an empty/compact " +
        "\"queries\" map; diff two FULL bench artifacts")
    val ratios = common.map(k => k -> cand(k) / base(k)).sortBy(-_._2)
    val median = ratios.map(_._2).sorted.apply(ratios.size / 2)
    println(f"common=${common.size} added=${(cand.keySet -- base.keySet).size} " +
      f"removed=${(base.keySet -- cand.keySet).size} median_ratio=$median%.3f " +
      f"subtotal ${common.map(base).sum}%.1f -> ${common.map(cand).sum}%.1f s")
    val flagged = ratios.filter { case (k, r) => r > median * flagBar && cand(k) > 0.3 }
    println(s"flagged (> median x $flagBar AND candidate > 0.3 s): ${flagged.size}")
    for ((k, r) <- flagged) {
      val adjRatio = adj(cand, buildCand)(k) / adj(base, buildBase)(k)
      val label = if (adjRatio > median * flagBar) "REGRESSED  " else "BUILD-MOVED"
      val buildNote =
        if (buildBase.getOrElse(k, 0.0) > 0 || buildCand.getOrElse(k, 0.0) > 0)
          f" [build ${buildBase.getOrElse(k, 0.0)}%.2f -> ${buildCand.getOrElse(k, 0.0)}%.2f, wall-build x$adjRatio%.2f]"
        else ""
      println(f"  $label $k%-40s ${base(k)}%6.2f -> ${cand(k)}%6.2f  x${r}%.2f (x${r / median}%.2f over noise)$buildNote")
    }
    for ((k, r) <- ratios.reverse.take(5))
      println(f"  improved    $k%-40s ${base(k)}%6.2f -> ${cand(k)}%6.2f  x${r}%.2f")
  }
}
