package graft.tools

import java.nio.file.{Files, Paths}

/** Emits the machine-readable query catalog (QUERIES.json): one entry per
  * registered query — name, family ([[graft.SparkEntry.queryFamilies]]),
  * oracle kind (`sql` = full DuckDB hash compare; `rows_only` = no
  * SQL-expressible oracle, driver records row count only), the operator
  * entry point (extracted from the registry source so it can never be
  * hand-maintained into staleness), and the SF dirs the driver sweeps.
  * Deterministic output (sorted names, no timestamps): the catalog spec
  * regenerates this rendering and asserts byte-equality with the
  * committed file, so a registry change without `runMain
  * graft.tools.QueryCatalog` fails `sbt test` instead of silently
  * shipping a stale catalog.
  */
object QueryCatalog {

  /** Best-effort operator entry point per query, parsed from the
    * SparkEntry registry source: the first `Object.method(` call in the
    * registration body (block registrations report their first operator
    * call — the artifact builder). "inline" when the source is not
    * available (catalog generation always runs from the repo root). */
  def entryPoints(source: String): Map[String, String] = {
    val reg = """"([a-z0-9_]+)" -> \(\(s, d\) =>""".r
    val call = """([A-Z][A-Za-z]*(?:\.[a-zA-Z][A-Za-z0-9]*)+)\(""".r
    val matches = reg.findAllMatchIn(source).toVector
    matches.zipWithIndex.map { case (m, i) =>
      val end = if (i + 1 < matches.size) matches(i + 1).start else source.length
      val body = source.substring(m.end, math.min(end, m.end + 2000))
      val ep = call.findFirstMatchIn(body).map(_.group(1))
        .filterNot(_.startsWith("System.")).getOrElse("inline")
      m.group(1) -> ep
    }.toMap
  }

  def render(): String = {
    val qs = graft.SparkEntry.queries.keySet
    val oracles = graft.SparkEntry.oracleSql.keySet
    val fams = graft.SparkEntry.queryFamilies
    val src =
      try new String(Files.readAllBytes(
        Paths.get("src/main/scala/graft/SparkEntry.scala")), "UTF-8")
      catch { case _: Throwable => "" }
    val eps = entryPoints(src)
    val rows = qs.toSeq.sorted.map { n =>
      val fam = fams.getOrElse(n, "UNCLASSIFIED")
      val kind =
        if (graft.SparkEntry.postRunOracleQueries.contains(n)) "sql_inlined_model"
        else if (oracles.contains(n)) "sql"
        else "rows_only"
      val ep = eps.getOrElse(n, "inline")
      s"""  {"name":"$n","family":"$fam","oracle":"$kind","entry":"$ep","sf_tested":["0.01","0.1"]}"""
    }
    s"""{"generated_by":"graft.tools.QueryCatalog","n_queries":${qs.size},"queries":[
       |${rows.mkString(",\n")}
       |]}
       |""".stripMargin
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.nonEmpty) args(0) else "QUERIES.json"
    Files.writeString(Paths.get(out), render())
    println(s"[catalog] wrote ${graft.SparkEntry.queries.size} queries to $out")
  }
}
