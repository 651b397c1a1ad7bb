package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Testdata schema tripwire. The driver regenerates
  * `/root/testdata/sf*` between rounds and the PHYSICAL schema can
  * change silently — round 8 opened with `events.ts` switched from
  * TIMESTAMP(NANOS) to TIMESTAMP(MICROS)/NTZ, which broke 13 tests
  * with a type-mismatch error that pointed nowhere near the cause.
  * This tool makes the next such drift a one-line diagnosis:
  *
  *   runMain graft.tools.SchemaDoctor <sfDir>           # compare
  *   runMain graft.tools.SchemaDoctor <sfDir> --write   # re-baseline
  *
  * It reads each table's RAW parquet schema (no loader shims — the
  * point is to see what the driver actually wrote) and diffs it against
  * the committed baseline `tools/schemas.txt`. SchemaDoctorSpec runs the
  * same comparison in `sbt test`, so a regeneration surfaces as ONE
  * failing spec whose message says exactly what moved and what to do —
  * not as a scatter of analysis errors. */
object SchemaDoctor {

  val Tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Baseline location, anchored to the PROJECT ROOT rather than the JVM
    * working directory: a forked test JVM or a runMain launched from
    * elsewhere would otherwise report "missing baseline" instead of
    * comparing. Resolution order: explicit `-Dgraft.repo.root`, else walk
    * up from the cwd to the first directory containing `build.sbt` (the
    * sbt project root), else the cwd-relative path as before. */
  def baselinePath(): java.nio.file.Path = {
    val rel = Paths.get("tools", "schemas.txt")
    sys.props.get("graft.repo.root") match {
      case Some(root) => Paths.get(root).resolve(rel)
      case None =>
        Iterator.iterate(Paths.get("").toAbsolutePath)(_.getParent)
          .takeWhile(_ != null)
          .find(p => Files.exists(p.resolve("build.sbt")))
          .map(_.resolve(rel))
          .getOrElse(rel)
    }
  }

  /** One canonical line per table: `<table>: <schema.sql form>` read with
    * the same legacy-nanos escape hatch `Tables.events` needs (without it
    * the nanos generation refuses to even DESCRIBE). */
  def snapshot(spark: SparkSession, sfDir: String): String = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Tables.map { t =>
      val sch = spark.read.parquet(s"$sfDir/$t.parquet").schema.sql
      s"$t: $sch"
    }.mkString("", "\n", "\n")
  }

  def baseline(): Option[String] = {
    val p = baselinePath()
    if (Files.exists(p)) Some(new String(Files.readAllBytes(p), StandardCharsets.UTF_8))
    else None
  }

  /** Human-readable drift report; empty string means no drift. */
  def diff(expected: String, actual: String): String = {
    def toMap(s: String): Map[String, String] =
      s.linesIterator.filter(_.nonEmpty)
        .map { l => val i = l.indexOf(": "); l.take(i) -> l.drop(i + 2) }.toMap
    val e = toMap(expected); val a = toMap(actual)
    val lines = (e.keySet ++ a.keySet).toSeq.sorted.flatMap { t =>
      (e.get(t), a.get(t)) match {
        case (Some(x), Some(y)) if x == y => None
        case (Some(x), Some(y)) => Some(s"$t CHANGED:\n  baseline: $x\n  actual:   $y")
        case (Some(x), None)    => Some(s"$t MISSING from testdata (baseline: $x)")
        case (None, Some(y))    => Some(s"$t NEW in testdata (actual: $y)")
      }
    }
    lines.mkString("\n")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val write = args.contains("--write")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val actual = snapshot(spark, sfDir)
    if (write) {
      Files.write(baselinePath(), actual.getBytes(StandardCharsets.UTF_8))
      println(s"[schema-doctor] baseline written to ${baselinePath()}")
    } else baseline() match {
      case None =>
        println(s"[schema-doctor] no baseline at ${baselinePath()} — run with --write first")
        sys.exit(2)
      case Some(exp) =>
        val d = diff(exp, actual)
        if (d.isEmpty) println("[schema-doctor] schemas match the baseline")
        else {
          println(s"[schema-doctor] TESTDATA SCHEMA DRIFT against ${baselinePath()}:\n$d")
          println("[schema-doctor] adapt the graft.Tables loader for the changed table(s), " +
            "then re-baseline with --write")
          sys.exit(1)
        }
    }
    spark.stop()
  }
}
