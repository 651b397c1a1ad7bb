package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftExtensions

/** The custom expressions are SQL-callable once GraftExtensions is
  * installed (own session — extensions bind at session build time). */
class ExtensionsSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    // extensions only apply at session CREATION — clear any session another
    // suite created in this JVM so getOrCreate builds a fresh one (the
    // underlying SparkContext is shared, which is fine)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    // restore the shared suite session as the JVM-wide default: the fresh
    // extensions session owns a NEW SharedState (empty catalog), and
    // leaving it as default would hand every concurrently-running suite
    // that resolves catalog tables through getDefaultSession an empty
    // catalog (bit the dedup-index suites in round 7)
    SparkSession.setDefaultSession(SparkSpec.spark)
    SparkSession.setActiveSession(SparkSpec.spark)
    s
  }

  test("cosine_similarity, dot_product, word_shingles usable from SQL") {
    val row = spark.sql(
      """SELECT
        |  cosine_similarity(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |  dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  word_shingles('a b c d', 3, true) AS s""".stripMargin).head()
    assert(row.getDouble(0) === 1.0)
    assert(row.getDouble(1) === 11.0)
    assert(row.getSeq[String](2) === Seq("a b c", "b c d"))
  }
}
