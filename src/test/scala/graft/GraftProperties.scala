package graft

import org.apache.spark.sql.Row
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import graft.operators.{Dedup, UniqueUsers}
import graft.plans.CosineSimilarity

/** Property-based invariants (SURVEY.md §5.3). Each property runs Spark
  * jobs, so the case count is kept small. */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  private val eventGen: Gen[List[(Int, Int)]] = // (minuteOffset, uid)
    Gen.listOfN(60, Gen.zip(Gen.choose(0, 5), Gen.choose(0, 10)))

  property("windowed distinct == collections brute force") = forAll(eventGen) { evs =>
    val base = 1700000040L
    val df = evs.zipWithIndex
      .map { case ((m, u), i) => (base + m * 60L + i % 60, u.toLong) }
      .toDF("sec", "user_id")
      .selectExpr("CAST(sec AS TIMESTAMP) AS ts", "user_id")
    val got = UniqueUsers.perMinute(df).collect()
      .map { case Row(m: Long, n: Long) => m -> n }.toMap
    val expected = evs.zipWithIndex
      .map { case ((m, u), i) => ((base + m * 60L + i % 60) / 60 * 60, u) }
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size.toLong).toMap
    got == expected
  }

  property("exact variants agree pairwise") = forAll(eventGen) { evs =>
    val base = 1700000040L
    val df = evs.map { case (m, u) => (base + m * 60L, u.toLong) }
      .toDF("sec", "user_id")
      .selectExpr("CAST(sec AS TIMESTAMP) AS ts", "user_id")
    val a = UniqueUsers.perMinute(df).collect().toSeq
    val b = UniqueUsers.perMinuteTwoPhase(df).collect().toSeq
    val c = UniqueUsers.perMinuteCollectSet(df).collect().toSeq
    a == b && b == c
  }

  private val docsGen: Gen[List[String]] =
    Gen.listOfN(8, Gen.listOfN(12, Gen.oneOf("alpha", "beta", "Gamma", "DELTA", "eps"))
      .map(_.mkString(" ")))

  property("normalized dedup partitions the corpus") = forAll(docsGen) { texts =>
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = Dedup.exactNormalized(df).collect()
      .map { case Row(_, n: Long) => n }
    got.sum == texts.size.toLong && got.forall(_ >= 1)
  }

  private val vecGen: Gen[List[Float]] =
    Gen.listOfN(8, Gen.choose(-5f, 5f)).suchThat(v => v.exists(math.abs(_) > 0.01f))

  property("cosine is symmetric and self-similarity ~ 1") = forAll(vecGen, vecGen) { (a, b) =>
    val df = Seq((a.toArray, b.toArray)).toDF("a", "b")
    val Row(ab: Double, ba: Double, aa: Double) = df.select(
      CosineSimilarity.cosineFast($"a", $"b"),
      CosineSimilarity.cosineFast($"b", $"a"),
      CosineSimilarity.cosineFast($"a", $"a")).head()
    ab == ba && math.abs(aa - 1.0) < 1e-12 && ab >= -1.0000001 && ab <= 1.0000001
  }
}
