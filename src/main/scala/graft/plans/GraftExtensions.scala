package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native expressions as SQL
  * functions, so `spark.sql("SELECT cosine_similarity(a, b) ...")` works —
  * activate with `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`, or register
  * onto an already-built session with [[GraftExtensions.registerOn]].
  *
  * This is the `SparkSessionExtensions` integration point from the build
  * brief's custom-operator ladder; no custom Rule/Strategy is injected
  * because every graft operator plans through stock Catalyst (SURVEY.md §4
  * conclusion) — expressions are the only genuinely custom plan nodes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(e.injectFunction)
}

object GraftExtensions {

  /** The one definition both injection paths share: (identifier, info,
    * builder) triples in Spark's FunctionDescription shape. */
  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))),
    (
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))),
    (
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        val n = args.lift(1).map(_.eval().asInstanceOf[Number].intValue()).getOrElse(3)
        val distinct = args.lift(2).forall(_.eval().asInstanceOf[Boolean])
        WordShingles(args.head, n, distinct)
      }))

  /** Register the same functions on an EXISTING session. `.withExtensions`
    * binds only at session BUILD time, and the driver owns Verify/Bench
    * session construction — this is how the SQL surface reaches a session
    * the library didn't build. Idempotent (re-registration replaces the
    * same builder). */
  def registerOn(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
