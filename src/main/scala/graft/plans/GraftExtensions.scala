package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extension registering the engine's native expressions as SQL
  * functions, so `spark.sql("SELECT cosine_similarity(a, b) ...")` works —
  * activate with `.withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * This is the `SparkSessionExtensions` integration point from the build
  * brief's custom-operator ladder; no custom Rule/Strategy is injected
  * because every graft operator plans through stock Catalyst (SURVEY.md §4
  * conclusion) — expressions are the only genuinely custom plan nodes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (args: Seq[Expression]) => CosineSimilarity(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        val n = args.lift(1).map(_.eval().asInstanceOf[Number].intValue()).getOrElse(3)
        val distinct = args.lift(2).forall(_.eval().asInstanceOf[Boolean])
        WordShingles(args.head, n, distinct)
      }))
  }
}
