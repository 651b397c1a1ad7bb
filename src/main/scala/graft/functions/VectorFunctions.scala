package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `array<float>` / `array<double>` embedding
  * columns, built from codegen'd higher-order functions (`zip_with`,
  * `aggregate`) — no UDFs, so whole-stage codegen stays intact.
  *
  * Determinism note (oracle parity): every op first casts elements to
  * double and folds strictly left-to-right, which matches DuckDB's
  * `list_sum(list_transform(...))` accumulation order, so cosine values are
  * bit-identical between the Spark queries and the DuckDB oracle SQL.
  */
object VectorFunctions {

  /** Elementwise cast to array<double>. */
  def toDouble(a: Column): Column = transform(a, x => x.cast("double"))

  /** Strict left-fold sum of an array<double> column. */
  def arraySum(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x)

  /** Dot product of two numeric array columns (double accumulation). */
  def dot(a: Column, b: Column): Column =
    arraySum(zip_with(toDouble(a), toDouble(b), (x, y) => x * y))

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** Cosine similarity: dot(a,b) / sqrt(|a|^2 * |b|^2). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))
}
