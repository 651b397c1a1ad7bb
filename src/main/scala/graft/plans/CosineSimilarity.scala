package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.transform
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Fused cosine similarity over two `array<double>` columns as a native
  * Catalyst expression with whole-stage codegen: one pass over both arrays
  * computes dot(a,b), |a|^2 and |b|^2 — versus three separate
  * `aggregate(zip_with(...))` higher-order chains (interpreted lambdas,
  * three array traversals, per-element closure dispatch). On the 100 TB
  * pairwise paths (near-dup verify, ANN scoring) this is the hot inner
  * loop, so it must live inside the codegen'd stage.
  *
  * Numeric contract (oracle parity): each accumulator is an independent
  * strict left-to-right double sum — term-for-term the same IEEE operation
  * sequence as `VectorFunctions.dot`'s fold and DuckDB's
  * `list_sum(list_transform(...))`, so results are bit-identical across
  * all three implementations.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs are guaranteed array<double> by the cosineFast wrapper, which
  // casts explicitly (ExpectsInputTypes is private[sql] in Spark 4)
  override def dataType: DataType = DoubleType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dp = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dp += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dp / math.sqrt(na * nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dp = ctx.freshName("dp")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dp = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $dp += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dp / java.lang.Math.sqrt($na * $nb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

/** Plain dot product — same accumulation contract as CosineSimilarity.
  * Lets pairwise plans hoist the per-row norms out of the pair join:
  * cos = dot(a,b)/sqrt(na*nb) with na, nb computed once per row, which is
  * 3× fewer array passes inside the O(n²) stage and numerically identical
  * (same per-term IEEE sequence). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dp = 0.0
    var i = 0
    while (i < n) { dp += x.getDouble(i) * y.getDouble(i); i += 1 }
    dp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dp = ctx.freshName("dp")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dp = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dp += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dp;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def dot(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, x => x.cast("double"))
    ColumnBridge.column(
      DotProduct(ColumnBridge.expression(d(a)), ColumnBridge.expression(d(b))))
  }
}

object CosineSimilarity {
  /** Column API: accepts float or double arrays (floats are cast up —
    * matching the oracle SQL's `embedding[i]::DOUBLE` promotion). */
  def cosineFast(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, x => x.cast("double"))
    ColumnBridge.column(
      CosineSimilarity(ColumnBridge.expression(d(a)), ColumnBridge.expression(d(b))))
  }
}
