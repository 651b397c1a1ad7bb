package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The samplers' md5-nibble idiom as a native expression: the integer
  * value of the 5 leading hex nibbles of md5(input) — bit-identical to
  * `conv(substring(md5(x), 1, 5), 16, 10) cast long` (the column-algebra
  * form the DuckDB oracles mirror with the strpos-nibble expansion), but
  * computed straight off the digest bytes: no 32-char hex string
  * materialization, no substring slice, no base-16 string re-parse per
  * row. The derived-partsupp family (Relational.keyHash5) evaluates this
  * up to three times per lineitem row inside a pushed-down scan filter,
  * where the hex round-trip was the dominant per-row cost.
  *
  * `doGenCode` emits a single static call into [[Md5Nibble5.compute]]
  * (the WordShingles/SimHash64 discipline) so the expression stays
  * inside whole-stage codegen, eligible for subexpression elimination
  * across the CASE branches the shipmode derivation expands into.
  */
case class Md5Nibble5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "md5_nibble5"

  override def nullSafeEval(input: Any): Any =
    Md5Nibble5.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Md5Nibble5.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Md5Nibble5 =
    copy(child = newChild)
}

object Md5Nibble5 {

  def md5Nibble5(s: Column): Column =
    ColumnBridge.column(Md5Nibble5(ColumnBridge.expression(s)))

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static forwarder called from generated code: 5 leading hex nibbles
    * = the top 20 bits of the digest's first 3 bytes, read in hex
    * character order (high nibble first). */
  def compute(input: UTF8String): Long = {
    val d = md5.get().digest(input.getBytes)
    (((d(0) & 0xFFL) << 12) | ((d(1) & 0xFFL) << 4) | ((d(2) & 0xF0L) >> 4))
  }
}
