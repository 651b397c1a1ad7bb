package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash of a document's distinct-shingle array as a native
  * expression: one pass per document, no exploded shingle relation, no
  * 64-column vote aggregate, no shuffle.
  *
  * Bit-for-bit the same signature as the column-algebra form it replaces
  * (graft.operators.Dedup.simhashSignatures pre-round-13, and the DuckDB
  * oracle CTE that still mirrors it): bit j of the signature is set iff
  * the sum over shingles of ±1 votes is ≥ 0, where shingle s votes +1 on
  * bit j iff bit (j mod 2) of hex-nibble (j div 2) of md5(s) is set —
  * hex nibble i of the digest is the HIGH nibble of byte i/2 for even i,
  * the LOW nibble for odd i (hex-string character order). The old form
  * computed this through md5's hex STRING with 32 substring+conv casts
  * per shingle row and a 64-column grouped sum — profiled as the
  * dominant cost of dedup_simhash (~2.5-4 s of ~4 s at sf0.1; the
  * bench-visible cost hid behind count()'s column pruning). Here the
  * votes accumulate in a local int[64] over the digest BYTES.
  *
  * `doGenCode` emits a single static call into [[SimHash64.compute]]
  * (the WordShingles discipline): the array operand flows in as the
  * stage's generated local, the loop runs as JIT-compiled Scala, and
  * the expression stays inside whole-stage codegen.
  *
  * Callers must exclude empty arrays (zero shingles ⇒ all votes tie at
  * 0 ⇒ all 64 bits set — the exploded form simply has no row for such a
  * doc, and simhashSignatures keeps that contract with a size filter).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got ${other.catalogString}")
    }

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.SimHash64.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  def simhash64(arr: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(arr)))

  // MessageDigest is stateful — one instance per executor thread,
  // reset-by-digest() per shingle
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static forwarder called from generated code. One pass: per shingle
    * an md5 over its UTF-8 bytes, 64 bit-tests into the vote array; per
    * document one sign pass packing the signature long. Null array
    * elements are SKIPPED — the grouped vote sum the old form used
    * ignores null rows, and this keeps that contract for any caller
    * whose array type carries containsNull=true (the shingle producers
    * here never emit null elements). */
  def compute(arr: ArrayData): Long = {
    val digest = md5.get()
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val d = digest.digest(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < 64) {
          // hex-nibble (j >> 1) of the digest, spelled via the
          // hex-character order contract: nibble index i2 = j >> 1;
          // byte = d(i2 >> 1); even i2 takes the high nibble, odd the
          // low. Bit selector is 1 << (j & 1).
          val i2 = j >> 1
          val nib =
            if ((i2 & 1) == 0) (d(i2 >> 1) >> 4) & 0xF
            else d(i2 >> 1) & 0xF
          if ((nib & (1 << (j & 1))) != 0) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) >= 0) sig |= 1L << j
      j += 1
    }
    sig
  }
}
