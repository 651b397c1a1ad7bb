package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional gram md5 digests as a native expression: input is the
  * NORMALIZED text (single-space separated, trimmed — TextFunctions
  * .normText), output is the array of 32-char lowercase md5 hex digests
  * of the `n`-token gram starting at every position (empty when the doc
  * has fewer than `n` tokens).
  *
  * Hex-for-hex the same digests as the higher-order-function chain it
  * replaces (`transform(sequence(1, size(toks) - n + 1), i ->
  * md5(array_join(slice(toks, i, n), ' ')))` — the form the DuckDB
  * oracle still mirrors): because the input is single-space normalized,
  * the joined gram string IS a contiguous byte span of the input, so
  * each digest is one MessageDigest.update over that span — no token
  * array, no per-position slice/join allocations, no interpreted lambda
  * dispatch. The HOF chain re-materialized the token array and built a
  * fresh gram string per position (~n tokens copied per gram, at every
  * position of every document — the dominant cost of dedup_substring's
  * gram pass at sf0.1).
  *
  * `doGenCode` emits a single static call into [[PositionalGramHashes
  * .compute]] (the WordShingles/SimHash64 discipline), so the expression
  * stays inside whole-stage codegen with the heavy loop as JIT-compiled
  * Scala.
  *
  * Tokenization contract: token boundaries at every single space byte
  * (split(text, ' ') on normalized input — normText guarantees no
  * leading/trailing/double spaces, the precondition WordShingles shares).
  */
case class PositionalGramHashes(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "positional_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    PositionalGramHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PositionalGramHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): PositionalGramHashes =
    copy(child = newChild)
}

object PositionalGramHashes {

  def grams(text: Column, n: Int): Column =
    ColumnBridge.column(PositionalGramHashes(ColumnBridge.expression(text), n))

  // MessageDigest is stateful — one instance per executor thread
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** Static forwarder called from generated code. One boundary scan to
    * find token start offsets, then one md5 per position over the byte
    * span [start(i), end(i + n - 1)) of the normalized input. */
  def compute(input: UTF8String, n: Int): ArrayData = {
    val bytes = input.getBytes
    // token start offsets (split-at-space semantics: spaces + 1 tokens)
    var nTok = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') nTok += 1
      i += 1
    }
    if (nTok < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTok)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    val digest = md5.get()
    val out = new Array[Any](nTok - n + 1)
    var p = 0
    while (p <= nTok - n) {
      val from = starts(p)
      // gram ends at the byte before the (p + n)-th token's separator —
      // i.e. the full input tail for the last gram
      val until = if (p + n < nTok) starts(p + n) - 1 else bytes.length
      digest.update(bytes, from, until - from)
      val d = digest.digest()
      val hex = new Array[Char](32)
      var j = 0
      while (j < 16) {
        hex(2 * j) = hexChars((d(j) >> 4) & 0xF)
        hex(2 * j + 1) = hexChars(d(j) & 0xF)
        j += 1
      }
      out(p) = UTF8String.fromString(new String(hex))
      p += 1
    }
    new GenericArrayData(out)
  }
}
