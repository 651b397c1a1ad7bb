package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a document's distinct-shingle array as a native
  * expression: `seeds` lexicographic-min md5 hex digests in one pass per
  * document — no exploded shingle relation, no k-column min aggregate,
  * no shuffle.
  *
  * Bit-for-bit the signature of the grouped form it replaces
  * (min(md5(concat_ws(":", i, g))) per seed i over exploded shingle
  * rows, which the DuckDB oracle still mirrors): element i is the
  * minimum over shingles g of md5_hex(i ":" g). The minimum is taken
  * byte-wise unsigned over the 16-byte digests and hex-encoded once per
  * document — lowercase-hex strings order exactly as their digest bytes
  * (hex chars '0'..'9' < 'a'..'f' are monotone in nibble value), so the
  * string min and the byte min agree.
  *
  * Same scale/codegen shape as [[SimHash64]]/[[WordShingles]]:
  * `doGenCode` emits one static call, the md5+min loop runs as
  * JIT-compiled Scala inside whole-stage codegen, and the per-doc cost
  * replaces a (docs × shingles)-row aggregation exchange.
  *
  * Callers must exclude empty arrays (no shingles ⇒ no min exists; the
  * exploded form had no row for such a doc — a size filter keeps that
  * contract; this expression would return an array of nulls).
  */
case class MinHashHex(child: Expression, seeds: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = true)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_hex needs array<string>, got ${other.catalogString}")
    }

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "minhash_hex"

  override def nullSafeEval(input: Any): Any =
    MinHashHex.compute(input.asInstanceOf[ArrayData], seeds)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MinHashHex.compute($c, $seeds);")

  override protected def withNewChildInternal(newChild: Expression): MinHashHex =
    copy(child = newChild)
}

object MinHashHex {

  def minhashHex(arr: Column, seeds: Int): Column =
    ColumnBridge.column(MinHashHex(ColumnBridge.expression(arr), seeds))

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val HexChars = "0123456789abcdef".toCharArray

  // seed prefixes "<i>:" as UTF-8 bytes — constant per `seeds` value
  // (fixed per expression instance), cached so the hot per-row path
  // allocates nothing but digests
  private val prefixCache =
    scala.collection.concurrent.TrieMap[Int, Array[Array[Byte]]]()
  private def prefixesFor(seeds: Int): Array[Array[Byte]] =
    prefixCache.getOrElseUpdate(seeds,
      Array.tabulate(seeds)(i => (i.toString + ":").getBytes("UTF-8")))

  /** Static forwarder called from generated code. Null array elements
    * are SKIPPED — the min aggregate the grouped form used ignores
    * nulls, and this keeps that contract for any future caller whose
    * array type carries containsNull=true (the shingle producers here
    * never emit null elements). */
  def compute(arr: ArrayData, seeds: Int): ArrayData = {
    val digest = md5.get()
    val mins = new Array[Array[Byte]](seeds)
    val prefixes = prefixesFor(seeds)
    val n = arr.numElements()
    var k = 0
    while (k < n) {
      if (!arr.isNullAt(k)) {
        val g = arr.getUTF8String(k).getBytes
        var i = 0
        while (i < seeds) {
          digest.update(prefixes(i))
          digest.update(g)
          val d = digest.digest()
          val cur = mins(i)
          if (cur == null || unsignedLess(d, cur)) mins(i) = d
          i += 1
        }
      }
      k += 1
    }
    val out = new Array[Any](seeds)
    var i = 0
    while (i < seeds) {
      out(i) = if (mins(i) == null) null else UTF8String.fromString(hex(mins(i)))
      i += 1
    }
    new GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xFF; val bi = b(i) & 0xFF
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): String = {
    val cs = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      cs(2 * i) = HexChars((d(i) >> 4) & 0xF)
      cs(2 * i + 1) = HexChars(d(i) & 0xF)
      i += 1
    }
    new String(cs)
  }
}
