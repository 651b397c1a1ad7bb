package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** The hashed-verify pair for the dedup family's exact-overlap joins.
  *
  * [[SortedHashArray]] maps a distinct-shingle string array to its
  * SORTED array of 64-bit xxhash64 values (seed 42 — the same family
  * Spark's builtin `xxhash64` uses), deduping collision-equal neighbors.
  * Computed ONCE per document into the session shingle cache.
  *
  * [[SortedLongIntersectCount]] counts common elements of two such
  * sorted arrays with a linear merge — no per-pair hash table, no
  * per-pair string hashing. `array_intersect` on the string arrays
  * (the form this replaces in the verify joins) re-hashes and re-compares
  * every shingle string of BOTH documents for EVERY candidate pair;
  * with ~10³ shingles per doc and ~10⁵ candidate pairs that is ~10⁸
  * string hashes per query, all replaced by long comparisons over
  * arrays precomputed once per corpus.
  *
  * Correctness contract: a shared count differs from the exact string
  * intersection only under an xxhash64 collision between two DIFFERENT
  * shingles of a candidate pair (~|set|²/2⁶⁴ per pair) — the same
  * accepted trade as the md5 fingerprints everywhere else in Dedup;
  * the DuckDB oracle still computes exact string intersections and the
  * correctness gate would surface any actual collision as a hash
  * mismatch.
  */
case class SortedHashArray(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_hash_array needs array<string>, got ${other.catalogString}")
  }

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "sorted_hash_array"

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.sortedHashes(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.ShingleHashes.sortedHashes($c);")

  override protected def withNewChildInternal(newChild: Expression): SortedHashArray =
    copy(child = newChild)
}

case class SortedLongIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_long_intersect_count needs two array<long>, got ${l.catalogString}, ${r.catalogString}")
    }

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "sorted_long_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleHashes.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.ShingleHashes.intersectCount($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): SortedLongIntersectCount =
    copy(left = newLeft, right = newRight)
}

object ShingleHashes {

  /** Seed shared with Spark's builtin `xxhash64(...)` so exploded
    * per-element keys (`xxhash64(g)`) and array elements built here can
    * never silently disagree about the hash of the same shingle. */
  val Seed = 42L

  def sortedHashArray(arr: Column): Column =
    ColumnBridge.column(SortedHashArray(ColumnBridge.expression(arr)))

  def intersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedLongIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Static forwarder called from generated code: hash every non-null
    * element, sort, drop collision-equal neighbors (keeps the array a
    * SET, the contract [[intersectCount]]'s merge relies on). */
  def sortedHashes(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val hs = new Array[Long](n)
    var i = 0
    var m = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        hs(m) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        m += 1
      }
      i += 1
    }
    java.util.Arrays.sort(hs, 0, m)
    var uniq = 0
    i = 0
    while (i < m) {
      if (i == 0 || hs(i) != hs(i - 1)) { hs(uniq) = hs(i); uniq += 1 }
      i += 1
    }
    val out = new Array[Long](uniq)
    System.arraycopy(hs, 0, out, 0, uniq)
    new GenericArrayData(out)
  }

  /** Linear merge over two sorted long arrays. */
  def intersectCount(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}
