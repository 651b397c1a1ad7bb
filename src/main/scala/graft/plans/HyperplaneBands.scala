package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All `bands` random-hyperplane sign-band keys of an embedding in ONE
  * native pass — the fifth-rung key family of
  * [[graft.operators.Dedup.embeddingNearDup]] (see `embGeometryFor`).
  *
  * Bit j of band b's key is set iff Σ_d sign(b,j,d)·q_d ≥ 0 over the
  * integer lattice q_d = floor(x_d·1024) (exact in IEEE double — the
  * scale is a power of two; missing/null dims contribute 0), with ±1
  * signs from murmur3's 64-bit finalizer ([[HyperplaneBands.sign]]).
  * All-int64 arithmetic: no overflow at any realistic magnitude, so the
  * sum is associative and the DuckDB oracle — which inlines the same ±
  * terms as explicit SQL over the same quantization — agrees
  * bit-for-bit regardless of either engine's summation shape.
  *
  * Why native: the column-algebra form (one `zip_with`+`aggregate` pair
  * per bit) kept the math exact but ran as INTERPRETED higher-order
  * functions — 96 lambda plans at 12×8, measured ~28 s at the 100×
  * decade and ~3 s of fixed plan cost at any scale. Here the whole
  * bands×bits×dims loop is one static JIT-compiled call inside
  * whole-stage codegen (`doGenCode` emits a single call into
  * [[HyperplaneBands.compute]] — the [[SimHash64]]/[[MinHashHex]]
  * discipline), the sign matrix is precomputed once per (bands, bits)
  * per JVM, and the vector is quantized once per row. */
case class HyperplaneBands(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bands needs array<float>, got ${other.catalogString}")
    }

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "hyperplane_bands"

  override def nullSafeEval(input: Any): Any =
    HyperplaneBands.compute(input.asInstanceOf[ArrayData], bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.HyperplaneBands.compute($c, $bands, $bits);")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object HyperplaneBands {

  def hyperplaneBands(emb: Column, bands: Int, bits: Int): Column =
    ColumnBridge.column(HyperplaneBands(ColumnBridge.expression(emb), bands, bits))

  /** The sign-bit dimension budget: planes span dims 0 until 63; shorter
    * vectors contribute 0 for the missing dims, longer ones have their
    * tail ignored — mirrored by the oracle's COALESCE(qe[d], 0) over
    * d = 1..64. */
  val Dim = 64

  /** The fixed-point lattice scale — a power of two, so `x·1024` is
    * exact for every float x and `floor` of it is engine-independent. */
  val QuantScale = 1024

  /** Deterministic ±1 hyperplane weight for (band, bit, dim): murmur3's
    * 64-bit finalizer (public avalanche constants) over a collision-free
    * plane×dim index, parity of the mixed value. A cheap
    * linear-congruential bit is NOT enough — with the index stepping by
    * 1 per dim and 64 per plane, a single mixed bit is one fixed
    * sequence sampled at shifted phases and the planes come out as
    * shifted copies of each other (measured max inter-plane |corr| 1.0,
    * near-dup recall 0.82 instead of the independent-band 0.98); the
    * avalanche mix decorrelates them (max |corr| 0.5 — the
    * random-matrix ambient level at d=64 — recall 0.99, measured in
    * DedupSpec). Pure wrapping-Long arithmetic, identical on any JVM;
    * the oracle inlines the RESULTING ±1 literals, so no other engine
    * ever recomputes this. */
  def sign(band: Int, bit: Int, d: Int): Int = {
    var h = (band.toLong * 64 + bit) * 64 + d
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    if ((h & 1L) == 0L) 1 else -1
  }

  // sign matrices are tiny ((bands·bits)×64 longs) and geometry-keyed;
  // one per (bands, bits) per JVM, shared across all executor threads
  private val matrices =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Array[Long]]]()

  private def matrixFor(bands: Int, bits: Int): Array[Array[Long]] =
    matrices.computeIfAbsent((bands, bits), { case (bn, bt) =>
      Array.tabulate(bn * bt, Dim)((p, d) => sign(p / bt, p % bt, d).toLong)
    })

  /** Static forwarder called from generated code. Quantizes the vector
    * once (null elements and dims past the vector's length contribute
    * 0, dims past [[Dim]] are ignored), then packs each band's key from
    * its bits' integer projections. */
  def compute(arr: ArrayData, bands: Int, bits: Int): ArrayData = {
    val m = matrixFor(bands, bits)
    val q = new Array[Long](Dim)
    val n = math.min(arr.numElements(), Dim)
    var d = 0
    while (d < n) {
      if (!arr.isNullAt(d))
        q(d) = math.floor(arr.getFloat(d).toDouble * QuantScale).toLong
      d += 1
    }
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < bits) {
        val signs = m(b * bits + j)
        var proj = 0L
        var i = 0
        while (i < Dim) { proj += signs(i) * q(i); i += 1 }
        if (proj >= 0) key |= 1L << j
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }
}
