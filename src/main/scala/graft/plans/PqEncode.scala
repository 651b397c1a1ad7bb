package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.transform
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Product-quantization encoder as a native expression: maps an
  * `array<double>` embedding to its `array<int>` of per-subspace codes
  * (argmin squared-L2 against the codebook, ties to the LOWEST code).
  *
  * Exists for the same reason as [[WordShingles]]: the pure-builtin
  * formulation — `array(16 distance expressions) → array_min →
  * array_position` per subspace — expands to ~1024 scalar expression
  * leaves per row. That tree blew straight past what Janino compiles
  * comfortably: the PQ queries measured 21 s (pq_code_stats) and 11 s
  * (ann_ivfpq_topk) at sf0.1 where their IVF siblings run in ~2 s, with
  * 41 s cold. Here the whole encode is three tight loops in one static
  * helper the generated stage calls directly.
  *
  * Numeric contract (oracle parity): the inner distance accumulation is a
  * strict left-to-right double sum over `(e[m·s+d] − c[d])²` — the same
  * IEEE sequence as the DuckDB oracle's ordered
  * `list_sum(list_transform(range(s), …))`, and the strict `<` best-keep
  * reproduces row_number's `ORDER BY dist, code` first-minimum
  * tie-break. Bit-identical by construction to the expression tree it
  * replaced (spec-pinned in OperatorSpec).
  *
  * A shorter-than-`subspaces·subDim` (or degenerate) input encodes to an
  * EMPTY code array rather than null — every caller filters to full-dim
  * vectors first, and empty-on-malformed keeps the expression
  * null-intolerant and ANSI-safe. */
case class PqEncode(child: Expression, flatBooks: Seq[Double],
                    subspaces: Int, subDim: Int, nCodes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullIntolerant: Boolean = true

  override def prettyName: String = "pq_encode"

  @transient private lazy val booksArr: Array[Double] = flatBooks.toArray

  override def nullSafeEval(input: Any): Any =
    PqEncode.compute(input.asInstanceOf[ArrayData], booksArr, subspaces, subDim, nCodes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", booksArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PqEncode.compute($c, $booksRef, $subspaces, $subDim, $nCodes);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {

  /** Static encode helper shared by interpreted eval and generated code
    * (Java-friendly signature, like [[WordShingles.compute]]). */
  def compute(emb: ArrayData, books: Array[Double],
              subspaces: Int, subDim: Int, nCodes: Int): ArrayData = {
    val dim = subspaces * subDim
    if (emb.numElements() < dim)
      return new GenericArrayData(Array.empty[Any])
    // a full-length array can still carry null ELEMENTS (callers filter on
    // length only): encode to the same empty-on-malformed sentinel as the
    // short-vector case rather than reading nulls as garbage/0.0
    var p = 0
    while (p < dim) {
      if (emb.isNullAt(p)) return new GenericArrayData(Array.empty[Any])
      p += 1
    }
    val out = new Array[Any](subspaces)
    var m = 0
    while (m < subspaces) {
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < nCodes) {
        val base = (m * nCodes + j) * subDim
        var d = 0.0
        var t = 0
        while (t < subDim) {
          val diff = emb.getDouble(m * subDim + t) - books(base + t)
          d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(m) = best
      m += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: accepts a float or double array (floats cast up, same
    * promotion as the oracle's `embedding[i]::DOUBLE`); `books` is the
    * `[subspace][code][dim]` codebook tensor. */
  def codes(embedding: Column, books: Array[Array[Array[Float]]]): Column = {
    val flat: Seq[Double] = books.flatMap(_.flatMap(_.map(_.toDouble))).toSeq
    ColumnBridge.column(PqEncode(
      ColumnBridge.expression(transform(embedding, x => x.cast("double"))),
      flat, books.length, books.headOption.flatMap(_.headOption).map(_.length).getOrElse(0),
      books.headOption.map(_.length).getOrElse(0)))
  }
}
