package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** PQ encode: nearest codebook centroid per subspace, one pass per row.
  *
  * `codes(m) = argmax_j (2·⟨sub_m, cb(m)(j)⟩ − |cb(m)(j)|²)` (⇔ nearest
  * by L2; ties → lowest j, matching the IVF assignment rule and its SQL
  * oracle's `ORDER BY sc DESC, cid ASC`). Embedding elements are widened
  * float→double per element, centroid math is double — bit-identical to
  * the DuckDB formulation. Codebooks ship inside the expression (driver
  * literals, executor-local after serialization — an index-build
  * constant, not data). */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val c2: Array[Array[Double]] =
    codebooks.map(_.map(c => { var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s }))

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    if (arr.numElements() < m * subDim) return null
    val out = new Array[Any](m)
    var mi = 0
    while (mi < m) {
      val book = codebooks(mi)
      val norms = c2(mi)
      var best = 0
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < book.length) {
        val cb = book(j)
        var dot = 0.0
        var d = 0
        while (d < subDim) {
          val idx = mi * subDim + d
          val v = if (isFloat) arr.getFloat(idx).toDouble else arr.getDouble(idx)
          dot += v * cb(d)
          d += 1
        }
        val sc = 2.0 * dot - norms(j)
        if (sc > bestScore) { bestScore = sc; best = j } // strict: ties keep lowest j
        j += 1
      }
      out(mi) = best
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** PQ asymmetric-distance score: `Σ_m ⟨q_sub_m, cb(m)(codes(m))⟩`, the
  * first-stage ranking of a PQ scan — codes only, no corpus vectors.
  * Evaluation order (d ascending within a subspace, m ascending across)
  * mirrors the SQL oracle exactly for bit-stable ordering at the
  * rerank cut. */
case class PqAdcExpr(left: Expression, right: Expression,
                     codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(q: Any, codesIn: Any): Any = {
    val qa = q.asInstanceOf[ArrayData]
    val codes = codesIn.asInstanceOf[ArrayData]
    val m = codebooks.length
    val subDim = codebooks(0)(0).length
    if (qa.numElements() < m * subDim || codes.numElements() < m) return null
    var acc = 0.0
    var mi = 0
    while (mi < m) {
      val code = codes.getInt(mi)
      // codes not produced by PqEncodeExpr (or built against a different
      // codebookSize) must yield NULL, not an executor-side AIOOBE
      if (code < 0 || code >= codebooks(mi).length) return null
      val cb = codebooks(mi)(code)
      var dot = 0.0
      var d = 0
      while (d < subDim) {
        val idx = mi * subDim + d
        val v = if (isFloat) qa.getFloat(idx).toDouble else qa.getDouble(idx)
        dot += v * cb(d)
        d += 1
      }
      acc += dot
      mi += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}
