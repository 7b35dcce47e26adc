package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
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
  * constant, not data).
  *
  * Codegen (r12): the codebooks are instance state, so generated code
  * calls back into this expression object via `addReferenceObj` — still
  * a single direct (non-reflective) call per row, and the stage stays in
  * whole-stage codegen. */
case class PqEncodeExpr(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true

  @transient private lazy val c2: Array[Array[Double]] =
    codebooks.map(_.map(c => { var s = 0.0; var i = 0; while (i < c.length) { s += c(i) * c(i); i += 1 }; s }))

  @transient private lazy val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Shared per-row encode — called from interpreted eval and generated
    * code. Null for vectors shorter than m·subDim. */
  def encode(arr: ArrayData): GenericArrayData = {
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

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncodeExpr].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $ref.encode($c);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeExpr =
    copy(child = newChild)
}

/** PQ asymmetric-distance score: `Σ_m ⟨q_sub_m, cb(m)(codes(m))⟩`, the
  * first-stage ranking of a PQ scan — codes only, no corpus vectors.
  * Evaluation order (d ascending within a subspace, m ascending across)
  * mirrors the SQL oracle exactly for bit-stable ordering at the
  * rerank cut. Codegen mirrors [[PqEncodeExpr]]: an `addReferenceObj`
  * callback returning a boxed Double (null for malformed codes),
  * unboxed into the primitive slot. */
case class PqAdcExpr(left: Expression, right: Expression,
                     codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  @transient private lazy val isFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Shared per-row ADC score — called from interpreted eval and
    * generated code. Null for short queries or out-of-range codes. */
  def adc(qa: ArrayData, codes: ArrayData): java.lang.Double = {
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
    java.lang.Double.valueOf(acc)
  }

  override def nullSafeEval(q: Any, codesIn: Any): Any =
    adc(q.asInstanceOf[ArrayData], codesIn.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdc", this, classOf[PqAdcExpr].getName)
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val boxed = ctx.freshName("adcBoxed")
      s"""
        java.lang.Double $boxed = $ref.adc($q, $c);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.doubleValue(); }
      """
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PqAdcExpr =
    copy(left = newLeft, right = newRight)
}
