package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| of two SORTED long arrays, as a linear two-pointer merge.
  *
  * Why an expression and not `size(array_intersect(a, b))`: array_intersect
  * builds a hash set over one side and an output array of the matches per
  * ROW — for a candidate-pair similarity join that is two allocations and
  * a hash probe per element, per pair, only to take the result's size and
  * throw the array away. The merge needs no set, no output array, and no
  * per-element hashing: with both inputs sorted (they are built sorted at
  * index time — [[XxHash64ArrayExpr]] emits sorted hashes) the count is one
  * pass over both arrays. Measured ~4x less CPU on the ngram-jaccard
  * pair-intersection stage, the most expensive stage of the dedup bench.
  *
  * Duplicate elements: inputs are distinct by construction (hashes of an
  * `array_distinct` set); if a 64-bit collision ever produced a duplicate,
  * the merge counts min(multiplicity) per value — same as set semantics on
  * the collision-free side.
  *
  * Both children must be non-null arrays of non-null longs, sorted
  * ascending by SIGNED long comparison (Arrays.sort / array_sort order).
  */
case class SortedIntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedIntersectCountExpr.count(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.SortedIntersectCountExpr$$.MODULE$$.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountExpr =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCountExpr {

  /** The shared merge — called per row from both interpreted eval and
    * generated code (keeps the pair-intersection stage, the most
    * expensive dedup stage, inside whole-stage codegen). */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1L; i += 1; j += 1 }
    }
    c
  }
}
