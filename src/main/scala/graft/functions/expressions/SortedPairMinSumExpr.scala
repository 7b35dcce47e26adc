package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `Σ_t min(tf_A(t), tf_B(t))` over two SORTED `array<struct<tok: long,
  * tf: long>>` term-frequency vectors — the weighted-Jaccard numerator —
  * as a linear two-pointer merge.
  *
  * Why an expression: the exploded alternative (candidate pairs ⋈
  * (doc, tok, tf) on doc_a, then ⋈ again on (doc_b, tok), then a pair
  * groupBy) shuffles the pair×token expansion twice and re-aggregates
  * it — three exchanges and two join builds whose ONLY product is one
  * long per pair. With per-doc sorted tf vectors joined to the pair
  * list by plain doc id, the intersection fold is one in-row pass with
  * no allocation, no per-element hashing and no post-join aggregation —
  * the [[SortedIntersectCountExpr]] argument, carried from set to
  * multiset semantics. (r18 VERDICT #1: the exploded shape was the
  * round's only data-bound >2×-of-baseline headline query.)
  *
  * Arithmetic is exact: tf values are longs, the merge adds
  * `min(long, long)` — no double ever decides a threshold downstream
  * (the q_pmi lesson).
  *
  * Both children must be non-null arrays of non-null 2-field long
  * structs, sorted ascending by the FIRST field under signed-long
  * comparison (`array_sort(collect_list(struct(tok, tf)))` order —
  * struct ordering compares field 1 first; tok values are distinct per
  * doc so the tf field never participates).
  */
case class SortedPairMinSumExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedPairMinSumExpr.minSum(
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.SortedPairMinSumExpr$$.MODULE$$.minSum($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedPairMinSumExpr =
    copy(left = newLeft, right = newRight)
}

object SortedPairMinSumExpr {

  /** The shared merge — called per row from both interpreted eval and
    * generated code, keeping the pair-verify stage inside whole-stage
    * codegen. */
  def minSum(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var s = 0L
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2)
      val rb = b.getStruct(j, 2)
      val x = ra.getLong(0)
      val y = rb.getLong(0)
      if (x < y) i += 1
      else if (x > y) j += 1
      else {
        val ta = ra.getLong(1)
        val tb = rb.getLong(1)
        s += (if (ta < tb) ta else tb)
        i += 1
        j += 1
      }
    }
    s
  }
}
