package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** xxhash64 (seed 42, Spark's `xxhash64` convention) of every element of a
  * string array, as a PRIMITIVE long array.
  *
  * Why an expression and not `transform(arr, x -> xxhash64(x))`: Spark
  * evaluates higher-order functions interpreted, one lambda dispatch per
  * element — measured ~4x slower than this tight loop on shingle-array
  * inputs — and boxes every output. This folds the whole array in one
  * call, hashes each element in place (no byte copies: XXH64 reads the
  * UTF8String's base object directly), and emits `UnsafeArrayData` backed
  * by a primitive long[], the most compact cacheable form.
  *
  * Used by [[graft.dedup.Dedup.ngramJaccard]] to intersect 8-byte shingle
  * hashes instead of corpus-sized shingle strings: set cardinalities are
  * preserved (a 64-bit collision within one document pair's union is
  * ~2^-32-per-4-billion-shingles improbable), so |A∩B| and the resulting
  * jaccard are unchanged while the cached index shrinks ~5x.
  */
case class XxHash64ArrayExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    XxHash64ArrayExpr.hashSorted(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.XxHash64ArrayExpr$$.MODULE$$.hashSorted($c);")

  override protected def withNewChildInternal(newChild: Expression): XxHash64ArrayExpr =
    copy(child = newChild)
}

object XxHash64ArrayExpr {

  /** The shared fold — called per row from both interpreted eval and
    * generated code (keeps the stage in whole-stage codegen). */
  def hashSorted(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      out(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    // Sorted output: set cardinalities are order-invariant, and sorting
    // once at index-build time lets every downstream pair intersection run
    // as a linear merge ([[SortedIntersectCountExpr]]) instead of a
    // per-pair hash set.
    java.util.Arrays.sort(out)
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}
