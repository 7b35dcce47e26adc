package graft.functions.expressions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * a 64-bit polynomial ROLLING hash over character `k`-grams of the
  * lowercased text (each step is one multiply-add-subtract — O(n) total,
  * not O(n·k)), then the minimum hash of every `w`-sized window, deduped.
  * Guarantees any shared substring of length ≥ w+k−1 yields a shared
  * fingerprint — the plagiarism/near-dup detection primitive.
  *
  * Returns array<bigint>, sorted ascending for deterministic output.
  * One native eval per row; all hot work in a tight JVM loop.
  */
case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {

  // Fail fast on the driver: w <= 0 would walk the min-deque head past its
  // tail into zero-initialized slots (out-of-bounds reads / garbage
  // fingerprints deep in an executor), k <= 0 hashes nothing meaningful.
  require(k >= 1 && w >= 1, s"winnow needs k >= 1 and w >= 1, got k=$k w=$w")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WinnowExpr.winnow(input.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.WinnowExpr$$.MODULE$$.winnow($c, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}

/** The positional rolling k-gram hash stream `WinnowExpr` folds —
  * array<bigint>, hs(i) over chars [i, i+k). Exposed so the oracle can
  * stage the stream and replay the winnow selection (w-window minima,
  * distinct values) as plain SQL window arithmetic: the tie rule only
  * picks WHICH index supplies a minimum, never its value, so the
  * selected-value set is exactly `distinct(min over w-row frames)`. */
case class KgramHashesExpr(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, s"k-gram hashes need k >= 1, got k=$k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WinnowExpr.kgramHashesData(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.WinnowExpr$$.MODULE$$.kgramHashesData($c, $k);")

  override protected def withNewChildInternal(newChild: Expression): KgramHashesExpr =
    copy(child = newChild)
}

object WinnowExpr {

  private val B = 1000000007L // polynomial base

  /** The rolling k-gram hash stream, positional: hs(i) hashes chars
    * [i, i+k) of the lowercased text. Shared by the winnow fold and by
    * [[KgramHashesExpr]] (the oracle-stage view of the same stream). */
  def kgramHashes(input: UTF8String, k: Int): Array[Long] = {
    val s = input.toString.toLowerCase(Locale.ROOT)
    val n = s.length
    if (n < k) return Array.emptyLongArray
    val m = n - k + 1
    val hs = new Array[Long](m)
    var h = 0L
    var pow = 1L // B^(k-1)
    var i = 0
    while (i < k) {
      h = h * B + s.charAt(i)
      if (i < k - 1) pow *= B
      i += 1
    }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - s.charAt(i - 1) * pow) * B + s.charAt(i + k - 1)
      hs(i) = h
      i += 1
    }
    hs
  }

  /** Boxed view of [[kgramHashes]] for the stage expression. */
  def kgramHashesData(input: UTF8String, k: Int): GenericArrayData = {
    val hs = kgramHashes(input, k)
    val out = new Array[Any](hs.length)
    var i = 0
    while (i < hs.length) { out(i) = hs(i); i += 1 }
    new GenericArrayData(out)
  }

  /** The shared fold — called per row from both interpreted eval and
    * generated code (keeps the stage in whole-stage codegen). */
  def winnow(input: UTF8String, k: Int, w: Int): GenericArrayData = {
    val hs = kgramHashes(input, k)
    val m = hs.length
    if (m == 0) return new GenericArrayData(Array.empty[Any])
    // winnow: min of each w-window (rightmost min on ties, per the paper),
    // via a monotonic deque — O(m) total, not O(m·w). Popping `>=` on push
    // makes the surviving front the RIGHTMOST minimal index of its window,
    // matching the paper's tie rule.
    val sel = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) {
      var best = 0
      var j = 1
      while (j < m) { if (hs(j) <= hs(best)) best = j; j += 1 }
      sel.add(hs(best))
    } else {
      val dq = new Array[Int](m)
      var head = 0
      var tail = 0
      var j = 0
      while (j < m) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j
        tail += 1
        val start = j - w + 1
        if (start >= 0) {
          while (dq(head) < start) head += 1
          sel.add(hs(dq(head)))
        }
        j += 1
      }
    }
    val out = new Array[Any](sel.size)
    val it = sel.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next().longValue(); o += 1 }
    new GenericArrayData(out)
  }
}
