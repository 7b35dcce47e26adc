package graft.functions.expressions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of lowercased whitespace-tokenized text, as one
  * per-row native expression.
  *
  * Semantically identical to the Column composition
  * `wordShingles(tokens(text), n)` (= filter(split(lower(text), "\s+"))
  * then sliding n-grams joined with single spaces; empty array when fewer
  * than n tokens) — but evaluated in a single pass per ROW instead of an
  * interpreted lambda per token/position, which is what makes shingling
  * 100 TB of documents a scan-bound operation rather than a CPU cliff.
  *
  * Codegen (r12): `doGenCode` emits a direct static call so the stage
  * stays in whole-stage codegen — a CodegenFallback anywhere in a stage
  * pushes the WHOLE stage onto the interpreted path (measured ~15-20
  * µs/row of overhead on every downstream operator, JFR r12).
  */
case class ShingleExpr(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShingleExpr.shingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.ShingleExpr$$.MODULE$$.shingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleExpr =
    copy(child = newChild)
}

object ShingleExpr {

  /** The shared fold — called per row from both interpreted eval and
    * generated code. */
  def shingles(input: UTF8String, n: Int): GenericArrayData = {
    val text = input.toString.toLowerCase(Locale.ROOT)
    val toks = text.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty) // RE2 \\s subset: no \\x0B
    if (toks.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](toks.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
