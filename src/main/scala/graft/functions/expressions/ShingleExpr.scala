package graft.functions.expressions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  * CodegenFallback is fine here: one virtual call per row, with all the
  * hot work inside plain JVM string code.
  */
case class ShingleExpr(child: Expression, n: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase(Locale.ROOT)
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

  override protected def withNewChildInternal(newChild: Expression): ShingleExpr =
    copy(child = newChild)
}
