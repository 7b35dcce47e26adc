package graft.functions.expressions

import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Non-overlapping fixed-size token blocks ("pseudo-paragraphs") of
  * lowercased whitespace-tokenized text, space-joined — the per-row split
  * stage of [[graft.dedup.Dedup.dupParagraphFraction]], as one native
  * expression (the [[ShingleExpr]] of block segmentation: same tokenizer
  * fold, chunks instead of sliding windows; the last partial block is
  * kept). NULL for texts with no tokens — the caller's explode drops
  * those rows, as the lambda form's explode_outer + isNotNull did.
  *
  * Why native: the previous `when/transform/slice/array_join` lambda
  * composition was a Catalyst higher-order function — CodegenFallback,
  * which drops the whole corpus-scan stage to the interpreted path (the
  * measured 2x of the round-13 bloom conversion). It also tokenized with
  * Java's `\s` (includes \x0B) while the DuckDB oracle splits on RE2's
  * `\s` (no \x0B) — this fold uses the explicit no-\x0B class, closing
  * that latent cross-engine trap for vertical-tab-bearing corpora. */
case class TokenBlocksExpr(child: Expression, blockTokens: Int)
    extends UnaryExpression {
  require(blockTokens > 0, s"blockTokens must be positive, got $blockTokens")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenBlocksExpr.blocks(input.asInstanceOf[UTF8String], blockTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expressions.TokenBlocksExpr$$.MODULE$$.blocks($c, $blockTokens);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): TokenBlocksExpr =
    copy(child = newChild)
}

object TokenBlocksExpr {

  /** The shared fold — called per row from both interpreted eval and
    * generated code. Returns null for token-less text. */
  def blocks(input: UTF8String, k: Int): GenericArrayData = {
    val text = input.toString.toLowerCase(Locale.ROOT)
    val toks = text.split("[ \\t\\n\\f\\r]+").filter(_.nonEmpty)
    if (toks.length == 0) return null
    val n = (toks.length - 1) / k + 1
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder(64)
    var b = 0
    while (b < n) {
      sb.setLength(0)
      var j = b * k
      val end = math.min(j + k, toks.length)
      while (j < end) {
        if (j > b * k) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(b) = UTF8String.fromString(sb.toString)
      b += 1
    }
    new GenericArrayData(out)
  }
}
