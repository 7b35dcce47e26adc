package graft.functions.expressions

import java.security.MessageDigest
import java.util.Locale

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of whitespace-tokenized lowercased text, in ONE pass
  * per row (reference semantics: simhash near-dup candidacy; the
  * construction is Charikar's classic bit-vote).
  *
  * Per token, the 64 hash bits come from the first 8 BYTES of
  * `md5(token)`: bit j = (digest[j/8] >> (j%8)) & 1 — chosen over
  * xxhash64 so the DuckDB oracle can replicate the value exactly from
  * `md5()` hex (see OracleSql's q_dedup_simhash). Bit j of the result is
  * set iff Σ_tokens (2·bit_j − 1) ≥ 0.
  *
  * Tokenization matches TextFunctions.tokens / ShingleExpr: lowercase,
  * split on \s+, drop empties. NULL for token-less text (such docs have
  * no simhash row, as the old explode-based build dropped them).
  *
  * Like [[MinhashSigsExpr]], running the fold inside the projection
  * removes the token explode and the 64-column aggregation SHUFFLE — the
  * simhash build is a pure scan at any corpus size.
  *
  * Codegen (r12): the shared fold returns a boxed Long (null for
  * token-less text); generated code unboxes into the primitive slot and
  * reflects null into `ev.isNull`, keeping the stage in whole-stage
  * codegen.
  */
case class SimhashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimhashExpr.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("simhashBoxed")
      s"""
        java.lang.Long $boxed =
          graft.functions.expressions.SimhashExpr$$.MODULE$$.simhash($c);
        if ($boxed == null) { ${ev.isNull} = true; }
        else { ${ev.value} = $boxed.longValue(); }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashExpr =
    copy(child = newChild)
}

object SimhashExpr {

  private val mdLocal = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** The shared fold — called per row from both interpreted eval and
    * generated code. Null for token-less text. */
  def simhash(input: UTF8String): java.lang.Long = {
    val text = input.toString.toLowerCase(Locale.ROOT)
    val toks = text.split("[ \\t\\n\\f\\r]+") // RE2 \\s subset: no \\x0B, matches the SQL oracle
    val md = mdLocal.get()
    val sums = new Array[Int](64)
    var any = false
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.nonEmpty) {
        any = true
        val dig = md.digest(t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        var j = 0
        while (j < 64) {
          val bit = (dig(j >> 3) >> (j & 7)) & 1
          sums(j) += (2 * bit - 1)
          j += 1
        }
      }
      i += 1
    }
    if (!any) null
    else {
      var out = 0L
      var j = 0
      while (j < 64) {
        if (sums(j) >= 0) out |= (1L << j)
        j += 1
      }
      java.lang.Long.valueOf(out)
    }
  }
}
