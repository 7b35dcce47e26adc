package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as one native per-row expression — the
  * text-canonicalization step a crawl pipeline runs BEFORE any
  * hash-keyed operator (exact dedup, fingerprints, shingles): the same
  * visible text arrives from the web in composed ("é") and decomposed
  * ("e" + U+0301) forms, which hash differently until normalized, so
  * un-normalized corpora silently under-dedup.
  *
  * NFC (not NFK*) — canonical composition only, no compatibility
  * folding, so the text content is unchanged, merely re-encoded; this
  * is also exactly what DuckDB's `nfc_normalize` computes, giving the
  * gate a bit-exact oracle. Backed by the JDK's `java.text.Normalizer`
  * (Unicode-standard algorithm, locale-independent).
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan that returns
  * true for pure-ASCII and already-composed text — the overwhelming
  * majority of real corpora — in which case the input UTF8String is
  * returned as-is with ZERO allocation; only rows that actually need
  * composition pay the String round-trip. Codegen'd (static call, same
  * pattern as [[ShingleExpr]]) so scans carrying it stay whole-stage. */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NfcNormalizeExpr.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.NfcNormalizeExpr$$.MODULE$$.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}

object NfcNormalizeExpr {

  /** Shared per-row kernel (interpreted eval + generated code). */
  def nfc(input: UTF8String): UTF8String = {
    val s = input.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }
}
