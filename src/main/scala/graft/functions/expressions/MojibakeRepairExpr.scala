package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mojibake repair as one native per-row expression — the ftfy
  * ("fix text for you") step real crawl pipelines run during extraction:
  * UTF-8 text that some upstream system decoded as cp1252/latin-1 arrives
  * as "cafÃ©" / "â€œquotedâ€"; left unfixed it poisons tokenizers,
  * language ID, and every hash-keyed dedup (the same article corrupted
  * and clean never dedups).
  *
  * The repair rule is the deterministic core of ftfy's main fixer:
  * re-encode the string through the cp1252 INVERSE (with the latin-1
  * fallback for the five bytes cp1252 leaves undefined — "sloppy
  * cp1252", exactly what lenient decoders emit), then strictly decode as
  * UTF-8. The repair applies ONLY when every char maps to a byte AND the
  * byte sequence is valid multi-byte UTF-8 — legitimate accented text
  * ("São Paulo é ótimo") fails the strict decode (its accented bytes are
  * not valid UTF-8 lead/continuation runs) and passes through UNCHANGED,
  * so the fixer has no false positives by construction, not by
  * heuristics. Applied twice for doubly-mojibaked text (encode-decode
  * round-tripped through two bad layers), the ftfy default depth.
  *
  * Pure function of the input string — deterministic on any engine/JVM
  * (the cp1252 table is fixed by the spec). Not SQL-replicable (DuckDB
  * has no cp1252 codec), so gates are rows-only with the
  * repair∘corrupt = identity property spec-pinned. Codegen'd (static
  * call, the [[NfcNormalizeExpr]] pattern). */
case class MojibakeRepairExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MojibakeRepairExpr.repair(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.MojibakeRepairExpr$$.MODULE$$.repair($c);")

  override protected def withNewChildInternal(newChild: Expression): MojibakeRepairExpr =
    copy(child = newChild)
}

object MojibakeRepairExpr {

  /** cp1252 inverse for the 0x80–0x9F specials (char -> byte); every
    * other char <= 0xFF maps to its own code point (latin-1), and chars
    * U+0080–U+009F map to their own byte too (the lenient-decoder
    * fallback that makes corrupt∘repair a true inverse). */
  private val cp1252Inverse: java.util.HashMap[Char, Byte] = {
    val m = new java.util.HashMap[Char, Byte]()
    val specials = Array(
      0x80 -> '€', 0x82 -> '‚', 0x83 -> 'ƒ', 0x84 -> '„',
      0x85 -> '…', 0x86 -> '†', 0x87 -> '‡', 0x88 -> 'ˆ',
      0x89 -> '‰', 0x8A -> 'Š', 0x8B -> '‹', 0x8C -> 'Œ',
      0x8E -> 'Ž', 0x91 -> '‘', 0x92 -> '’', 0x93 -> '“',
      0x94 -> '”', 0x95 -> '•', 0x96 -> '–', 0x97 -> '—',
      0x98 -> '˜', 0x99 -> '™', 0x9A -> 'š', 0x9B -> '›',
      0x9C -> 'œ', 0x9E -> 'ž', 0x9F -> 'Ÿ')
    specials.foreach { case (b, c) => m.put(c, b.toByte) }
    m
  }

  /** Forward "sloppy" cp1252 decode table (byte -> char): the specials
    * for 0x80–0x9F, latin-1 identity elsewhere, and the five bytes
    * cp1252 leaves undefined (81 8D 8F 90 9D) mapped to their latin-1
    * control chars — what lenient real-world decoders emit (Java's
    * strict decoder substitutes U+FFFD, destroying information). */
  private val cp1252Forward: Array[Char] = {
    val t = Array.tabulate(256)(_.toChar)
    val it = cp1252Inverse.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      t(e.getValue & 0xFF) = e.getKey
    }
    t
  }

  /** The exact inverse of the repair's encode step — corrupt UTF-8 bytes
    * the way a broken extractor does. Gates and specs use this to plant
    * mojibake that the repair must invert exactly. */
  def sloppyCp1252Decode(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      sb.append(cp1252Forward(bytes(i) & 0xFF))
      i += 1
    }
    sb.toString
  }

  /** One repair attempt: cp1252-inverse encode + strict UTF-8 decode.
    * Returns null when the string is not mojibake by the rule (a char
    * with no byte image, an invalid UTF-8 byte run, or a pure-ASCII
    * no-op). */
  private def repairOnce(s: String): String = {
    val n = s.length
    val bytes = new Array[Byte](n)
    var i = 0
    var nonAscii = false
    while (i < n) {
      val c = s.charAt(i)
      if (c < 0x80) bytes(i) = c.toByte
      else {
        nonAscii = true
        if (c <= 0xFF) bytes(i) = c.toByte
        else {
          if (!cp1252Inverse.containsKey(c)) return null
          bytes(i) = cp1252Inverse.get(c)
        }
      }
      i += 1
    }
    if (!nonAscii) return null
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
    try {
      val out = dec.decode(java.nio.ByteBuffer.wrap(bytes)).toString
      if (out == s) null else out
    } catch { case _: java.nio.charset.CharacterCodingException => null }
  }

  /** Shared per-row kernel (interpreted eval + generated code): up to two
    * repair rounds (ftfy's default depth for doubly-encoded text); input
    * returned as-is — zero allocation — when no round applies. */
  def repair(input: UTF8String): UTF8String = {
    val s0 = input.toString
    val r1 = repairOnce(s0)
    if (r1 == null) return input
    val r2 = repairOnce(r1)
    UTF8String.fromString(if (r2 == null) r1 else r2)
  }
}
