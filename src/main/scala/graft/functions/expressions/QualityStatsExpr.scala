package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The per-document counters behind [[graft.functions.TextFunctions
  * .qualityScore]] in ONE row pass:
  * `struct<n_len, n_tokens, n_alpha, n_digits, n_punct, n_stop>`.
  *
  * Each counter is DEFINED as the regex count the former Column chain
  * computed, so the score derived from this struct (same Catalyst double
  * arithmetic, see qualityScore) is bit-identical to the old five-pass
  * form — and therefore to the DuckDB oracle, which still replays the
  * regex formula:
  *  - n_len: `length(text)` — UNICODE CODE POINTS (UTF8String.numChars).
  *  - n_tokens: `regexp_count(text, '[^ \t\n\f\r]+')` — maximal non-ws
  *    runs (RE2 `\s` = the explicit class, never Java `\s` — the
  *    TokenTfExpr contract).
  *  - n_alpha / n_digits: `regexp_count(text, '[A-Za-z]')` / `'[0-9]'`.
  *  - n_punct: `regexp_count(text, '[^A-Za-z0-9 \t\n\f\r]')` — counts
  *    CODE POINTS (java.util.regex char classes match per code point, so
  *    an astral char is ONE match even though it is two UTF-16 units).
  *  - n_stop: `regexp_count(lower(text), '\b(the|and|of|to|in|is|it|that|
  *    for|with)\b')`. Lowercasing is UTF8String.toLowerCase — the exact
  *    Lower-expression path. Java's `\b` (unlike Java's `\w`) is
  *    Unicode-aware even without UNICODE_CHARACTER_CLASS: a boundary
  *    exists where `ch == '_' || Character.isLetterOrDigit(ch)` flips
  *    (JDK Pattern$Bound), so 'é' CONTINUES a word run here — the scan
  *    replicates that, not the ASCII `[A-Za-z0-9_]` class. A stopword
  *    can only match as a WHOLE word run (boundaries exist only at run
  *    edges), so the count is the number of runs equal to a stopword.
  *
  * Why an expression: the five regexp_count calls were five full regex
  * scans over the text per row — and q_psi_drift pays them TWICE per row
  * (base + drifted score). This was the suite's worst scale exponent
  * (0.43, r20 trajectory) and its CPU is pure regex machinery, not query
  * work. One branch-free char pass + one word-run pass over the lowered
  * text replace them (the GopherStatsExpr/C4StatsExpr precedent).
  * NULL for null text (the regex chain null-propagates identically).
  */
case class QualityStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = QualityStatsExpr.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    QualityStatsExpr.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.QualityStatsExpr$$.MODULE$$.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): QualityStatsExpr =
    copy(child = newChild)
}

object QualityStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_len", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_digits", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))

  // TextFunctions.stopwords("en") — the inventory qualityScore counts.
  private val stopSet = new java.util.HashSet[String](
    java.util.Arrays.asList(
      "the", "and", "of", "to", "in", "is", "it", "that", "for", "with"))
  private val maxStopLen = 4 // "that"/"with"

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  // JDK Pattern$Bound.isWord without UNICODE_CHARACTER_CLASS.
  private def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** The shared single pass — called per document from both interpreted
    * eval and generated code. */
  def stats(input: UTF8String): GenericInternalRow = {
    val raw = input.toString
    val n = raw.length

    // --- pass 1 (raw text, one scan): tokens / alpha / digits / punct ---
    var nTok = 0
    var nAlpha = 0
    var nDigit = 0
    var nPunct = 0
    var inTok = false
    var i = 0
    while (i < n) {
      val c = raw.charAt(i)
      if (isWs(c)) inTok = false
      else {
        if (!inTok) { nTok += 1; inTok = true }
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) nAlpha += 1
        else if (c >= '0' && c <= '9') nDigit += 1
        else if (Character.isHighSurrogate(c) && i + 1 < n &&
          Character.isLowSurrogate(raw.charAt(i + 1))) {
          nPunct += 1 // the astral code point is ONE regex match
          i += 1      // consume the low half (still non-ws: run continues)
        } else nPunct += 1
      }
      i += 1
    }

    // --- pass 2 (lowered text): whole-run stopword hits ---
    val low = input.toLowerCase.toString
    val m = low.length
    var nStop = 0
    var j = 0
    while (j < m) {
      val cp = low.codePointAt(j)
      if (isWordCp(cp)) {
        val start = j
        j += Character.charCount(cp)
        var cont = true
        while (cont && j < m) {
          val c2 = low.codePointAt(j)
          if (isWordCp(c2)) j += Character.charCount(c2) else cont = false
        }
        // stopwords are pure ASCII of <= 4 units; a longer or non-ASCII
        // run can never equal one, so the substring is bounded
        if (j - start <= maxStopLen && stopSet.contains(low.substring(start, j)))
          nStop += 1
      } else j += Character.charCount(cp)
    }

    new GenericInternalRow(Array[Any](
      input.numChars(), nTok, nAlpha, nDigit, nPunct, nStop))
  }
}
