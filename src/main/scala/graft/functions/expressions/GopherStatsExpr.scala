package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The per-document counters behind the Gopher quality-rule filter set
  * (Rae et al. 2021, §A1.1) in ONE row pass:
  * `struct<n_words, n_chars, n_alpha, n_stop, n_lines, n_bullet,
  * n_ellipsis, n_symbols>`.
  *
  * Definitions (each mirrored verbatim in the DuckDB oracle —
  * OracleSql.q_gopher_rules — so every count is cross-engine exact):
  *  - words: the repo's tokenizer contract — lowercase(Locale.ROOT),
  *    split on RE2 `\s` = [ \t\n\f\r] (NOT Java \s — see TokenTfExpr),
  *    empties dropped. `n_chars` sums their UNICODE CODE POINT lengths
  *    (DuckDB `len()` counts code points; String.length would count
  *    UTF-16 units and diverge on astral text).
  *  - n_alpha: words containing at least one ASCII letter a–z (the
  *    oracle's `regexp_matches(x, '[a-z]')` on lowercased tokens).
  *  - n_stop: how many of Gopher's 8 required stopwords (the, be, to,
  *    of, and, that, have, with) occur as a token — presence, not count.
  *  - lines: raw text split on '\n' (`string_split(text, chr(10))`);
  *    n_bullet counts lines whose space/tab-ltrimmed form starts with
  *    '-', '*', or '•' (U+2022); n_ellipsis counts lines whose
  *    space/tab-rtrimmed form ends with "...".
  *  - n_symbols: '#' occurrences plus NON-OVERLAPPING left-to-right
  *    "..." occurrences in the raw text (= the oracle's
  *    `len - len(replace(...))` arithmetic, which is also
  *    non-overlapping left-to-right).
  *
  * Why an expression: eight counters over the same text are eight
  * Catalyst higher-order functions (all CodegenFallback — the whole scan
  * stage drops to the interpreted path, the q_contamination_bloom
  * lesson) or one shared single pass that stays inside whole-stage
  * codegen. NULL for null text; empty text yields zero words (callers
  * drop word-less docs, matching the oracle's len(w) >= 1 gate).
  */
case class GopherStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherStatsExpr.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    GopherStatsExpr.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.GopherStatsExpr$$.MODULE$$.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

object GopherStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_chars", LongType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_bullet", IntegerType, nullable = false),
    StructField("n_ellipsis", IntegerType, nullable = false),
    StructField("n_symbols", LongType, nullable = false)))

  // Gopher's required-stopword list, Rae et al. 2021 §A1.1.
  private val stopwords =
    Set("the", "be", "to", "of", "and", "that", "have", "with")

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  /** The shared single pass — called per document from both interpreted
    * eval and generated code. */
  def stats(input: UTF8String): GenericInternalRow = {
    val raw = input.toString
    val text = raw.toLowerCase(java.util.Locale.ROOT)

    // --- word-level counters (lowercased, RE2-\s tokenized) ---
    var nWords = 0
    var nChars = 0L
    var nAlpha = 0
    val stopsSeen = new java.util.HashSet[String](16)
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      val start = i
      var hasAlpha = false
      while (i < len && !isWs(text.charAt(i))) {
        val c = text.charAt(i)
        if (c >= 'a' && c <= 'z') hasAlpha = true
        i += 1
      }
      if (i > start) {
        nWords += 1
        nChars += text.codePointCount(start, i)
        if (hasAlpha) nAlpha += 1
        // bounded: only the 8 stopword candidates are ever materialized
        if (i - start <= 4) {
          val w = text.substring(start, i)
          if (stopwords.contains(w)) stopsSeen.add(w)
        }
      }
    }

    // --- line-level counters (RAW text, '\n' split) ---
    var nLines = 0
    var nBullet = 0
    var nEllipsis = 0
    var ls = 0
    val rlen = raw.length
    while (ls <= rlen) {
      var le = raw.indexOf('\n', ls)
      if (le < 0) le = rlen
      nLines += 1
      // ltrim(' ','\t') → bullet start?
      var a = ls
      while (a < le && (raw.charAt(a) == ' ' || raw.charAt(a) == '\t')) a += 1
      if (a < le) {
        val c = raw.charAt(a)
        if (c == '-' || c == '*' || c == '•') nBullet += 1
      }
      // rtrim(' ','\t') → "..." end?
      var b = le
      while (b > ls && (raw.charAt(b - 1) == ' ' || raw.charAt(b - 1) == '\t')) b -= 1
      if (b - ls >= 3 && raw.charAt(b - 1) == '.' && raw.charAt(b - 2) == '.' &&
        raw.charAt(b - 3) == '.') nEllipsis += 1
      ls = le + 1
    }

    // --- symbol counters (raw text; "..." non-overlapping L-to-R) ---
    var nSymbols = 0L
    var k = 0
    while (k < rlen) {
      val c = raw.charAt(k)
      if (c == '#') { nSymbols += 1; k += 1 }
      else if (c == '.' && k + 2 < rlen && raw.charAt(k + 1) == '.' &&
        raw.charAt(k + 2) == '.') { nSymbols += 1; k += 3 }
      else k += 1
    }

    new GenericInternalRow(Array[Any](
      nWords, nChars, nAlpha, stopsSeen.size, nLines, nBullet, nEllipsis,
      nSymbols))
  }
}
