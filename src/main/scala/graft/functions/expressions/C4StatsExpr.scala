package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The C4 cleaning rule set (Raffel et al. 2020, §2.2; constants per the
  * published c4.py reference implementation) in ONE row pass:
  * `struct<text_clean, n_lines, n_kept, has_lorem, has_brace>`.
  *
  * Line rules (a line is a '\n' segment of the raw text, stripped of
  * leading/trailing spaces and tabs — each mirrored verbatim in the
  * DuckDB oracle, OracleSql.q_c4_rules, so the cleaned TEXT is
  * cross-engine exact):
  *  - kept only if it ends in a terminal punctuation mark: '.', '!',
  *    '?', or '"';
  *  - kept only if it has at least 5 words (split on spaces/tabs,
  *    empties dropped — c4.py `_MIN_WORDS_PER_LINE = 5`);
  *  - dropped if it mentions javascript (case-insensitive — the
  *    "enable Javascript" boilerplate rule);
  *  - dropped if it carries a cookies/policy notice (c4.py
  *    `_POLICY_SUBSTRINGS`, case-insensitive).
  *
  * Document flags (evaluated on the RAW text, decided by the caller —
  * [[graft.functions.TextFunctions.c4Rules]] — so the pass stays pure):
  *  - has_lorem: lowercased text contains "lorem ipsum";
  *  - has_brace: text contains '{' (the code-page rule).
  * The page-retention rule (≥ 3 kept lines ∧ ¬lorem ∧ ¬brace — c4.py
  * `_MIN_NUM_SENTENCES = 3`, with kept lines standing in for its
  * sentence count: this corpus synthesizes one sentence per line) is a
  * Column predicate over these counters.
  *
  * Why an expression: per-line filtering + ordered rebuild as Catalyst
  * higher-order functions is CodegenFallback (drops the whole scan stage
  * to the interpreted path — the GopherStatsExpr lesson); this stays in
  * whole-stage codegen via a static call. NULL for null text. */
case class C4StatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = C4StatsExpr.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    C4StatsExpr.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.C4StatsExpr$$.MODULE$$.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): C4StatsExpr =
    copy(child = newChild)
}

object C4StatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("text_clean", StringType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_kept", IntegerType, nullable = false),
    StructField("has_lorem", BooleanType, nullable = false),
    StructField("has_brace", BooleanType, nullable = false)))

  // c4.py _POLICY_SUBSTRINGS (cookie/ToS boilerplate lines).
  private val policy = Array(
    "terms of use", "privacy policy", "cookie policy",
    "uses cookies", "use of cookies", "use cookies")

  private def isBlank(c: Char): Boolean = c == ' ' || c == '\t'

  /** The shared single pass — called per document from both interpreted
    * eval and generated code. */
  def stats(input: UTF8String): GenericInternalRow = {
    val raw = input.toString
    val lower = raw.toLowerCase(java.util.Locale.ROOT)
    val hasLorem = lower.contains("lorem ipsum")
    val hasBrace = raw.indexOf('{') >= 0

    val sb = new java.lang.StringBuilder
    var nLines = 0
    var nKept = 0
    var ls = 0
    val len = raw.length
    while (ls <= len) {
      var le = raw.indexOf('\n', ls)
      if (le < 0) le = len
      nLines += 1
      // strip spaces/tabs both sides
      var a = ls
      while (a < le && isBlank(raw.charAt(a))) a += 1
      var b = le
      while (b > a && isBlank(raw.charAt(b - 1))) b -= 1
      if (b > a) {
        val last = raw.charAt(b - 1)
        val terminal = last == '.' || last == '!' || last == '?' || last == '"'
        if (terminal) {
          // word count: blank-delimited runs within the stripped line
          var words = 0
          var i = a
          while (i < b) {
            while (i < b && isBlank(raw.charAt(i))) i += 1
            if (i < b) { words += 1; while (i < b && !isBlank(raw.charAt(i))) i += 1 }
          }
          if (words >= 5) {
            // lowercase the RAW slice, never a slice of the pre-lowered
            // whole: lowercasing can change length (U+0130 'İ' expands
            // to two chars), which would shift every offset after it and
            // misalign the banned-substring window (review r15)
            val lineLower = raw.substring(a, b).toLowerCase(java.util.Locale.ROOT)
            var banned = lineLower.contains("javascript")
            var pi = 0
            while (!banned && pi < policy.length) {
              if (lineLower.contains(policy(pi))) banned = true
              pi += 1
            }
            if (!banned) {
              if (nKept > 0) sb.append('\n')
              sb.append(raw, a, b)
              nKept += 1
            }
          }
        }
      }
      ls = le + 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(sb.toString), nLines, nKept, hasLorem, hasBrace))
  }
}
