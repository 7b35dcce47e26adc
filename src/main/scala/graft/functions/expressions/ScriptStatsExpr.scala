package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-script character census in ONE row pass:
  * `struct<n_chars, n_latin, n_digit, n_cjk, n_cyrillic, n_space,
  * n_other>` — the mC4/CCNet-style script-mix signal a multilingual
  * crawl pipeline filters and routes on (a page claiming lang=zh with a
  * 2% CJK ratio is misrouted boilerplate; a Latin/Cyrillic half-split is
  * usually navigation chrome around content).
  *
  * Classes are explicit code-point RANGES, mirrored verbatim by the
  * DuckDB oracle's regexes (no engine-defined \p classes — the two
  * engines' Unicode tables need not agree):
  *  - latin:    A-Z a-z
  *  - digit:    0-9
  *  - cjk:      U+4E00–U+9FFF (CJK Unified Ideographs)
  *  - cyrillic: U+0400–U+04FF
  *  - space:    space, tab, \n, \r, \f
  *  - other:    everything else (counted per CHAR unit, as length() is)
  *
  * Why an expression: six regexp_extract_all passes per document is six
  * scans of every string; this is one. Codegen'd static call (the
  * GopherStats/C4Stats pattern); NULL for null text. */
case class ScriptStatsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ScriptStatsExpr.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ScriptStatsExpr.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.ScriptStatsExpr$$.MODULE$$.stats($c);")

  override protected def withNewChildInternal(newChild: Expression): ScriptStatsExpr =
    copy(child = newChild)
}

object ScriptStatsExpr {

  val schema: StructType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_latin", LongType, nullable = false),
    StructField("n_digit", LongType, nullable = false),
    StructField("n_cjk", LongType, nullable = false),
    StructField("n_cyrillic", LongType, nullable = false),
    StructField("n_space", LongType, nullable = false),
    StructField("n_other", LongType, nullable = false)))

  /** The shared single pass — per-CHAR classification (length() units,
    * so the counts reconcile with n_chars exactly). */
  def stats(input: UTF8String): GenericInternalRow = {
    val s = input.toString
    var latin = 0L; var digit = 0L; var cjk = 0L
    var cyr = 0L; var space = 0L; var other = 0L
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) latin += 1
      else if (c >= '0' && c <= '9') digit += 1
      else if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      else if (c >= 0x0400 && c <= 0x04ff) cyr += 1
      else if (c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f') space += 1
      else other += 1
      i += 1
    }
    new GenericInternalRow(Array[Any](
      s.length.toLong, latin, digit, cjk, cyr, space, other))
  }
}
