package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The per-language stopword hit counts behind [[graft.functions
  * .TextFunctions.langId]] in ONE row pass: `struct<h0..h4: int>`, one
  * field per inventory in [[graft.functions.TextFunctions.stopwords]]
  * ORDER (en, de, es, fr, zh — the argmax tie-break order, so field
  * position is load-bearing).
  *
  * Each count is DEFINED as the regex count the former Column chain
  * computed — `regexp_count(lower(text), hitsPattern(words))` — so the
  * argmax derived from this struct is bit-identical to the old
  * five-pass form (and the DuckDB oracle, which still replays the regex
  * formula):
  *  - alphabetic inventories are `\b(w1|...|wn)\b`-anchored: a match
  *    needs Java word boundaries on both sides, and Java's `\b` (unlike
  *    Java's `\w`) uses `ch == '_' || Character.isLetterOrDigit(ch)` —
  *    so a word can only match as a WHOLE maximal letterOrDigit run
  *    (boundaries exist only at run edges), and the count is the number
  *    of runs equal to an inventory word ("für" works because 'ü' is a
  *    word char by that definition and the run compares as a string).
  *  - the CJK inventory matches BARE (no `\b` — see
  *    TextFunctions.isCjkInventory): every inventory char is a single
  *    code point, so the non-overlapping left-to-right count is simply
  *    the number of code points in the set, anywhere in the text
  *    (inside word runs included).
  *  - lowercasing is UTF8String.toLowerCase — the exact Lower path.
  *
  * Why an expression: langId paid five separate regex scans (one per
  * inventory) over the lowered text per row — the CPU inside
  * q_ccnet_buckets / q_langid_eval / every pipeline's language gate.
  * One word-run pass replaces them (the QualityStatsExpr precedent).
  * NULL for null text.
  */
case class LangIdHitsExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LangIdHitsExpr.schema
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    LangIdHitsExpr.hits(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.LangIdHitsExpr$$.MODULE$$.hits($c);")

  override protected def withNewChildInternal(newChild: Expression): LangIdHitsExpr =
    copy(child = newChild)
}

object LangIdHitsExpr {

  // Built from TextFunctions.stopwords at class init — ONE source of
  // truth for the inventories; field order = inventory order.
  private val inventories: Seq[(String, Seq[String])] =
    graft.functions.TextFunctions.stopwords

  val schema: StructType = StructType(
    inventories.zipWithIndex.map { case ((lang, _), i) =>
      StructField(s"h$i", IntegerType, nullable = false) })

  private val nInv = inventories.size
  // alphabetic inventories: index → word set; CJK: index → char set
  private val wordSets: Array[java.util.HashSet[String]] = {
    val a = Array.fill(nInv)(null: java.util.HashSet[String])
    inventories.zipWithIndex.foreach { case ((_, words), i) =>
      if (!graft.functions.TextFunctions.isCjkInventory(words)) {
        val s = new java.util.HashSet[String](32)
        words.foreach(s.add); a(i) = s
      }
    }
    a
  }
  private val cjkSets: Array[java.util.HashSet[Integer]] = {
    val a = Array.fill(nInv)(null: java.util.HashSet[Integer])
    inventories.zipWithIndex.foreach { case ((_, words), i) =>
      if (graft.functions.TextFunctions.isCjkInventory(words)) {
        val s = new java.util.HashSet[Integer](32)
        words.foreach(w => s.add(w.codePointAt(0)))
        a(i) = s
      }
    }
    a
  }
  private val maxWordLen: Int =
    inventories.flatMap(_._2).filterNot(w =>
      graft.functions.TextFunctions.isCjkInventory(Seq(w))).map(_.length).max

  // JDK Pattern$Bound.isWord without UNICODE_CHARACTER_CLASS.
  private def isWordCp(cp: Int): Boolean =
    cp == '_' || Character.isLetterOrDigit(cp)

  /** The shared single pass — called per document from both interpreted
    * eval and generated code. */
  def hits(input: UTF8String): GenericInternalRow = {
    val low = input.toLowerCase.toString
    val m = low.length
    val counts = new Array[Int](nInv)
    var j = 0
    while (j < m) {
      val cp = low.codePointAt(j)
      if (isWordCp(cp)) {
        val start = j
        // word run: count CJK hits per code point as we go (the bare
        // patterns match INSIDE runs too)
        var c2 = cp
        var cont = true
        while (cont) {
          var i = 0
          while (i < nInv) {
            val cs = cjkSets(i)
            if (cs != null && cs.contains(c2)) counts(i) += 1
            i += 1
          }
          j += Character.charCount(c2)
          if (j < m) {
            c2 = low.codePointAt(j)
            cont = isWordCp(c2)
          } else cont = false
        }
        // whole-run word match against each alphabetic inventory
        if (j - start <= maxWordLen) {
          val w = low.substring(start, j)
          var i = 0
          while (i < nInv) {
            val ws = wordSets(i)
            if (ws != null && ws.contains(w)) counts(i) += 1
            i += 1
          }
        }
      } else {
        // non-word code point: CJK sets cannot contain it (CJK chars are
        // letters), so only advance
        j += Character.charCount(cp)
      }
    }
    new GenericInternalRow(counts.map(c => c: Any))
  }
}
