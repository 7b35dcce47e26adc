package graft

import org.apache.spark.sql.{functions => F}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** Equivalence witness for the r21 qualityScore rework: the single-pass
  * [[graft.functions.expressions.QualityStatsExpr]] must reproduce the
  * former five-regex-pass Column chain BIT-FOR-BIT (raw doubles — no
  * rounding anywhere in the comparison), because ten-plus oracle-gated
  * queries hash the derived score. The legacy formulation is kept in
  * TextFunctions as `qualityScoreLegacy` purely as this spec's oracle.
  */
class QualityStatsSpec extends AnyFunSuite with SparkFixture {

  private def assertBitIdentical(texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(F.col("id"), F.col("text"),
        TextFunctions.qualityScore(F.col("text")).as("q_new"),
        TextFunctions.qualityScoreLegacy(F.col("text")).as("q_old"))
      .collect()
    got.foreach { r =>
      val nNew = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      val nOld = if (r.isNullAt(3)) None else Some(r.getDouble(3))
      // bit comparison, not ==: 0.0 vs -0.0 or NaN drift must fail too
      assert(nNew.map(java.lang.Double.doubleToRawLongBits) ==
        nOld.map(java.lang.Double.doubleToRawLongBits),
        s"score diverged for text=${r.get(1)}: new=$nNew old=$nOld")
    }
  }

  test("adversarial strings: new and legacy scores agree bit-for-bit") {
    assertBitIdentical(Seq(
      "",
      " ",
      "the quick brown fox jumps over the lazy dog",
      "THE AND OF TO IN IS IT THAT FOR WITH",
      "the.and,of;to:in!is?it(that)for[with]",
      "the-and_of to_in", // '_' continues a word run: no boundary
      "theand ofto inis", // concatenated stopwords never match
      "é the é", // U+00E9 is Unicode letterOrDigit: \b treats it as word
      "éthe theé é_the the_é", // no boundary between é and t/e
      "für die straße",
      "的是不了在人有我他这 the 的the the的", // CJK: isLetterOrDigit=true → word run
      "xthex", // vertical tab: NOT whitespace in the explicit class
      "12345 the 67890 0the the0",
      "!!! ### 12345 $$$ %%% 999",
      "😀 the 😀", // astral emoji: one punct code point
      "😀😀😀",
      "a😀the😀b", // emoji is NOT letterOrDigit → boundary
      "𝐀 𝟎", // astral LETTER and DIGIT (word cps)
      "𝐀the 𝐀 the", // astral letter continues the run
      "\uD83D the \uDE00 the", // unpaired surrogates
      "İstanbul IS the CITY", // U+0130 lowercases to i + combining dot
      "K the Å the", // Kelvin sign lowers to 'k', Angstrom to 'å'
      "line one\nline two\tthe end\r\n\fthe",
      "multi  spaces   the    and",
      ("the and of " * 200).trim, // length > 500: lenScore clamps at 1.0
      "a" * 499 + " the",
      "ß the ẞ the", // sharp s: lowercase of ẞ is ß
      "ȯ the Ȯ the", // combining dot above: not letterOrDigit
      null
    ))
  }

  test("gate tables: new and legacy scores agree bit-for-bit at sf0.001") {
    val docs = Tables(spark, sf001, "documents")
    val got = docs.select(
        TextFunctions.qualityScore(F.col("text")).as("q_new"),
        TextFunctions.qualityScoreLegacy(F.col("text")).as("q_old"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        s"score diverged: new=${r.getDouble(0)} old=${r.getDouble(1)}")
    }
  }

  private def assertLangIdIdentical(texts: Seq[String]): Unit = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val got = df.select(F.col("text"),
        TextFunctions.langId(F.col("text")).as("l_new"),
        TextFunctions.langIdLegacy(F.col("text")).as("l_old"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"langId diverged for text=${r.get(0)}: new=${r.getString(1)} old=${r.getString(2)}")
    }
  }

  test("langId: single-pass and legacy regex paths agree (adversarial)") {
    assertLangIdIdentical(Seq(
      "",
      "the quick brown fox and the lazy dog",
      "der hund und die katze ist nicht hier",
      "el perro y la casa es un lugar con luz",
      "le chien et la maison est un lieu dans les bois",
      "的是不了在人有我他这",
      "mixed the und der 的是 text",
      "für die straße", // non-ASCII word char inside a de stopword
      "FÜR DIE STRASSE", // uppercase ß handling via toLowerCase
      "de la le", // words shared across es/fr inventories: tie order
      "the the the und und und", // equal-hits tie broken by inventory order
      "no stopwords here xyzzy quux",
      "这the的und", // CJK chars inside a word run still count bare
      "l'été est la saison où l'on va dans les bois",
      "y_el es_un", // '_' joins runs: no boundary, no match
      "était the" // combining accent: non-word cp splits the run
    ))
  }

  test("langId: gate table agrees at sf0.001") {
    val docs = Tables(spark, sf001, "documents")
    val got = docs.select(
        TextFunctions.langId(F.col("text")).as("l_new"),
        TextFunctions.langIdLegacy(F.col("text")).as("l_old"))
      .collect()
    got.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("drifted-concat column (the q_psi_drift shape) agrees bit-for-bit") {
    val docs = Tables(spark, sf001, "documents")
    val drifted = F.concat(F.col("text"),
      F.when(F.col("doc_id") % 4 === 0, F.lit(" !!! ### 12345 $$$ %%% 999"))
        .otherwise(F.lit("")))
    val got = docs.select(
        TextFunctions.qualityScore(drifted).as("q_new"),
        TextFunctions.qualityScoreLegacy(drifted).as("q_old"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)))
    }
  }
}
