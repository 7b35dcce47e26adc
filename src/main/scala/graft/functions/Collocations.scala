package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** PMI collocation mining — the phrase-detection statistic (Church &
  * Hanks 1990; the word2vec phrase pass applies the same idea) a corpus
  * team runs to find multiword units ("new york", "machine learning")
  * worth atomizing before tokenizer training:
  * `pmi(a,b) = ln( p(ab) / (p(a)·p(b)) )` over adjacent-token bigrams,
  * floored by a count threshold (PMI without a floor surfaces
  * hapax-pair noise — the classic failure mode).
  *
  * Determinism: the PMI argument is pure IEEE multiply/divide in one
  * shared association order and only the final `ln` touches libm, with
  * `round(·, 6)` absorbing its last-ulp engine variance — the
  * [[Sketches.hllEstSql]] shared-expression-text rule; both engines
  * evaluate the identical generated text ([[pmiSql]]).
  *
  * Scale shape: two token-stream passes (unigram + bigram counts, both
  * map-side-combinable — the q_dsir_weights two-pass precedent), then
  * joins on the VOCABULARY-sized count tables only (never corpus rows);
  * the corpus totals ride one-row broadcasts (the documented
  * crossJoin-total pattern). minCount prunes the bigram table BEFORE its
  * two unigram joins. */
object Collocations {

  /** The shared PMI expression text (Spark `expr` and DuckDB alike):
    * ln( (n_ab · N_uni²) / (N_bg · n_a · n_b) ), rounded to 6 dp.
    *
    * Not part of the hash gate (r18): the two engines evaluate `ln` with
    * different libm implementations, so a value within an ulp of a 6-dp
    * boundary could round apart — the q_pmi gate therefore hashes the
    * exact integer columns (n_ab, n_a, n_b, n_uni_total, n_bg_total),
    * which determine the pre-ln rational exactly, and the rounded double
    * stays a spec-pinned OPERATOR output only. */
  def pmiSql(nAb: String, nA: String, nB: String,
             nUni: String, nBg: String): String =
    s"round(ln((CAST($nAb AS DOUBLE) * CAST($nUni AS DOUBLE) * CAST($nUni AS DOUBLE)) / " +
      s"(CAST($nBg AS DOUBLE) * CAST($nA AS DOUBLE) * CAST($nB AS DOUBLE))), 6)"

  /** Bigram PMI over `textCol` (lowercased whitespace tokens — the
    * ShingleExpr tokenizer contract shared with the rest of the pack).
    * Output: (tok_a, tok_b, n_ab, n_a, n_b, pmi) for bigrams with
    * `n_ab >= minCount`. */
  def pmi(docs: DataFrame, textCol: String = "text",
          minCount: Int = 5): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    import graft.functions.expressions.ShingleExpr
    def grams(n: Int) = ColumnBridge.column(
      ShingleExpr(ColumnBridge.expression(F.col(textCol)), n))
    val spread = graft.Spread(docs)
    val uni = spread.select(F.explode(grams(1)).as("tok"))
      .groupBy("tok").agg(F.count(F.lit(1)).as("n_tok"))
    val bgAll = spread.select(F.explode(grams(2)).as("bigram"))
      .groupBy("bigram").agg(F.count(F.lit(1)).as("n_ab"))
    val bg = bgAll
      .filter(F.col("n_ab") >= minCount)
      .select(F.split(F.col("bigram"), " ").getItem(0).as("tok_a"),
        F.split(F.col("bigram"), " ").getItem(1).as("tok_b"), F.col("n_ab"))
    // corpus totals as one-row broadcast frames (the bounded one-row
    // crossJoin pattern — Sampling/TfIdf/Dsir precedent), each summed
    // from its COUNT TABLE, not the corpus: the subtree is identical to
    // the join side's, so the plan reuses the uni/bigram exchanges
    // (the q_ccnet_buckets ReuseExchange precedent) instead of paying a
    // third and fourth token-stream scan
    val totU = uni.agg(F.sum("n_tok").as("n_uni_total"))
    val totB = bgAll.agg(F.sum("n_ab").as("n_bg_total"))
    bg
      .join(uni.select(F.col("tok").as("tok_a"), F.col("n_tok").as("n_a")), Seq("tok_a"))
      .join(uni.select(F.col("tok").as("tok_b"), F.col("n_tok").as("n_b")), Seq("tok_b"))
      .crossJoin(F.broadcast(totU))
      .crossJoin(F.broadcast(totB))
      .select(F.col("tok_a"), F.col("tok_b"), F.col("n_ab"),
        F.col("n_a"), F.col("n_b"),
        F.expr(pmiSql("n_ab", "n_a", "n_b", "n_uni_total", "n_bg_total")).as("pmi"),
        // the corpus totals ride along: with (n_ab, n_a, n_b) they pin
        // the EXACT pre-ln rational n_ab·N_uni² / (N_bg·n_a·n_b), so a
        // hash gate can grade pure integers and skip the libm `ln`
        // boundary entirely (the r17 accepted-risk flake surface)
        F.col("n_uni_total"), F.col("n_bg_total"))
  }
}
