package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/** Unigram language-model scoring: each document's mean token
  * log-probability under the corpus's own unigram distribution — the
  * CCNet/KenLM-style quality signal (gibberish and boilerplate score low;
  * fluent in-distribution text scores high) used to filter or
  * importance-weight training corpora.
  *
  * score(d) = ( Σ_{t ∈ d} tf(d,t) · ln(count(t) / totalTokens) ) / |d|
  *
  * Determinism at scale (the interesting part): a distributed SUM of
  * doubles is order-nondeterministic — partial aggregation order varies
  * run to run — so the naive form cannot be oracle-checked bit-exactly.
  * Instead each per-(doc, token) term is computed as a double (identical
  * IEEE ops on identical operands on any engine) and CAST TO
  * DECIMAL(38,18); decimal addition is exact and associative, so the sum
  * is order-free and the final double division sees identical operands on
  * Spark and the SQL oracle. (Residual risk: the double→decimal cast's
  * rounding at 1e-18 per term; divergence reaches the 6-dp output only on
  * a ~.5e-6 boundary — the same accepted class as the tfidf ln 1-ulp
  * note.)
  *
  * Shape: the [[TfIdf]] pattern — one corpus scan folds per-row term
  * frequencies (TokenTfExpr), cached exploded as primitive columns; token
  * counts are one map-side-combinable aggregation; the join back is
  * token-keyed; the per-doc sum is exact decimal. Nothing quadratic; no
  * driver data beyond the single totalTokens long.
  */
object UnigramLm {

  /** (idCol, n_tokens, entropy) per document with at least one token:
    * Shannon entropy of the document's own token distribution,
    * H = ln(n) − (Σ_t tf·ln tf)/n — low for repetitive/templated text,
    * high for diverse vocabulary; the complement of [[score]]'s
    * corpus-level signal. Same exact-decimal summation (each tf·ln(tf)
    * term is an identical double on any engine; the decimal sum is
    * order-free), same one-scan shape — but with a SINGLE consumer, so
    * no cache, no scope: one scan, one shuffle (the per-doc sum). */
  def tokenEntropy(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val tfArr = ColumnBridge.column(
      graft.functions.expressions.TokenTfExpr(
        ColumnBridge.expression(F.col(textCol))))
    // byKey, not round-robin: when the spread fires, its
    // HashPartitioning(id) already satisfies the per-doc aggregation
    // below, so that exchange (and its stage pair) drops out of the plan
    // — the TfIdf.score trick; `score` keeps round-robin because its
    // downstream exchanges are tok-keyed, which doc-id keying can't help.
    graft.Spread.byKey(docs, idCol)
      .select(F.col(idCol), F.explode_outer(tfArr).as("tt"))
      .select(F.col(idCol), F.col("tt.tok").as("tok"), F.col("tt.tf").as("tf"))
      .filter(F.col("tok").isNotNull)
      .select(
        F.col(idCol), F.col("tf"),
        (F.col("tf").cast("double") * F.log(F.col("tf").cast("double")))
          .cast("decimal(38,18)").as("term"))
      .groupBy(F.col(idCol))
      .agg(
        F.sum(F.col("tf")).as("n_tokens"),
        F.sum(F.col("term")).as("tl"))
      .select(
        F.col(idCol), F.col("n_tokens"),
        F.round(
          F.log(F.col("n_tokens").cast("double")) -
            F.col("tl").cast("double") / F.col("n_tokens").cast("double"),
          6).as("entropy"))
  }

  /** CCNet-style perplexity bucketing: every document labeled
    * head / middle / tail by its [[score]] rank WITHIN ITS LANGUAGE —
    * the published CCNet recipe (Wenzek et al. 2020) that pretraining
    * pipelines use to keep the fluent third of a crawl and downweight
    * the rest. `k` buckets of NTILE semantics (first `n mod k` buckets
    * get the extra row), head = best lm_score (lowest perplexity).
    *
    * Scale shape — NO per-language single-partition window: ranks come
    * from [[graft.operators.GlobalIndex]] over the total order
    * (pred_lang, lm_score DESC, id) — range partition + in-partition
    * sort + zipWithIndex — so a language 100× bigger than the rest
    * spreads across partitions instead of serializing one task; the
    * per-language rank is the global index minus the language's min
    * index (one ≤|langs|-row aggregate, broadcast back). The NTILE
    * arithmetic is explicit integer math on (rank, group size) —
    * identical on both engines rather than trusting two window-function
    * implementations to tie-break alike.
    *
    * Determinism: ranks order on the ROUNDED 6-dp lm_score (the same
    * column both engines emit) with the id as total-order tie-break. */
  def perplexityBuckets(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", k: Int = 3): DataFrame = graft.CacheScope.scoped {
    require(k >= 2, s"need k >= 2 buckets, got $k")
    val lm = score(docs, idCol, textCol).select(F.col(idCol), F.col("lm_score"))
    val lang = docs.select(
      F.col(idCol), TextFunctions.langId(F.col(textCol)).as("pred_lang"))
    // The indexed frame has TWO consumers (the per-language min/count
    // aggregate and the final join) — cache it, or the range sort, the
    // LM scoring join, and langId all run twice.
    val g = graft.CacheScope.materialize(
      graft.operators.GlobalIndex.appendIndex(
        lm.join(lang, Seq(idCol)),
        Seq(F.col("pred_lang"), F.col("lm_score").desc, F.col(idCol)), "gpos"))
    val groups = g.groupBy(F.col("pred_lang"))
      .agg(F.min(F.col("gpos")).as("gstart"), F.count(F.lit(1)).as("gn"))
    // non-negative long division: double divide + truncating cast == floor
    // == both engines' integer `//` for these operand ranges (< 2^53)
    def ldiv(a: Column, b: Column): Column = (a / b).cast("long")
    val rank = F.col("gpos") - F.col("gstart")
    val base = ldiv(F.col("gn"), F.lit(k))
    val rem = F.col("gn") % k
    val cut = rem * (base + F.lit(1))
    val idx = F.when(rank < cut, ldiv(rank, base + F.lit(1)))
      .otherwise(rem + ldiv(rank - cut, F.greatest(base, F.lit(1L))))
    val label =
      if (k == 3)
        F.when(idx === 0, F.lit("head"))
          .when(idx === 1, F.lit("middle")).otherwise(F.lit("tail"))
      else F.concat(F.lit("b"), idx.cast("string"))
    g.join(F.broadcast(groups), Seq("pred_lang"))
      .select(F.col(idCol), F.col("pred_lang"), F.col("lm_score"),
        label.as("ppl_bucket"))
  }

  /** (idCol, n_tokens, lm_score) per document with at least one token;
    * lm_score rounded to 6 decimals. */
  def score(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = graft.CacheScope.scoped {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val tfArr = ColumnBridge.column(
      graft.functions.expressions.TokenTfExpr(
        ColumnBridge.expression(F.col(textCol))))
    // Lazy persist: the totalTokens aggregate below is the first (and
    // strictly earlier) consumer, so it populates the cache for the
    // token-count aggregation and the probe side (see CacheScope).
    val tfTable = graft.CacheScope.materializeLazy(
      graft.Spread(docs)
        .select(F.col(idCol), F.explode_outer(tfArr).as("tt"))
        .select(F.col(idCol), F.col("tt.tok").as("tok"), F.col("tt.tf").as("tf")))
      .filter(F.col("tok").isNotNull)
    // One small job: corpus token total (also warms the cache). On a
    // corpus where NO document has tokens, sum over the empty table is
    // null — any placeholder is sound then, because the empty tfTable
    // makes every downstream join/aggregate empty regardless.
    val totalRow = tfTable.agg(F.sum(F.col("tf"))).first()
    val totalTokens = if (totalRow.isNullAt(0)) 1L else totalRow.getLong(0)
    val tokCounts = tfTable.groupBy(F.col("tok"))
      .agg(F.sum(F.col("tf")).as("cnt"))
    tfTable.join(tokCounts, Seq("tok"))
      .select(
        F.col(idCol), F.col("tf"),
        // identical IEEE ops on both engines, then exact decimal
        (F.col("tf").cast("double") *
          F.log(F.col("cnt").cast("double") / F.lit(totalTokens.toDouble)))
          .cast("decimal(38,18)").as("term"))
      .groupBy(F.col(idCol))
      .agg(
        F.sum(F.col("tf")).as("n_tokens"),
        F.sum(F.col("term")).as("ll"))
      .select(
        F.col(idCol), F.col("n_tokens"),
        F.round(F.col("ll").cast("double") / F.col("n_tokens").cast("double"), 6)
          .as("lm_score"))
  }
}
