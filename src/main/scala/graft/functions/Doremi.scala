package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

/** DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi: Optimizing
  * Data Mixtures Speeds Up Language Model Pretraining"): instead of
  * hand-picking per-domain sampling rates, measure where a reference
  * model OUTPERFORMS a weaker proxy on held-out text — the domains with
  * the largest clipped excess loss are the ones with the most learnable
  * signal — and tilt the training mixture toward them with a
  * multiplicative-weights (exponentiated-gradient) update, smoothed back
  * toward uniform so no domain starves.
  *
  * In-engine adaptation (both "models" are the engine's own deterministic
  * LMs, trained in the same pass — no external checkpoints): the
  * reference is the row-152 stupid-backoff bigram LM, the proxy is the
  * add-one unigram it backs off to. For each held-out bigram position,
  *   excess = max(0, ln S(w|v) − ln u(w))
  * — clipped at 0 exactly as the paper clips per-token excess (an unseen
  * bigram's backoff score α·u(w) < u(w) would otherwise go negative) —
  * and a domain's loss gap is its per-position mean, summed DECIMAL-exact
  * (order-free). The published update from uniform initial weights over
  * these static losses collapses to one softmax step:
  *   w_d = (1 − c) · exp(η·excess_d) / Σ exp(η·excess_·) + c / |D|
  * (η the step size, c the uniform-smoothing mass). The single exp rides
  * the shared-expression-text + round(·,6) rule (the pmi/hllEst
  * precedent), so the oracle reproduces the weights.
  *
  * Scale shape: the corpus-sized work is [[BigramLm.positionScores]]'s
  * two count passes and two keyed joins — the domain label rides the
  * occurrence stream (no join-back) and everything after the per-domain
  * aggregation is a domains-sized table (dozens of rows) with a one-row
  * totals broadcast.
  *
  * Output: (domainCol, n_positions, excess_loss, doremi_weight) per
  * domain with at least one held-out bigram position. */
object Doremi {

  def domainWeights(train: DataFrame, heldOut: DataFrame,
                    domainCol: String = "source", idCol: String = "doc_id",
                    textCol: String = "text", alpha: Double = 0.4,
                    eta: Double = 1.0, smooth: Double = 0.01): DataFrame = {
    require(eta > 0.0, s"eta must be positive, got $eta")
    require(smooth >= 0.0 && smooth < 1.0, s"smooth must be in [0, 1), got $smooth")
    val pos = BigramLm.positionScores(
      train, heldOut, idCol, textCol, alpha, carry = Seq(domainCol))
    val perDom = pos
      .select(F.col(domainCol),
        F.greatest(F.lit(0.0), F.col("ln_s") - F.col("ln_u"))
          .cast("decimal(38,18)").as("ex"))
      .groupBy(F.col(domainCol))
      .agg(F.count(F.lit(1)).as("n_positions"), F.sum(F.col("ex")).as("ex_sum"))
      .select(F.col(domainCol), F.col("n_positions"),
        (F.col("ex_sum").cast("double") / F.col("n_positions").cast("double"))
          .as("mean_ex"))
    val expd = perDom.withColumn("e", F.exp(F.lit(eta) * F.col("mean_ex")))
    // domains-sized softmax: the total is summed in exact decimal (the
    // mixWeights precedent) and rides a one-row broadcast
    val totE = expd.agg(
      F.sum(F.col("e").cast("decimal(28,10)")).cast("double").as("e_tot"),
      F.count(F.lit(1)).as("n_dom"))
    expd.crossJoin(F.broadcast(totE))
      .select(F.col(domainCol), F.col("n_positions"),
        F.round(F.col("mean_ex"), 6).as("excess_loss"),
        F.round(F.lit(1.0 - smooth) * (F.col("e") / F.col("e_tot"))
          + F.lit(smooth) / F.col("n_dom").cast("double"), 6).as("doremi_weight"))
  }
}
