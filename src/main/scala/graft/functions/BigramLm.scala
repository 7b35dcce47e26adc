package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Bigram language-model scoring with STUPID BACKOFF (Brants et al. 2007,
  * "Large Language Models in Machine Translation") — the web-scale LM
  * quality tier above the row-78 unigram: published practice scores crawl
  * text against counts trained on a REFERENCE corpus, backing off to the
  * unigram with a fixed penalty when a bigram was never seen (the whole
  * point of the method: no discounting pass, counts stream in one job,
  * scores are a pure function of count tables).
  *
  * Model (deterministic, SQL-replicable — the UnigramLm discipline):
  *  - unigram: u(w) = (c(w) + 1) / (N + V + 1) — add-one with one OOV
  *    type, so an unseen word scores finite instead of ln(0);
  *  - bigram:  S(w|v) = c(vw) / c(v)   when c(vw) > 0
  *             S(w|v) = α · u(w)        otherwise (α = 0.4, the paper's)
  *  - per-doc score = mean ln S over the doc's bigram positions,
  *    per-occurrence doubles CAST TO DECIMAL(38,18) before the sum
  *    (order-free, bit-reproducible cross-engine), rounded to 6 dp.
  *
  * Scale shape: the train side is two token-stream passes collapsing to
  * VOCABULARY-sized count tables (both map-side combinable); the ratio
  * c(vw)/c(v) is pre-joined INTO the bigram table (one vocab-sized join)
  * so the corpus-sized score stream pays exactly TWO keyed joins — the
  * bigram table on `bg` (its explicit repartition is the reused
  * exchange) and the unigram table on the backoff word — plus the
  * one-row totals broadcast (the bounded-crossJoin class). The bigram
  * table at web scale is large but vocabulary-of-bigrams-sized, joined
  * shuffle-to-shuffle, never broadcast.
  *
  * Output: (idCol, n_bigrams, lm2_score) per scored document with at
  * least one bigram (< 2 tokens → no bigram positions to score, the
  * lm_score ≥-1-token convention one level up).
  *
  * Reference: beyond-reference (LLM-pack); the published method is the
  * citation above. */
object BigramLm {

  def scoreStupidBackoff(train: DataFrame, docs: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         alpha: Double = 0.4): DataFrame =
    positionScores(train, docs, idCol, textCol, alpha)
      .select(F.col(idCol), F.col("ln_s").cast("decimal(38,18)").as("term"))
      .groupBy(F.col(idCol))
      .agg(F.count(F.lit(1)).as("n_bigrams"), F.sum(F.col("term")).as("ll"))
      .select(F.col(idCol), F.col("n_bigrams"),
        F.round(F.col("ll").cast("double") / F.col("n_bigrams").cast("double"), 6)
          .as("lm2_score"))

  /** Interpolated Kneser–Ney bigram scoring (Kneser & Ney 1995; the
    * Chen–Goodman 1999 benchmark smoother, the published tier above
    * [[scoreStupidBackoff]]): instead of a fixed backoff penalty, absolute
    * discounting with the mass redistributed by CONTINUATION counts — how
    * many distinct contexts a word follows, the "San Francisco" fix
    * (|Francisco| is frequent but only ever follows |San|, so its unigram
    * weight should be tiny).
    *
    * Model, all rational from integer count tables (one final ln — the
    * same hash-exact discipline as the rest of the LM tier):
    *   P(w|v) = max(c(vw) − D, 0)/c(v·) + (D·N1+(v·)/c(v·))·Pc(w)
    *            when the context v was seen (c(v·) > 0);
    *   P(w|v) = Pc(w) for an unseen/OOV context;
    *   Pc(w)  = (N1+(·w) + 1) / (N1+(··) + V + 1)
    * with c(v·) = Σ_w c(vw) (context totals), N1+(v·)/N1+(·w) the
    * forward/backward distinct-neighbor counts, N1+(··) the distinct
    * bigram count, and the add-one in Pc the row-152 OOV convention (an
    * unseen word scores finite). D = 0.75 (the Chen–Goodman fixed
    * discount; exactly representable, so every product is reproducible).
    *
    * Scale shape: FOUR vocabulary-sized count tables (bigram, context
    * totals, fwd/bwd distinct-neighbor counts — the latter three all fold
    * FROM the bigram table, ReuseExchange-shared, never re-scanning the
    * corpus), ratios pre-joined where keyed alike; the corpus-sized score
    * stream pays three keyed joins (bg, prev-token, word) + a one-row
    * totals broadcast. Per-doc mean ln P over bigram positions,
    * DECIMAL(38,18) sums, round 6.
    *
    * Output: (idCol, n_bigrams, kn_score) per scored doc with >= 1
    * bigram. */
  def scoreKneserNey(train: DataFrame, docs: DataFrame,
                     idCol: String = "doc_id", textCol: String = "text",
                     discount: Double = 0.75): DataFrame = {
    require(discount > 0.0 && discount < 1.0, s"discount in (0, 1), got $discount")
    import graft.functions.expressions.ShingleExpr
    def grams(df: DataFrame, n: Int) = ColumnBridge.column(
      ShingleExpr(ColumnBridge.expression(df(textCol)), n))
    val uni = graft.Spread(train)
      .select(F.explode(grams(train, 1)).as("tok"))
      .groupBy(F.col("tok")).agg(F.count(F.lit(1)).as("c1"))
    val bgCounts = graft.Spread(train)
      .select(F.explode(grams(train, 2)).as("bg"))
      .groupBy(F.col("bg")).agg(F.count(F.lit(1)).as("c2"))
      .select(F.col("bg"), F.col("c2"),
        F.split(F.col("bg"), " ").getItem(0).as("v"),
        F.split(F.col("bg"), " ").getItem(1).as("w"))
    // the three derived tables fold from the SAME bigram aggregate —
    // vocabulary-sized, no extra corpus scan
    val ctx = bgCounts.groupBy(F.col("v"))
      .agg(F.sum(F.col("c2")).as("cv"), F.count(F.lit(1)).as("n1f"))
    val bwd = bgCounts.groupBy(F.col("w"))
      .agg(F.count(F.lit(1)).as("n1b"))
    val totals = bgCounts.agg(F.count(F.lit(1)).as("n_bg"))
      .crossJoin(F.broadcast(uni.agg(F.count(F.lit(1)).as("v_size"))))
    val occ = graft.Spread(docs)
      .select(docs(idCol), F.explode(grams(docs, 2)).as("bg"))
      .select(F.col(idCol), F.col("bg"),
        F.split(F.col("bg"), " ").getItem(0).as("v"),
        F.split(F.col("bg"), " ").getItem(1).as("w"))
      .repartition(F.col("bg"))
    // identical IEEE op order to the oracle: Pc from longs, then the
    // discounted interpolation, both sides double division
    val pc = (F.coalesce(F.col("n1b"), F.lit(0L)).cast("double") + F.lit(1.0)) /
      (F.col("n_bg").cast("double") + F.col("v_size").cast("double") + F.lit(1.0))
    val cvD = F.col("cv").cast("double")
    val seenCtx =
      F.greatest(F.coalesce(F.col("c2"), F.lit(0L)).cast("double") - F.lit(discount),
        F.lit(0.0)) / cvD +
      (F.lit(discount) * F.col("n1f").cast("double") / cvD) * pc
    occ
      .join(bgCounts.select(F.col("bg"), F.col("c2")).hint("shuffle_hash"),
        Seq("bg"), "left")
      .join(ctx, Seq("v"), "left")
      .join(bwd, Seq("w"), "left")
      .crossJoin(F.broadcast(totals))
      .select(F.col(idCol),
        F.log(F.when(F.col("cv").isNotNull, seenCtx).otherwise(pc))
          .cast("decimal(38,18)").as("term"))
      .groupBy(F.col(idCol))
      .agg(F.count(F.lit(1)).as("n_bigrams"), F.sum(F.col("term")).as("ll"))
      .select(F.col(idCol), F.col("n_bigrams"),
        F.round(F.col("ll").cast("double") / F.col("n_bigrams").cast("double"), 6)
          .as("kn_score"))
  }

  /** Jelinek–Mercer interpolated TRIGRAM scoring (Jelinek & Mercer 1980;
    * the fixed-weight linear interpolation every n-gram stack starts
    * from, and the third LM tier above [[scoreStupidBackoff]] /
    * [[scoreKneserNey]]):
    *   P(w|u,v) = λ3·f3 + λ2·f2 + λ1·p1
    * with f3 = c(uvw)/c(uv), f2 = c(vw)/c(v) (ML estimates, 0 when the
    * numerator count is unseen), and p1 the add-one unigram
    * (c(w)+1)/(N+V+1) — λ1 > 0 against a positive p1 keeps every
    * position finite, the row-78/152 OOV convention. Weights fixed
    * (0.5/0.3/0.2 default) rather than EM-tuned: deterministic,
    * SQL-replicable, and the published starting point.
    *
    * Scale shape: three count tables (uni/bigram/trigram — each one
    * map-side-combinable pass over the train stream, vocabulary-sized);
    * the ratios pre-join INTO the trigram and bigram tables
    * (vocab-sized joins), so the corpus-sized score stream pays exactly
    * THREE keyed joins (tg on the trigram key, bg on the (v,w) suffix
    * bigram, uni on the word) + the one-row totals broadcast. Per-doc
    * mean ln P over trigram positions, DECIMAL(38,18) sums, round 6.
    *
    * Output: (idCol, n_trigrams, lm3_score) per doc with >= 1 trigram
    * (< 3 tokens → absent, the established n-gram-position convention). */
  def scoreJelinekMercer(train: DataFrame, docs: DataFrame,
                         idCol: String = "doc_id", textCol: String = "text",
                         l3: Double = 0.5, l2: Double = 0.3,
                         l1: Double = 0.2): DataFrame = {
    require(l3 > 0.0 && l2 > 0.0 && l1 > 0.0 && math.abs(l3 + l2 + l1 - 1.0) < 1e-9,
      s"lambdas must be positive and sum to 1, got ($l3, $l2, $l1)")
    import graft.functions.expressions.ShingleExpr
    def grams(df: DataFrame, n: Int) = ColumnBridge.column(
      ShingleExpr(ColumnBridge.expression(df(textCol)), n))
    val uni = graft.Spread(train)
      .select(F.explode(grams(train, 1)).as("tok"))
      .groupBy(F.col("tok")).agg(F.count(F.lit(1)).as("c1"))
    val totals = uni.agg(
      F.coalesce(F.sum(F.col("c1")), F.lit(0L)).as("n_total"),
      F.count(F.lit(1)).as("v_size"))
    val bgCounts = graft.Spread(train)
      .select(F.explode(grams(train, 2)).as("bg"))
      .groupBy(F.col("bg")).agg(F.count(F.lit(1)).as("c2"))
    // f2 = c(vw)/c(v) rides IN the bigram table (vocab-sized join on v)
    val bgRatio = bgCounts
      .select(F.col("bg"), F.split(F.col("bg"), " ").getItem(0).as("tok"), F.col("c2"))
      .join(uni, Seq("tok"))
      .select(F.col("bg"),
        (F.col("c2").cast("double") / F.col("c1").cast("double")).as("r2"))
    // f3 = c(uvw)/c(uv) rides IN the trigram table (vocab-sized join on uv)
    val tgRatio = graft.Spread(train)
      .select(F.explode(grams(train, 3)).as("tg"))
      .groupBy(F.col("tg")).agg(F.count(F.lit(1)).as("c3"))
      .select(F.col("tg"), F.col("c3"),
        F.concat_ws(" ",
          F.split(F.col("tg"), " ").getItem(0),
          F.split(F.col("tg"), " ").getItem(1)).as("bg"))
      .join(bgCounts, Seq("bg"))
      .select(F.col("tg"),
        (F.col("c3").cast("double") / F.col("c2").cast("double")).as("r3"))
    // score stream: trigram occurrences carrying the suffix bigram + word
    val occ = graft.Spread(docs)
      .select(docs(idCol), F.explode(grams(docs, 3)).as("tg"))
      .select(F.col(idCol), F.col("tg"),
        F.concat_ws(" ",
          F.split(F.col("tg"), " ").getItem(1),
          F.split(F.col("tg"), " ").getItem(2)).as("bg"),
        F.split(F.col("tg"), " ").getItem(2).as("tok"))
      .repartition(F.col("tg"))
    val p1 = (F.coalesce(F.col("c1"), F.lit(0L)).cast("double") + F.lit(1.0)) /
      (F.col("n_total").cast("double") + F.col("v_size").cast("double") + F.lit(1.0))
    // identical IEEE op order to the oracle: (l3*f3 + l2*f2) + l1*p1
    val p = F.lit(l3) * F.coalesce(F.col("r3"), F.lit(0.0)) +
      F.lit(l2) * F.coalesce(F.col("r2"), F.lit(0.0)) +
      F.lit(l1) * p1
    occ
      .join(tgRatio.hint("shuffle_hash"), Seq("tg"), "left")
      .join(bgRatio.hint("shuffle_hash"), Seq("bg"), "left")
      .join(uni, Seq("tok"), "left")
      .crossJoin(F.broadcast(totals))
      .select(F.col(idCol), F.log(p).cast("decimal(38,18)").as("term"))
      .groupBy(F.col(idCol))
      .agg(F.count(F.lit(1)).as("n_trigrams"), F.sum(F.col("term")).as("ll"))
      .select(F.col(idCol), F.col("n_trigrams"),
        F.round(F.col("ll").cast("double") / F.col("n_trigrams").cast("double"), 6)
          .as("lm3_score"))
  }

  /** The per-bigram-position scored stream both consumers fold from:
    * (idCol, carry..., ln_s, ln_u) — `ln_s` the stupid-backoff log score,
    * `ln_u` the add-one unigram log prob of the SAME position's word
    * (what the score backs off TO, sans the α penalty). Shared expression
    * text keeps every double bit-identical between [[scoreStupidBackoff]]
    * and [[Doremi.domainWeights]]'s excess-loss consumer; `carry` columns
    * (e.g. a domain label) ride the occurrence stream so consumers
    * grouping by something other than the doc id pay no join-back. */
  def positionScores(train: DataFrame, docs: DataFrame,
                     idCol: String = "doc_id", textCol: String = "text",
                     alpha: Double = 0.4,
                     carry: Seq[String] = Nil): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    import graft.functions.expressions.ShingleExpr
    def grams(df: DataFrame, n: Int) = ColumnBridge.column(
      ShingleExpr(ColumnBridge.expression(df(textCol)), n))
    // train: unigram + bigram count tables (vocabulary-sized)
    val uni = graft.Spread(train)
      .select(F.explode(grams(train, 1)).as("tok"))
      .groupBy(F.col("tok")).agg(F.count(F.lit(1)).as("c1"))
    val totals = uni.agg(
      F.coalesce(F.sum(F.col("c1")), F.lit(0L)).as("n_total"),
      F.count(F.lit(1)).as("v_size"))
    val bgCounts = graft.Spread(train)
      .select(F.explode(grams(train, 2)).as("bg"))
      .groupBy(F.col("bg")).agg(F.count(F.lit(1)).as("c2"))
    // the conditional-probability ratio rides IN the bigram table: one
    // vocab-sized join here instead of a per-occurrence c(v) join below
    val bgRatio = bgCounts
      .select(F.col("bg"), F.split(F.col("bg"), " ").getItem(0).as("tok"), F.col("c2"))
      .join(uni, Seq("tok"))
      .select(F.col("bg"),
        (F.col("c2").cast("double") / F.col("c1").cast("double")).as("r"))
    // score stream: bigram occurrences with the backoff word carried
    val occ = graft.Spread(docs)
      .select(docs(idCol) +: carry.map(docs(_)) :+ F.explode(grams(docs, 2)).as("bg"): _*)
      .select(F.col(idCol) +: carry.map(F.col) :+ F.col("bg") :+
        F.split(F.col("bg"), " ").getItem(1).as("tok"): _*)
      .repartition(F.col("bg"))
    // identical IEEE op order to the oracle: seen → ln(c2/c1-as-doubles);
    // unseen → ln(alpha * u), with u = (c_w + 1.0) / (N + V + 1.0)
    val u = (F.coalesce(F.col("c1"), F.lit(0L)).cast("double") + F.lit(1.0)) /
      (F.col("n_total").cast("double") + F.col("v_size").cast("double") + F.lit(1.0))
    occ
      .join(bgRatio.hint("shuffle_hash"), Seq("bg"), "left")
      .join(uni, Seq("tok"), "left")
      .crossJoin(F.broadcast(totals))
      .select(F.col(idCol) +: carry.map(F.col) :+
        F.when(F.col("r").isNotNull, F.log(F.col("r")))
          .otherwise(F.log(F.lit(alpha) * u)).as("ln_s") :+
        F.log(u).as("ln_u"): _*)
  }
}
