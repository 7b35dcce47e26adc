package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** WordPiece tokenizer TRAINING and encoding, run ON the engine — the
  * third major subword family next to BPE (row 130, [[Bpe]]) and the
  * unigram LM (rows 156/157, [[Spm]]): Schuster & Nakajima (ICASSP 2012)
  * as used by BERT (Devlin et al. 2019) and documented in the public
  * HuggingFace tokenizers reference.
  *
  * Training is BPE-shaped — greedy pair merging over the word histogram —
  * but the selection rule differs: WordPiece merges the pair maximizing
  * the unigram-LM likelihood GAIN, score(a,b) = count(ab) /
  * (count(a)·count(b)), not the raw pair count. A rare pair whose halves
  * are also rare outranks a frequent pair of frequent halves (the spec
  * pins a corpus where the two rules disagree). Non-initial subwords
  * carry the `##` continuation prefix, so "a" + "##b" merges to "ab" and
  * "##a" + "##b" to "##ab".
  *
  * Determinism contract (the [[Bpe]]/[[Spm]] standard — retrain is
  * bit-for-bit): scores compare as exact rationals by 128-bit
  * cross-multiplication (count(ab)·count(a')·count(b') vs the mirror —
  * NO floating-point likelihoods), ties break on the lexicographically
  * smaller (left, right) pair; the emitted vocabulary orders the base
  * alphabet lexicographically, then merged pieces in merge order.
  *
  * Encoding is the published greedy longest-match-first (maximal munch):
  * at each position take the LONGEST vocabulary piece (with `##` when
  * not word-initial); a word with any uncoverable position encodes as
  * one `[UNK]` — BERT's behavior, pinned by the spec. Base alphabet
  * membership makes every trained-corpus word coverable.
  *
  * Scale shape — identical to the [[Bpe]] contract: ONE corpus scan to
  * the word-count table (vocabulary-sized, map-side combinable), trainer
  * state bounded by the distinct-word histogram (driver-side by design),
  * encode a zero-shuffle flatMap with the vocabulary riding the closure
  * and a per-partition word memo. Rows-only gates by the tokenizer
  * contract (train+encode not SQL-replicable); WordpieceSpec pins the
  * likelihood argmax, the tie rule, greedy longest-match, UNK, and
  * bit-exact retrain.
  *
  * Reference: the reference engine tokenizes documents in its pipeline
  * examples (the WHAT); the histogram-train / scan-encode split is the
  * Spark-native HOW shared by all three tokenizer families here.
  */
object Wordpiece {

  val Unk = "[UNK]"
  val Cont = "##"

  /** Strip the continuation prefix when merging: "a"+"##b" → "ab". */
  private def mergedPiece(l: String, r: String): String =
    l + (if (r.startsWith(Cont)) r.substring(Cont.length) else r)

  /** Train `numMerges` WordPiece merges on the corpus; returns the full
    * vocabulary — base alphabet (word-initial and `##`-continuation code
    * points, lexicographic) followed by merged pieces in merge order.
    * Stops early when no adjacent pair occurs at least twice (the [[Bpe]]
    * noise rule). */
  def train(docs: DataFrame, numMerges: Int,
            textCol: String = "text"): Seq[String] = {
    val hist = Bpe.wordCounts(docs, textCol)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromHistogram(hist, numMerges)
  }

  /** Driver-side trainer over the bounded word histogram (the
    * [[Bpe.train]]/[[Spm.trainFromHistogram]] state contract). */
  def trainFromHistogram(hist: Array[(String, Long)],
                         numMerges: Int): Seq[String] = {
    // Symbol arrays per distinct word: initial cp, then ##cp.
    val words: Array[Array[String]] = hist.map { case (w, _) =>
      val cps = Bpe.codePoints(w)
      cps.zipWithIndex.map { case (c, i) => if (i == 0) c else Cont + c }.toArray
    }
    val counts: Array[Long] = hist.map(_._2)
    val alphabet = words.iterator.flatten.toSet.toSeq.sorted

    // Mutable tallies. Symbol/pair counts are occurrence totals weighted
    // by word frequency; `occ` indexes which words currently contain a
    // pair (entries may go stale after a merge touches a word — each use
    // re-verifies against the word's current symbols).
    val symCount = new java.util.HashMap[String, Long]()
    val pairCount = new java.util.HashMap[(String, String), Long]()
    val occ = new java.util.HashMap[(String, String), java.util.ArrayList[Integer]]()

    def bump[K](m: java.util.HashMap[K, Long], k: K, d: Long): Unit = {
      val nv = m.getOrDefault(k, 0L) + d
      if (nv == 0L) m.remove(k) else m.put(k, nv)
    }
    def addWord(wi: Int, sign: Long): Unit = {
      val syms = words(wi); val n = counts(wi) * sign
      var i = 0
      while (i < syms.length) {
        bump(symCount, syms(i), n)
        if (i + 1 < syms.length) {
          val p = (syms(i), syms(i + 1))
          bump(pairCount, p, n)
          if (sign > 0) {
            var l = occ.get(p)
            if (l == null) { l = new java.util.ArrayList[Integer](); occ.put(p, l) }
            l.add(wi)
          }
        }
        i += 1
      }
    }
    words.indices.foreach(addWord(_, 1L))

    val merges = Vector.newBuilder[String]
    var m = 0
    var done = false
    while (m < numMerges && !done) {
      // argmax score = c(ab) / (c(a)·c(b)), exact rational compare.
      var best: (String, String) = null
      var bestC = 0L
      var bestDen = java.math.BigInteger.ZERO
      val it = pairCount.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val c = e.getValue
        if (c >= 2L) {
          val (l, r) = e.getKey
          val den = java.math.BigInteger.valueOf(symCount.get(l))
            .multiply(java.math.BigInteger.valueOf(symCount.get(r)))
          val cmp =
            if (best == null) 1
            else java.math.BigInteger.valueOf(c).multiply(bestDen)
              .compareTo(java.math.BigInteger.valueOf(bestC).multiply(den))
          val better = cmp > 0 || (cmp == 0 && {
            val lc = l.compareTo(best._1)
            lc < 0 || (lc == 0 && r.compareTo(best._2) < 0)
          })
          if (better) { best = e.getKey; bestC = c; bestDen = den }
        }
      }
      if (best == null) done = true
      else {
        val piece = mergedPiece(best._1, best._2)
        merges += piece
        // Rewrite every word currently containing the pair: retract its
        // tallies, splice the merge, re-add.
        val touched = occ.remove(best)
        if (touched != null) {
          val seen = new java.util.HashSet[Integer]()
          val ti = touched.iterator()
          while (ti.hasNext) {
            val wi = ti.next()
            if (seen.add(wi)) {
              val syms = words(wi)
              var has = false
              var i = 0
              while (i + 1 < syms.length && !has) {
                has = syms(i) == best._1 && syms(i + 1) == best._2
                i += 1
              }
              if (has) {
                addWord(wi, -1L)
                val out = Vector.newBuilder[String]
                var j = 0
                while (j < syms.length) {
                  if (j + 1 < syms.length && syms(j) == best._1 && syms(j + 1) == best._2) {
                    out += piece; j += 2
                  } else { out += syms(j); j += 1 }
                }
                words(wi) = out.result().toArray
                addWord(wi, 1L)
              }
            }
          }
        }
        // Drop zeroed pairs so the argmax scan stays tight.
        pairCount.entrySet().removeIf(e => e.getValue <= 0L)
        m += 1
      }
    }
    alphabet ++ merges.result()
  }

  /** Greedy longest-match segmentation of one (lowercased) word under a
    * vocabulary set; `Vector(Unk)` when any position is uncoverable. */
  def segment(word: String, vocab: Set[String]): Vector[String] = {
    val cps = Bpe.codePoints(word)
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < cps.length) {
      var j = cps.length
      var hit: String = null
      while (hit == null && j > i) {
        val raw = cps.slice(i, j).mkString
        val cand = if (i == 0) raw else Cont + raw
        if (vocab.contains(cand)) hit = cand else j -= 1
      }
      if (hit == null) return Vector(Unk)
      out += hit
      i = j
    }
    out.result()
  }

  /** Encode every document: one row per (doc, token) with position — the
    * [[Bpe.encode]] shape (zero-shuffle flatMap, vocabulary in the
    * closure, per-partition distinct-word memo). */
  def encode(docs: DataFrame, vocab: Seq[String],
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val vset = vocab.toSet
    val toks = ColumnBridge.column(
      graft.functions.expressions.ShingleExpr(
        ColumnBridge.expression(F.col(textCol)), 1))
    graft.Spread(docs)
      .select(F.col(idCol).cast("long"), F.explode(toks).as("word"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Array[String]]()
        it.flatMap { case (id, w) =>
          var t = memo.get(w)
          if (t == null) {
            t = segment(w, vset).toArray
            if (memo.size < (1 << 20)) memo.put(w, t)
          }
          Iterator.tabulate(t.length)(i => (id, w, i, t(i)))
        }
      }
      .toDF(idCol, "word", "pos", "token")
  }

  /** Persist the trained vocabulary (rank = base-alphabet order then
    * merge order — the artifact an encode job loads). */
  def save(spark: org.apache.spark.sql.SparkSession,
           vocab: Seq[String], path: String): Unit = {
    import spark.implicits._
    vocab.zipWithIndex.map { case (p, i) => (i.toLong, p) }
      .toDF("rank", "piece")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[save]]d vocabulary in rank order. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Seq[String] =
    spark.read.parquet(path).orderBy(F.col("rank").asc)
      .collect().map(_.getAs[String]("piece")).toSeq

  /** Per-language fertility / compression for the THIRD tokenizer family
    * on the shared arithmetic ([[Bpe.fertilityFromEncode]]) — BPE vs
    * unigram vs WordPiece read like for like. */
  def fertilityReport(docs: DataFrame, vocab: Seq[String],
                      groupCol: String = "lang", idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    Bpe.fertilityFromEncode(docs, encode(docs, vocab, idCol, textCol),
      groupCol, idCol, textCol)

  /** Tokenizer COVERAGE / OOV report per group (the fertility report's
    * sibling every tokenizer eval ships): from an encode stream and the
    * doc metadata, the per-group token volume, `[UNK]` volume and rate,
    * and the distinct surface-token inventory — the number a vocab
    * decision is judged by before a 100 TB encode run is paid for
    * (an unk_rate spike on one source = its script/domain is outside
    * the trained alphabet).
    *
    * Scale shape: one groupCol join of the (id, token) stream against
    * the docs metadata (broadcast when docs' projection is small, else
    * shuffle on the id — Catalyst's call), then ONE map-side-combinable
    * aggregation to a groups-sized table. distinct-token inventory via
    * count(distinct token) — Spark plans it through Expand on the one
    * exchange.
    *
    * Output: (groupCol, n_docs, n_tokens, n_unk, unk_rate round-6,
    * n_token_types). */
  def coverageFromEncode(encoded: DataFrame, docs: DataFrame,
                         groupCol: String = "source",
                         idCol: String = "doc_id",
                         unk: String = Unk): DataFrame =
    encoded.select(F.col(idCol), F.col("token"))
      .join(docs.select(F.col(idCol), F.col(groupCol)), Seq(idCol))
      .groupBy(F.col(groupCol))
      .agg(
        F.countDistinct(F.col(idCol)).as("n_docs"),
        F.count(F.lit(1)).as("n_tokens"),
        F.sum(F.when(F.col("token") === unk, 1L).otherwise(0L)).as("n_unk"),
        F.countDistinct(F.col("token")).as("n_token_types"))
      .select(F.col(groupCol), F.col("n_docs"), F.col("n_tokens"),
        F.col("n_unk"),
        F.round(F.col("n_unk").cast("double") / F.col("n_tokens").cast("double"), 6)
          .as("unk_rate"),
        F.col("n_token_types"))
}
