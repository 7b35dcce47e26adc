package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}

/** Unigram-LM tokenizer TRAINING and encoding — the SentencePiece unigram
  * algorithm (Kudo 2018, "Subword Regularization"), the other major
  * tokenizer family next to the row-130 BPE: instead of greedy merges, fit
  * a unigram language model over a seed inventory of candidate pieces with
  * EM, prune the inventory down to the target vocabulary, and encode by
  * Viterbi (the maximum-likelihood segmentation).
  *
  * Scale shape — identical to [[Bpe]]: the corpus is scanned ONCE into the
  * word histogram (map-side combinable, `maxVocab`-capped deterministic
  * collect — the bounded-driver-state class); seeding, EM, and pruning run
  * driver-side over vocabulary-scale state (candidate substrings of
  * DISTINCT words); encode is a zero-shuffle scan with a broadcast model
  * and per-partition memoization.
  *
  * Faithful simplifications, all documented and deterministic:
  *  - plain maximum-likelihood EM (the paper Bayesianifies the M-step with
  *    a digamma; ML keeps every double a pure function of integer counts);
  *  - pruning drops the lowest-expected-count multi-char pieces per round
  *    (`keepFrac`) instead of the paper's loss-delta ranking — the common
  *    reimplementation shortcut; single-code-point pieces are NEVER
  *    pruned, so every training word stays segmentable;
  *  - EM runs over words of at most `emMaxWordLen` code points (linear-
  *    space forward-backward; beyond that alpha underflows) — longer
  *    words remain encodable, they just contribute no EM statistics.
  *
  * Determinism contract (the [[Bpe]] discipline): the histogram collect is
  * (count DESC, word ASC); candidate and piece iteration orders are
  * explicit sorts by (count DESC, piece ASC); EM accumulates single-
  * threaded in those orders — retraining on the same corpus reproduces
  * the model bit-for-bit. Training is NOT SQL-replicable (lattice EM has
  * no recursive-CTE oracle), so the gates are rows-only — semantics are
  * pinned by SpmSpec: brute-force-enumeration optimality of the Viterbi
  * encode, hand-computed EM posteriors, normalization, coverage, and
  * round-trip losslessness (the BpeSpec precedent). */
object Spm {

  /** Trained model: (piece, ln p) — probabilities normalized over the
    * final inventory, sorted (p DESC, piece ASC). */
  type Model = Seq[(String, Double)]

  /** Train a unigram tokenizer of `vocabSize` pieces on the corpus.
    *
    * Seeding: every substring of every histogram word up to `maxPieceLen`
    * code points, scored by total occurrence count (count × occurrences
    * within the word); the seed keeps all single-code-point pieces plus
    * the top `seedFactor × vocabSize` multi-char candidates. EM then
    * reweights the inventory (`emIters` sweeps per round), and each round
    * prunes multi-char pieces to `keepFrac` of the survivors until the
    * inventory fits `vocabSize`, with a final EM after the last prune. */
  def train(docs: DataFrame, textCol: String = "text",
            vocabSize: Int = 400, maxPieceLen: Int = 6,
            seedFactor: Int = 4, emIters: Int = 2, keepFrac: Double = 0.75,
            maxVocab: Int = 4000000, emMaxWordLen: Int = 256): Model = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    require(maxPieceLen >= 1, s"maxPieceLen must be >= 1, got $maxPieceLen")
    require(keepFrac > 0.0 && keepFrac < 1.0, s"keepFrac in (0,1), got $keepFrac")
    require(emIters >= 1, s"emIters must be >= 1, got $emIters")
    val vocab: Array[(String, Long)] =
      Bpe.wordCounts(docs, textCol)
        .orderBy(F.col("n").desc, F.col("word").asc)
        .limit(maxVocab)
        .collect().map(r => (r.getString(0), r.getLong(1)))
    trainFromHistogram(vocab.toSeq, vocabSize, maxPieceLen, seedFactor,
      emIters, keepFrac, emMaxWordLen)
  }

  /** The driver-side trainer over an explicit word histogram — split out
    * so SpmSpec can drive hand-computable corpora without a SparkSession
    * table scan. */
  def trainFromHistogram(histogram: Seq[(String, Long)], vocabSize: Int,
                         maxPieceLen: Int = 6, seedFactor: Int = 4,
                         emIters: Int = 2, keepFrac: Double = 0.75,
                         emMaxWordLen: Int = 256): Model = {
    require(emIters >= 1, s"emIters must be >= 1, got $emIters")
    // words as code-point vectors, EM-eligible slice
    val words: Array[(Vector[String], Long)] =
      histogram.iterator.map { case (w, n) => (Bpe.codePoints(w), n) }
        .filter(_._1.nonEmpty).toArray
    if (words.isEmpty) return Seq.empty

    // ---- seed inventory: substring occurrence counts
    val cand = scala.collection.mutable.HashMap.empty[String, Long]
    for ((cps, n) <- words) {
      val L = cps.length
      var i = 0
      while (i < L) {
        val sb = new StringBuilder
        var j = i
        while (j < L && j - i < maxPieceLen) {
          sb.append(cps(j))
          val piece = sb.toString
          cand.update(piece, cand.getOrElse(piece, 0L) + n)
          j += 1
        }
        i += 1
      }
    }
    val singles: Vector[String] = cand.keysIterator
      .filter(p => Bpe.codePoints(p).length == 1).toVector.sorted
    val multiSeeded: Vector[String] = cand.iterator
      .filter { case (p, _) => Bpe.codePoints(p).length > 1 }
      .toVector
      .sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedFactor.toLong.toInt * vocabSize))
      .map(_._1)

    // ---- EM over the current inventory; returns (pieces sorted, probs,
    // expected counts) — pieces indexed for array accumulation
    def emRound(pieces: Vector[String], p0: Array[Double], iters: Int)
        : (Array[Double], Array[Double]) = {
      val idx = pieces.iterator.zipWithIndex.toMap
      var p = p0
      var exp: Array[Double] = null
      var it = 0
      while (it < iters) {
        exp = new Array[Double](pieces.length)
        for ((cps, n) <- words if cps.length <= emMaxWordLen) {
          val L = cps.length
          // piece ids present at (i, j): id(i)(k) for j = i+1+k
          val ids = Array.tabulate(L) { i =>
            val sb = new StringBuilder
            val row = new Array[Int](math.min(maxPieceLen, L - i))
            var j = i
            while (j < L && j - i < maxPieceLen) {
              sb.append(cps(j))
              row(j - i) = idx.getOrElse(sb.toString, -1)
              j += 1
            }
            row
          }
          val alpha = new Array[Double](L + 1); alpha(0) = 1.0
          var j = 1
          while (j <= L) {
            var a = 0.0
            var i0 = math.max(0, j - maxPieceLen)
            while (i0 < j) {
              val id = ids(i0)(j - 1 - i0)
              if (id >= 0) a += alpha(i0) * p(id)
              i0 += 1
            }
            alpha(j) = a
            j += 1
          }
          val z = alpha(L)
          if (z > 0.0) {
            val beta = new Array[Double](L + 1); beta(L) = 1.0
            var i1 = L - 1
            while (i1 >= 0) {
              var b = 0.0
              var j1 = i1 + 1
              while (j1 <= L && j1 - i1 <= maxPieceLen) {
                val id = ids(i1)(j1 - 1 - i1)
                if (id >= 0) b += p(id) * beta(j1)
                j1 += 1
              }
              beta(i1) = b
              i1 -= 1
            }
            // posterior expected count of each occurrence
            var i2 = 0
            while (i2 < L) {
              var j2 = i2 + 1
              while (j2 <= L && j2 - i2 <= maxPieceLen) {
                val id = ids(i2)(j2 - 1 - i2)
                if (id >= 0 && p(id) > 0.0)
                  exp(id) += n.toDouble * (alpha(i2) * p(id) * beta(j2) / z)
                j2 += 1
              }
              i2 += 1
            }
          }
        }
        var tot = 0.0
        var k = 0
        while (k < exp.length) { tot += exp(k); k += 1 }
        val pn = new Array[Double](exp.length)
        if (tot > 0.0) {
          k = 0
          while (k < exp.length) { pn(k) = exp(k) / tot; k += 1 }
        }
        p = pn
        it += 1
      }
      (p, exp)
    }

    // initial inventory + seed probabilities proportional to raw counts
    var pieces: Vector[String] = (singles ++ multiSeeded).sorted
    var probs: Array[Double] = {
      val tot = pieces.iterator.map(cand(_)).sum.toDouble
      pieces.iterator.map(cand(_) / tot).toArray
    }
    var expected: Array[Double] = null

    // EM + shrink until the inventory fits vocabSize
    var done = false
    while (!done) {
      val (p1, e1) = emRound(pieces, probs, emIters)
      probs = p1; expected = e1
      if (pieces.length <= vocabSize) done = true
      else {
        val multiCount = pieces.length - singles.length
        val target = math.max(vocabSize - singles.length,
          math.floor(multiCount * keepFrac).toInt)
        val byScore = pieces.iterator.zipWithIndex
          .filter { case (pc, _) => Bpe.codePoints(pc).length > 1 }
          .toVector
          .sortBy { case (pc, i) => (-expected(i), pc) }
          .take(math.max(0, target))
          .map(_._1)
        val next = (singles ++ byScore).sorted
        if (next.length == pieces.length) done = true // cannot shrink further
        else {
          // re-init probs for the shrunk inventory from surviving expected
          // counts (renormalized) — the standard warm restart
          val idxOld = pieces.iterator.zipWithIndex.toMap
          val raw = next.iterator.map(pc => expected(idxOld(pc))).toArray
          var tot = 0.0
          raw.foreach(tot += _)
          pieces = next
          probs =
            if (tot > 0.0) raw.map(_ / tot)
            else Array.fill(next.length)(1.0 / next.length)
        }
      }
    }
    pieces.iterator.zipWithIndex
      .filter { case (_, i) => probs(i) > 0.0 }
      .map { case (pc, i) => (pc, math.log(probs(i))) }
      .toVector
      .sortBy { case (pc, lp) => (-lp, pc) }
  }

  /** Viterbi (max-likelihood) segmentation of one word under the model.
    * Ties break deterministically: higher score, then FEWER pieces, then
    * the earlier split point. Code points absent from the model map to
    * themselves at `unkScore` (one decade below the rarest piece by
    * default), so every word is segmentable. */
  def segmentViterbi(word: String, model: java.util.HashMap[String, Double],
                     maxPieceLen: Int, unkScore: Double): Vector[String] = {
    val cps = Bpe.codePoints(word)
    val L = cps.length
    if (L == 0) return Vector.empty
    val best = new Array[Double](L + 1)
    val bestN = new Array[Int](L + 1)
    val bestFrom = new Array[Int](L + 1)
    java.util.Arrays.fill(best, Double.NegativeInfinity)
    best(0) = 0.0; bestN(0) = 0; bestFrom(0) = -1
    var j = 1
    while (j <= L) {
      var i = math.max(0, j - maxPieceLen)
      while (i < j) {
        if (best(i) > Double.NegativeInfinity) {
          val piece = cps.slice(i, j).mkString
          val lp0 = model.get(piece)
          val lp = if (model.containsKey(piece)) lp0
            else if (j - i == 1) unkScore else Double.NaN
          if (!lp.isNaN) {
            val cand = best(i) + lp
            val candN = bestN(i) + 1
            if (cand > best(j) ||
                (cand == best(j) && (candN < bestN(j) ||
                  (candN == bestN(j) && i < bestFrom(j))))) {
              best(j) = cand; bestN(j) = candN; bestFrom(j) = i
            }
          }
        }
        i += 1
      }
      j += 1
    }
    // backtrack
    var out = List.empty[String]
    var pos = L
    while (pos > 0) {
      val i = bestFrom(pos)
      out = cps.slice(i, pos).mkString :: out
      pos = i
    }
    out.toVector
  }

  /** The default unknown-code-point score: one decade (ln 10) below the
    * model's rarest piece. */
  def defaultUnkScore(model: Model): Double =
    if (model.isEmpty) math.log(1e-9)
    else model.iterator.map(_._2).min - math.log(10.0)

  /** Per-group fertility / compression for the unigram tokenizer — the
    * row-146 report on [[Bpe.fertilityFromEncode]]'s shared arithmetic,
    * so BPE and unigram vocabularies are compared like for like (the
    * decision the two trainers exist to inform). */
  def fertilityReport(docs: DataFrame, model: Model,
                      groupCol: String = "lang", idCol: String = "doc_id",
                      textCol: String = "text", maxPieceLen: Int = 6): DataFrame =
    Bpe.fertilityFromEncode(docs, encode(docs, model, idCol, textCol, maxPieceLen),
      groupCol, idCol, textCol)

  /** Zero-shuffle corpus encode with the broadcast model ([[Bpe.encode]]'s
    * shape: per-partition word memo, (idCol, word, pos, token) rows). */
  def encode(docs: DataFrame, model: Model, idCol: String = "doc_id",
             textCol: String = "text", maxPieceLen: Int = 6): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val toks = ColumnBridge.column(
      graft.functions.expressions.ShingleExpr(
        ColumnBridge.expression(F.col(textCol)), 1))
    val modelSeq = model
    val unk = defaultUnkScore(model)
    graft.Spread(docs)
      .select(F.col(idCol).cast("long"), F.explode(toks).as("word"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = new java.util.HashMap[String, Double]()
        modelSeq.foreach { case (pc, lp) => m.put(pc, lp) }
        val memo = new java.util.HashMap[String, Array[String]]()
        it.flatMap { case (id, w) =>
          var t = memo.get(w)
          if (t == null) {
            t = segmentViterbi(w, m, maxPieceLen, unk).toArray
            if (memo.size < (1 << 20)) memo.put(w, t)
          }
          Iterator.tabulate(t.length)(i => (id, w, i, t(i)))
        }
      }
      .toDF(idCol, "word", "pos", "token")
  }
}
