package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Spm

/** Unigram-LM tokenizer (SentencePiece, Kudo 2018) — independent-reference
  * pins, the BpeSpec precedent: Viterbi encode checked against brute-force
  * enumeration of ALL segmentations, EM posteriors checked against exact
  * hand-computed rationals, pruning/coverage/normalization invariants. */
class SpmSpec extends AnyFunSuite with SparkFixture {

  private def viterbiMap(model: Spm.Model): java.util.HashMap[String, Double] = {
    val m = new java.util.HashMap[String, Double]()
    model.foreach { case (p, lp) => m.put(p, lp) }
    m
  }

  /** Brute-force reference: enumerate EVERY segmentation (model pieces,
    * plus single chars at unkScore when absent) and pick the best under
    * the documented tie rule (score desc, fewer pieces, earlier split at
    * each boundary — realized here by preferring the lexicographically
    * smallest split-point sequence read right-to-left, which is what
    * "earlier i at each j" backtracks to). */
  private def bruteSegs(word: String, model: Map[String, Double],
                        maxLen: Int, unk: Double): Seq[(Double, Int, Vector[String])] = {
    if (word.isEmpty) return Seq((0.0, 0, Vector.empty))
    (1 to math.min(maxLen, word.length)).flatMap { k =>
      val head = word.substring(0, k)
      val lp = model.get(head).orElse(if (k == 1) Some(unk) else None)
      lp match {
        case None => Seq.empty
        case Some(s) =>
          bruteSegs(word.substring(k), model, maxLen, unk).map {
            case (sc, n, toks) => (sc + s, n + 1, head +: toks)
          }
      }
    }
  }

  test("segmentViterbi matches brute-force enumeration on randomized models") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd"
    for (trial <- 1 to 60) {
      // random piece inventory over a tiny alphabet, random word
      val pieces = (for {
        len <- 1 to 3
        _ <- 1 to 4
      } yield Vector.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
        .distinct
      // distinct irrational-ish scores: exact ties can't occur, so the
      // brute-force argmax is unique and tie rules are moot here
      val model: Map[String, Double] =
        pieces.map(p => p -> (-1.0 - rnd.nextDouble() * 5.0)).toMap
      val unk = -20.0 - rnd.nextDouble()
      val word = Vector.fill(1 + rnd.nextInt(7))(
        alphabet(rnd.nextInt(alphabet.length))).mkString
      val got = Spm.segmentViterbi(word,
        viterbiMap(model.toSeq), maxPieceLen = 3, unkScore = unk)
      val all = bruteSegs(word, model, 3, unk)
      assert(all.nonEmpty, s"no segmentation for $word")
      val bestScore = all.map(_._1).max
      val gotScore = got.map(t => model.getOrElse(t, unk)).sum
      assert(math.abs(gotScore - bestScore) < 1e-12,
        s"trial $trial word=$word got=$got score=$gotScore best=$bestScore")
      assert(got.mkString == word, s"lossless: $got != $word")
    }
  }

  test("segmentViterbi exact tie: fewer pieces win") {
    // lp(ab) == lp(a) + lp(b) exactly — [ab] must win by the fewer-pieces
    // rule
    val model: Spm.Model = Seq(("a", -1.0), ("b", -1.0), ("ab", -2.0))
    val got = Spm.segmentViterbi("ab", viterbiMap(model), 2, -50.0)
    assert(got == Vector("ab"), s"tie must prefer fewer pieces: $got")
  }

  test("trainFromHistogram: EM posteriors match exact hand-computed rationals") {
    // corpus = {"ab" x2}; candidates a, b, ab (each count 2) -> seed
    // p = 1/3 each. Iter 1: Z = p(ab) + p(a)p(b) = 1/3 + 1/9 = 4/9;
    // post(ab) = 3/4, post(a) = post(b) = 1/4; counts (n=2): 1.5/.5/.5,
    // total 2.5 -> p = (0.6, 0.2, 0.2). Iter 2: Z = .6 + .04 = .64;
    // post(ab) = 15/16 -> counts 1.875/.125/.125, total 2.125 ->
    // p(ab) = 15/17, p(a) = p(b) = 1/17.
    val model = Spm.trainFromHistogram(Seq(("ab", 2L)), vocabSize = 3,
      maxPieceLen = 2, emIters = 2)
    val m = model.toMap
    assert(m.keySet == Set("a", "b", "ab"))
    assert(math.abs(m("ab") - math.log(15.0 / 17.0)) < 1e-12, s"p(ab): $m")
    assert(math.abs(m("a") - math.log(1.0 / 17.0)) < 1e-12, s"p(a): $m")
    assert(math.abs(m("b") - math.log(1.0 / 17.0)) < 1e-12, s"p(b): $m")
    // normalization: probs sum to 1
    val tot = model.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(tot - 1.0) < 1e-12, s"sum=$tot")
  }

  test("pruning keeps singles, drops weak multis, and reaches vocabSize") {
    // "abab" dominates: piece "ab" (and "abab"...) should survive a harsh
    // prune; junk multis from the rare word should go
    val hist = Seq(("abab", 50L), ("cd", 1L))
    val model = Spm.trainFromHistogram(hist, vocabSize = 6,
      maxPieceLen = 3, emIters = 2, keepFrac = 0.5)
    val pieceSet = model.map(_._1).toSet
    // all singles of the training corpus survive
    assert(Set("a", "b", "c", "d").subsetOf(pieceSet), s"singles lost: $pieceSet")
    assert(model.length <= 6, s"vocab over target: $model")
    assert(pieceSet.contains("ab"), s"dominant piece pruned: $pieceSet")
    // probabilities normalized over survivors
    val tot = model.map { case (_, lp) => math.exp(lp) }.sum
    assert(math.abs(tot - 1.0) < 1e-9, s"sum=$tot")
  }

  test("encode: lossless round-trip, unknown code points fall back, memo-safe") {
    import spark.implicits._
    val model = Spm.trainFromHistogram(
      Seq(("hello", 5L), ("world", 4L), ("held", 2L)), vocabSize = 20,
      maxPieceLen = 4, emIters = 2)
    val docs = Seq((1L, "hello world"), (2L, "held hello"), (3L, "zq held"))
      .toDF("doc_id", "text")
    val out = Spm.encode(docs, model, maxPieceLen = 4).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    // per (doc, word): concat of tokens in pos order == word (lossless)
    out.groupBy(t => (t._1, t._2)).foreach { case ((_, w), ts) =>
      val rebuilt = ts.sortBy(_._3).map(_._4).mkString
      assert(rebuilt == w, s"round-trip broke: $w -> $rebuilt")
    }
    // the unknown-char word still encodes (single-cp fallback)
    assert(out.exists(t => t._2 == "zq"), "unknown word missing from encode")
  }

  test("fertilityReport: hand-computable per-group metrics on a fixed model") {
    import spark.implicits._
    val model: Spm.Model = Seq(
      ("ab", math.log(0.5)), ("a", math.log(0.25)), ("b", math.log(0.25)))
    val docs = Seq(
      (1L, "en", "ab ab"),   // 2 words -> 2 tokens ("ab"), 5 chars
      (2L, "en", "aab"),     // 1 word  -> 2 tokens ("a","ab"), 3 chars
      (3L, "fr", "b")        // 1 word  -> 1 token, 1 char
    ).toDF("doc_id", "lang", "text")
    val out = Spm.fertilityReport(docs, model).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))).toMap
    assert(out("en") == ((3L, 4L, 8L, 1.333333, 2.0)), s"$out")
    assert(out("fr") == ((1L, 1L, 1L, 1.0, 1.0)), s"$out")
  }

  test("training is deterministic: same histogram, same model") {
    val hist = Seq(("spark", 7L), ("sparse", 3L), ("park", 5L))
    val a = Spm.trainFromHistogram(hist, vocabSize = 12, emIters = 2)
    val b = Spm.trainFromHistogram(hist, vocabSize = 12, emIters = 2)
    assert(a == b, "retrain diverged bit-for-bit")
  }
}
