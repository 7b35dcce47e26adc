package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Wordpiece

/** WordPiece (Schuster & Nakajima 2012 / BERT) tokenizer pins: the
  * likelihood-gain selection rule (where it DISAGREES with BPE's raw
  * count rule), the exact-rational tie-break, greedy longest-match
  * encode, whole-word [UNK], losslessness off the UNK path, and
  * bit-exact retrain — the [[BpeSpec]]/[[SpmSpec]] contract for the
  * third family. */
class WordpieceSpec extends AnyFunSuite with SparkFixture {

  test("training maximizes likelihood gain, not raw pair count (the anti-BPE corpus)") {
    // Pair (x,##y) occurs 10x, (q,##z) only 3x — BPE would merge xy
    // first. WordPiece scores: 10/(10*10) = 0.1 < 3/(3*3) = 0.333, so qz
    // merges FIRST.
    val vocab = Wordpiece.trainFromHistogram(
      Array(("xy", 10L), ("qz", 3L)), numMerges = 2)
    assert(vocab == Seq("##y", "##z", "q", "x", "qz", "xy"),
      s"got $vocab")
  }

  test("score ties break on the lexicographically smaller pair, merges stop when pairs dry up") {
    // (a,##a): 4/(6*4) = 1/6 and (a,##b): 2/(6*2) = 1/6 — exact tie; the
    // rational compare must see it as one (no float fuzz) and take
    // (a,##a). After both merges nothing repeats, so numMerges = 5 stops
    // at 2.
    val vocab = Wordpiece.trainFromHistogram(
      Array(("aa", 4L), ("ab", 2L)), numMerges = 5)
    assert(vocab == Seq("##a", "##b", "a", "aa", "ab"), s"got $vocab")
  }

  test("segment is greedy longest-match-first with continuation prefixes") {
    val vocab = Set("a", "##b", "##c", "##d", "ab", "abc")
    assert(Wordpiece.segment("abcd", vocab) == Vector("abc", "##d"))
    assert(Wordpiece.segment("abc", vocab) == Vector("abc"))
    assert(Wordpiece.segment("ab", vocab) == Vector("ab"))
    // A position no piece covers turns the WHOLE word into [UNK].
    assert(Wordpiece.segment("abx", vocab) == Vector(Wordpiece.Unk))
    assert(Wordpiece.segment("xab", vocab) == Vector(Wordpiece.Unk))
  }

  test("encode: lossless off the UNK path, whole-word UNK on it") {
    import spark.implicits._
    val train = Seq((1L, "alpha beta alpha"), (2L, "beta beta gamma")).toDF("doc_id", "text")
    val vocab = Wordpiece.train(train, numMerges = 8)
    val docs = Seq((1L, "alpha beta"), (2L, "zz9 gamma")).toDF("doc_id", "text")
    val enc = Wordpiece.encode(docs, vocab).collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getInt(2)).map(_.getString(3)).toVector }
    // Trained-corpus words reassemble exactly (strip ## and concat).
    for (((_, w), toks) <- enc if w != "zz9") {
      assert(!toks.contains(Wordpiece.Unk), s"$w -> $toks")
      assert(toks.map(_.stripPrefix(Wordpiece.Cont)).mkString == w, s"$w -> $toks")
    }
    // "zz9" contains code points the vocabulary never saw.
    assert(enc((2L, "zz9")) == Vector(Wordpiece.Unk))
  }

  test("retrain on the same corpus is bit-for-bit identical") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val a = Wordpiece.train(docs, numMerges = 12)
    val b = Wordpiece.train(docs, numMerges = 12)
    assert(a == b)
    assert(a.size > 12, "vocabulary must contain the base alphabet plus merges")
  }
}
