package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Bpe, ByteBpe}

/** Byte-level BPE (GPT-2 construction) pins: the byte↔unicode bijection,
  * structural losslessness on arbitrary Unicode (zero unknowns — the
  * property that made byte-level the production default), the byte
  * checksum, compression by merges, and bit-exact retrain. */
class ByteBpeSpec extends AnyFunSuite with SparkFixture {

  test("byte<->unicode mapping is a bijection over all 256 bytes") {
    val s = (0 until 256).map(ByteBpe.mapByte).mkString
    assert(s.length == 256 && s.toSet.size == 256, "mapping must be injective")
    val back = ByteBpe.unmapToBytes(s)
    assert(back.toSeq == (0 until 256).map(_.toByte).toSeq,
      "unmapToBytes must invert the byte mapping")
    // Printable latin-1 bytes map to themselves (the GPT-2 identity
    // ranges); the space byte does not (it is remapped past 255).
    assert(ByteBpe.mapByte('a'.toInt) == 'a' && ByteBpe.mapByte('!'.toInt) == '!')
    assert(ByteBpe.mapByte(' '.toInt) > 255.toChar)
  }

  test("encode is lossless on emoji/CJK/accents with ZERO unknowns") {
    import spark.implicits._
    val docs = Seq(
      (1L, "héllo wörld"),
      (2L, "你好 世界 🚀🚀"),
      (3L, "plain ascii words here")).toDF("doc_id", "text")
    val merges = ByteBpe.train(docs, numMerges = 8)
    val enc = ByteBpe.encode(docs, merges).collect()
      .groupBy(r => (r.getLong(0), r.getString(1)))
      .map { case (k, rs) =>
        k -> rs.sortBy(_.getInt(2)).map(_.getString(3)).toVector }
    assert(enc.nonEmpty)
    for (((_, w), toks) <- enc) {
      // Concatenate tokens, unmap bytes: the exact (lowercased) word —
      // for EVERY word, emoji and CJK included; no [UNK] exists here.
      assert(ByteBpe.unmap(toks.mkString) == w, s"$w -> $toks")
      // Mapped token length is a byte count.
      assert(toks.map(_.length).sum == w.getBytes("UTF-8").length, s"$w -> $toks")
    }
  }

  test("merges compress the training corpus vs the 0-merge byte stream") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark spark merge merge merge"),
      (2L, "spark merge spark merge")).toDF("doc_id", "text")
    val merges = ByteBpe.train(docs, numMerges = 8)
    assert(merges.nonEmpty)
    val n0 = ByteBpe.encode(docs, Seq.empty).count()
    val n8 = ByteBpe.encode(docs, merges).count()
    assert(n8 < n0, s"merges must shorten the stream: $n8 !< $n0")
  }

  test("retrain on the same corpus is bit-for-bit identical") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val a = ByteBpe.train(docs, numMerges = 12)
    val b = ByteBpe.train(docs, numMerges = 12)
    assert(a == b && a.size == 12)
  }
}
