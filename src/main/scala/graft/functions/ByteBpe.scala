package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Byte-level BPE — the GPT-2 tokenizer construction (Radford et al.
  * 2019, the public openai/gpt-2 encoder): the FOURTH tokenizer surface,
  * completing BPE (row 130) / unigram-LM (156) / WordPiece (176). The
  * base alphabet is the 256 BYTES of each word's UTF-8 encoding — not
  * its code points — so EVERY string tokenizes with zero unknowns
  * (emoji, CJK, mojibake, anything), the property that made byte-level
  * the production default.
  *
  * Bytes ride through the pipeline as the published byte↔unicode
  * remapping: the 188 printable latin-1 bytes map to themselves and the
  * 68 others (controls, space, DEL, …) to code points 256+n in
  * first-gap order — a bijection onto printable chars, so byte
  * sequences live as ordinary strings and the WHOLE row-130 machinery
  * (trainer, rank-indexed segmentation, memoized zero-shuffle encode)
  * runs unchanged on the mapped words: a mapped char IS one byte
  * symbol. Training is [[Bpe.trainFromHistogram]] on the byte-mapped
  * histogram re-sorted in mapped space (count DESC, mapped word ASC —
  * retrain is bit-for-bit).
  *
  * Losslessness is structural: concatenating a word's tokens and
  * unmapping recovers the exact original word, and each token's mapped
  * length is a BYTE count, so per-doc token chars sum to the corpus's
  * UTF-8 byte total (the gate surfaces exactly that checksum).
  *
  * Reference: the reference engine's pipeline examples tokenize
  * documents (the WHAT); byte-level pre-mapping + the shared
  * histogram-train / scan-encode split is the Spark-native HOW.
  */
object ByteBpe {

  /** GPT-2 bytes_to_unicode: identity on the printable latin-1 ranges
    * ('!'..'~', '¡'..'¬', '®'..'ÿ'), 256+n in order for the rest. */
  private[functions] val byteToCh: Array[Char] = {
    val keep = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val arr = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (keep(b)) arr(b) = b.toChar
      else { arr(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    arr
  }
  private[functions] val chToByte: Map[Char, Byte] =
    byteToCh.zipWithIndex.map { case (c, b) => c -> b.toByte }.toMap

  /** Word → byte-mapped string (one char per UTF-8 byte). */
  def mapWord(w: String): String = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = byteToCh(bytes(i) & 0xff); i += 1 }
    new String(out)
  }

  /** The mapped char of one byte (spec surface for the bijection pin). */
  def mapByte(b: Int): Char = byteToCh(b & 0xff)

  /** Byte-mapped string → the raw bytes it stands for. */
  def unmapToBytes(s: String): Array[Byte] = {
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) { bytes(i) = chToByte(s.charAt(i)); i += 1 }
    bytes
  }

  /** Byte-mapped string (e.g. a token) → original text. */
  def unmap(s: String): String =
    new String(unmapToBytes(s), java.nio.charset.StandardCharsets.UTF_8)

  /** Train byte-level merges: the row-130 histogram scan, words mapped
    * into byte space, the SAME trainer. Returned merge pairs are in
    * mapped space (feed them back to [[encode]]; [[unmap]] renders them
    * for humans). */
  def train(docs: DataFrame, textCol: String = "text",
            numMerges: Int = 16, maxVocab: Int = 4000000): Seq[(String, String)] = {
    val vocab = Bpe.wordCounts(docs, textCol)
      .orderBy(F.col("n").desc, F.col("word").asc)
      .limit(maxVocab)
      .collect().map(r => (mapWord(r.getString(0)), r.getLong(1)))
      .sortBy { case (w, n) => (-n, w) }
    Bpe.trainFromHistogram(vocab, numMerges)
  }

  /** Encode every document: one row per (doc, token) with position,
    * tokens in mapped byte space — the [[Bpe.encode]] shape (zero
    * shuffle, rank-indexed segmentation, per-partition word memo), with
    * the byte mapping applied per distinct word inside the memo. */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = ColumnBridge.column(
      graft.functions.expressions.ShingleExpr(
        ColumnBridge.expression(F.col(textCol)), 1))
    graft.Spread(docs)
      .select(F.col(idCol).cast("long"), F.explode(toks).as("word"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val memo = new java.util.HashMap[String, Array[String]]()
        val ranks = Bpe.rankIndex(merges)
        it.flatMap { case (id, w) =>
          var t = memo.get(w)
          if (t == null) {
            t = Bpe.segmentByRank(mapWord(w), ranks).toArray
            if (memo.size < (1 << 20)) memo.put(w, t)
          }
          Iterator.tabulate(t.length)(i => (id, w, i, t(i)))
        }
      }
      .toDF(idCol, "word", "pos", "token")
  }
}
