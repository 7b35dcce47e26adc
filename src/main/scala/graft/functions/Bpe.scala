package graft.functions

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Byte-pair-encoding tokenizer TRAINING and encoding, run ON the engine —
  * the "train a tokenizer on the corpus" step of a pretraining pipeline
  * (Sennrich et al. 2016), expressed Spark-first.
  *
  * Scale shape — the part that matters at 100 TB:
  *   - The corpus is scanned ONCE: a single map-combinable aggregation to
  *     the distinct-word count table `(word, n)`. Classic BPE trainers do
  *     exactly this (word-level pre-tokenization; merges never cross word
  *     boundaries), so every one of the K merge iterations runs over the
  *     VOCABULARY table — millions of rows at web scale, not the corpus —
  *     re-segmenting each word from scratch with the merges-so-far (a
  *     pure, stateless function of (word, merges): no per-iteration
  *     distributed state to carry, nothing to checkpoint).
  *   - Per iteration: one flatMap over the vocab (adjacent symbol pairs
  *     weighted by word count), one count aggregation, one
  *     TakeOrdered(1) — the same "global argmax with deterministic
  *     tie-break" shape as the k-means trainers. Driver state is the
  *     merge list itself: K pairs, bounded like the centroid arrays.
  *   - Ties break on (count DESC, left ASC, right ASC), where string
  *     order is UTF-8 BYTE order (what Spark's orderBy compares) — a
  *     total order, so training is bit-reproducible across partitionings
  *     and engines. Note the contract precisely: byte order differs from
  *     Java's UTF-16 compareTo for supplementary-plane symbols (emoji vs
  *     U+E000+ BMP chars); BpeSpec's independent reference compares
  *     bytes for exactly this reason.
  *
  * Training is NOT SQL-replicable (greedy left-to-right re-segmentation
  * is sequential within a word; a recursive-CTE replay would be a
  * different algorithm, not an oracle), so the driver gate is rows-only —
  * semantics are pinned by BpeSpec against an independent
  * collections-based reference implementation on randomized corpora,
  * the row-45/row-102 precedent. */
object Bpe {

  /** Greedy left-to-right application of `merges`, IN ORDER, to one word —
    * the standard BPE encode (training applies the same function with the
    * merges-so-far). Pure and allocation-light; lives on executors inside
    * [[train]]'s per-iteration closure and [[encode]]'s flatMap. */
  def segment(word: String, merges: Seq[(String, String)]): Vector[String] = {
    // Base symbols are CODE POINTS, not UTF-16 chars: a char-level split
    // would make each half of a surrogate pair (emoji etc.) its own
    // symbol — a lone surrogate is not valid UTF-8, so those "symbols"
    // mangle to '?' the moment they round-trip through a UTF8String
    // column and distinct pairs collapse.
    var syms: Vector[String] = codePoints(word)
    var mi = 0
    while (mi < merges.length) {
      val (l, r) = merges(mi)
      // fast skip: a merge whose parts never occur can't change the word
      if (syms.contains(l)) {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.result()
      }
      mi += 1
    }
    syms
  }

  /** One string per Unicode code point (surrogate pairs stay whole). */
  private def codePoints(word: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** The one-corpus-scan word-count table `(word, n)` the trainer and
    * encoder both start from. */
  private def wordCounts(docs: DataFrame, textCol: String): DataFrame = {
    val toks = ColumnBridge.column(
      graft.functions.expressions.ShingleExpr(
        ColumnBridge.expression(F.col(textCol)), 1))
    graft.Spread(docs)
      .select(F.explode(toks).as("word"))
      .groupBy(F.col("word"))
      .agg(F.count(F.lit(1)).as("n"))
  }

  /** Train `numMerges` BPE merges on the corpus. Returns the ordered merge
    * table — the trained tokenizer. Stops early when no adjacent pair
    * occurs at least twice (merging singletons is noise). */
  def train(docs: DataFrame, textCol: String = "text",
            numMerges: Int = 16): Seq[(String, String)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // The vocab table is the K iterations' ONLY input — cache it (tiny
    // relative to the corpus: distinct words x (word, long)).
    val vocab = wordCounts(docs, textCol).as[(String, Long)].cache()
    try {
      var merges = Vector.empty[(String, String)]
      var continue = true
      while (continue && merges.length < numMerges) {
        val m = merges // stable reference for the closure
        val top = vocab
          .flatMap { case (w, n) =>
            val s = segment(w, m)
            (0 until s.length - 1).map(i => (s(i), s(i + 1), n))
          }
          .toDF("l", "r", "n")
          .groupBy(F.col("l"), F.col("r"))
          .agg(F.sum(F.col("n")).as("cnt"))
          .filter(F.col("cnt") >= 2)
          .orderBy(F.col("cnt").desc, F.col("l").asc, F.col("r").asc)
          .limit(1) // TakeOrdered: per-partition top + driver merge, no full sort
          .collect()
        if (top.isEmpty) continue = false
        else merges :+= ((top(0).getString(0), top(0).getString(1)))
      }
      merges
    } finally { vocab.unpersist(); () }
  }

  /** Encode every document with a trained merge table: one row per
    * (doc, token) with the token's position — the tokenize-the-corpus
    * step. Pure flatMap over the scan; merges ride the closure (bounded:
    * K pairs, the broadcast-centroids pattern). */
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
      .flatMap { case (id, w) =>
        segment(w, merges).zipWithIndex.map { case (t, i) => (id, w, i, t) }
      }
      .toDF(idCol, "word", "pos", "token")
  }
}
