package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

import graft.functions.TextFunctions

/** Context-window preparation for LLM training: split long documents into
  * overlapping token-window chunks, and pack short documents into
  * fixed-budget sequences.
  *
  * Both are pure relational shapes — a row-local explode for chunking, a
  * per-partition running-sum window for packing — so they scale as scans
  * plus at most one key shuffle, and both have exact SQL oracles.
  */
object Packing {

  /** Split each document into chunks of `size` whitespace tokens with
    * `overlap` tokens of context carried between consecutive chunks
    * (stride = size - overlap). Row-local: the chunk windows are a
    * `sequence` explode and each chunk re-joins its token slice — no
    * shuffle at all; output is (id, chunk_ix, chunk_text, n_tokens).
    * Documents shorter than `size` yield one chunk. The final chunk may
    * be shorter than `size`; a chunk never starts past the last token. */
  def chunk(docs: DataFrame, size: Int, overlap: Int,
            idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(size > 0 && overlap >= 0 && overlap < size,
      s"need 0 <= overlap < size, got size=$size overlap=$overlap")
    val stride = size - overlap
    val toks = TextFunctions.tokens(F.col(textCol))
    // number of chunks: ceil(max(n - overlap, 1) / stride), indexes 0..k-1
    val n = F.size(F.col("__toks"))
    val k = F.ceil(F.greatest(n - overlap, F.lit(1)).cast("double") / stride)
      .cast("int")
    docs
      .select(F.col(idCol), toks.as("__toks"))
      .filter(F.size(F.col("__toks")) > 0)
      .select(F.col(idCol), F.col("__toks"),
        F.explode(F.sequence(F.lit(0), k - 1)).as("chunk_ix"))
      .select(
        F.col(idCol), F.col("chunk_ix").cast("long").as("chunk_ix"),
        F.concat_ws(" ",
          F.slice(F.col("__toks"), F.col("chunk_ix") * stride + 1, F.lit(size))).as("chunk_text"),
        F.least(F.size(F.col("__toks")) - F.col("chunk_ix") * stride, F.lit(size))
          .cast("long").as("n_tokens"))
  }

  /** Greedy sequential packing: within each `groupCol` stratum, documents
    * (in `idCol` order) accumulate into bins of `budget` tokens —
    * bin id = floor(exclusive-prefix-sum / budget) over the running token
    * count, the streaming-friendly approximation of first-fit packing.
    * Bins are budget-SIZED, not budget-CAPPED: a document whose tokens
    * straddle a budget boundary stays in the bin it started in (bin_pos +
    * n_tokens may exceed `budget` by up to one document's length — true
    * capped first-fit needs sequential state per stratum, not a prefix
    * sum). Fixed-context consumers should [[chunk]] first so no document
    * exceeds the overflow they can absorb, or read contiguously by
    * (bin, bin_pos) where the boundary doc simply spills into the next
    * window. One window pass per stratum: the shuffle key is `groupCol`,
    * state is a running sum — the same shape at 100 TB with a date/shard
    * column as the stratum.
    *
    * Output: (group, id, n_tokens, bin, bin_pos). */
  def pack(docs: DataFrame, budget: Long, groupCol: String = "source",
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0, "budget must be positive")
    val w = Window.partitionBy(F.col(groupCol)).orderBy(F.col(idCol).asc)
    val nTok: Column = TextFunctions.tokenCount(F.col(textCol))
    docs
      .select(F.col(groupCol), F.col(idCol), nTok.as("n_tokens"))
      .withColumn("__cum",
        F.coalesce(
          F.sum(F.col("n_tokens")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)),
          F.lit(0L)))
      .select(
        F.col(groupCol), F.col(idCol), F.col("n_tokens"),
        F.floor(F.col("__cum") / budget).as("bin"),
        (F.col("__cum") % budget).as("bin_pos"))
  }

  /** Padding-efficiency report for sequence-length BUCKETING — the
    * analysis a pretraining team runs before fixing its max_seq_len /
    * bucket boundaries: every document lands in the SMALLEST boundary
    * that fits it (documents past the last boundary are truncated to it
    * — the standard max-length rule), and per bucket the report prices
    * what batching at that length costs: real tokens vs padded slots
    * and the efficiency ratio. Sweeping candidate boundary sets with
    * this is how seq-len configs are actually chosen.
    *
    * Scale shape: one token-count scan + one map-side-combinable
    * aggregation over ≤ |boundaries| groups. Output: (seq_len, n_docs,
    * real_tokens, padded_tokens, efficiency) — efficiency rounded 6dp,
    * real_tokens counts the TRUNCATED contribution for overflow docs
    * (what actually trains). */
  def paddingEfficiency(docs: DataFrame, boundaries: Seq[Long],
                        textCol: String = "text"): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted &&
      boundaries.distinct == boundaries && boundaries.head > 0,
      s"boundaries must be positive, strictly increasing: $boundaries")
    val nTok: Column = TextFunctions.tokenCount(F.col(textCol))
    // smallest boundary >= n (else the last): a fold from the largest
    // down keeps it a branch-free CASE chain
    val last = boundaries.last
    val bucket = boundaries.init.foldRight(F.lit(last): Column) { (b, els) =>
      F.when(F.col("__n") <= b, F.lit(b)).otherwise(els)
    }
    graft.Spread(docs)
      .select(nTok.as("__n"))
      .select(F.col("__n"), bucket.as("seq_len"),
        F.least(F.col("__n"), F.lit(last)).as("__eff_n"))
      .groupBy(F.col("seq_len"))
      .agg(
        F.count(F.lit(1)).as("n_docs"),
        F.sum(F.col("__eff_n")).as("real_tokens"))
      .select(
        F.col("seq_len"), F.col("n_docs"), F.col("real_tokens"),
        (F.col("n_docs") * F.col("seq_len")).as("padded_tokens"),
        F.round(F.col("real_tokens").cast("double") /
          (F.col("n_docs") * F.col("seq_len")).cast("double"), 6).as("efficiency"))
  }
}
