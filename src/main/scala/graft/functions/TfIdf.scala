package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** TF-IDF keyword scoring over a document corpus — the classic
  * "what is this document about" signal for training-data curation
  * (topic balancing, keyword-based filtering, near-topic dedup).
  *
  * Pure relational shape, ONE pass over the corpus: tokenize → per-row tf
  * fold (TokenTfExpr) → explode → a single exchange on `tok` where the
  * document frequency is computed INLINE as `count(*) over (partition by
  * tok)` → score → the rank exchange on the doc id. No cache, no
  * tok-keyed join, no separate aggregation jobs; the corpus size N rides
  * in as a one-row broadcast computed concurrently with the scan, so the
  * whole operator is LAZY (no driver-side count action). Three shuffle
  * stages end to end. No UDFs; the score is `tf * ln(N / df)` in IEEE
  * doubles with a fixed operand order, so the DuckDB oracle reproduces it
  * bit-for-bit (rounded to 6 decimals on both sides, the same convention
  * as the cosine queries).
  *
  * Scale note (100 TB): the window computes df with the full tf table
  * shuffled once on `tok`. A hot token ("the") lands its rows in one
  * window partition — WindowExec buffers the frame in a spillable row
  * array, so the task spills rather than OOMs, but a heavy-tailed
  * stopword can still serialize into one task. The classic alternative
  * (groupBy(tok) df + join back) only avoids that shuffle while the df
  * side stays broadcastable; at web-corpus vocabulary (1e8+ tokens) the
  * join degenerates to a sort-merge join on `tok` — the SAME shuffle with
  * an extra aggregation job in front. The real fix at that scale is the
  * `maxDfFraction` stopword cap on [[score]] — with df inline it is a
  * free post-window filter; the window form is strictly fewer stages
  * everywhere else.
  */
object TfIdf {

  /** (doc_id, tok, tf, tfidf_r): every (document, token) pair scored.
    * The idf denominator N counts ALL of `docs` — empty-token documents
    * included, same convention as the SQL oracle.
    *
    * `maxDfFraction` < 1 drops tokens whose document frequency exceeds
    * that fraction of the corpus — the stopword cap from the scale note
    * above. Because df is already computed inline by the window, the cap
    * is a FREE row filter after the one exchange (no extra pass or join);
    * it also bounds the rank window's input. The default 1.0 binds
    * nothing (df <= N always), keeping the oracle contract exact. */
  def score(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", maxDfFraction: Double = 1.0): DataFrame = {
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0, 1], got $maxDfFraction")
    val spark = docs.sparkSession
    val p = spark.sparkContext.defaultParallelism
    // Spread the tokenize fold ONLY when the scan under-parallelizes
    // (fewer splits than cores — the small-file regime). At 100 TB the
    // scan already has thousands of splits and this is a no-op, so no
    // gratuitous full-corpus shuffle at scale.
    val spread = graft.Spread(docs)
    // Term frequency folded per ROW (TokenTfExpr): the explode output is
    // already (doc, tok, tf) — no docs × tokens fan-out through an
    // aggregation and no (doc, tok) shuffle at all.
    //
    // explode_outer, not explode: InferFiltersFromGenerate only infers its
    // `size(e) > 0` filter for INNER generates — with the inner form the
    // inferred filter would evaluate the TokenTfExpr fold a second time at
    // the scan (the round-6 double-fold trap). The outer generate keeps
    // empty docs as null-token rows; the isNotNull filter below reads the
    // generated column, not the fold.
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val tfArr = ColumnBridge.column(
      graft.functions.expressions.TokenTfExpr(
        ColumnBridge.expression(F.col(textCol))))
    val tf = spread
      .select(F.col(idCol), F.explode_outer(tfArr).as("tt"))
      .select(F.col(idCol), F.col("tt.tok").as("tok"), F.col("tt.tf").as("tf"))
      .filter(F.col("tok").isNotNull)
    // N as a LAZY one-row broadcast (BroadcastNestedLoopJoin over a
    // single-row aggregate — the scalar-subquery shape, constant cost):
    // the broadcast job overlaps the main scan instead of serializing a
    // driver-side count() action in front of it. Reads no columns, so
    // parquet answers it from row-group counts.
    val nDf = docs.groupBy().agg(F.count(F.lit(1)).as("n_docs"))
    // df: tf is one row per (doc, token), so a count over the token
    // partition IS the document frequency — computed inline by the one
    // exchange this query owns, replacing the round-8 cache + aggregate +
    // broadcast-join pyramid (measured stage-latency-bound, not CPU-bound).
    // The repartition below is NOT an extra shuffle: it pins the partition
    // count of the exchange the window already requires (hashpartitioning
    // on tok satisfies the window's distribution), stopping AQE from
    // coalescing the whole sort into one task at small SF.
    val dfCol = F.count(F.lit(1)).over(Window.partitionBy(F.col("tok")))
    val scored = tf.repartition(p, F.col("tok"))
      .withColumn("df", dfCol)
      .crossJoin(F.broadcast(nDf))
    val capped =
      if (maxDfFraction >= 1.0) scored
      else scored.filter(
        F.col("df").cast("double") <=
          F.col("n_docs").cast("double") * maxDfFraction)
    capped.select(
      F.col(idCol), F.col("tok"), F.col("tf"),
      F.round(
        F.col("tf").cast("double") *
          F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
        6).as("tfidf_r"))
  }

  /** Top-`k` keywords per document by TF-IDF, deterministically tie-broken
    * on the token string. WindowGroupLimit keeps only k rows per doc on
    * both the map and reduce side of the rank shuffle. */
  def topKeywords(docs: DataFrame, k: Int = 3,
                  idCol: String = "doc_id", textCol: String = "text",
                  maxDfFraction: Double = 1.0): DataFrame = {
    val w = Window.partitionBy(F.col(idCol))
      .orderBy(F.col("tfidf_r").desc, F.col("tok").asc)
    // No partition pin on THIS exchange: an explicit repartition between
    // the rank window and its child blocks the map-side WindowGroupLimit
    // (measured round 9), and the k-per-doc map-side cut shrinks the
    // shuffle ~70x — worth far more than parallelizing the tiny
    // post-cut sort.
    score(docs, idCol, textCol, maxDfFraction)
      .withColumn("rnk", F.row_number().over(w))
      .filter(F.col("rnk") <= k)
      .select(F.col(idCol), F.col("rnk").cast("long").as("rnk"),
        F.col("tok"), F.col("tf"), F.col("tfidf_r"))
  }
}
