package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{functions => F}

/** TF-IDF keyword scoring over a document corpus — the classic
  * "what is this document about" signal for training-data curation
  * (topic balancing, keyword-based filtering, near-topic dedup).
  *
  * Pure relational shape: tokenize → explode → two map-side-combinable
  * aggregations (term frequency per (doc, token); document frequency per
  * token) → broadcast-friendly join → windowed top-k. No UDFs; the whole
  * score is `tf * ln(N / df)` in IEEE doubles with a fixed operand order,
  * so the DuckDB oracle reproduces it bit-for-bit (rounded to 6 decimals
  * on both sides, the same convention as the cosine queries).
  */
object TfIdf {

  /** (doc_id, tok, tf, tfidf_r): every (document, token) pair scored.
    * The idf denominator N is a parquet metadata count of `docs` (count-star
    * reads row-group footers, no column data) — empty-token documents
    * included, same convention as the SQL oracle.
    *
    * Cache contract: the persisted tf table is scope-tracked
    * ([[graft.CacheScope]]); callers that consume `score` directly should
    * wrap the terminal action in `CacheScope.scoped` (as [[topKeywords]]
    * does) or call `CacheScope.releaseAll()` afterwards. */
  def score(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    // Term frequency folded per ROW (TokenTfExpr): the explode output is
    // already (doc, tok, tf) — no docs × tokens fan-out through an
    // aggregation and no (doc, tok) shuffle at all. The EXPLODED
    // (id, tok, tf) table is cached because BOTH consumers (df and the
    // score probe) read it: primitive/dictionary columns scan far faster
    // than an array<struct> cache column (which deserializes whole arrays
    // per read), and each consumer skips its own explode pass. Stage
    // metrics showed the two-consumer explode-from-array-cache shape
    // costing ~7s CPU at sf0.1; this one reads columnar rows twice.
    //
    // explode_outer, not explode: InferFiltersFromGenerate only infers its
    // `size(e) > 0` filter for INNER generates — with the inner form the
    // inferred filter duplicates the TokenTfExpr fold below the
    // repartition (the round-6 double-fold trap). The outer generate keeps
    // empty docs as null-token rows; the post-cache isNotNull filter
    // reads a stored column.
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val tfArr = ColumnBridge.column(
      graft.functions.expressions.TokenTfExpr(
        ColumnBridge.expression(F.col(textCol))))
    val nDocs = docs.count() // parquet metadata count-star: no column scan
    // materializeLazy, not materialize: the df aggregation below runs as a
    // broadcast-subquery JOB that completes before the main job's probe
    // side starts, so it alone populates the cache — strictly sequential
    // consumers, and the eager count would be a wasted full pass over the
    // cached table. (A/B on the shared bench box is within its ±30%
    // drift; this form does strictly less work.)
    val tfTable = graft.CacheScope.materializeLazy(
      docs
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.col(idCol), F.explode_outer(tfArr).as("tt"))
        .select(F.col(idCol), F.col("tt.tok").as("tok"), F.col("tt.tf").as("tf")))
    val tf = tfTable.filter(F.col("tok").isNotNull)
    // df: tf is already one row per (doc, token), so a count per token IS
    // the document frequency — no distinct pass.
    val df = tf.groupBy(F.col("tok")).agg(F.count(F.lit(1)).as("df"))
    tf.join(df, "tok")
      .select(
        F.col(idCol), F.col("tok"), F.col("tf"),
        F.round(
          F.col("tf").cast("double") *
            F.log(F.lit(nDocs.toDouble) / F.col("df").cast("double")),
          6).as("tfidf_r"))
  }

  /** Top-`k` keywords per document by TF-IDF, deterministically tie-broken
    * on the token string. WindowGroupLimit keeps only k rows per doc on
    * both the map and reduce side of the rank shuffle. The result is
    * pinned and [[score]]'s tf cache released before returning
    * ([[graft.CacheScope.scoped]]). */
  def topKeywords(docs: DataFrame, k: Int = 3,
                  idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    graft.CacheScope.scoped {
      val w = Window.partitionBy(F.col(idCol))
        .orderBy(F.col("tfidf_r").desc, F.col("tok").asc)
      score(docs, idCol, textCol)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col(idCol), F.col("rnk").cast("long").as("rnk"),
          F.col("tok"), F.col("tf"), F.col("tfidf_r"))
    }
}
