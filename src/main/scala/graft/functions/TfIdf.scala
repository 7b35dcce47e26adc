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
    * The idf denominator N is the cached tf table's own row count (one row
    * per input document, empty-token docs included) — ONE job pays for
    * both the cache materialization and the corpus size; callers must not
    * run their own `docs.count()`.
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
    // aggregation and no (doc, tok) shuffle at all. The UNEXPLODED array
    // table is cached because BOTH consumers (tf and df) read it — without
    // the cache the corpus scan + fold runs once per consumer (visible as
    // two parquet scans in the un-cached plan).
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val tfArr = ColumnBridge.column(
      graft.functions.expressions.TokenTfExpr(
        ColumnBridge.expression(F.col(textCol))))
    val (tfTable, nDocs) = graft.CacheScope.materializeCounted(
      docs
        .repartition(spark.sparkContext.defaultParallelism)
        .select(F.col(idCol), tfArr.as("tts")))
    val tf = tfTable
      .select(F.col(idCol), F.explode(F.col("tts")).as("tt"))
      .select(F.col(idCol), F.col("tt.tok").as("tok"), F.col("tt.tf").as("tf"))
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
