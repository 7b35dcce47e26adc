package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{functions => F}
import org.apache.spark.unsafe.types.UTF8String

/** TF-IDF keyword scoring over a document corpus — the classic
  * "what is this document about" signal for training-data curation
  * (topic balancing, keyword-based filtering, near-topic dedup).
  *
  * Shape (r12, rebuilt from a JFR profile of the previous window-based
  * plan — 32% of executor CPU was TimSort under the two analytic
  * windows, while the tokenize fold itself was ~1%):
  *
  *  1. `tf`: tokenize → per-row tf fold (TokenTfExpr) → explode. One
  *     corpus pass, no aggregation machinery, no (doc, tok) shuffle.
  *  2. `df`: ONE hash aggregation of the tf rows on `tok` — map-side
  *     partial combine collapses each partition to its distinct tokens,
  *     so the exchange carries vocabulary-sized partials, not the
  *     corpus. The corpus size N rides in as a lazy one-row broadcast
  *     folded onto the (small) df table, never onto the big side.
  *  3. score: `tf ⋈ df` on `tok`, UNFORCED join strategy: AQE sees the
  *     aggregated df size at runtime and picks a broadcast-hash join
  *     while the vocabulary fits (every bench/test scale — no shuffle
  *     and NO SORT of the big side), degrading to a shuffled join only
  *     at web-corpus vocabulary where nothing can broadcast — exactly
  *     the regime where the previous window plan paid the same tok
  *     exchange PLUS a TimSort of the corpus under the window.
  *
  * The former plan computed df as `count(*) over (partition by tok)` to
  * fold it into the tok exchange "for free"; the profile showed the
  * window's mandatory sort costs ~10x the aggregation it saved. Sorts
  * are not free at any scale; hash aggregation is the right primitive
  * for an unordered count.
  *
  * No UDFs; the score is `tf * ln(N / df)` in IEEE doubles with a fixed
  * operand order, so the DuckDB oracle reproduces it bit-for-bit
  * (rounded to 6 decimals on both sides, the cosine-query convention).
  */
object TfIdf {

  /** (doc_id, tok, tf, tfidf_r): every (document, token) pair scored.
    * The idf denominator N counts ALL of `docs` — empty-token documents
    * included, same convention as the SQL oracle.
    *
    * `maxDfFraction` < 1 drops tokens whose document frequency exceeds
    * that fraction of the corpus — the stopword cap for web-scale
    * vocabularies. It filters the DF TABLE before the join (shrinking
    * the broadcast side), which drops the same (doc, tok) rows as the
    * old post-window filter. The default 1.0 binds nothing (df <= N
    * always), keeping the oracle contract exact. */
  def score(docs: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", maxDfFraction: Double = 1.0): DataFrame = {
    require(maxDfFraction > 0.0 && maxDfFraction <= 1.0,
      s"maxDfFraction must be in (0, 1], got $maxDfFraction")
    // Spread the tokenize fold ONLY when the scan under-parallelizes
    // (fewer splits than cores — the small-file regime). At 100 TB the
    // scan already has thousands of splits and this is a no-op. The
    // spread exchange has TWO consumers below (df aggregation, score
    // probe); Spark reuses it (ReusedExchange), so the scan still runs
    // once and only the cheap tokenize fold is re-evaluated (~1% of the
    // query's CPU, measured).
    val spread = graft.Spread(docs)
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
    // parquet answers it from row-group counts. Folded onto the SMALL
    // (vocabulary-sized) df table, never the corpus-sized tf side.
    val nDf = docs.groupBy().agg(F.count(F.lit(1)).as("n_docs"))
    val dfTab = tf.groupBy(F.col("tok"))
      .agg(F.count(F.lit(1)).as("df"))
      .crossJoin(F.broadcast(nDf))
    val capped =
      if (maxDfFraction >= 1.0) dfTab
      else dfTab.filter(
        F.col("df").cast("double") <=
          F.col("n_docs").cast("double") * maxDfFraction)
    tf.join(capped, Seq("tok")) // strategy left to AQE: BHJ while df fits
      .select(
        F.col(idCol), F.col("tok"), F.col("tf"),
        F.round(
          F.col("tf").cast("double") *
            F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
          6).as("tfidf_r"))
  }

  /** Top-`k` keywords per document by TF-IDF, deterministically tie-broken
    * on the token string (binary UTF-8 order, matching the SQL oracle's
    * ORDER BY on both engines).
    *
    * Hash top-k, not a rank window: a typed [[TopTokensAgg]] keeps only k
    * candidates per document per partition (ObjectHashAggregate — the
    * same map-side-partial-top-k shape as [[graft.ann.TopKAgg]], the ANN
    * 100 TB brute path), so at most k·docs rows reach the exchange and
    * NOTHING ever sorts the corpus-sized score table. The former
    * sort + WindowGroupLimit plan shuffled the same k·docs rows but paid
    * a full TimSort of every partition first — the single largest CPU
    * line in the JFR profile. */
  def topKeywords(docs: DataFrame, k: Int = 3,
                  idCol: String = "doc_id", textCol: String = "text",
                  maxDfFraction: Double = 1.0): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val scored = score(docs, idCol, textCol, maxDfFraction)
      .select(F.col(idCol).cast("long"), F.col("tok"),
        F.col("tf").cast("long"), F.col("tfidf_r").cast("double"))
      .toDF("_1", "_2", "_3", "_4")
      .as[(Long, String, Long, Double)]
    val agg = new TopTokensAgg(k).toColumn.name("topk")
    scored.groupByKey(_._1).agg(agg)
      .toDF(idCol, "topk")
      .select(F.col(idCol), F.posexplode(F.col("topk")).as(Seq("pos", "t")))
      .select(F.col(idCol), (F.col("pos") + 1).cast("long").as("rnk"),
        F.col("t._1").as("tok"), F.col("t._2").as("tf"),
        F.col("t._3").as("tfidf_r"))
  }
}

/** Bounded top-k of (tok, tf, tfidf_r) rows per group, ordered
  * (tfidf_r DESC, tok ASC in binary UTF-8) — the window-free top-k for
  * [[TfIdf.topKeywords]]. The buffer never exceeds k elements, so the
  * map-side partial aggregation cuts each partition's candidates to k
  * BEFORE the shuffle. */
class TopTokensAgg(k: Int)
    extends Aggregator[(Long, String, Long, Double),
      Seq[(String, Long, Double)], Seq[(String, Long, Double)]] {

  // tfidf desc, then tok in UTF-8 binary order — String.compareTo is
  // UTF-16 code-unit order, which diverges on supplementary characters;
  // the oracle gate is hash-exact, so match the engine-side collation.
  private val ord: Ordering[(String, Long, Double)] =
    new Ordering[(String, Long, Double)] {
      def compare(x: (String, Long, Double), y: (String, Long, Double)): Int = {
        val c = java.lang.Double.compare(y._3, x._3)
        if (c != 0) c
        else UTF8String.fromString(x._1).compareTo(UTF8String.fromString(y._1))
      }
    }

  override def zero: Seq[(String, Long, Double)] = Seq.empty
  override def reduce(buf: Seq[(String, Long, Double)],
                      in: (Long, String, Long, Double)): Seq[(String, Long, Double)] =
    trim(buf :+ ((in._2, in._3, in._4)))
  override def merge(a: Seq[(String, Long, Double)],
                     b: Seq[(String, Long, Double)]): Seq[(String, Long, Double)] =
    trim(a ++ b)
  override def finish(r: Seq[(String, Long, Double)]): Seq[(String, Long, Double)] =
    r.sorted(ord)
  private def trim(s: Seq[(String, Long, Double)]): Seq[(String, Long, Double)] =
    s.sorted(ord).take(k)

  override def bufferEncoder: Encoder[Seq[(String, Long, Double)]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long, Double)]] = ExpressionEncoder()
}
