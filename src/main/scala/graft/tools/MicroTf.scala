package graft.tools

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Dev probe: time the tokenize→explode pipeline FRAGMENTS of q_tfidf in
  * isolation on one warmed JVM, to attribute the per-row cost (r12 hunt:
  * ~48 µs per exploded row in full-query stages). Each fragment runs
  * `reps` times; prints min wall per fragment. */
object MicroTf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, dir, "documents")

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Long.MaxValue
      var out = 0L
      var i = 0
      while (i < reps) {
        val t0 = System.nanoTime()
        out = mk.count()
        val el = System.nanoTime() - t0
        if (el < best) best = el
        i += 1
      }
      println(f"MICRO $label%-28s best=${best / 1e6}%9.1f ms rows=$out")
    }

    val tfArr = ColumnBridge.column(
      graft.functions.expressions.TokenTfExpr(
        ColumnBridge.expression(F.col("text"))))

    time("range_noop")(spark.range(116000).toDF("id"))
    time("range_agg31")(
      spark.range(116000).select((F.col("id") % 31).as("k"))
        .groupBy("k").agg(F.count(F.lit(1)).as("n")))
    time("range_agg31_p1")(
      spark.range(116000).coalesce(1).select((F.col("id") % 31).as("k"))
        .groupBy("k").agg(F.count(F.lit(1)).as("n")))
    time("scan_only")(docs.select("doc_id"))
    time("scan_text")(docs.select("text"))
    time("fold_size")(docs.select(F.size(tfArr).as("n")).filter(F.col("n") >= 0))
    time("fold_explode")(
      docs.select(F.col("doc_id"), F.explode_outer(tfArr).as("tt"))
        .filter(F.col("tt").isNotNull))
    time("spread_fold_explode")(
      graft.Spread(docs).select(F.col("doc_id"), F.explode_outer(tfArr).as("tt"))
        .filter(F.col("tt").isNotNull))
    time("explode_agg_tok")(
      graft.Spread(docs).select(F.explode_outer(tfArr).as("tt"))
        .filter(F.col("tt").isNotNull)
        .groupBy(F.col("tt.tok")).agg(F.count(F.lit(1)).as("df")))
    time("native_split_agg")(
      graft.Spread(docs)
        .select(F.explode(F.split(F.lower(F.col("text")), "[ \\t\\n\\f\\r]+")).as("tok"))
        .filter(F.length(F.col("tok")) > 0)
        .groupBy(F.col("tok")).agg(F.count(F.lit(1)).as("df")))
    time("fold_reexchange_agg")(
      graft.Spread(docs).select(F.explode_outer(tfArr).as("tt"))
        .filter(F.col("tt").isNotNull)
        .repartition(32, F.col("tt.tok"))
        .groupBy(F.col("tt.tok")).agg(F.count(F.lit(1)).as("df")))
    time("fold_agg_docid")(
      graft.Spread(docs).select(F.col("doc_id"), F.explode_outer(tfArr).as("tt"))
        .filter(F.col("tt").isNotNull)
        .groupBy(F.col("doc_id")).agg(F.count(F.lit(1)).as("n")))
    time("full_score")(
      graft.functions.TfIdf.score(docs, knownDocCount = Some(5000L)))
    time("full_topk")(
      graft.functions.TfIdf.topKeywords(docs, k = 3, knownDocCount = Some(5000L)))
    // A/B: does AQE's query-stage materialization round cost wall time vs
    // a statically-planned broadcast of the (vocab-sized) df table?
    time("topk_forced_bhj") {
      val tf = graft.Spread.byKey(docs, "doc_id")
        .select(F.col("doc_id"), F.explode_outer(tfArr).as("tt"))
        .select(F.col("doc_id"), F.col("tt.tok").as("tok"), F.col("tt.tf").as("tf"))
        .filter(F.col("tok").isNotNull)
      val dfTab = tf.groupBy(F.col("tok")).agg(F.count(F.lit(1)).as("df"))
        .withColumn("n_docs", F.lit(5000L))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(F.col("doc_id"))
        .orderBy(F.col("tfidf_r").desc, F.col("tok").asc)
      tf.join(F.broadcast(dfTab), Seq("tok"))
        .select(F.col("doc_id"), F.col("tok"), F.col("tf"),
          F.round(F.col("tf").cast("double") *
            F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")), 6)
            .as("tfidf_r"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    }
    // A/B: one fused pass — df via a count window over tok on the SAME
    // exploded stream (corpus-sized exchange on tok; scale-hostile, but
    // quantifies what the second fold pass costs at bench scale).
    time("topk_window_df") {
      val tf = graft.Spread.byKey(docs, "doc_id")
        .select(F.col("doc_id"), F.explode_outer(tfArr).as("tt"))
        .select(F.col("doc_id"), F.col("tt.tok").as("tok"), F.col("tt.tf").as("tf"))
        .filter(F.col("tok").isNotNull)
      val wdf = org.apache.spark.sql.expressions.Window.partitionBy(F.col("tok"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(F.col("doc_id"))
        .orderBy(F.col("tfidf_r").desc, F.col("tok").asc)
      tf.withColumn("df", F.count(F.lit(1)).over(wdf))
        .select(F.col("doc_id"), F.col("tok"), F.col("tf"),
          F.round(F.col("tf").cast("double") *
            F.log(F.lit(5000L).cast("double") / F.col("df").cast("double")), 6)
            .as("tfidf_r"))
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
    }
    spark.stop()
  }
}
