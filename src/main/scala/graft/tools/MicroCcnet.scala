package graft.tools

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Dev probe: attribute q_ccnet_buckets' wall (r14: 1.25 s vs DuckDB
  * ~0.18 s at sf0.1) across its fragments — unigram-LM score, langId
  * scan, the id join, the per-language rank window — and A/B the fused
  * variant that carries pred_lang through the score aggregation instead
  * of joining it back by id. */
object MicroCcnet {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, dir, "documents")
    val nDocs = docs.count()

    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Long.MaxValue
      var out = 0L
      var i = 0
      while (i < reps) {
        val t0 = System.nanoTime()
        out = mk.count()
        val el = System.nanoTime() - t0
        if (el < best) best = el
        // Drop any cache the fragment created: each rep builds a fresh
        // DataFrame, so a leaked persist would ACCUMULATE corpus-sized
        // blocks across reps and skew every later fragment's floor
        // measurement under storage pressure.
        spark.catalog.clearCache()
        i += 1
      }
      println(f"MICRO $label%-28s best=${best / 1e6}%9.1f ms rows=$out")
    }

    val TF = graft.functions.TextFunctions
    time("score_only")(graft.functions.UnigramLm.score(docs))
    time("langid_scan")(
      docs.select(F.col("doc_id"), TF.langId(F.col("text")).as("pred_lang")))
    time("langid_spread")(
      graft.Spread(docs).select(F.col("doc_id"), TF.langId(F.col("text")).as("pred_lang")))
    time("score_join_lang") {
      val lm = graft.functions.UnigramLm.score(docs)
        .select(F.col("doc_id"), F.col("lm_score"))
      val lang = graft.Spread(docs).select(
        F.col("doc_id"), TF.langId(F.col("text")).as("pred_lang"))
      lm.join(lang, Seq("doc_id"))
    }
    time("full_windowed")(
      graft.functions.UnigramLm.perplexityBuckets(docs, knownCount = nDocs))
    time("full_dist")(
      graft.functions.UnigramLm.perplexityBuckets(docs))
    // Fused A/B: langId computed in the SAME scan as the tokenizer and
    // carried through the tok shuffle + per-doc aggregation (2 bytes/row),
    // dropping the separate lang scan and the join-by-id exchange.
    time("fused_score_lang") {
      val tfArr = ColumnBridge.column(
        graft.functions.expressions.TokenTfExpr(
          ColumnBridge.expression(F.col("text"))))
      val byTok = graft.Spread(docs)
        .select(F.col("doc_id"), TF.langId(F.col("text")).as("pred_lang"),
          F.explode_outer(tfArr).as("tt"))
        .select(F.col("doc_id"), F.col("pred_lang"),
          F.col("tt.tok").as("tok"), F.col("tt.tf").as("tf"))
        .filter(F.col("tok").isNotNull)
        .repartition(F.col("tok"))
      val tokCounts = byTok.groupBy(F.col("tok")).agg(F.sum(F.col("tf")).as("cnt"))
      val total = tokCounts.agg(F.sum(F.col("cnt")).as("total"))
      val scored = byTok.join(tokCounts.hint("shuffle_hash"), Seq("tok"))
        .crossJoin(F.broadcast(total))
        .select(F.col("doc_id"), F.col("pred_lang"), F.col("tf"),
          (F.col("tf").cast("double") *
            F.log(F.col("cnt").cast("double") / F.col("total").cast("double")))
            .cast("decimal(38,18)").as("term"))
        .groupBy(F.col("doc_id"), F.col("pred_lang"))
        .agg(F.sum(F.col("tf")).as("n_tokens"), F.sum(F.col("term")).as("ll"))
        .select(F.col("doc_id"), F.col("pred_lang"),
          F.round(F.col("ll").cast("double") / F.col("n_tokens").cast("double"), 6)
            .as("lm_score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(F.col("pred_lang"))
        .orderBy(F.col("lm_score").desc, F.col("doc_id"))
      val wAll = org.apache.spark.sql.expressions.Window
        .partitionBy(F.col("pred_lang"))
      scored.select(F.col("doc_id"), F.col("pred_lang"), F.col("lm_score"),
        (F.row_number().over(w) - 1).cast("long").as("lrank"),
        F.count(F.lit(1)).over(wAll).as("gn"))
    }
    // Broadcast-vocab A/B: the exploded stream is NEVER shuffled — the
    // vocab table (small after map-combine) broadcasts onto the
    // doc-partitioned stream, and the per-doc aggregation partial-combines
    // to ~1 row per doc per partition before its (tiny) exchange. Cost:
    // the tokenizer runs twice (vocab pass + probe pass).
    def scoreBcast(cache: Boolean): org.apache.spark.sql.DataFrame = {
      val tfArr = ColumnBridge.column(
        graft.functions.expressions.TokenTfExpr(
          ColumnBridge.expression(F.col("text"))))
      val byTok0 = graft.Spread(docs)
        .select(F.col("doc_id"), F.explode_outer(tfArr).as("tt"))
        .select(F.col("doc_id"), F.col("tt.tok").as("tok"), F.col("tt.tf").as("tf"))
        .filter(F.col("tok").isNotNull)
      val byTok = if (cache) byTok0.persist() else byTok0
      val tokCounts = byTok.groupBy(F.col("tok")).agg(F.sum(F.col("tf")).as("cnt"))
      val total = tokCounts.agg(F.sum(F.col("cnt")).as("total"))
      val out = byTok.join(F.broadcast(tokCounts), Seq("tok"))
        .crossJoin(F.broadcast(total))
        .select(F.col("doc_id"), F.col("tf"),
          (F.col("tf").cast("double") *
            F.log(F.col("cnt").cast("double") / F.col("total").cast("double")))
            .cast("decimal(38,18)").as("term"))
        .groupBy(F.col("doc_id"))
        .agg(F.sum(F.col("tf")).as("n_tokens"), F.sum(F.col("term")).as("ll"))
        .select(F.col("doc_id"), F.col("n_tokens"),
          F.round(F.col("ll").cast("double") / F.col("n_tokens").cast("double"), 6)
            .as("lm_score"))
      out
    }
    time("score_bcast_2scan")(scoreBcast(cache = false))
    time("score_bcast_cached") {
      val d = scoreBcast(cache = true)
      d
    }
    // Floor pieces for a native map-lookup pass 2 (vocab collected to a
    // driver map, per-doc sum inside one expression eval — no explode, no
    // join, no shuffle in pass 2):
    val tfArr2 = ColumnBridge.column(
      graft.functions.expressions.TokenTfExpr(
        ColumnBridge.expression(F.col("text"))))
    time("p1_vocab_agg") {
      graft.Spread(docs)
        .select(F.explode_outer(tfArr2).as("tt"))
        .select(F.col("tt.tok").as("tok"), F.col("tt.tf").as("tf"))
        .filter(F.col("tok").isNotNull)
        .groupBy(F.col("tok")).agg(F.sum(F.col("tf")).as("cnt"))
    }
    time("p2_scan_only")(
      graft.Spread(docs).select(F.col("doc_id"), F.size(tfArr2).as("n"))
        .filter(F.col("n") >= 0))
    spark.stop()
  }
}
