package graft.operators

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Training-EXAMPLE construction — the tier between a cleaned corpus and
  * a training run: deterministic re-expressions of the two published
  * seq2seq/infilling objectives, built so the emitted examples are
  * oracle-replicable strings (md5-derived choices, the engine's standard
  * determinism contract, instead of an RNG stream no other engine could
  * replay).
  *
  * Shared shape: one tokenize scan (the native ShingleExpr), a per-doc
  * count window and all per-token decisions as plain codegen'd
  * expressions (md5/conv/CASE — no interpreted lambdas in the token
  * pass), then ONE groupBy(id) string assembly whose exchange reuses the
  * count window's hash partitioning — one shuffle total at any corpus
  * size. Strings assemble order-free via sort_array(collect_list(
  * struct(pos, elem))) + getField (codegen'd; collect_list drops the
  * CASE's nulls, array_sort orders by pos).
  */
object ExamplePrep {

  private def toks(textCol: String): Column = ColumnBridge.column(
    graft.functions.expressions.ShingleExpr(
      ColumnBridge.expression(F.col(textCol)), 1))

  /** md5-derived uniform in [0, m): hex chars [at, at+8) of md5(key). */
  private def h32(key: Column, at: Int, m: Column): Column =
    F.conv(F.substring(F.md5(key), at, 8), 16, 10).cast("long") % m

  /** Ordered string assembly: join the non-null `elem`s by " " in `pos`
    * order. The struct is nulled WHOLESALE when `elem` is null — a
    * struct with a null field is itself non-null and collect_list would
    * keep it; a null struct it drops. array_sort orders by the leading
    * pos field. */
  private def joined(elem: Column, pos: Column): Column =
    F.array_join(
      F.array_sort(F.collect_list(
        F.when(elem.isNotNull, F.struct(pos.as("p"), elem.as("e")))))
        .getField("e"), " ")

  /** T5 span corruption (Raffel et al. JMLR 2020 §3.1.4): drop spans of
    * `span` tokens, replace each with a sentinel `<extra_id_k>` in the
    * input, and emit the dropped spans behind their sentinels (plus the
    * closing sentinel) as the target. Deterministic adaptation of the
    * paper's iid noise: positions partition into `block`-token blocks and
    * every COMPLETE block drops exactly one span at an md5-derived
    * offset — corruption rate span/block (3/20 = the paper's 15%), mean
    * span length exactly `span`, and the k-th complete block is the k-th
    * span, so sentinel ids are consecutive by construction. */
  def spanCorrupt(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", block: Int = 20,
                  span: Int = 3): DataFrame = {
    require(span >= 1 && block > span, s"need block > span >= 1, got ($block, $span)")
    val id = F.col(idCol)
    val t = graft.Spread(docs)
      .select(id, toks(textCol).as("a"))
      .select(id, F.posexplode(F.col("a")).as(Seq("pos", "tok")))
      .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(id)))
    val blk = (F.col("pos") / block).cast("long")
    val off = h32(F.concat(id.cast("string"), F.lit("|"), blk.cast("string")), 1,
      F.lit((block - span + 1).toLong))
    val start = blk * block + off
    val complete = (blk + 1L) * block <= F.col("n")
    val noised = complete && F.col("pos") >= start && F.col("pos") < start + span
    val sentinel = F.concat(F.lit("<extra_id_"), blk.cast("string"), F.lit(">"))
    val inputElem = F.when(!noised, F.col("tok"))
      .when(F.col("pos") === start, sentinel)           // span start → one sentinel
    val targetElem = F.when(noised && F.col("pos") === start,
        F.concat(sentinel, F.lit(" "), F.col("tok")))
      .when(noised, F.col("tok"))
    t.select(id, F.col("pos"), F.col("n"), inputElem.as("ie"), targetElem.as("te"))
      .groupBy(id)
      .agg(
        F.max("n").as("n_tokens"),
        (F.max("n") / block).cast("long").as("n_spans"),
        joined(F.col("ie"), F.col("pos")).as("input_text"),
        joined(F.col("te"), F.col("pos")).as("tgt"))
      .select(id, F.col("n_tokens"), F.col("n_spans"),
        F.col("input_text"),
        F.when(F.col("n_spans") === 0L, F.lit("<extra_id_0>"))
          .otherwise(F.concat(F.col("tgt"), F.lit(" <extra_id_"),
            F.col("n_spans").cast("string"), F.lit(">"))).as("target_text"))
  }

  /** Fill-in-the-middle transformation (Bavarian et al. 2022): with
    * md5-derived probability `1/applyMod`... apply-half convention —
    * docs whose md5 parity selects them are re-ordered PSM:
    * `<PRE> prefix <SUF> suffix <MID> middle`, split points p1 <= p2
    * md5-uniform over token boundaries (the paper's character-level cut,
    * at token granularity so the emitted strings stay canonical);
    * unselected docs pass through as the plain token stream. Training on
    * the mix teaches infilling without hurting left-to-right modeling —
    * the published 50/50 default. */
  def fimTransform(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val id = F.col(idCol)
    val t = graft.Spread(docs)
      .select(id, toks(textCol).as("a"))
      .select(id, F.posexplode(F.col("a")).as(Seq("pos", "tok")))
      .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy(id)))
    val key = F.concat(F.lit("fim|"), id.cast("string"))
    val applied = h32(key, 1, F.lit(2L)) === 0L
    val p1 = h32(key, 9, F.col("n") + 1L)
    val p2 = p1 + h32(key, 17, F.col("n") - p1 + 1L)
    val seg = F.when(F.col("pos") < p1, F.lit("pre"))
      .when(F.col("pos") < p2, F.lit("mid")).otherwise(F.lit("suf"))
    val g = t.select(id, F.col("pos"), F.col("n"), applied.as("ap"), seg.as("seg"),
        F.col("tok"))
      .groupBy(id)
      .agg(
        F.max("n").as("n_tokens"), F.max("ap").as("fim_applied"),
        joined(F.when(F.col("seg") === "pre", F.col("tok")), F.col("pos")).as("pre"),
        joined(F.when(F.col("seg") === "mid", F.col("tok")), F.col("pos")).as("mid"),
        joined(F.when(F.col("seg") === "suf", F.col("tok")), F.col("pos")).as("suf"),
        joined(F.col("tok"), F.col("pos")).as("plain"))
    g.select(id, F.col("n_tokens"), F.col("fim_applied"),
      F.when(!F.col("fim_applied"), F.col("plain"))
        .otherwise(F.concat_ws(" ",
          F.lit("<PRE>"), F.nullif(F.col("pre"), F.lit("")),
          F.lit("<SUF>"), F.nullif(F.col("suf"), F.lit("")),
          F.lit("<MID>"), F.nullif(F.col("mid"), F.lit("")))).as("text_out"))
  }
}
