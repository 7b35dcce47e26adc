package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Dev probe (VERDICT r19 #1): attribute q_dedup_lines' wall across its
  * fragments and A/B the candidate first-occurrence shapes —
  *   a) r19 window: row_number() OVER (PARTITION BY raw line) — the
  *      hot-boilerplate skew cliff,
  *   b) hash groupBy min(struct) + join-back, double scan,
  *   c) same as (b) with the exploded line stream CacheScope-cached,
  *   d) same as (b) but the join-back keyed on (lh) via window over lh.
  * Run on a quiet box; prints best-of-N floors per fragment. */
object MicroLines {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(mk: => DataFrame): Unit = {
      var best = Long.MaxValue
      var out = 0L
      var i = 0
      while (i < reps) {
        val t0 = System.nanoTime()
        // hash-fold over EVERY column: count() alone lets Catalyst prune
        // whole subtrees (a left join with unique build keys is
        // count-eliminable — the bside variant measured 104 ms of
        // nothing before this)
        val d = mk
        out = d.select(F.xxhash64(d.columns.map(F.col): _*).as("h"))
          .agg(F.expr("bit_xor(h)")).collect().length.toLong
        val el = System.nanoTime() - t0
        if (el < best) best = el
        spark.catalog.clearCache()
        graft.CacheScope.releaseAll()
        i += 1
      }
      println(f"MICRO $label%-28s best=${best / 1e6}%9.1f ms rows=$out")
    }

    // the gate's exact input: documents with the synthesized
    // boilerplate-injected multi-line pages
    val base = graft.SparkEntry.synthDocs(graft.Tables(spark, dir, "documents"))
    def gate() = graft.SparkEntry.queries("q_dedup_lines")(spark, dir)

    def lines(d: DataFrame) = graft.Spread(d)
      .select(F.col("doc_id"), F.posexplode(F.split(F.col("text"), "\n")))
      .toDF("doc_id", "idx", "line")

    time("raw_scan")(base.select("doc_id"))
    time("lines_explode")(lines(base))
    time("lines_explode_hash")(
      lines(base).withColumn("lh", F.xxhash64(F.col("line"))))
    time("firsts_agg_only") {
      lines(base).withColumn("lh", F.xxhash64(F.col("line")))
        .groupBy("lh")
        .agg(F.min(F.struct(F.col("doc_id").as("fid"), F.col("idx").as("fidx"))).as("f"))
    }
    time("window_r19_shape") {
      import org.apache.spark.sql.expressions.Window
      val l = lines(base)
      val w = Window.partitionBy(F.col("line"))
        .orderBy(F.col("doc_id").asc, F.col("idx").asc)
      l.withColumn("rk", F.row_number().over(w))
        .groupBy(F.col("doc_id"))
        .agg(F.count(F.lit(1)).as("n_lines"),
          F.sum(F.when(F.col("rk") > 1, 1L).otherwise(0L)).as("n_removed"),
          F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(
              F.when(F.col("rk") === 1, F.struct(F.col("idx"), F.col("line"))))),
            s => s.getField("line"))).as("clean_text"))
    }
    time("groupby_join_nocache") {
      val l = lines(base).withColumn("lh", F.xxhash64(F.col("line")))
      val firsts = l.groupBy(F.col("lh"))
        .agg(F.min(F.struct(F.col("doc_id").as("fid"), F.col("idx").as("fidx"))).as("f"))
      l.join(firsts.hint("shuffle_hash"), Seq("lh"))
        .withColumn("keep",
          F.col("doc_id") === F.col("f.fid") && F.col("idx") === F.col("f.fidx"))
        .groupBy(F.col("doc_id"))
        .agg(F.count(F.lit(1)).as("n_lines"),
          F.sum(F.when(F.col("keep"), 0L).otherwise(1L)).as("n_removed"),
          F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(
              F.when(F.col("keep"), F.struct(F.col("idx"), F.col("line"))))),
            s => s.getField("line"))).as("clean_text"))
    }
    time("window_on_hash") {
      import org.apache.spark.sql.expressions.Window
      val l = lines(base).withColumn("lh", F.xxhash64(F.col("line")))
      val w = Window.partitionBy(F.col("lh"))
        .orderBy(F.col("doc_id").asc, F.col("idx").asc)
      l.withColumn("rk", F.row_number().over(w))
        .groupBy(F.col("doc_id"))
        .agg(F.count(F.lit(1)).as("n_lines"),
          F.sum(F.when(F.col("rk") > 1, 1L).otherwise(0L)).as("n_removed"),
          F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(
              F.when(F.col("rk") === 1, F.struct(F.col("idx"), F.col("line"))))),
            s => s.getField("line"))).as("clean_text"))
    }
    time("firsts_rebuild_bside") {
      // single explode: carry the line text through the min struct; the
      // per-doc universe (n_lines) comes from a second explode-FREE scan
      val l = lines(base).withColumn("lh", F.xxhash64(F.col("line")))
      val firsts = l.groupBy(F.col("lh"))
        .agg(F.min(F.struct(F.col("doc_id").as("fid"), F.col("idx").as("fidx"),
          F.col("line").as("fline"))).as("f"))
      val kept = firsts
        .groupBy(F.col("f.fid").as("doc_id"))
        .agg(F.count(F.lit(1)).as("n_kept"),
          F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("f.fidx"), F.col("f.fline")))),
            s => s.getField("fline"))).as("clean_text"))
      base.select(F.col("doc_id"),
          F.size(F.split(F.col("text"), "\n")).cast("long").as("n_lines"))
        .join(kept, Seq("doc_id"), "left")
        .select(F.col("doc_id"), F.col("n_lines"),
          (F.col("n_lines") - F.coalesce(F.col("n_kept"), F.lit(0L))).as("n_removed"),
          F.coalesce(F.col("clean_text"), F.lit("")).as("clean_text"))
    }
    time("gate_current")(gate())

    // ---- q_boilerplate A/B (VERDICT r19 #4): double explode scan vs
    // CacheScope-materializing the hashed line stream once
    def boilerFrom(l: DataFrame): DataFrame = {
      val boiler = l.select(F.col("lh"), F.col("doc_id")).distinct()
        .groupBy(F.col("lh")).agg(F.count(F.lit(1)).as("df"))
        .filter(F.col("df") >= 3)
        .select(F.col("lh"), F.lit(true).as("is_boiler"))
      l.join(boiler, Seq("lh"), "left")
        .withColumn("b", F.coalesce(F.col("is_boiler"), F.lit(false)))
        .groupBy(F.col("doc_id"))
        .agg(F.count(F.lit(1)).as("n_lines"),
          F.sum(F.when(F.col("b"), 1L).otherwise(0L)).as("n_boiler"),
          F.concat_ws("\n", F.transform(
            F.array_sort(F.collect_list(
              F.when(!F.col("b"), F.struct(F.col("idx"), F.col("line"))))),
            s => s.getField("line"))).as("clean_text"))
    }
    time("boiler_nocache") {
      boilerFrom(lines(base).withColumn("lh", F.xxhash64(F.col("line"))))
    }
    time("boiler_cached") {
      graft.CacheScope.scoped {
        boilerFrom(graft.CacheScope.materialize(
          lines(base).withColumn("lh", F.xxhash64(F.col("line")))))
      }
    }
    time("gate_boilerplate") {
      graft.SparkEntry.queries("q_boilerplate")(spark, dir)
    }
    spark.stop()
  }
}
