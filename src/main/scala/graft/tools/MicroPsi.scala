package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Dev probe (r20): A/B the PSI gate's two shapes on the same box —
  * (a) two-frame psiDrift: two quality-regex scans, independent subtrees
  *     whose stages can overlap;
  * (b) paired psiDriftPaired: one scan computing both scores per row,
  *     one pair-count aggregation (ReuseExchange'd under both marginals).
  * Same output, measured head-to-head best-of-N. */
object MicroPsi {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(7)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(mk: => DataFrame): Unit = {
      var best = Long.MaxValue
      var i = 0
      while (i < reps) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val d = mk
        d.select(F.xxhash64(d.columns.map(F.col): _*).as("h"))
          .agg(F.expr("bit_xor(h)")).collect()
        val el = System.nanoTime() - t0
        if (el < best) best = el
        i += 1
      }
      println(f"MICRO $label%-18s best=${best / 1e6}%9.1f ms")
    }

    val TF = graft.functions.TextFunctions
    def docs = graft.Spread(graft.Tables(spark, dir, "documents"))
    val drifted = F.concat(F.col("text"),
      F.when(F.col("doc_id") % 4 === 0, F.lit(" !!! ### 12345 $$$ %%% 999"))
        .otherwise(F.lit("")))
    time("two_frame") {
      graft.operators.Profile.psiDrift(
        docs.select(F.round(TF.qualityScore(F.col("text")), 6).as("q")),
        docs.select(F.round(TF.qualityScore(drifted), 6).as("q")), "q")
    }
    time("paired") {
      graft.operators.Profile.psiDriftPaired(
        docs.select(
          F.round(TF.qualityScore(F.col("text")), 6).as("qa"),
          F.round(TF.qualityScore(drifted), 6).as("qb")),
        "qa", "qb")
    }
    time("scan_one_score")(
      docs.select(F.round(TF.qualityScore(F.col("text")), 6).as("q")))
    time("scan_both_scores")(
      docs.select(
        F.round(TF.qualityScore(F.col("text")), 6).as("qa"),
        F.round(TF.qualityScore(drifted), 6).as("qb")))
    spark.stop()
  }
}
