package graft.tools

import org.apache.spark.sql.{functions => F, SparkSession}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.functions.expressions.{MinhashSigsExpr, ShingleExpr}

/** Stage-by-stage wall-time breakdown of the ngram-jaccard pipeline —
  * profiling aid, not part of the library surface.
  * Usage: SPARK_GRAFT_SF_DIR=... runMain graft.tools.NgramProfile */
object NgramProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    docs.count() // warm footers

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      spark.catalog.clearCache()
      val shingleArr = ColumnBridge.column(
        ShingleExpr(ColumnBridge.expression(F.col("text")), 3))
      val docArr0 = t("docArr0 build+persist") {
        val d = docs.repartition(32)
          .select(F.col("doc_id"), F.array_distinct(shingleArr).as("arr"))
          .filter(F.size(F.col("arr")) > 0)
          .withColumn("n", F.size(F.col("arr")).cast("long"))
          .persist()
        d.count(); d
      }
      val heavy = docArr0.select(F.explode(F.col("arr")).as("shingle"))
        .groupBy(F.col("shingle")).agg(F.count(F.lit(1)).as("df"))
        .filter(F.col("df") > 1000).select("shingle")
      t("heavy isEmpty probe")(heavy.isEmpty)
      val sigArr = ColumnBridge.column(
        MinhashSigsExpr(ColumnBridge.expression(F.col("arr")), 8))
      val sigs = t("sigs build+persist") {
        val s = docArr0.select(F.col("doc_id"), sigArr.as("sigs"))
          .select(F.col("doc_id"), F.posexplode(F.col("sigs")).as(Seq("band", "sig")))
          .persist()
        s.count(); s
      }
      val pairs = t("pairs (bucket self-join)") {
        val big = sigs.groupBy(F.col("band"), F.col("sig"))
          .agg(F.count(F.lit(1)).as("bn")).filter(F.col("bn") > 100000)
          .select("band", "sig")
        val pruned = sigs.join(F.broadcast(big), Seq("band", "sig"), "left_anti")
        val a = pruned.select(F.col("band"), F.col("sig"), F.col("doc_id").as("doc_a"))
        val b = pruned.select(F.col("band"), F.col("sig"), F.col("doc_id").as("doc_b"))
        val p = a.join(b, Seq("band", "sig"))
          .filter(F.col("doc_a") < F.col("doc_b"))
          .select("doc_a", "doc_b").distinct().persist()
        p.count(); p
      }
      val pairsGB = t("pairs (groupBy expansion)") {
        val p = sigs.groupBy(F.col("band"), F.col("sig"))
          .agg(F.collect_list(F.col("doc_id")).as("ids"))
          .filter(F.size(F.col("ids")) > 1)
          .select(F.explode(F.col("ids")).as("doc_a"), F.col("ids"))
          .select(F.col("doc_a"), F.explode(F.col("ids")).as("doc_b"))
          .filter(F.col("doc_a") < F.col("doc_b"))
          .distinct().persist()
        p.count(); p
      }
      t("final pair joins + jaccard") {
        pairs
          .join(docArr0.select(F.col("doc_id").as("doc_a"),
            F.col("arr").as("arr_a"), F.col("n").as("n_a")), Seq("doc_a"))
          .join(docArr0.select(F.col("doc_id").as("doc_b"),
            F.col("arr").as("arr_b"), F.col("n").as("n_b")), Seq("doc_b"))
          .select(F.col("doc_a"), F.col("doc_b"),
            F.size(F.array_intersect(F.col("arr_a"), F.col("arr_b"))).cast("long").as("inter"),
            F.col("n_a"), F.col("n_b"))
          .filter(F.col("inter") > 0L)
          .select(F.col("doc_a"), F.col("doc_b"),
            (F.col("inter").cast("double") /
              (F.col("n_a") + F.col("n_b") - F.col("inter")).cast("double")).as("jaccard"))
          .filter(F.col("jaccard") >= 0.2)
          .count()
      }
    }
    spark.stop()
  }
}
