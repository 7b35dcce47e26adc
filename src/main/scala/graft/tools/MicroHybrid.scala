package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Dev probe (VERDICT r19 #2, carried from r18 #5): decompose
  * q_hybrid_search's wall into its three components — the BM25 lexical
  * retriever, the dense brute-force retriever, and the RRF fusion tail —
  * measured SOLO on the same box, plus the fusion on pre-collected
  * in-memory lists (the irreducible fusion cost with both retrievers
  * free). If bm25_solo + dense_solo − shared_scan ≈ full_gate, the
  * residual over the fusion floor is the retrievers themselves, not
  * fusion barriers. Also prints the stage/job counts per fragment. */
object MicroHybrid {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    @volatile var stages = 0
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          stages += 1
      })

    def time(label: String)(mk: => DataFrame): Unit = {
      var best = Long.MaxValue
      var bestStages = 0
      var i = 0
      while (i < reps) {
        spark.catalog.clearCache()
        graft.CacheScope.releaseAll()
        stages = 0
        val t0 = System.nanoTime()
        val d = mk
        d.select(F.xxhash64(d.columns.map(F.col): _*).as("h"))
          .agg(F.expr("bit_xor(h)")).collect()
        val el = System.nanoTime() - t0
        // listener events are async; give the bus a beat before reading
        Thread.sleep(150)
        if (el < best) { best = el; bestStages = stages }
        i += 1
      }
      println(f"MICRO $label%-22s best=${best / 1e6}%9.1f ms stages=$bestStages")
    }

    val docs = graft.Tables(spark, dir, "documents")
    val emb = graft.Tables(spark, dir, "embeddings")
    val terms = Seq("spark", "vector", "window", "customer")

    time("bm25_solo")(graft.functions.TfIdf.bm25(docs, terms, k = 100))
    time("dense_solo") {
      graft.ann.Ann.bruteTopK(emb, emb.filter(F.col("vec_id") === 7), k = 100)
        .select(F.col("neighbor_id").as("doc_id"), F.col("rnk"))
    }
    // fusion floor: both lists pre-collected to local Seqs, so the ONLY
    // work is the coalesce(1) full-outer join + TakeOrdered + bounded rank
    val lexRows = graft.functions.TfIdf.bm25(docs, terms, k = 100)
      .select(F.col("doc_id"), F.col("rnk")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val denseRows = graft.ann.Ann.bruteTopK(emb, emb.filter(F.col("vec_id") === 7), k = 100)
      .select(F.col("neighbor_id"), F.col("rnk")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    time("fusion_floor") {
      graft.operators.RankFusion.hybridRrf(
        lexRows.toDF("doc_id", "rnk"), denseRows.toDF("doc_id", "rnk"),
        "doc_id", k = 20)
    }
    time("full_gate")(graft.SparkEntry.queries("q_hybrid_search")(spark, dir))
    time("gate_bm25")(graft.SparkEntry.queries("q_bm25")(spark, dir))
    spark.stop()
  }
}
