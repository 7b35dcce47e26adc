package graft.tools

import org.apache.spark.sql.SparkSession

/** BPE trainer scale measurement (VERDICT r14 #1): time `train` at
  * realistic merge counts on the bench corpus — the r14 design ran one
  * Spark job per merge and was quadratic in merges; the r15 incremental
  * trainer must hold single-digit seconds at numMerges >= 256. */
object MicroBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val mergeCounts = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(16, 256, 1024, 4096)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.{functions => F}
    val docs = graft.Tables(spark, sfDir, "documents")
    // The bundled documents corpus exhausts its count>=2 pairs near 90
    // merges, so realistic merge counts need a richer pair vocabulary:
    // 16 md5-hex words per document (deterministic) give ~80k distinct
    // words over a 16-symbol alphabet — deep mergeable structure, the
    // shape of a real subword vocabulary.
    val hexed = graft.Tables(spark, sfDir, "documents")
      .select(F.col("doc_id"), F.concat_ws(" ",
        (0 until 16).map(i => F.md5(F.concat(F.col("text"), F.lit(i.toString)))): _*).as("text"))
    // warm the JIT + parquet footers once — INCLUDING the stress corpus's
    // merge-loop shapes: a cold first stress run measures HotSpot
    // compiling the trainer's inner loops (~15 s of C2 tax at 16k merges,
    // r16), not the algorithm; a production train is long enough to be
    // warm for all but its first seconds.
    graft.functions.Bpe.train(docs, numMerges = 4)
    graft.functions.Bpe.train(hexed, numMerges = 512)
    for ((name, corpus) <- Seq(("documents", docs), ("md5hex_16x", hexed));
         k <- mergeCounts) {
      val t0 = System.nanoTime()
      val merges = graft.functions.Bpe.train(corpus, numMerges = k)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val toks = graft.functions.Bpe.encode(corpus, merges).count()
      val tEnc = (System.nanoTime() - t1) / 1e9
      println(f"[bpe] $name%-18s merges=$k%5d  train ${tTrain}%7.3fs  (got ${merges.length})  encode ${tEnc}%7.3fs ($toks tokens)")
    }
    spark.stop()
  }
}
