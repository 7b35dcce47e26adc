import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of one gate query.
  * Usage: runMain ExplainTfidf [queryName] [sfDir] — defaults q_tfidf. */
object ExplainTfidf {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_tfidf")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // AQE wraps everything in AdaptiveSparkPlan, which reports zero
    // codegen subtrees pre-execution — turn it off for codegen audits.
    if (args.lift(2).contains("codegen"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.explain(args.lift(2).getOrElse("formatted"))
    spark.stop()
  }
}
