package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: run one gate query and report how many times the per-row
  * fold expressions actually evaluated vs the document count — detects
  * per-OUTPUT-row re-evaluation of generator children (the r12 CPU
  * pathology hunt). Usage: runMain graft.tools.EvalCount [query] [sfDir]. */
object EvalCount {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_tfidf")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, dir, "documents").count()
    graft.functions.expressions.TokenTfExpr.evals.reset()
    val rows = graft.SparkEntry.queries(name)(spark, dir).count()
    println(s"RESULT docs=$docs out_rows=$rows " +
      s"tokentf_evals=${graft.functions.expressions.TokenTfExpr.evals.sum()}")
    spark.stop()
  }
}
