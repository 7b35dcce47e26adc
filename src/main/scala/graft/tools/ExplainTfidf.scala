import org.apache.spark.sql.SparkSession
object ExplainTfidf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries("q_tfidf")(spark, "/root/testdata/sf0.01")
    df.explain("formatted")
    spark.stop()
  }
}
