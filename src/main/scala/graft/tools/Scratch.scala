package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway profiling aid (not part of the library surface): run one
  * registered query N times in a single JVM and print per-run wall, to
  * separate JIT/planning tax from steady-state cost. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val q = args.headOption.getOrElse("q_ann_ivf")
    val n = if (args.length > 1) args(1).toInt else 6
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to n) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val c = graft.SparkEntry.queries(q)(spark, sfDir).collect().length
      println(f"[scratch] $q run $i: ${(System.nanoTime() - t0) / 1e9}%6.3fs rows=$c")
    }
    // Executed-plan summary: AQE-final node counts (did ReuseExchange
    // fire? how many real shuffles survived?)
    val df = graft.SparkEntry.queries(q)(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    def count(node: String) = node + "=" + plan.linesIterator.count(_.contains(node))
    println("[scratch] executed: " + Seq("ShuffleExchange", "ReusedExchange",
      "BroadcastExchange", "WholeStageCodegen").map(count).mkString(" "))
    spark.stop()
  }
}
