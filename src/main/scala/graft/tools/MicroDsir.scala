package graft.tools
import org.apache.spark.sql.{functions => F, SparkSession}
import org.apache.spark.sql.graftbridge.ColumnBridge
/** Dev probe: attribute q_dsir_weights' wall across its fragments (gram
  * stream production — native vs hex-conv — profile aggregation, full
  * operator). r14 finding: the gram-stream scalar work is NOT the
  * bottleneck (223-261 ms of a 1.6 s wall); the profile agg + scoring
  * join constants over two 536k-row passes are — the operator is at its
  * two-pass floor, same conclusion class as MicroCcnet. */
object MicroDsir {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables(spark, dir, "documents")
    def time(label: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      var best = Long.MaxValue; var out = 0L; var i = 0
      while (i < 5) {
        val t0 = System.nanoTime(); out = mk.count()
        best = math.min(best, System.nanoTime() - t0)
        spark.catalog.clearCache(); i += 1
      }
      println(f"MICRO $label%-26s best=${best / 1e6}%9.1f ms rows=$out")
    }
    def gb(c: org.apache.spark.sql.Column) = ColumnBridge.column(
      graft.functions.expressions.DsirBucketsExpr(ColumnBridge.expression(c), 8192))
    val byKey = graft.Spread.byKey(docs, "doc_id")
    time("gram_stream_native")(
      byKey.select(F.col("doc_id"), F.explode(gb(F.col("text"))).as("bkt")))
    time("gram_stream_hexconv") {
      def sh(n: Int) = ColumnBridge.column(
        graft.functions.expressions.ShingleExpr(ColumnBridge.expression(F.col("text")), n))
      byKey.select(F.col("doc_id"), F.explode(F.concat(sh(1), sh(2))).as("g"))
        .select(F.col("doc_id"),
          (F.conv(F.substring(F.md5(F.col("g")), 1, 8), 16, 10).cast("long") % 8192).as("bkt"))
    }
    time("profile_agg")(
      byKey.select(F.explode(gb(F.col("text"))).as("bkt"))
        .groupBy("bkt").agg(F.count(F.lit(1)).as("rc")))
    time("full_weights")(
      graft.functions.Dsir.importanceWeights(docs, docs.filter(F.col("doc_id") % 50 === 0)))
    spark.stop()
  }
}
